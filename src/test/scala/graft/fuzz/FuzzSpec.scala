package graft.fuzz

import graft.SparkSpec

/** Pins the differential fuzzer's premises. The cross-engine comparison
  * itself runs via `scripts/fuzz.sh` (DuckDB lives outside the JVM); this
  * spec guards what MUST hold for that comparison to be meaningful:
  * seed-determinism of the generated query list, Spark-side executability,
  * and rerun-determinism of the LIMIT cut (total-order premise).
  *
  * Seeds 42/7/1337/2026 × 150 are the committed baseline sweep: 600/600
  * green against DuckDB at sf0.01 over the eight-table surface (orders,
  * lineitem, customer, part, supplier, nation, events — through the
  * nanos→µs NTZ loader — and documents; inner/left/full-outer join shapes
  * + all FK EXISTS edges), covering projection (mixed-direction ORDER BY,
  * occasional OFFSET),
  * DISTINCT, aggregate/HAVING (incl. c9-style DECIMAL discounted sums),
  * EXISTS/NOT EXISTS, ROLLUP/CUBE/random GROUPING SETS with grouping_id
  * (which caught a real
  * cross-engine divergence: Spark emits no grand-total row over an empty
  * input where DuckDB does — equalized oracle-side; and an API trap:
  * aliased cols passed to Dataset.groupingSets mint a phantom grouping
  * column, so the fuzzer groups on raw exprs and renames positionally),
  * exact interpolated quantiles (percentile vs quantile_cont),
  * UNION/INTERSECT/EXCEPT (set and bag ALL semantics), windowed top-k,
  * windowed interpolated quantiles over random bounded ROWS frames
  * (the c12_rolling_median shape: random column/frame-depth/f, value
  * included in the ORDER BY so residual ties are value-identical),
  * as-of joins in all four
  * semantics — backward/forward × inclusive/strict
  * (the ScaleOps.asofJoin operator vs DuckDB's inequality-join +
  * max_by/min_by forms), binned range joins (ScaleOps.rangeBinJoin under random bin
  * widths vs the binless inequality-join oracle — half the draws through
  * the declarative band join rewritten by RangeBinJoinRule), interval-
  * overlap joins (ScaleOps.intervalBinJoin under random window geometry
  * and bin widths vs the binless overlap theta-join oracle), salted
  * joins (vs the plain equi-join), CASE WHEN / COALESCE / string-concat /
  * date_trunc expressions. If this spec's
  * pinned SQL hash changes, the generator changed and the sweep must be
  * re-run before trusting it.
  */
class FuzzSpec extends SparkSpec {

  test("generator is a pure function of the seed") {
    val a = QueryGen.generate(42L, 120).map(_.sql)
    val b = QueryGen.generate(42L, 120).map(_.sql)
    assert(a === b)
    assert(a.distinct.size > 100, "queries should be mostly distinct")
  }

  test("pinned baseline: seed 42 SQL corpus hash is stable") {
    val joined = QueryGen.generate(42L, 120).map(_.sql).mkString("\n")
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val hex = md.digest(joined.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    // update ONLY together with a fresh scripts/fuzz.sh green sweep
    // (round 13: as-of draws gained the viaRewrite coin flip, then the
    // windowed-top-k draw gained the rn<=1 LatestByRule routing; round
    // 14: latest-row draws gained direction REGIMES — all-ASC/all-DESC
    // fired + mixed guard-declined — re-swept green 600/600 over seeds
    // 42/7/1337/2026 the same session as this pin change)
    assert(hex === "e99fdb1f0603dc3e9464da9d6eab67ec93f400b5")
  }

  test("every generated query executes on Spark (seed 42, first 15)") {
    QueryGen.generate(42L, 120).take(15).foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n >= 0, s"${q.name} should execute")
    }
  }

  test("dedup-parameter generator is a pure function of the seed, pinned") {
    val a = DedupParamGen.generate(42L, 40).map(_.sql)
    val b = DedupParamGen.generate(42L, 40).map(_.sql)
    assert(a === b)
    // every family drawn within 40: span/ngram/simhash/srp/winnow/ivf/
    // semantic/pq (8 families since the PQ + SemDeDup twins landed)
    val bodies = DedupParamGen.generate(42L, 40)
    assert(bodies.exists(_.sql.contains("shared_spans")))
    assert(bodies.exists(_.sql.contains("jaccard")))
    assert(bodies.exists(_.sql.contains("is_dup")))
    assert(bodies.exists(_.sql.contains("AS bucket")))
    assert(bodies.exists(_.sql.contains("fp0")))
    assert(bodies.exists(_.sql.contains("final_assign")))
    assert(bodies.exists(_.sql.contains("NOT EXISTS"))) // semanticDraw
    assert(bodies.exists(_.sql.contains("shortlist")))  // pqDraw
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val hex = md.digest(a.mkString("\n").getBytes("UTF-8"))
      .map(b0 => f"$b0%02x").mkString
    // update ONLY together with a fresh scripts/fuzz.sh green sweep (the
    // 4-seed × 150 protocol now carries 18 dedup-parameter draws per seed)
    // re-pinned when the semanticDraw/pqDraw families landed (mirroring
    // c17_semantic_dedup_md5 / c18_ann_ivfpq_md5); fresh 4-seed 672/672
    // sweep run with this pin
    assert(hex === "c56550ce774f8c0a4e6190c7b9c64c4a3b2ca364")
  }

  test("every dedup-parameter draw executes on Spark (seed 42, first 8)") {
    DedupParamGen.generate(42L, 8).foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n >= 0, s"${q.name} should execute")
    }
  }

  test("one draw of EVERY dedup family executes on Spark (seed 42)") {
    // the first-8 test covers whatever families the prefix happens to
    // draw; this one picks the FIRST draw of each of the eight families
    // from the pinned 40-draw window, so a family whose Spark fn breaks
    // cannot hide behind draw order
    val markers = Seq(
      "shared_spans" -> "span", "jaccard" -> "ngram", "is_dup" -> "simhash",
      "AS bucket" -> "srp", "fp0" -> "winnow", "final_assign" -> "ivf/pq",
      "NOT EXISTS" -> "semantic", "shortlist" -> "pq")
    val draws = DedupParamGen.generate(42L, 40)
    markers.foreach { case (marker, family) =>
      val q = draws.find(_.sql.contains(marker))
        .getOrElse(fail(s"family $family absent from the pinned window"))
      val n = q.fn(spark, sf).count()
      assert(n >= 0, s"${q.name} ($family) should execute")
    }
  }

  test("rerun-determinism: projection LIMIT cut is a stable multiset") {
    // fz_0008's shape regressed on non-unique (l_orderkey, l_linenumber):
    // with all output columns in the sort, two runs must agree exactly
    val qs = QueryGen.generate(42L, 120)
    val projs = qs.filter(_.sql.contains(" LIMIT ")).take(4)
    assert(projs.nonEmpty)
    projs.foreach { q =>
      val r1 = q.fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val r2 = q.fn(spark, sf).collect().map(_.toString).sorted.toSeq
      assert(r1 === r2, s"${q.name} LIMIT cut must be deterministic")
    }
  }
}
