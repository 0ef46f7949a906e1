package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Guards on the COMMITTED bench records (repo-root JSON), closing the
  * recurring record-drift class structurally:
  *
  *  - round 11 shipped BENCH_SF1 at 160/161 queries (triangle count
  *    landed after the refresh); round 13 shipped 167/168 (hot-salted
  *    join landed after). This spec makes an in-suite record that does
  *    not cover the full registry a RED `sbt test`, so the gap cannot be
  *    committed quietly again. Dev loops mid-round (new query registered,
  *    ~1 h refresh not yet run) set SPARK_GRAFT_ALLOW_STALE_BENCH=1; the
  *    end-of-round suite runs strict.
  *  - every query named in a record must still exist in the Registry
  *    (no ghost/renamed queries carried forward) — always strict.
  *  - records must carry the canary pair (the round-14 drift-normalization
  *    contract) and the standing zero-spill claim.
  *  - each record's embedded "sf" dir must match what its FILENAME
  *    claims — the residual risk of any refresh-script mishap leaving,
  *    say, sf1 numbers in an sf0.1-named file (round-14 advice; the
  *    write-then-mv window itself is gone — SPARK_GRAFT_BENCH_OUT writes
  *    each record directly).
  *
  * Records are parsed with jackson (on the test classpath via Spark), not
  * substring probing — a nested object inside "queries" or a brace in a
  * key can never silently truncate the guarded key set (round-14 advice).
  */
class RecordsSpec extends SparkSpec {

  private val mapper = new ObjectMapper

  private def record(name: String): Option[JsonNode] = {
    val p = Paths.get(name)
    if (!Files.exists(p)) None
    else Some(mapper.readTree(Files.readAllBytes(p)))
  }

  private def queryNames(r: JsonNode, file: String): Set[String] = {
    val q = r.get("queries")
    assert(q != null && q.isObject, s"$file has no queries map")
    q.fieldNames.asScala.toSet
  }

  // in-suite records run the FULL registry (coverage + zero-spill apply);
  // iso records time the headline subset from fresh JVMs; the SF10 pair
  // (SCALECHECK10.md) deliberately times only the scale-critical subset —
  // ghost/canary/sf guards apply, coverage and the zero-spill claim don't
  private val inSuite = Seq("BENCHFULL.json", "BENCH_SF1.json", "BENCH_LOCAL8.json")
  private val all = inSuite ++ Seq("BENCHISO.json", "BENCHISO_SF1.json",
    "BENCH_SF10.json", "BENCHISO_SF10.json",
    // the skewed decade (scripts/bench_sf10skew.sh) — subset records like
    // the SF10 pair: ghost/canary/sf guards apply, coverage doesn't
    "BENCH_SF1SKEW.json", "BENCHISO_SF1SKEW.json",
    "BENCH_SF10SKEW.json", "BENCHISO_SF10SKEW.json")

  test("committed in-suite records cover the full registry (no silent gaps)") {
    val allow = sys.env.contains("SPARK_GRAFT_ALLOW_STALE_BENCH")
    inSuite.foreach { f =>
      record(f).foreach { r =>
        val recorded = queryNames(r, f)
        val registry = Registry.defs.map(_.name).toSet
        val missing = registry -- recorded
        if (!allow)
          assert(missing.isEmpty,
            s"$f does not cover the registry — run scripts/refresh_bench.sh " +
              s"(missing: ${missing.toSeq.sorted.take(10).mkString(", ")})")
      }
    }
  }

  test("iso records time exactly the declared headliner set (no silent drops)") {
    // BENCHISO*.json exist to adjudicate in-suite moves on the headline
    // queries — a headliner silently missing from an iso record (child
    // crashed, list drifted) would leave exactly the flagged query
    // unadjudicated. Pin the recorded set to Bench.headline, with the
    // same dev-loop escape as the coverage guard (a headliner added
    // mid-round lands in the records at the next refresh).
    val allow = sys.env.contains("SPARK_GRAFT_ALLOW_STALE_BENCH")
    Seq("BENCHISO.json", "BENCHISO_SF1.json").foreach { f =>
      record(f).foreach { r =>
        val recorded = queryNames(r, f)
        val missing = Bench.headline.toSet -- recorded
        if (!allow)
          assert(missing.isEmpty,
            s"$f is missing declared headliners — run scripts/refresh_bench.sh " +
              s"(missing: ${missing.toSeq.sorted.mkString(", ")})")
        // Same escape for extras: removing a headliner mid-round would
        // otherwise break the dev loop until records are refreshed even
        // with the allow flag set (ADVICE r16 #3).
        val extras = recorded -- Bench.headline.toSet
        if (!allow)
          assert(extras.isEmpty,
            s"$f times queries outside Bench.headline: ${extras.toSeq.sorted.mkString(", ")}")
      }
    }
  }

  test("no ghost queries in any committed record") {
    val registry = Registry.defs.map(_.name).toSet
    all.foreach { f =>
      record(f).foreach { r =>
        val ghosts = queryNames(r, f) -- registry
        assert(ghosts.isEmpty, s"$f names unregistered queries: $ghosts")
      }
    }
  }

  test("records carry the canary pair and the zero-spill claim") {
    all.foreach { f =>
      record(f).foreach { r =>
        val canary = r.get("canary")
        assert(canary != null && canary.has("range_mod_sum_s") &&
          canary.has("scan_sf01_lineitem_s"),
          s"$f has no canary pair — captured outside scripts/refresh_bench.sh?")
      }
    }
    // The zero-spill claim is strict at sf0.1 — and, since round 22,
    // effectively at sf1 too: the round-20 `c14_pagerank_layout_upsert`
    // merge-aggregation sort spill (~1.06 GB/suite on the fixed 8 GiB dev
    // heap) disappeared when round 21 switched the merged frame to a
    // columnar persist and round 21/22 removed the redundant maintenance
    // passes; the r22 BENCH_SF1 capture records 0 spilled bytes. The old
    // 1.3 GiB allowance is retired to a 256 MiB tripwire margin (round-21
    // verdict directive 7) so any fresh sf1 spill — graceful or not —
    // trips this gate instead of hiding inside a stale budget.
    val spillBudget = Map("BENCH_SF1.json" -> (256L * 1024 * 1024))
    inSuite.foreach { f =>
      record(f).foreach { r =>
        val spilled = r.get("spilled_bytes")
        val budget = spillBudget.getOrElse(f, 0L)
        assert(spilled != null && spilled.asLong(-1L) <= budget,
          s"$f records ${if (budget == 0) "spill — the committed zero-spill claim broke"
          else s"spill past the documented ${budget} budget"}")
      }
    }
  }

  test("each record's sf dir matches its filename's claim") {
    val expectedSfBase: Map[String, String => Boolean] = Map(
      "BENCHFULL.json" -> (_ == "sf0.1"),
      "BENCHISO.json" -> (_ == "sf0.1"),
      "BENCH_LOCAL8.json" -> (_ == "sf0.1"),
      // exact names: startsWith("sf1") would let sf10 numbers hide in an
      // sf1-named record now that both scales exist
      "BENCH_SF1.json" -> (_ == "sf1"),
      "BENCHISO_SF1.json" -> (_ == "sf1"),
      "BENCH_SF10.json" -> (_ == "sf10"),
      "BENCHISO_SF10.json" -> (_ == "sf10"),
      "BENCH_SF1SKEW.json" -> (_ == "sf1skew"),
      "BENCHISO_SF1SKEW.json" -> (_ == "sf1skew"),
      "BENCH_SF10SKEW.json" -> (_ == "sf10skew"),
      "BENCHISO_SF10SKEW.json" -> (_ == "sf10skew"))
    all.foreach { f =>
      record(f).foreach { r =>
        val sf = Option(r.get("sf")).map(_.asText("")).getOrElse("")
        val base = sf.split("/").last
        assert(expectedSfBase(f)(base),
          s"$f claims sf dir '$sf' — refresh wrote the wrong scale into this file")
      }
    }
  }
}
