package graft

/** Registry-wide guards: every registered query must execute at the
  * smallest scale, rows-only queries must return rows (the driver's weaker
  * check is vacuous on empty output), and results must be stable across
  * repeated execution (the oracle hash compare demands determinism). */
class RegistrySpec extends SparkSpec {

  test("every registered query executes at sf0.001") {
    val failures = Registry.defs.flatMap { q =>
      try { q.fn(spark, sf).collect(); None }
      catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("rows-only (no-oracle) queries return non-empty output") {
    val empty = Registry.defs.filter(_.oracle.isEmpty).flatMap { q =>
      if (q.fn(spark, sf).isEmpty) Some(q.name) else None
    }
    assert(empty.isEmpty, s"empty rows-only output: $empty")
  }

  test("representative queries are run-to-run deterministic") {
    val sample = Seq(
      "c9_tpch_q1", "c18_knn_brute", "c17_minhash_lsh",
      "c12_window_funcs", "c15_collect_list", "c19_winnow_fingerprint")
    sample.foreach { name =>
      val a = Registry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      val b = Registry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      assert(a === b, s"$name nondeterministic")
    }
  }

  test("oracle SQL exists for every query or the omission is deliberate") {
    // every query has a survey tag and a resolvable name
    Registry.defs.foreach { q =>
      assert(q.name.nonEmpty && q.survey.nonEmpty)
    }
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }
}
