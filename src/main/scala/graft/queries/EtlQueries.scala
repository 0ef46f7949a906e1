package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.etl.Purchases

/** The reference pipeline's own query surface (SURVEY.md §2 Tier A/B) run
  * over the reference's example CSVs under /root/reference/example — the
  * golden fixtures the tutorial ships (README.md:352–368).
  *
  * DuckDB has no sha1() (v1.0), so queries whose output contains the
  * anonymized buyer hash are registered rows-only (noOracle) and their
  * sha1 parity is asserted against hardcoded golden digests in EtlSpec;
  * the typed scan below carries the full oracle for everything else
  * (scan, casts, timestamp parse, global order), and the `_md5` twins
  * (round 13, the winnow/simhash twin mechanism) re-key the SAME pipeline
  * on md5 — which both engines ship — so the anonymizing projection,
  * digest ordering and hash-grouped aggregation get full-oracle rows too.
  *
  * Version pin (probed round 10, surfaced by scripts/check.py on every
  * run): the sandbox oracle is DuckDB 1.0.0 — core ships md5/sha256 but
  * NOT sha1 (added to core in 1.1), and the crypto extension cannot
  * install (zero egress). Switching the pipeline to sha256 would break A5
  * reference parity (cloud_function.py:70 hashes with sha1), so these two
  * rows stay golden-digest-pinned until the oracle image moves to ≥ 1.1 —
  * at which point `SELECT sha1(email)...` oracles drop in unchanged.
  */
object EtlQueries {

  private val exampleDir = "/root/reference/example"

  /** DuckDB-side equivalent of readCsv: positional headerless CSV. */
  private val duckCsv =
    s"""read_csv('$exampleDir/*.csv', header=false, columns={
       |  'email': 'VARCHAR', 'item_id': 'INTEGER', 'quantity': 'INTEGER',
       |  'price': 'INTEGER', 'purchase_date': 'VARCHAR'})""".stripMargin

  /** A13: the published query — `SELECT * FROM purchases ORDER BY
    * purchase_date` (README.md:366) over the full ETL output. Buyer hash in
    * output → rows-only check + golden sha1 asserted in EtlSpec. */
  val orderedScan: QueryDef = QueryDef.noOracle(
    "a13_purchases_ordered", "A1-A13") { (s, _) =>
    Purchases.etl(s, exampleDir)
      .orderBy("purchase_date", "buyer", "item_id", "quantity", "price")
  }

  /** A13 oracle twin: the SAME full pipeline with md5 swapped in for sha1
    * (both engines ship md5), so the anonymizing projection itself — hash
    * in the output, grouping and ordering on the digest — is hash-checked
    * against DuckDB instead of spec-trusted. Baseline-tagged: the
    * reference-parity path stays sha1 (A5). */
  val orderedScanMd5: QueryDef = QueryDef(
    "a13_purchases_ordered_md5", "A1-A13 A5",
    s"""SELECT md5(email) AS buyer, item_id, quantity, price,
       |  strptime(purchase_date, '%Y-%m-%dT%H:%M:%S') AS purchase_date
       |FROM $duckCsv
       |ORDER BY purchase_date, buyer, item_id, quantity, price""".stripMargin) { (s, _) =>
    Purchases.etl(s, exampleDir, anonymizer = md5)
      .orderBy("purchase_date", "buyer", "item_id", "quantity", "price")
  }.asBaseline("md5-keyed oracle anchor for the A5 anonymizing projection; " +
    "the pipeline path is a13_purchases_ordered (sha1, reference parity, " +
    "golden-digest-pinned)")

  /** A2/A6/A9/A12/A13 with the anonymizing projection elided so DuckDB can
    * oracle the scan + casts + timestamp parse + total order exactly. */
  val typedScan: QueryDef = QueryDef(
    "a09_purchases_typed", "A2 A6 A9 A13",
    s"""SELECT item_id, quantity, price,
       |  strptime(purchase_date, '%Y-%m-%dT%H:%M:%S') AS purchase_date
       |FROM $duckCsv
       |ORDER BY purchase_date, item_id, quantity, price""".stripMargin) { (s, _) =>
    Purchases.etl(s, exampleDir)
      .select("item_id", "quantity", "price", "purchase_date")
      .orderBy("purchase_date", "item_id", "quantity", "price")
  }

  /** B3: per-buyer consistency analytics — the reason the reference hashes
    * deterministically (README.md:249). quantity*price is exact int math. */
  val buyerSpend: QueryDef = QueryDef.noOracle(
    "b3_buyer_spend", "B3 A5") { (s, _) =>
    Purchases.etl(s, exampleDir)
      .groupBy("buyer")
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("quantity").cast("long") * col("price")).as("total_spend"))
      .orderBy("buyer")
  }

  /** B3 oracle twin of [[buyerSpend]] on md5 keys: per-buyer grouping ON
    * the digest column is what the reference's deterministic hashing
    * exists for (README.md:249) — this row checks that the hash-grouped
    * aggregate matches an independent engine end-to-end. */
  val buyerSpendMd5: QueryDef = QueryDef(
    "b3_buyer_spend_md5", "B3 A5",
    s"""SELECT md5(email) AS buyer, count(*) AS n_purchases,
       |  CAST(SUM(CAST(quantity AS BIGINT) * price) AS BIGINT) AS total_spend
       |FROM $duckCsv
       |GROUP BY 1 ORDER BY buyer""".stripMargin) { (s, _) =>
    Purchases.etl(s, exampleDir, anonymizer = md5)
      .groupBy("buyer")
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("quantity").cast("long") * col("price")).as("total_spend"))
      .orderBy("buyer")
  }.asBaseline("md5-keyed oracle anchor for hash-grouped analytics; " +
    "the pipeline path is b3_buyer_spend (sha1, reference parity)")

  /** B2 over the purchases stream: hourly trend of revenue — the tutorial's
    * console chart (README.md:369–371), QuestDB `SAMPLE BY 1h`. Oracle-able:
    * no hash in the output. */
  val hourlyTrend: QueryDef = QueryDef(
    "b2_purchase_trend", "B2",
    s"""SELECT date_trunc('hour', strptime(purchase_date, '%Y-%m-%dT%H:%M:%S')) AS hr,
       |  count(*) AS cnt, CAST(SUM(CAST(quantity AS BIGINT) * price) AS BIGINT) AS revenue
       |FROM $duckCsv
       |GROUP BY 1 ORDER BY hr""".stripMargin) { (s, _) =>
    Purchases.etl(s, exampleDir)
      .groupBy(date_trunc("hour", col("purchase_date")).as("hr"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("quantity").cast("long") * col("price")).as("revenue"))
      .orderBy("hr")
  }

  val all: Seq[QueryDef] = Seq(orderedScan, orderedScanMd5, typedScan,
    buyerSpend, buyerSpendMd5, hourlyTrend)
}
