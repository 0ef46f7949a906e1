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
  * (scan, casts, timestamp parse, global order).
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

  val all: Seq[QueryDef] = Seq(orderedScan, typedScan, buyerSpend, hourlyTrend)
}
