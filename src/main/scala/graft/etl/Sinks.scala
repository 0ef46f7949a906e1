package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Load-side sinks (SURVEY.md §2 A10/A14).
  *
  * The reference loads with one INSERT per row over a single PG-wire
  * connection (cloud_function.py:127–129) — ~1 network round trip per
  * record. The Spark-first equivalent batches statements per partition and
  * writes all partitions concurrently; `batchsize` alone is the ≥100×
  * ingest win SURVEY §4 calls out.
  */
object Sinks {

  /** A10 (literal): batched JDBC append to a PG-wire table (QuestDB listens
    * on :8812 speaking the postgres protocol — url form
    * `jdbc:postgresql://host:8812/qdb`). Rows are sorted within partitions
    * on the designated timestamp to respect the in-order append contract
    * (A12) without a global sort. */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      user: String,
      password: String,
      batchSize: Int = 5000): Unit =
    df.sortWithinPartitions("purchase_date")
      .write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", "NONE") // autocommit-like, as the reference
      .save()

  /** A14: the `purchases` table DDL (sql/create-table.sql:1) re-expressed as
    * a Spark external parquet table. The designated-timestamp contract is
    * carried as a table property + the write-side ordering in
    * [[Purchases.writeOrderedPartitioned]]. After this, the published query
    * (A13, README.md:366) runs verbatim: `SELECT * FROM purchases ORDER BY
    * purchase_date`. */
  def createPurchasesTable(spark: SparkSession, location: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS purchases (
         |  buyer STRING, item_id INT, quantity INT, price INT,
         |  purchase_date TIMESTAMP_NTZ)
         |USING parquet
         |LOCATION '$location'
         |TBLPROPERTIES ('graft.designated.timestamp' = 'purchase_date')
         |""".stripMargin)
}
