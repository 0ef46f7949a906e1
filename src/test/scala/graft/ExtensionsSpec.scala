package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the custom expressions are callable from plain SQL. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("ext-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("cosine_sim / minhash_sig / simhash_sig / shingle_array resolve in SQL") {
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos_same,
        |  size(minhash_sig(array('a','b','c','d'))) AS mh_len,
        |  simhash_sig(array('x','y')) AS sh,
        |  size(shingle_array(array('a','b','c','d'))) AS n_shingles,
        |  size(minhash_bands(array('a','b','c','d'))) AS n_bands,
        |  size(srp_buckets(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)))) AS n_buckets
        |""".stripMargin).first()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getInt(1) === 64)
    assert(row.getInt(3) === 2) // "a b c", "b c d"
    assert(row.getInt(4) === 16)
    assert(row.getInt(5) === 4)
  }
}
