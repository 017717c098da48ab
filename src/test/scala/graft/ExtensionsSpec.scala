package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, HashFunctions}

/** SQL-surface registration of the custom Catalyst expressions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("registered SQL functions agree with the Column API") {
    GraftFunctions.register(spark)
    Seq(("hello world spark", 1L)).toDF("t", "id").createOrReplaceTempView("ext_t")
    val viaSql = spark.sql(
      """SELECT poly_hash(t) AS p, fnv1a64(t) AS f,
        |       size(word_shingles(t, 2)) AS s,
        |       dot_d(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
        |FROM ext_t""".stripMargin).collect()(0)
    val viaCol = spark.table("ext_t").select(
      HashFunctions.poly_hash(col("t")),
      HashFunctions.fnv1a(col("t")),
      size(HashFunctions.word_shingles(col("t"), 2)),
      HashFunctions.dot_d(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))))
      .collect()(0)
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getInt(2) == viaCol.getInt(2))
    assert(viaSql.getDouble(3) == 11.0 && viaCol.getDouble(3) == 11.0)
  }

  test("word_shingles rejects a non-literal k with a clear error") {
    GraftFunctions.register(spark)
    Seq(("a b c", 2)).toDF("t", "k").createOrReplaceTempView("ext_k")
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(t, k) FROM ext_k").collect()
    }
    assert(e.getMessage != null)
  }

  test("top_k_longs works from SQL in a grouped aggregation") {
    GraftFunctions.register(spark)
    Seq(("a", 5L), ("a", 9L), ("a", 1L), ("a", 7L), ("b", 3L))
      .toDF("g", "v").createOrReplaceTempView("ext_topk")
    val got = spark.sql(
        "SELECT g, top_k_longs(v, 2) AS t FROM ext_topk GROUP BY g ORDER BY g")
      .as[(String, Seq[Long])].collect().toSeq
    assert(got == Seq("a" -> Seq(9L, 7L), "b" -> Seq(3L)), got)
  }

  test("char_entropy_stats agrees between SQL and the Column API") {
    GraftFunctions.register(spark)
    Seq(("aab", 1L)).toDF("t", "id").createOrReplaceTempView("ext_e")
    val viaSql = spark.sql(
      """SELECT char_entropy_stats(t).n_chars AS n,
        |       char_entropy_stats(t).n_unique AS u,
        |       char_entropy_stats(t).ent_sum AS e
        |FROM ext_e""".stripMargin).collect()(0)
    val viaCol = spark.table("ext_e")
      .select(HashFunctions.char_entropy_stats(col("t")).as("s"))
      .select(col("s.n_chars"), col("s.n_unique"), col("s.ent_sum"))
      .collect()(0)
    assert(viaSql.getInt(0) == 3 && viaCol.getInt(0) == 3)
    assert(viaSql.getInt(1) == 2 && viaCol.getInt(1) == 2)
    // sorted runs: 'a' (p=2/3) then 'b' (p=1/3), summed in that order
    val expected = (2.0 / 3) * (math.log(2.0 / 3) / math.log(2.0)) +
      (1.0 / 3) * (math.log(1.0 / 3) / math.log(2.0))
    assert(viaSql.getDouble(2) == expected && viaCol.getDouble(2) == expected)
  }

  test("GraftExtensions registers via a fresh session builder") {
    // newSession shares state; validate the extensions class wiring by
    // invoking it against a fresh SparkSessionExtensions instance.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // no exception = all builders valid; function count matches
    assert(GraftFunctions.builders.map(_._1).distinct.size ==
      GraftFunctions.builders.size)
  }
}
