package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Direct behavioral guards for the integrity pack (q205–q207) beyond
  * the DuckDB oracle: layout invariance, weighting direction, exact
  * corruption accounting, and the plan shapes the scaladocs promise. */
class IntegritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("q205 fingerprint is layout-invariant (match_fp true for every group)") {
    val rows = SparkEntry.queries("q205_table_fingerprint")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("match_fp")),
      "rewritten copy fingerprint diverged from the original")
  }

  test("q205 fingerprint aggregate is map-side combinable (partial bit_xor in plan)") {
    val plan = SparkEntry.queries("q205_table_fingerprint")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_bit_xor") || plan.contains("partial_bitxor"),
      "fingerprint XOR is not partially aggregated before the shuffle:\n" +
        plan.take(2000))
  }

  test("q206 weighted sampling prefers longer documents") {
    val picked = SparkEntry.queries("q206_weighted_sample")(spark, dir)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val corpus = graft.tables.Tables.documents(spark, dir)
      .where(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(picked > corpus,
      s"weighted top-20 mean length $picked not above corpus mean $corpus")
  }

  test("q206 selection is invariant to input partitioning") {
    val base = SparkEntry.queries("q206_weighted_sample")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val docs = graft.tables.Tables.documents(spark, dir).repartition(13)
    import graft.functions.HashFunctions.poly_hash
    val h = poly_hash(col("doc_id").cast("string"))
    val u = ((pmod(h, lit(1000000L)) + 1).cast("double")) / 1000002.0
    val re = docs.filter(col("n_chars") > 0)
      .select(col("doc_id"),
        round(log(u) / col("n_chars") * 1e9).cast("long").as("prio_nano"))
      .orderBy(col("prio_nano").desc, col("doc_id"))
      .limit(20).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(re == base, "top-20 changed under repartition(13)")
  }

  test("q206 plans a TakeOrdered, not a global sort exchange") {
    val plan = SparkEntry.queries("q206_weighted_sample")(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-20 did not plan as TakeOrdered:\n" + plan.take(2000))
  }

  test("q207 quarantines exactly the mangled rows (event_id % 7 == 0)") {
    val got = SparkEntry.queries("q207_corrupt_json_routing")(spark, dir)
      .select(col("event_type"), col("n_rows"), col("n_corrupt"),
        col("n_valid"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val want = graft.tables.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_id") % 7 === 0, 1L).otherwise(0L)).as("bad"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (et, (n, corrupt, valid)) =>
      val (wn, wbad) = want(et)
      assert(n == wn, s"$et: rows $n != $wn")
      assert(corrupt == wbad, s"$et: corrupt $corrupt != mangled $wbad")
      assert(valid == n - corrupt,
        s"$et: valid $valid + corrupt $corrupt != rows $n — a row was " +
          "neither parsed nor quarantined (or both)")
    }
  }
}
