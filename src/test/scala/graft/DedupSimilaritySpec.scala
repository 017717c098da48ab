package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.similarity.Similarity

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different text with nothing shared at all here now")
  ).toDF("doc_id", "text")

  test("exactDedup keeps lowest id per content fingerprint") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("exactDedup is idempotent") {
    val once = Dedup.exactDedup(docs, "doc_id", "text")
    val twice = Dedup.exactDedup(once.drop("fingerprint"), "doc_id", "text")
    assert(once.count() == twice.count())
  }

  test("minhash LSH recalls exact and near dups, not unrelated docs") {
    val cands = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      k = 2, bands = 16, rowsPerBand = 2)
    val verified = Dedup.verifyJaccard(cands, docs, "doc_id", "text", k = 2,
        threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified.contains((1L, 2L)))
    assert(verified.contains((1L, 3L)) || verified.contains((2L, 3L)))
    assert(!verified.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical docs at hamming 0; unrelated docs farther than near-dups") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("blockedJaccardPairs finds the near-dup pair over a shared block") {
    val blocked = docs.withColumn("blk", lit("all"))
    val got = Dedup.blockedJaccardPairs(blocked, "doc_id", "text",
        Seq("blk"), k = 2, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)))
  }

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f)),   // near 1
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks the nearest vector first") {
    val got = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 1), "vec_id", "embedding", k = 1)
      .select("neighbor_id").as[Long].collect()
    assert(got.toSeq == Seq(2L))
  }

  test("lshTopK recall includes the true nearest neighbor (few planes, 3 dims)") {
    val got = Similarity.lshTopK(vecs, vecs.where(col("vec_id") === 1),
        "vec_id", "embedding", k = 1, numPlanes = 2, dim = 3)
      .select("neighbor_id").as[Long].collect()
    // with 2 planes the near-identical vector must share the bucket
    assert(got.toSeq == Seq(2L))
  }

  test("blockedCosinePairs finds only the near pair at high threshold") {
    val blocked = vecs.withColumn("label", lit(0))
    val got = Similarity.blockedCosinePairs(blocked, "vec_id", "embedding",
        "label", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
