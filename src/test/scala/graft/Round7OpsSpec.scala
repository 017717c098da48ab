package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.ops.LabelPropagation
import graft.queries.EngineQueries

/** Round-7 operator pins: label-propagation convergence/determinism,
  * real WAV encode→decode roundtrip, codepoint PolyHash, and the BPE
  * greedy-merge fold vs a reference scan. */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------- LPA
  private def cliqueGraph() = {
    // two triangles {1,2,3} and {10,11,12} bridged by 3–10
    val base = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("a", "b")
    base.union(base.select(col("b").as("a"), col("a").as("b")))
  }

  test("LPA converges to one community per clique with min-label ids") {
    val labels = LabelPropagation.propagate(cliqueGraph(), "a", "b", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(Set(1L, 2L, 3L).map(labels) == Set(1L),
      s"left clique not unified: $labels")
    assert(Set(10L, 11L, 12L).map(labels) == Set(10L),
      s"right clique not unified: $labels")
  }

  test("LPA is stable at convergence and deterministic across runs") {
    val g = cliqueGraph()
    val r4 = LabelPropagation.propagate(g, "a", "b", rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val r5 = LabelPropagation.propagate(g, "a", "b", rounds = 5)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val r4again = LabelPropagation.propagate(g, "a", "b", rounds = 4)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(r4 == r5, "labels changed after convergence")
    assert(r4 == r4again, "repeated run diverged — nondeterminism")
  }

  // ------------------------------------------------------------- WAV
  test("WAV roundtrip: real javax.sound encode→decode matches the formula") {
    val docs = Seq((7L, 23L), (42L, 61L)).toDF("doc_id", "n_chars")
    val stats = Multimodal.wavStats(Multimodal.wavFromDocuments(docs))
      .collect().map(s => s.media_id -> s).toMap
    Seq((7L, 23L), (42L, 61L)).foreach { case (id, nc) =>
      val n = (nc % 50 + 20).toInt
      val samples = (0 until n).map(i =>
        java.lang.Math.floorMod(id * 37 + 11L * i, 4096L) - 2048L)
      val s = stats(id)
      assert(s.sample_rate == 8000 && s.n_channels == 1 && s.bits == 16)
      assert(s.n_samples == n.toLong, s"n_samples ${s.n_samples} != $n")
      assert(s.amp_sum == samples.sum)
      assert(s.amp_min == samples.min && s.amp_max == samples.max)
      assert(s.energy == samples.map(v => v * v).sum)
    }
  }

  test("WAV decode fails loudly on an undecodable payload") {
    val junk = spark.createDataset(Seq(Multimodal.MediaRecord(
      1L, "audio", Array[Byte](1, 2, 3, 4),
      Multimodal.MediaMeta(0, 0, 8000, 0L, "wav"))))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.wavStats(junk).collect()
    }
    assert(e.getCause.getMessage.contains("not a decodable WAV"),
      s"unexpected failure: ${e.getCause}")
  }

  // -------------------------------------------------------- PolyHash
  test("poly_hash iterates code points (non-BMP matches the oracle domain)") {
    val mod = 1000000007L
    def ref(s: String): Long = {
      var acc = 0L
      s.codePoints().forEach(cp => acc = (acc * 31 + cp) % mod)
      acc
    }
    val inputs = Seq("abc", "a😀b", "😀😁", "")
    val got = inputs.toDF("t")
      .select(graft.functions.HashFunctions.poly_hash(col("t")).as("h"))
      .as[Long].collect().toSeq
    assert(got == inputs.map(ref),
      s"poly_hash diverged from codepoint reference: $got")
  }

  // ------------------------------------------------------- BPE merge
  test("BPE fold merge equals the greedy left-to-right reference scan") {
    def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),            // odd run: parity rule
      (Seq("a", "a", "a", "a"), "a", "a"),       // even run
      (Seq("a", "b", "a", "b", "a", "b"), "a", "b"), // isolated matches
      (Seq("a", "b"), "a", "b"),                 // whole word merges
      (Seq("x", "y", "z"), "a", "b"),            // no match
      (Seq("q"), "a", "b"))                      // single symbol
    cases.foreach { case (syms, l, r) =>
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(expr(EngineQueries.bpeMergeExpr(l, r)).as("m"))
        .as[Seq[String]].head()
      assert(got == refMerge(syms, l, r),
        s"fold($syms, $l+$r) = $got != ${refMerge(syms, l, r)}")
    }
  }
}
