package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator pins: maximal duplicated-span extraction (q241) and
  * the trained Cavnar–Trenkle language classifier (q242), both on
  * constructed fixtures with hand-computed expectations, plus structural
  * invariants on the real sf0.001 corpus. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stageDocs(rows: Seq[(Long, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r9_").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // ---------------------------------------------------- q241 fixture
  test("q241: overlapping cross-doc 5-grams merge into ONE maximal span; " +
    "distant spans stay separate; within-doc repeats do not count") {
    // docs 1↔2 share a 7-token phrase (3 overlapping 5-grams → one island
    // of span_tokens=7); docs 1↔3 also share a 5-gram far (gap 13 > 5)
    // into doc 1 → a second island; doc 4's only repeat is WITHIN itself
    // (cross-doc df = 1) so it must be absent entirely.
    val dir = stageDocs(Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 f1 f2 f3 f4 f5 f6 f7 f8 s1 s2 s3 s4 s5", "en"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 g1 g2 g3 g4 g5", "en"),
      (3L, "z1 z2 z3 z4 z5 s1 s2 s3 s4 s5", "en"),
      (4L, "r1 r2 r3 r4 r5 u1 u2 u3 r1 r2 r3 r4 r5", "en")))
    val got = SparkEntry.queries("q241_maximal_dup_spans")(spark, dir)
      .as[(Long, Int, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 7, 3L, 1L),   // merged maximal island over positions 0..2
      (1L, 15, 5, 1L, 1L),  // the distant single shared 5-gram
      (2L, 0, 7, 3L, 1L),
      (3L, 5, 5, 1L, 1L)), got.toString)
  }

  test("q241 on sf0.001: islands are maximal (inter-island gap > 5) and " +
    "span arithmetic is internally consistent") {
    val rows = SparkEntry.queries("q241_maximal_dup_spans")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Int, Int, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, start, tokens, ndup, partners) =>
      assert(start >= 0 && tokens >= 5 && ndup >= 1 && partners >= 1)
      // n_dup_positions positions all fit inside [start, start+tokens-5]
      assert(ndup <= tokens - 5 + 1)
    }
    // maximality: consecutive islands in one doc are > 5 positions apart
    // (else the gaps-and-islands rule would have merged them)
    rows.groupBy(_._1).values.foreach { perDoc =>
      perDoc.sortBy(_._2).sliding(2).foreach {
        case Seq((_, s1, t1, _, _), (_, s2, _, _, _)) =>
          val lastPos1 = s1 + t1 - 5
          assert(s2 - lastPos1 > 5, s"islands at $s1(+$t1) and $s2 overlap")
        case _ => ()
      }
    }
  }

  // ---------------------------------------------------- DagLayers
  test("DagLayers: diamond + chain gets exact longest-path layers; " +
    "isolated nodes land in layer 0; bound caps a deep chain") {
    import graft.ops.{DagLayers, Scc}
    // diamond 1→{2,3}→4 plus tail 4→5: longest path to 4 is 2, to 5 is 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val nodes = (1L to 6L).toDF("n") // 6 is isolated
    val got = DagLayers.layers(nodes, "n", edges, "a", "b", rounds = 8)
    val m = got.as[(Long, Int)].collect().toMap
    Scc.release(got)
    assert(m == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3, 6L -> 0), m)
    // a 10-deep chain under rounds=4 saturates at the bound
    val chain = (1L to 10L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("a", "b")
    val capped = DagLayers.layers((1L to 10L).toDF("n"), "n",
      chain, "a", "b", rounds = 4)
    val cm = capped.as[(Long, Int)].collect().toMap
    Scc.release(capped)
    assert(cm(5L) == 4 && cm(10L) == 4 && cm(3L) == 2,
      s"bounded layering should cap at 4: $cm")
  }

  // ---------------------------------------------------- q242 fixture
  test("q242: classifier trained on %5!=0 docs routes held-out docs to " +
    "the language whose trigram profile they match") {
    // lang "aa" docs are pure 'a' runs (single trigram "aaa"), lang "bb"
    // pure 'b' runs; ids 5 and 10 are the held-out docs (doc_id % 5 == 0).
    val dir = stageDocs(Seq(
      (1L, "aaaaaaaa", "aa"), (2L, "aaaaaa", "aa"),
      (3L, "aaaaaaa", "aa"), (4L, "aaaaa", "aa"),
      (5L, "aaaaaa", "aa"),
      (6L, "bbbbbbbb", "bb"), (7L, "bbbbbb", "bb"),
      (8L, "bbbbbbb", "bb"), (9L, "bbbbb", "bb"),
      (10L, "bbbbbb", "bb")))
    val got = SparkEntry.queries("q242_lang_classifier")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    // perfect confusion matrix: each held-out doc matches its own profile
    // at out-of-place distance 0 (rank 1 vs rank 1)
    assert(got == Seq(("aa", "aa", 1L, 0L), ("bb", "bb", 1L, 0L)),
      got.toString)
  }

  test("q242 is deterministic and every held-out doc gets exactly one " +
    "prediction on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q242_lang_classifier")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    val b = SparkEntry.queries("q242_lang_classifier")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(a == b, "argmin not deterministic across runs")
    // each held-out doc appears once: Σ n_docs over the confusion matrix
    // equals the number of held-out docs with ≥3 normalized chars
    val held = graft.tables.Tables.documents(spark, dir)
      .where(col("doc_id") % 5 === 0 &&
        length(lower(trim(col("text")))) >= 3)
      .count()
    assert(a.map(_._3).sum == held,
      s"confusion matrix covers ${a.map(_._3).sum} docs, expected $held")
  }
}
