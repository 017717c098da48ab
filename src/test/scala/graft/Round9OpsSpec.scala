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

  // ---------------------------------------------------- ScaleUp
  test("ScaleUp x2: volumes double, copies are key- and token-disjoint, " +
    "user domain stays contiguous, per-copy joins stay intact") {
    import graft.tables.Tables
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_scale_").toString
    graft.tools.ScaleUp.run(spark, src, out, 2)
    // volumes exactly double
    val d0 = Tables.documents(spark, src)
    val d2 = spark.read.parquet(s"$out/documents.parquet")
    assert(d2.count() == 2 * d0.count())
    // copies key-disjoint: copy 1 ids sit at +10^7
    val ids = d2.select(
      sum(when(col("doc_id") < 10000000L, 1L).otherwise(0L)),
      sum(when(col("doc_id") >= 10000000L, 1L).otherwise(0L))).head()
    assert(ids.getLong(0) == d0.count() && ids.getLong(1) == d0.count())
    // token-disjoint: no token occurs in both copies (the Caesar
    // rotation bijects every letter-bearing token; the corpus has none
    // without letters)
    val toks = d2.select((col("doc_id") >= 10000000L).as("c1"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(countDistinct("c1").as("nc"))
      .where(col("nc") > 1).count()
    assert(toks == 0L, s"$toks tokens shared across copies")
    // events user domain contiguous 0..2*(maxU+1)-1
    val maxU = Tables.events(spark, src).agg(max("user_id")).head().getLong(0)
    val ev2 = spark.read.parquet(s"$out/events.parquet")
    val (dn, mx) = (ev2.select(countDistinct("user_id")).head().getLong(0),
      ev2.agg(max("user_id")).head().getLong(0))
    assert(mx == 2 * (maxU + 1) - 1 && dn == 2 * (maxU + 1),
      s"user domain not contiguous: distinct=$dn max=$mx")
    // per-copy FK closure: the orders⋈lineitem join doubles exactly
    val j0 = Tables.orders(spark, src).join(Tables.lineitem(spark, src),
      col("o_orderkey") === col("l_orderkey")).count()
    val j2 = spark.read.parquet(s"$out/orders.parquet")
      .join(spark.read.parquet(s"$out/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(j2 == 2 * j0, s"join rows $j2 != 2*$j0")
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

  // ---------------------------------------------------- Sssp (q255 op)
  test("Sssp: bounded Bellman-Ford finds exact weighted shortest paths " +
    "on a hand-computed lane graph; the round cap bounds reach") {
    import graft.ops.{Scc, Sssp}
    // 0→1→2→3 local lane weights 5,1,9; express 0→3 weight 8;
    // 1→4 weight 2. Shortest: d(1)=5, d(2)=6, d(3)=8 (express beats
    // 5+1+9=15), d(4)=7.
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 1L), (2L, 3L, 9L),
      (0L, 3L, 8L), (1L, 4L, 2L)).toDF("a", "b", "w")
    val d = Sssp.bellmanFord(edges, "a", "b", "w", source = 0L, rounds = 4)
    val got = d.as[(Long, Long)].collect().toMap
    Scc.release(d)
    assert(got == Map(0L -> 0L, 1L -> 5L, 2L -> 6L, 3L -> 8L, 4L -> 7L), got)

    // K = 1: only direct edges out of the source are reached, at their
    // raw weight — node 3 via the 1-edge express (8), never the lane sum
    val d1 = Sssp.bellmanFord(edges, "a", "b", "w", source = 0L, rounds = 1)
    val got1 = d1.as[(Long, Long)].collect().toMap
    Scc.release(d1)
    assert(got1 == Map(0L -> 0L, 1L -> 5L, 3L -> 8L), got1)
  }

  test("Sssp: a K-capped distance can exceed the true shortest path and " +
    "is monotone non-increasing in K; negative weights are rejected") {
    import graft.ops.{Scc, Sssp}
    // 0→9 direct costs 100; the 3-hop detour 0→1→2→9 costs 3.
    val edges = Seq((0L, 9L, 100L), (0L, 1L, 1L), (1L, 2L, 1L),
      (2L, 9L, 1L)).toDF("a", "b", "w")
    def distAt(k: Int): Long = {
      val d = Sssp.bellmanFord(edges, "a", "b", "w", source = 0L, rounds = k)
      val v = d.where(col("s") === 9L).as[(Long, Long)].collect().head._2
      Scc.release(d); v
    }
    assert(distAt(1) == 100L) // cap under-reaches: direct edge only
    assert(distAt(2) == 100L) // detour still one edge short
    assert(distAt(3) == 3L)   // exact once K covers the detour
    val neg = Seq((0L, 1L, -1L)).toDF("a", "b", "w")
    val ex = intercept[IllegalArgumentException] {
      Sssp.bellmanFord(neg, "a", "b", "w", source = 0L, rounds = 1)
    }
    assert(ex.getMessage.contains("negative edge weight"))
  }

  test("q255 on sf0.001: reached set is the 12-round ball (<= 61 nodes), " +
    "node 0 at distance 0, and every distance is positive and exact " +
    "against an in-memory Dijkstra over the same overlay") {
    val rows = SparkEntry.queries("q255_sssp_distances")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 61, s"reached ${rows.size} nodes")
    val got = rows.toMap
    assert(got(0L) == 0L)
    // replay the overlay + a 12-edge-bounded Bellman-Ford in memory
    val maxU = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      .agg(max("user_id")).head().getLong(0)
    def w1(u: Long) = (u * 31 + 7) % 19 + 1
    def w5(u: Long) = (u * 17 + 3) % 53 + 7
    var dist = Map(0L -> 0L)
    for (_ <- 1 to 12) {
      var next = dist
      dist.foreach { case (u, du) =>
        if (u + 1 <= maxU) {
          val c = du + w1(u)
          if (c < next.getOrElse(u + 1, Long.MaxValue)) next += (u + 1) -> c
        }
        if (u + 5 <= maxU) {
          val c = du + w5(u)
          if (c < next.getOrElse(u + 5, Long.MaxValue)) next += (u + 5) -> c
        }
      }
      dist = next
    }
    assert(got == dist, "engine K-capped distances differ from replay")
  }
}
