package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.ops.StockOps

/** Property-based tests (SURVEY.md §5.3): dedup idempotence, union
  * commutativity, pct-change algebra, high-watermark monotonicity.
  * Generators stay small — each property materializes Spark jobs. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Seeded scalacheck sampling (the scalatest-scalacheck bridge artifact
    * is not in the offline cache, so properties drive Gen directly). */
  private def forAll[A](gen: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 5).foreach { i =>
      for {
        a <- g1.apply(Gen.Parameters.default, Seed(42L + i))
        b <- g2.apply(Gen.Parameters.default, Seed(142L + i))
      } f(a, b)
    }
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val docGen = Gen.listOfN(8,
    Gen.zip(Gen.choose(0L, 20L),
      Gen.listOfN(6, Gen.oneOf("the", "fast", "key", "order", "spark", "row"))
        .map(_.mkString(" "))))

  test("property: exact dedup is idempotent") {
    forAll(docGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("doc_id", "text")
        val once = Dedup.exactDedup(df, "doc_id", "text")
        val twice = Dedup.exactDedup(once.drop("fingerprint"), "doc_id", "text")
        assert(once.count() == twice.count())
        // and no two kept rows share a fingerprint
        val n = once.select("fingerprint").distinct().count()
        assert(n == once.count())
      }
    }
  }

  test("property: union is commutative under re-aggregation (U1)") {
    forAll(Gen.listOfN(6, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(1, 100)))) { rows =>
      whenever(rows.nonEmpty) {
        val df1 = rows.toDF("k", "v")
        val df2 = rows.reverse.toDF("k", "v")
        def agg(d: org.apache.spark.sql.DataFrame) =
          d.groupBy("k").agg(sum("v").as("s")).as[(String, Long)].collect().toMap
        assert(agg(df1.unionByName(df2)) == agg(df2.unionByName(df1)))
      }
    }
  }

  test("property: pctChange sign agrees with movement; zero open → null") {
    forAll(Gen.listOfN(8, Gen.zip(Gen.choose(0.0, 50.0), Gen.choose(0.01, 50.0)))) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("open", "close")
        val got = df.select(
          StockOps.movement(col("close"), col("open")).as("m"),
          StockOps.pctChange(col("close"), col("open")).as("p"),
          col("open")).collect()
        got.foreach { r =>
          val m = r.getInt(0)
          val open = r.getDouble(2)
          if (open == 0.0) assert(r.isNullAt(1))
          else {
            val p = r.getDouble(1)
            if (m == 1) assert(p >= 0.0) else assert(p <= 0.0)
          }
        }
      }
    }
  }

  test("property: incremental filter output is strictly above the per-key watermark") {
    val gen = Gen.listOfN(10, Gen.zip(Gen.oneOf("x", "y"), Gen.choose(1L, 1000L)))
    forAll(gen, gen) { (seenRows, newRows) =>
      whenever(seenRows.nonEmpty && newRows.nonEmpty) {
        val seen = seenRows.toDF("symbol", "t")
          .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
        val inc = newRows.toDF("symbol", "t")
          .withColumn("ts", timestamp_seconds(col("t"))).drop("t")
        val hwm = seenRows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        val got = StockOps.incrementalFilter(inc, seen, "symbol", "ts")
          .select(col("symbol"), unix_timestamp(col("ts")))
          .as[(String, Long)].collect()
        got.foreach { case (k, t) =>
          assert(hwm.get(k).forall(t > _), s"row ($k,$t) not past watermark ${hwm.get(k)}")
        }
        // completeness: every qualifying row survives
        val expected = newRows.count { case (k, t) => hwm.get(k).forall(t > _) }
        assert(got.length == expected)
      }
    }
  }

  test("property: jaccard is symmetric and bounded [0,1]") {
    forAll(docGen) { rows =>
      whenever(rows.size >= 2) {
        val df = rows.toDF("doc_id", "text").withColumn("blk", lit(1))
        val pairs = Dedup.blockedJaccardPairs(df, "doc_id", "text", Seq("blk"),
            k = 2, threshold = 0.0)
          .select("jaccard").as[Double].collect()
        pairs.foreach(j => assert(j >= 0.0 && j <= 1.0))
      }
    }
  }

  test("property: asofNearest equals the naive pairs-within-tolerance argmin") {
    import graft.timeseries.TimeSeries
    val rowsGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 1000L)))
    forAll(rowsGen, rowsGen) { (lRows, rRows) =>
      whenever(lRows.nonEmpty && rRows.nonEmpty) {
        val tolUs = 120L * 1000000
        val left = lRows.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "lid")
          .withColumn("ts", timestamp_seconds(col("t")))
        val right = rRows.zipWithIndex
          .map { case ((k, t), i) => (k, t, i.toLong + 1000, t.toDouble) }
          .toDF("k", "rt", "rid", "payload")
          .withColumn("rts", timestamp_seconds(col("rt")))
        val got = TimeSeries.asofNearest(left, right, "k", "ts", "rts",
            payload = Seq("payload"), rightOrder = "rid", toleranceUs = tolUs)
          .select("lid", "rid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        // naive oracle: all pairs, min |delta|; backward wins ties, then
        // latest backward rid / earliest forward rid
        val expected = lRows.zipWithIndex.map { case ((lk, lt), i) =>
          val cands = rRows.zipWithIndex
            .map { case ((rk, rt), j) => (rk, rt, j.toLong + 1000) }
            .filter { case (rk, rt, _) =>
              rk == lk && math.abs(rt - lt) * 1000000L <= tolUs }
          val best = cands.sortBy { case (_, rt, rid) =>
            (math.abs(rt - lt), if (rt <= lt) 0 else 1,
              if (rt <= lt) -rid else rid)
          }.headOption.map(_._3)
          i.toLong -> best
        }.toMap
        assert(got == expected, s"left=$lRows right=$rRows")
      }
    }
  }

  test("property: mergeIntoParquet is idempotent and batch-order independent") {
    import graft.streaming.Pipelines
    val batchGen = Gen.listOfN(6,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0, 3), Gen.choose(0, 99)))
    forAll(batchGen, batchGen) { (b1, b2) =>
      whenever(b1.nonEmpty && b2.nonEmpty) {
        def rows(b: List[((Long, Int), Int)]) = b.zipWithIndex.map {
          case (((k, rev), v), i) => (k, rev * 10 + i, v.toDouble)
        } // unique versions so latest-wins is deterministic
        val r1 = rows(b1.map { case (k, r, v) => ((k, r), v) })
        val r2 = rows(b2.map { case (k, r, v) => ((k, r), v) })
          .map { case (k, ver, v) => (k, ver + 100, v) }
        def applyAll(batches: Seq[Seq[(Long, Int, Double)]]): Set[(Long, Int, Double)] = {
          val dir = java.nio.file.Files.createTempDirectory("mprop_").toString + "/s"
          batches.foreach { b =>
            Pipelines.mergeIntoParquet(b.toDF("k", "rev", "v"), dir,
              key = "k", version = "rev", tiebreak = "k", nBuckets = 4)
          }
          spark.read.parquet(dir).select("k", "rev", "v")
            .as[(Long, Int, Double)].collect().toSet
        }
        val once = applyAll(Seq(r1, r2))
        val replayed = applyAll(Seq(r1, r2, r2)) // crash-replay of batch 2
        val swapped = applyAll(Seq(r2, r1)) // out-of-order arrival
        assert(once == replayed, s"replay diverged: $once vs $replayed")
        assert(once == swapped, s"order mattered: $once vs $swapped")
      }
    }
  }

  test("DotProductD is bit-identical to the aggregate(zip_with) HOF formulation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(
      (Array.fill(16)(rnd.nextDouble()), Array.fill(16)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
    val got = df.select(
        graft.functions.HashFunctions.dot_d(col("a"), col("b")).as("d"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("h"))
      .as[(Double, Double)].collect()
    got.foreach { case (d, h) => assert(d == h) } // exact, not approx
  }

  test("property: bloom pre-filter never drops a matching fact row (no false negatives)") {
    forAll(Gen.chooseNum(1, 500), n = 3) { dimSize =>
      val fact = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 3).as("v"))
      val dim = spark.range(0, dimSize.toLong)
        .select((col("id") * 7 % 2000).as("k")).distinct()
      val pre = graft.ops.BloomJoin.bloomPrefilter(
        fact, "k", dim, "k", expectedDimKeys = dimSize.toLong)
      val exact = fact.join(dim, "k").count()
      val prefiltered = pre.join(dim, "k").count()
      assert(prefiltered == exact,
        s"bloom dropped matching rows: $prefiltered != $exact")
      // and it actually filters: the pass-through superset stays small
      assert(pre.count() >= exact)
    }
  }

  test("property: tombstone merge — newest delete wins, stale updates cannot resurrect") {
    import graft.ops.Merge
    // key 1: update then delete (delete newest) → gone
    // key 2: delete then LATER update → resurrected legitimately
    // key 3: base only → survives
    val base = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L))
      .toDF("k", "payload", "ver").withColumn("src", lit(0))
    val changes = Seq(
      (1L, "a2", 1L, 1, "U"), (1L, "GONE", 2L, 1, "D"),
      (2L, "DEAD", 1L, 1, "D"), (2L, "b2", 2L, 1, "U"))
      .toDF("k", "payload", "ver", "src", "op")
    val got = Merge.mergeWithDeletes(base, changes,
        key = "k", version = "ver", tiebreak = "src", opCol = "op")
      .select("k", "payload").as[(Long, String)].collect().toSet
    assert(got == Set((2L, "b2"), (3L, "c")), got)
  }

  test("property: CharEntropyStats matches a reference histogram computation") {
    import graft.functions.HashFunctions.char_entropy_stats
    // non-BMP codepoints included: an emoji must be ONE histogram entry
    // (codepoint semantics), not a surrogate pair
    val strGen = Gen.listOfN(40,
      Gen.frequency(7 -> Gen.alphaNumChar.map(_.toString),
        2 -> Gen.oneOf(" ", ".", ",", "!"),
        1 -> Gen.oneOf("😀", "𝄞")))
      .map(_.mkString)
    forAll(strGen, n = 8) { s =>
      val row = Seq(Tuple1(s)).toDF("t")
        .select(char_entropy_stats(col("t")).as("st"))
        .select(col("st.n_chars"), col("st.n_unique"), col("st.ent_sum"))
        .head
      // reference: histogram over sorted distinct CODEPOINTS, in order
      val runs = s.codePoints.toArray.sorted.toSeq
        .groupBy(identity).toSeq.sortBy(_._1).map(_._2.length)
      val n = s.codePointCount(0, s.length)
      val expected = runs.foldLeft(0.0) { (acc, cnt) =>
        val p = cnt.toDouble / n.toDouble
        acc + p * (math.log(p) / math.log(2.0))
      }
      assert(row.getInt(0) == n)
      assert(row.getInt(1) == runs.length)
      assert(row.getDouble(2) == expected,
        s"entropy mismatch for ${s.take(20)}…: ${row.getDouble(2)} vs $expected")
    }
  }
}
