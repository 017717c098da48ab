package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A persisted, hash-partitioned key→rows store over parquet with
  * PROBE-PROPORTIONAL IO — the file-native analogue of a keyed state
  * store, built for incremental pipelines (streaming-dedup posting
  * lists, per-doc stat lookups) where each micro-batch touches a small
  * key set of an arbitrarily large index.
  *
  * Classic directory-less linear hashing (Litwin '80) over parquet:
  * every bucket is a directory `__lb=L<level>I<idx>` holding the rows
  * whose key satisfies `pmod(hash(key), 2^level) == idx`, and buckets
  * SPLIT INDEPENDENTLY — when one exceeds `rowCap` rows it is rewritten
  * as its two children at level+1 (idx and idx + 2^level); siblings are
  * untouched. The addressing invariant: for any key hash exactly one
  * live bucket covers it — descend from the maximum live level until
  * the `(level, pmod(hash, 2^level))` directory exists. Probing a key
  * set therefore reads at most |distinct probe keys| buckets of
  * ~rowCap rows each — IO tracks the PROBE SET, never the index size —
  * and the write path rewrites only the touched buckets plus children
  * they split into. This is what makes a 100 TB keep-set probe-able by
  * a 1 GB micro-batch: with a FIXED bucket count, high-cardinality
  * probe keys hash into every bucket and per-bucket volume grows with
  * the index, so even a bucket-pruned join re-reads the keep side;
  * growable buckets bound both.
  *
  * Concurrency/replay contract (single writer — the foreachBatch
  * model): `rewrite` is deterministic given (index state, caller
  * delta), so a replayed micro-batch converges to the same state;
  * callers get exactly-once EFFECTS from at-least-once EXECUTION as
  * long as their merge function is idempotent (set-union of postings,
  * version-gated upserts). Dynamic partition overwrite swaps bucket
  * directories at job commit — a crash mid-commit leaves each bucket
  * either old or new, never mixed — and split parents are deleted only
  * after the children commit (a stale parent under a live child is
  * unreachable: probing prefers the highest live level).
  */
final class LinearHashIndex(spark: SparkSession, val root: String,
                            keyCol: String, schemaDDL: String,
                            rowCap: Long) {

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirName(level: Int, idx: Int): String = s"__lb=L${level}I$idx"

  /** Live buckets from a root listing: (level, idx) pairs. The listing
    * is one driver-side RPC bounded by the bucket count (index size /
    * rowCap), the same budget a table format's manifest read pays. */
  private[graft] def liveBuckets(): Set[(Int, Int)] = {
    val p = new Path(root)
    val raw =
      if (!fs.exists(p)) Set.empty[(Int, Int)]
      else fs.listStatus(p).iterator
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("__lb=L") =>
          val Array(l, i) = s.stripPrefix("__lb=L").split("I")
          (l.toInt, i.toInt)
        }
        .toSet
    // A parent whose BOTH children committed is a crash leftover from a
    // split whose final parent-delete didn't land — dead for addressing
    // (probing prefers the highest level); dropping it here keeps the
    // next rewrite from double-reading or re-splitting stale rows.
    raw.filterNot { case (l, i) =>
      raw((l + 1, i)) && raw((l + 1, i + (1 << l)))
    }
  }

  def exists: Boolean = liveBuckets().nonEmpty

  /** The live bucket covering max-level id `m`, by level descent. */
  private def resolve(m: Int, lMax: Int, live: Set[(Int, Int)]): (Int, Int) = {
    var l = lMax
    while (l >= 0) {
      val idx = m % (1 << l)
      if (live((l, idx))) return (l, idx)
      l -= 1
    }
    sys.error(s"LinearHashIndex $root: no live bucket covers id $m " +
      s"(levels <= $lMax) — index corrupt or empty")
  }

  /** Distinct live buckets covered by `keys` (a frame holding
    * `keyCol`). The collected set is bounded by the live bucket count,
    * never the key count. */
  private def touched(keys: DataFrame, live: Set[(Int, Int)]): Seq[(Int, Int)] = {
    val lMax = live.iterator.map(_._1).max
    keys.select(pmod(hash(col(keyCol)), lit(1 << lMax)).cast("int").as("m"))
      .distinct().collect().map(_.getInt(0))
      .map(resolve(_, lMax, live)).distinct.toIndexedSeq
  }

  private def emptyFrame: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row], StructType.fromDDL(schemaDDL))

  private def readBuckets(buckets: Seq[(Int, Int)]): DataFrame =
    if (buckets.isEmpty) emptyFrame
    else spark.read.schema(schemaDDL)
      .parquet(buckets.map { case (l, i) => s"$root/${dirName(l, i)}" }: _*)

  /** All rows of the buckets covering `keys` — the PROBE. The caller
    * joins/filters; co-bucketed foreign keys ride along (≤ ~rowCap per
    * touched bucket — the slack every hash index trades for pointwise
    * IO). */
  def probe(keys: DataFrame): DataFrame =
    readBuckets(touched(keys, liveBuckets()))

  /** Full scan — bootstrap audits only, never the per-batch path. */
  def allRows(): DataFrame = readBuckets(liveBuckets().toSeq)

  /** Seed an empty index, choosing the initial level so the expected
    * bucket holds ~rowCap/2 rows (split headroom). */
  def bootstrap(rows: DataFrame): Unit = {
    require(!exists, s"LinearHashIndex $root already exists")
    val n = rows.count()
    val l0 = math.max(0, math.ceil(
      math.log(math.max(1.0, n.toDouble * 2 / rowCap)) / math.log(2)).toInt)
    write(rows, Set.tabulate(1 << l0)(i => (l0, i)))
  }

  /** Read the buckets covering `keys`, hand ALL their current rows to
    * `f`, replace those buckets with `f`'s result. `f` returns the full
    * replacement content for the touched key-space (old rows merged
    * with the caller's delta), and every result key must hash into the
    * touched buckets — enforced at write time. Overflowing result
    * buckets split into children; emptied buckets stay live with zero
    * rows (the directory IS the addressing invariant). */
  def rewrite(keys: DataFrame)(f: DataFrame => DataFrame): Unit = {
    val live = liveBuckets()
    require(live.nonEmpty, s"LinearHashIndex $root: bootstrap first")
    val touch = touched(keys, live)
    if (touch.isEmpty) return
    val out = f(readBuckets(touch)).localCheckpoint(true)
    try write(out, touch.toSet)
    finally org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(out)
  }

  /** Bucket-name assignment for one row under the current target set:
    * the highest-level matching target wins, mirroring `resolve`. */
  private def assignCol(targets: Set[(Int, Int)], lTop: Int): Column = {
    val m = pmod(hash(col(keyCol)), lit(1 << lTop)).cast("int")
    var e: Column = lit(null).cast("string")
    for (l <- 0 to lTop) { // higher levels overwrite lower: last WHEN wins
      val idxs = targets.iterator.filter(_._1 == l).map(_._2).toSeq
      if (idxs.nonEmpty) {
        val idx = pmod(m, lit(1 << l)).cast("int")
        e = when(idx.isin(idxs.map(Integer.valueOf): _*),
          concat(lit(s"L${l}I"), idx.cast("string"))).otherwise(e)
      }
    }
    e
  }

  /** Assign rows to target buckets (splitting past rowCap), swap them
    * in via dynamic partition overwrite, then retire split parents. */
  private def write(rows: DataFrame, targets0: Set[(Int, Int)]): Unit = {
    var targets = targets0
    var lTop = targets.iterator.map(_._1).max
    def counted(): Map[String, Long] =
      rows.withColumn("__lb", assignCol(targets, lTop))
        .groupBy("__lb").agg(count(lit(1)).as("c"))
        .collect().map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1))
        .toMap
    // Split loop on driver-side counts: rows only move parent→child, so
    // each pass recounts under the refined assignment until no target
    // exceeds the cap; levels strictly increase per split, so it
    // terminates in ≤ log2(maxBucketRows/rowCap)+1 passes.
    var counts = counted()
    require(!counts.contains("null"),
      s"LinearHashIndex $root: rewrite produced keys outside the touched buckets")
    var splitParents = List.empty[(Int, Int)]
    var overflow = counts.filter(_._2 > rowCap).keys.toList
    while (overflow.nonEmpty) {
      overflow.foreach { nm =>
        val Array(l, i) = nm.stripPrefix("L").split("I")
        val (lv, ix) = (l.toInt, i.toInt)
        targets -= ((lv, ix))
        splitParents ::= ((lv, ix))
        targets += ((lv + 1, ix)); targets += ((lv + 1, ix + (1 << lv)))
        lTop = math.max(lTop, lv + 1)
      }
      counts = counted()
      overflow = counts.filter(_._2 > rowCap).keys.toList
    }
    val assigned = rows.withColumn("__lb", assignCol(targets, lTop))
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try assigned
      .repartition(math.max(1, targets.size), col("__lb"))
      .write.mode("overwrite").partitionBy("__lb").parquet(root)
    finally prev match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None => spark.conf.unset(modeKey)
    }
    // Zero-row targets: dynamic overwrite never touched them — clear any
    // stale content and keep the directory live (addressing invariant).
    for ((l, i) <- targets if !counts.contains(s"L${l}I$i")) {
      val d = new Path(s"$root/${dirName(l, i)}")
      if (fs.exists(d)) fs.delete(d, true)
      fs.mkdirs(d)
    }
    for ((l, i) <- splitParents)
      fs.delete(new Path(s"$root/${dirName(l, i)}"), true)
  }
}
