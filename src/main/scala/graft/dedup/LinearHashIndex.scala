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
  * every bucket is a directory `__lb=L<level>I<idx>G<gen>` holding the
  * rows whose key satisfies `pmod(hash(key), 2^level) == idx`, and
  * buckets SPLIT INDEPENDENTLY — when one exceeds `rowCap` rows it is
  * rewritten as its two children at level+1 (idx and idx + 2^level);
  * siblings are untouched. The addressing invariant: for any key hash
  * exactly one live bucket covers it — descend from the maximum live
  * level until a live `(level, pmod(hash, 2^level))` bucket exists.
  * Probing a key set therefore reads at most |distinct probe keys|
  * buckets of ~rowCap rows each — IO tracks the PROBE SET, never the
  * index size — and the write path rewrites only the touched buckets
  * plus children they split into. This is what makes a 100 TB keep-set
  * probe-able by a 1 GB micro-batch: with a FIXED bucket count,
  * high-cardinality probe keys hash into every bucket and per-bucket
  * volume grows with the index, so even a bucket-pruned join re-reads
  * the keep side; growable buckets bound both.
  *
  * Visibility/commit contract (the r11→r12 change): the index no
  * longer self-describes through a root listing. The LIVE BUCKET SET
  * is owned by the caller — in production an [[IndexManifest]]
  * snapshot covering every index of the pipeline — and every read
  * (`probe`/`allRows`) and write (`rewrite`) resolves through the set
  * passed in. Writes land in FRESH generation-suffixed directories
  * (`G<gen+1>`) and return the successor set; nothing committed is
  * modified in place, so a crash before the caller's manifest commit
  * leaves readers on the previous fully-consistent snapshot of ALL
  * indexes, and a deterministic retry overwrites the same
  * fresh-generation leftovers. `gc(keep)` deletes unreferenced bucket
  * directories and is called only after the manifest lands.
  *
  * Single writer (the foreachBatch model): `rewrite` is deterministic
  * given (live set, caller delta), so a replayed micro-batch converges
  * to the same directories and content; callers get exactly-once
  * EFFECTS from at-least-once EXECUTION as long as their merge
  * function is idempotent (set-union of postings, version-gated
  * upserts) — and with the manifest, batches already reflected in the
  * committed snapshot can skip the write path entirely.
  */
final class LinearHashIndex(spark: SparkSession, val root: String,
                            keyCol: String, schemaDDL: String,
                            rowCap: Long) {
  import LinearHashIndex.{bucketId, parseId}

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketPath(id: String): String = s"$root/__lb=$id"

  /** (level, idx) → (gen, id) for a pinned live set; exactly one live
    * bucket per (level, idx) — duplicates mean a corrupt manifest. */
  private def levelMap(live: Set[String]): Map[(Int, Int), String] = {
    val m = live.iterator.map { id =>
      val (l, i, _) = parseId(id); ((l, i), id)
    }.toMap
    require(m.size == live.size,
      s"LinearHashIndex $root: pinned set names two generations of one " +
        s"bucket: $live")
    m
  }

  /** The live bucket covering max-level id `m`, by level descent. */
  private def resolve(m: Int, lMax: Int, lm: Map[(Int, Int), String]): String = {
    var l = lMax
    while (l >= 0) {
      val hit = lm.get((l, m % (1 << l)))
      if (hit.isDefined) return hit.get
      l -= 1
    }
    sys.error(s"LinearHashIndex $root: no live bucket covers id $m " +
      s"(levels <= $lMax) — pinned set incomplete")
  }

  /** Distinct live buckets covered by `keys` (a frame holding
    * `keyCol`). The collected set is bounded by the live bucket count,
    * never the key count. */
  private def touched(keys: DataFrame, lm: Map[(Int, Int), String]): Seq[String] = {
    val lMax = lm.keysIterator.map(_._1).max
    keys.select(pmod(hash(col(keyCol)), lit(1 << lMax)).cast("int").as("m"))
      .distinct().collect().map(_.getInt(0))
      .map(resolve(_, lMax, lm)).distinct.toIndexedSeq
  }

  private def emptyFrame: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row], StructType.fromDDL(schemaDDL))

  private def readBuckets(ids: Seq[String]): DataFrame =
    if (ids.isEmpty) emptyFrame
    else spark.read.schema(schemaDDL).parquet(ids.map(bucketPath): _*)

  /** All rows of the live buckets covering `keys` — the PROBE. The
    * caller joins/filters; co-bucketed foreign keys ride along
    * (≤ ~rowCap per touched bucket — the slack every hash index trades
    * for pointwise IO). */
  def probe(keys: DataFrame, live: Set[String]): DataFrame = {
    require(live.nonEmpty,
      s"LinearHashIndex $root: bootstrap first (empty pinned bucket set)")
    readBuckets(touched(keys, levelMap(live)))
  }

  /** Full scan of a pinned snapshot — bootstrap audits only, never the
    * per-batch path. */
  def allRows(live: Set[String]): DataFrame = readBuckets(live.toSeq.sorted)

  /** Seed the index at generation 0, choosing the initial level so the
    * expected bucket holds ~rowCap/2 rows (split headroom). Returns the
    * bucket set the caller must commit to its manifest — nothing is
    * visible until then. */
  def bootstrap(rows: DataFrame): Set[String] = {
    val n = rows.count()
    val l0 = math.max(0, math.ceil(
      math.log(math.max(1.0, n.toDouble * 2 / rowCap)) / math.log(2)).toInt)
    write(rows, Set.tabulate(1 << l0)(i => (l0, i, 0)))
  }

  /** Read the live buckets covering `keys`, hand ALL their current rows
    * to `f`, write `f`'s result as those buckets' NEXT GENERATION.
    * `f` returns the full replacement content for the touched key-space
    * (old rows merged with the caller's delta), and every result key
    * must hash into the touched buckets — enforced at write time.
    * Overflowing result buckets split into children; emptied buckets
    * stay live with zero rows. Returns the successor live set; the old
    * generation stays on disk (and readable through the old set) until
    * the caller commits and calls [[gc]]. */
  def rewrite(keys: DataFrame, live: Set[String])
             (f: DataFrame => DataFrame): Set[String] = {
    require(live.nonEmpty,
      s"LinearHashIndex $root: bootstrap first (empty pinned bucket set)")
    val lm = levelMap(live)
    val touch = touched(keys, lm)
    if (touch.isEmpty) return live
    val out = f(readBuckets(touch)).localCheckpoint(true)
    val targets = touch.map { id =>
      val (l, i, g) = parseId(id); (l, i, g + 1)
    }.toSet
    val written =
      try write(out, targets)
      finally org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(out)
    live -- touch ++ written
  }

  /** Delete every bucket directory not in `keep` — crash leftovers and
    * superseded generations. Call only AFTER the manifest naming `keep`
    * has committed. */
  def gc(keep: Set[String]): Unit = {
    val p = new Path(root)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { s =>
      val nm = s.getPath.getName
      if (nm.startsWith("__lb=") && !keep(nm.stripPrefix("__lb=")))
        fs.delete(s.getPath, true)
    }
  }

  /** Bucket-id assignment for one row under the current target set:
    * the highest-level matching target wins, mirroring `resolve`; the
    * per-target generation rides a literal map keyed by (level, idx). */
  private def assignCol(targets: Set[(Int, Int, Int)], lTop: Int): Column = {
    val m = pmod(hash(col(keyCol)), lit(1 << lTop)).cast("int")
    var key: Column = lit(null).cast("string")
    for (l <- 0 to lTop) { // higher levels overwrite lower: last WHEN wins
      val idxs = targets.iterator.filter(_._1 == l).map(_._2).toSeq
      if (idxs.nonEmpty) {
        val idx = pmod(m, lit(1 << l)).cast("int")
        key = when(idx.isin(idxs.map(Integer.valueOf): _*),
          concat(lit(s"L${l}I"), idx.cast("string"))).otherwise(key)
      }
    }
    val nameMap = map(targets.toSeq.flatMap { case (l, i, g) =>
      Seq(lit(s"L${l}I$i"), lit(bucketId(l, i, g)))
    }: _*)
    element_at(nameMap, key)
  }

  /** Assign rows to target buckets (splitting past rowCap) and write
    * them as fresh directories. Returns the written bucket ids. */
  private def write(rows: DataFrame, targets0: Set[(Int, Int, Int)]): Set[String] = {
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
    var overflow = counts.filter(_._2 > rowCap).keys.toList
    while (overflow.nonEmpty) {
      overflow.foreach { nm =>
        val (lv, ix, g) = parseId(nm)
        targets -= ((lv, ix, g))
        // children inherit the parent TARGET's generation: a (level,
        // idx) that is live was never split before, so the child id is
        // fresh vs every committed snapshot
        targets += ((lv + 1, ix, g)); targets += ((lv + 1, ix + (1 << lv), g))
        lTop = math.max(lTop, lv + 1)
      }
      counts = counted()
      overflow = counts.filter(_._2 > rowCap).keys.toList
    }
    // Targets are fresh names (never manifest-committed); any existing
    // directory under one is a crashed attempt's leftover — clear it so
    // the plain append below is exact, then append only non-empty
    // buckets and mkdir the empty ones (readBuckets reads an empty dir
    // through the explicit schema).
    for ((l, i, g) <- targets) {
      val d = new Path(bucketPath(bucketId(l, i, g)))
      if (fs.exists(d)) fs.delete(d, true)
    }
    val assigned = rows.withColumn("__lb", assignCol(targets, lTop))
    assigned
      .repartition(math.max(1, targets.size), col("__lb"))
      .write.mode("append").partitionBy("__lb").parquet(root)
    for ((l, i, g) <- targets if !counts.contains(bucketId(l, i, g)))
      fs.mkdirs(new Path(bucketPath(bucketId(l, i, g))))
    targets.map { case (l, i, g) => bucketId(l, i, g) }
  }
}

object LinearHashIndex {
  private[dedup] def bucketId(l: Int, i: Int, g: Int): String = s"L${l}I${i}G$g"

  private val IdRe = "L(\\d+)I(\\d+)G(\\d+)".r

  private[dedup] def parseId(id: String): (Int, Int, Int) = id match {
    case IdRe(l, i, g) => (l.toInt, i.toInt, g.toInt)
    case _ => sys.error(s"bad bucket id: $id")
  }
}
