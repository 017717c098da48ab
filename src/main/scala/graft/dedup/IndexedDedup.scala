package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming corpus dedup against PERSISTED indexes — the scale form of
  * [[Dedup.incrementalDedup]] (which re-shingles the entire keep-set
  * every micro-batch; see its production caveat). Verdicts are
  * BIT-IDENTICAL to running `incrementalDedup(keep, batch)` per batch
  * (q274's semantics, oracle-replayed): same k-shingle Jaccard, same
  * keep∪batch document-frequency cap, same min-label components, same
  * kept / dup_of_keep / dup_in_drop statuses. What changes is the cost
  * shape: per batch the keep side is touched only through two
  * [[LinearHashIndex]] probes whose IO tracks the batch's key sets —
  * keep texts are never re-read, keep shingles never recomputed.
  *
  * State (both linear-hash indexes, bucket IO ∝ probe set):
  *   - SHINGLE index `(s, doc_id)`: posting lists of every keep doc for
  *     every shingle whose keep-side df is ≤ maxShingleDf; a shingle
  *     that crosses the cap is PERMANENTLY collapsed to one tombstone
  *     row `(s, -1)` (keep only grows, so keep-side df is monotone) —
  *     hot postings would otherwise grow without bound and poison the
  *     probe-proportionality of their buckets.
  *   - DOC index `(doc_id, n_keep, ver)`: per keep doc, its count of
  *     currently-surviving shingles (|sh(d)| minus tombstoned), plus
  *     the last-writer batch id. Doubles as the keep-membership set for
  *     rep classification.
  *
  * Per batch: probe the shingle index by the batch's shingle set; the
  * combined df of shingle s is |postings(s)| + batch-count(s), so the
  * batch-relative hot set (tombstoned ∪ over-cap-combined) falls out of
  * the probe with no global aggregation; candidate pairs are
  * batch×postings and batch×batch on surviving shingles only; keep-doc
  * Jaccard sizes are doc-index lookups corrected by the probe-visible
  * batch-hot shingles. Components and statuses as in
  * `incrementalDedup`.
  *
  * ATOMIC VISIBILITY (VERDICT r11 #1 — closes the crash window the r11
  * design documented): both indexes resolve through ONE
  * [[IndexManifest]] snapshot naming their current bucket generations
  * plus the last applied batch id. Index rewrites land in fresh
  * generation directories that no reader can see; the batch becomes
  * visible only when the single-file manifest rename commits BOTH new
  * bucket sets and the batch id together. A crash anywhere between the
  * first bucket write and the manifest rename leaves readers —
  * including the replayed batch itself — on the previous consistent
  * snapshot; the replay recomputes the same verdicts and re-writes the
  * same fresh directories (processBatch is deterministic given
  * manifest state + batch). A replay AFTER the manifest landed sees
  * `batchSeq ≤ manifest.batchSeq`, recomputes verdicts read-only (the
  * keep side of pair/df computation excludes the batch's doc ids, so
  * state already extended yields the same verdicts), and skips the
  * write path. The verdict sink stays outside the manifest and keeps
  * its own idempotent version-gated MERGE, as before.
  */
object IndexedDedup {

  final case class Indexes(shingle: LinearHashIndex, doc: LinearHashIndex,
                           manifest: IndexManifest)

  val ShingleSchema = "s STRING, doc_id BIGINT"
  val DocSchema = "doc_id BIGINT, n_keep BIGINT, ver BIGINT"

  /** Manifest index names. */
  private val ShingleIx = "shingle"
  private val DocIx = "doc"

  /** Crash-injection points for the commit-protocol specs: between the
    * two index rewrites, and after both rewrites but before the
    * manifest rename. Production never sets these. */
  private[graft] var testCrashBetweenIndexWrites: () => Unit = () => ()
  private[graft] var testCrashBeforeManifestCommit: () => Unit = () => ()

  /** Attach to an existing on-disk index pair + manifest (a bootstrap
    * snapshot copied to a working directory, a restart after a crash). */
  def attach(spark: SparkSession, shingleRoot: String, docRoot: String,
             manifestRoot: String, rowCap: Long): Indexes =
    Indexes(
      new LinearHashIndex(spark, shingleRoot, "s", ShingleSchema, rowCap),
      new LinearHashIndex(spark, docRoot, "doc_id", DocSchema, rowCap),
      new IndexManifest(spark, manifestRoot))

  /** Seed both indexes from the initial keep corpus and commit manifest
    * version 1 (batchSeq 0) making them visible atomically. */
  def bootstrap(spark: SparkSession, docs: DataFrame, k: Int,
                maxShingleDf: Int, shingleRoot: String, docRoot: String,
                manifestRoot: String, rowCap: Long): Indexes = {
    val idx = attach(spark, shingleRoot, docRoot, manifestRoot, rowCap)
    require(idx.manifest.read().isEmpty,
      s"IndexedDedup: manifest $manifestRoot already committed")
    val ex = docs.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), k)).as("s"))
      .localCheckpoint(true)
    val hot0 = ex.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") > maxShingleDf).select("s")
    val liveS = idx.shingle.bootstrap(
      ex.join(broadcast(hot0), Seq("s"), "left_anti").select("s", "doc_id")
        .unionByName(hot0.select(col("s"), lit(-1L).as("doc_id"))))
    val n0 = ex.join(broadcast(hot0).withColumn("__h", lit(true)), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("__h"), 0L).otherwise(1L)).as("n_keep"))
    val liveD = idx.doc.bootstrap(docs.select("doc_id")
      .join(n0, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_keep"), lit(0L)).as("n_keep"),
        lit(0L).as("ver")))
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(ex)
    idx.manifest.commit(0L, Map(ShingleIx -> liveS, DocIx -> liveD))
    idx
  }

  /** Classify one micro-batch against the indexed keep-set and extend
    * the indexes with the batch's kept docs (one atomic manifest
    * commit). Returns the verdicts `(doc_id, status, rep_id)` —
    * statuses exactly as [[Dedup.incrementalDedup]].
    *
    * With `asOf`, the classification runs READ-ONLY against that
    * retained historical snapshot (manifest TIME TRAVEL): replaying
    * batch N against the snapshot that preceded it must reproduce the
    * live verdicts bit-for-bit — the auditability a mutable-in-place
    * index cannot offer (q297 makes this driver-visible). */
  def processBatch(spark: SparkSession, idx: Indexes, batch: DataFrame,
                   batchSeq: Long, k: Int, threshold: Double,
                   maxShingleDf: Int,
                   asOf: Option[IndexManifest.State] = None): DataFrame = {
    val snap = asOf.getOrElse(idx.manifest.read().getOrElse(
      sys.error(s"IndexedDedup: no committed manifest at ${idx.manifest.root}")))
    val liveS = snap.buckets(ShingleIx)
    val liveD = snap.buckets(DocIx)
    val bIds = batch.select("doc_id")
    val bEx = batch.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), k)).as("s"))
      .localCheckpoint(true)
    // ---- probe the keep side by the batch's shingle set
    val probeKeys = bEx.select("s").distinct()
    val pRows = idx.shingle.probe(probeKeys, liveS).localCheckpoint(true)
    val pm = pRows.join(broadcast(probeKeys), Seq("s"))
    val tomb = pm.where(col("doc_id") === -1L).select("s")
    // the replay shield: a committed earlier attempt may already have
    // merged this batch's kept docs into the index — they are batch
    // side, not keep
    val posts = pm.where(col("doc_id") >= 0L)
      .join(broadcast(bIds), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // ---- batch-relative hot set: df over keep ∪ batch, exactly
    // incrementalDedup's cap (keep count from postings, batch count
    // from the exploded batch)
    val dfKeep = posts.groupBy("s").agg(count(lit(1)).as("dfk"))
    val dfB = bEx.groupBy("s").agg(count(lit(1)).as("dfb"))
    val hotB = dfB.join(dfKeep, Seq("s"), "left")
      .where(coalesce(col("dfk"), lit(0L)) + col("dfb") > maxShingleDf)
      .select("s").unionByName(tomb).distinct()
    // ---- pairs on surviving shingles (batch×keep and batch×batch)
    val bSurv = bEx.join(broadcast(hotB), Seq("s"), "left_anti")
    val nB = bSurv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val kSurv = posts.join(broadcast(hotB), Seq("s"), "left_anti")
    val dk = bSurv.select(col("s"), col("doc_id").as("doc_a"))
      .join(kSurv.select(col("s"), col("doc_id").as("doc_b")), Seq("s"))
    val dd = bSurv.select(col("s"), col("doc_id").as("doc_a"))
      .join(bSurv.select(col("s"), col("doc_id").as("doc_b")), Seq("s"))
      .where(col("doc_a") < col("doc_b"))
    val cnt = dk.unionByName(dd)
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // ---- Jaccard sizes: batch docs from the batch; matched keep docs
    // from the doc index, corrected by probe-visible batch-hot shingles
    val hotNew = hotB.join(broadcast(tomb), Seq("s"), "left_anti")
    val decHot = posts.join(broadcast(hotNew), Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("dec"))
    val keepIds = cnt.select(col("doc_b").as("doc_id")).distinct()
      .join(broadcast(bIds), Seq("doc_id"), "left_anti")
    val diRows = idx.doc.probe(keepIds, liveD).localCheckpoint(true)
    val nKeep = diRows.join(broadcast(keepIds), Seq("doc_id"))
      .join(decHot, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_keep") - coalesce(col("dec"), lit(0L))).as("n"))
    val sz = nB.unionByName(nKeep)
    val edges = cnt
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .where(col("c").cast("double")
        / (col("na") + col("nb") - col("c")).cast("double") >= threshold)
      .select("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(edges, "doc_a", "doc_b")
    val verdicts0 = batch.select(col("doc_id").as("doc"))
      .join(labels.withColumnRenamed("node", "doc"), Seq("doc"), "left")
      .withColumn("rep_id", coalesce(col("label"), col("doc")))
    val reps = verdicts0.select("rep_id").distinct()
    // keep membership of reps: doc-index rows already probed cover every
    // matched keep doc; batch ids excluded (the same replay shield)
    val keepReps = diRows.join(broadcast(bIds), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("rep_id"))
      .join(broadcast(reps), Seq("rep_id"), "left_semi")
    val verdicts = verdicts0
      .join(broadcast(keepReps.withColumn("__ik", lit(true))), Seq("rep_id"), "left")
      .select(col("doc").as("doc_id"),
        when(col("rep_id") === col("doc"), lit("kept"))
          .when(col("__ik"), lit("dup_of_keep"))
          .otherwise(lit("dup_in_drop")).as("status"),
        col("rep_id"))
      .localCheckpoint(true)
    // ---- extend the indexes with the batch's kept docs — skipped when
    // the committed manifest already includes this batch (a replay
    // after the commit landed): the snapshot is complete, the verdict
    // recomputation above is read-only against it. A time-travel read
    // (asOf) is ALWAYS read-only.
    if (asOf.isEmpty && snap.batchSeq < batchSeq) {
      val keptIds = verdicts.where(col("status") === "kept").select("doc_id")
      val keptEx = bEx.join(broadcast(keptIds), Seq("doc_id"), "left_semi")
      val keptCnt = keptEx.groupBy("s").agg(count(lit(1)).as("addc"))
      // keep-side df is monotone: shingles crossing the cap once the
      // kept docs land are tombstoned for good
      val newPerm = keptCnt.join(dfKeep, Seq("s"), "left")
        .where(coalesce(col("dfk"), lit(0L)) + col("addc") > maxShingleDf)
        .select("s").join(broadcast(tomb), Seq("s"), "left_anti")
      val tombAfter = tomb.unionByName(newPerm).distinct()
      val keptN = keptIds.join(
          keptEx.join(broadcast(tombAfter).withColumn("__h", lit(true)),
              Seq("s"), "left")
            .groupBy("doc_id")
            .agg(sum(when(col("__h"), 0L).otherwise(1L)).as("nk")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("nk"), lit(0L)).as("ins_n"))
      val decPerm = posts.join(broadcast(newPerm), Seq("s"))
        .groupBy("doc_id").agg(count(lit(1)).as("dec"))
      // both rewrites land in fresh bucket generations invisible to
      // readers; the version gates stay (they also shield a crashed
      // PRE-manifest attempt whose directories this retry overwrites)
      val diKeys = keptIds.unionByName(decPerm.select("doc_id"))
      val newLiveD = idx.doc.rewrite(diKeys, liveD) { old =>
        old.join(keptN, Seq("doc_id"), "full_outer")
          .join(decPerm, Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("ver").isNull, col("ins_n"))
              .when(col("ver") >= batchSeq, col("n_keep"))
              .when(col("dec").isNotNull, col("n_keep") - col("dec"))
              .otherwise(col("n_keep")).as("n_keep"),
            when(col("ver").isNull
                || (col("ver") < batchSeq && col("dec").isNotNull),
              lit(batchSeq)).otherwise(col("ver")).as("ver"))
      }
      testCrashBetweenIndexWrites()
      val siKeys = keptEx.select("s").distinct()
      val newLiveS = idx.shingle.rewrite(siKeys, liveS) { old =>
        old.join(broadcast(newPerm), Seq("s"), "left_anti")
          .unionByName(keptEx
            .join(broadcast(tombAfter), Seq("s"), "left_anti")
            .select("s", "doc_id"))
          .unionByName(newPerm.select(col("s"), lit(-1L).as("doc_id")))
          .distinct()
      }
      testCrashBeforeManifestCommit()
      // THE commit point: both indexes + the batch id flip together
      idx.manifest.commit(batchSeq,
        Map(ShingleIx -> newLiveS, DocIx -> newLiveD))
      // gc keeps the union of the retained snapshots (current +
      // previous — `snap` is the previous after this commit), so
      // manifest time travel to the previous version stays readable
      idx.shingle.gc(newLiveS ++ liveS)
      idx.doc.gc(newLiveD ++ liveD)
    }
    Seq(pRows, bEx, diRows).foreach(
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint)
    // cnt + verdicts stay pinned for the caller's sink merge; verdicts is
    // the returned frame — the caller releases it (the q274 contract)
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(cnt)
    verdicts
  }
}
