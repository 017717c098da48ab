package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.IndexedDedup
import graft.text.Bm25Index

/** CROSS-FAMILY atomic index commits (VERDICT r12 #4): one curation
  * pipeline ships dedup verdicts AND a searchable BM25 index for the
  * SAME corpus, and the invariant "a doc is kept ⟺ it is searchable"
  * must flip atomically per batch. [[IndexedDedup]] and [[Bm25Index]]
  * each know how to STAGE their rewrites (fresh bucket generations,
  * nothing visible) and return the bucket sets to commit; this
  * coordinator runs dedup staging, feeds the batch's KEPT docs to the
  * BM25 staging, and publishes all five indexes (shingle + doc;
  * term + doc + stats) plus the batch id in ONE single-file manifest
  * rename. A crash anywhere — inside either family's rewrites or
  * between the families — leaves readers of BOTH families on the
  * previous consistent snapshot, and the deterministic replay
  * recomputes the same verdicts and overwrites the same fresh
  * generations (Round13OpsSpec crash-injects between the families).
  *
  * Index names are namespaced ("dedup.shingle", …, "bm25.stats") so
  * the five bucket sets coexist in one [[graft.dedup.IndexManifest]];
  * both family handles share the same manifest root — the coordinator
  * is the only committer.
  *
  * Retraction rides the same protocol: a takedown batch leaves the
  * keep-set AND the search index in the same commit, each family
  * re-auditing its own df-cap tombstones against the retained corpus.
  */
object CuratedIndexes {

  final case class Indexes(dedup: IndexedDedup.Indexes,
                           bm25: Bm25Index.Indexes)

  /** Crash-injection point between the two families' staged rewrites.
    * Production never sets this. */
  private[graft] var testCrashBetweenFamilies: () => Unit = () => ()

  def attach(spark: SparkSession, shingleRoot: String, dedupDocRoot: String,
             termRoot: String, bm25DocRoot: String, statsRoot: String,
             manifestRoot: String, rowCap: Long, retain: Int = 2): Indexes =
    Indexes(
      IndexedDedup.attach(spark, shingleRoot, dedupDocRoot, manifestRoot,
        rowCap, retain, namePrefix = "dedup."),
      Bm25Index.attach(spark, termRoot, bm25DocRoot, statsRoot,
        manifestRoot, rowCap, retain, namePrefix = "bm25."))

  /** Seed both families from the initial (already-curated) corpus and
    * make all five indexes visible with ONE manifest commit. */
  def bootstrap(spark: SparkSession, docs: DataFrame, k: Int,
                maxShingleDf: Int, maxTermDf: Long, shingleRoot: String,
                dedupDocRoot: String, termRoot: String, bm25DocRoot: String,
                statsRoot: String, manifestRoot: String, rowCap: Long,
                retain: Int = 2): Indexes = {
    val idx = attach(spark, shingleRoot, dedupDocRoot, termRoot,
      bm25DocRoot, statsRoot, manifestRoot, rowCap, retain)
    require(idx.dedup.manifest.read().isEmpty,
      s"CuratedIndexes: manifest $manifestRoot already committed")
    val md = IndexedDedup.bootstrapStaged(spark, idx.dedup, docs, k,
      maxShingleDf)
    val mb = Bm25Index.bootstrapStaged(spark, idx.bm25, docs, maxTermDf)
    idx.dedup.manifest.commit(0L, md ++ mb)
    idx
  }

  private def gcAll(idx: Indexes): Unit = {
    val mf = idx.dedup.manifest
    idx.dedup.shingle.gc(mf.retainedUnion(idx.dedup.shingleName))
    idx.dedup.doc.gc(mf.retainedUnion(idx.dedup.docName))
    idx.bm25.term.gc(mf.retainedUnion(idx.bm25.termName))
    idx.bm25.doc.gc(mf.retainedUnion(idx.bm25.docName))
    idx.bm25.stats.gc(mf.retainedUnion(idx.bm25.statsName))
  }

  /** Classify one micro-batch, index its KEPT docs for search, and
    * flip both families visible in one commit. Returns the dedup
    * verdicts (doc_id, status, rep_id) — localCheckpoint-pinned; the
    * caller releases them (the q274 contract). A replay of a committed
    * batch recomputes the verdicts read-only and skips the write path
    * entirely. */
  def processBatch(spark: SparkSession, idx: Indexes, batch: DataFrame,
                   batchSeq: Long, k: Int, threshold: Double,
                   maxShingleDf: Int, maxTermDf: Long): DataFrame = {
    val (verdicts, stagedDedup) = IndexedDedup.stageBatch(spark, idx.dedup,
      batch, batchSeq, k, threshold, maxShingleDf)
    stagedDedup.foreach { md =>
      val kept = batch.join(
        verdicts.where(col("status") === "kept").select("doc_id"),
        Seq("doc_id"), "left_semi")
      testCrashBetweenFamilies()
      val snap = idx.bm25.manifest.read().getOrElse(
        sys.error("CuratedIndexes: manifest vanished mid-batch"))
      val mb = Bm25Index.stageMerge(spark, idx.bm25, kept, batchSeq,
        maxTermDf, snap).getOrElse(
        sys.error("CuratedIndexes: dedup staged but bm25 saw the batch " +
          "as committed — manifest batchSeq out of sync"))
      // THE commit point: five indexes + the batch id flip together
      idx.dedup.manifest.commit(batchSeq, md ++ mb)
      gcAll(idx)
    }
    verdicts
  }

  /** Takedown: remove the docs from the keep-set and the search index
    * under one commit ([[IndexedDedup.retractBatch]] /
    * [[Bm25Index.retractBatch]] semantics, including each family's
    * tombstone re-audit against `retained`). */
  def retractBatch(spark: SparkSession, idx: Indexes, retract: DataFrame,
                   batchSeq: Long, k: Int, maxShingleDf: Int,
                   maxTermDf: Long, retained: Option[DataFrame]): Unit = {
    val snap = idx.dedup.manifest.read().getOrElse(
      sys.error("CuratedIndexes: bootstrap first"))
    if (snap.batchSeq >= batchSeq) return // committed replay: no-op
    val md = IndexedDedup.stageRetract(spark, idx.dedup, retract, batchSeq,
      k, maxShingleDf, retained, snap).get
    testCrashBetweenFamilies()
    val mb = Bm25Index.stageRetract(spark, idx.bm25, retract, batchSeq,
      maxTermDf, retained, snap).get
    idx.dedup.manifest.commit(batchSeq, md ++ mb)
    gcAll(idx)
  }
}
