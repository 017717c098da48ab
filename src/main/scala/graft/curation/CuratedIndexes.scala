package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.IndexedDedup
import graft.similarity.IvfIndex
import graft.text.Bm25Index

/** CROSS-FAMILY atomic index commits (VERDICT r12 #4, extended to the
  * ANN family in r14 per VERDICT r13 #2): one curation pipeline ships
  * dedup verdicts, a searchable BM25 index, and (optionally) an
  * ANN-retrievable vector index for the SAME corpus, and the invariant
  * "a doc is kept ⟺ it is searchable ⟺ its vector is retrievable" must
  * flip atomically per batch. [[IndexedDedup]], [[Bm25Index]] and
  * [[graft.similarity.IvfIndex]] each know how to STAGE their rewrites
  * (fresh bucket/cell generations, nothing visible) and return the
  * bucket sets to commit; this coordinator runs dedup staging, feeds
  * the batch's KEPT docs to the BM25 staging and their vectors to the
  * IVF staging, and publishes all indexes (shingle + doc; term + doc +
  * stats; IVF cells) plus the batch id in ONE single-file manifest
  * rename. A crash anywhere — inside any family's rewrites or between
  * families — leaves readers of ALL families on the previous
  * consistent snapshot, and the deterministic replay recomputes the
  * same verdicts and overwrites the same fresh generations
  * (Round13OpsSpec/Round14OpsSpec crash-inject between each adjacent
  * family pair).
  *
  * Index names are namespaced ("dedup.shingle", …, "bm25.stats",
  * "ann.ivf") so all bucket sets coexist in one
  * [[graft.dedup.IndexManifest]]; every family handle shares the same
  * manifest root — the coordinator is the only committer.
  *
  * Retraction rides the same protocol: a takedown batch leaves the
  * keep-set, the search index AND the vector index in the same commit,
  * the text families re-auditing their df-cap tombstones against the
  * retained corpus.
  *
  * The ANN feed is the batch's (doc_id, vector) rows — typically an
  * inner join against the embedding store, so only embedded docs are
  * vector-retrievable (the invariant is "kept ∧ embedded ⟺
  * ANN-retrievable"); centroids are the frozen seed set
  * ([[graft.similarity.IvfIndex]]'s drift caveat applies). */
object CuratedIndexes {

  /** The ANN family handle: IVF cell generations live under `root`,
    * committed through the SHARED manifest under `name`; `centroids`
    * are the frozen assignment set, `vec` the vector column of every
    * ann feed (ids are always `doc_id` — the dedup contract). */
  final case class Ann(root: String, centroids: Seq[(Int, Array[Double])],
                       vec: String = "embedding", name: String = "ann.ivf")

  final case class Indexes(dedup: IndexedDedup.Indexes,
                           bm25: Bm25Index.Indexes,
                           ann: Option[Ann] = None)

  /** Crash-injection points between adjacent families' staged rewrites
    * (dedup→bm25 and bm25→ann). Production never sets these. */
  private[graft] var testCrashBetweenFamilies: () => Unit = () => ()
  private[graft] var testCrashBeforeAnnFamily: () => Unit = () => ()

  def attach(spark: SparkSession, shingleRoot: String, dedupDocRoot: String,
             termRoot: String, bm25DocRoot: String, statsRoot: String,
             manifestRoot: String, rowCap: Long, retain: Int = 2,
             ann: Option[Ann] = None): Indexes =
    Indexes(
      IndexedDedup.attach(spark, shingleRoot, dedupDocRoot, manifestRoot,
        rowCap, retain, namePrefix = "dedup."),
      Bm25Index.attach(spark, termRoot, bm25DocRoot, statsRoot,
        manifestRoot, rowCap, retain, namePrefix = "bm25."),
      ann)

  /** Seed every family from the initial (already-curated) corpus and
    * make all indexes visible with ONE manifest commit. With an ann
    * handle, `annVecs` must carry the corpus docs' (doc_id, vector)
    * rows. */
  def bootstrap(spark: SparkSession, docs: DataFrame, k: Int,
                maxShingleDf: Int, maxTermDf: Long, shingleRoot: String,
                dedupDocRoot: String, termRoot: String, bm25DocRoot: String,
                statsRoot: String, manifestRoot: String, rowCap: Long,
                retain: Int = 2, ann: Option[Ann] = None,
                annVecs: Option[DataFrame] = None): Indexes = {
    require(ann.isDefined == annVecs.isDefined,
      "CuratedIndexes: ann handle and annVecs come together")
    val idx = attach(spark, shingleRoot, dedupDocRoot, termRoot,
      bm25DocRoot, statsRoot, manifestRoot, rowCap, retain, ann)
    require(idx.dedup.manifest.read().isEmpty,
      s"CuratedIndexes: manifest $manifestRoot already committed")
    val md = IndexedDedup.bootstrapStaged(spark, idx.dedup, docs, k,
      maxShingleDf)
    val mb = Bm25Index.bootstrapStaged(spark, idx.bm25, docs, maxTermDf)
    val ma = idx.ann.map { a =>
      a.name -> IvfIndex.stageMerge(annVecs.get, "doc_id", a.vec,
        a.centroids, a.root, 0L, None, a.name).getOrElse(
        sys.error("CuratedIndexes: ann bootstrap staged nothing"))
    }.toMap
    idx.dedup.manifest.commit(0L, md ++ mb ++ ma)
    idx
  }

  private def gcAll(spark: SparkSession, idx: Indexes): Unit = {
    val mf = idx.dedup.manifest
    idx.dedup.shingle.gc(mf.retainedUnion(idx.dedup.shingleName))
    idx.dedup.doc.gc(mf.retainedUnion(idx.dedup.docName))
    idx.bm25.term.gc(mf.retainedUnion(idx.bm25.termName))
    idx.bm25.doc.gc(mf.retainedUnion(idx.bm25.docName))
    idx.bm25.stats.gc(mf.retainedUnion(idx.bm25.statsName))
    idx.ann.foreach(a => IvfIndex.gc(spark, a.root, mf.retainedUnion(a.name)))
  }

  /** Classify one micro-batch, index its KEPT docs for search (and,
    * with an ann handle, their vectors for retrieval), and flip every
    * family visible in one commit. `annVecs` carries the BATCH's
    * (doc_id, vector) rows — the coordinator restricts them to the
    * kept ids. Returns the dedup verdicts (doc_id, status, rep_id) —
    * localCheckpoint-pinned; the caller releases them (the q274
    * contract). A replay of a committed batch recomputes the verdicts
    * read-only and skips the write path entirely. */
  def processBatch(spark: SparkSession, idx: Indexes, batch: DataFrame,
                   batchSeq: Long, k: Int, threshold: Double,
                   maxShingleDf: Int, maxTermDf: Long,
                   annVecs: Option[DataFrame] = None): DataFrame = {
    require(idx.ann.isDefined == annVecs.isDefined,
      "CuratedIndexes: ann handle and annVecs come together")
    val snap = idx.dedup.manifest.read().getOrElse(
      sys.error("CuratedIndexes: bootstrap first"))
    val (verdicts, stagedDedup) = IndexedDedup.stageBatch(spark, idx.dedup,
      batch, batchSeq, k, threshold, maxShingleDf, snapshot = Some(snap))
    stagedDedup.foreach { md =>
      val keptIds = verdicts.where(col("status") === "kept").select("doc_id")
      val kept = batch.join(keptIds, Seq("doc_id"), "left_semi")
      testCrashBetweenFamilies()
      val mb = Bm25Index.stageMerge(spark, idx.bm25, kept, batchSeq,
        maxTermDf, snap).getOrElse(
        sys.error("CuratedIndexes: dedup staged but bm25 saw the batch " +
          "as committed — manifest batchSeq out of sync"))
      testCrashBeforeAnnFamily()
      val ma = idx.ann.map { a =>
        val keptVecs = annVecs.get.join(keptIds, Seq("doc_id"), "left_semi")
        a.name -> IvfIndex.stageMerge(keptVecs, "doc_id", a.vec,
          a.centroids, a.root, batchSeq, Some(snap), a.name).getOrElse(
          sys.error("CuratedIndexes: dedup staged but ann saw the batch " +
            "as committed — manifest batchSeq out of sync"))
      }.toMap
      // THE commit point: every family + the batch id flip together,
      // CAS'd against the one snapshot all families staged from
      idx.dedup.manifest.commit(batchSeq, md ++ mb ++ ma,
        expectedVersion = Some(snap.version))
      gcAll(spark, idx)
    }
    verdicts
  }

  /** Takedown: remove the docs from the keep-set, the search index AND
    * the vector index under one commit ([[IndexedDedup.retractBatch]] /
    * [[Bm25Index.retractBatch]] / [[IvfIndex.deleteBatch]] semantics,
    * including the text families' tombstone re-audit against
    * `retained`). `retractVecs` carries the takedown docs' (doc_id,
    * vector) rows — the vectors locate the touched IVF cells by the
    * same assignment arithmetic as their inserts. */
  def retractBatch(spark: SparkSession, idx: Indexes, retract: DataFrame,
                   batchSeq: Long, k: Int, maxShingleDf: Int,
                   maxTermDf: Long, retained: Option[DataFrame],
                   retractVecs: Option[DataFrame] = None): Unit = {
    require(idx.ann.isDefined == retractVecs.isDefined,
      "CuratedIndexes: ann handle and retractVecs come together")
    val snap = idx.dedup.manifest.read().getOrElse(
      sys.error("CuratedIndexes: bootstrap first"))
    if (snap.batchSeq >= batchSeq) return // committed replay: no-op
    val md = IndexedDedup.stageRetract(spark, idx.dedup, retract, batchSeq,
      k, maxShingleDf, retained, snap).get
    testCrashBetweenFamilies()
    val mb = Bm25Index.stageRetract(spark, idx.bm25, retract, batchSeq,
      maxTermDf, retained, snap).get
    testCrashBeforeAnnFamily()
    val ma = idx.ann.map { a =>
      a.name -> IvfIndex.stageDelete(retractVecs.get, "doc_id", a.vec,
        a.centroids, a.root, batchSeq, Some(snap), a.name).get
    }.toMap
    idx.dedup.manifest.commit(batchSeq, md ++ mb ++ ma,
      expectedVersion = Some(snap.version))
    gcAll(spark, idx)
  }

  /** The committed ANN rows (audit/census reads — never the per-batch
    * or probe path); empty frame schema is the caller's problem, so
    * this errors when the family holds no cells. */
  def readAnn(spark: SparkSession, idx: Indexes): DataFrame = {
    val a = idx.ann.getOrElse(
      sys.error("CuratedIndexes: no ann family attached"))
    val snap = idx.dedup.manifest.read().getOrElse(
      sys.error("CuratedIndexes: bootstrap first"))
    IvfIndex.readWith(spark, a.root, snap, a.name, None).getOrElse(
      sys.error("CuratedIndexes: ann family holds no cells"))
  }

  /** Top-k exact-L2 ANN probe over the curated vector index — resolves
    * the probed cells through the SHARED committed snapshot, so it
    * sees exactly the kept ∧ embedded corpus ("queries" carries
    * (doc_id, vector) rows; output ids are kept doc ids). */
  def probeAnn(spark: SparkSession, idx: Indexes, queries: DataFrame,
               nProbe: Int, k: Int): DataFrame = {
    val a = idx.ann.getOrElse(
      sys.error("CuratedIndexes: no ann family attached"))
    val snap = idx.dedup.manifest.read().getOrElse(
      sys.error("CuratedIndexes: bootstrap first"))
    IvfIndex.probeWith(spark, a.root, snap, a.name, queries, "doc_id",
      a.vec, a.centroids, nProbe, k)
  }
}
