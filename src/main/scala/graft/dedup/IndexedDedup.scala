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

  /** `shingleName`/`docName` are the manifest index names — default to
    * the historical "shingle"/"doc"; a cross-family pipeline committing
    * several index families under ONE manifest prefixes them. */
  final case class Indexes(shingle: LinearHashIndex, doc: LinearHashIndex,
                           manifest: IndexManifest,
                           shingleName: String = "shingle",
                           docName: String = "doc")

  val ShingleSchema = "s STRING, doc_id BIGINT"
  val DocSchema = "doc_id BIGINT, n_keep BIGINT, ver BIGINT"

  /** Crash-injection points for the commit-protocol specs: between the
    * two index rewrites, and after both rewrites but before the
    * manifest rename. Production never sets these. */
  private[graft] var testCrashBetweenIndexWrites: () => Unit = () => ()
  private[graft] var testCrashBeforeManifestCommit: () => Unit = () => ()

  /** Attach to an existing on-disk index pair + manifest (a bootstrap
    * snapshot copied to a working directory, a restart after a crash).
    * `retain` = manifest snapshot retention ([[IndexManifest]]);
    * `namePrefix` namespaces the manifest index names for cross-family
    * single-manifest pipelines. */
  def attach(spark: SparkSession, shingleRoot: String, docRoot: String,
             manifestRoot: String, rowCap: Long, retain: Int = 2,
             namePrefix: String = ""): Indexes =
    Indexes(
      new LinearHashIndex(spark, shingleRoot, "s", ShingleSchema, rowCap),
      new LinearHashIndex(spark, docRoot, "doc_id", DocSchema, rowCap),
      new IndexManifest(spark, manifestRoot, retain),
      namePrefix + "shingle", namePrefix + "doc")

  /** Seed both indexes from the initial keep corpus and commit manifest
    * version 1 (batchSeq 0) making them visible atomically. */
  def bootstrap(spark: SparkSession, docs: DataFrame, k: Int,
                maxShingleDf: Int, shingleRoot: String, docRoot: String,
                manifestRoot: String, rowCap: Long, retain: Int = 2): Indexes = {
    val idx = attach(spark, shingleRoot, docRoot, manifestRoot, rowCap, retain)
    require(idx.manifest.read().isEmpty,
      s"IndexedDedup: manifest $manifestRoot already committed")
    idx.manifest.commit(0L, bootstrapStaged(spark, idx, docs, k, maxShingleDf))
    idx
  }

  /** Seed both indexes and return the bucket sets to commit — the
    * CALLER owns the manifest commit (a cross-family pipeline puts
    * several families' sets under ONE commit). Nothing is visible until
    * that commit lands. */
  private[graft] def bootstrapStaged(spark: SparkSession, idx: Indexes,
                                     docs: DataFrame, k: Int,
                                     maxShingleDf: Int): Map[String, Set[String]] = {
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
    Map(idx.shingleName -> liveS, idx.docName -> liveD)
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
    val snap0 = idx.manifest.read().getOrElse(
      sys.error(s"IndexedDedup: no committed manifest at ${idx.manifest.root}"))
    val (verdicts, staged) = stageBatch(spark, idx, batch, batchSeq, k,
      threshold, maxShingleDf, asOf, snapshot = Some(snap0))
    staged.foreach { m =>
      // THE commit point: both indexes + the batch id flip together.
      // CAS against the staged-from version (VERDICT r13 #5): a zombie
      // writer that lost the single-writer contract — the manifest
      // moved since it staged — throws here and publishes nothing.
      idx.manifest.commit(batchSeq, m,
        expectedVersion = Some(snap0.version))
      // gc keeps the union of the retained snapshots, so manifest time
      // travel to every retained version stays readable
      idx.shingle.gc(idx.manifest.retainedUnion(idx.shingleName))
      idx.doc.gc(idx.manifest.retainedUnion(idx.docName))
    }
    verdicts
  }

  /** [[processBatch]] with the manifest commit LEFT TO THE CALLER:
    * returns the verdicts plus, when the batch extends the indexes,
    * this family's new bucket sets to include in the caller's single
    * manifest commit (None = read-only replay/time-travel — nothing to
    * commit). The caller must gc each index against
    * `manifest.retainedUnion` after its commit lands. */
  private[graft] def stageBatch(spark: SparkSession, idx: Indexes,
                                batch: DataFrame, batchSeq: Long, k: Int,
                                threshold: Double, maxShingleDf: Int,
                                asOf: Option[IndexManifest.State] = None,
                                snapshot: Option[IndexManifest.State] = None)
      : (DataFrame, Option[Map[String, Set[String]]]) = {
    // `snapshot` = the committed state the CALLER already read (so its
    // CAS commit is against exactly the version staged from); `asOf`
    // still wins — a time-travel read is always read-only
    val snap = asOf.orElse(snapshot).getOrElse(idx.manifest.read().getOrElse(
      sys.error(s"IndexedDedup: no committed manifest at ${idx.manifest.root}")))
    val liveS = snap.buckets(idx.shingleName)
    val liveD = snap.buckets(idx.docName)
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
    val staged: Option[Map[String, Set[String]]] =
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
      Some(Map(idx.shingleName -> newLiveS, idx.docName -> newLiveD))
    } else None
    Seq(pRows, bEx, diRows).foreach(
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint)
    // cnt + verdicts stay pinned for the caller's sink merge; verdicts is
    // the returned frame — the caller releases it (the q274 contract)
    org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint(cnt)
    (verdicts, staged)
  }

  /** RETRACTION (VERDICT r12 #1 — takedown/GDPR/corpus-refresh): remove
    * `retract`'s docs (doc_id, text) from the keep-set indexes under
    * the SAME single-manifest commit protocol as [[processBatch]].
    * Postings of the retracted docs are deleted, their doc-index rows
    * dropped, and — because keep-side df is no longer monotone once
    * docs can leave — df-cap tombstones touched by the retracted docs
    * are RE-AUDITED: a tombstoned shingle whose df over the remaining
    * corpus falls back ≤ maxShingleDf is UN-TOMBSTONED by re-deriving
    * its posting list from `retained` (the remaining keep corpus —
    * production's durable corpus store), and every remaining doc that
    * contains it gets its surviving-shingle count incremented. The
    * result is BIT-EQUIVALENT to an index bootstrapped from scratch on
    * the remaining corpus (IndexedDedupSpec proves content equality
    * per index): tombstones end exactly {s : df(remaining) > cap}
    * because retraction only lowers df — a shingle over the cap on the
    * remaining corpus was already tombstoned before.
    *
    * With `retained = None` the cap is a ONE-WAY POLICY: tombstones
    * stay permanent (no corpus re-scan), trading exact-rebuild
    * equivalence for a cheaper retract — verdicts stay conservative
    * (a tombstoned shingle never creates pairs).
    *
    * Cost shape: probe IO tracks the retract batch's key sets; the
    * only remaining-corpus scan is the tombstone re-audit, restricted
    * to the touched tombstoned shingles (skipped entirely when none).
    * Replay of a committed retract is a no-op (batchSeq gate); a crash
    * before the manifest rename leaves readers on the previous
    * snapshot and the deterministic retry overwrites the same fresh
    * generations.
    *
    * History note: a retraction REWRITES KEEP-SET HISTORY by design —
    * replaying a pre-retraction merge batch afterwards is not
    * guaranteed to reproduce its original verdicts (its duplicates may
    * have been taken down). The replay-idempotence contract is
    * per-snapshot, which is what the manifest gate enforces. */
  def retractBatch(spark: SparkSession, idx: Indexes, retract: DataFrame,
                   batchSeq: Long, k: Int, maxShingleDf: Int,
                   retained: Option[DataFrame]): Unit = {
    val snap = idx.manifest.read().getOrElse(
      sys.error(s"IndexedDedup: no committed manifest at ${idx.manifest.root}"))
    if (snap.batchSeq >= batchSeq) return // committed replay: no-op
    stageRetract(spark, idx, retract, batchSeq, k, maxShingleDf, retained,
      snap).foreach { m =>
      idx.manifest.commit(batchSeq, m, expectedVersion = Some(snap.version))
      idx.shingle.gc(idx.manifest.retainedUnion(idx.shingleName))
      idx.doc.gc(idx.manifest.retainedUnion(idx.docName))
    }
  }

  /** [[retractBatch]] with the commit left to the caller (None = the
    * batch was already committed or nothing to do). */
  private[graft] def stageRetract(spark: SparkSession, idx: Indexes,
                                  retract: DataFrame, batchSeq: Long, k: Int,
                                  maxShingleDf: Int,
                                  retained: Option[DataFrame],
                                  snap: IndexManifest.State)
      : Option[Map[String, Set[String]]] = {
    if (snap.batchSeq >= batchSeq) return None
    val liveS = snap.buckets(idx.shingleName)
    val liveD = snap.buckets(idx.docName)
    val rIds = retract.select("doc_id").distinct()
    // docs actually in the keep-set — retracting a non-member is a no-op
    val present = idx.doc.probe(rIds, liveD)
      .join(broadcast(rIds), Seq("doc_id"), "left_semi")
      .select("doc_id").localCheckpoint(true)
    val rEx = retract.join(broadcast(present), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), k)).as("s"))
      .localCheckpoint(true)
    val sKeys = rEx.select("s").distinct()
    val pm = idx.shingle.probe(sKeys, liveS)
      .join(broadcast(sKeys), Seq("s"))
    val tombTouched = pm.where(col("doc_id") === -1L).select("s")
      .localCheckpoint(true)
    // tombstone re-audit: df over the REMAINING corpus, restricted to
    // the touched tombstoned shingles (only they can have lost df)
    val restored = retained match {
      case Some(rem) if !tombTouched.isEmpty =>
        rem.select(col("doc_id"), explode(Dedup.shingles(col("text"), k)).as("s"))
          .join(broadcast(tombTouched), Seq("s"))
          .localCheckpoint(true)
      case _ => rEx.select("s", "doc_id").limit(0).localCheckpoint(true)
    }
    // un-tombstone = touched tombstoned shingles whose remaining-corpus
    // df fell back <= cap, INCLUDING df = 0 (every containing doc
    // retracted — no restored row, so the restored groups alone would
    // keep the tombstone a fresh bootstrap wouldn't have; ADVICE r13)
    val overCap = restored.groupBy("s").agg(count(lit(1)).as("dfr"))
      .where(col("dfr") > maxShingleDf).select("s")
    val unTomb = (if (retained.isDefined)
        tombTouched.join(broadcast(overCap), Seq("s"), "left_anti")
      else tombTouched.limit(0)) // one-way cap policy: never un-tombstone
      .localCheckpoint(true)
    val restoredLive = restored
      .join(broadcast(unTomb), Seq("s"), "left_semi")
      .select("s", "doc_id")
    val newLiveS = idx.shingle.rewrite(sKeys, liveS) { old =>
      // drop the retracted docs' postings and the un-tombstoned
      // tombstone rows (a tombstoned shingle has ONLY its tombstone
      // row, so the anti-join on s removes nothing else), then restore
      // the re-derived posting lists
      old.join(broadcast(present), Seq("doc_id"), "left_anti")
        .join(broadcast(unTomb), Seq("s"), "left_anti")
        .unionByName(restoredLive)
        .distinct()
    }
    testCrashBetweenIndexWrites()
    val incRem = restoredLive.groupBy("doc_id").agg(count(lit(1)).as("inc"))
      .localCheckpoint(true)
    val dKeys = present.unionByName(incRem.select("doc_id"))
    val newLiveD = idx.doc.rewrite(dKeys, liveD) { old =>
      old.join(broadcast(present), Seq("doc_id"), "left_anti")
        .join(incRem, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("n_keep") + coalesce(col("inc"), lit(0L))).as("n_keep"),
          when(col("inc").isNotNull, lit(batchSeq)).otherwise(col("ver"))
            .as("ver"))
    }
    testCrashBeforeManifestCommit()
    Seq(present, rEx, tombTouched, restored, unTomb, incRem).foreach(
      org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint)
    Some(Map(idx.shingleName -> newLiveS, idx.docName -> newLiveD))
  }
}
