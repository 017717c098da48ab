package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins merge (SCD type-1 upsert) — the distributed form of the
  * reference's per-document Mongo upserts (`mongo_stream_etl.py:35`,
  * `predict_from_vm4.py:64`: repeated insert/replace into keyed
  * collections). Batch semantics: base ∪ updates → keep the newest
  * version per key.
  *
  * Scale shape: one shuffle on the key, one sorted window pass — no
  * driver-side state, no per-key loop. At 100 TB this is the standard
  * MERGE-into-snapshot pattern (the streaming twin is
  * [[graft.streaming.Pipelines.highWatermarkFilter]]). */
object Merge {

  /** Keep the single newest row per `key`, ordering by `version` then
    * `tiebreak` (both descending). Deterministic when (key, version,
    * tiebreak) is unique across the union. */
  def upsertLatest(base: DataFrame, updates: DataFrame, key: String,
                   version: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(version).desc, col(tiebreak).desc)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest-wins merge WITH TOMBSTONES — the full CDC contract: an
    * update stream carries inserts/updates AND deletes (`opCol` = "D"),
    * and a key whose NEWEST version is a delete leaves the snapshot
    * entirely (a stale update arriving after the delete must NOT
    * resurrect it — that is exactly what latest-wins gives for free).
    * Same scale shape as [[upsertLatest]]: one key shuffle, one window
    * pass, the tombstone filter rides the same stage. Base rows are
    * implicit upserts (op = ""). */
  def mergeWithDeletes(base: DataFrame, updates: DataFrame, key: String,
                       version: String, tiebreak: String,
                       opCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(version).desc, col(tiebreak).desc)
    base.withColumn(opCol, lit(""))
      .unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      // coalesce: a NULL op (feeds often mark only deletes) must read as
      // an upsert — bare `op =!= "D"` is NULL for it and the WHERE would
      // silently DELETE the key
      .where(col("__rn") === 1 && coalesce(col(opCol), lit("")) =!= "D")
      .drop("__rn", opCol)
  }
}
