package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling for training-data pipelines.
  *
  * `rand()`-based sampling (and Spark's `sampleBy`) is seed- and
  * partitioning-dependent — rerunning the pipeline yields a different
  * corpus. Hashing a stable id instead makes membership a pure function
  * of the row: reproducible across runs, engines, and cluster layouts,
  * and trivially auditable (the oracle re-derives the exact same set).
  * Same discipline as the md5 train/val/test split (q81).
  *
  * Rates are expressed as hex-prefix thresholds on md5(salt || id):
  * md5 < "2" keeps 2/16 of rows, "8" half, "28" keeps 0x28/0x100. The
  * comparison is a plain string compare on the hex form — identical
  * semantics in every engine with md5. */
object Sampling {

  /** Keep rows whose salted id-hash falls under the stratum's
    * hex threshold; strata not listed use `defaultHex`. Purely map-side:
    * no shuffle, pipelines inside the scan at any scale. */
  def stratifiedHashSample(df: DataFrame, stratum: String, id: String,
      salt: String, rates: Seq[(String, String)], defaultHex: String): DataFrame = {
    val k = md5(concat(lit(salt), col(id).cast("string")))
    val threshold = rates.foldRight(lit(defaultHex): Column) {
      case ((stratumValue, hex), other) =>
        when(col(stratum) === stratumValue, lit(hex)).otherwise(other)
    }
    df.where(k < threshold)
  }
}
