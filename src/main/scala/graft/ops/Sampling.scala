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

  /** Domain-mixture sampling — materialize a target training mix ("28%
    * src0, 8% each of the rest") by downsampling each stratum toward its
    * target share: keep-rate_s = min(1, w_s · frac · N / n_s), where
    * `frac` is the desired output size as a fraction of N. A stratum
    * below its target keeps everything (rates cap at 1 — classic
    * under-representation; upsampling is a repeat-epochs decision, not a
    * sampler's).
    *
    * The stratum counts are one tiny aggregate broadcast back onto the
    * scan; membership is then a pure map-side predicate — the md5-prefix
    * integer (uniform in [0, 2³²)) under the stratum's rate threshold —
    * so the sample is reproducible across runs, partitionings, and
    * engines, exactly like [[stratifiedHashSample]] but with DATA-DERIVED
    * per-stratum rates. */
  def mixtureSample(df: DataFrame, stratum: String, id: String, salt: String,
                    weights: Seq[(String, Double)], defaultWeight: Double,
                    frac: Double): DataFrame = {
    val counts = df.groupBy(stratum).agg(count(lit(1)).as("__n_s"))
    val total = df.agg(count(lit(1)).as("__n"))
    val w = weights.foldRight(lit(defaultWeight): Column) {
      case ((stratumValue, wt), other) =>
        when(col(stratum) === stratumValue, lit(wt)).otherwise(other)
    }
    val h = conv(substring(md5(concat(lit(salt), col(id).cast("string"))), 1, 8),
      16, 10).cast("long")
    df.join(broadcast(counts), Seq(stratum))
      .crossJoin(broadcast(total))
      .withColumn("__rate",
        least(lit(1.0), w * lit(frac) * col("__n") / col("__n_s")))
      .where(h < floor(col("__rate") * lit(4294967296.0)).cast("long"))
      .drop("__n_s", "__n", "__rate")
  }

  /** Priority-hash reservoir: the EXACTLY-n lowest-hash-priority rows per
    * stratum. Rate sampling ([[stratifiedHashSample]]) gives a random
    * SIZE per stratum; a reservoir gives a fixed budget — the "N docs per
    * domain, chosen uniformly" contract — and the salted-hash priority
    * makes the draw a pure function of the ids (reproducible across
    * runs/engines, ties impossible once broken by id). The rank<=n
    * filter plans as WindowGroupLimit: each map task keeps at most n rows
    * per stratum BEFORE the shuffle, so the exchange moves strata×n rows
    * — the distributed analogue of a classic reservoir's bounded memory.
    * Emits `priCol` (the priority) and the stratum rank `rnCol`. */
  def reservoirSample(df: DataFrame, stratum: String, id: String,
                      salt: String, n: Int,
                      priCol: String = "pri", rnCol: String = "rn"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = conv(substring(md5(concat(lit(salt), col(id).cast("string"))),
      1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(stratum).orderBy(col(priCol), col(id))
    df.withColumn(priCol, pri)
      .withColumn(rnCol, row_number().over(w))
      .where(col(rnCol) <= n)
  }
}
