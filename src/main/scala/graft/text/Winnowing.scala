package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD'03, "Winnowing: local algorithms for document fingerprinting"
  * — the MOSS scheme; public algorithm): hash every character k-gram,
  * slide a w-window over the hash sequence, keep each window's minimum
  * hash with RIGHTMOST tie-break. The selected (hash, position) set is
  * the fingerprint, with the paper's two properties:
  *
  *   - GUARANTEE: any substring match of length ≥ w + k − 1 produces at
  *     least one shared fingerprint (every length-w hash window inside
  *     the match selects the same hash at the same in-match offset);
  *   - DENSITY: expected fraction of positions selected is 2/(w+1) —
  *     bounded output regardless of document content.
  *
  * Determinism: (min hash, rightmost position) is folded into ONE
  * integer — key = h·2²⁴ + (2²⁴ − p) — so selection is a plain
  * `min() OVER (ROWS w−1 FOLLOWING)` with no argmin/tie ambiguity, and
  * the DuckDB oracle replays the identical fold. Positions must be
  * < 2²⁴ (guarded); the polynomial hash is < 2³⁰, so the fold fits in
  * 54 bits collision-free.
  *
  * Scale shape: explode to (doc, pos) — corpus-chars-sized, the same
  * cardinality as any tokenizer pass — then ONE doc-keyed window and a
  * distinct; everything is partitioned by the doc key, no global
  * ordering. Output is ≈ 2n/(w+1) rows. */
object Winnowing {

  /** Selected fingerprints (doc, fh, fp): hash `fh` of the k-gram at
    * 1-based position `fp`, for every full w-window minimum. Documents
    * shorter than w + k − 1 chars emit nothing (no full window). */
  def fingerprints(docs: DataFrame, id: String, text: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 2 && k <= 64, s"k-gram size in [2,64], got $k")
    require(w >= 2 && w <= 64, s"window in [2,64], got $w")
    val SHIFT = 1L << 24
    val base = docs
      .select(col(id).as("doc"), col(text).as("__txt"),
        length(col(text)).as("__len"))
      .where(col("__len") >= k + w - 1)
    val keyed = base
      // positions must fit the 2^24 fold: fail LOUDLY on a document too
      // long for the scheme rather than silently dropping its tail
      // fingerprints (which would break the shared-substring guarantee).
      // assert_true rides a filter (NULL-on-success → coalesce true) so
      // column pruning can't elide the check.
      .where(coalesce(assert_true(
        col("__len") - (k - 1) < lit(1L << 24),
        concat(lit("winnowing: document too long for the 2^24 position" +
          " fold (len="), col("__len"), lit(")"))), lit(true)))
      .select(col("doc"), col("__len"),
        explode(sequence(lit(1), col("__len") - (k - 1))).as("p"),
        col("__txt"))
      .withColumn("h",
        graft.functions.HashFunctions.poly_hash(expr(s"substring(__txt, p, $k)")))
      .withColumn("key", col("h") * SHIFT + (lit(SHIFT) - col("p")))
    val wspec = Window.partitionBy("doc").orderBy("p").rowsBetween(0, w - 1)
    keyed
      .withColumn("np", count(lit(1)).over(wspec))
      .withColumn("wmin", min("key").over(wspec))
      .where(col("np") === w) // full windows only
      .select(col("doc"),
        expr(s"wmin DIV $SHIFT").as("fh"),
        (lit(SHIFT) - pmod(col("wmin"), lit(SHIFT))).as("fp"))
      .distinct()
  }
}
