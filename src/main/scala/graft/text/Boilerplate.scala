package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level boilerplate removal (the CCNet/RefinedWeb curation
  * stage): split every document into consecutive fixed-width token
  * segments, count each segment's document frequency across the corpus,
  * drop segments that recur in too many documents (navigation chrome,
  * license headers, share buttons), and reassemble the survivors in
  * original order.
  *
  * Scale shape (the q37 hot-shingle discipline): the corpus-sized
  * segment list shuffles ONCE for the df aggregation; the boilerplate
  * list itself is tiny by construction (only segments above the
  * threshold survive the HAVING), so the removal pass is a broadcast
  * LEFT ANTI join — the corpus is never shuffled to be filtered.
  * Reassembly groups by doc_id, one partial-aggregable shuffle whose
  * payload is the already-filtered segment stream.
  */
object Boilerplate {

  /** Per-doc curation report: `doc_id`, `n_segs`, `n_kept`,
    * `clean_text` (survivor segments rejoined in order; empty string if
    * every segment was boilerplate — the doc row is never lost).
    *
    * @param segW     tokens per segment
    * @param minDocDf a segment appearing in >= this many distinct docs
    *                 is boilerplate
    */
  def removeBoilerplate(docs: DataFrame, id: String, text: String,
                        segW: Int, minDocDf: Long): DataFrame = {
    require(segW >= 1, s"segW must be >= 1, got $segW")
    require(minDocDf >= 2, s"minDocDf must be >= 2, got $minDocDf")
    val toks: Column = split(trim(col(text)), "\\s+")
    val nSegs = expr(s"(size(split(trim($text), '\\\\s+')) + ${segW - 1}) div $segW")
    val withSegs = docs.select(col(id), nSegs.as("n_segs"),
      posexplode(transform(sequence(lit(0L), nSegs - 1),
        i => array_join(slice(toks, (i * segW + 1).cast("int"), lit(segW)), " ")))
        .as(Seq("seg_idx", "seg")))
    // countDistinct, not count: a segment repeated inside one doc is
    // repetition (q113's signal), not cross-document boilerplate
    val hot = withSegs.groupBy("seg")
      .agg(countDistinct(col(id)).as("df"))
      .where(col("df") >= minDocDf)
      .select("seg")
    val kept = withSegs.join(broadcast(hot), Seq("seg"), "left_anti")
      .groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("seg_idx"),
          col("seg")))), s => s.getField("seg")), " ").as("clean_text"))
    docs.select(col(id), nSegs.as("n_segs"))
      .join(kept, Seq(id), "left")
      .select(col(id), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
