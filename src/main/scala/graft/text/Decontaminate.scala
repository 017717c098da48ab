package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination — the train/test-overlap gate every LLM
  * training pipeline runs before a corpus ships: any document sharing a
  * k-token n-gram with an evaluation/benchmark set is flagged (and
  * usually dropped) so eval scores measure generalization, not
  * memorization. The reference has no notion of this; it comes with the
  * north star's training-data scope.
  *
  * Scale shape: benchmark sets are tiny (MBs) next to a 100 TB corpus,
  * so the benchmark's distinct k-gram vocabulary BROADCASTS; the corpus
  * side explodes its shingles in-scan and probes the broadcast hash set
  * — the corpus is never shuffled for the membership test. The only
  * exchange is the per-doc hit-count aggregation keyed by doc id
  * (map-side combinable; hit rows are rare by construction). */
object Decontaminate {

  /** Per-corpus-doc contamination verdict: `n_hits` = how many distinct
    * k-grams of the doc appear anywhere in `benchmark`, `contaminated` =
    * n_hits > 0. Every corpus doc appears in the output (clean docs with
    * n_hits = 0), so the result can drive either a filter or an audit
    * report. */
  def flagContaminated(corpus: DataFrame, benchmark: DataFrame,
                       id: String, text: String, btext: String,
                       k: Int): DataFrame = {
    val bsh = benchmark
      .select(explode(Dedup.shingles(col(btext), k)).as("s"))
      .distinct()
    val hits = corpus
      .select(col(id), explode(Dedup.shingles(col(text), k)).as("s"))
      .join(broadcast(bsh), Seq("s"))
      .groupBy(id)
      .agg(count(lit(1)).as("n_hits"))
    corpus.select(col(id))
      .join(hits, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"))
  }
}
