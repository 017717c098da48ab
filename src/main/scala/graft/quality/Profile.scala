package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality gate a training-data pipeline runs
  * before ingesting a new drop (row counts, null counts, cardinality,
  * ranges). The reference validates rows one at a time in Python
  * (`data_collection/fetch_stock.py:60-66` drops malformed ticks); at
  * engine scale the same contract is a single aggregation over the table.
  *
  * One scan, one aggregation: all metrics for all columns ride one `agg`
  * (partial map-side combine), then the single result row is exploded into
  * the per-column long format — no per-column scan, no driver loop.
  *
  * Exact `count_distinct` is used here because the profile is oracle-
  * checked; Spark plans the multi-column distinct via one Expand (scan
  * replicated once per distinct column *in the same stage*, not re-read).
  * At 100 TB swap in `approx_count_distinct` (q55's HLL path) — the Expand
  * multiplier is the one piece of this plan that scales with column count.
  */
object Profile {

  /** The 100 TB profile: identical output shape to [[profile]], with
    * `approx_count_distinct` (HLL++, relative sd `rsd`) in place of the
    * exact multi-column distinct. The exact form is the one piece of
    * [[profile]]'s plan that scales with column count — Catalyst plans N
    * distinct columns via an Expand that replicates every scanned row N
    * times before the shuffle. The HLL sketch is a regular declarative
    * aggregate (mergeable partial per column), so ALL metrics ride one
    * partial+final aggregation over one un-replicated scan: bytes
    * shuffled are O(columns × sketch size), not O(rows × columns).
    * `n_distinct` carries the estimate — a drop-in swap for [[profile]]
    * wherever ±rsd cardinality is acceptable (every gate-style check). */
  def profileApprox(df: DataFrame, cols: Seq[(String, Boolean)],
                    rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Profile `cols` of `df`; `numeric = true` columns report min/max as
    * doubles, others as strings (the two never mix in one column, so the
    * output schema stays typed). */
  def profile(df: DataFrame, cols: Seq[(String, Boolean)]): DataFrame =
    profileWith(df, cols, c => count_distinct(col(c)))

  private def profileWith(df: DataFrame, cols: Seq[(String, Boolean)],
                          distinctAgg: String => Column): DataFrame = {
    val aggs = cols.flatMap { case (c, num) =>
      Seq(count(col(c)).as(s"${c}__nn"),
        distinctAgg(c).as(s"${c}__nd")) ++
        (if (num) Seq(min(col(c)).cast("double").as(s"${c}__min"),
          max(col(c)).cast("double").as(s"${c}__max"))
        else Seq(min(col(c)).cast("string").as(s"${c}__mins"),
          max(col(c)).cast("string").as(s"${c}__maxs")))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { case (c, num) =>
      struct(lit(c).as("col_name"),
        col(s"${c}__nn").as("n_nonnull"),
        col(s"${c}__nd").as("n_distinct"),
        (if (num) col(s"${c}__min") else lit(null).cast("double")).as("min_num"),
        (if (num) col(s"${c}__max") else lit(null).cast("double")).as("max_num"),
        (if (num) lit(null).cast("string") else col(s"${c}__mins")).as("min_str"),
        (if (num) lit(null).cast("string") else col(s"${c}__maxs")).as("max_str"))
    }
    one.select(col("n_rows"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nonnull"),
        (col("n_rows") - col("p.n_nonnull")).as("n_null"),
        col("p.n_distinct"), col("p.min_num"), col("p.max_num"),
        col("p.min_str"), col("p.max_str"))
      .orderBy("col_name")
  }
}
