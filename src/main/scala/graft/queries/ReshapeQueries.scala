package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Reshaping surface: pivot (wide), unpivot (long), and collection
  * aggregates — all with portable conditional-aggregation /UNION oracles. */
object ReshapeQueries extends QueryPack {

  /** Pivot: per-user event-type counts as columns (explicit value list →
    * no extra distinct pass, the scale-safe pivot form). */
  private def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Unpivot: part attributes to long form. */
  private def unpivotPart(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "attr", "val")
      .orderBy("p_partkey", "attr")

  /** Collection aggregates: sorted distinct sample per group via
    * collect_set → array_sort → slice → array_join. */
  private def collectAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(collect_set(col("user_id")).as("users"))
      .select(col("event_type"),
        size(col("users")).as("n_users"),
        array_join(slice(array_sort(col("users")), 1, 10), ",").as("first10"))
      .orderBy("event_type")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_pivot_counts" -> pivotCounts,
    "q60_unpivot_part" -> unpivotPart,
    "q61_collect_agg" -> collectAgg
  )

  override def oracles: Map[String, String] = Map(
    "q59_pivot_counts" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'error') AS error,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q60_unpivot_part" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice FROM part)
        |ORDER BY p_partkey, attr""".stripMargin,
    "q61_collect_agg" ->
      """SELECT event_type,
        |       count(DISTINCT user_id) AS n_users,
        |       array_to_string(list_slice(list(DISTINCT user_id ORDER BY user_id), 1, 10), ',') AS first10
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
