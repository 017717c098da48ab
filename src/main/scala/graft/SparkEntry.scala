package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query; SQL-expressible ones carry a
  * DuckDB oracle twin. Query implementations live in the `graft.queries`
  * packs; the operators themselves live in `graft.ops` / `graft.timeseries`
  * / `graft.text` / `graft.dedup` / `graft.similarity` / `graft.streaming`
  * / `graft.ml`.
  */
object SparkEntry {

  /** All query packs, in build order (SURVEY.md §7). */
  private def packs: Seq[QueryPack] = Seq(
    CoreQueries,
    RelationalQueries,
    StockQueries,
    TimeSeriesQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    StreamingQueries,
    MlQueries,
    MultimodalQueries,
    ExtendedQueries,
    AdvancedQueries,
    ReshapeQueries,
    PipelineQueries,
    CompletenessQueries,
    RetrievalQueries,
    QualityQueries,
    FinanceQueries,
    BehaviorQueries,
    EngineQueries,
    IntegrityQueries,
    SketchQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.dailyMovement(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    require(all.map(_._1).distinct.size == all.size,
      "duplicate query name across packs: " +
        all.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }.mkString(", "))
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
