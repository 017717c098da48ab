package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.TrendModel
import graft.tables.Tables

/** ML-layer query (E3). RandomForest training-set accuracy per symbol —
  * rows-only driver check (RF split selection is not SQL-expressible);
  * the spec suite asserts accuracy > majority-class baseline. */
object MlQueries extends QueryPack {

  private def rfAccuracy(spark: SparkSession, dir: String): DataFrame = {
    // Bars are tiny relative to the tick scan (one row per key×day);
    // coalesce before the 5 sequential MLlib fits so each tree job runs a
    // handful of tasks instead of 32.
    val bars = TrendModel.dailyBars(Tables.events(spark, dir)).coalesce(8).cache()
    try {
      // 10 trees for the driver gate: same pipeline shape (assembler→RF),
      // half the fit cost; library default stays 20.
      val models = TrendModel.trainPerSymbol(bars, numTrees = 10)
      TrendModel.trainingAccuracy(models, bars).orderBy("symbol")
    } finally bars.unpersist()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_rf_accuracy" -> rfAccuracy
  )

  override def oracles: Map[String, String] = Map.empty
}
