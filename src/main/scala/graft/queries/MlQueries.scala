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
    val bars = TrendModel.dailyBars(Tables.events(spark, dir)).cache()
    try {
      val models = TrendModel.trainPerSymbol(bars)
      TrendModel.trainingAccuracy(models, bars).orderBy("symbol")
    } finally bars.unpersist()
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_rf_accuracy" -> rfAccuracy
  )

  override def oracles: Map[String, String] = Map.empty
}
