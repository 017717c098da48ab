package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.TrendModel
import graft.tables.Tables

/** ML-layer queries (E3).
  *
  * q46: RandomForest training-set accuracy per symbol — rows-only driver
  * check (RF split selection is not SQL-expressible); the spec suite
  * asserts accuracy > majority-class baseline.
  *
  * q63: the deterministic half of the training query — per-symbol bar
  * counts and up-movement base rate, fully oracle-checked (this is the
  * label distribution the RF trains against).
  *
  * q64: the realtime leg end-to-end — stream → micro-batch bars →
  * trained-symbol guard (P8) → RF predict + change(%)
  * (`ml_model/predict_from_vm4.py:44-65`), scored batches appended to a
  * parquet sink (S10 analog). Rows-only; the guard semantics are asserted
  * in MlMultimodalSpec. */
object MlQueries extends QueryPack {

  /** Temp dirs reaped at JVM exit (the result frame reads them lazily, so
    * they must outlive the query — but not the process). ONE shutdown hook
    * drains a shared queue, however many times queries run in this JVM. */
  private val reapAtExit = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val reaperInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      reapAtExit.forEach(p => rm(p.toFile))
    }))
  private[queries] def tempDirDeletedOnExit(prefix: String): String = {
    reaperInstalled
    val p = Files.createTempDirectory(prefix)
    reapAtExit.add(p)
    p.toString
  }

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

  /** Per-symbol training-set shape: bar count + up-movement base rate.
    * Deterministic (no RF involved) → full DuckDB oracle. */
  private def trainingBaseRate(spark: SparkSession, dir: String): DataFrame =
    TrendModel.dailyBars(Tables.events(spark, dir))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("movement").cast("long")).as("n_up"))
      .select(col("symbol"), col("n_obs"), col("n_up"),
        (col("n_up").cast("double") / col("n_obs")).as("up_rate"))
      .orderBy("symbol")

  /** E3 realtime leg: train on all symbols but the last (so the P8 guard
    * has something to drop), then stream the events source and score each
    * micro-batch's bars through the per-symbol models, appending to a
    * parquet sink — the reference's change-stream → predict → insert loop
    * (`predict_from_vm4.py:44-65`) with durable sinks. */
  private def streamingInference(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val allBars = TrendModel.dailyBars(Tables.events(spark, dir)).coalesce(8).cache()
    try {
      // Holdout: the max symbol stays untrained (so the P8 guard has
      // something to drop). The choice stays IN-PLAN — a one-row broadcast
      // anti-join — instead of collecting the key set to the driver; the
      // only driver-side key enumeration left is inside trainPerSymbol,
      // where MLlib's fit-per-key requires it (q71 is the unbounded path).
      val holdout = allBars.agg(max("symbol").as("symbol"))
      val models = TrendModel.trainPerSymbol(
        allBars.join(broadcast(holdout), Seq("symbol"), "left_anti"),
        numTrees = 10)
      val raw = spark.readStream.schema(Tables.eventsRawSchema)
        .parquet(s"$dir/events*.parquet")
        .withColumn("ts", expr(Tables.rawTsToMicrosFor(spark, Tables.eventsGlob(dir))))
      val out = tempDirDeletedOnExit("graft_infer_")
      val q = raw.writeStream
        .option("checkpointLocation", tempDirDeletedOnExit("graft_infer_ckpt_"))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          TrendModel.scoreBatch(TrendModel.dailyBars(batch), models)
            .write.mode("append").parquet(out)
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(out).orderBy("symbol", "user_id", "day")
    } finally allBars.unpersist()
  }

  /** The unbounded-key-cardinality path made driver-visible: ONE global
    * forest with the hashed symbol as a feature (no per-key fit loop, no
    * driver collect of the key set) — per-symbol training accuracy of
    * that single model. Rows-only (RF internals are not SQL-expressible);
    * spec asserts it beats the majority baseline. */
  private def globalRf(spark: SparkSession, dir: String): DataFrame = {
    val bars = TrendModel.dailyBars(Tables.events(spark, dir)).coalesce(8).cache()
    try {
      val m = TrendModel.trainGlobal(bars)
      m.transform(bars)
        .groupBy("symbol")
        .agg(count(lit(1)).as("n_obs"),
          avg((col("prediction") === col("movement")).cast("double")).as("accuracy"))
        .orderBy("symbol")
    } finally bars.unpersist()
  }

  /** Deterministic hash fold over the training bars (the q81 md5
    * discipline, k = 4 single-hex boundaries so folds are uniform by
    * construction): fold membership is a pure function of the bar key,
    * identical on any engine, any partitioning, any run — the property
    * `randomSplit` does NOT have. `private[graft]` so the CV spec
    * drives the same assignment. */
  private[graft] def withFold(bars: DataFrame): DataFrame =
    bars
      .withColumn("k", md5(concat_ws(":", lit("fold"), col("symbol"),
        col("user_id"), col("day"))))
      .withColumn("fold",
        when(col("k") < "4", 0L).when(col("k") < "8", 1L)
          .when(col("k") < "c", 2L).otherwise(3L))

  /** q235: deterministic k-fold CROSS-VALIDATION fold assignment — the
    * model-selection surface the ML layer (q46/q63/q71 train+score)
    * lacked. Fold membership itself is the oracled artifact: the DuckDB
    * twin recomputes the same md5 over the same bar keys, so a changed
    * hash preimage, boundary, or bar construction hash-fails. Output is
    * the per-fold census (size, label balance, symbol coverage, min
    * hash) — everything a CV harness needs to trust its folds. */
  private def cvFolds(spark: SparkSession, dir: String): DataFrame =
    withFold(TrendModel.dailyBars(Tables.events(spark, dir)))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("movement").cast("long")).as("n_up"),
        countDistinct(col("symbol")).as("n_symbols"),
        min("k").as("min_hash"))
      .orderBy("fold")

  /** q236: per-fold RF accuracy — train the global forest on the other
    * 3 folds, score the held-out fold, once per fold (the rows-only
    * MLlib tail, like q46/q71; fold membership is hash-gated by q235).
    * The spec asserts the CV-mean beats the majority baseline. */
  private def cvAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val bars = withFold(TrendModel.dailyBars(Tables.events(spark, dir)))
      .coalesce(8).cache()
    try {
      (0L to 3L).map { f =>
        val m = TrendModel.trainGlobal(bars.where(col("fold") =!= f))
        m.transform(bars.where(col("fold") === f))
          .agg(count(lit(1)).as("n_test"),
            avg((col("prediction") === col("movement")).cast("double"))
              .as("accuracy"))
          .withColumn("fold", lit(f))
      }.reduce(_ unionByName _)
        .select("fold", "n_test", "accuracy")
        .orderBy("fold")
    } finally bars.unpersist()
  }

  /** q178: the hashing trick — namespaced categorical features
    * (`brand=…`, `type=…`) hashed into 64 buckets via the codegen'd
    * FNV-1a64 expression, with the per-bucket collision census (distinct
    * source categories vs rows) a featurizer needs to size D. Entirely
    * in-scan until one 64-row aggregate; no vocabulary state anywhere —
    * the property that makes the trick the 100 TB featurizer. The
    * oracle replays FNV-1a64 in SQL (the q39 discipline) over the same
    * namespaced strings. */
  private def featureHashing(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFunctions
    Tables.part(spark, dir)
      .select(explode(array(
        concat(lit("brand="), col("p_brand")),
        concat(lit("type="), col("p_type")))).as("feat"))
      .select(col("feat"),
        pmod(HashFunctions.fnv1a(col("feat")), lit(64L)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("feat")).as("n_feats"))
      .orderBy("bucket")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q178_feature_hashing" -> featureHashing,
    "q46_rf_accuracy" -> rfAccuracy,
    "q63_training_base_rate" -> trainingBaseRate,
    "q64_streaming_inference" -> streamingInference,
    "q71_global_rf" -> globalRf,
    "q235_cv_folds" -> cvFolds,
    "q236_cv_accuracy" -> cvAccuracy
  )

  override def oracles: Map[String, String] = Map(
    // FNV-1a64 replayed in SQL over the same namespaced feature strings
    // (ASCII corpus: unicode(c) == UTF-8 byte; HUGEINT mod-2^64
    // wraparound) — the q39 discipline. pmod(signed, 64) == unsigned
    // low-6-bits because 64 is a power of two.
    "q178_feature_hashing" ->
      """WITH f AS (
        |  SELECT unnest([concat('brand=', p_brand),
        |                 concat('type=', p_type)]) AS feat
        |  FROM part),
        |h AS (
        |  SELECT feat,
        |         list_reduce(
        |           list_prepend(CAST(14695981039346656037 AS UBIGINT),
        |             list_transform(regexp_split_to_array(feat, ''),
        |                            c -> CAST(unicode(c) AS UBIGINT))),
        |           (a, b) -> CAST((CAST(xor(a, b) AS HUGEINT) * 1099511628211)
        |                          % 18446744073709551616 AS UBIGINT)) AS hv
        |  FROM f)
        |SELECT CAST(hv % 64 AS BIGINT) AS bucket,
        |       count(*) AS n_rows,
        |       count(DISTINCT feat) AS n_feats
        |FROM h GROUP BY 1 ORDER BY bucket""".stripMargin,
    // fold membership replayed: identical bar construction (the q63
    // twin), identical md5 preimage 'fold:symbol:user:day', identical
    // single-hex fold boundaries — lowercase hex on both engines
    "q235_cv_folds" ->
      """WITH bars AS (
        |  SELECT event_type AS symbol, user_id,
        |         strftime(ts, '%Y-%m-%d') AS day,
        |         arg_min(value, event_id) AS open,
        |         arg_max(value, event_id) AS close
        |  FROM events GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT symbol, close > open AS up,
        |         md5(concat_ws(':', 'fold', symbol,
        |                       CAST(user_id AS VARCHAR), day)) AS k
        |  FROM bars)
        |SELECT CASE WHEN k < '4' THEN 0 WHEN k < '8' THEN 1
        |            WHEN k < 'c' THEN 2 ELSE 3 END AS fold,
        |       count(*) AS n_obs,
        |       CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
        |       count(DISTINCT symbol) AS n_symbols,
        |       min(k) AS min_hash
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q63_training_base_rate" ->
      """WITH bars AS (
        |  SELECT event_type AS symbol, user_id, strftime(ts, '%Y-%m-%d') AS day,
        |         arg_min(value, event_id) AS open,
        |         arg_max(value, event_id) AS close
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT symbol, count(*) AS n_obs,
        |       CAST(sum(CASE WHEN close > open THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
        |       CAST(sum(CASE WHEN close > open THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS up_rate
        |FROM bars GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
