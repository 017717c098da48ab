package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Per-query repeats: single-run timings at this scale swing up to 3×
    // between rounds with no code change (JVM/JIT/GC noise), which can
    // mask a real regression of the same size — report the median of 3.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: one tiny end-to-end job absorbs JVM/codegen startup
    // so the first timed query isn't charged for it.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Deterministic execution order (Map iteration order is not).
    // The noop sink forces FULL materialization of every projected column
    // and keeps the final sort — `count()` would let Catalyst prune both,
    // under-billing projection-heavy queries.
    var failed = List.empty[String]
    // Local-dev iteration only (the driver never sets it): restrict the
    // run to a comma-separated subset of query names.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val attempts = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
      var rep = 0
      while (rep < reps && attempts.forall(_._2)) { // a failing query is not retried
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            failed ::= s"$name:${e.getClass.getSimpleName}"; false
          }
        attempts += (((System.nanoTime() - t0) / 1e9, ok))
        rep += 1
      }
      val times = attempts.collect { case (t, true) => t }.toSeq
      // A query with no successful rep reports its elapsed-to-failure time
      // (never 0.0): a broken query must not make the total LOOK faster —
      // `failed` carries the authoritative signal, but the headline
      // shouldn't flatter.
      val median =
        if (times.nonEmpty) times.sorted.apply(times.size / 2)
        else attempts.headOption.map(_._1).getOrElse(0.0)
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"reps":$reps,"sf":"$sfDir"}""")
    // Compact trailer: the full line above can exceed the driver's tail
    // capture (90 entries), losing the leading "value" field — repeat the
    // headline LAST so a tail-truncated artifact still carries it.
    // Locale.ROOT: the f-interpolator uses the default locale, which can
    // emit comma decimals (de_DE) and corrupt the JSON artifact.
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v) =>
        s"\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(v))
      }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","slowest":$slowest,"n_failed":${failed.size},"n_queries":${results.size},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
