package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation aggregation (SURVEY.md "Optimize for scale"): two-phase
  * salted aggregate. Phase 1 groups on (key, salt) so a hot key's rows
  * spread over `buckets` reducers; phase 2 merges the partials. For
  * algebraic aggregates (sum/count/min/max) the result is identical to the
  * direct groupBy — which is exactly what the DuckDB oracle checks.
  *
  * The salt is deterministic (hash of a stable id column, not rand()) so
  * results are reproducible run-to-run. */
object Salting {

  def saltedSum(df: DataFrame, key: String, saltSource: String,
                value: Column, buckets: Int, out: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(buckets)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(out), sum(col("__n")).as(s"${out}_n"))
  }

  /** Skew-resilient inner equi-join: the (possibly skewed) `left` side
    * scatters each row into one of `buckets` salted sub-keys, and `right`
    * replicates every row to all buckets, so a hot key's rows land on
    * `buckets` shuffle partitions instead of one. Join semantics are
    * exactly the plain inner equi-join (the oracle checks that).
    *
    * Use when the dim is too big to broadcast but a few keys dominate the
    * fact side; replication cost = |right| × buckets. (With AQE on,
    * `spark.sql.adaptive.skewJoin` does this re-plan automatically — this
    * operator is the explicit, deterministic form.) */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: String, buckets: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
