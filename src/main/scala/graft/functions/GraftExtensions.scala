package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * poly_hash(text) ...")` works next to the Column API.
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`;
  * for an existing session use [[GraftFunctions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
  }
}

object GraftFunctions {
  /** name → expression builder for every SQL-exposed custom function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> (es => PolyHash(es.head)),
    "fnv1a64" -> (es => Fnv1a64(es.head)),
    "simhash64" -> (es => SimHash64(es.head)),
    "dot_d" -> (es => DotProductD(es(0), es(1))),
    "word_shingles" -> { es =>
      val k = es(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"word_shingles(text, k): k must be an integer literal, got $other")
      }
      WordShingles(es.head, k)
    },
    "minhash_signature" -> { es =>
      val n = es(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"minhash_signature(tokens, n): n must be an integer literal, got $other")
      }
      MinHashSignature(es.head, n)
    },
    // aggregate function: the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression when it appears in an aggregation context
    "top_k_longs" -> { es =>
      val k = es(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"top_k_longs(col, k): k must be an integer literal, got $other")
      }
      TopKLongs(es.head, k)
    })

  /** Runtime registration on an already-built session (temp functions +
    * the binned-range-join optimizer rule via extraOptimizations). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.Bridge.registerTempFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BinnedRangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BinnedRangeJoinRule
  }
}
