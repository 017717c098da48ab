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
  /** Arity guard: a wrong-arg-count SQL call must fail with the
    * function's signature, not an IndexOutOfBoundsException from the
    * builder body. */
  private def arity(es: Seq[Expression], n: Int, sig: String): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$sig expects $n argument(s), got ${es.length}")

  /** Second-argument integer literal: checked foldable BEFORE eval so a
    * column argument reports the signature instead of an unrelated
    * eval(null) error. */
  private def intLit(es: Seq[Expression], sig: String): Int = {
    arity(es, 2, sig)
    if (!es(1).foldable) throw new IllegalArgumentException(
      s"$sig: the second argument must be an integer literal, got ${es(1).sql}")
    es(1).eval(null) match {
      case i: Int => i
      // reject out-of-Int-range Longs rather than silently truncating
      // (the count_min_longs rule, applied to every intLit signature)
      case l: Long if l.isValidInt => l.toInt
      case l: Long => throw new IllegalArgumentException(
        s"$sig: the second argument is out of Int range: $l")
      case other => throw new IllegalArgumentException(
        s"$sig: the second argument must be an integer literal, got $other")
    }
  }

  /** name → expression builder for every SQL-exposed custom function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> { es => arity(es, 1, "poly_hash(text)"); PolyHash(es.head) },
    "fnv1a64" -> { es => arity(es, 1, "fnv1a64(text)"); Fnv1a64(es.head) },
    "simhash64" -> { es => arity(es, 1, "simhash64(text)"); SimHash64(es.head) },
    "dot_d" -> { es => arity(es, 2, "dot_d(a, b)"); DotProductD(es(0), es(1)) },
    "word_shingles" -> (es =>
      WordShingles(es.head, intLit(es, "word_shingles(text, k)"))),
    "minhash_signature" -> (es =>
      MinHashSignature(es.head, intLit(es, "minhash_signature(tokens, n)"))),
    "char_entropy_stats" -> { es =>
      arity(es, 1, "char_entropy_stats(text)"); CharEntropyStats(es.head) },
    // aggregate function: the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression when it appears in an aggregation context
    "top_k_longs" -> (es =>
      TopKLongs(es.head, intLit(es, "top_k_longs(col, k)"))),
    "k_min_distinct" -> (es =>
      KMinDistinctLongs(es.head, intLit(es, "k_min_distinct(col, k)"))),
    "misra_gries" -> (es =>
      MisraGriesStrings(es.head, intLit(es, "misra_gries(col, m)"))),
    "count_min_longs" -> { es =>
      val sig = "count_min_longs(col, depth, width, seed)"
      arity(es, 4, sig)
      def lit(i: Int): Int = {
        if (!es(i).foldable) throw new IllegalArgumentException(
          s"$sig: argument ${i + 1} must be an integer literal, got ${es(i).sql}")
        es(i).eval(null) match {
          case v: Int => v
          // reject out-of-Int-range Longs rather than silently
          // truncating (4294967297 would otherwise become width 1)
          case v: Long if v.isValidInt => v.toInt
          case v: Long => throw new IllegalArgumentException(
            s"$sig: argument ${i + 1} out of Int range: $v")
          case other => throw new IllegalArgumentException(
            s"$sig: argument ${i + 1} must be an integer literal, got $other")
        }
      }
      CountMinLongs(es.head, lit(1), lit(2), lit(3))
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
