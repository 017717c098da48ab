package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver t1-smoke equivalent: the flagship query returns rows and every
  * declared oracle has a matching query. */
class EntrySmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique across packs") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
  }

  test("all queries run non-empty on sf0.001 except the data-dependent pair queries") {
    val mayBeEmpty = Set("q08_customers_without_orders_anti",
      "q37_ngram_jaccard_pairs", "q38_minhash_pairs", "q40_cosine_neardup",
      "q62_lsh_cosine_neardup",
      // sf0.001 has ~1 supplier per nation: nobody beats their own average
      "q83_correlated_subquery")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
