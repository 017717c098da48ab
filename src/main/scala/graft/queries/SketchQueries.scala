package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.{k_min_distinct, misra_gries, poly_hash}
import graft.tables.Tables

/** Mergeable-sketch surface: bounded-state summaries whose partials
  * combine associatively — the aggregation family that replaces exact
  * vocabulary/cardinality-sized state at 100 TB. Three sketches, three
  * determinism disciplines:
  *
  *   - KMV k-minimum-values (q217): the sketch is a pure function of
  *     the input VALUE SET, so the full sketch rides the oracle hash
  *     (DuckDB recomputes it exactly from the same hash preimages);
  *   - Misra–Gries heavy hitters (q216): the surviving entry set is
  *     merge-order-dependent but its GUARANTEES are theorems — the
  *     query reduces the summary to guarantee booleans over exactly
  *     computed heavy keys (the q55/q214 tolerance-boolean pattern);
  *   - HLL / Datasketches (q222): Spark's own hll_sketch_agg partials
  *     union-merge across any grouping; exactness is probabilistic, so
  *     again booleans against the exact count.
  */
object SketchQueries extends QueryPack {

  /** q216: Misra–Gries heavy hitters over the corpus word stream
    * ([[graft.functions.MisraGriesStrings]], m = 64 counters) — the
    * stopword/boilerplate-token detector that never materializes the
    * vocabulary: partials are 64 entries each regardless of corpus
    * size or Zipf skew, vs the exact groupBy whose per-partition state
    * and shuffle are vocabulary-sized. The sketch's THEOREMS — every
    * word with freq > n/(m+1) is captured, estimates only undercount,
    * and by at most n/(m+1) — hold under any merge order (Agarwal et
    * al. PODS'12), so the output is those booleans evaluated per
    * exactly-heavy word: TRUE rows that hash-fail if the sketch ever
    * breaks a guarantee. The exact count pass exists only to define
    * the check set; the sketch never reads it. */
  private def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val m = 64
    val words = Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
      .where(col("w") =!= "")
    val entries = words.agg(misra_gries(col("w"), m).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("w"), col("e.est").as("est"))
    val exact = words.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = exact.agg(sum("cnt").as("n"))
    exact.crossJoin(broadcast(tot))
      .where(col("cnt") * (m + 1) > col("n"))
      .join(entries, Seq("w"), "left")
      .select(col("w").as("word"), col("cnt").as("exact_cnt"),
        col("est").isNotNull.as("captured"),
        (col("est").isNotNull && col("est") <= col("cnt")).as("underest_ok"),
        (col("est").isNotNull &&
          (col("cnt") - col("est")) * (m + 1) <= col("n")).as("residual_ok"))
      .orderBy("word")
  }

  /** q217: KMV distinct sketch with an in-plan MERGEABILITY proof
    * ([[graft.functions.KMinDistinctLongs]], k = 128). Per return-flag
    * group: the k smallest distinct polynomial hashes of the line key,
    * the k-th minimum, and the KMV estimate (k−1)·M / h_k in exact
    * integer arithmetic. Globally, the sketch is computed TWO ways —
    * directly over all rows, and by re-sketching the union of the
    * per-group sketches — and the query emits their equality: the
    * algebraic identity that lets per-partition/per-group sketches
    * roll up to any coarser grouping without rescanning the fact
    * table. Every value here is a pure function of the input set, so
    * the ORACLE REPLAYS THE SKETCH ITSELF (k smallest distinct hashes
    * in SQL), not just a tolerance bound — sketch, estimator and
    * merge identity all ride the hash compare. */
  private def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 128
    val M = 1000000007L
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      poly_hash(concat(
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("string"),
        lit(":k"))).as("h"))
    val per = li.groupBy("flag").agg(
      k_min_distinct(col("h"), k).as("kmv"),
      countDistinct(col("h")).as("exact_d"))
    val direct = li.agg(k_min_distinct(col("h"), k).as("g_direct"))
    val merged = per.select(explode(col("kmv")).as("h"))
      .agg(k_min_distinct(col("h"), k).as("g_merged"))
    // try_element_at, not element_at: Spark 4 runs ANSI by default, and
    // a group with fewer than k distinct keys would otherwise throw on
    // the out-of-bounds index; the oracle's CASE/max form yields NULL
    // for the same case, and est_d's size<k branch handles it
    val global = direct.crossJoin(merged)
      .select((col("g_direct") === col("g_merged")).as("merge_eq"),
        expr(s"try_element_at(g_direct, $k)").as("g_kth"))
    per.crossJoin(broadcast(global))
      .select(col("flag"), col("exact_d"),
        expr(s"try_element_at(kmv, $k)").as("kth_min"),
        when(size(col("kmv")) < k, size(col("kmv")).cast("long"))
          .otherwise(expr(s"${(k - 1).toLong * M}L DIV try_element_at(kmv, $k)"))
          .as("est_d"),
        col("merge_eq"),
        expr(s"${(k - 1).toLong * M}L DIV g_kth").as("g_est_d"))
      .orderBy("flag")
  }

  /** q222: Datasketches HLL rollup through Spark's own sketch
    * functions — per-source `hll_sketch_agg` partials, a global
    * `hll_union_agg` over the per-group SKETCH COLUMN (the rollup
    * never re-reads rows), and `hll_sketch_estimate` on both levels,
    * bounded against exact distinct counts by a 5% boolean (lgK = 12
    * ⇒ ~1.6% typical error; the bound is ~3σ, and the estimate is
    * deterministic per fixture since the sketch hash is fixed). This
    * is the q55 single-level check completed into the thing that
    * matters at 100 TB: sketches as REAGGREGABLE GROUP STATE, the
    * pattern that turns a cube of countDistincts from q scans into
    * one. */
  private def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(hll_sketch_agg(col("doc_id")).as("sk"),
        countDistinct(col("doc_id")).as("exact_d"))
    val global = per.agg(
        hll_union_agg(col("sk")).as("gsk"),
        sum("exact_d").as("g_exact")) // doc_id sets are disjoint by source
      .select(hll_sketch_estimate(col("gsk")).as("g_est"), col("g_exact"))
      .select(col("g_exact"),
        (abs(col("g_est") - col("g_exact")) * 20 <= col("g_exact"))
          .as("g_hll_ok"))
    per.crossJoin(broadcast(global))
      .select(col("source"), col("exact_d"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_d")) * 20
          <= col("exact_d")).as("hll_ok"),
        col("g_exact"), col("g_hll_ok"))
      .orderBy("source")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q216_mg_heavy_hitters" -> heavyHitters,
    "q217_kmv_distinct" -> kmvDistinct,
    "q222_hll_rollup" -> hllRollup
  )

  /** PolyHash replay (the q205 pattern): fold (a·31 + codepoint) mod
    * 1e9+7 over the string's codepoints. */
  private def duckPolyHash(sqlExpr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(regexp_split_to_array($sqlExpr, ''),
       |                   ch -> CAST(unicode(ch) AS BIGINT))),
       |  (a, cp) -> (a * 31 + cp) % 1000000007)""".stripMargin

  override def oracles: Map[String, String] = Map(
    // guarantee booleans: heavy set from exact counts; captured /
    // underest / residual are theorems, so the oracle emits TRUE
    "q216_mg_heavy_hitters" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        |  FROM documents),
        |f AS (SELECT w, count(*) AS cnt FROM w WHERE w <> '' GROUP BY w),
        |t AS (SELECT sum(cnt) AS n FROM f)
        |SELECT w AS word, cnt AS exact_cnt,
        |       true AS captured, true AS underest_ok, true AS residual_ok
        |FROM f CROSS JOIN t WHERE cnt * 65 > n ORDER BY word""".stripMargin,
    "q217_kmv_distinct" -> {
      val h = duckPolyHash("CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) || ':k'")
      s"""WITH li AS (
         |  SELECT l_returnflag AS flag, $h AS h FROM lineitem),
         |d AS (SELECT DISTINCT flag, h FROM li),
         |r AS (SELECT flag, h, row_number()
         |        OVER (PARTITION BY flag ORDER BY h) AS rn FROM d),
         |kmv AS (SELECT flag, h, rn FROM r WHERE rn <= 128),
         |per AS (
         |  SELECT flag, count(*) AS sz, max(CASE WHEN rn = 128 THEN h END) AS kth
         |  FROM kmv GROUP BY flag),
         |ex AS (SELECT flag, count(*) AS exact_d FROM d GROUP BY flag),
         |gd AS (SELECT DISTINCT h FROM li),
         |gr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gd),
         |gkth AS (SELECT max(CASE WHEN rn = 128 THEN h END) AS g_kth FROM gr),
         |-- merged route: re-rank the union of the per-group sketches
         |mu AS (SELECT DISTINCT h FROM kmv),
         |mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM mu),
         |meq AS (
         |  SELECT count(*) = 0 AS merge_eq FROM (
         |    SELECT h, rn FROM gr WHERE rn <= 128
         |    EXCEPT SELECT h, rn FROM mr WHERE rn <= 128))
         |SELECT ex.flag AS flag, ex.exact_d, per.kth AS kth_min,
         |       CASE WHEN per.sz < 128 THEN per.sz
         |            ELSE CAST(127 AS BIGINT) * 1000000007 // per.kth END AS est_d,
         |       meq.merge_eq,
         |       CAST(127 AS BIGINT) * 1000000007 // gkth.g_kth AS g_est_d
         |FROM ex JOIN per ON per.flag = ex.flag
         |CROSS JOIN meq CROSS JOIN gkth
         |ORDER BY ex.flag""".stripMargin
    },
    // per-source exact distincts + TRUE tolerance booleans (the HLL
    // estimate is Spark-internal; a >5% error flips a boolean and
    // hash-fails)
    "q222_hll_rollup" ->
      """WITH per AS (
        |  SELECT source, count(DISTINCT doc_id) AS exact_d
        |  FROM documents GROUP BY source),
        |g AS (SELECT CAST(sum(exact_d) AS BIGINT) AS g_exact FROM per)
        |SELECT source, exact_d, true AS hll_ok, g_exact, true AS g_hll_ok
        |FROM per CROSS JOIN g ORDER BY source""".stripMargin
  )
}
