package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HashFunctions.poly_hash
import graft.tables.Tables

/** Data-integrity operators a 100 TB pipeline runs constantly but rarely
  * shows up in query benchmarks: order-independent table fingerprints
  * (cross-cluster/table-copy diff), importance-weighted corpus sampling,
  * and malformed-record routing on ingest.
  *
  * Determinism rules per QueryPack: every cross-row aggregate is an
  * integer XOR / SUM / COUNT; the one float (q206's log priority) is
  * per-row, rounded to an integer key before any ranking touches it.
  */
object IntegrityQueries extends QueryPack {

  /** q205: order-independent table fingerprint + copy-integrity audit.
    * Each row is canonicalized to a pipe-joined string of exact values
    * (cents, not floats; formatted dates), hashed (polynomial mod 1e9+7),
    * and XOR-folded per `l_returnflag` group alongside count and cent
    * sums. The SAME fingerprint is then computed over a physically
    * rewritten copy (repartition(7) → parquet → re-read, i.e. different
    * file count, row order, and encoding) and joined back: `match_fp`
    * must be true for every group.
    *
    * Scale: this is how you diff a 100 TB table against its replica
    * without moving data — each side computes a one-pass map-side-
    * combinable aggregate (XOR and SUM are commutative), ships one row
    * per group, and the comparison localizes divergence to a group. The
    * rewrite in-query is the self-test: it proves the fingerprint is
    * invariant to physical layout, which is the whole point.
    */
  private def tableFingerprint(spark: SparkSession, dir: String): DataFrame = {
    def canonical(df: DataFrame): DataFrame = df.select(
      col("l_returnflag").as("flag"),
      concat_ws("|",
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd")).as("row_img"),
      round(col("l_extendedprice") * 100).cast("long").as("price_c"))
    def fingerprint(df: DataFrame): DataFrame = canonical(df)
      .select(col("flag"), poly_hash(col("row_img")).as("h"), col("price_c"))
      .groupBy("flag")
      .agg(count(lit(1)).as("n_rows"),
        bit_xor(col("h")).as("xor_fp"),
        sum(col("price_c")).as("sum_price_c"))

    val original = fingerprint(Tables.lineitem(spark, dir))
    val copyDir = MlQueries.tempDirDeletedOnExit("graft_fp_copy_")
    Tables.lineitem(spark, dir).repartition(7).write
      .mode("overwrite").parquet(copyDir)
    val copy = fingerprint(spark.read.parquet(copyDir))
      .select(col("flag"), col("xor_fp").as("copy_fp"),
        col("n_rows").as("copy_rows"))
    original.join(copy, Seq("flag"))
      .select(col("flag"), col("n_rows"), col("xor_fp"), col("sum_price_c"),
        (col("xor_fp") === col("copy_fp") &&
          col("n_rows") === col("copy_rows")).as("match_fp"))
      .orderBy("flag")
  }

  /** q206: importance-weighted corpus sampling (Efraimidis–Spirakis
    * A-ES): priority = ln(u)/w with u a per-doc rational in (0,1)
    * derived from the deterministic polynomial hash of the doc id and
    * w = n_chars, take the global top-20 priorities. Longer documents
    * are proportionally more likely to be kept — the standard shape for
    * quality- or length-weighted corpus downsampling before training.
    *
    * Determinism: u is an exact rational (hash mod 1e6 + 1)/1000002 and
    * w an integer, so both engines evaluate ln on identical doubles; the
    * priority is rounded to an integer nano-key BEFORE ranking and ties
    * break on doc_id, so the selection is reproducible bit-for-bit (the
    * oracle replays hash, u, and key verbatim).
    *
    * Scale: one in-scan pass computes keys; the global top-20 is a
    * TakeOrdered (per-partition heap + driver merge of 20×partitions
    * rows) — no sort, no shuffle of the corpus. This is reservoir
    * sampling's weighted cousin and composes with it (q132).
    */
  private def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val h = poly_hash(col("doc_id").cast("string"))
    val u = ((pmod(h, lit(1000000L)) + 1).cast("double")) / 1000002.0
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(log(u) / col("n_chars") * 1e9).cast("long").as("prio_nano"))
      .orderBy(col("prio_nano").desc, col("doc_id"))
      .limit(20)
  }

  /** q207: malformed-record routing on ingest — the PERMISSIVE +
    * `_corrupt_record` contract. A deterministic seventh of the events'
    * JSON `props` payloads are truncated (dropping the closing brace) to
    * model wire corruption; `from_json` with an explicit schema and a
    * declared corrupt-record column parses the rest, and the aggregate
    * reports, per event_type, how many rows parsed, how many were
    * quarantined, and the sum of the parsed field — so a parser that
    * silently nulls a good row or "rescues" a bad one breaks the hash.
    *
    * Scale: parse + routing ride the scan (one pass, no extra exchange
    * beyond the final small aggregate). Quarantining corrupt raw rows to
    * a side table instead of failing the job is the only ingest behavior
    * that survives real data; FAILFAST at 100 TB is an outage.
    */
  private def corruptJsonRouting(spark: SparkSession, dir: String): DataFrame = {
    val mangled = when(col("event_id") % 7 === 0,
      expr("substring(props, 1, length(props) - 1)")).otherwise(col("props"))
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("_bad", StringType)))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        from_json(mangled, schema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_bad")).as("p"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        count(col("p._bad")).as("n_corrupt"),
        count(col("p.k")).as("n_valid"),
        sum(col("p.k")).as("sum_k"))
      .orderBy("event_type")
  }

  /** Benford micro-unit first-digit probabilities: round(log10(1+1/d)·10⁶)
    * (Newcomb 1881 / Benford 1938). The nine rounded constants sum to
    * EXACTLY 1,000,000, so expected counts partition n·10⁶ with no
    * remainder digit. */
  private val benfordMicro: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** q257: BENFORD FIRST-DIGIT AUDIT over order totals — the classic
    * fabricated-data / ingestion-bug screen (Newcomb 1881; Nigrini's
    * forensic-accounting use): the leading digit of naturally occurring
    * monetary amounts follows log10(1+1/d), and a pipeline that
    * truncates, pads, or synthesizes a column shifts the histogram hard.
    * Emitted per digit: observed count, observed micro-proportion, the
    * Benford expectation, and the χ² contribution — all exact integers
    * (dev = n_d·10⁶ − n·p_micro; term_micro = dev² div (n·p_micro) with
    * the square widened to decimal(38,0)/HUGEINT since dev² overflows
    * int64 past ~3M rows — the q246 widening discipline). The digit
    * domain is a 9-row literal LEFT-joined to the counts so an absent
    * digit still contributes its full expected-count penalty.
    *
    * Scale shape: one map-side-combinable count per digit (9 groups), a
    * 1-row total broadcast onto a 9-row frame — the audit's cost is ONE
    * scan regardless of table size; at 100 TB it rides the same pass as
    * any other profile aggregate. The fixture's totals are synthetic
    * uniform-ish, so the χ² terms are LARGE — the audit correctly
    * flags non-Benford data; the operator contract is the exact
    * arithmetic, not a pass verdict. */
  private def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(spark, dir).select(
      expr("CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)" +
        " AS STRING), 1, 1) AS BIGINT)").as("digit"))
    val obs = x.groupBy("digit").agg(count(lit(1)).as("n_d"))
    val tot = x.agg(count(lit(1)).as("n"))
    val dom = spark.range(1, 10).select(col("id").as("digit"))
      .withColumn("exp_micro",
        benfordMicro.foldLeft(lit(0L)) { case (acc, (d, p)) =>
          when(col("digit") === d, lit(p)).otherwise(acc)
        })
    dom.join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n_d"))
      .crossJoin(broadcast(tot))
      .withColumn("dev",
        col("n_d") * lit(1000000L) - col("n") * col("exp_micro"))
      .select(col("digit"), col("n_d"), col("n"),
        expr("(1000000 * n_d) div n").as("obs_micro"),
        col("exp_micro"),
        expr("(CAST(dev AS DECIMAL(38,0)) * dev) div (n * exp_micro)")
          .as("chi2_term_micro"))
      .orderBy("digit")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q205_table_fingerprint" -> tableFingerprint,
    "q206_weighted_sample" -> weightedSample,
    "q207_corrupt_json_routing" -> corruptJsonRouting,
    "q257_benford_digits" -> benfordDigits
  )

  override def oracles: Map[String, String] = Map(
    // Digit extraction, the 9-row domain left join, dev and the
    // HUGEINT-widened χ² term replayed; dev² is positive so `//`
    // truncation agrees with Spark's decimal `div`.
    "q257_benford_digits" -> {
      val dom = benfordMicro
        .map { case (d, p) => s"($d, $p)" }.mkString(", ")
      s"""WITH x AS (
         |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
         |           AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM orders),
         |obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_d
         |        FROM x GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
         |dom(digit, exp_micro) AS (VALUES $dom),
         |j AS (
         |  SELECT CAST(dom.digit AS BIGINT) AS digit,
         |         coalesce(n_d, 0) AS n_d, n,
         |         CAST(dom.exp_micro AS BIGINT) AS exp_micro,
         |         coalesce(n_d, 0) * 1000000 - n * dom.exp_micro AS dev
         |  FROM dom LEFT JOIN obs ON obs.digit = dom.digit CROSS JOIN tot)
         |SELECT digit, n_d, n, (1000000 * n_d) // n AS obs_micro,
         |       exp_micro,
         |       CAST((CAST(dev AS HUGEINT) * dev) // (n * exp_micro)
         |         AS BIGINT) AS chi2_term_micro
         |FROM j ORDER BY digit""".stripMargin
    },
    // The oracle computes the fingerprint ONCE from the base table —
    // match_fp is a constant true; a Spark-side layout sensitivity (copy
    // fingerprint differing) fails the hash on that column.
    "q205_table_fingerprint" ->
      """WITH c AS (
        |  SELECT l_returnflag AS flag,
        |         l_orderkey || '|' || l_linenumber || '|' ||
        |         CAST(round(l_quantity * 100) AS BIGINT) || '|' ||
        |         CAST(round(l_extendedprice * 100) AS BIGINT) || '|' ||
        |         l_linestatus || '|' ||
        |         strftime(l_shipdate, '%Y-%m-%d') AS row_img,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem),
        |h AS (
        |  SELECT flag, price_c,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(regexp_split_to_array(row_img, ''),
        |                            ch -> CAST(unicode(ch) AS BIGINT))),
        |           (a, cp) -> (a * 31 + cp) % 1000000007) AS hv
        |  FROM c)
        |SELECT flag, count(*) AS n_rows, bit_xor(hv) AS xor_fp,
        |       CAST(sum(price_c) AS BIGINT) AS sum_price_c,
        |       true AS match_fp
        |FROM h GROUP BY flag ORDER BY flag""".stripMargin,
    "q206_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |         list_reduce(
        |           list_prepend(CAST(0 AS BIGINT),
        |             list_transform(
        |               regexp_split_to_array(CAST(doc_id AS VARCHAR), ''),
        |               ch -> CAST(unicode(ch) AS BIGINT))),
        |           (a, cp) -> (a * 31 + cp) % 1000000007) AS hv
        |  FROM documents WHERE n_chars > 0),
        |p AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(round(ln(CAST(hv % 1000000 + 1 AS DOUBLE) / 1000002.0)
        |                    / n_chars * 1e9) AS BIGINT) AS prio_nano
        |  FROM k)
        |SELECT doc_id, source, n_chars, prio_nano
        |FROM p ORDER BY prio_nano DESC, doc_id LIMIT 20""".stripMargin,
    "q207_corrupt_json_routing" ->
      """WITH m AS (
        |  SELECT event_type,
        |         CASE WHEN event_id % 7 = 0
        |              THEN substring(props, 1, length(props) - 1)
        |              ELSE props END AS payload
        |  FROM events),
        |p AS (
        |  SELECT event_type,
        |         CASE WHEN json_valid(payload)
        |              THEN CAST(json_extract(payload, '$.k') AS BIGINT)
        |              END AS k,
        |         NOT json_valid(payload) AS corrupt
        |  FROM m)
        |SELECT event_type, count(*) AS n_rows,
        |       count(CASE WHEN corrupt THEN 1 END) AS n_corrupt,
        |       count(k) AS n_valid,
        |       CAST(sum(k) AS BIGINT) AS sum_k
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
