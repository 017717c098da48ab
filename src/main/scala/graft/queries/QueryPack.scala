package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-visible queries. `queries` maps name →
  * (session, sf-dir) → result; `oracles` maps the same name → ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Names without an
  * oracle get a weaker rows-only check (driver contract in SparkEntry).
  *
  * Determinism rules for every entry (SURVEY.md §5, §7 "What's hard"):
  *   - explicit orderBy on a unique key in BOTH Spark and SQL;
  *   - aggregate/computed columns aliased identically on both sides;
  *   - floats that underwent arithmetic rounded on both sides;
  *   - timestamps emitted as formatted strings (parquet ns vs Spark µs
  *     truncation would otherwise break hash equality).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
