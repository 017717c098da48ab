package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Pins `Tables.rawTsToMicrosFor` (footer-detected ns-vs-µs unit)
  * against BOTH physical encodings the driver's fixture generator has
  * produced: TIMESTAMP(MICROS) (current, infers as TimestampType) and
  * int64 nanos (earlier rounds' TIMESTAMP(NANOS), which nanosAsLong
  * inference surfaces as LongType). The round-6 regeneration flipped
  * the unit and silently broke 37 green queries; this spec fails fast
  * if either read path regresses. */
class TsUnitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val marks = Seq(
    ("2024-01-01 00:03:52.123456", 1L),
    ("2024-06-30 23:59:59.999999", 2L),
    ("2024-12-31 12:00:00.000001", 3L))

  test("rawTsToMicros reads µs-typed and ns-long events identically") {
    val base = marks.toDF("ts_str", "event_id")
      .select(to_timestamp(col("ts_str")).as("ts"), col("event_id"))

    // encoding 1: native TIMESTAMP(MICROS) column (current fixtures are
    // pyarrow timestamp[us] = INT64; Spark's default writer emits INT96,
    // so pin the output type for a faithful emulation)
    val usDir = Files.createTempDirectory("graft_ts_us_").toString
    val prevOut = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try base.write.mode("overwrite").parquet(usDir)
    finally prevOut match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    // encoding 2: raw int64 ns since epoch (what a TIMESTAMP(NANOS)
    // column becomes under the nanosAsLong read)
    val nsDir = Files.createTempDirectory("graft_ts_ns_").toString
    base.select((unix_micros(col("ts")) * 1000L).as("ts"), col("event_id"))
      .write.mode("overwrite").parquet(nsDir)

    def readBack(dir: String): Seq[(Long, String)] = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .schema("ts LONG, event_id LONG").parquet(dir)
        .withColumn("ts", expr(Tables.rawTsToMicrosFor(spark, dir)))
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    }

    // branch coverage is explicit: the annotated write classifies from
    // the footer; the raw-int64 write has no annotation and must take
    // the per-row magnitude fallback
    assert(Tables.tsUnit(spark, usDir) == Tables.TsUnitMicros)
    assert(Tables.tsUnit(spark, nsDir) == Tables.TsUnitUnknown)

    val viaMicros = readBack(usDir)
    val viaNanos = readBack(nsDir)
    val expected = marks.map { case (s, id) => (id, s) }.sortBy(_._1)
    assert(viaMicros == expected, s"µs read diverged: $viaMicros")
    assert(viaNanos == expected, s"ns read diverged: $viaNanos")
  }
}
