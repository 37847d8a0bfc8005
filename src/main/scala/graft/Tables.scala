package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Every table is a single parquet file under `dir` — at real scale these would be
  * partitioned directories; nothing here assumes a single file, so the same code
  * works unchanged against a 100 TB partitioned layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Glob matching EXACTLY `<dir>/<table>.parquet` — file or directory
    * layout — and nothing else. FileStreamSource needs a glob-or-directory
    * path (a bare file path fails its basePath-directory check, and
    * parent-dir + pathGlobFilter silently lists zero files from a
    * directory-shaped table), but the previous `<table>.parquet*` trailing
    * wildcard overmatched: a leftover `<table>.parquet_old` or `.bak`
    * sibling would be silently ingested into every streaming query. A
    * single-character class keeps glob treatment (so both layouts resolve)
    * with exact-match semantics — probed against both layouts plus a decoy
    * sibling: `*` doubled the rows, this form reads exactly the table. */
  def streamGlob(dir: String, table: String): String =
    s"$dir/$table.parque[t]"

  def region(s: SparkSession, dir: String): DataFrame     = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = load(s, dir, "lineitem")
  /** events.ts has shipped under two physical encodings across testdata
    * refreshes: parquet TIMESTAMP(NANOS) (reads as raw Long nanos under the
    * legacy conf) and plain timestamp[us] (reads as TIMESTAMP_NTZ). Setting
    * the legacy conf is required to even LOAD a nanos file and is a no-op
    * for micros files, so it stays unconditional; the rewrite branches on
    * the schema Spark actually resolved. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, dir, "events"))
  }

  /** The ONE ts-normalization shared by the batch loader and the streaming
    * reader (MicroBatchPipeline.eventsStream) — the two paths diverging is
    * exactly how round 10 shipped a silent 1000x event-time compression.
    *
    *  - LongType: raw nanos (old TIMESTAMP(NANOS) encoding under the legacy
    *    conf, and test fixtures that land Long columns). `ts div 1000` stays
    *    in Long — integer floor-to-micros matches DuckDB/pandas, and a
    *    double division would lose precision above 2^53 ns.
    *  - TIMESTAMP_NTZ (current timestamp[us] testdata): cast to the session
    *    TimestampType. All entry points pin spark.sql.session.timeZone=UTC,
    *    so the cast is micros-exact and downstream windows/date_format keep
    *    the same types and values as before.
    *  - TimestampType: already normalized, pass through.
    * Anything else fails loudly here instead of 30 queries deep. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType             => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case _: TimestampNTZType  =>
      // The NTZ->TimestampType cast is only value-exact under a UTC session;
      // a non-UTC consumer would get silently shifted event times. Fail loudly
      // instead of relying on the entry points' convention.
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"events.ts is TIMESTAMP_NTZ and spark.sql.session.timeZone=$tz; " +
          "the NTZ->timestamp cast is only exact under UTC — set the session timezone to UTC")
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _: TimestampType     => df
    case other => throw new IllegalStateException(
      s"events.ts: unsupported physical type $other — expected Long nanos or a timestamp")
  }
  def documents(s: SparkSession, dir: String): DataFrame  = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}
