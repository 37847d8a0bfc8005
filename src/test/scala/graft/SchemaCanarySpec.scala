package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary (VERDICT r10 ask #2).
  *
  * The driver regenerates /root/testdata between rounds; round 10 shipped a
  * physical-encoding change (events.ts TIMESTAMP(NANOS) -> timestamp[us])
  * that surfaced as 24 erroring queries, 6 silently-wrong streaming answers
  * and 20 red tests. This suite pins the LOGICAL contract of every table
  * (FIXTURES.md §B) plus the value-range sanity that catches unit mix-ups
  * which still type-check — so the next refresh fails at ONE assert with a
  * readable message instead of 30 queries deep.
  */
class SchemaCanarySpec extends SparkSpec {

  /** FIXTURES.md §B, post-load logical schemas. Timestamp columns are
    * asserted as session-tz TimestampType — what every downstream window /
    * date_format / oracle comparison assumes (sessions pin UTC). */
  private val contract: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** A timestamp column read under a wrong unit lands centuries away; the
    * generated data lives in [1990, 2030]. One cheap min/max per table. */
  private def assertEpochSane(table: String, df: org.apache.spark.sql.DataFrame,
      tsCol: String): Unit = {
    val r = df.agg(min(year(col(tsCol))).as("lo"), max(year(col(tsCol))).as("hi"))
      .head()
    val (lo, hi) = (r.getInt(0), r.getInt(1))
    assert(lo >= 1990 && hi <= 2030,
      s"$table.$tsCol year range [$lo,$hi] outside [1990,2030] — " +
        "timestamp unit drift (nanos/micros mix-up) in the testdata or reader")
  }

  test("every table loads with the FIXTURES.md logical schema") {
    for ((table, cols) <- contract) {
      // events must go through Tables.events only: a raw load resolves the
      // parquet footer eagerly and, under a TIMESTAMP(NANOS) refresh, throws
      // Spark's opaque 'Illegal Parquet type' before the canary's readable
      // drift message (unless the legacy nanos conf leaked from another suite).
      val loaded =
        if (table == "events") Tables.events(spark, sf)
        else Tables.load(spark, sf, table)
      val got = loaded.schema.map(f => f.name -> normalize(f.dataType))
      assert(got == cols,
        s"$table schema drift:\n  expected ${cols.mkString(", ")}\n  got      ${got.mkString(", ")}\n" +
          "The driver refreshed /root/testdata with a new encoding — adapt the reader (Tables.scala).")
    }
  }

  /** Array element nullability is a writer detail, not part of the contract;
    * so is the tz-ness of a plain-loaded micros timestamp — sessions pin
    * spark.sql.session.timeZone=UTC, so TIMESTAMP and TIMESTAMP_NTZ format
    * and compare identically downstream (orders/lineitem queries are
    * oracle-green under both; only events is actively normalized). */
  private def normalize(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(normalize(e))
    case s: StructType => StructType(s.map(f => f.copy(dataType = normalize(f.dataType))))
    case TimestampNTZType => TimestampType
    case other => other
  }

  test("timestamp values are in-era (unit drift canary)") {
    assertEpochSane("events", Tables.events(spark, sf), "ts")
    assertEpochSane("orders", Tables.orders(spark, sf), "o_orderdate")
    assertEpochSane("lineitem", Tables.lineitem(spark, sf), "l_shipdate")
  }

  test("streaming events schema agrees with the batch loader") {
    val batch = Tables.events(spark, sf).schema
    val stream = graft.streaming.MicroBatchPipeline.eventsStream(spark, sf).schema
    assert(stream.map(f => f.name -> f.dataType) == batch.map(f => f.name -> f.dataType),
      s"stream/batch events schema diverged:\n  batch  $batch\n  stream $stream")
  }

  test("normalizeEventTs handles both historical encodings and rejects others") {
    import spark.implicits._
    // old encoding: raw Long nanos
    val nanos = Seq((1L, 1700000000L * 1000000000L)).toDF("event_id", "ts")
    val fromNanos = Tables.normalizeEventTs(nanos)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(unix_micros(col("ts"))).head().getLong(0) ==
      1700000000L * 1000000L)
    // current encoding: TIMESTAMP_NTZ micros
    val ntz = nanos.select(col("event_id"),
      timestamp_micros(col("ts").divide(lit(1000)).cast(LongType))
        .cast(TimestampNTZType).as("ts"))
    val fromNtz = Tables.normalizeEventTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head().getLong(0) ==
      1700000000L * 1000000L)
    // already normalized: pass-through
    assert(Tables.normalizeEventTs(fromNtz).schema("ts").dataType == TimestampType)
    // anything else: loud failure, not a silent mis-read
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    intercept[IllegalStateException](Tables.normalizeEventTs(bad))
  }

  test("NTZ normalization refuses a non-UTC session instead of shifting times") {
    import spark.implicits._
    val ntz = Seq((1L, 1700000000L * 1000000L)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.normalizeEventTs(ntz))
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }
}
