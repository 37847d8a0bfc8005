package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 connector contract tests: split planning, column pruning,
  * event_id range pushdown (reflected in the scan description and in the
  * planned partition count), and deterministic content. */
class SyntheticEventsSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Long, parts: Int = 4) =
    spark.read.format("graft.sources.SyntheticEvents")
      .option("rows", rows).option("numPartitions", parts).load()

  test("produces the declared row count across partitions") {
    assert(read(1000, 4).count() == 1000)
    assert(read(7, 4).count() == 7)
    assert(read(3, 8).rdd.getNumPartitions <= 3) // never more splits than rows
  }

  test("contradictory or empty pushed ranges return zero rows, not phantoms") {
    assert(read(1000, 4).filter(col("event_id") === 5000L).count() == 0)
    assert(read(0, 4).count() == 0)
    assert(read(1000, 4)
      .filter(col("event_id") > 500L && col("event_id") <= 400L).count() == 0)
  }

  test("event_id range pushdown prunes generated ranges at the source") {
    val df = read(100000, 8).filter(col("event_id") >= 99990 && col("event_id") < 99995)
    assert(df.count() == 5)
    // The pushed range must appear in the DSv2 scan description — proof
    // the source, not a post-scan Filter, did the pruning.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[99990,99995)"), plan)
  }

  test("column pruning reaches the reader") {
    val df = read(10, 1).select("event_type")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=event_type"), plan)
    assert(df.collect().forall(r => SyntheticEventsSpecHelper.types.contains(r.getString(0))))
  }

  test("global count/min/max push down completely: no aggregate in the plan") {
    val df = read(100000, 8)
      .filter(col("event_id") >= 100 && col("event_id") < 200)
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("lo"),
        max(col("event_id")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("agg=COUNT(*),MIN(event_id),MAX(event_id)"), plan)
    assert(plan.contains("range=[100,200)"), plan) // composes with filter pushdown
    assert(!plan.contains("HashAggregate"), plan)  // complete, not partial
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100L, 100L, 199L)))
  }

  test("pushed aggregation over an empty range: count 0, null extrema") {
    val r = read(1000, 4).filter(col("event_id") >= 5000L)
      .agg(count(lit(1)), min(col("event_id")), max(col("event_id")))
      .collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("grouped and non-id aggregates refuse pushdown and stay correct") {
    val grouped = read(1000, 4).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("agg=COUNT"), plan)
    assert(grouped.collect().map(_.getLong(1)).sum == 1000L)
    val byValue = read(1000, 4).agg(min(col("value")))
    assert(!byValue.queryExecution.executedPlan.toString.contains("agg="),
      "min(value) must not push")
    assert(byValue.collect().head.getDouble(0) >= 0.0)
  }

  test("micro-batch stream drains to exactly the batch content") {
    import org.apache.spark.sql.streaming.Trigger
    val streamed = spark.readStream.format("graft.sources.SyntheticEvents")
      .option("rows", 500).option("numPartitions", 3)
      .option("maxRowsPerBatch", 120).load() // 500/120 -> 5 admission batches
    val name = "graft_synth_stream"
    val q = streamed.writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 4, // admission control really batched
      s"expected >=4 batches, got ${q.recentProgress.length}")
    val got = spark.table(name).orderBy("event_id").collect().toSeq
    val want = read(500, 3).orderBy("event_id").collect().toSeq
    assert(got == want)
  }

  test("stream restart resumes from the checkpointed offset: no replays") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = TempDirs.scoped("graft_synth_ckpt")
    val out = TempDirs.scoped("graft_synth_out")
    def drainOnce(): Long = {
      val st = spark.readStream.format("graft.sources.SyntheticEvents")
        .option("rows", 300).option("numPartitions", 2).load()
      val q = st.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(drainOnce() == 300L)
    // second run against the same checkpoint: everything already read
    assert(drainOnce() == 300L)
  }

  test("content is deterministic across reads and layouts") {
    val a = read(500, 2).orderBy("event_id").collect().toSeq
    val b = read(500, 7).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("non-pushable predicates still evaluate correctly in Spark") {
    val n = read(1000, 4).filter(col("event_type") === "error").count()
    val m = read(1000, 4).collect().count(_.getString(2) == "error")
    assert(n == m && n > 0)
  }
}

object SyntheticEventsSpecHelper {
  val types: Set[String] = Set("view", "click", "purchase", "signup", "error")
}
