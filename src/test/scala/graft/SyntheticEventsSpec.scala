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
