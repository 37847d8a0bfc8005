package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftSparkExtensions, Scale}

class ScaleSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, sf)
      .withColumn("vc", round(col("value") * 100).cast("long"))
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(col("vc")).as("sum_vc"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Scale.saltedSum(ev, Seq("event_type"), col("vc"), "vc",
        saltFrom = col("event_id"), buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salt is deterministic and spans the bucket range") {
    val ev = Tables.events(spark, sf)
      .select(Scale.salt(col("event_id"), 16).as("s"))
    val values = ev.distinct().collect().map(_.getLong(0)).toSet
    assert(values.forall(s => s >= 0 && s < 16))
    assert(values.size > 8) // spread, not collapsed
    val again = Tables.events(spark, sf)
      .select(Scale.salt(col("event_id"), 16).as("s"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(values == again)
  }

  test("extensions installer injects the custom functions and the rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    // The injected optimizer rule must be the distinct-rewrite, applied
    // through the same factory a spark.sql.extensions deployment uses.
    val rules = org.apache.spark.sql.GraftExtensionsProbe
      .optimizerRules(ext, spark)
    assert(rules.exists(_.isInstanceOf[graft.plans.ApproxDistinctRewrite]),
      rules.map(_.getClass.getName).mkString(", "))
  }

  test("bucketed tables sort-merge join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucket_a")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucket_b")
      val joined = spark.table("li_bucket_a")
        .join(spark.table("li_bucket_b"), "l_orderkey")
      joined.count() // materialize through AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucket_a")
      spark.sql("DROP TABLE IF EXISTS li_bucket_b")
    }
  }
}
