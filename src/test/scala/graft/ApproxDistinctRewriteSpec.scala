package graft

import org.apache.spark.sql.functions._
import graft.plans.ApproxDistinctRewrite

/** The opt-in COUNT(DISTINCT) → HLL rewrite: off by default, on via
  * session config, exact results preserved for the forms it must not
  * touch. Installed here through experimental.extraOptimizations (the
  * same Rule instance GraftSparkExtensions injects). */
class ApproxDistinctRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def distinctCount(): (Long, String) = {
    val df = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
    (df.agg(sum(col("n"))).as[Long].head(),
      df.queryExecution.optimizedPlan.toString)
  }

  test("rewrites to HLL only when the session opts in") {
    val rule = ApproxDistinctRewrite.forSession(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      spark.conf.unset(ApproxDistinctRewrite.ConfKey)
      val (exact, planOff) = distinctCount()
      assert(!planOff.contains("approx_count_distinct"), planOff)

      spark.conf.set(ApproxDistinctRewrite.ConfKey, "0.01")
      val (approx, planOn) = distinctCount()
      assert(planOn.contains("approx_count_distinct"), planOn)
      assert(math.abs(approx - exact) <= math.max(2L, (exact * 0.05).toLong),
        s"approx $approx vs exact $exact")
    } finally {
      spark.conf.unset(ApproxDistinctRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("malformed rsd disables the rewrite without failing queries") {
    val rule = ApproxDistinctRewrite.forSession(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      for (bad <- Seq("five-percent", "0,05", "0.5", "-0.1")) {
        spark.conf.set(ApproxDistinctRewrite.ConfKey, bad)
        val (_, plan) = distinctCount() // must not throw
        assert(!plan.contains("approx_count_distinct"), s"rsd=$bad: $plan")
      }
    } finally {
      spark.conf.unset(ApproxDistinctRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }

  test("multi-column and filtered distincts stay exact under the flag") {
    val rule = ApproxDistinctRewrite.forSession(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try {
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "0.01")
      val df = Tables.events(spark, sf).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id"), col("event_id")).as("n2"))
      assert(!df.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
    } finally {
      spark.conf.unset(ApproxDistinctRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    }
  }
}
