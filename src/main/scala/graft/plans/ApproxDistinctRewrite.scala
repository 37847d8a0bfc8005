package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite exact `COUNT(DISTINCT x)` into a
  * HyperLogLog++ sketch when the session opts in.
  *
  * Why a Rule and not a query change: at 100 TB the difference between
  * exact distinct (an Expand + full shuffle of every distinct value) and
  * a mergeable HLL sketch (O(1) state per group, one map-side-combinable
  * pass) is the difference between a job that finishes and one that
  * doesn't — but the QUERY is the same. Making the trade a session
  * config (`spark.graft.approxCountDistinct.rsd`, unset/empty = off)
  * lets the same declared pipeline run exact in verification and
  * sketched in production, without touching query code.
  *
  * The rewrite preserves the aggregate's `resultId`, so downstream
  * attribute references bind unchanged; multi-argument COUNT(DISTINCT
  * a, b) and filtered aggregates are left exact.
  */
case class ApproxDistinctRewrite(rsdConf: () => Option[String])
    extends Rule[LogicalPlan] {

  @transient private var warnedInvalid: Option[String] = None

  override def apply(plan: LogicalPlan): LogicalPlan =
    // A malformed or out-of-range rsd must not poison the session (this
    // rule runs on EVERY plan): treat it as opted out — but say so once,
    // or a user who opted in with a typo silently keeps exact counts.
    // HLL++ supports relativeSD < 0.4 (~ precision >= 4).
    rsdConf() match {
      case Some(raw)
          if !scala.util.Try(raw.toDouble).toOption.exists(r => r > 0 && r < 0.4) =>
        if (!warnedInvalid.contains(raw)) {
          warnedInvalid = Some(raw)
          logWarning(s"${ApproxDistinctRewrite.ConfKey}='$raw' is not a " +
            "number in (0, 0.4); COUNT(DISTINCT) rewrite is DISABLED")
        }
        plan
      case None => plan
      case Some(raw) =>
        val rsd = raw.toDouble
        plan.transformAllExpressions {
          case ae @ AggregateExpression(c: Count, mode, true, filter, resultId)
              if c.children.size == 1 && filter.isEmpty =>
            AggregateExpression(
              HyperLogLogPlusPlus(c.children.head, rsd),
              mode, isDistinct = false, filter, resultId)
        }
    }
}

object ApproxDistinctRewrite {
  val ConfKey = "spark.graft.approxCountDistinct.rsd"

  /** Rule instance reading the flag from the live session at apply time
    * (rules are constructed once per session but applied per query). */
  def forSession(spark: org.apache.spark.sql.SparkSession): ApproxDistinctRewrite =
    ApproxDistinctRewrite(() =>
      Option(spark.conf.getOption(ConfKey).orNull).filter(_.nonEmpty))
}
