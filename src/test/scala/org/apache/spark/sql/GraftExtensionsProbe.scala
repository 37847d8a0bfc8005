package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only bridge into the private[sql] surface of
  * SparkSessionExtensions, so the installer test can assert what actually
  * got injected instead of just "apply didn't throw". */
object GraftExtensionsProbe {
  def optimizerRules(ext: SparkSessionExtensions,
      session: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(session)

  def plannerStrategies(ext: SparkSessionExtensions,
      session: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(session)
}
