package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (the full custom-operator ladder:
  * LogicalPlan node → SparkStrategy → SparkPlan, registered via
  * SparkSessionExtensions / ExperimentalMethods): bounded top-k rows per
  * key, executed as one pass of per-key size-k min-heaps over each
  * key-clustered partition.
  *
  * Why an operator instead of the window form (`row_number().over(
  * partitionBy(keys).orderBy(desc)) <= k`): the window SORTS every
  * partition — O(n log n) per partition and full materialization — where
  * the heap pass is O(n log k) with O(keys·k) memory, never holding more
  * than k rows per key. Same reason the aggregate tier has TopKByScore
  * (functions/TopKAggregate.scala); this is the ROW-level form that keeps
  * whole input rows without packing them into an aggregate buffer.
  *
  * Semantics: rows ranked by `order` DESCENDING per distinct `keys`
  * value; rows whose order value is NULL are dropped; ties beyond k are
  * broken arbitrarily (callers needing stable output include a tiebreak
  * in `order`, e.g. `score * 1e6 - id`). Requires a numeric-castable
  * order expression (cast to double by the public helper).
  */
case class TopKPerKey(keys: Seq[Expression], order: Expression, k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node; `planLater` leaves the child to the normal
  * planner, and `requiredChildDistribution` on the exec node makes
  * EnsureRequirements insert the hash exchange on the keys. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Expression, k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val boundOrder = BindReferences.bindReference(order, childOutput)
      // min-heap per key: the head is the weakest of the current top k,
      // evicted when a stronger row arrives
      implicit val byScoreAsc: Ordering[(Double, InternalRow)] =
        Ordering.by[(Double, InternalRow), Double](_._1).reverse
      val heaps = mutable.HashMap
        .empty[InternalRow, mutable.PriorityQueue[(Double, InternalRow)]]
      iter.foreach { row =>
        boundOrder.eval(row) match {
          case null => // null order value: excluded, like ORDER BY ... LIMIT
          case v =>
            val score = v.asInstanceOf[Number].doubleValue()
            val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
              mutable.PriorityQueue.empty[(Double, InternalRow)])
            if (heap.size < k) heap.enqueue((score, row.copy()))
            else if (score > heap.head._1) {
              heap.dequeue()
              heap.enqueue((score, row.copy()))
            }
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sortBy(-_._1).iterator.map(_._2))
    }
  }
}

object TopKPerKeyOps {

  /** Top k rows per key, ordered by `orderCol` descending. Installs the
    * strategy into the session's extra strategies (idempotent); SQL-only
    * deployments get it from GraftSparkExtensions instead. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.addStrategy(df.sparkSession, TopKPerKeyStrategy)
    // Cast built in catalyst directly: the Column bridge converts plain
    // attribute columns eagerly, but composite column nodes (e.g.
    // Column.cast) stay Unevaluable wrappers inside a CUSTOM logical node
    // (no analyzer rule rewrites them there).
    GraftColumnBridge.ofRows(df.sparkSession,
      TopKPerKey(
        keyCols.map(c => GraftColumnBridge.expression(df(c))),
        org.apache.spark.sql.catalyst.expressions.Cast(
          GraftColumnBridge.expression(df(orderCol)),
          org.apache.spark.sql.types.DoubleType),
        k, df.queryExecution.analyzed))
  }
}
