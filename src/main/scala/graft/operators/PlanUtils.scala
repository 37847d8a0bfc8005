package graft.operators

import org.apache.spark.sql.DataFrame

/** Plan/storage helpers shared by the iterative operators. */
private[graft] object PlanUtils {

  /** Free a localCheckpoint's executor-storage blocks NOW.
    *
    * `Dataset.unpersist` only uncaches CacheManager entries; a
    * localCheckpoint's materialized RDD is not one, so its
    * MEMORY_AND_DISK blocks otherwise live until the RDD is GC'd. In a
    * long session (the bench suite, a resident service) that residue
    * taxes every later query's memory headroom. Safe on any frame —
    * non-checkpointed plans are left alone. */
  def freeLocalCheckpoint(dfs: DataFrame*): Unit = dfs.foreach { df =>
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
