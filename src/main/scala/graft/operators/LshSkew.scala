package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-bucket guard for LSH candidate self-joins.
  *
  * A bucket of size B emits B² rows through `buckets ⋈ buckets`, so ONE
  * degenerate bucket — an all-zero embedding cluster, a boilerplate band
  * signature, any constant-ish key — turns the whole candidate join
  * quadratic. Uniform synthetic data never shows this; real corpora are
  * clustered and always do.
  *
  * The guard splits over-cap buckets deterministically: every row gets
  * `salt = id % ceil(B / cap)` and candidates only form within a salt
  * group, bounding per-bucket join output at ~B·cap while each row keeps
  * ~cap candidate partners. Under the cap, `ceil(B/cap) = 1`, the salt is
  * constant 0 and the join is bit-identical to the unguarded one — the
  * guard is free until a bucket actually goes hot. Inside a hot bucket,
  * recall degrades gracefully (cross-salt pairs are lost) — the standard
  * production trade for bounded work. Everything is deterministic (no
  * rand()), so a SQL oracle can replay the exact same split.
  *
  * The size lookup is a window count over the bucket key — one pass over
  * the ids-only bucket rows, partitioned the same way the candidate join
  * shuffles anyway.
  */
object LshSkew {

  /** Append a `salt` column to a bucket assignment. Join candidate sides
    * on `keyCols :+ "salt"` instead of `keyCols`. `idCol` must be a
    * non-negative integral id (salt uses plain mod). */
  def saltBuckets(buckets: DataFrame, keyCols: Seq[String], idCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    val nSalt: Column =
      ceil(count(lit(1)).over(w) / lit(cap.toDouble)).cast("long")
    buckets.withColumn("salt", pmod(col(idCol), nSalt))
  }
}
