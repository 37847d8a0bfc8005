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
    * non-negative integral id (salt uses plain mod).
    *
    * `broadcastSizes = true` computes bucket sizes with a partial-agg
    * groupBy broadcast-joined back — the right shape when the key space
    * is small and bounded (hyperplane LSH: tables × 2^bits keys), where a
    * window would sort-shuffle every bucket row just to count. Leave it
    * false when bucket keys are unbounded hashes (MinHash bands): the
    * sizes table scales with the corpus and must stay shuffle-side. */
  def saltBuckets(buckets: DataFrame, keyCols: Seq[String], idCol: String,
      cap: Int, broadcastSizes: Boolean = false): DataFrame = {
    val nSalt: Column => Column = bsize =>
      ceil(bsize / lit(cap.toDouble)).cast("long")
    if (broadcastSizes) {
      val sizes = buckets.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_bsize"))
      buckets.join(broadcast(sizes), keyCols)
        .withColumn("salt", pmod(col(idCol), nSalt(col("_bsize"))))
        .drop("_bsize")
    } else {
      val w = Window.partitionBy(keyCols.map(col): _*)
      buckets.withColumn("salt", pmod(col(idCol), nSalt(count(lit(1)).over(w))))
    }
  }
}
