package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming near-duplicate dedup — the batch MinHash+LSH tier made
  * incremental, with FIRST-SEEN-WINS semantics: a document is dropped iff
  * an LSH band candidate within the exact-Jaccard threshold was seen in an
  * EARLIER batch (any doc_id — an emitted survivor is never retracted), or
  * has a smaller doc_id in the SAME batch (ids are the deterministic
  * within-batch tiebreak). For a single-batch drain this reduces exactly
  * to the batch tier's min-lower-id greedy contract, which is how the
  * declared query is oracled; across batches it is the standard
  * append-only streaming dedup guarantee (the keeper is the first
  * arrival, not the globally smallest id, because a streaming sink
  * cannot un-emit).
  *
  * Cross-batch state is an LSH INDEX, not the raw corpus: per batch, the
  * incoming docs' band buckets and hashed shingle sets are appended to a
  * parquet index keyed by batch id. Each micro-batch then joins its bucket
  * rows against the accumulated index (an equi-join on (band, bucket) —
  * cost is candidate collisions, never batch × history), verifies
  * candidates with exact Jaccard over the stored shingle sets, and writes
  * survivors. Signatures come from [[Dedup.shingleSet]]/
  * [[Dedup.bandBuckets]], so batch and stream can never drift.
  *
  * Replay safety: every write of batch N goes to an overwrite-mode
  * `b<N>` subdirectory (index slices and survivor output alike), so a
  * batch retried after a mid-write failure replaces its own partial
  * output — the parquet-dir analogue of the JDBC sink's delete-by-batch-id
  * — and the checkpoint guarantees a COMMITTED batch never re-runs.
  *
  * Scale note: the index grows with the corpus, but the per-batch join
  * only shuffles the batch's bucket rows against matching bucket keys;
  * history never re-shuffles. The streaming analogue of the hot-bucket
  * problem (a boilerplate band bucket accumulating the whole corpus,
  * degrading toward batch-size × bucket-history join output) is guarded
  * by BUCKET SATURATION: only the first `bucketCap` docs per (band,
  * bucket) — first-seen order, the already-emitted keepers — serve as
  * index-side exemplars, bounding candidates at batch-rows × cap. A
  * newcomer matching only beyond-cap members of a saturated bucket can
  * slip through; with 32 bands a doc needs ALL its band buckets saturated
  * past its matches to escape, the standard trade for bounded work.
  */
object StreamingDedup {

  /** Index-side exemplars per (band, bucket): far above any honest
    * bucket's size, only degenerate boilerplate buckets saturate. */
  val DefaultBucketCap = 1024

  /** Start the dedup stream over `docs` (needs `doc_id` and `text`).
    * Survivor rows (full schema) land under `outDir/b<batchId>`. */
  def start(docs: DataFrame, stateDir: String, outDir: String,
      checkpoint: String, threshold: Double = Dedup.JaccardThreshold,
      trigger: Trigger = Trigger.AvailableNow(),
      bucketCap: Int = DefaultBucketCap): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, stateDir, outDir, threshold, bucketCap)
        ()
      }
      .start()

  def run(docs: DataFrame, stateDir: String, outDir: String,
      checkpoint: String, threshold: Double = Dedup.JaccardThreshold,
      bucketCap: Int = DefaultBucketCap): Unit =
    start(docs, stateDir, outDir, checkpoint, threshold,
      bucketCap = bucketCap).awaitTermination()

  /** One micro-batch: index this batch, candidate-join against the whole
    * index (this batch included, so within-batch dups are caught by the
    * same path), verify, emit survivors. */
  private def processBatch(batch: DataFrame, batchId: Long,
      stateDir: String, outDir: String, threshold: Double,
      bucketCap: Int = DefaultBucketCap): Unit = {
    val spark = batch.sparkSession
    val withSets = batch
      .select(col("doc_id"), Dedup.shingleSet(col("text")).as("hv"))
      .persist()
    val bands = withSets.select(col("doc_id"),
      posexplode(Dedup.bandBuckets(col("hv"))).as(Seq("band", "bucket")))
    // Index first, then read the union back: the batch's own slice must be
    // part of the candidate search so within-batch duplicates fall out of
    // the same join instead of needing a separate self-join code path.
    // Slices carry their batch id so the join can tell "earlier batch"
    // (first-seen wins, any id) from "this batch" (id tiebreak).
    bands.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$stateDir/bands/b$batchId")
    withSets.write.mode("overwrite").parquet(s"$stateDir/sets/b$batchId")
    val allBands = spark.read.parquet(s"$stateDir/bands/*")
    val allSets = spark.read.parquet(s"$stateDir/sets/*")
    // Hot-bucket guard: only the first bucketCap docs per bucket (in
    // first-seen order — exactly the docs that could have been emitted as
    // keepers) stay joinable, bounding join output at batch-rows × cap.
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
      .orderBy(col("batch_id"), col("doc_id"))
    val exemplars = allBands
      .withColumn("_rn", row_number().over(wBucket))
      .filter(col("_rn") <= bucketCap)
      .drop("_rn")
    val candidates = bands
      .select(col("band"), col("bucket"), col("doc_id").as("new_id"))
      .join(exemplars.select(col("band"), col("bucket"),
          col("doc_id").as("old_id"), col("batch_id")),
        Seq("band", "bucket"))
      .filter(col("batch_id") < batchId ||
        (col("batch_id") === batchId && col("old_id") < col("new_id")))
      .select(col("new_id"), col("old_id"))
      .distinct()
    val dupIds = candidates
      .join(withSets.select(col("doc_id").as("new_id"), col("hv").as("hv_new")),
        Seq("new_id"))
      .join(allSets.select(col("doc_id").as("old_id"), col("hv").as("hv_old")),
        Seq("old_id"))
      .filter(Dedup.jaccardOf(col("hv_new"), col("hv_old")) >= threshold)
      .select(col("new_id").as("doc_id"))
      .distinct()
    batch.join(dupIds, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
    withSets.unpersist()
  }

  /** All survivors emitted so far. */
  def survivors(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/b*")

  /** The declared-query form: stream the documents table through the
    * dedup (one AvailableNow drain into session-scoped temp dirs) and
    * return surviving doc ids. Oracle: a doc survives iff it is not the
    * larger side of any exact-Jaccard near-dup pair — on this corpus LSH
    * candidates equal the exact pair set (asserted by the batch tier's
    * tests), so the exact-SQL oracle covers the streaming path too. */
  def streamNearDupDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val state = java.nio.file.Files.createTempDirectory("graft_sdedup_state").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sdedup_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdedup_ckpt").toString
    val schema = graft.Tables.documents(spark, dir).schema
    val docs = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    run(docs, state, out, ckpt)
    survivors(spark, out).select(col("doc_id")).orderBy(col("doc_id"))
  }
}
