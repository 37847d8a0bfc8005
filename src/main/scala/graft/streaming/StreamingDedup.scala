package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.operators.{Dedup, Similarity}

/** Streaming near-duplicate dedup — the batch LSH tiers made incremental,
  * with FIRST-SEEN-WINS semantics: a record is dropped iff an LSH bucket
  * candidate within the exact similarity threshold was seen in an EARLIER
  * batch (any id — an emitted survivor is never retracted), or has a
  * smaller id in the SAME batch (ids are the deterministic within-batch
  * tiebreak). For a single-batch drain this reduces exactly to the batch
  * tiers' min-lower-id greedy contract, which is how the declared queries
  * are oracled; across batches it is the standard append-only streaming
  * dedup guarantee (the keeper is the first arrival, because a streaming
  * sink cannot un-emit).
  *
  * One signature-agnostic core serves both tiers:
  *   - documents: MinHash band buckets over hashed shingle sets, exact
  *     Jaccard verification ([[Dedup.shingleSet]]/[[Dedup.bandBuckets]]/
  *     [[Dedup.jaccardOf]] — the batch tier's own definitions, so batch
  *     and stream can never drift);
  *   - embeddings: seeded hyperplane buckets, exact cosine verification
  *     ([[Similarity.planeBuckets]], same planes as the batch tier).
  *
  * Cross-batch state is an LSH INDEX, not the raw corpus: per batch, the
  * incoming records' buckets and signatures are appended to a parquet
  * index keyed by batch id. Each micro-batch joins its bucket rows
  * against the accumulated index (an equi-join on (band, bucket) — cost
  * is candidate collisions, never batch × history), verifies candidates
  * exactly over the stored signatures, and writes survivors.
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
  * problem (a boilerplate bucket accumulating the whole corpus, degrading
  * toward batch-size × bucket-history join output) is guarded by BUCKET
  * SATURATION: only the first `bucketCap` records per (band, bucket) in
  * arrival order — keepers and dropped dups alike; any earlier arrival
  * is a valid dedup witness under first-seen-wins — serve as index-side
  * exemplars, bounding candidates at batch-rows × cap. A newcomer
  * matching only beyond-cap members of a saturated bucket can slip
  * through; with L bands/tables a record needs ALL its buckets saturated
  * past its matches to escape — the standard trade for bounded work.
  */
object StreamingDedup {

  /** Index-side exemplars per (band, bucket): far above any honest
    * bucket's size, only degenerate boilerplate buckets saturate. */
  val DefaultBucketCap = 1024

  /** The EMBEDDING tier's default saturation cap — deliberately tight.
    * The fixed-hyperplane bucket space is AnnTables × 2^AnnBits = 128
    * keys, so bucket occupancy grows LINEARLY with the corpus, and on a
    * structureless corpus (this one: pair-cosine std = 1/sqrt(64),
    * P(cos >= 0.45) ≈ 7e-5) the TRUE qualifying-pair count grows
    * quadratically — any witness search honoring every pair must do
    * quadratic work (measured: BENCH_SCALE ratio 1.5–3.0 at 10× when
    * effectively uncapped). The exemplar cap is the designed cost bound:
    * per-append work stays at batch-rows × bands × cap (measured flat,
    * ratio 0.46 at 10×), at the documented witness-miss trade — a
    * newcomer escapes only if EVERY one of its buckets saturated past
    * all its true matches. On clustered corpora any retained exemplar
    * witnesses its bucket, so the miss rate is negligible; here the cap
    * is what makes the lifecycle scale-safe, so it is the DEFAULT and
    * the loose document-tier cap is the opt-in. The oracle twin is
    * [[graft.operators.Similarity.cappedWitnessPairScoresCtes]]. */
  val EmbeddingBucketCap = 128

  /** What varies between the document and embedding tiers. `sig` is the
    * stored-signature expression over the incoming frame's columns;
    * `buckets` maps a signature to its bucket array (posexplode index =
    * band/table id); `isDup` is the exact verification predicate over two
    * signatures. */
  private[streaming] final case class LshDedupSpec(
      idCol: String,
      sig: Column,
      buckets: Column => Column,
      isDup: (Column, Column) => Column)

  private[streaming] def jaccardSpec(
      threshold: Double = Dedup.JaccardThreshold): LshDedupSpec =
    LshDedupSpec("doc_id",
      Dedup.shingleSet(col("text")),
      Dedup.bandBuckets,
      (a, b) => Dedup.jaccardOf(a, b) >= threshold)

  private[streaming] def embeddingSpec(
      threshold: Double = Similarity.NearDupThreshold): LshDedupSpec =
    LshDedupSpec("vec_id",
      col("embedding"),
      Similarity.planeBuckets,
      (a, b) => graft.functions.GraftExpressions.cosineFast(a, b) >= threshold)

  /** Start a dedup stream with the given spec. Survivor rows (full input
    * schema) land under `outDir/b<batchId>`. */
  private[streaming] def startWith(records: DataFrame, spec: LshDedupSpec,
      stateDir: String, outDir: String, checkpoint: String,
      trigger: Trigger, bucketCap: Int): StreamingQuery =
    records.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, spec, stateDir, outDir, bucketCap)
        ()
      }
      .start()

  /** Document-tier front end (needs `doc_id` and `text`). */
  def start(docs: DataFrame, stateDir: String, outDir: String,
      checkpoint: String, threshold: Double = Dedup.JaccardThreshold,
      trigger: Trigger = Trigger.AvailableNow(),
      bucketCap: Int = DefaultBucketCap): StreamingQuery =
    startWith(docs, jaccardSpec(threshold), stateDir, outDir, checkpoint,
      trigger, bucketCap)

  def run(docs: DataFrame, stateDir: String, outDir: String,
      checkpoint: String, threshold: Double = Dedup.JaccardThreshold,
      bucketCap: Int = DefaultBucketCap): Unit =
    start(docs, stateDir, outDir, checkpoint, threshold,
      bucketCap = bucketCap).awaitTermination()

  /** Embedding-tier front end (needs `vec_id` and `embedding`). */
  def startEmbedding(emb: DataFrame, stateDir: String, outDir: String,
      checkpoint: String, threshold: Double = Similarity.NearDupThreshold,
      trigger: Trigger = Trigger.AvailableNow(),
      bucketCap: Int = EmbeddingBucketCap): StreamingQuery =
    startWith(emb, embeddingSpec(threshold), stateDir, outDir, checkpoint,
      trigger, bucketCap)

  def runEmbedding(emb: DataFrame, stateDir: String, outDir: String,
      checkpoint: String, threshold: Double = Similarity.NearDupThreshold,
      bucketCap: Int = EmbeddingBucketCap): Unit =
    startEmbedding(emb, stateDir, outDir, checkpoint, threshold,
      bucketCap = bucketCap).awaitTermination()

  /** Batch-side incremental dedup: match a new corpus slice against the
    * existing LSH index (same parquet format the streaming tier writes)
    * and append the slice to it — what a recurring curation job runs
    * nightly, without rebuilding signatures for the accumulated corpus.
    * Exactly the streaming tier's per-batch path, so batch and stream
    * slices interoperate in one index and [[compactState]] applies.
    * `batchId` defaults to (max slice id in the index) + 1; passing an
    * id already in the index REPLACES that slice and its survivors
    * (overwrite-mode replay, same as a retried micro-batch). Returns
    * this slice's survivors as a LAZY frame over `outDir/b<id>` — consume
    * it before replaying the same batch id, because the replay overwrites
    * the part files the frame points at (a stale read throws
    * FileNotFoundException; [[survivors]] re-lists and is always safe). */
  def appendBatch(slice: DataFrame, stateDir: String, outDir: String,
      threshold: Double = Dedup.JaccardThreshold,
      bucketCap: Int = DefaultBucketCap, batchId: Long = -1L): DataFrame = {
    val spark = slice.sparkSession
    val id = if (batchId >= 0) batchId else nextBatchId(spark, stateDir)
    processBatch(slice, id, jaccardSpec(threshold), stateDir, outDir, bucketCap)
    spark.read.parquet(s"$outDir/b$id")
  }

  /** Embedding twin of [[appendBatch]] (needs `vec_id` and `embedding`). */
  def appendEmbeddingBatch(slice: DataFrame, stateDir: String, outDir: String,
      threshold: Double = Similarity.NearDupThreshold,
      bucketCap: Int = EmbeddingBucketCap, batchId: Long = -1L): DataFrame = {
    val spark = slice.sparkSession
    val id = if (batchId >= 0) batchId else nextBatchId(spark, stateDir)
    processBatch(slice, id, embeddingSpec(threshold), stateDir, outDir, bucketCap)
    spark.read.parquet(s"$outDir/b$id")
  }

  /** Media twin of [[appendBatch]] — the third cell of the incremental
    * matrix (text, embedding, multimodal). Expects the fingerprint frame
    * the phash tier produces (`media_id`, `phash`): the decode + aHash
    * pass stays in [[graft.operators.Multimodal]]; this tier only needs
    * the 64-bit signature, so the index stores 16 bytes per asset, never
    * pixels. Banding is the phash near-dup join's scheme (4 × 16-bit
    * bands — pigeonhole-EXACT at hamming ≤ bands − 1), verification is
    * the exact hamming predicate on the stored signatures. */
  def appendMediaBatch(slice: DataFrame, stateDir: String, outDir: String,
      maxHamming: Int = graft.operators.Multimodal.PhashMaxHamming,
      bucketCap: Int = DefaultBucketCap, batchId: Long = -1L): DataFrame = {
    val spark = slice.sparkSession
    val id = if (batchId >= 0) batchId else nextBatchId(spark, stateDir)
    processBatch(slice, id, phashSpec(maxHamming), stateDir, outDir, bucketCap)
    spark.read.parquet(s"$outDir/b$id")
  }

  private[streaming] def phashSpec(
      maxHamming: Int = graft.operators.Multimodal.PhashMaxHamming): LshDedupSpec =
    LshDedupSpec("media_id",
      col("phash"),
      h => array((0 until graft.operators.Multimodal.PhashBands).map(b =>
        shiftright(h, b * 16).bitwiseAND(lit(65535L))): _*),
      (a, b) => bit_count(a.bitwiseXOR(b)) <= maxHamming)

  /** Batch id encoded in a slice directory name (`b<id>` for raw slices,
    * `c<id>` for compactions — a compaction's id is the highest batch it
    * contains). Single parser shared by [[nextBatchId]] and
    * [[compactState]] so the naming scheme cannot drift. Strict match:
    * a foreign entry under the index dir (say a stray `_SUCCESS`-like
    * dir, or `bc1`, which a loose stripPrefix parse would read as id 1)
    * yields None and is skipped rather than misparsed. */
  private val SliceName = "^[bc](\\d+)$".r
  private[graft] def sliceBatch(dir: String): Option[Long] =
    dir.substring(dir.lastIndexOf('/') + 1) match {
      case SliceName(id) => Some(id.toLong)
      case _ => None
    }

  /** Next free slice id under a slice base dir: one past the newest
    * slice. Shared with the persisted ANN index, which reuses this
    * b/c slice convention for its postings. */
  private[graft] def nextSliceId(spark: SparkSession, base: String): Long = {
    val ids = listSlices(spark, base).flatMap(sliceBatch)
    if (ids.isEmpty) 0L else ids.max + 1L
  }

  /** Next free batch id: one past the newest slice OR tombstone — the
    * shared clock that makes a tombstone kill exactly the index state
    * that existed when the delete ran ([[deleteFromIndex]]). */
  private def nextBatchId(spark: SparkSession, stateDir: String): Long =
    graft.operators.IndexFiles.nextSliceIdAcross(spark,
      Seq(s"$stateDir/bands", s"$stateDir/tombstones"))

  /** Forget documents from the persisted LSH index — the dedup tier's own
    * DELETE verb (same tombstone convention as [[graft.operators.IvfIndex.delete]]):
    * a tombstone slice of rec_ids under `stateDir/tombstones`, killing
    * band/signature rows from STRICTLY earlier batches. A forgotten
    * record stops serving as a dedup witness on both the read side
    * ([[serveTextBatch]]) and the write side (later batches' candidate
    * joins); [[compactState]] folds tombstones into the physical slices.
    * Explicit `sliceId` replays idempotently. Returns the slice id. */
  def deleteFromIndex(spark: SparkSession, stateDir: String, ids: DataFrame,
      sliceId: Long = -1L): Long = {
    graft.operators.IndexFiles.delete(ids.toDF("rec_id"), "rec_id",
      s"$stateDir/bands", s"$stateDir/tombstones", sliceId)
  }

  /** One micro-batch: index this batch, candidate-join against the whole
    * index (this batch included, so within-batch dups are caught by the
    * same path), verify, emit survivors. */
  private def processBatch(batch: DataFrame, batchId: Long,
      spec: LshDedupSpec, stateDir: String, outDir: String,
      bucketCap: Int): Unit = {
    val spark = batch.sparkSession
    val withSigs = batch
      .select(col(spec.idCol).as("rec_id"), spec.sig.as("sig"))
      .persist()
    // Persist this batch's slices for FUTURE batches, but search over
    // prior slices UNIONed with the in-memory batch frames — the batch's
    // own rows never round-trip through parquet, and within-batch
    // duplicates still fall out of the same join (no separate self-join
    // code path). Slices carry their batch id so the join can tell
    // "earlier batch" (first-seen wins, any id) from "this batch"
    // (id tiebreak). persist: four consumers (slice write, touched keys,
    // index union, candidate side) would otherwise re-run the banding
    // kernel over the batch once each.
    val taggedBands = withSigs.select(col("rec_id"),
        posexplode(spec.buckets(col("sig"))).as(Seq("band", "bucket")))
      .withColumn("batch_id", lit(batchId))
      .persist()
    taggedBands.write.mode("overwrite").parquet(s"$stateDir/bands/b$batchId")
    withSigs.write.mode("overwrite").parquet(s"$stateDir/sets/b$batchId")
    // Prior state is read tombstone-aware: a deleted record must not
    // witness-dedup this batch ([[deleteFromIndex]]). The in-memory batch
    // frames are never tombstoned (their batch id postdates every
    // existing tombstone), so only the disk side anti-joins.
    def priorSlices(base: String): Seq[String] =
      listSlices(spark, base).filterNot(_.endsWith(s"/b$batchId"))
    val tombsBase = s"$stateDir/tombstones"
    val priorBands = priorSlices(s"$stateDir/bands")
    val allBands =
      if (priorBands.isEmpty) taggedBands
      else graft.operators.IndexFiles
        .readLiveFrom(spark, priorBands, tombsBase, "rec_id")
        .unionByName(taggedBands)
    val priorSigs = priorSlices(s"$stateDir/sets")
    val allSigs =
      if (priorSigs.isEmpty) withSigs
      else graft.operators.IndexFiles
        .readLiveFrom(spark, priorSigs, tombsBase, "rec_id")
        .unionByName(withSigs)
    // Hot-bucket guard: only the first bucketCap records per bucket (in
    // first-seen arrival order — keepers AND dropped dups alike; any
    // earlier arrival is a valid dedup witness under first-seen-wins)
    // stay joinable, bounding join output at batch-rows × cap. The index
    // is semi-joined to THIS batch's bucket keys before the rank window:
    // ranks are per-bucket, so pruning non-colliding buckets first gives
    // identical exemplars while the window only ever sorts the buckets
    // this batch actually touches — per-batch cost stays proportional to
    // collisions, not to accumulated history.
    val touched = taggedBands.select(col("band"), col("bucket")).distinct()
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
      .orderBy(col("batch_id"), col("rec_id"))
    val exemplars = allBands
      .join(touched, Seq("band", "bucket"), "left_semi")
      // a compaction crashed between rename and cleanup can leave a slice
      // next to its own merge — identical rows twice; dedup the (small,
      // already-pruned) exemplar input so the saturation cap counts
      // records, not row copies
      .dropDuplicates("rec_id", "band", "bucket", "batch_id")
      .withColumn("_rn", row_number().over(wBucket))
      .filter(col("_rn") <= bucketCap)
      .drop("_rn")
    val candidates = taggedBands
      .select(col("band"), col("bucket"), col("rec_id").as("new_id"))
      .join(exemplars.select(col("band"), col("bucket"),
          col("rec_id").as("old_id"), col("batch_id")),
        Seq("band", "bucket"))
      .filter(col("batch_id") < batchId ||
        (col("batch_id") === batchId && col("old_id") < col("new_id")))
      .select(col("new_id"), col("old_id"))
      .distinct()
    val dupIds = candidates
      .join(withSigs.select(col("rec_id").as("new_id"), col("sig").as("sig_new")),
        Seq("new_id"))
      .join(allSigs.select(col("rec_id").as("old_id"), col("sig").as("sig_old")),
        Seq("old_id"))
      .filter(spec.isDup(col("sig_new"), col("sig_old")))
      .select(col("new_id").as(spec.idCol))
      .distinct()
    batch.join(dupIds, Seq(spec.idCol), "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
    withSigs.unpersist()
    taggedBands.unpersist()
  }

  /** Visible (non-hidden) slice directories under an index subdir.
    * Dot-prefixed names are in-flight compaction temps — never read. */
  private[graft] def listSlices(spark: SparkSession, base: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(base)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path)
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).toSeq
  }

  /** Compact the index's per-batch slices: thousands of micro-batches
    * mean thousands of small parquet dirs, and listing + footer reads
    * amplify every batch. Merges all slices for batches <= `upToBatchId`
    * (and earlier compactions) into one `c<upToBatchId>` slice per
    * subdir; band rows KEEP their original batch_id, so first-seen
    * ordering and the earlier-batch/same-batch distinction are
    * unaffected — results are bit-identical before and after.
    *
    * Crash safety: the merge writes to a dot-prefixed temp (invisible to
    * readers), renames it visible (return value CHECKED — Hadoop
    * FileSystems report many failures by returning false), then deletes
    * the merged inputs. A crash between rename and deletes leaves
    * duplicate rows visible; results stay identical anyway (candidates
    * and dup decisions are DISTINCT-ed, and the exemplar ranking dedups
    * its input), and re-running compactState removes the copies. Run it
    * between drains — never concurrently with an active query on the
    * same state dir. */
  def compactState(spark: SparkSession, stateDir: String,
      upToBatchId: Long): Unit =
    // bands and sets share one tombstone dir, so only the LAST fold may
    // purge it (a crash between the two re-folds bands' fresh `c` slice
    // harmlessly: its tag equals upToBatchId, above every folded
    // tombstone, so the re-applied anti-join matches nothing).
    for ((sub, last) <- Seq("bands" -> false, "sets" -> true))
      graft.operators.IndexFiles.compactWithTombstones(spark,
        s"$stateDir/$sub", s"$stateDir/tombstones", upToBatchId, "rec_id",
        purgeTombstones = last) { (merged, dst) =>
        merged.write.mode("overwrite").parquet(dst)
      }

  /** The generic slice-merge step behind [[compactState]], shared with the
    * persisted ANN index (whose compacted slice needs a partitioned
    * write — hence the pluggable writer). Merges all slices with id <=
    * `upToBatchId` into one `c<upToBatchId>` slice, deduplicated. */
  private[graft] def compactSlices(spark: SparkSession, base: String,
      upToBatchId: Long)(write: (DataFrame, String) => Unit): Unit = {
    val merge = listSlices(spark, base)
      .filter(sliceBatch(_).exists(_ <= upToBatchId))
    if (merge.size > 1)
      // Each slice is read under its own root and unioned by name: a
      // single multi-root read would trip partition discovery on
      // partitioned slices (the persisted ANN index's cell=N layout)
      // with CONFLICTING_DIRECTORY_STRUCTURES.
      publishCompacted(spark, base, upToBatchId,
        merge.map(spark.read.parquet(_)).reduce(_ unionByName _).distinct(),
        merge)(write)
  }

  /** The crash-safe publish step of every compaction: write `merged` to a
    * dot-prefixed temp (invisible to readers), rename it to `c<upTo>`
    * (return value CHECKED — Hadoop FileSystems report many failures by
    * returning false), then delete the `inputs` it replaces plus
    * `alsoDelete` (a tombstone-folding compaction removes the tombstone
    * slices it just applied). Factored out of [[compactSlices]] so the
    * tombstone-aware variant ([[graft.operators.IndexFiles.compactWithTombstones]])
    * shares one rename dance. */
  private[graft] def publishCompacted(spark: SparkSession, base: String,
      upToBatchId: Long, merged: DataFrame, inputs: Seq[String],
      alsoDelete: Seq[String] = Nil)(
      write: (DataFrame, String) => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(base, s".c$upToBatchId.tmp")
    // batch-sized shuffle: the merge must not fragment the compacted
    // slice into session-default-many part files.
    MicroBatchPipeline.withBatchSizedShuffle(spark) {
      write(merged, tmp.toString)
    }
    val dst = new org.apache.hadoop.fs.Path(base, s"c$upToBatchId")
    fs.delete(dst, true)
    // An unchecked false here would leave the merge hidden in the
    // dot-dir while the loop below deletes all inputs — silently
    // destroying the index. Abort before any deletion.
    if (!fs.rename(tmp, dst)) throw new IllegalStateException(
      s"compactSlices: rename $tmp -> $dst failed; index left unmodified")
    // dst itself may be among the inputs (re-run after a crash) — it
    // now holds the fresh merge, so it must survive this cleanup
    (inputs ++ alsoDelete).filterNot(_.endsWith(s"/c$upToBatchId"))
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }

  /** All survivors emitted so far. */
  def survivors(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/b*")

  /** READ-side serving against the text LSH index: match one batch of
    * query documents against the persisted index WITHOUT mutating it —
    * the retrieval twin of the write path ("which already-indexed
    * documents does this new document duplicate?"). Candidates come from
    * the index's (band, bucket) exemplars under the same saturation cap
    * as the write path, semi-joined to this batch's touched buckets
    * first (per-batch cost ∝ collisions, never accumulated history);
    * exact Jaccard verifies. Output is batch-id-keyed overwrite parquet
    * (idempotent replay), and because the index is FIXED during serving,
    * batch boundaries cannot change the result.
    *
    * `asOf` (default: everything) serves the SNAPSHOT at logical slice
    * `asOf` — the [[graft.operators.IndexFiles.readLive]] verb on both
    * the band and signature sides, so data slices AND tombstones past the
    * snapshot are invisible (a delete issued after the snapshot does not
    * retro-hide matches), and a compaction that merged history past the
    * snapshot refuses loudly instead of serving the coarser state. */
  private[graft] def serveTextBatch(batch: DataFrame, stateDir: String,
      outDir: String, batchId: Long, threshold: Double,
      bucketCap: Int, asOf: Long = Long.MaxValue): Unit =
    serveBatchWith(batch, jaccardSpec(threshold), Dedup.jaccardOf,
      "jaccard", "query_doc", "match_doc", stateDir, outDir, batchId,
      bucketCap, asOf)

  /** Media twin of [[serveTextBatch]]: a batch of query fingerprints
    * (`media_id`, `phash`) served read-only against the persisted phash
    * index — "which already-indexed assets does this new asset
    * near-duplicate". Emits the hamming distance as the match strength. */
  def serveMediaBatch(batch: DataFrame, stateDir: String, outDir: String,
      batchId: Long,
      maxHamming: Int = graft.operators.Multimodal.PhashMaxHamming,
      bucketCap: Int = DefaultBucketCap, asOf: Long = Long.MaxValue): Unit =
    serveBatchWith(batch, phashSpec(maxHamming),
      (a, b) => bit_count(a.bitwiseXOR(b)).cast("long"),
      "hamming", "query_media", "match_media", stateDir, outDir, batchId,
      bucketCap, asOf)

  /** The generic READ-side serve behind [[serveTextBatch]] and the media
    * twin: signatures, banding, and the verify predicate come from the
    * same [[LshDedupSpec]] the write path indexes with, so serve and
    * index cannot disagree on the candidate scheme; `score` renders the
    * emitted match strength (jaccard, hamming, cosine) from the two
    * signatures. */
  private[graft] def serveBatchWith(batch: DataFrame, spec: LshDedupSpec,
      score: (Column, Column) => Column, scoreName: String,
      qName: String, mName: String, stateDir: String, outDir: String,
      batchId: Long, bucketCap: Int, asOf: Long = Long.MaxValue): Unit = {
    val spark = batch.sparkSession
    val withSigs = batch.select(col(spec.idCol).as("q_id"),
        spec.sig.as("sig_q"))
      .persist()
    val qBands = withSigs.select(col("q_id"),
        posexplode(spec.buckets(col("sig_q"))).as(Seq("band", "bucket")))
      .persist()
    // Tombstone-aware: a deleted record must not come back as a match
    // ([[deleteFromIndex]] — the serving side of the forget verb).
    val allBands = graft.operators.IndexFiles
      .readLive(spark, s"$stateDir/bands", s"$stateDir/tombstones",
        "rec_id", asOf)
    val touched = qBands.select(col("band"), col("bucket")).distinct()
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
      .orderBy(col("batch_id"), col("rec_id"))
    val exemplars = allBands
      .join(touched, Seq("band", "bucket"), "left_semi")
      .dropDuplicates("rec_id", "band", "bucket", "batch_id")
      .withColumn("_rn", row_number().over(wBucket))
      .filter(col("_rn") <= bucketCap)
      .drop("_rn")
    // a compaction crashed between rename and cleanup can leave a slice
    // next to its own merge — identical signature rows twice; dedupe by
    // id (same defense as the exemplar input above) so the sig join
    // cannot double matched output rows
    val allSigs = graft.operators.IndexFiles
      .readLive(spark, s"$stateDir/sets", s"$stateDir/tombstones",
        "rec_id", asOf)
      .dropDuplicates("rec_id")
    val candidates = qBands
      .join(exemplars.select(col("band"), col("bucket"),
          col("rec_id").as("m_id")),
        Seq("band", "bucket"))
      .select(col("q_id"), col("m_id"))
      .distinct()
    candidates
      .join(withSigs, Seq("q_id"))
      .join(allSigs.select(col("rec_id").as("m_id"), col("sig").as("sig_m")),
        Seq("m_id"))
      .filter(spec.isDup(col("sig_q"), col("sig_m")))
      .select(col("q_id").as(qName), col("m_id").as(mName),
        score(col("sig_q"), col("sig_m")).as(scoreName))
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
    withSigs.unpersist()
    qBands.unpersist()
  }

  /** Declared-query form: the train split is indexed once (one
    * [[appendBatch]] slice — the write path unchanged), then the eval
    * split arrives as a QUERY STREAM and each micro-batch is served
    * read-only against that index. The near-dup serving twin of
    * `stream_ann_serve`. Oracle: the index's LSH candidates equal the
    * exact pair set on this corpus (the batch tier's pinned property),
    * so the output is exactly the cross-split exact-Jaccard pairs. */
  def streamTextServeQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    import org.apache.spark.sql.streaming.OutputMode
    val docs = graft.Tables.documents(spark, dir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
    // index built once per corpus (graft.StateCache); the QUERY STREAM —
    // the thing this query measures — drains per invocation
    val state = graft.StateCache.stateDir(dir, "txtidx/train",
        "graft_tserve_state") { state =>
      val sink = graft.TempDirs.scoped("graft_tserve_sink")
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        appendBatch(docs.filter(!isEval), state, sink).count()
      }
    }
    val out = graft.TempDirs.scoped("graft_tserve_out")
    val ckpt = graft.TempDirs.scoped("graft_tserve_ckpt")
    MicroBatchPipeline.withBatchSizedShuffle(spark) {
      val queries = spark.readStream.schema(docs.schema)
        .parquet(graft.Tables.streamGlob(dir, "documents"))
        .filter(isEval)
      queries.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          serveTextBatch(b.toDF(), state, out, id,
            Dedup.JaccardThreshold, DefaultBucketCap)
          ()
        }
        .start()
        .awaitTermination()
    }
    spark.read.parquet(s"$out/b*")
      .orderBy(col("query_doc"), col("match_doc"))
  }

  /** Declared query — the DELETE lifecycle of the text index end-to-end:
    * index the train split, FORGET every train doc with `doc_id % 5 == 2`
    * ([[deleteFromIndex]] — the curation tier's "these documents were
    * dropped, stop matching against them" call), then serve the eval
    * split read-only. Deleted documents must not reappear as matches, so
    * the oracle is [[streamTextServeQuery]]'s cross-split exact-Jaccard
    * pair set minus pairs whose match side was forgotten — a FULL
    * differential oracle over the tombstone path. */
  def serveDeletedQuery(spark: SparkSession, dir: String): DataFrame = {
    val state = textTrainDeletedState(spark, dir)
    val out = graft.TempDirs.scoped("graft_servedel_out")
    val docs = graft.Tables.documents(spark, dir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
    MicroBatchPipeline.withBatchSizedShuffle(spark) {
      serveTextBatch(docs.filter(isEval), state, out, batchId = 0L,
        Dedup.JaccardThreshold, DefaultBucketCap)
    }
    spark.read.parquet(s"$out/b0")
      .orderBy(col("query_doc"), col("match_doc"))
  }

  /** The 1-append(train) + forget-%5 text-index state — built once per
    * corpus ([[graft.StateCache]]) and served read-only by the delete
    * serve and the manifest readout (identical mutation histories). The
    * SERVE itself still runs per invocation against a fresh out dir —
    * amortization covers the build, never the measured read path. */
  private[graft] def textTrainDeletedState(spark: SparkSession, dir: String): String =
    graft.StateCache.stateDir(dir, "txtidx/train_del5",
        "graft_servedel_state") { state =>
      val sink = graft.TempDirs.scoped("graft_servedel_sink")
      val docs = graft.Tables.documents(spark, dir)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        appendBatch(docs.filter(!isEval), state, sink).count()
        deleteFromIndex(spark, state,
          docs.filter(!isEval && col("doc_id") % 5 === 2)
            .select(col("doc_id")))
      }
    }

  /** The 2-append(train, id-ordered) + forget-%5 state shared by the
    * as-of serve and the snapshot diff. */
  private def trainAsOfState(spark: SparkSession, dir: String): String =
    graft.StateCache.stateDir(dir, "txtidx/train2_del5",
        "graft_serveasof_state") { state =>
      val sink = graft.TempDirs.scoped("graft_serveasof_sink")
      val docs = graft.Tables.documents(spark, dir)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
      val train = docs.filter(!isEval)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        appendBatch(train.filter(col("doc_id") <= cut), state, sink).count()
        appendBatch(train.filter(col("doc_id") > cut), state, sink).count()
        deleteFromIndex(spark, state,
          train.filter(col("doc_id") % 5 === 2).select(col("doc_id")))
      }
    }

  /** Declared query — AS-OF snapshot serving on the text index, the LSH
    * twin of `sim_topk_ivf_asof` completing the index lifecycle matrix:
    * the train split lands as TWO id-ordered slices (b0 = ids ≤ max/2,
    * b1 = the rest), a delete tombstones every train doc with
    * `doc_id % 5 == 2` (slice 2), and the eval split is then served
    * against the SNAPSHOT at slice 0 — the exact row set a reader saw
    * after b0 landed. Both the later append AND the later delete must be
    * invisible: matches come only from b0 docs, and b0 docs the delete
    * tombstoned afterwards STILL match (the tombstone's slice id
    * postdates the snapshot) — the differential against
    * [[serveDeletedQuery]] that proves as-of reads are time-travel, not
    * merely filtering. Oracle: cross-split exact-Jaccard pairs whose
    * match side is a train doc with id ≤ max/2 (LSH candidates equal the
    * exact pair set on this corpus — the batch tier's pinned property). */
  def serveAsOfQuery(spark: SparkSession, dir: String): DataFrame = {
    val state = trainAsOfState(spark, dir)
    val out = graft.TempDirs.scoped("graft_serveasof_out")
    val docs = graft.Tables.documents(spark, dir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
    MicroBatchPipeline.withBatchSizedShuffle(spark) {
      serveTextBatch(docs.filter(isEval), state, out, batchId = 0L,
        Dedup.JaccardThreshold, DefaultBucketCap, asOf = 0L)
    }
    spark.read.parquet(s"$out/b0")
      .orderBy(col("query_doc"), col("match_doc"))
  }

  /** Declared query — the COMPACTION-POLICY readout over the slice
    * manifest ([[textIndexStatsQuery]]'s lifecycle completed through
    * [[compactState]]): two id-ordered appends, a delete, then a fold of
    * everything. The row reports what the fold must leave behind — ONE
    * compacted slice per subdir, ZERO tombstone slices (all folded and
    * purged), and physical row counts that equal live docs exactly
    * ([[Dedup.Bands]] band rows and one signature row per surviving doc).
    * ORACLE-GREEN because every number is signature-independent slice
    * accounting: if compaction stopped folding tombstones, left input
    * slices behind, or duplicated rows through a crashed rename, this
    * query diverges on the next run. */
  def compactionStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    val state = graft.StateCache.stateDir(dir, "txtidx/full2_del5_compact",
        "graft_cstats_state") { state =>
      val sink = graft.TempDirs.scoped("graft_cstats_sink")
      val docs = graft.Tables.documents(spark, dir)
      val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        appendBatch(docs.filter(col("doc_id") <= cut), state, sink).count()
        appendBatch(docs.filter(col("doc_id") > cut), state, sink).count()
        deleteFromIndex(spark, state,
          docs.filter(col("doc_id") % 5 === 2).select(col("doc_id")))
        compactState(spark, state, 2L)
      }
    }
    val nBandSlices = listSlices(spark, s"$state/bands").size
    val nSetSlices = listSlices(spark, s"$state/sets").size
    val nTombSlices = listSlices(spark, s"$state/tombstones").size
    graft.operators.IndexFiles.readSlices(spark, s"$state/bands")
      .agg(count(lit(1)).as("n_band_rows"),
        count_distinct(col("rec_id")).as("n_live_docs"))
      .crossJoin(graft.operators.IndexFiles.readSlices(spark, s"$state/sets")
        .agg(count(lit(1)).as("n_set_rows")))
      .select(lit(nBandSlices.toLong).as("n_band_slices"),
        lit(nSetSlices.toLong).as("n_set_slices"),
        lit(nTombSlices.toLong).as("n_tombstone_slices"),
        col("n_band_rows"), col("n_set_rows"), col("n_live_docs"))
  }

  /** Declared query — DELETE VISIBILITY across serve batches, the
    * read-your-writes ordering contract of a mutable serving index: a
    * delete issued BETWEEN two serve batches must be invisible to the
    * batch that already ran and fully visible to the next one. The
    * eval queries split deterministically in two (second md5 hex digit
    * < '8'), batch 0 serves against the full train index, the %5 forget
    * delete lands, batch 1 serves the rest — and the output tags each
    * pair with its serve batch so the oracle can hold the two halves to
    * DIFFERENT match sets: batch 0 keeps its forgotten-side matches
    * (they were live when it ran), batch 1 must not see them. This is
    * the index-mutation twin of `stream_late_audit`'s pinned-semantics
    * role: if the serve path ever started reading stale slices (a
    * cache, a listing race) or leaking tombstones backwards, one of
    * the two halves diverges. */
  def serveVisibilityQuery(spark: SparkSession, dir: String): DataFrame = {
    // the serves INTERLEAVE with the delete, so the whole run (outputs
    // included) is the cached artifact — re-serving batch 0 against the
    // post-delete state would change its answer by design
    val root = graft.StateCache.stateDir(dir, "txtidx/visibility",
        "graft_servevis") { root =>
      val state = s"$root/state"
      val sink = s"$root/sink"
      val out = s"$root/out"
      val docs = graft.Tables.documents(spark, dir)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
      val inBatch0 = substring(md5(col("doc_id").cast("string")), 2, 1) < "8"
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        appendBatch(docs.filter(!isEval), state, sink).count()
        serveTextBatch(docs.filter(isEval && inBatch0), state, out, 0L,
          Dedup.JaccardThreshold, DefaultBucketCap)
        deleteFromIndex(spark, state,
          docs.filter(!isEval && col("doc_id") % 5 === 2)
            .select(col("doc_id")))
        serveTextBatch(docs.filter(isEval && !inBatch0), state, out, 1L,
          Dedup.JaccardThreshold, DefaultBucketCap)
      }
    }
    val out = s"$root/out"
    spark.read.parquet(s"$out/b0").withColumn("served_batch", lit(0L))
      .unionByName(spark.read.parquet(s"$out/b1")
        .withColumn("served_batch", lit(1L)))
      .orderBy(col("query_doc"), col("match_doc"))
  }

  /** CUTOVER the serving alias for a banded-LSH index (text and media —
    * same bands/sets/tombstones layout) — the atomic pointer verb
    * generalized off the IVF tiers (VERDICT r19 #1: these families'
    * serve paths hardcoded the state dir). Completeness probe at this
    * layout: at least one bands slice AND one sets slice — a half-built
    * rebuild refuses loudly with the alias left on the live index.
    * Publication is [[graft.operators.IndexFiles.cutoverTo]]'s
    * write-temp-then-rename; the old state stays untouched for
    * in-flight and as-of readers until [[retireIndex]]. */
  def cutoverIndex(spark: SparkSession, aliasDir: String,
      newState: String): Unit =
    graft.operators.IndexFiles.cutoverTo(aliasDir, newState) {
      Seq("bands", "sets").foreach { sub =>
        require(listSlices(spark, s"$newState/$sub").nonEmpty,
          s"cutover refused: no slices under $newState/$sub — half-built " +
            "LSH index")
      }
    }

  /** The alias's current serving target. */
  def resolveServing(aliasDir: String): String =
    graft.operators.IndexFiles.readPointer(aliasDir)

  /** RETIRE a replaced LSH index state dir — the shared guards
    * ([[graft.operators.IndexFiles.retireTarget]]): refuses the dir the
    * alias still serves, refuses anything without this family's bands
    * subdir (or a StateCache completion marker). Retire-then-as-of
    * ordering is operator-owned and fails loudly, the
    * [[graft.operators.IvfIndex.retire]] contract. */
  def retireIndex(aliasDir: String, oldState: String): Unit =
    graft.operators.IndexFiles.retireTarget(aliasDir, oldState, "LSH index")(
      java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(oldState, "bands")) ||
        graft.StateCache.hasCompletionMarker(oldState))

  /** Declared query — REBUILD → CUTOVER → serve-through-pointer on the
    * text LSH index (VERDICT r19 #1, closing the non-IVF families'
    * "remedy produced a second dir" gap): the standard train +
    * forget-%5 lifecycle leaves an index whose tombstone anti-join
    * every serve pays; the maintenance rebuild writes a fresh index
    * over the LIVE train docs (LSH geometry is seeded and
    * data-independent, so a rebuild needs no retraining — it is this
    * family's compaction-into-a-new-dir), [[cutoverIndex]] swaps the
    * serving alias atomically, and the eval split is served THROUGH the
    * pointer ([[resolveServing]]). Rebuild-on-survivors ≡
    * tombstone-filtered serving, so the oracle is dedup_serve_deleted's
    * cross-split text verbatim — a pointer resolving to a stale or
    * half-built dir diverges or fails loudly. */
  def serveCutoverQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
    val alias = graft.StateCache.stateDir(dir, "txtidx/cutover_alias",
        "graft_tcut_alias") { a =>
      val rebuilt = graft.StateCache.stateDir(dir, "txtidx/rebuilt_live",
          "graft_tcut_idx") { idx =>
        val sink = graft.TempDirs.scoped("graft_tcut_sink")
        MicroBatchPipeline.withBatchSizedShuffle(spark) {
          appendBatch(docs.filter(!isEval && col("doc_id") % 5 =!= 2), idx,
            sink).count()
          ()
        }
      }
      cutoverIndex(spark, a, rebuilt)
    }
    val out = graft.TempDirs.scoped("graft_tcut_out")
    MicroBatchPipeline.withBatchSizedShuffle(spark) {
      serveTextBatch(docs.filter(isEval), resolveServing(alias), out, 0L,
        Dedup.JaccardThreshold, DefaultBucketCap)
    }
    spark.read.parquet(s"$out/b0")
      .orderBy(col("query_doc"), col("match_doc"))
  }

  /** Declared query — SNAPSHOT DIFF, the "what changed between these
    * two index versions" ops verb that completes the as-of family: a
    * reader that pinned itself to a snapshot eventually asks what it
    * would pick up by advancing, and a maintenance owner asks what a
    * delete actually removed. The lifecycle is the as-of matrix's
    * standard one (two id-ordered appends, then the %5 forget delete);
    * the diff compares the LIVE doc set AS OF slice 0 against the
    * current head — both through the SAME tombstone-aware reader the
    * serve queries use — and reports one row per change class (added /
    * removed / unchanged) with counts and id bounds. Counts replay from
    * the split rules in SQL, so a reader that stopped honoring asOf, or
    * a delete that leaked into the snapshot, diverges here.
    *
    * Scale shape: the diff is two manifest-bounded slice reads and two
    * anti-joins on the id column — never touches signatures, and the
    * class aggregate is three map-side-combined rows. */
  def indexDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    // the as-of serve's EXACT lifecycle — one shared build, the diff
    // readout runs per invocation against the built slices
    val state = trainAsOfState(spark, dir)
    def liveAt(asOf: Long) = graft.operators.IndexFiles
      .readLive(spark, s"$state/bands", s"$state/tombstones", "rec_id", asOf)
      .select(col("rec_id")).distinct()
    val snap = liveAt(0L)
    val head = liveAt(Long.MaxValue)
    def cls(name: String, ids: DataFrame): DataFrame =
      ids.agg(count(lit(1)).as("n_docs"),
          min(col("rec_id")).as("min_doc"), max(col("rec_id")).as("max_doc"))
        .select(lit(name).as("change"), col("n_docs"),
          col("min_doc"), col("max_doc"))
    cls("added", head.join(snap, Seq("rec_id"), "left_anti"))
      .unionByName(cls("removed", snap.join(head, Seq("rec_id"), "left_anti")))
      .unionByName(cls("unchanged", snap.join(head, Seq("rec_id"), "left_semi")))
      .orderBy(col("change"))
  }

  /** Declared query — the TEXT index manifest, [[graft.operators.IvfIndex
    * .indexStatsQuery]]'s twin on the LSH dedup index: slice counts per
    * state dir plus live vs tombstoned DOC counts over the same
    * build-then-forget lifecycle the serve queries run. ORACLE-GREEN for
    * the same reason as the IVF manifest: it reports only
    * signature-independent numbers — slice accounting, the md5 split and
    * the %5 delete rule — which DuckDB replays from the documents table.
    * If the delete verb wrote the wrong dir, or the live read stopped
    * anti-joining tombstones, this query diverges on the next run. */
  def textIndexStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    // the delete serve's EXACT lifecycle — one shared build, the
    // manifest readout observes the real dirs per invocation
    val state = textTrainDeletedState(spark, dir)
    val bands = s"$state/bands"
    val tombs = s"$state/tombstones"
    val nData = listSlices(spark, bands).size
    val nTomb = listSlices(spark, tombs).size
    graft.operators.IndexFiles
      .readLiveFrom(spark, listSlices(spark, bands), tombs, "rec_id")
      .agg(count_distinct(col("rec_id")).as("n_live_docs"))
      .crossJoin(graft.operators.IndexFiles.readSlices(spark, tombs)
        .agg(count_distinct(col("rec_id")).as("n_dead_ids")))
      .select(lit(nData.toLong).as("n_data_slices"),
        lit(nTomb.toLong).as("n_tombstone_slices"),
        col("n_live_docs"), col("n_dead_ids"))
  }

  /** Declared query — the MEDIA index manifest, [[textIndexStatsQuery]]'s
    * twin on the phash near-dup index (completing the stats column of
    * the index-lifecycle matrix: IVF has `sim_index_stats`, text-LSH has
    * `dedup_index_stats`, the cluster index has `sim_clusters_stats`):
    * slice counts per state dir plus live vs tombstoned ASSET counts
    * over the same build-then-forget lifecycle the media serve queries
    * run. ORACLE-GREEN for the same reason as the text manifest: every
    * number is signature-independent slice accounting — the md5 train
    * split and the %5 forget rule — which DuckDB replays from the
    * documents table (the phash pass emits exactly one fingerprint per
    * asset, so counts never depend on pixel bytes). */
  def mediaIndexStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    // the media delete serve's EXACT lifecycle — one shared build, the
    // manifest readout observes the real dirs per invocation
    val state = graft.operators.Multimodal.mediaTrainDeletedState(spark, dir)
    val bands = s"$state/bands"
    val tombs = s"$state/tombstones"
    val nData = listSlices(spark, bands).size
    val nTomb = listSlices(spark, tombs).size
    graft.operators.IndexFiles
      .readLiveFrom(spark, listSlices(spark, bands), tombs, "rec_id")
      .agg(count_distinct(col("rec_id")).as("n_live_assets"))
      .crossJoin(graft.operators.IndexFiles.readSlices(spark, tombs)
        .agg(count_distinct(col("rec_id")).as("n_dead_ids")))
      .select(lit(nData.toLong).as("n_data_slices"),
        lit(nTomb.toLong).as("n_tombstone_slices"),
        col("n_live_assets"), col("n_dead_ids"))
  }

  /** The declared-query form: stream the documents table through the
    * dedup (one AvailableNow drain into session-scoped temp dirs) and
    * return surviving doc ids. Oracle: a doc survives iff it is not the
    * larger side of any exact-Jaccard near-dup pair — on this corpus LSH
    * candidates equal the exact pair set (asserted by the batch tier's
    * tests), so the exact-SQL oracle covers the streaming path too. */
  def streamNearDupDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.StateCache.stateDir(dir, "txt/stream_dedup",
        "graft_sdedup") { root =>
      val ckpt = graft.TempDirs.scoped("graft_sdedup_ckpt")
      val schema = graft.Tables.documents(spark, dir).schema
      val docs = spark.readStream
        .schema(schema)
        .parquet(graft.Tables.streamGlob(dir, "documents"))
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        run(docs, s"$root/state", s"$root/out", ckpt)
      }
    }
    survivors(spark, s"$root/out").select(col("doc_id")).orderBy(col("doc_id"))
  }

  /** Declared-query form of [[appendBatch]]: the documents table arrives
    * as THREE id-ordered slices; after the second append the index is
    * compacted (b0+b1 → c1, a real merge — compacting a single slice is
    * a no-op), so the third append both parses a compacted `c` slice for
    * its next-id computation and candidate-joins against merged history.
    * Because the slice split is monotone in doc_id, first-seen-wins
    * across slices coincides with the batch tiers' min-lower-id
    * contract, so the exact-Jaccard SQL oracle of the single-drain
    * stream applies unchanged. */
  def incrementalDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.StateCache.stateDir(dir, "txt/incremental3",
        "graft_incdedup") { root =>
      val state = s"$root/state"
      val out = s"$root/out"
      val docs = graft.Tables.documents(spark, dir)
      val top = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (cut1, cut2) = (top / 3, 2 * top / 3)
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        appendBatch(docs.filter(col("doc_id") <= cut1), state, out)
        appendBatch(docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
          state, out)
        compactState(spark, state, 1)
        appendBatch(docs.filter(col("doc_id") > cut2), state, out)
      }
    }
    survivors(spark, s"$root/out").select(col("doc_id")).orderBy(col("doc_id"))
  }

  /** Embedding twin of [[incrementalDedupQuery]]: the embeddings table
    * arrives as THREE vec_id-ordered slices appended to one persisted LSH
    * index, with a compaction (b0+b1 → c1) before the third append — the
    * nightly-curation shape for a growing embedding corpus, run at the
    * tier's default [[EmbeddingBucketCap]] (the scale-safe configuration;
    * the loose cap is the opt-in). The monotone slice split makes
    * first-seen-wins coincide with min-lower-id AND makes exemplar rank
    * time-independent (arrival order is vec_id order, so a bucket's
    * first-cap set never changes retroactively) — the capped-witness SQL
    * oracle ([[graft.operators.Similarity.cappedWitnessPairScoresCtes]])
    * therefore replays the whole lifecycle, compaction included. */
  def incrementalEmbeddingDedupQuery(spark: SparkSession, dir: String,
      bucketCap: Int = EmbeddingBucketCap): DataFrame = {
    // the cap is part of the cache key: the rig's loose-cap diagnostic
    // and the capped default must never share built state
    val root = graft.StateCache.stateDir(dir, s"emb/incremental3/cap$bucketCap",
        "graft_incededup") { root =>
      val state = s"$root/state"
      val out = s"$root/out"
      val emb = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val top = emb.agg(max(col("vec_id"))).head().getLong(0)
      val (cut1, cut2) = (top / 3, 2 * top / 3)
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        appendEmbeddingBatch(emb.filter(col("vec_id") <= cut1), state, out,
          bucketCap = bucketCap)
        appendEmbeddingBatch(
          emb.filter(col("vec_id") > cut1 && col("vec_id") <= cut2), state, out,
          bucketCap = bucketCap)
        compactState(spark, state, 1)
        appendEmbeddingBatch(emb.filter(col("vec_id") > cut2), state, out,
          bucketCap = bucketCap)
      }
    }
    survivors(spark, s"$root/out").select(col("vec_id")).orderBy(col("vec_id"))
  }

  /** Embedding twin of the declared query: survivors of a one-drain
    * streaming dedup over the embeddings table at the tier's default
    * [[EmbeddingBucketCap]]. Oracle: the capped-witness pair set (within
    * one batch the exemplar window orders by rec_id, so the cap is the
    * per-bucket vec_id-rank predicate) with the min-lower-id policy that
    * first-seen-wins reduces to in a single batch. */
  def streamEmbeddingDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.StateCache.stateDir(dir, "emb/stream_dedup",
        "graft_sededup") { root =>
      val ckpt = graft.TempDirs.scoped("graft_sededup_ckpt")
      val schema = graft.Tables.embeddings(spark, dir).schema
      val emb = spark.readStream
        .schema(schema)
        .parquet(graft.Tables.streamGlob(dir, "embeddings"))
      MicroBatchPipeline.withBatchSizedShuffle(spark) {
        runEmbedding(emb.select(col("vec_id"), col("embedding")),
          s"$root/state", s"$root/out", ckpt)
      }
    }
    survivors(spark, s"$root/out").select(col("vec_id")).orderBy(col("vec_id"))
  }
}
