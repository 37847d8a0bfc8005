package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import graft.streaming.StreamingDedup

/** Shared persistence primitives for the persisted ANN indexes
  * ([[IvfIndex]], [[PqIndex]], [[IvfPqIndex]]) and the streaming LSH
  * index: one definition of how frozen centroids and PQ codebooks
  * round-trip through parquet, one multi-slice reader, and ONE tombstone
  * convention (write / read-minus / fold-at-compaction), so the persisted
  * state implementations cannot drift in their on-disk geometry or their
  * delete semantics. */
private[graft] object IndexFiles {

  /** Name of the serving-pointer file under an alias dir. */
  private val PointerFile = "current"

  /** ATOMIC SERVING POINTER — the cutover primitive behind index
    * retrains (VERDICT r18 #3): `aliasDir/current` holds the path of
    * the live index dir, and serves resolve through it instead of a
    * hard-coded dir, so "cutover" is one pointer swap rather than a
    * convention. Written write-temp-then-rename (ATOMIC_MOVE — atomic
    * on POSIX and HDFS; on an object store the equivalent is a
    * conditional put of the manifest object): a concurrent reader sees
    * either the old target or the new one in full, never a truncated
    * path and never a missing pointer mid-swap. Single-writer by
    * contract (the maintenance owner — the same party that runs
    * retrain/compact); readers are unrestricted. The old target dir is
    * untouched, so in-flight and as-of reads against it keep working
    * after the swap; retiring it is a separate, later decision once its
    * last snapshot reader is gone. */
  def writePointer(aliasDir: String, target: String): Unit = {
    val dir = java.nio.file.Paths.get(aliasDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve("." + PointerFile + ".tmp")
    java.nio.file.Files.write(tmp,
      target.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, dir.resolve(PointerFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Resolve the serving pointer. Fails loudly on a missing alias — an
    * unpointed alias is a deployment bug, not an empty index. */
  def readPointer(aliasDir: String): String = {
    val p = java.nio.file.Paths.get(aliasDir, PointerFile)
    require(java.nio.file.Files.isRegularFile(p),
      s"no serving pointer at $p — cutover never ran for this alias")
    val target = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    require(target.nonEmpty, s"empty serving pointer at $p")
    target
  }

  /** Family-agnostic CUTOVER body: run the family's completeness probe —
    * which must THROW on a half-built target, leaving the alias pointing
    * at the live index — then publish via [[writePointer]]'s
    * write-temp-then-rename. Every index family's cutover verb
    * ([[IvfIndex.cutover]], [[ClusterIndex.cutover]], the text/media
    * wrappers in [[graft.streaming.StreamingDedup]], [[Pca]]) is this
    * body plus its own layout probe, so the refuse-loudly-then-swap
    * semantics cannot drift between families. */
  def cutoverTo(aliasDir: String, newDir: String)(probe: => Unit): Unit = {
    probe
    writePointer(aliasDir, newDir)
  }

  /** Family-agnostic RETIRE body — deletes a REPLACED index dir, with the
    * two guards every family shares (ADVICE r19): the dir the alias
    * still serves is refused, and a dir that does not even look like the
    * family's state layout is refused (a transposed or mistyped argument
    * must not delete unrelated data).
    *
    * ORDERING CONTRACT (operator-owned — the slice machinery keeps no
    * refcounts): retire only after the last reader holding a recorded
    * as-of snapshot of `oldDir` is gone. The failure mode is LOUD, not
    * silent: a snapshot read against a retired dir fails with the
    * readers' "no slices under …" refusal rather than serving an empty
    * or partial state (pinned in IvfIndexSpec). */
  def retireTarget(aliasDir: String, oldDir: String, familyDesc: String)(
      looksLikeIndex: => Boolean): Unit = {
    def norm(p: String) =
      java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
    require(norm(readPointer(aliasDir)) != norm(oldDir),
      s"retire refused: the serving alias still points at $oldDir — " +
        "cutover first")
    require(looksLikeIndex,
      s"retire refused: $oldDir does not look like a $familyDesc state " +
        "dir — refusing to delete what this verb does not own " +
        "(transposed or mistyped argument?)")
    graft.TempDirs.deleteTree(oldDir)
  }

  /** Persist IVF centroids as (cell, centroid), overwriting. */
  def writeCentroids(spark: SparkSession, dir: String,
      cents: Seq[Array[Float]]): Unit = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** The frozen centroid table, cell-ordered (IvfCells rows — a driver
    * read the same size as the per-query PQ LUTs). Memoized in-memory
    * per (dir, content fingerprint) — the serving-node shape: centroids
    * are frozen at build time and every retrain writes a NEW dir, so a
    * probe that re-collected them per invocation (several Spark jobs per
    * serve across every IVF-backed query) was pure repeat driver work.
    * The fingerprint in the key makes an in-place rewrite (tests,
    * rebuild-into-same-dir) MISS instead of serving stale geometry —
    * the pack-offset cache's guard applied here. */
  def loadCentroids(spark: SparkSession, dir: String): Seq[Array[Float]] =
    graft.StateCache.cached(dir,
        "centroids:" + graft.StateCache.dirFingerprint(dir)) {
      spark.read.parquet(dir)
        .orderBy(col("cell"))
        .collect()
        .map(_.getSeq[Float](1).toArray)
        .toSeq
    }

  /** Persist PQ codebooks as (subspace, code, centroid), overwriting.
    * `cbs` is the subspace-major flattened [m*ks][subDim] table
    * [[graft.functions.GraftExpressions.PqEncode]] consumes. */
  def writeCodebooks(spark: SparkSession, dir: String,
      cbs: Array[Array[Double]]): Unit = {
    import spark.implicits._
    cbs.zipWithIndex.map { case (c, i) =>
      (i / Similarity.PqCodebookSize, i % Similarity.PqCodebookSize, c.toSeq)
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** The frozen codebooks back in PqEncode's flattened order. Memoized
    * like [[loadCentroids]] (same immutability argument: codebooks are
    * frozen at train time, retrains write new dirs, the fingerprint
    * guards in-place rewrites). */
  def loadCodebooks(spark: SparkSession, dir: String): Array[Array[Double]] =
    graft.StateCache.cached(dir,
        "codebooks:" + graft.StateCache.dirFingerprint(dir)) {
      spark.read.parquet(dir)
        .orderBy(col("subspace"), col("code"))
        .collect()
        .map(_.getSeq[Double](2).toArray)
    }

  /** All rows across the b/c slices under `base`. Each slice is read
    * under its own root so partition columns (the cell=N layout) are
    * discovered per slice — no basePath coupling between slices. */
  def readSlices(spark: SparkSession, base: String): DataFrame = {
    val slices = StreamingDedup.listSlices(spark, base)
    require(slices.nonEmpty,
      s"no index slices under $base — build/append before querying")
    slices.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  // -------------------------------------------------------------------
  // Tombstones: the persisted indexes' DELETE verb (the reference's O15
  // staging delete, bpi_crawler.py:37-41, re-expressed for durable
  // serving state). A delete writes a TOMBSTONE SLICE of ids under the
  // same b/c naming as the data slices, drawing its id from a clock
  // SHARED with the data subdir, and kills rows in STRICTLY EARLIER
  // slices — so a replayed delete is idempotent (overwrite-mode slice),
  // serving anti-joins the (usually tiny) tombstone set, and an id
  // re-appended after its delete is alive again (LSM semantics, the
  // slice id as the logical clock). Compaction folds tombstones into the
  // physical rows and removes them.

  /** Each slice's rows tagged with the slice's numeric id (`c<N>` tags as
    * N — safe, because every tombstone that survived its compaction has
    * id > N, and every row in the compacted slice came from a slice
    * <= N). An unparseable slice name fails LOUDLY: the no-tombstone
    * read path unions every directory, so silently skipping one here
    * would make the engine's row set change the first time a delete
    * runs. */
  private def taggedSlices(spark: SparkSession,
      slices: Seq[String]): Seq[DataFrame] =
    slices.map { d =>
      val id = StreamingDedup.sliceBatch(d).getOrElse(
        throw new IllegalStateException(
          s"slice dir $d does not follow the b<N>/c<N> naming — " +
            "refusing a tombstone-tagged read that would silently drop it"))
      spark.read.parquet(d).withColumn("_slice", lit(id))
    }

  /** Next free slice id across subdirs sharing one logical clock (data +
    * tombstones): a tombstone must out-number every slice it is meant to
    * kill, so both verbs draw from the max over BOTH subdirs. */
  def nextSliceIdAcross(spark: SparkSession, bases: Seq[String]): Long =
    bases.map(StreamingDedup.nextSliceId(spark, _)).max

  /** Write tombstone slice `b<sliceId>` of distinct ids under `tombsBase`
    * (overwrite mode — a replayed delete replaces its own slice). */
  def writeTombstoneSlice(ids: DataFrame, idCol: String, tombsBase: String,
      sliceId: Long): Unit =
    ids.select(col(idCol)).distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"$tombsBase/b$sliceId")

  /** The DELETE verb itself, one body for every persisted index: draw the
    * tombstone's id from the clock shared with `dataBase` (an unspecified
    * `sliceId` kills exactly the state that exists NOW; an explicit one
    * replays idempotently) and write the slice. Returns the slice id. */
  def delete(ids: DataFrame, idCol: String, dataBase: String,
      tombsBase: String, sliceId: Long = -1L): Long = {
    val id = if (sliceId >= 0) sliceId
      else nextSliceIdAcross(ids.sparkSession, Seq(dataBase, tombsBase))
    writeTombstoneSlice(ids, idCol, tombsBase, id)
    id
  }

  /** `rows` (tagged with `tagCol`) minus tombstoned ones: a row is dead
    * iff some tombstone slice with a STRICTLY larger id carries its id.
    * Equi-join on the id with the slice comparison as residual — never a
    * cartesian. */
  private def minusTombstoned(rows: DataFrame, tombs: DataFrame,
      idCol: String, tagCol: String): DataFrame = {
    val t = tombs.select(col(idCol).as("_t_id"), col("_slice").as("_t_slice"))
    rows.join(t,
      rows(idCol) === t("_t_id") && t("_t_slice") > rows(tagCol), "left_anti")
  }

  /** Live rows over an explicit slice list: the plain per-slice union
    * when no tombstones exist (byte-identical plan to the pre-delete
    * engine), the tagged anti-join otherwise. `asOf` restricts the
    * TOMBSTONE side to slices `<= asOf` (callers restricting the data
    * side restrict both — [[readLive]]). */
  def readLiveFrom(spark: SparkSession, slices: Seq[String],
      tombsBase: String, idCol: String,
      asOf: Long = Long.MaxValue): DataFrame = {
    val tombSlices = StreamingDedup.listSlices(spark, tombsBase)
      .filter(StreamingDedup.sliceBatch(_).exists(_ <= asOf))
    if (tombSlices.isEmpty)
      slices.map(spark.read.parquet(_)).reduce(_ unionByName _)
    else
      minusTombstoned(
        taggedSlices(spark, slices).reduce(_ unionByName _),
        taggedSlices(spark, tombSlices).reduce(_ unionByName _),
        idCol, "_slice")
        .drop("_slice")
  }

  /** All LIVE rows across the b/c slices under `base`: [[readSlices]]
    * minus the ids tombstoned under `tombsBase`.
    *
    * `asOf` (default: everything) reads the SNAPSHOT at logical time
    * `asOf` — data slices `<= asOf` minus tombstones `<= asOf`, i.e. the
    * exact row set a reader saw after slice `asOf` landed. This is the
    * reproducibility verb a training run needs: the corpus snapshot a
    * model trained on stays queryable while later appends/deletes land.
    * Snapshots live as long as their slices: a compaction whose id
    * exceeds `asOf` has merged history past the snapshot point, and the
    * read fails LOUDLY rather than silently serving the coarser state
    * (compaction is the retention knob: compact only past snapshots
    * nobody needs). */
  def readLive(spark: SparkSession, base: String, tombsBase: String,
      idCol: String, asOf: Long = Long.MaxValue): DataFrame = {
    val all = StreamingDedup.listSlices(spark, base)
    // Same strictness as taggedSlices: an unparseable slice dir must fail
    // LOUDLY here too, not be silently dropped by the asOf filter below —
    // otherwise the two read paths disagree on the same stray directory.
    val unparseable = all.filter(StreamingDedup.sliceBatch(_).isEmpty)
    require(unparseable.isEmpty,
      s"slice dirs not following the b<N>/c<N> naming under $base: " +
        s"${unparseable.mkString(", ")} — refusing a read that would " +
        "silently drop them")
    if (asOf != Long.MaxValue) {
      val coarse = all.filter(d => d.substring(d.lastIndexOf('/') + 1)
        .startsWith("c") && StreamingDedup.sliceBatch(d).exists(_ > asOf))
      require(coarse.isEmpty,
        s"snapshot at slice $asOf is gone: compaction merged past it " +
          s"(${coarse.mkString(", ")})")
    }
    val slices = all.filter(StreamingDedup.sliceBatch(_).exists(_ <= asOf))
    require(slices.nonEmpty,
      s"no index slices under $base at or below slice $asOf — " +
        "build/append before querying")
    readLiveFrom(spark, slices, tombsBase, idCol, asOf)
  }

  /** Tombstone-folding compaction: merge data slices `<= upTo` into one
    * `c<upTo>` slice MINUS the rows killed by tombstones `<= upTo`, then
    * delete those tombstone slices — every row they cover (slice id
    * strictly below theirs, hence `<= upTo`) is in the merge, so after
    * folding they carry no information. Tombstones `> upTo` survive and
    * still apply to `c<upTo>` (its tag `upTo` is below their id).
    * `purgeTombstones=false` folds without deleting — for state layouts
    * where several subdirs share one tombstone dir ([[StreamingDedup]]'s
    * bands+sets) and only the LAST fold may purge. Runs even for a
    * single data slice when tombstones exist (the fold is the point);
    * no-ops when there is nothing to merge or fold. */
  def compactWithTombstones(spark: SparkSession, base: String,
      tombsBase: String, upTo: Long, idCol: String,
      purgeTombstones: Boolean = true)(
      write: (DataFrame, String) => Unit): Unit = {
    val posts = StreamingDedup.listSlices(spark, base)
      .filter(StreamingDedup.sliceBatch(_).exists(_ <= upTo))
    val tombs = StreamingDedup.listSlices(spark, tombsBase)
      .filter(StreamingDedup.sliceBatch(_).exists(_ <= upTo))
    if (tombs.isEmpty)
      StreamingDedup.compactSlices(spark, base, upTo)(write)
    else if (posts.nonEmpty) {
      val merged = minusTombstoned(
          taggedSlices(spark, posts).reduce(_ unionByName _),
          taggedSlices(spark, tombs).reduce(_ unionByName _),
          idCol, "_slice")
        .drop("_slice").distinct()
      StreamingDedup.publishCompacted(spark, base, upTo, merged, posts,
        alsoDelete = if (purgeTombstones) tombs else Nil)(write)
    } else if (purgeTombstones) {
      // No data slice <= upTo: these tombstones provably kill nothing
      // (any slice they could kill has a strictly smaller id, hence also
      // <= upTo and in `posts`). Without this branch a delete-before-
      // first-append leaves a dead tombstone slice that every future
      // read pays the tagged anti-join for.
      val fs = new org.apache.hadoop.fs.Path(tombsBase)
        .getFileSystem(spark.sessionState.newHadoopConf())
      tombs.foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
    }
  }
}
