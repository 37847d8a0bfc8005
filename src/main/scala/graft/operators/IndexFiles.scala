package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.streaming.StreamingDedup

/** Shared persistence primitives for the persisted ANN indexes
  * ([[IvfIndex]], [[PqIndex]], [[IvfPqIndex]]): one definition of how
  * frozen centroids and PQ codebooks round-trip through parquet, and one
  * multi-slice reader, so the three index layouts cannot drift in their
  * on-disk geometry encoding. */
private[operators] object IndexFiles {

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
    * read the same size as the per-query PQ LUTs). */
  def loadCentroids(spark: SparkSession, dir: String): Seq[Array[Float]] =
    spark.read.parquet(dir)
      .orderBy(col("cell"))
      .collect()
      .map(_.getSeq[Float](1).toArray)
      .toSeq

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

  /** The frozen codebooks back in PqEncode's flattened order. */
  def loadCodebooks(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(dir)
      .orderBy(col("subspace"), col("code"))
      .collect()
      .map(_.getSeq[Double](2).toArray)

  /** All rows across the b/c slices under `base`. Each slice is read
    * under its own root so partition columns (the cell=N layout) are
    * discovered per slice — no basePath coupling between slices. */
  def readSlices(spark: SparkSession, base: String): DataFrame = {
    val slices = StreamingDedup.listSlices(spark, base)
    require(slices.nonEmpty,
      s"no index slices under $base — build/append before querying")
    slices.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }
}
