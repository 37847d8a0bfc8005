package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared query surface from the operator modules. Every
  * entry with SQL-expressible semantics carries a DuckDB oracle; the rest are
  * rows-only checked (approximate / hash-seeded operators).
  */
object SparkEntry {

  /** All declared queries, one QuerySpec per implemented operator
    * (SURVEY.md §2). Modules contribute their own specs. */
  def allSpecs: Seq[QuerySpec] =
    operators.Relational.specs ++ operators.RelationalExt.specs ++
      pipeline.BpiQueries.specs ++
      operators.TextAnalysis.specs ++ operators.Bpe.specs ++
      operators.Unigram.specs ++ operators.Sketches.specs ++
      operators.QualityGate.specs ++
      operators.Curation.specs ++
      operators.Dedup.specs ++
      operators.Similarity.specs ++ operators.ClusterIndex.specs ++
      operators.EmbeddingOps.specs ++ operators.Pca.specs ++
      operators.IvfIndex.specs ++
      operators.PqIndex.specs ++ operators.IvfPqIndex.specs ++
      streaming.StreamQueries.specs ++
      operators.Multimodal.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.starJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. Oracle
    * thunks are evaluated HERE — after Verify has run the queries — so
    * trained-artifact oracles see the literals their query recorded
    * ([[OracleLiterals]]); a thunk that fails (its query did not run or
    * threw) degrades that one entry to a rows-only check instead of
    * taking down the whole dump. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap {
      case QuerySpec(n, _, Some(sql)) =>
        scala.util.Try(sql()) match {
          case scala.util.Success(s) => Some(n -> s)
          case scala.util.Failure(e) =>
            System.err.println(s"[oracle] $n: ${e.getMessage}")
            None
        }
      case _ => None
    }.toMap
}
