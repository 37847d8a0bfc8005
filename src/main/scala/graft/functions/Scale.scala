package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions._

/** Scale utilities: skew mitigation and session-extension installation.
  *
  * AQE's skew-join handling covers sort-merge joins, but a single hot
  * GROUP BY key still funnels into one reducer. `saltedSum` is the classic
  * two-phase fix: pre-aggregate on (key, salt) so the hot key's rows fan
  * out over `buckets` reducers, then combine the partials. Works for any
  * commutative-associative aggregate; sums/counts provided here.
  */
object Scale {

  /** Deterministic salt in [0, buckets): derived from a row-identity
    * column rather than rand() so retried tasks salt identically. */
  def salt(idCol: Column, buckets: Int): Column =
    pmod(xxhash64(idCol), lit(buckets.toLong))

  /** Two-phase skew-safe sum + count over possibly-hot group keys. Output
    * schema: keys ++ (sum_<valueAlias>, n_rows). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
      valueAlias: String, saltFrom: Column, buckets: Int = 32): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(saltFrom, buckets))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueAlias"),
        sum(col("__pcnt")).as("n_rows"))
  }
}

/** SparkSessionExtensions installer: makes the custom expressions
  * available in every session built with
  * `.withExtensions(new GraftSparkExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions` — the
  * deployment path for SQL-only users of the engine. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session =>
      graft.plans.ApproxDistinctRewrite.forSession(session))
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[GraftExpressions.CosineSimilarity].getName,
        "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExpressions.CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[GraftExpressions.SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExpressions.SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("token_hashes64"),
      new ExpressionInfo(classOf[GraftExpressions.TokenHashes64].getName,
        "token_hashes64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExpressions.TokenHashes64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("md5_token_hashes64"),
      new ExpressionInfo(classOf[GraftExpressions.Md5TokenHashes64].getName,
        "md5_token_hashes64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExpressions.Md5TokenHashes64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes64"),
      new ExpressionInfo(classOf[GraftExpressions.ShingleHashes64].getName,
        "shingle_hashes64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExpressions.ShingleHashes64(exprs.head,
          exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("shingle_strings"),
      new ExpressionInfo(classOf[GraftExpressions.ShingleStrings].getName,
        "shingle_strings"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExpressions.ShingleStrings(exprs.head,
          exprs(1).eval().asInstanceOf[Int])))
  }
}
