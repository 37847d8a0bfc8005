package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark plan builder plus, when the semantics
  * are ANSI-SQL-expressible, an equivalent DuckDB SQL text for the driver's
  * differential oracle (column names must match the Spark output exactly —
  * the compare sorts columns by name before hashing).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def withOracle(name: String, fn: (SparkSession, String) => DataFrame,
      sql: String): QuerySpec = QuerySpec(name, fn, Some(sql))
  def rowsOnly(name: String, fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
