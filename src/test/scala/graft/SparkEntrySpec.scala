package graft

/** Driver-contract invariants: the things the harness assumes about
  * SparkEntry that no individual operator test checks. */
class SparkEntrySpec extends SparkSpec {

  test("declared query names are unique across modules") {
    val names = SparkEntry.allSpecs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("every oracle belongs to a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracles reference only the driver-provided tables") {
    // The driver registers exactly these views for DuckDB; an oracle
    // naming anything else fails at verify time — catch it here.
    val known = Tables.all.toSet + "customer_v" // temp view used by subquery sql
    val tablePattern = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z_0-9]*)".r
    val keywords = Set("generate_series", "unnest", "values", "range")
    SparkEntry.oracleSql.foreach { case (name, rawSql) =>
      // Strip SQL comments and string literals before scanning — prose
      // like "-- from the staging table" is not a table reference.
      val sql = rawSql.replaceAll("--[^\n]*", "").replaceAll("'[^']*'", "''")
      tablePattern.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        // CTE names are declared inside the same SQL text
        val isCte = s"(?i)\\b$t\\s+AS\\s*\\(".r.findFirstIn(sql).isDefined ||
          s"(?i)\\b$t\\s*\\([a-z_0-9, ]*\\)\\s+AS\\s*\\(".r.findFirstIn(sql).isDefined
        assert(isCte || known.contains(t) || keywords.contains(t),
          s"$name references unknown table '$t'")
      }
    }
  }

  test("the flagship entry query returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
