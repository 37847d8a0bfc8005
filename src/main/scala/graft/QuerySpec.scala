package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark plan builder plus, when the semantics
  * are ANSI-SQL-expressible, an equivalent DuckDB SQL text for the driver's
  * differential oracle (column names must match the Spark output exactly —
  * the compare sorts columns by name before hashing).
  *
  * The oracle is a THUNK, not a string: most oracles are static texts, but
  * the trained-artifact oracles (IVF centroids, the PCA mean/basis) inline
  * literals that only exist after the query itself has trained — Verify runs
  * every query BEFORE dumping `oracle_sql.json`, so a thunk evaluated at dump
  * time sees the artifacts the run recorded ([[OracleLiterals]]). Static
  * call sites are unchanged: `withOracle` takes the SQL by name.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[() => String])

object QuerySpec {
  def withOracle(name: String, fn: (SparkSession, String) => DataFrame,
      sql: => String): QuerySpec = QuerySpec(name, fn, Some(() => sql))
  def rowsOnly(name: String, fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}

/** Run-time-recorded SQL literals for trained-artifact oracles: a query that
  * trains a deterministic artifact (k-means centroids, a PCA basis) records
  * the artifact here as SQL literal text under its own key; the matching
  * oracle thunk splices it in when `oracle_sql.json` is dumped — the
  * seeded-hyperplane literal technique extended to artifacts that are pure
  * functions of the corpus rather than of a seed. Keys are per-query, so
  * concurrent or repeated runs of different queries cannot cross-pollute;
  * re-recording (another Verify pass at a different scale factor) simply
  * overwrites. */
object OracleLiterals {
  /** Literals are keyed by (corpus scope, key): [[scopeTo]] switches the
    * ACTIVE scope rather than wiping a global map, so interleaving two
    * corpora in one JVM (the BenchScale replicas, or any future caller
    * that revisits a scale) can never dump an oracle against another
    * corpus's trained artifacts — the failure mode the old clear-only
    * scopeTo left to caller convention (VERDICT r15 ADVICE #2). */
  private val recorded =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  @volatile private var scope: String = ""

  /** Active capture buffer of the innermost [[capturing]] block on this
    * thread (null outside one). [[StateCache]] uses it to remember which
    * literals a cached build recorded, so cache HITS can re-record them —
    * without this, a second query sharing a cached trained artifact would
    * dump its oracle against literals that were never re-put after a
    * [[scopeTo]] reset. */
  private val capture =
    new ThreadLocal[scala.collection.mutable.Map[String, String]]

  def put(key: String, sqlLiteral: String): Unit = {
    recorded((scope, key)) = sqlLiteral
    val c = capture.get()
    if (c != null) c(key) = sqlLiteral
  }

  /** Run `body` recording every [[put]] it makes (on this thread) into a
    * side buffer, returned alongside the result. Nested captures fold the
    * inner buffer into the outer one — a cached build that reuses another
    * cached artifact still owns every literal its oracle needs. */
  private[graft] def capturing[T](body: => T): (T, Map[String, String]) = {
    val prev = capture.get()
    val buf = scala.collection.mutable.Map.empty[String, String]
    capture.set(buf)
    try {
      val v = body
      (v, buf.toMap)
    } finally {
      if (prev == null) capture.remove() else capture.set(prev)
      if (prev != null) buf.foreach { case (k, lit) => prev(k) = lit }
    }
  }

  /** Switch the active corpus scope. Call when switching the corpus under
    * measurement in one JVM (BenchScale's scaled replicas): literals are
    * pure functions of the corpus that trained them, so a key recorded
    * against corpus A must never be spliced into a dump or replay against
    * corpus B — [[get]] only sees the active scope's literals, so
    * wrong-scale centroids/bases are structurally unreachable, not merely
    * avoided by calling order. [[StateCache]] hits re-record their own
    * captured literals under the CURRENT scope, so caches keyed by corpus
    * dir stay consistent across scope switches. The default scope ("") is
    * what single-corpus runs (Verify, the test suites) live in without
    * ever calling this. */
  def scopeTo(corpusDir: String): Unit = scope = corpusDir

  /** The recorded literal; throws if the query has not run in this JVM
    * under the ACTIVE scope — [[SparkEntry.oracleSql]] degrades that
    * single entry to a rows-only check instead of failing the dump. */
  def get(key: String): String = recorded.getOrElse((scope, key),
    sys.error(s"oracle literal '$key' not recorded — the query must run " +
      "before its oracle is dumped"))

  /** Exact double → SQL literal: E-notation parses as DOUBLE in DuckDB
    * (a bare decimal would round-trip through DECIMAL and drift ~1 ulp)
    * and %.17e round-trips every double exactly. Locale.ROOT guards
    * against comma-decimal locales. */
  def d(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.17e", Double.box(v))

  /** A list-of-doubles SQL literal. */
  def vec(v: Seq[Double]): String = v.map(d).mkString("[", ", ", "]")
}
