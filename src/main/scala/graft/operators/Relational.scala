package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QuerySpec, Tables}

/** The declared relational query surface (SURVEY.md §2.3).
  *
  * Each query is a deterministic, oracle-checkable expression of one operator
  * family from the reference inventory (SURVEY.md §2.1 O-numbers cited per
  * query). Design rules for 100 TB scale:
  *
  *   - Declarative DataFrame plans only — Catalyst gets predicate pushdown,
  *     column pruning and join planning for free (`PushedFilters`/`ReadSchema`
  *     verified via `.explain("formatted")`).
  *   - Dimension tables are `broadcast()` so fact scans never shuffle for
  *     star joins; the only shuffles are the final group-bys on low-cardinality
  *     keys (map-side partial aggregation makes those cheap).
  *   - Money aggregations run on exact integer cents/basis-points
  *     (`ROUND(x*100) :: BIGINT`), not floats: exact associative integer sums
  *     are reproducible across partitionings, retries and engines — a
  *     requirement both for the DuckDB oracle and for deterministic re-runs of
  *     100 TB jobs (float sums are partition-order dependent).
  */
object Relational {

  /** Exact integer cents: ROUND first so the double is integer-valued and the
    * cast is exact in any engine (bare double→long casts truncate in Spark but
    * round in DuckDB). */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** revenue in 1e-4 units: price_cents * (100 - discount_percent) — exact
    * (discount is a 2-decimal fraction, so cents(discount) is whole percent). */
  private def revenueE4(price: Column, discount: Column): Column =
    cents(price) * (lit(100) - cents(discount))

  // ---------------------------------------------------------------------------
  // Scans / projections / filters (O12, O14; pruning + pushdown at the scan)
  // ---------------------------------------------------------------------------

  /** Column-pruned full scan: ReadSchema must contain exactly 3 columns. */
  def scanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  /** Predicate pushdown: both filters must appear in PushedFilters. */
  def filterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 45 && col("l_returnflag") === "A")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** O11 + O12: literal surrogate key + fixed ordered projection.
    * (The production pipeline uses `uuid()`; a literal keeps the oracle
    * deterministic — see BpiPipeline.withJobId.) */
  def surrogateProject(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("job_id", lit("job-0"))
      .select(col("job_id"), col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_mktsegment"))

  // ---------------------------------------------------------------------------
  // Semi-structured flatten + normalize casts (O1/O5/O7)
  // ---------------------------------------------------------------------------

  /** O1/O7: JSON payload flatten with rename — the reference's core SELECT
    * (`bpi_crawler.py:101-113`) over the events.props JSON column. */
  def jsonFlatten(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        col("event_type").as("etype"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        col("user_id"))

  /** O5: strip non-numeric chars then cast — the rate-string normalizer
    * (`bpi_crawler.py:68,105`) generalized to a regex normalize+cast. */
  def normalizeCast(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        regexp_replace(col("props"), "[^0-9.]", "").cast("double").as("k_num"))

  // ---------------------------------------------------------------------------
  // Timestamp parse / format (O8)
  // ---------------------------------------------------------------------------

  /** O8 (format direction): timestamp → "yyyy-MM-dd HH:mm:ss" string, the
    * warehouse string-timestamp contract (`bpi_crawler.py:115-118`). */
  def tsFormat(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        hour(col("ts")).cast("long").as("ts_hour"),
        date_format(col("ts"), "yyyy-MM-dd").as("ts_day"))

  /** O8 (parse direction): round-trip through the reference's
    * "MMM d, yyyy HH:mm:ss" format (`bpi_crawler.py:114`, `test.py:4`). */
  def tsParseRoundtrip(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        date_format(
          to_timestamp(
            date_format(col("o_orderdate"), "MMM d, yyyy HH:mm:ss"),
            "MMM d, yyyy HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").as("od_str"))

  // ---------------------------------------------------------------------------
  // Joins (O6: broadcast lookup join) and the flagship star join
  // ---------------------------------------------------------------------------

  /** O6 as a relational plan: fact scan + two broadcast dimension joins.
    * No shuffle on the fact side until the final 25-key group-by. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(revenueE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .select(col("n_name"), col("revenue_e4"),
        (col("revenue_e4") / 10000.0).as("revenue"), col("n_items"))
      .orderBy(col("n_name"))
  }

  /** Flagship: full star join, revenue per region. Dims broadcast; the only
    * shuffles are lineitem⋈orders (co-partitioned on the join key by AQE) and
    * the 5-key aggregate. */
  def starJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(revenueE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .select(col("r_name"), col("revenue_e4"),
        (col("revenue_e4") / 10000.0).as("revenue"), col("n_orders"))
      .orderBy(col("r_name"))
  }

  // ---------------------------------------------------------------------------
  // Aggregation / window / top-k / set ops (engine surface beyond the
  // reference — SURVEY.md §2.2 lists these as absent there; the engine
  // provides them as first-class operators)
  // ---------------------------------------------------------------------------

  /** TPC-H Q1-shaped pricing summary; exact integer-cents aggregation. */
  def aggPricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(revenueE4(col("l_extendedprice"), col("l_discount"))).as("sum_disc_e4"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        (col("sum_qty_c") / 100.0).as("sum_qty"),
        (col("sum_base_c") / 100.0).as("sum_base_price"),
        (col("sum_disc_e4") / 10000.0).as("sum_disc_price"),
        (col("sum_qty_c") / (col("count_order") * 100.0)).as("avg_qty"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Window function: top-3 customers by balance per nation. */
  def windowTopPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_custkey"), col("c_acctbal"), col("rn"))
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Global top-k with deterministic tie-break (O12's limit, made total). */
  def topK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** Hierarchical aggregation: ROLLUP over (returnflag, linestatus) with
    * exact integer-cents revenue — subtotals and grand total in one pass. */
  def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(revenueE4(col("l_extendedprice"), col("l_discount"))).as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Semi join (EXISTS): customers that placed at least one urgent order. */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Anti join (NOT EXISTS): customers who never placed an urgent order. */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  /** Set operation: users with a big purchase who never had a big error. */
  def setOpExcept(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.filter(col("event_type") === "purchase" && col("value") > 90)
      .select(col("user_id")).distinct()
      .except(ev.filter(col("event_type") === "error" && col("value") > 90)
        .select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** DuckDB-oracle SQL building blocks shared across queries. */
  private val revenueE4Sql =
    "CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))"

  import graft.QuerySpec.withOracle

  val specs: Seq[QuerySpec] = Seq(
    withOracle("rel_scan_project", scanProject,
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem"),
    withOracle("rel_filter_pushdown", filterPushdown,
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity >= 45 AND l_returnflag = 'A'""".stripMargin),
    withOracle("rel_surrogate_project", surrogateProject,
      """SELECT 'job-0' AS job_id, c_custkey, c_name, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin),
    withOracle("rel_json_flatten", jsonFlatten,
      """SELECT event_id, event_type AS etype,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, user_id
        |FROM events""".stripMargin),
    withOracle("rel_normalize_cast", normalizeCast,
      """SELECT event_id,
        |  CAST(regexp_replace(props, '[^0-9.]', '', 'g') AS DOUBLE) AS k_num
        |FROM events""".stripMargin),
    withOracle("rel_ts_format", tsFormat,
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  CAST(hour(ts) AS BIGINT) AS ts_hour, strftime(ts, '%Y-%m-%d') AS ts_day
        |FROM events""".stripMargin),
    withOracle("rel_ts_parse_roundtrip", tsParseRoundtrip,
      "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od_str FROM orders"),
    withOracle("rel_join_broadcast", joinBroadcast,
      s"""SELECT n_name, CAST(SUM($revenueE4Sql) AS BIGINT) AS revenue_e4,
         |  CAST(SUM($revenueE4Sql) AS BIGINT) / 10000.0 AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin),
    withOracle("rel_star_join", starJoin,
      s"""SELECT r_name, CAST(SUM($revenueE4Sql) AS BIGINT) AS revenue_e4,
         |  CAST(SUM($revenueE4Sql) AS BIGINT) / 10000.0 AS revenue,
         |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin),
    withOracle("rel_agg_pricing_summary", aggPricingSummary,
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
         |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
         |  CAST(SUM($revenueE4Sql) AS BIGINT) / 10000.0 AS sum_disc_price,
         |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) / (COUNT(*) * 100.0) AS avg_qty,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    withOracle("rel_window_top_per_group", windowTopPerGroup,
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal, rn
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin),
    withOracle("rel_agg_rollup", aggRollup,
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM($revenueE4Sql) AS BIGINT) AS revenue_e4,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
    withOracle("rel_join_semi", joinSemi,
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),
    withOracle("rel_join_anti", joinAnti,
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),
    withOracle("rel_topk", topK,
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin),
    withOracle("rel_setop_except", setOpExcept,
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 90
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 90
        |ORDER BY user_id""".stripMargin)
  )
}
