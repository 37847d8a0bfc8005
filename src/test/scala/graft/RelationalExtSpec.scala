package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalExt

/** Invariant tests for the second relational tier at sf0.001 — the DuckDB
  * gate proves oracle equality at sf0.01; these guard the semantic
  * invariants that survive refactors (and run without DuckDB).
  */
class RelationalExtSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: steps must occur in order; out-of-order purchases don't convert") {
    val G = 1000000000L // 1 second in the raw nano encoding events.parquet uses
    val rows = Seq(
      (1L, "view", 1L * G), (1L, "click", 2L * G), (1L, "purchase", 3L * G),
      (2L, "purchase", 10L * G), (2L, "view", 11L * G), (2L, "click", 12L * G),
      (3L, "click", 20L * G)) // click with no prior view: enters no step
      .toDF("user_id", "event_type", "ts")
    val dir = TempDirs.scoped("graft_funnel")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.eventFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (2L, 1.0)) // users 1 and 2 viewed
    assert(out(2L) == (2L, 1.0)) // both clicked after their first view
    assert(out(3L) == (1L, 0.5)) // only user 1 purchased after the click
  }

  test("ohlc: open/close pick by (ts, event_id) order, extrema and volume exact") {
    val G = 1000000000L
    val h = 3600L * G
    // one hour-bucket: open is the earlier ts; the two t=10 trades
    // tie on ts, so close goes to the larger event_id
    val rows = Seq(
      (1L, 5L * G, "purchase", 30.0),
      (2L, 10L * G, "purchase", 50.0),
      (3L, 10L * G, "purchase", 20.0),
      (4L, 7L * G, "error", 999.0), // not a trade: excluded
      (5L, h + G, "purchase", 40.0)) // next bar
      .toDF("event_id", "ts", "event_type", "value")
    val dir = TempDirs.scoped("graft_ohlc")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.ohlcBars(spark, dir).collect()
    assert(out.length == 2)
    val bar0 = out(0)
    assert(bar0.getDouble(1) == 30.0) // open: earliest ts
    assert(bar0.getDouble(2) == 50.0) // high
    assert(bar0.getDouble(3) == 20.0) // low
    assert(bar0.getDouble(4) == 20.0) // close: ts tie -> larger event_id (3)
    assert(bar0.getLong(5) == 3L)
    assert(bar0.getDouble(6) == 100.0) // exact cents volume
  }

  test("twap: durations weight to the next trade and carry to the bar end") {
    val G = 1000000000L
    val rows = Seq(
      // bar 0: 10.00 held 1800s, then 20.00 held to bar end (1800s) -> 15.00
      (1L, 0L, "purchase", 10.0),
      (2L, 1800L * G, "purchase", 20.0),
      // bar 1: a single trade is the whole bar -> its own price
      (3L, 3700L * G, "purchase", 42.0))
      .toDF("event_id", "ts", "event_type", "value")
    val dir = TempDirs.scoped("graft_twap")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.twapBars(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L && out(0).getDouble(2) == 15.0)
    assert(out(1).getLong(1) == 1L && out(1).getDouble(2) == 42.0)
  }

  test("ohlc gapfill: tradeless hours appear, flagged, carrying the close") {
    val G = 1000000000L
    val rows = Seq(
      (1L, 0L, "purchase", 10.0), (2L, 60L * G, "purchase", 20.0),
      (3L, 7500L * G, "purchase", 42.0)) // hour 2; hour 1 is empty
      .toDF("event_id", "ts", "event_type", "value")
    val dir = TempDirs.scoped("graft_gapfill")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.ohlcGapfill(spark, dir).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (2L, 20.0, false),  // hour 0: real bar, close = last trade
      (0L, 20.0, true),   // hour 1: gap row carries the close forward
      (1L, 42.0, false))) // hour 2: real bar again
  }

  test("bar returns: first-bar null, exact ratios, drawdown from the peak") {
    val G = 1000000000L
    val rows = Seq(
      (1L, 0L, "purchase", 10.0),
      (2L, 3700L * G, "purchase", 20.0),
      (3L, 7300L * G, "purchase", 15.0))
      .toDF("event_id", "ts", "event_type", "value")
    val dir = TempDirs.scoped("graft_ret")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.barReturns(spark, dir).collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(2))                  // no previous bar
    assert(out(1).getDouble(2) == 1.0)          // 10 -> 20
    assert(out(2).getDouble(2) == -0.25)        // 20 -> 15
    assert(out(2).getDouble(3) == 20.0)         // peak holds
    assert(out(2).getDouble(4) == 0.25)         // (20-15)/20
  }

  test("price volatility: exact sample variance; single-trade bars are null") {
    val G = 1000000000L
    val rows = Seq(
      (1L, 0L, "purchase", 10.0), (2L, 60L * G, "purchase", 20.0),
      (3L, 3700L * G, "purchase", 42.0))
      .toDF("event_id", "ts", "event_type", "value")
    val dir = TempDirs.scoped("graft_vol")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.priceVolatility(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getDouble(2) == 50.0) // var(10,20) exactly
    assert(out(1).isNullAt(2))          // n=1: sample variance undefined
  }

  test("cohort retention: offsets are whole weeks from the first-seen week") {
    // 2024-01-01 is a Monday; nanos since epoch, UTC session
    val w0 = 1704067200L * 1000000000L
    val day = 86400L * 1000000000L
    val rows = Seq(
      (1L, "view", w0 + day), (1L, "view", w0 + 14 * day + 2 * day),
      (2L, "view", w0 + 2 * day))
      .toDF("user_id", "event_type", "ts")
    val dir = TempDirs.scoped("graft_cohort")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.cohortRetention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> (2L, 1.0),   // both users active in week 0
      ("2024-01-01", 2L) -> (1L, 0.5)))  // only user 1 returns in week 2
  }

  test("asof join keeps every event exactly once and never time-travels") {
    val nEvents = Tables.events(spark, sf).count()
    val out = RelationalExt.joinAsof(spark, sf).cache()
    assert(out.count() == nEvents)
    // matched orders must exist and be dated at or before the event ts
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("asof_orderkey"),
        col("o_orderdate"), col("o_custkey"))
    val bad = out.filter(col("asof_orderkey").isNotNull)
      .join(orders, Seq("asof_orderkey"))
      .filter(col("o_custkey") =!= col("user_id") ||
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss") > col("ts_str"))
      .count()
    assert(bad == 0)
    out.unpersist()
  }

  test("asofJoin matches brute force on random data with ties") {
    val rnd = new scala.util.Random(19)
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // Small key/time ranges force heavy collisions: same-key same-time
    // right rows (tie-break), left rows before any right row (nulls).
    val rights = (1L to 60L).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(40)), i, rnd.nextDouble() * 100))
    val lefts = (1L to 120L).map(i =>
      (rnd.nextInt(6).toLong, ts(rnd.nextInt(50)), i))
    import spark.implicits._
    val rightDf = rights.toDF("k", "t", "rid", "rv")
    val leftDf = lefts.toDF("k", "t", "lid")
    val got = RelationalExt.asofJoin(
        leftDf, "k", "t", "lid", rightDf, "k", "t", "rid", "rv")
      .select(col("l_id"), col("asof_id"))
      .as[(Long, Option[Long])].collect().toMap
    lefts.foreach { case (k, t, lid) =>
      val candidates = rights.filter(r => r._1 == k && !r._2.after(t))
      val expected =
        if (candidates.isEmpty) None
        else {
          val maxT = candidates.map(_._2.getTime).max
          Some(candidates.filter(_._2.getTime == maxT).map(_._3).max)
        }
      assert(got(lid) == expected, s"left $lid key $k t $t")
    }
  }

  test("range join covers every in-band row exactly once") {
    val li = Tables.lineitem(spark, sf)
    val inBand = li.filter(col("l_quantity") >= 0 && col("l_quantity") <= 50).count()
    val total = RelationalExt.joinRange(spark, sf)
      .agg(sum(col("n_items"))).as[Long].head()
    assert(total == inBand)
  }

  test("cube emits all four grouping sets consistently") {
    val out = RelationalExt.aggCube(spark, sf).cache()
    val grand = out.filter(col("l_returnflag").isNull &&
      col("l_linestatus").isNull)
    assert(grand.count() == 1)
    val n = Tables.lineitem(spark, sf).count()
    assert(grand.select(col("n_items")).as[Long].head() == n)
    // per-flag subtotals sum to the grand total
    val flagSum = out.filter(col("l_returnflag").isNotNull &&
      col("l_linestatus").isNull)
      .agg(sum(col("n_items"))).as[Long].head()
    assert(flagSum == n)
    out.unpersist()
  }

  test("pivot row sums equal the unpivoted aggregate") {
    val out = RelationalExt.pivotStatus(spark, sf)
    val pivotTotal = out.agg(sum(col("qty_f") + col("qty_o"))).as[Double].head()
    val direct = Tables.lineitem(spark, sf)
      .agg((sum(round(col("l_quantity") * 100).cast("long")) / 100.0))
      .as[Double].head()
    assert(math.abs(pivotTotal - direct) < 1e-6)
  }

  test("hash sample is deterministic and near the 1/16 rate") {
    val a = RelationalExt.sampleHash(spark, sf)
    val b = RelationalExt.sampleHash(spark, sf)
    assert(a.collect().toSeq == b.collect().toSeq)
    val total = Tables.orders(spark, sf).count().toDouble
    val frac = a.count() / total
    assert(frac > 0.02 && frac < 0.13, s"sample fraction $frac")
  }

  test("percentiles are monotone and within the value range") {
    RelationalExt.percentiles(spark, sf).collect().foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
      assert(p25 >= 1.0 && p75 <= 50.0)
    }
  }

  test("salted aggregation equals the direct group-by") {
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("sum_value_c"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("event_type"))
      .collect().toSeq
    val salted = RelationalExt.aggSalted(spark, sf).collect().toSeq
    assert(salted == direct)
  }

  test("exact-moment corr matches built-in corr and is partitioning-invariant") {
    val rows = RelationalExt.aggCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    // agreement with Spark's float-accumulating built-ins (they differ
    // only by accumulation error, so a tight tolerance holds)
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0)
      assert(math.abs(c - builtin(r.getString(0))) < 1e-9)
      assert(r.getDouble(4) > 0 && r.getDouble(5) > 0)
    }
    // the whole point: bit-identical under a different partitioning
    val rows2 = RelationalExt
      .aggCorrOf(Tables.lineitem(spark, sf).repartition(7))
      .collect()
    assert(rows.map(_.toString).toSeq == rows2.map(_.toString).toSeq)
    // and bit-identical when the input arrives as folded batch slices
    // (stream_agg_corr's contract)
    val li = Tables.lineitem(spark, sf)
    val folded = RelationalExt.corrFinalize(
      RelationalExt.corrMoments(li.filter(col("l_orderkey") % 2 === 0))
        .unionByName(RelationalExt
          .corrMoments(li.filter(col("l_orderkey") % 2 === 1))))
      .collect()
    assert(rows.map(_.toString).toSeq == folded.map(_.toString).toSeq)
  }

  test("full outer join loses no keys from either side") {
    val out = RelationalExt.joinFullOuter(spark, sf).cache()
    val nCust = Tables.customer(spark, sf).count()
    val nUsersNotCust = Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .join(Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"), "left_anti").count()
    assert(out.count() == nCust + nUsersNotCust)
    out.unpersist()
  }

  test("bucketed join: zero exchanges under the join, results intact") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // run the declared query once so both bucketed tables exist
    val out = RelationalExt.joinBucketed(spark, sf).collect()
    assert(out.nonEmpty)
    // At verification scale the optimizer rightly broadcasts the tiny
    // orders side; the layout's point is the 100 TB case where NEITHER
    // side broadcasts — force that regime and the bucketed sort-merge
    // join must run with NO shuffle exchange on either side.
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val join = RelationalExt.bucketedJoinFrame(spark, sf)
      join.count()
      val plan = join.queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty ||
        plan.toString.contains("SortMergeJoin"),
        s"expected a sort-merge join over bucketed tables:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join planned ${shuffles.size} shuffle exchange(s)")
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("ols: planted exact fit, corr consistency, partitioning invariance") {
    import spark.implicits._
    // y = 2x exactly (prices in dollars; cents stay integral):
    // slope 2 $/unit, intercept 0, r2 = 1 — all exact in the fixed formulas
    val planted = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val fit = RelationalExt.olsFinalize(RelationalExt.corrMoments(planted))
      .collect()
    assert(fit.length == 1)
    assert(fit(0).getDouble(2) == 2.0)
    assert(fit(0).getDouble(3) == 0.0)
    assert(fit(0).getDouble(4) == 1.0)
    // on real data: r2 agrees with corr^2 up to fp re-association
    val corrBy = RelationalExt.aggCorr(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rows = RelationalExt.aggOls(spark, sf).collect()
    rows.foreach { r =>
      val c = corrBy(r.getString(0))
      assert(math.abs(r.getDouble(4) - c * c) < 1e-12)
    }
    // bit-identical under a different partitioning (the family contract)
    val rows2 = RelationalExt.olsFinalize(RelationalExt.corrMoments(
      Tables.lineitem(spark, sf).repartition(7))).collect()
    assert(rows.map(_.toString).toSeq == rows2.map(_.toString).toSeq)
  }

  test("event transitions: shares sum to one and counts recount locally") {
    val out = RelationalExt.eventTransitions(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    }
    // local recount over the (user, ts, event_id)-ordered stream
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      ordered.zip(ordered.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("zorder: planted Morton interleaves and the both-dims-bounded property") {
    import spark.implicits._
    // x=0b1010, y=0b0110 -> z has x bits at even, y bits at odd positions:
    // bits: x0=0,y0=0,x1=1,y1=1,x2=0,y2=1,x3=1,y3=0 -> 0b01101100 = 108
    val planted = Seq((10L, 6L), (0L, 0L), (255L, 255L))
      .toDF("x", "y")
      .select(RelationalExt.zInterleave(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(planted == Seq(108L, 0L, 65535L))

    val out = RelationalExt.zorderLayout(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("linear", "zorder"))
    // both layouts partition the same rows
    assert(out("linear").getLong(2) == out("zorder").getLong(2))
    // the point of z-ordering: the linear layout leaves the second
    // dimension effectively unbounded per bucket; z-order bounds it
    val linDay = out("linear").getDouble(5)
    val zDay = out("zorder").getDouble(5)
    val zCust = out("zorder").getDouble(3)
    assert(zDay < linDay / 2,
      s"zorder avg day span $zDay not well below linear $linDay")
    // and still bounds the first dimension to a fraction of its range
    val custRange = spark.read.parquet(s"$sf/orders.parquet")
      .agg(max(col("o_custkey"))).head().getLong(0)
    assert(zCust < custRange / 2.0)
  }
}
