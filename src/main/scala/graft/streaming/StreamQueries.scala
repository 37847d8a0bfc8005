package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QuerySpec

/** Declared queries for the streaming tier. Both run the REAL streaming
  * machinery (file stream + AvailableNow, flatMapGroupsWithState) over the
  * bounded events table, so results are deterministic and oracle-checkable
  * while exercising the same code paths an unbounded deployment uses.
  */
object StreamQueries {

  /** Event-time tumbling windows through a checkpoint-less AvailableNow
    * run into a memory sink. */
  def hourlyAggQuery(s: SparkSession, dir: String): DataFrame =
    MicroBatchPipeline.runToResult(s,
        MicroBatchPipeline.hourlyAgg(MicroBatchPipeline.eventsStream(s, dir)))
      .orderBy(col("window_start"), col("event_type"))

  /** Declared query — the WATERMARK LATE-DATA AUDIT, the observability
    * readout behind every event-time pipeline's first production
    * question: "how much data are we dropping as late, and where?"
    * Construction: the event stream arrives as two forced micro-batches
    * — first everything except a held-back ~1/16 of STRAGGLERS (md5
    * rule), then the stragglers. Straggler eligibility is deliberately
    * restricted to rows whose (hour window, type) key both CLOSES under
    * the final watermark (window end ≤ max−2h) and contains at least
    * one on-time row — because Spark's late-row guarantee is exactly
    * that narrow: a late row into an ALREADY-EVICTED key is dropped
    * (and counted in numRowsDroppedByWatermark), but a late row into a
    * key the store never saw is silently aggregated into state that
    * Append mode will never emit (measured on this engine's Spark —
    * the probe that motivated this construction). Under the
    * construction every straggler hits an evicted key, so the drop set
    * is exact and the audit joins the DRAINED per-window counts against
    * batch ground truth to report, per (window, type): batch count,
    * emitted count, rows LOST to the watermark, and rows still PENDING
    * in open windows that Append never emitted before termination. The
    * oracle replays all four from the split rule and the watermark
    * arithmetic — if Spark's eviction or late-drop semantics move, this
    * query diverges: it is the engine's pinned record OF them. State
    * stays bounded by the 2 h horizon per key, the production
    * guarantee the audit exists to price. */
  def lateAuditQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.OutputMode
    val landing = graft.TempDirs.scoped("graft_late_landing")
    val ev = graft.Tables.events(spark, dir)
    val mts = ev.agg(max(col("ts"))).head().getTimestamp(0)
    // m1 = the newest event time outside the final hour — the watermark
    // the store holds while the straggler batch arrives is m1 - 2h,
    // because the final hour lands as its own (second) batch
    val m1 = ev.filter(col("ts") <= lit(mts) - expr("INTERVAL 1 HOUR"))
      .agg(max(col("ts"))).head().getTimestamp(0)
    val ws = date_trunc("hour", col("ts"))
    val candidate = substring(md5(col("event_id").cast("string")), 1, 1) === "0"
    // eligibility: the key must be EVICTED before the stragglers arrive
    // (end <= m1 - 2h) and must hold at least one on-time row — the only
    // regime where Spark's drop guarantee is sharp (see the doc above)
    val evictedEarly = ws + expr("INTERVAL 1 HOUR") <=
      lit(m1) - expr("INTERVAL 2 HOURS")
    val hasOnTime = org.apache.spark.sql.expressions.Window
      .partitionBy(ws, col("event_type"))
    val isStraggler = candidate && evictedEarly &&
      (sum((!candidate).cast("long")).over(hasOnTime) > 0)
    // one parquet FILE per micro-batch, ordered by modification time
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String,
        mtime: Long): Unit = {
      val tmp = graft.TempDirs.scoped("graft_late_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(landing, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      ()
    }
    // three ordered batches: history (sans stragglers) -> final hour ->
    // stragglers. The middle batch advances nothing new below m1, but
    // its END is when the store evicts the early keys — so the
    // stragglers in batch three meet already-evicted keys and drop.
    // Eagerly checkpointed: the three landing-file writes below are
    // separate ACTIONS, so each would re-run the events scan plus the
    // straggler-eligibility window; materializing the flagged rows once
    // makes them three cheap filters.
    val flagged = ev.withColumn("straggler", isStraggler).localCheckpoint(true)
    writeOne(flagged.filter(!col("straggler") &&
        col("ts") <= lit(mts) - expr("INTERVAL 1 HOUR"))
      .drop("straggler"), "a.parquet", 1000000L)
    writeOne(flagged.filter(col("ts") > lit(mts) - expr("INTERVAL 1 HOUR"))
      .drop("straggler"), "b.parquet", 2000000L)
    writeOne(flagged.filter(col("straggler")).drop("straggler"),
      "c.parquet", 3000000L)
    val drained = MicroBatchPipeline.runToResult(spark,
      MicroBatchPipeline.hourlyAgg(MicroBatchPipeline.eventsStreamFrom(
        spark, landing, maxFilesPerTrigger = Some(1))),
      OutputMode.Append())
    val batch = ev
      .select(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        (date_trunc("hour", col("ts")) + expr("INTERVAL 1 HOUR") <=
          lit(mts) - expr("INTERVAL 2 HOURS")).as("closed"))
      .groupBy(col("window_start"), col("event_type"), col("closed"))
      .agg(count(lit(1)).as("n_batch"))
    batch.join(drained.select(col("window_start"), col("event_type"),
          col("n_events").as("n_emitted")),
        Seq("window_start", "event_type"), "left")
      .select(col("window_start"), col("event_type"),
        when(col("closed"), "closed").otherwise("open").as("window_state"),
        col("n_batch"),
        coalesce(col("n_emitted"), lit(0L)).as("n_emitted"),
        when(col("closed"),
          col("n_batch") - coalesce(col("n_emitted"), lit(0L)))
          .otherwise(0L).as("n_late"),
        when(!col("closed"),
          col("n_batch") - coalesce(col("n_emitted"), lit(0L)))
          .otherwise(0L).as("n_pending"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Stateful sessionization (30-min gap) via flatMapGroupsWithState. */
  def sessionizeQuery(s: SparkSession, dir: String): DataFrame =
    MicroBatchPipeline.sessionize(s, graft.Tables.events(s, dir))
      .toDF()
      .orderBy(col("user_id"))

  /** Sliding event-time windows (2 h / 1 h) through the streaming path. */
  def slidingAggQuery(s: SparkSession, dir: String): DataFrame =
    MicroBatchPipeline.runToResult(s,
        MicroBatchPipeline.slidingAgg(MicroBatchPipeline.eventsStream(s, dir)))
      .orderBy(col("window_start"))

  /** Streaming dedup under at-least-once delivery: the stream unioned with
    * itself (every event delivered twice, possibly in the same micro-batch)
    * must come out exactly once through dropDuplicatesWithinWatermark —
    * state is bounded by the watermark horizon, so an unbounded stream
    * can run forever. */
  def streamDedupQuery(s: SparkSession, dir: String): DataFrame = {
    // Duplicate delivery simulated by exploding each row twice — one
    // file-stream scan, same at-least-once semantics as a redelivering
    // source (both copies can land in the same micro-batch).
    val twice = MicroBatchPipeline.eventsStream(s, dir)
      .withColumn("delivery", explode(array(lit(1), lit(2))))
      .drop("delivery")
    MicroBatchPipeline.runToResult(s,
        MicroBatchPipeline.dedupWithinWatermark(twice)
          .select(col("event_id"), col("event_type"), col("value")),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy(col("event_id"))
  }

  /** Built-in session windows (dynamic-gap event-time windows) — the
    * declarative sibling of the flatMapGroupsWithState sessionization:
    * per (user, session) row with start/end/count, sessions closing after
    * 30 minutes of inactivity, state bounded by the watermark. */
  def sessionWindowQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = MicroBatchPipeline.eventsStream(s, dir)
    val agg = ev
      .withWatermark("ts", "4 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))
    MicroBatchPipeline.runToResult(s, agg)
      .orderBy(col("user_id"), col("session_start"))
  }

  /** STREAMING OHLC candles — the live form of the reference domain's
    * headline aggregate ([[graft.operators.RelationalExt.ohlcBars]]): a
    * price feed in, per-hour candle updates out, watermark-bounded state.
    * Struct-min/max open/close picks and the integer-cents volume are the
    * exact batch aggregates run inside the streaming engine, so the
    * drained AvailableNow result equals the batch bars row-for-row — the
    * shared oracle SQL pins that equality every round. */
  def ohlcBarsStreamQuery(s: SparkSession, dir: String): DataFrame = {
    val trades = MicroBatchPipeline.eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
    val agg = trades
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n_trades"),
        sum(round(col("value") * 100).cast("long")).as("volume_c"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("bar_ts"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_trades"), (col("volume_c") / 100.0).as("volume"))
    MicroBatchPipeline.runToResult(s, agg).orderBy(col("bar_ts"))
  }

  /** STREAMING gap-filled candles — the live twin of
    * [[graft.operators.RelationalExt.ohlcGapfill]]: the per-hour
    * close/count aggregate runs INSIDE the streaming engine
    * (watermark-bounded state, the [[ohlcBarsStreamQuery]] aggregates),
    * and the calendar-spine forward-fill runs over the DRAINED bars — the
    * right split, because gap rows are a presentation over the closed
    * bars (a tradeless hour has no event to trigger on; emitting it is
    * the chart layer's job, here a batch window over the calendar-sized
    * bar series, the same adjudication as the batch query). The shared
    * oracle SQL pins stream == batch row-for-row every round. */
  def ohlcGapfillStreamQuery(s: SparkSession, dir: String): DataFrame = {
    val trades = MicroBatchPipeline.eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
    val agg = trades
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n_trades"))
      .select(col("window.start").as("bar_ts"), col("close"), col("n_trades"))
    val bars = MicroBatchPipeline.runToResult(s, agg)
    val spine = bars.agg(min(col("bar_ts")).as("lo"), max(col("bar_ts")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("bar_ts"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bar_ts"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    spine.join(bars, Seq("bar_ts"), "left")
      .withColumn("close_ff", last(col("close"), ignoreNulls = true).over(w))
      .select(date_format(col("bar_ts"), "yyyy-MM-dd HH:mm:ss").as("bar_ts"),
        coalesce(col("n_trades"), lit(0L)).as("n_trades"),
        col("close_ff").as("close"),
        col("close").isNull.as("is_gap"))
      .orderBy(col("bar_ts"))
  }

  /** STREAMING conversion funnel — the live twin of
    * [[graft.operators.RelationalExt.eventFunnel]]: the per-user state
    * machine ([[MicroBatchPipeline.funnelDepths]], three longs per user)
    * runs inside flatMapGroupsWithState; the drained Update-mode rows are
    * reduced to each user's final (maximal) depth and rolled up to the
    * same (step, n_users, conv_rate) table the batch funnel emits — the
    * shared oracle SQL pins stream == batch every round. */
  def eventFunnelStreamQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = MicroBatchPipeline.eventsStream(s, dir)
    val drained = MicroBatchPipeline.runToResult(s,
      MicroBatchPipeline.funnelDepths(s, ev).toDF(),
      org.apache.spark.sql.streaming.OutputMode.Update())
    // depth is monotone per user, so the final state is the max emission
    val depths = drained.groupBy(col("user_id"))
      .agg(max(col("depth")).as("depth"))
    val steps = graft.operators.RelationalExt.FunnelSteps.zipWithIndex
      .map { case (t, i) => (i + 1L, t) }.toDF("step", "event_type")
    val counts = steps.join(depths, col("depth") >= col("step"), "left")
      .groupBy(col("step"), col("event_type"))
      .agg(count(col("user_id")).as("n_users"))
    val base = counts.filter(col("step") === 1L)
      .select(col("n_users").as("n0"))
    counts.crossJoin(base)
      .select(col("step"), col("event_type"), col("n_users"),
        (col("n_users").cast("double") / col("n0")).as("conv_rate"))
      .orderBy(col("step"))
  }

  /** The CUSTOM DSv2 STREAMING SOURCE as a declared query: the synthetic
    * event feed read through its own MicroBatchStream (id-offset log,
    * admission-controlled 25k-row batches — four real micro-batches per
    * drain), aggregated per event type with the exact integer-cents sum.
    * Rows-only: DuckDB cannot replay the splitmix generator's 64-bit
    * wrap-around multiplies; `StreamingSpec` pins the drain equal to the
    * same source read as a BATCH (one scan contract, two read paths). */
  def syntheticSourceStreamQuery(s: SparkSession, dir: String): DataFrame = {
    val st = s.readStream.format("graft.sources.SyntheticEvents")
      .option("rows", 100000).option("numPartitions", 8)
      .option("maxRowsPerBatch", 25000).load()
    val agg = st.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
    MicroBatchPipeline.runToResult(s, agg)
      .select(col("event_type"), col("n_events"),
        (col("value_c") / 100.0).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Stream-static enrichment join: the unbounded event stream joined to
    * a broadcast customer dimension per micro-batch (the streaming form
    * of the reference's FX lookup, O6) and aggregated per segment. The
    * static side is planned as a broadcast hash join inside every
    * micro-batch — no stream-side shuffle for the join itself. */
  def streamStaticJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = MicroBatchPipeline.eventsStream(s, dir)
    val cust = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = ev.join(broadcast(cust), col("user_id") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select(col("c_mktsegment"), col("n_events"),
        (col("value_c") / 100.0).as("sum_value"))
    // NULLS FIRST pinned on both sides: events whose user_id misses the
    // dimension produce a NULL segment group, and Spark (NULLS FIRST) and
    // DuckDB (NULLS LAST) disagree on default null ordering.
    MicroBatchPipeline.runToResult(s, joined)
      .orderBy(col("c_mktsegment").asc_nulls_first)
  }

  /** Stream-stream interval join (click attribution): every purchase
    * joined to the same user's clicks in the preceding 30 minutes, both
    * sides unbounded streams. The event-time range condition plus the
    * watermarks is what makes this runnable forever: each side's join
    * state is evicted once the other side's watermark passes the range
    * bound, so state holds only the last ~90 minutes per user. Both sides
    * shuffle on user_id once; the join itself is the stateful
    * symmetric-hash stream join, Append-only by construction. */
  def attributionJoin(purchaseSide: DataFrame, clickSide: DataFrame): DataFrame = {
    val purchases = purchaseSide
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = clickSide
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000")
          .as("gap_sec"))
  }

  def streamStreamJoinQuery(s: SparkSession, dir: String): DataFrame =
    MicroBatchPipeline.runToResult(s,
        attributionJoin(
          MicroBatchPipeline.eventsStream(s, dir),
          MicroBatchPipeline.eventsStream(s, dir)),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy(col("purchase_id"), col("click_id"))

  /** The same stream-stream join under the RocksDB state-store provider —
    * the declared 100 TB step for streaming state (off-heap, changelog-
    * checkpointable). Declared as its own query so BOTH claims are on the
    * official record: the driver's oracle proves the provider switch is
    * result-identical on the heaviest stateful query (symmetric join
    * state), and the bench artifact carries a measured RocksDB timing
    * next to the HDFS-backed twin. The provider is baked into the stream
    * at start; the session value is restored afterwards. */
  def streamStreamJoinRocksDbQuery(s: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // runToResult drains the stream before returning, so the provider
    // conf can be restored here without racing the query.
    try streamStreamJoinQuery(s, dir)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  import graft.QuerySpec.{rowsOnly, withOracle}

  /** The splitmix64 finalizer ([[graft.sources.SyntheticEvents.mix]])
    * replayed as pure SQL (VERDICT r14 #7's recorded-artifact spirit on
    * a seed instead of a trained artifact — the last "DuckDB cannot
    * replay this" claim, retired): unsigned 64-bit wrap arithmetic is
    * emulated as HUGEINT values in [0, 2⁶⁴) — add/mod for the golden-
    * ratio increment, integer division by 2^k for the LOGICAL right
    * shift (BIGINT `>>` is arithmetic), `xor` on the signed BIGINT
    * image (xor is bit-pattern, sign-agnostic; the signed↔unsigned
    * bijection is a ±2⁶⁴ CASE), and the two multiplies in UHUGEINT
    * (a 64×64-bit product needs all 128 unsigned bits) mod 2⁶⁴.
    * Validated bit-exact against the JVM mix on 2000 ids before
    * shipping. */
  private object SplitmixSql {
    private val P = "18446744073709551616" // 2^64
    private def u2s(e: String) =
      s"(CASE WHEN $e >= 9223372036854775808 THEN CAST($e - $P AS BIGINT) " +
        s"ELSE CAST($e AS BIGINT) END)"
    private def s2u(e: String) =
      s"(CAST($e AS HUGEINT) + CASE WHEN $e < 0 THEN $P ELSE 0 END)"
    // one (z ^ (z >>> k)) * c stage, everything mod 2^64
    private def stage(z: String, k: Int, cUnsigned: BigInt) = {
      val x = s"xor(${u2s(z)}, ${u2s(s"($z // ${1L << k})")})"
      s"CAST(CAST(${s2u(x)} AS UHUGEINT) * $cUnsigned % $P AS HUGEINT)"
    }
    /** mix(inp) as an UNSIGNED HUGEINT expression (inp must be >= 0). */
    def mixExpr(inp: String): String = {
      val z0 = s"((CAST($inp AS HUGEINT) + 11400714819323198485) % $P)"
      val z1 = stage(z0, 30, BigInt("13787848793156543929"))
      val z2 = stage(z1, 27, BigInt("10723151780598845931"))
      s2u(s"xor(${u2s(z2)}, ${u2s(s"($z2 // ${1L << 31})")})")
    }
    /** java.lang.Math.floorMod of the SIGNED image of an unsigned expr. */
    def floorModExpr(e: String, m: Long): String =
      s"(((${u2s(e)}) % $m + $m) % $m)"
  }

  private def syntheticSourceOracleSql: String = {
    val typeCase = graft.sources.SyntheticEvents.eventTypes.zipWithIndex
      .map { case (t, i) => s"WHEN $i THEN '$t'" }.mkString(" ")
    s"""WITH ids AS (SELECT range AS i FROM range(0, 100000)),
       |m AS (SELECT i, ${SplitmixSql.mixExpr("i + 1")} AS mt,
       |    ${SplitmixSql.mixExpr("i + 2")} AS mv FROM ids),
       |r AS (SELECT
       |    (CASE ${SplitmixSql.floorModExpr("mt", 5)} $typeCase END)
       |      AS event_type,
       |    ${SplitmixSql.floorModExpr("mv", 10000)} AS vc
       |  FROM m)
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(vc) AS DOUBLE) / 100.0 AS sum_value
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(
    // Full hash check (r15): the custom DSv2 source's splitmix generator
    // IS SQL-replayable after all — see [[SplitmixSql]]; the oracle
    // regenerates all 100k rows from the seed arithmetic and replays the
    // per-type integer-cents aggregate.
    withOracle("stream_synthetic_source", syntheticSourceStreamQuery,
      syntheticSourceOracleSql),
    // Streaming near-dup dedup (StreamingDedup): survivors = docs that are
    // not the larger side of any exact-Jaccard near-dup pair. The exact
    // pair set equals the LSH candidate set on this corpus (pinned by the
    // batch tier's tests), so exact SQL oracles the streaming path.
    withOracle("stream_neardup_dedup", StreamingDedup.streamNearDupDedupQuery,
      s"""WITH ${graft.operators.Dedup.jaccardPairsCte}
         |SELECT d.doc_id FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM jp WHERE jp.doc_b = d.doc_id)
         |ORDER BY doc_id""".stripMargin),
    // Batch-incremental twin: two id-ordered slices appended to one index
    // (compaction between). Monotone slice split => first-seen-wins
    // coincides with min-lower-id, so the same exact-Jaccard oracle
    // applies.
    withOracle("text_incremental_dedup", StreamingDedup.incrementalDedupQuery,
      s"""WITH ${graft.operators.Dedup.jaccardPairsCte}
         |SELECT d.doc_id FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM jp WHERE jp.doc_b = d.doc_id)
         |ORDER BY doc_id""".stripMargin),
    // Read-side serving twin: the eval split streamed as queries against
    // the train split's persisted LSH index (index fixed during serving
    // => batch-boundary invariant). Candidates equal the exact pair set
    // on this corpus, so the oracle is the cross-split Jaccard pairs.
    withOracle("stream_text_serve", StreamingDedup.streamTextServeQuery,
      s"""WITH ${graft.operators.Dedup.jaccardPairsCte},
         |sym AS (SELECT doc_a AS q, doc_b AS m, jaccard FROM jp
         |        UNION ALL SELECT doc_b AS q, doc_a AS m, jaccard FROM jp)
         |SELECT q AS query_doc, m AS match_doc, jaccard
         |FROM sym
         |WHERE substr(md5(CAST(q AS VARCHAR)), 1, 1) = '0'
         |  AND substr(md5(CAST(m AS VARCHAR)), 1, 1) <> '0'
         |ORDER BY query_doc, match_doc""".stripMargin),
    // The DELETE lifecycle: same serve, but train docs with doc_id%5==2
    // were tombstoned before serving — the oracle drops exactly the pairs
    // whose match side was forgotten. A full differential check that the
    // tombstone anti-join removes those matches and ONLY those.
    // The lifecycle is one append slice + one tombstone slice; doc counts
    // replay the md5 train split and the %5 forget rule. Docs are indexed
    // regardless of shingle count (the signature kernel totals them), so
    // no indexability clause is needed.
    withOracle("dedup_index_stats", StreamingDedup.textIndexStatsQuery,
      """SELECT CAST(1 AS BIGINT) AS n_data_slices,
        |  CAST(1 AS BIGINT) AS n_tombstone_slices,
        |  CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
        |    AND NOT doc_id % 5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_live_docs,
        |  CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
        |    AND doc_id % 5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dead_ids
        |FROM documents""".stripMargin),
    // AS-OF snapshot serving: only slice-0 docs (train ids <= max/2) can
    // match, and the LATER delete of %5==2 docs is invisible — the
    // differential against dedup_serve_deleted that pins time-travel
    // semantics (there the %5==2 matches vanish; here they must persist).
    withOracle("dedup_serve_asof", StreamingDedup.serveAsOfQuery,
      s"""WITH ${graft.operators.Dedup.jaccardPairsCte},
         |sym AS (SELECT doc_a AS q, doc_b AS m, jaccard FROM jp
         |        UNION ALL SELECT doc_b AS q, doc_a AS m, jaccard FROM jp)
         |SELECT q AS query_doc, m AS match_doc, jaccard
         |FROM sym
         |WHERE substr(md5(CAST(q AS VARCHAR)), 1, 1) = '0'
         |  AND substr(md5(CAST(m AS VARCHAR)), 1, 1) <> '0'
         |  AND m <= (SELECT MAX(doc_id) // 2 FROM documents)
         |ORDER BY query_doc, match_doc""".stripMargin),
    // Delete visibility: the pre-delete serve batch keeps forgotten-side
    // matches, the post-delete batch must not see them — two halves of
    // one output held to different match sets by the same oracle.
    withOracle("dedup_serve_visibility", StreamingDedup.serveVisibilityQuery,
      s"""WITH ${graft.operators.Dedup.jaccardPairsCte},
         |sym AS (SELECT doc_a AS q, doc_b AS m, jaccard FROM jp
         |        UNION ALL SELECT doc_b AS q, doc_a AS m, jaccard FROM jp)
         |SELECT q AS query_doc, m AS match_doc, jaccard,
         |  CAST(CASE WHEN substr(md5(CAST(q AS VARCHAR)), 2, 1) < '8'
         |    THEN 0 ELSE 1 END AS BIGINT) AS served_batch
         |FROM sym
         |WHERE substr(md5(CAST(q AS VARCHAR)), 1, 1) = '0'
         |  AND substr(md5(CAST(m AS VARCHAR)), 1, 1) <> '0'
         |  AND (substr(md5(CAST(q AS VARCHAR)), 2, 1) < '8'
         |       OR NOT (m % 5 = 2))
         |ORDER BY query_doc, match_doc""".stripMargin),
    // Snapshot diff: live set as of slice 0 vs the current head over the
    // standard append+append+delete lifecycle — added = b1 survivors
    // (> max/2, not forgotten), removed = b0 docs the delete tombstoned,
    // unchanged = the rest of b0. Class counts and id bounds replay from
    // the md5 train split, the max/2 slice cut, and the %5 forget rule.
    withOracle("dedup_index_diff", StreamingDedup.indexDiffQuery,
      """WITH t AS (SELECT doc_id,
        |    (SELECT MAX(doc_id) // 2 FROM documents) AS cut
        |  FROM documents
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0')
        |SELECT * FROM (
        |  SELECT 'added' AS change, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |  FROM t WHERE doc_id > cut AND doc_id % 5 <> 2
        |  UNION ALL
        |  SELECT 'removed', CAST(COUNT(*) AS BIGINT), MIN(doc_id), MAX(doc_id)
        |  FROM t WHERE doc_id <= cut AND doc_id % 5 = 2
        |  UNION ALL
        |  SELECT 'unchanged', CAST(COUNT(*) AS BIGINT), MIN(doc_id), MAX(doc_id)
        |  FROM t WHERE doc_id <= cut AND doc_id % 5 <> 2)
        |ORDER BY change""".stripMargin),
    // Compaction-policy readout: after append+append+delete+fold, exactly
    // one compacted slice per subdir, zero tombstones, and physical row
    // counts equal to live docs (Bands band rows + one signature row
    // each) — slice accounting DuckDB replays from the %5 delete rule.
    withOracle("dedup_compaction_stats", StreamingDedup.compactionStatsQuery,
      s"""SELECT CAST(1 AS BIGINT) AS n_band_slices,
         |  CAST(1 AS BIGINT) AS n_set_slices,
         |  CAST(0 AS BIGINT) AS n_tombstone_slices,
         |  CAST(${graft.operators.Dedup.Bands}
         |    * SUM(CASE WHEN doc_id % 5 = 2 THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_band_rows,
         |  CAST(SUM(CASE WHEN doc_id % 5 = 2 THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_set_rows,
         |  CAST(SUM(CASE WHEN doc_id % 5 = 2 THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_live_docs
         |FROM documents""".stripMargin),
    withOracle("dedup_serve_deleted", StreamingDedup.serveDeletedQuery,
      s"""WITH ${graft.operators.Dedup.jaccardPairsCte},
         |sym AS (SELECT doc_a AS q, doc_b AS m, jaccard FROM jp
         |        UNION ALL SELECT doc_b AS q, doc_a AS m, jaccard FROM jp)
         |SELECT q AS query_doc, m AS match_doc, jaccard
         |FROM sym
         |WHERE substr(md5(CAST(q AS VARCHAR)), 1, 1) = '0'
         |  AND substr(md5(CAST(m AS VARCHAR)), 1, 1) <> '0'
         |  AND NOT (m % 5 = 2)
         |ORDER BY query_doc, match_doc""".stripMargin),
    // Rebuild the index over the live train docs, swap the serving alias
    // atomically, serve through the pointer (VERDICT r19 #1):
    // rebuild-on-survivors ≡ the tombstone-filtered serve, so the
    // dedup_serve_deleted replay carries verbatim.
    withOracle("dedup_serve_cutover", StreamingDedup.serveCutoverQuery,
      s"""WITH ${graft.operators.Dedup.jaccardPairsCte},
         |sym AS (SELECT doc_a AS q, doc_b AS m, jaccard FROM jp
         |        UNION ALL SELECT doc_b AS q, doc_a AS m, jaccard FROM jp)
         |SELECT q AS query_doc, m AS match_doc, jaccard
         |FROM sym
         |WHERE substr(md5(CAST(q AS VARCHAR)), 1, 1) = '0'
         |  AND substr(md5(CAST(m AS VARCHAR)), 1, 1) <> '0'
         |  AND NOT (m % 5 = 2)
         |ORDER BY query_doc, match_doc""".stripMargin),
    // Embedding twin: survivors of the streaming LSH dedup = vectors that
    // are not the larger side of any CAPPED-WITNESS verified pair — the
    // saturation cap (EmbeddingBucketCap, the embedding tier's scale
    // bound) is part of the declared contract, and under the single-drain
    // batch's rec_id exemplar order the cap reduces to a per-bucket
    // vec_id rank predicate the oracle replays exactly.
    withOracle("stream_embedding_dedup", StreamingDedup.streamEmbeddingDedupQuery,
      s"""${graft.operators.Similarity.cappedWitnessPairScoresCtes(
               StreamingDedup.EmbeddingBucketCap)}
         |SELECT e.vec_id FROM embeddings e
         |WHERE NOT EXISTS (SELECT 1 FROM pair_scores ps
         |  WHERE ps.vec_b = e.vec_id
         |    AND ps.score >= ${graft.operators.Similarity.NearDupThreshold})
         |ORDER BY e.vec_id""".stripMargin),
    // Embedding twin of text_incremental_dedup: three vec_id-ordered
    // slices into one index with a compaction between — monotone split =>
    // min-lower-id under the SAME saturation cap (exemplar rank is
    // time-independent in vec_id order, so the single-drain capped oracle
    // applies across appends and the compaction unchanged).
    withOracle("embedding_incremental_dedup",
      (s, d) => StreamingDedup.incrementalEmbeddingDedupQuery(s, d),
      s"""${graft.operators.Similarity.cappedWitnessPairScoresCtes(
               StreamingDedup.EmbeddingBucketCap)}
         |SELECT e.vec_id FROM embeddings e
         |WHERE NOT EXISTS (SELECT 1 FROM pair_scores ps
         |  WHERE ps.vec_b = e.vec_id
         |    AND ps.score >= ${graft.operators.Similarity.NearDupThreshold})
         |ORDER BY e.vec_id""".stripMargin),
    withOracle("stream_ohlc_bars", ohlcBarsStreamQuery,
      graft.operators.RelationalExt.ohlcOracleSql),
    withOracle("stream_ohlc_gapfill", ohlcGapfillStreamQuery,
      graft.operators.RelationalExt.ohlcGapfillOracleSql),
    withOracle("stream_event_funnel", eventFunnelStreamQuery,
      graft.operators.RelationalExt.funnelOracleSql),
    withOracle("stream_hourly_agg", hourlyAggQuery,
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // Late-data audit: closed = window end <= final watermark (max-2h);
    // stragglers (md5 candidates in closed keys that also have on-time
    // rows) are dropped by the watermark, open windows stay pending.
    withOracle("stream_late_audit", lateAuditQuery,
      """WITH mx AS (SELECT MAX(ts) AS mts,
        |    MAX(CASE WHEN ts <= (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR
        |      THEN ts END) AS m1
        |  FROM events),
        |e AS (SELECT ts, event_type, date_trunc('hour', ts) AS ws,
        |    substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0' AS cand,
        |    mts, m1
        |  FROM events, mx),
        |w AS (SELECT ws, event_type, mts, m1, COUNT(*) AS n_batch,
        |    SUM(CASE WHEN cand THEN 0 ELSE 1 END) AS n_ontime,
        |    (ws + INTERVAL 1 HOUR <= mts - INTERVAL 2 HOUR) AS closed,
        |    (ws + INTERVAL 1 HOUR <= m1 - INTERVAL 2 HOUR) AS early
        |  FROM e GROUP BY 1, 2, 3, 4),
        |g AS (SELECT *, CASE WHEN early AND n_ontime > 0
        |    THEN n_batch - n_ontime ELSE 0 END AS n_strag FROM w)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  CASE WHEN closed THEN 'closed' ELSE 'open' END AS window_state,
        |  CAST(n_batch AS BIGINT) AS n_batch,
        |  CAST(CASE WHEN closed THEN n_batch - n_strag ELSE 0 END AS BIGINT)
        |    AS n_emitted,
        |  CAST(CASE WHEN closed THEN n_strag ELSE 0 END AS BIGINT) AS n_late,
        |  CAST(CASE WHEN closed THEN 0 ELSE n_batch END AS BIGINT) AS n_pending
        |FROM g ORDER BY window_start, event_type""".stripMargin),
    withOracle("stream_sessionize", sessionizeQuery,
      graft.operators.RelationalExt.sessionizeOracleSql),
    withOracle("stream_sliding_agg", slidingAggQuery,
      """WITH x AS (
        |  SELECT date_trunc('hour', ts) - to_hours(o) AS ws, value
        |  FROM events, UNNEST([0, 1]) AS t(o))
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
        |FROM x GROUP BY ws ORDER BY window_start""".stripMargin),
    withOracle("stream_dedup", streamDedupQuery,
      """SELECT event_id, event_type, value FROM events
        |ORDER BY event_id""".stripMargin),
    // New session iff gap > 30 min: Spark merges session windows that
    // merely TOUCH (an exactly-30-minute gap is one session — verified
    // against Spark 4.1.2 behavior, where [t, t+gap) merging treats
    // end == next start as mergeable).
    withOracle("stream_session_window", sessionWindowQuery,
      """WITH d AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS tu,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sid AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tu, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM d)
        |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sid GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin),
    withOracle("stream_stream_join", streamStreamJoinQuery,
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_sec
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin),
    // Same semantics, RocksDB state store: the identical oracle IS the
    // result-identity proof for the provider switch.
    withOracle("stream_stream_join_rocksdb", streamStreamJoinRocksDbQuery,
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
        |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_sec
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        |ORDER BY purchase_id, click_id""".stripMargin),
    withOracle("stream_static_join", streamStaticJoinQuery,
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""".stripMargin))
}
