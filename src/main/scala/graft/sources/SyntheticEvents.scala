package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector: a deterministic synthetic event feed — the
  * reference's HTTP ingest (O1, `bpi_crawler.py:43-52`) generalized into a
  * proper Spark source instead of a driver-side fetch loop. Demonstrates
  * the full connector contract the engine's real feeds would implement:
  *
  *   - split planning: `rows` split into `numPartitions` contiguous id
  *     ranges, each an independent `InputPartition` (executor-parallel);
  *   - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): readers emit
  *     only requested fields;
  *   - FILTER PUSHDOWN (`SupportsPushDownFilters`): event_id range
  *     predicates narrow the generated id range BEFORE planning, so
  *     partitions outside the range are never created (the DSv2 analogue
  *     of partition pruning); other predicates stay in Spark.
  *   - AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`): global
  *     COUNT(*) / MIN(event_id) / MAX(event_id) answer from the
  *     filter-narrowed range alone — COMPLETE pushdown, one emitted row,
  *     no aggregate exchange in the plan (the metadata-only-query
  *     analogue of parquet footer counts); grouped or non-id aggregates
  *     refuse and fall back to the row scan.
  *
  * Usage: `spark.read.format("graft.sources.SyntheticEvents")
  *   .option("rows", 10000).option("numPartitions", 8).load()`
  */
class SyntheticEvents extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticEventsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("numPartitions", "4").toInt)
}

object SyntheticEvents {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val eventTypes: Array[String] =
    Array("view", "click", "purchase", "signup", "error")

  /** Deterministic per-id row content (split-mix style avalanche — stable
    * across executors, retries and engines). */
  def mix(id: Long): Long = {
    var z = id + -7046029254386353131L
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }
}

final class SyntheticEventsTable(rows: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_events($rows)"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticEventsScanBuilder(rows, numPartitions,
      options.getLong("maxRowsPerBatch", 0L))
}

final class SyntheticEventsScanBuilder(rows: Long, numPartitions: Int,
    maxRowsPerBatch: Long = 0L)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var requiredSchema: StructType = SyntheticEvents.schema
  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None

  // -------------------------------------------------------------------
  // AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`): global COUNT(*) /
  // MIN(event_id) / MAX(event_id) are answerable from the (already
  // filter-narrowed) id range ALONE — the scan returns one row and reads
  // nothing, the DSv2 analogue of metadata-only queries over parquet
  // footers. Complete pushdown (not partial): the single emitted row IS
  // the final answer, so Spark plans a project over the scan, no
  // aggregate exchange at all. Grouped or non-id aggregates are refused
  // and fall back to the normal row scan.
  // -------------------------------------------------------------------

  private def isEventId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("event_id"))
      case _ => false
    }

  private def canPush(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().nonEmpty &&
      agg.aggregateExpressions().forall {
        case _: CountStar => true
        case m: Min => isEventId(m.column)
        case m: Max => isEventId(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPush(agg)) return false
    pushedAgg = Some(agg)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  /** Accept event_id range predicates (narrowing [lo, hi)); everything
    * else is left for Spark to evaluate post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("event_id", _: Long) => true
      case GreaterThan("event_id", _: Long) => true
      case GreaterThanOrEqual("event_id", _: Long) => true
      case LessThan("event_id", _: Long) => true
      case LessThanOrEqual("event_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("event_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = pushedAgg match {
    case Some(agg) =>
      new SyntheticEventsAggScan(lo, math.max(lo, hi), agg)
    case None =>
      new SyntheticEventsScan(requiredSchema, lo, math.max(lo, hi), numPartitions,
        maxRowsPerBatch)
  }
}

/** Metadata-only scan for a completely-pushed global aggregation: one
  * partition, one row, values derived from the [lo, hi) range — COUNT(*)
  * = hi−lo, MIN/MAX(event_id) = the range endpoints (null on an empty
  * range, the SQL semantics for min/max over zero rows). */
final class SyntheticEventsAggScan(lo: Long, hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate._

  private val n = math.max(0L, hi - lo)

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions().zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })

  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticEvents[agg=${agg.aggregateExpressions().map(_.describe()).mkString(",")}, range=[$lo,$hi)]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(IdRangePartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions().map {
      case _: CountStar => n: java.lang.Long
      case _: Min => if (n == 0) null else (lo: java.lang.Long)
      case _: Max => if (n == 0) null else (hi - 1): java.lang.Long
      case other => throw new IllegalStateException(other.describe())
    }
    new SingleRowReaderFactory(values)
  }
}

/** STREAMING read path (`MicroBatchStream` + `SupportsAdmissionControl`):
  * the id sequence doubles as the offset log — an offset IS the next
  * unread id, so offsets serialize as plain longs, restart resumes from
  * the checkpointed id with no source-side state, and replanning a batch
  * regenerates identical rows (deterministic content ⇒ exactly-once with
  * any idempotent sink). `maxRowsPerBatch` bounds each micro-batch via
  * admission control — under AvailableNow the drain takes ceil(n/max)
  * batches, the reference's poll-loop cadence made declarative. */
final case class IdOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

final class SyntheticEventsMicroBatchStream(requiredSchema: StructType,
    lo: Long, hi: Long, numPartitions: Int, maxRowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}

  // The available horizon is static (an id range), so preparing for
  // AvailableNow needs no snapshot — the drain target is always `hi`.
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): SOffset = IdOffset(lo)
  override def latestOffset(): SOffset = IdOffset(hi)
  override def deserializeOffset(json: String): SOffset = IdOffset(json.toLong)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()

  override def latestOffset(startOffset: SOffset, limit: ReadLimit): SOffset = {
    val start = startOffset.asInstanceOf[IdOffset].id
    limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        IdOffset(math.min(start + m.maxRows(), hi))
      case _ => IdOffset(hi)
    }
  }

  override def reportLatestOffset(): SOffset = IdOffset(hi)

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[IdOffset].id
    val e = end.asInstanceOf[IdOffset].id
    val n = e - s
    if (n <= 0) return Array.empty
    val parts = math.min(numPartitions.toLong, n).toInt
    (0 until parts).map { i =>
      IdRangePartition(s + i * n / parts, s + (i + 1) * n / parts): InputPartition
    }.filter { case IdRangePartition(a, b) => b > a }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticEventsReaderFactory(requiredSchema)
}

/** Emits exactly one row holding precomputed values (serializable —
  * shipped to the executor that runs the single partition). */
final class SingleRowReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          values.clone())
      override def close(): Unit = ()
    }
}

final case class IdRangePartition(start: Long, end: Long) extends InputPartition

final class SyntheticEventsScan(requiredSchema: StructType, lo: Long, hi: Long,
    numPartitions: Int, maxRowsPerBatch: Long = 0L) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SyntheticEventsMicroBatchStream(requiredSchema, lo, hi, numPartitions,
      maxRowsPerBatch)
  override def description(): String =
    s"SyntheticEvents[range=[$lo,$hi), cols=${requiredSchema.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    // Contradictory pushed ranges (or rows=0) legitimately plan to zero
    // partitions — never fabricate a row for an empty range.
    if (n <= 0) return Array.empty
    val parts = math.min(numPartitions.toLong, n).toInt
    (0 until parts).map { i =>
      val start = lo + i * n / parts
      val end = lo + (i + 1) * n / parts
      IdRangePartition(start, end): InputPartition
    }.filter { case IdRangePartition(s, e) => e > s }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticEventsReaderFactory(requiredSchema)
}

final class SyntheticEventsReaderFactory(requiredSchema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val IdRangePartition(start, end) = partition
    new PartitionReader[InternalRow] {
      private var id = start - 1
      // Column pruning realized here: one generator per REQUESTED field.
      private val gens: Array[Long => Any] = requiredSchema.fieldNames.map {
        case "event_id" => (i: Long) => i
        case "user_id" => (i: Long) =>
          java.lang.Math.floorMod(SyntheticEvents.mix(i), 1000L)
        case "event_type" => (i: Long) => UTF8String.fromString(
          SyntheticEvents.eventTypes(
            java.lang.Math.floorMod(SyntheticEvents.mix(i + 1), 5L).toInt))
        case "value" => (i: Long) =>
          java.lang.Math.floorMod(SyntheticEvents.mix(i + 2), 10000L) / 100.0
        case other => throw new IllegalArgumentException(other)
      }

      // Reused row buffer: zero per-row allocation in the scan loop
      // (beyond the values themselves).
      private val row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(gens.length)

      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow = {
        var i = 0
        while (i < gens.length) { row.update(i, gens(i)(id)); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
  }
}
