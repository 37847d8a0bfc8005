package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the decode / feature-extract / frame-sample
  * operators a training-data pipeline runs over them.
  *
  * The container has no media codecs, so the DECODE STEP IS A STUB — a
  * deterministic fake clearly marked below — while everything Spark-side
  * is real and tested: the binary+struct schema, partition-parallel batch
  * processing via mapPartitions (one JVM-side batch per partition, the
  * Scala analogue of an Arrow-batched pandas UDF), frame slicing with
  * binary substring arithmetic, and metadata queries that stay in
  * whole-stage codegen. At 100 TB the payload column dominates I/O: these
  * plans only project `payload` in operators that need the bytes, so
  * metadata-only queries read a few KB of parquet column chunks per file.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      mime: String, source: String)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      feat: Array[Float], feat_norm: Double)

  val kinds = Seq("image", "audio", "video")
  val mimes = Map("image" -> "image/jpeg", "audio" -> "audio/wav", "video" -> "video/mp4")

  /** Synthesize the media table from documents: the text bytes stand in
    * for encoded media; kind/mime cycle deterministically. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(kinds.map(lit): _*), (col("doc_id") % 3 + 1).cast("int"))
        .as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))

  /** Metadata + payload-prefix stats — pure codegen, no UDF: the query a
    * corpus owner runs constantly, and it must not decode anything. */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      hex(substring(col("payload"), 1, 8)).as("head_hex"))
      .orderBy(col("media_id"))

  /** Frame sampling: slice the payload into 4 equal-length frames (binary
    * substring arithmetic — for real video this is the keyframe-offset
    * computation; the byte-slicing plumbing is identical). */
  val NumFrames = 4

  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(s, dir)
      .withColumn("frame_len", (length(col("payload")) / NumFrames).cast("int"))
    media.select(
        col("media_id"),
        posexplode(array((0 until NumFrames).map(i =>
          col("payload").substr(col("frame_len") * i + 1, col("frame_len"))): _*))
          .as(Seq("frame_id", "frame")))
      .select(col("media_id"), col("frame_id").cast("long").as("frame_id"),
        length(col("frame")).cast("long").as("frame_bytes"),
        hex(substring(col("frame"), 1, 4)).as("frame_head_hex"))
      .orderBy(col("media_id"), col("frame_id"))
  }

  /** Decode + feature-extract over partition-local batches. The inner
    * `decodeAndEmbed` is the STUB: a real deployment swaps in the codec
    * (JPEG decode, PCM resample, frame grab) without touching the Spark
    * plumbing around it. */
  def extractFeatures(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    val FeatDim = 8

    // ---- STUB: deterministic fake decoder ------------------------------
    // Real impl: decode payload with a codec, run a feature model.
    // Fake: FeatDim byte-bucket means over the payload — deterministic,
    // batch-shaped like the real thing (bytes in, float vector out).
    // Mean computed in double then narrowed to float: double arithmetic
    // is what SQL engines speak, so the fake stays oracle-reproducible.
    def decodeAndEmbed(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatDim)
      if (payload.nonEmpty) {
        val bucket = math.max(1, payload.length / FeatDim)
        var i = 0
        while (i < FeatDim) {
          var sum = 0L
          var n = 0
          var j = i * bucket
          while (j < math.min((i + 1) * bucket, payload.length)) {
            sum += payload(j) & 0xff; n += 1; j += 1
          }
          out(i) = if (n == 0) 0f else (sum.toDouble / n).toFloat
          i += 1
        }
      }
      out
    }
    // --------------------------------------------------------------------

    mediaTable(s, dir)
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          val feat = decodeAndEmbed(payload)
          val norm = math.sqrt(feat.map(f => f.toDouble * f).sum)
          MediaFeatures(id, kind, payload.length.toLong, feat, norm)
        }
      }
  }

  final case class ResizedMedia(media_id: Long, n_bytes: Long,
      resized_bytes: Long, resized_head: Array[Byte])

  /** Resize / downsample: keep every `stride`-th payload byte — for real
    * images this is the decode→scale→re-encode step; the byte-stride STUB
    * keeps the same batch shape (bytes in, smaller bytes out) and runs in
    * the same partition-local mapPartitions path a codec would. */
  val ResizeStride = 4

  def resize(s: SparkSession, dir: String): Dataset[ResizedMedia] = {
    import s.implicits._
    mediaTable(s, dir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          // ---- STUB: byte-stride downsample (real impl: codec resize) ----
          val resized = new Array[Byte]((payload.length + ResizeStride - 1) / ResizeStride)
          var i = 0
          while (i < resized.length) { resized(i) = payload(i * ResizeStride); i += 1 }
          ResizedMedia(id, payload.length.toLong, resized.length.toLong,
            resized.take(8))
        }
      }
  }

  def resizeQuery(s: SparkSession, dir: String): DataFrame =
    resize(s, dir).toDF()
      .select(col("media_id"), col("n_bytes"), col("resized_bytes"),
        hex(col("resized_head")).as("resized_head_hex"))
      .orderBy(col("media_id"))

  def featuresQuery(s: SparkSession, dir: String): DataFrame =
    extractFeatures(s, dir).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("feat_norm"))
      .orderBy(col("media_id"))

  import graft.QuerySpec.withOracle

  val specs: Seq[QuerySpec] = Seq(
    // DuckDB lacks substring over BLOB; slicing the full hex string is
    // byte-equivalent (2 hex chars per byte).
    withOracle("mm_media_stats", mediaStats,
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  substring(hex(encode(text)), 1, 16) AS head_hex
        |FROM documents ORDER BY media_id""".stripMargin),
    withOracle("mm_frame_sample", frameSample,
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS payload_hex,
        |    CAST(octet_length(encode(text)) // 4 AS INT) AS frame_len
        |  FROM documents)
        |SELECT media_id, CAST(f.i AS BIGINT) AS frame_id,
        |  CAST(frame_len AS BIGINT) AS frame_bytes,
        |  substring(payload_hex, frame_len * 2 * CAST(f.i AS INT) + 1, 8) AS frame_head_hex
        |FROM m, (SELECT UNNEST(generate_series(0, 3)) AS i) f
        |ORDER BY media_id, frame_id""".stripMargin),
    withOracle("mm_resize", resizeQuery,
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n FROM documents),
        |head AS (SELECT media_id,
        |    string_agg(substr(h, 2*(4*CAST(j AS INT))+1, 2), '' ORDER BY j) AS head_hex
        |  FROM m, UNNEST(generate_series(0, 7)) AS g(j)
        |  WHERE 4*j < n GROUP BY media_id)
        |SELECT m.media_id, CAST(m.n AS BIGINT) AS n_bytes,
        |  CAST((m.n + 3) // 4 AS BIGINT) AS resized_bytes,
        |  COALESCE(head.head_hex, '') AS resized_head_hex
        |FROM m LEFT JOIN head USING (media_id) ORDER BY media_id""".stripMargin),
    // The stub decoder's math is deliberately double-precision SQL algebra,
    // so even the "decode" path gets a full differential oracle: byte
    // extraction via hex-string slicing, bucket means in double narrowed
    // to REAL, norm as the same sequential double fold Spark runs.
    withOracle("mm_feature_extract", featuresQuery,
      """WITH m AS (SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    hex(encode(text)) AS h, octet_length(encode(text)) AS n FROM documents),
        |grid AS (SELECT media_id, kind, n, greatest(1, n // 8) AS bucket, i, h
        |         FROM m, UNNEST(generate_series(0, 7)) AS a(i)),
        |jrows AS (SELECT media_id, i,
        |    (concat('0x', substr(h, 2*CAST(j AS INT)+1, 2)))::INT AS byte
        |  FROM grid, UNNEST(generate_series(bucket*i, least(bucket*(i+1), n)-1)) AS b(j)),
        |sums AS (SELECT media_id, i, SUM(byte) AS s, COUNT(*) AS c FROM jrows GROUP BY 1, 2),
        |feats AS (SELECT g.media_id, g.i,
        |    CAST(COALESCE(CAST(s.s AS DOUBLE)/s.c, 0) AS REAL) AS f
        |  FROM grid g LEFT JOIN sums s ON g.media_id = s.media_id AND g.i = s.i),
        |norms AS (SELECT media_id,
        |    sqrt(list_sum(list_transform(list(f ORDER BY i), x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS feat_norm
        |  FROM feats GROUP BY media_id)
        |SELECT m.media_id, m.kind, CAST(m.n AS BIGINT) AS n_bytes, norms.feat_norm
        |FROM m JOIN norms USING (media_id) ORDER BY media_id""".stripMargin))
}
