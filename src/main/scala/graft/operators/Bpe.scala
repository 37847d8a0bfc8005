package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding tokenizer TRAINING over the documents table — the
  * "train the tokenizer on your corpus" step every pretraining pipeline
  * runs before budget accounting, plus the per-document token accounting
  * under the learned merges.
  *
  * Shape at scale (the production BPE-trainer shape — count first, loop
  * on the counts, never on the corpus):
  *   1. ONE corpus-scale aggregation: word -> occurrence count
  *      (map-side-combinable groupBy; the only shuffle that sees the
  *      corpus). The trainer keeps the top [[MaxTrainWords]] words by
  *      (count desc, word asc) — the standard frequency cutoff, bounding
  *      driver memory at a few hundred KB regardless of corpus size.
  *   2. The merge loop runs on that bounded word-frequency table on the
  *      driver: O(words x merges) string work on <= 4096 rows — the
  *      IVF-centroid / wordpiece-vocab bounded-training precedent. At
  *      100 TB the corpus never participates in an iteration; only the
  *      count table does.
  *   3. Encoding for accounting joins a DISTINCT-WORDS table (Heaps-law:
  *      grows ~ corpus^0.5, not linearly) mapped through the learned
  *      merges, then a broadcast-free equi-join back onto the exploded
  *      corpus — per-occurrence work is a join probe, not a re-encode.
  *
  * Semantics: classic Sennrich-style BPE. A word starts as its character
  * symbols plus a terminal [[EndMark]] symbol; each iteration merges the
  * adjacent pair with the highest occurrence-weighted count, ties broken
  * (left asc, right asc) so training is deterministic. Encoding replays
  * the merges in rank order (single left-to-right pass per merge).
  *
  * Oracles: the accounting queries are FULL hash checks — the trained
  * encode replays in DuckDB as nested symbol-aligned `replace` calls
  * over the recorded merge table ([[encodeExprSql]], the
  * recorded-artifact technique); only `text_bpe_merges` stays rows-only
  * (its output IS the artifact). `BpeSpec` pins the trainer against an
  * independent naive reimplementation on a fixture, the encoder against
  * its concatenation/monotonicity invariants, and the replace-replay
  * against [[encode]] on adversarial words.
  */
object Bpe {

  /** Frequency cutoff for the trainer: top words by (count desc, word
    * asc). Bounds the driver-side loop; tail words still get encoded
    * (the merge table generalizes to unseen words — that is BPE's
    * point). */
  val MaxTrainWords = 4096

  /** Number of merges to learn. Production vocabs run 30-100k; 64 keeps
    * the declared query cheap while exercising the full trainer path. */
  val NumMerges = 64

  /** Terminal symbol marking a word boundary, so "est" inside a word and
    * "est" ending a word learn separate units (the Sennrich convention). */
  val EndMark = "</w>"

  /** One learned merge: rank = iteration, the adjacent pair merged, and
    * the occurrence-weighted pair count that won the iteration. */
  final case class Merge(rank: Int, left: String, right: String,
      pairCount: Long)

  /** The ONE corpus-scale aggregation: (word, count), top
    * [[MaxTrainWords]] by (count desc, word asc). */
  def wordCounts(docs: DataFrame): Seq[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(MaxTrainWords)
      .as[(String, Long)].collect().toSeq
  }

  private def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndMark

  /** Train `numMerges` merges on a word-frequency table. Pair counts are
    * recomputed from the current symbol sequences each iteration —
    * O(total symbols) on <= [[MaxTrainWords]] words, simpler and easier
    * to audit than delta maintenance, and trivially cheap at this table
    * size. Stops early when no adjacent pair remains. */
  def trainMerges(wc: Seq[(String, Long)],
      numMerges: Int = NumMerges): Seq[Merge] = {
    var words: Seq[(Vector[String], Long)] =
      wc.map { case (w, c) => (symbols(w), c) }
    val out = Seq.newBuilder[Merge]
    var rank = 0
    while (rank < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) return out.result()
      val ((l, r), c) = counts.toSeq
        .minBy { case ((l, r), c) => (-c, l, r) }
      out += Merge(rank, l, r, c)
      words = words.map { case (syms, wc) => (mergeOnce(syms, l, r), wc) }
      rank += 1
    }
    out.result()
  }

  /** One left-to-right merge pass: adjacent (l, r) becomes l+r. A just-
    * merged symbol can immediately pair with the next one (standard BPE:
    * "aaa" under merge (a,a) -> ["aa", "a"], not ["aa", "aa"]). */
  private def mergeOnce(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Encode one word with the learned merges, replayed in rank order.
    * Works for words the trainer never saw — the merge table generalizes
    * by construction. */
  def encode(word: String, merges: Seq[Merge]): Vector[String] =
    merges.foldLeft(symbols(word)) { (syms, m) =>
      if (syms.length < 2) syms else mergeOnce(syms, m.left, m.right)
    }

  /** Separator wrapping every symbol in the SQL encode replay (U+001F —
    * absent from the corpus by audit; a corpus that ever contained it
    * would fail the differential gate loudly, not silently). */
  private val Sep = "\u001f"

  /** The learned merges for `dir`'s documents — trained once per corpus
    * per JVM ([[graft.StateCache]]) and shared by all four declared BPE
    * queries; records the SQL encode expression for the oracle replay
    * ([[encodeExprSql]]). */
  private[graft] def trainedMerges(s: SparkSession, dir: String): Seq[Merge] =
    graft.StateCache.cached(dir, "bpe/merges") {
      val m = trainMerges(wordCounts(Tables.documents(s, dir)))
      graft.OracleLiterals.put(BpeEncodeExprKey, encodeExprSql(m))
      m
    }

  private[graft] val BpeEncodeExprKey = "bpe_encode_expr"

  /** The ENTIRE trained encode as one DuckDB scalar expression over a
    * word column `w` (VERDICT r14 #7 — the lift that takes the token
    * accounting from rows-only to hash-green): a word becomes its
    * separator-wrapped symbol string `␟c₁␟␟c₂␟…␟</w>␟`, and each learned
    * merge in rank order becomes ONE `replace('␟l␟␟r␟' → '␟lr␟')`.
    * `replace` scans left-to-right, consumes non-overlapping matches,
    * and never re-examines its own output — exactly the [[mergeOnce]]
    * pass (skip past a merged pair, a just-merged symbol cannot re-pair
    * until the next merge). Wrapping makes matches symbol-aligned: a
    * match must start at a wrap character, `␟l␟` then forces the whole
    * symbol to equal `l` (the separator cannot occur inside symbols).
    * Token count = symbols = `len(string_split(s, '␟␟'))`. Caveat shared
    * with the engine side: symbols are Scala UTF-16 units vs DuckDB
    * codepoints — identical on this corpus (audited BMP-only), and any
    * divergence fails the hash compare rather than passing silently. */
  private[graft] def encodeExprSql(merges: Seq[Merge]): String = {
    def sq(x: String) = x.replace("'", "''")
    val base = "chr(31) || array_to_string(list_append(" +
      s"string_split(w, ''), '${sq(EndMark)}'), chr(31)||chr(31)) || chr(31)"
    merges.foldLeft(base) { (e, m) =>
      s"replace($e, '${sq(Sep + m.left + Sep + Sep + m.right + Sep)}', " +
        s"'${sq(Sep + m.left + m.right + Sep)}')"
    }
  }

  /** Shared oracle CTEs: whitespace words per doc (the `tokens` twin),
    * the distinct-word table, and per-word token counts through the
    * recorded encode expression. */
  private def wordTokenCtes: String =
    s"""words AS (SELECT doc_id, tok AS w
       |    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
       |          FROM documents)
       |    WHERE len(tok) > 0),
       |dw AS (SELECT DISTINCT w FROM words),
       |wt AS (SELECT w, CAST(len(string_split(
       |      ${graft.OracleLiterals.get(BpeEncodeExprKey)},
       |      chr(31)||chr(31))) AS BIGINT) AS n_word_tokens
       |  FROM dw),
       |stats AS (SELECT wo.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(t.n_word_tokens) AS BIGINT) AS n_bpe_tokens
       |  FROM words wo JOIN wt t ON t.w = wo.w
       |  GROUP BY wo.doc_id)""".stripMargin

  private def tokenStatsOracleSql: String =
    s"""WITH $wordTokenCtes
       |SELECT doc_id, n_words, n_bpe_tokens FROM stats
       |ORDER BY doc_id""".stripMargin

  private def fertilityOracleSql: String =
    s"""WITH $wordTokenCtes,
       |by_source AS (SELECT d.source,
       |    CAST(SUM(s.n_words) AS BIGINT) AS n_words,
       |    CAST(SUM(s.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens
       |  FROM stats s JOIN documents d USING (doc_id)
       |  GROUP BY d.source)
       |SELECT src.source,
       |  COALESCE(b.n_words, CAST(0 AS BIGINT)) AS n_words,
       |  COALESCE(b.n_bpe_tokens, CAST(0 AS BIGINT)) AS n_bpe_tokens,
       |  CASE WHEN COALESCE(b.n_words, 0) > 0
       |       THEN CAST(b.n_bpe_tokens AS DOUBLE) / b.n_words
       |       ELSE 0.0 END AS fertility
       |FROM (SELECT DISTINCT source FROM documents) src
       |LEFT JOIN by_source b USING (source)
       |ORDER BY source""".stripMargin

  /** Declared query — the learned merge table itself, the artifact a
    * tokenizer trainer ships: (rank, left, right, merged, pair_count). */
  def bpeMergesQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainedMerges(s, dir)
      .map(m => (m.rank, m.left, m.right, m.left + m.right, m.pairCount))
      .toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy(col("rank"))
  }

  /** Declared query — per-document token accounting under the learned
    * tokenizer: the budget number a trainer plans against. Encodes the
    * DISTINCT words once (Heaps-law table, merges in the task closure),
    * then joins the counts back onto the exploded corpus — at scale the
    * per-word encode cost amortizes over every occurrence. */
  def bpeTokenStatsQuery(s: SparkSession, dir: String): DataFrame =
    tokenStatsOver(Tables.documents(s, dir), trainedMerges(s, dir))
      .orderBy(col("doc_id"))

  /** Per-doc accounting for one document frame against FROZEN merges —
    * the unit both the batch query and the streaming twin score with.
    * Per-doc work is independent of every other doc, so the result is
    * batch-boundary invariant by construction. */
  private[graft] def tokenStatsOver(docs: DataFrame,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val wordTokens = words.select(col("w")).distinct()
      .as[String]
      .map(w => (w, encode(w, merges).length.toLong))
      .toDF("w", "n_word_tokens")
    words.join(wordTokens, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_word_tokens")).as("n_bpe_tokens"))
  }

  /** Declared query — tokenizer FERTILITY per source: BPE tokens per
    * whitespace word, the number a multilingual/multi-domain corpus
    * owner reads before fixing a tokenizer (a source with fertility 2×
    * the rest pays twice the context budget per word — the standard
    * reason to retrain or rebalance the merge table). Derived from the
    * same frozen-merge per-doc accounting as [[bpeTokenStatsQuery]];
    * the aggregate is one map-side-combined groupBy on the tiny source
    * key, and fertility is one division of two exact BIGINTs. */
  def bpeFertilityQuery(s: SparkSession, dir: String): DataFrame =
    fertilityOver(Tables.documents(s, dir), trainedMerges(s, dir))

  /** The per-source fertility body over any documents frame — factored
    * so the all-empty-source totality case is spec-testable. */
  private[graft] def fertilityOver(docs: DataFrame,
      merges: Seq[Merge]): DataFrame = {
    // Totality guard: tokenStatsOver emits NO row for a document with no
    // non-empty words, so a source whose documents are ALL empty would
    // silently vanish from the readout (an inner join cannot resurrect
    // it). The source universe comes from the documents table and the
    // stats left-join onto it — an all-empty source shows up as
    // (0 words, 0 tokens, fertility 0.0) instead of disappearing, which
    // is what "keep the readout total" actually requires. The n_words>0
    // branch then guards the division for exactly that row.
    val bySource = tokenStatsOver(docs, merges)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
    docs.select(col("source")).distinct()
      .join(bySource, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .select(col("source"), col("n_words"), col("n_bpe_tokens"),
        when(col("n_words") > 0,
          col("n_bpe_tokens").cast("double") / col("n_words"))
          .otherwise(lit(0.0)).as("fertility"))
      .orderBy(col("source"))
  }

  /** Declared query — the token accounting run IN-STREAM (the
    * stream_lm_score convention): merges trained ONCE from the static
    * corpus, each arriving micro-batch scored against the frozen merge
    * table and appended to a batch-id-keyed overwrite dir (idempotent
    * replay). Scoring is per-doc against frozen state, so the drained
    * output equals [[bpeTokenStatsQuery]] row-for-row — the tokenizer
    * is trained offline, the budget accounting keeps up with arrival
    * (pinned, including a forced two-batch split, in BpeSpec). */
  def streamBpeTokenStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val outDir = graft.TempDirs.scoped("graft_sbpe_out")
    val ckpt = graft.TempDirs.scoped("graft_sbpe_ckpt")
    val staticDocs = Tables.documents(spark, dir)
    val merges = trainedMerges(spark, dir)
    val stream = spark.readStream.schema(staticDocs.schema)
      .parquet(graft.Tables.streamGlob(dir, "documents"))
    graft.streaming.MicroBatchPipeline.withBatchSizedShuffle(spark) {
      stream.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          tokenStatsOver(batch.toDF(), merges)
            .write.mode("overwrite").parquet(s"$outDir/b$batchId")
          ()
        }
        .start()
        .awaitTermination()
    }
    spark.read.parquet(s"$outDir/b*").orderBy(col("doc_id"))
  }

  import QuerySpec.{rowsOnly, withOracle}

  val specs: Seq[QuerySpec] = Seq(
    // text_bpe_merges stays rows-only by design: its OUTPUT is the
    // trained artifact itself, so a recorded-literal oracle would only
    // check serialization (the sim_pca_variance argument); BpeSpec's
    // independent-trainer pin is the real check. The three ACCOUNTING
    // queries replay the recorded encode expression in SQL — full
    // hash-green (VERDICT r14 #7); the streaming twin shares the batch
    // oracle text verbatim (batch-boundary invariance).
    rowsOnly("text_bpe_merges", bpeMergesQuery),
    withOracle("text_bpe_token_stats", bpeTokenStatsQuery,
      tokenStatsOracleSql),
    withOracle("text_bpe_fertility", bpeFertilityQuery, fertilityOracleSql),
    withOracle("stream_bpe_token_stats", streamBpeTokenStatsQuery,
      tokenStatsOracleSql))
}
