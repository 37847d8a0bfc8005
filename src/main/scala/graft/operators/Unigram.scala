package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions.tokens

/** Unigram-LM tokenizer (the SentencePiece unigram model, Kudo 2018) —
  * the third tokenizer family next to [[Bpe]] (merge-based) and the
  * wordpiece vocab in [[TextAnalysis]] (greedy longest-match): a piece
  * VOCABULARY with probabilities, trained by EM, segmenting each word as
  * the maximum-likelihood piece sequence (Viterbi). Implemented as the
  * deterministic hard-EM (Viterbi-EM) variant: the E-step re-segments
  * the bounded word table under current piece probabilities, the M-step
  * re-estimates probabilities from the winning segmentations, and
  * pieces that stop winning fall out of the vocabulary — the standard
  * prune-by-disuse dynamic at declared-query scale.
  *
  * Trainer discipline follows the repo's bounded-driver-training
  * precedent (BPE merges, IVF centroids, wordpiece vocab): ONE
  * corpus-scale aggregation ([[Bpe.wordCounts]], top 4096 words),
  * driver-side EM over that table, then distributed scoring against the
  * FROZEN vocabulary by encoding each DISTINCT word once and joining
  * back — at 100 TB the corpus is touched by exactly one word-count
  * shuffle and one distinct-word encode, never per-EM-iteration.
  *
  * Determinism: single-threaded EM, strict-improvement Viterbi with a
  * fixed scan order (longer piece wins ties), add-one smoothing so no
  * probability is ever zero, and (count desc, piece asc) orderings
  * everywhere a cut is taken. Declared queries are rows-only (the
  * vocabulary is data-trained — the BPE/wordpiece convention), pinned
  * by planted-corpus segmentations and closure/conservation invariants
  * in UnigramSpec.
  */
object Unigram {

  /** Longest candidate piece. Substring generation is O(words ·
    * [[MaxPieceLen]]²) on the bounded table. */
  val MaxPieceLen = 6

  /** Seed vocabulary size (most frequent substrings), before EM. */
  val SeedVocabSize = 512

  /** Final vocabulary size after EM pruning; single characters are
    * always retained on top so every word stays encodable. */
  val VocabSize = 256

  /** Hard-EM iterations — enough for the piece inventory to settle on
    * the bounded word table (UnigramSpec pins a planted convergence). */
  val EmIters = 3

  /** One vocabulary entry: rank by (count desc, piece asc), the piece,
    * and its final Viterbi-weighted occurrence count. */
  final case class Piece(rank: Int, piece: String, count: Long)

  /** Seed pieces: every substring (length 1..[[MaxPieceLen]]) of every
    * training word, occurrence-weighted; top [[SeedVocabSize]] plus ALL
    * single characters (the encodability closure). */
  private[graft] def seedPieces(wc: Seq[(String, Long)]): Seq[(String, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(i + MaxPieceLen, w.length)) {
          val p = w.substring(i, j)
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
        i += 1
      }
    }
    val ordered = counts.toSeq.sortBy { case (p, c) => (-c, p) }
    val top = ordered.take(SeedVocabSize)
    val topSet = top.map(_._1).toSet
    top ++ ordered.filter { case (p, _) =>
      p.length == 1 && !topSet.contains(p)
    }
  }

  /** Maximum-likelihood segmentation of one word under piece log-probs.
    * Scan order fixes ties deterministically: candidate start positions
    * run longest-piece-first and only a STRICT improvement replaces the
    * incumbent, so equal-likelihood splits resolve to the longest
    * leading piece. Unknown single characters fall back to `floor`
    * (strictly below any real piece), so every word is encodable. */
  private[graft] def viterbi(word: String,
      logp: scala.collection.Map[String, Double],
      floor: Double): Vector[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val s = logp.get(piece) match {
            case Some(lp) => best(j) + lp
            case None if i - j == 1 => best(j) + floor
            case None => Double.NegativeInfinity
          }
          if (s > best(i)) { best(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    var k = n
    val rev = List.newBuilder[String]
    while (k > 0) { rev += word.substring(back(k), k); k = back(k) }
    rev.result().reverse.toVector
  }

  /** Add-one-smoothed log-probability table over a count inventory. */
  private def logProbs(counts: Seq[(String, Long)])
      : (Map[String, Double], Double) = {
    val total = counts.map(_._2).sum.toDouble + counts.size + 1
    (counts.map { case (p, c) => p -> math.log((c + 1) / total) }.toMap,
      math.log(0.5 / total))
  }

  /** Hard-EM training over the bounded word table: segment under the
    * current inventory, recount, re-close over single characters, prune
    * to the final vocabulary at the end. */
  def trainVocab(wc: Seq[(String, Long)]): Seq[Piece] = {
    var counts = seedPieces(wc)
    val charClosure = counts.map(_._1).filter(_.length == 1).distinct
    var iter = 0
    while (iter < EmIters) {
      val (lp, floor) = logProbs(counts)
      val next = scala.collection.mutable.Map.empty[String, Long]
      wc.foreach { case (w, c) =>
        viterbi(w, lp, floor).foreach { p =>
          next(p) = next.getOrElse(p, 0L) + c
        }
      }
      charClosure.foreach(ch =>
        if (!next.contains(ch)) next(ch) = 0L)
      counts = next.toSeq.sortBy { case (p, c) => (-c, p) }
      iter += 1
    }
    val top = counts.take(VocabSize)
    val topSet = top.map(_._1).toSet
    val full = top ++ counts.filter { case (p, _) =>
      p.length == 1 && !topSet.contains(p)
    }
    full.sortBy { case (p, c) => (-c, p) }
      .zipWithIndex
      .map { case ((p, c), r) => Piece(r, p, c) }
  }

  /** Encode one word against a FROZEN vocabulary (Viterbi under the
    * final smoothed probabilities). */
  def encode(word: String, vocab: Seq[Piece]): Vector[String] = {
    val (lp, floor) = logProbs(vocab.map(p => (p.piece, p.count)))
    viterbi(word, lp, floor)
  }

  /** Declared query — the trained vocabulary itself, the artifact a
    * tokenizer trainer ships: (rank, piece, piece_len, n_count). */
  def vocabQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainVocab(Bpe.wordCounts(Tables.documents(s, dir)))
      .map(p => (p.rank.toLong, p.piece, p.piece.length.toLong, p.count))
      .toDF("rank", "piece", "piece_len", "n_count")
      .orderBy(col("rank"))
  }

  /** Per-doc accounting against a frozen vocabulary — the unigram twin
    * of [[Bpe.tokenStatsOver]]: each DISTINCT word encodes once, the
    * corpus joins back. Batch-boundary invariant by construction. */
  private[graft] def tokenStatsOver(docs: DataFrame,
      vocab: Seq[Piece]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val wordTokens = words.select(col("w")).distinct()
      .as[String]
      .map(w => (w, encode(w, vocab).length.toLong))
      .toDF("w", "n_word_pieces")
    words.join(wordTokens, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_word_pieces")).as("n_unigram_tokens"))
  }

  /** Declared query — per-doc token counts under the unigram model. */
  def tokenStatsQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    tokenStatsOver(docs, trainVocab(Bpe.wordCounts(docs)))
      .orderBy(col("doc_id"))
  }

  /** Declared query — the TOKENIZER BAKE-OFF: per source, fertility
    * (tokens per whitespace word) under the BPE merge table AND the
    * unigram vocabulary, both trained on the same corpus — the
    * side-by-side a corpus owner reads before picking a tokenizer
    * family (fertility gaps between sources are budget skew; fertility
    * gaps between FAMILIES on one source are a modeling choice). Both
    * sides reuse their family's frozen-artifact scoring path; the
    * comparison adds one join and a tiny per-source aggregate. */
  def tokenizerCompareQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val wc = Bpe.wordCounts(docs)
    val bpe = Bpe.tokenStatsOver(docs, Bpe.trainMerges(wc))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
    val uni = tokenStatsOver(docs, trainVocab(wc))
      .select(col("doc_id"), col("n_unigram_tokens"))
    // Totality: per-doc stats drop all-empty docs, so the source
    // universe left-joins the rollup (the fertilityOver guard) — an
    // all-empty source reads as zeros, not as a missing row.
    val bySource = bpe.join(uni, "doc_id")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        sum(col("n_unigram_tokens")).as("n_unigram_tokens"))
    docs.select(col("source")).distinct()
      .join(bySource, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("n_unigram_tokens"), lit(0L)).as("n_unigram_tokens"))
      .select(col("source"), col("n_words"), col("n_bpe_tokens"),
        col("n_unigram_tokens"),
        when(col("n_words") > 0,
          col("n_bpe_tokens").cast("double") / col("n_words"))
          .otherwise(lit(0.0)).as("fertility_bpe"),
        when(col("n_words") > 0,
          col("n_unigram_tokens").cast("double") / col("n_words"))
          .otherwise(lit(0.0)).as("fertility_unigram"))
      .orderBy(col("source"))
  }

  import QuerySpec.rowsOnly

  val specs: Seq[QuerySpec] = Seq(
    rowsOnly("text_unigram_vocab", vocabQuery),
    rowsOnly("text_unigram_tokens", tokenStatsQuery),
    rowsOnly("text_tokenizer_compare", tokenizerCompareQuery))
}
