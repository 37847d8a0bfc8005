package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Unigram}

class UnigramSpec extends SparkSpec {

  test("planted corpus: the repeated bigram becomes a piece and wins segmentation") {
    // "abab" dominates; the trainer must keep a multi-char piece for it
    // and Viterbi must use it (fewer pieces than characters)
    val wc = Seq(("abab", 100L), ("ab", 50L), ("cd", 3L))
    val vocab = Unigram.trainVocab(wc)
    val pieces = vocab.map(_.piece).toSet
    assert(pieces.contains("abab") || pieces.contains("ab"))
    val seg = Unigram.encode("abab", vocab)
    assert(seg.mkString == "abab")
    assert(seg.length < 4, s"expected multi-char pieces, got $seg")
    // ranks are dense and ordered by (count desc, piece asc)
    assert(vocab.map(_.rank) == vocab.indices)
    assert(vocab.sliding(2).forall {
      case Seq(a, b) => a.count > b.count ||
        (a.count == b.count && a.piece < b.piece)
      case _ => true
    })
  }

  test("closure and conservation: every word encodes and round-trips") {
    val wc = Bpe.wordCounts(Tables.documents(spark, sf))
    val vocab = Unigram.trainVocab(wc)
    // single-character closure over the training inventory
    val chars = wc.flatMap(_._1.toSeq).map(_.toString).toSet
    val vocabSet = vocab.map(_.piece).toSet
    assert(chars.subsetOf(vocabSet),
      s"missing chars: ${chars.diff(vocabSet)}")
    // conservation: pieces concatenate back to the word, even for a
    // word the trainer never saw (unknown chars fall back)
    (wc.take(50).map(_._1) :+ "zzq[unseen]w0rd").foreach { w =>
      val seg = Unigram.encode(w, vocab)
      assert(seg.mkString == w, s"$w -> $seg")
      assert(seg.nonEmpty && seg.forall(_.nonEmpty))
    }
  }

  test("token stats: bounds hold and the bake-off is populated") {
    val stats = Unigram.tokenStatsQuery(spark, sf).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      // at least one piece per word; at most one piece per character
      assert(r.getLong(2) >= r.getLong(1))
    }
    val cmp = Unigram.tokenizerCompareQuery(spark, sf).collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(r.getDouble(4) >= 1.0 - 1e-9)
      assert(r.getDouble(5) >= 1.0 - 1e-9)
    }
  }
}
