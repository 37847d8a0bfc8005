package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Pins for the BPE tokenizer trainer (rows-only declared queries
  * text_bpe_merges / text_bpe_token_stats): the trainer against an
  * independent naive reimplementation on the classic fixture, the
  * encoder against its structural invariants, and the declared queries
  * against hand-replayable accounting. */
class BpeSpec extends SparkSpec {

  /** Independent reference trainer, written the dumb way: symbol
    * sequences as Lists, pair counts via groupBy on a flat pair list,
    * merges applied by recursive rewrite — no code shared with
    * [[Bpe.trainMerges]] beyond the Merge shape. */
  private def refTrain(wc: Seq[(String, Long)],
      n: Int): Seq[(String, String, Long)] = {
    def merge(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r => (l + r) :: merge(rest, l, r)
        case a :: rest => a :: merge(rest, l, r)
        case Nil => Nil
      }
    var words = wc.map { case (w, c) =>
      (w.map(_.toString).toList :+ Bpe.EndMark, c)
    }
    (0 until n).flatMap { _ =>
      val pairs = words.flatMap { case (syms, c) =>
        syms.zip(syms.drop(1)).map(p => (p, c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (pairs.isEmpty) None
      else {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        words = words.map { case (syms, wc) => (merge(syms, l, r), wc) }
        Some((l, r, c))
      }
    }
  }

  // the Sennrich paper's fixture family: est</w> dominates, then lo
  private val fixture = Seq[(String, Long)](
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))

  test("trainer equals the independent naive reference on the fixture") {
    val got = Bpe.trainMerges(fixture, 8)
      .map(m => (m.left, m.right, m.pairCount))
    val ref = refTrain(fixture, 8)
    assert(got == ref)
    // first merges are the textbook ones: (e,s) at 9, then (es,t) at 9,
    // then (est,</w>) at 9
    assert(got.take(3) == Seq(("e", "s", 9L), ("es", "t", 9L),
      ("est", Bpe.EndMark, 9L)))
  }

  test("one merge pass is left-to-right: aaa under (a,a) -> [aa, a]") {
    val m = Seq(Bpe.Merge(0, "a", "a", 1L))
    assert(Bpe.encode("aaa", m) == Vector("aa", "a", Bpe.EndMark))
  }

  test("SQL replace-replay of the encode equals Bpe.encode on adversarial words") {
    // Simulate the oracle's encode EXACTLY as DuckDB evaluates it: the
    // separator-wrapped symbol string, one java String.replace per merge
    // (both scan left-to-right, consume non-overlapping matches, never
    // re-examine their own output). Run-length words under self-merges
    // and substring-suffix symbols ("xa" vs "a") are the alignment traps
    // the wrapping exists to defeat.
    val S = "\u001f"
    def wrapped(w: String): String =
      (w.map(_.toString) :+ Bpe.EndMark).map(s => S + s + S).mkString
    def replayTokens(w: String, merges: Seq[Bpe.Merge]): Int = {
      val enc = merges.foldLeft(wrapped(w)) { (s, m) =>
        s.replace(S + m.left + S + S + m.right + S, S + m.left + m.right + S)
      }
      enc.split(S + S, -1).length
    }
    // adversarial merge tables + a trained one from the fixture
    val tables = Seq(
      Seq(Bpe.Merge(0, "a", "a", 1L)),
      Seq(Bpe.Merge(0, "a", "a", 1L), Bpe.Merge(1, "aa", "a", 1L)),
      Seq(Bpe.Merge(0, "x", "a", 1L), Bpe.Merge(1, "a", "b", 1L)),
      Seq(Bpe.Merge(0, "a", "b", 1L), Bpe.Merge(1, "ab", "ab", 1L)),
      Bpe.trainMerges(fixture, 8))
    val rnd = new scala.util.Random(11)
    val words = Seq("", "a", "aa", "aaa", "aaaa", "aaaaa", "ab", "abab",
      "ababab", "xab", "xaab", "lowest", "newest", "widest", "xa") ++
      (0 until 300).map(_ =>
        (0 until rnd.nextInt(9)).map(_ => "abx" (rnd.nextInt(3))).mkString)
    for (m <- tables; w <- words) {
      assert(replayTokens(w, m) == Bpe.encode(w, m).length,
        s"word '$w' under ${m.map(x => (x.left, x.right))}")
    }
  }

  test("encoding invariants: concatenation, bounds, monotone in merges") {
    val merges = Bpe.trainMerges(fixture, 8)
    for (w <- Seq("low", "newest", "unseen", "wide", "x", "estest")) {
      val enc = Bpe.encode(w, merges)
      // concatenation invariant: the symbols spell the word + EndMark
      assert(enc.mkString == w + Bpe.EndMark)
      assert(enc.nonEmpty && enc.length <= w.length + 1)
      // applying MORE merges never increases the token count
      (0 to merges.length).foreach { k =>
        assert(Bpe.encode(w, merges.take(k)).length >= enc.length)
      }
    }
  }

  test("declared merge table: ranks dense from 0, merged = left+right") {
    val rows = Bpe.bpeMergesQuery(spark, sf).collect()
    assert(rows.length == Bpe.NumMerges)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
  }

  test("streaming token accounting equals the batch query row for row") {
    import spark.implicits._
    val streamed = Bpe.streamBpeTokenStatsQuery(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val batch = Bpe.bpeTokenStatsQuery(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamed == batch)
  }

  test("token accounting is batch-boundary invariant: forced two-way split") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.trainMerges(Bpe.wordCounts(docs))
    val whole = graft.operators.Bpe
      .tokenStatsOver(docs, merges).orderBy(col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val split = graft.operators.Bpe
      .tokenStatsOver(docs.filter(col("doc_id") <= cut), merges)
      .unionByName(graft.operators.Bpe
        .tokenStatsOver(docs.filter(col("doc_id") > cut), merges))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(split == whole)
  }

  test("token stats replay: n_bpe_tokens = sum of per-word encode lengths") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.trainMerges(Bpe.wordCounts(docs))
    val expected = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, text) =>
        val ws = text.split(" ", -1).filter(_.nonEmpty)
        (id, ws.length.toLong,
          ws.map(w => Bpe.encode(w, merges).length.toLong).sum)
      }.sortBy(_._1).toSeq
    val got = Bpe.bpeTokenStatsQuery(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("fertility: per-source ratio replays from the per-doc accounting") {
    val perDoc = Bpe.bpeTokenStatsQuery(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perDoc.toSeq.groupBy { case (d, _) => srcOf(d) }
      .map { case (s, xs) =>
        val (w, t) = (xs.map(_._2._1).sum, xs.map(_._2._2).sum)
        s -> (w, t, t.toDouble / w)
      }
    val got = Bpe.bpeFertilityQuery(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == expected)
    // a word always encodes to >= 1 token, so fertility >= 1 everywhere
    got.values.foreach { case (_, _, f) => assert(f >= 1.0) }
  }

  test("fertility: an all-empty source stays in the readout at 0.0") {
    import spark.implicits._
    // tokenStatsOver drops empty docs, so an inner-join rollup would
    // silently omit srcEmpty — the totality guard must resurrect it
    val docs = Seq(
      (1L, "srcA", "some words here"),
      (2L, "srcEmpty", ""),
      (3L, "srcEmpty", "")
    ).toDF("doc_id", "source", "text")
    val merges = Bpe.trainMerges(Bpe.wordCounts(docs))
    val got = Bpe.fertilityOver(docs, merges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set("srcA", "srcEmpty"))
    assert(got("srcEmpty") == ((0L, 0L, 0.0)))
    assert(got("srcA")._1 == 3L)
  }
}
