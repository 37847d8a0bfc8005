package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityGate

class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  private def flagsOf(text: String): Map[String, Any] = {
    val row = QualityGate.gopherFlags(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("gopher rules: prose-like doc passes every rule") {
    val good = ("the quick brown fox jumps over the lazy dog and " * 3).trim // 30 tokens
    val f = flagsOf(good)
    assert(f("r_len") == true && f("r_mean_len") == true &&
      f("r_ttr") == true && f("r_stop") == true && f("keep") == true)
  }

  test("gopher rules: short doc fails only the length rule") {
    val f = flagsOf("the quick brown fox jumps and dogs") // 7 tokens < MinTokens
    assert(f("r_len") == false)
    assert(f("r_mean_len") == true && f("r_ttr") == true && f("r_stop") == true)
    assert(f("keep") == false)
  }

  test("gopher rules: repeated-vocabulary doc fails the ttr rule") {
    val f = flagsOf(("the " * 30).trim) // ttr = 1/30 < MinTtr
    assert(f("r_ttr") == false && f("keep") == false)
    assert(f("r_stop") == true) // 30 stopword hits
  }

  test("gopher rules: stopword-free doc fails the stopword rule") {
    val f = flagsOf(("lorem ipsum dolor sit amet " * 5).trim) // 25 tokens, 0 stops
    assert(f("r_stop") == false && f("keep") == false)
    assert(f("r_len") == true)
  }

  test("contamination: exact eval copy scores 1.0, disjoint doc scores 0.0") {
    val evalText = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, evalText),                         // the eval doc
      (2L, evalText),                         // train: exact copy -> 1.0
      (3L, "one two three four five six"),    // train: disjoint  -> 0.0
      (4L, "alpha beta gamma nine ten eleven") // train: shares 1 of 4 grams
    ).toDF("doc_id", "text")
    val out = QualityGate.contaminationOn(docs, col("doc_id") === 1L)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getDouble(3) == 1.0)
    assert(byId(3L).getDouble(3) == 0.0)
    assert(byId(4L).getLong(1) == 4L && byId(4L).getLong(2) == 1L)
  }

  test("streaming gate drains to exactly the batch gate's keep set") {
    val streamed = QualityGate.streamQualityGateQuery(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val batch = QualityGate.gopherRules(spark, sf)
      .filter(col("keep")).collect().map(_.getLong(0)).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("contamination: docs shorter than the gram width drop out") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "x y")).toDF("doc_id", "text")
    val out = QualityGate.contaminationOn(docs, col("doc_id") === 1L).collect()
    assert(out.isEmpty) // doc 2 has no 3-grams; doc 1 is the eval split
  }

  test("contrastive classifier: planted word order separates natural from reversed") {
    import graft.operators.TextAnalysis
    // ids landing in each md5 split, found the same way the operator
    // selects them (first hex of md5 of the decimal id string)
    def hex1(i: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).substring(0, 1)
    }
    def idsIn(hexes: Seq[String], n: Int): Seq[Long] =
      Iterator.iterate(0L)(_ + 1).filter(i => hexes.contains(hex1(i)))
        .take(n).toSeq
    val posIds = idsIn(TextAnalysis.LmTrainHexPrefixes, 3)
    val negIds = idsIn(TextAnalysis.ClfNegHexPrefixes, 3)
    val evalId = Iterator.iterate(0L)(_ + 1).find(i => hex1(i) == "0").get
    val phrase = "alpha beta gamma delta epsilon zeta"
    val docs = ((posIds ++ negIds).map((_, phrase)) :+ (evalId, phrase))
      .toDF("doc_id", "text")
    val (cPos, cNeg) = TextAnalysis.classifierCounts(docs)
    def scoreOf(text: String): Double = TextAnalysis.classifierScoreOver(
      Seq((evalId, text)).toDF("doc_id", "text"), cPos, cNeg)
      .head().getDouble(4)
    // natural order: every bigram hits the positive table, none the
    // (flipped) negative table — and vice versa for reversed text
    assert(scoreOf(phrase) == 1.0)
    assert(scoreOf(phrase.split(" ").reverse.mkString(" ")) == 0.0)
    // no evidence in either class => the neutral prior
    assert(scoreOf("") == 0.5)
    assert(scoreOf("omega psi") == 0.5)
  }

  test("curriculum shards: positions follow bands, budgets prefix-sum exactly") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.curriculumShards(spark, sf).collect()
    assert(rows.nonEmpty)
    // schedule is band-major and dense
    assert(rows.map(_.getLong(5)).toSeq == (1L to rows.length).toSeq)
    assert(rows.map(_.getLong(1)).toSeq.sorted == rows.map(_.getLong(1)).toSeq)
    // cumulative budget is exactly the prefix sum of shard token counts
    val cums = rows.map(_.getLong(4)).scanLeft(0L)(_ + _).drop(1).toSeq
    assert(rows.map(_.getLong(6)).toSeq == cums)
    // every doc lands in exactly one shard
    assert(rows.map(_.getLong(3)).sum ==
      Tables.documents(spark, sf).count())
  }

  test("dsir weights: planted domain match separates target-like from raw-like") {
    import graft.operators.TextAnalysis
    def hex1(i: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).substring(0, 1)
    }
    def idsWhere(p: String => Boolean, n: Int): Seq[Long] =
      Iterator.iterate(0L)(_ + 1).filter(i => p(hex1(i))).take(n).toSeq
    val tgtIds = idsWhere(TextAnalysis.LmTrainHexPrefixes.contains, 3)
    val rawIds = idsWhere(h =>
      h != "0" && !TextAnalysis.LmTrainHexPrefixes.contains(h), 3)
    val evalId = Iterator.iterate(0L)(_ + 1).find(i => hex1(i) == "0").get
    val tgtPhrase = "alpha beta gamma delta epsilon zeta"
    val rawPhrase = "noise spam junk boiler plate chaff"
    val docs = (tgtIds.map((_, tgtPhrase)) ++ rawIds.map((_, rawPhrase)) :+
      (evalId, tgtPhrase)).toDF("doc_id", "text")
    val (cTgt, cRaw) = TextAnalysis.dsirCounts(docs)
    def weightOf(text: String): Double = TextAnalysis.dsirWeightsOver(
      Seq((evalId, text)).toDF("doc_id", "text"), cTgt, cRaw)
      .head().getDouble(4)
    // all-target bigrams -> full weight; all-raw -> zero; unseen -> prior
    assert(weightOf(tgtPhrase) == 1.0)
    assert(weightOf(rawPhrase) == 0.0)
    assert(weightOf("omega psi") == 0.5)
    assert(weightOf("") == 0.5)
  }

  test("dsir weights: declared query samples by weight on the corpus") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.dsirWeights(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val w = r.getDouble(4)
      assert(w >= 0.0 && w <= 1.0)
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
    }
    // the draw is md5 chars 5-8; replay it for one row and check the
    // keep decision is exactly draw < w * 2^16
    val r0 = rows.head
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(r0.getLong(0).toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val draw = java.lang.Long.parseLong(md5hex.substring(4, 8), 16)
    assert(r0.getBoolean(5) == (draw.toDouble < r0.getDouble(4) * 65536.0))
    // sampling is weight-tilted, not degenerate, on the real corpus
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("quality signals: one wide row per doc, each column equals its parent") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.qualitySignals(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val keepOf = QualityGate.gopherRules(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val lmOf = TextAnalysis.lmScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("lm_score")).toMap
    val clfOf = TextAnalysis.classifierScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val dsOf = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Boolean]("keep") == keepOf(id))
      assert(r.getAs[Double]("lm_score") == lmOf(id))
      assert(r.getAs[Double]("clf_score") == clfOf(id))
      assert(r.getAs[Double]("dsir_weight") == dsOf(id))
    }
  }

  test("classifier calibration: bands partition the corpus and replay the joint") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.classifierCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    rows.foreach { case (band, n, k, rate) =>
      assert(band >= 0L && band <= 9L)
      assert(k >= 0L && k <= n)
      assert(rate == k.toDouble / n)
    }
    // the banded joint equals a direct recombination of the two queries
    val scoreOf = TextAnalysis.classifierScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val keepOf = QualityGate.gopherRules(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val direct = scoreOf.toSeq.map { case (id, s) =>
      (math.min(math.floor(s * 10).toLong, 9L), keepOf(id)) }
      .groupBy(_._1)
      .map { case (b, xs) => (b, xs.length.toLong, xs.count(_._2).toLong) }
      .toSet
    assert(rows.map(t => (t._1, t._2, t._3)).toSet == direct)
  }

  test("classifier score: declared query runs with sane ranges on the corpus") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.classifierScore(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val score = r.getDouble(4)
      assert(score >= 0.0 && score <= 1.0)
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
    }
    // the corpus's bigrams overlap both splits, so evidence is non-trivial
    assert(rows.exists(r => r.getLong(2) > 0L && r.getLong(3) > 0L))
  }

  test("novelty curve: first doc fully novel, totals conserve") {
    val out = graft.operators.TextAnalysis.noveltyCurve(spark, sf).collect()
    assert(out.nonEmpty)
    // the earliest emitted doc can only contain first-seen shingles
    assert(out.minBy(_.getLong(0)).getDouble(3) == 1.0)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) ==
        r.getLong(2).toDouble / r.getLong(1))
    }
    // conservation: novel counts sum to the corpus's distinct shingles
    val distinctShingles = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(array_distinct(graft.functions.GraftExpressions
        .shingleStrings(col("text"), graft.operators.Dedup.ShingleSize)))
        .as("g"))
      .agg(countDistinct(col("g"))).head().getLong(0)
    assert(out.map(_.getLong(2)).sum == distinctShingles)
  }

  test("per-source novelty rollup conserves the per-doc totals") {
    val perDoc = graft.operators.TextAnalysis.noveltyCurve(spark, sf).collect()
    val bySource = graft.operators.TextAnalysis.noveltyBySource(spark, sf)
      .collect()
    assert(bySource.map(_.getLong(1)).sum == perDoc.length)
    assert(bySource.map(_.getLong(2)).sum == perDoc.map(_.getLong(1)).sum)
    assert(bySource.map(_.getLong(3)).sum == perDoc.map(_.getLong(2)).sum)
  }

  test("incremental novelty equals the batch curve") {
    val batch = graft.operators.TextAnalysis.noveltyCurve(spark, sf)
      .collect().map(_.toString).toSeq
    val inc = graft.operators.TextAnalysis.incrementalNoveltyQuery(spark, sf)
      .collect().map(_.toString).toSeq
    assert(inc == batch && inc.nonEmpty)
  }

  test("hourly anomaly: every flagged hour recounts past the threshold") {
    val out = graft.operators.RelationalExt.hourlyAnomaly(spark, sf).collect()
    out.foreach(r => assert(math.abs(r.getDouble(3)) >=
      graft.operators.RelationalExt.AnomalyZ))
    // local recount of one type's z-scores
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("ws"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byType = hourly.groupBy(_._1).toSeq
    val expected = byType.flatMap { case (tpe, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._3).sum
      val sxx = rows.map(x => x._3 * x._3).sum
      val mean = sx.toDouble / n
      val std = math.sqrt((n * sxx - sx * sx).toDouble / (n * n).toDouble)
      rows.collect { case (_, ws, c)
        if math.abs((c.toDouble - mean) / std) >=
          graft.operators.RelationalExt.AnomalyZ => (tpe, ws) }
    }.toSet
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == expected)
  }
}
