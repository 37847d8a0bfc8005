package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.pipeline.BpiPipeline

/** Property tests (SURVEY.md §5) for the two trickiest scalar contracts:
  * the thousands-separator rate normalizer and the reference's timestamp
  * formats. Uses plain ScalaCheck generators with a fixed seed (the
  * scalatest bridge artifact isn't available offline); each property
  * evaluates the actual Catalyst expressions through a DataFrame, so
  * what's tested is what runs in the pipeline. Cases are batched into one
  * DataFrame per property to keep the suite fast. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val N = 200

  private def samples[A](gen: Gen[A]): List[A] =
    Gen.listOfN(N, gen).apply(Gen.Parameters.default, Seed(42L)).get

  private def evalAll(inputs: Seq[String],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Option[String]] =
    inputs.toDF("v").select(f(col("v")).cast("string")).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))

  test("normalizeRate: any comma-grouped decimal parses to the ungrouped value") {
    val gen = for {
      intPart <- Gen.chooseNum(0L, 999999999L)
      frac <- Gen.chooseNum(0, 9999)
    } yield (f"${intPart}%,d.$frac", s"$intPart.$frac".toDouble)
    val cases = samples(gen)
    val out = evalAll(cases.map(_._1), BpiPipeline.normalizeRate)
    cases.zip(out).foreach { case ((in, expected), got) =>
      assert(got.map(_.toDouble).contains(expected), s"input $in")
    }
  }

  test("normalizeRate: garbage becomes null, never an exception") {
    val cases = samples(Gen.alphaStr.map(_ + "x"))
    val out = evalAll(cases, BpiPipeline.normalizeRate)
    assert(out.forall(_.isEmpty))
  }

  test("reference-format timestamps roundtrip to the warehouse string") {
    val utc = java.time.ZoneOffset.UTC
    val refFmt = java.time.format.DateTimeFormatter
      .ofPattern("MMM d, yyyy HH:mm:ss 'UTC'", java.util.Locale.US).withZone(utc)
    val whFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss", java.util.Locale.US).withZone(utc)
    val cases = samples(Gen.chooseNum(0L, 4102444800L)) // 1970..2100
      .map(java.time.Instant.ofEpochSecond(_))
    val out = evalAll(cases.map(refFmt.format),
      c => BpiPipeline.formatTs(BpiPipeline.parseUpdated(c)))
    cases.zip(out).foreach { case (instant, got) =>
      assert(got.contains(whFmt.format(instant)), s"instant $instant")
    }
  }

  test("ISO timestamps with any offset normalize to the same UTC instant") {
    val utc = java.time.ZoneOffset.UTC
    val whFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss", java.util.Locale.US).withZone(utc)
    val gen = for {
      epochSec <- Gen.chooseNum(0L, 4102444800L)
      offsetHours <- Gen.chooseNum(-12, 12)
    } yield (epochSec, offsetHours)
    val cases = samples(gen).map { case (sec, off) =>
      val instant = java.time.Instant.ofEpochSecond(sec)
      val iso = java.time.OffsetDateTime
        .ofInstant(instant, java.time.ZoneOffset.ofHours(off))
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      (instant, iso)
    }
    val out = evalAll(cases.map(_._2),
      c => BpiPipeline.formatTs(BpiPipeline.parseUpdatedIso(c)))
    cases.zip(out).foreach { case ((instant, iso), got) =>
      assert(got.contains(whFmt.format(instant)), s"iso $iso")
    }
  }

  test("quantize: codes in [-127,127], per-dim error within half a step") {
    val genVec = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
    val vecs = samples(genVec).map(_.toArray) :+
      Array.fill(8)(0.0f) // the scale-0 guard case
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val rows = graft.operators.EmbeddingOps.quantized(df).collect()
    assert(rows.length == vecs.length)
    rows.foreach { r =>
      val v = vecs(r.getLong(0).toInt)
      val scale = r.getDouble(2)
      val codes = r.getString(3).split(",").map(_.toLong)
      assert(codes.forall(c => c >= -127 && c <= 127))
      val step = if (scale == 0) 0.0 else scale / 127.0
      v.zip(codes).foreach { case (x, c) =>
        val err = math.abs(x.toDouble - c * scale / 127.0)
        assert(err <= step / 2 * (1 + 1e-9) + 1e-12,
          s"vec ${r.getLong(0)}: x=$x c=$c scale=$scale err=$err")
      }
    }
  }

  test("phash bands: any pair within hamming 3 shares a band (pigeonhole)") {
    val genCase = for {
      h <- Gen.long
      k <- Gen.chooseNum(0, graft.operators.Multimodal.PhashMaxHamming)
      flips <- Gen.listOfN(k, Gen.chooseNum(0, 63))
    } yield (h, flips)
    samples(genCase).foreach { case (h, flips) =>
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      val bandsA = (0 until 4).map(b => (h >> (b * 16)) & 0xFFFFL)
      val bandsB = (0 until 4).map(b => (h2 >> (b * 16)) & 0xFFFFL)
      assert(bandsA.zip(bandsB).exists { case (x, y) => x == y },
        s"hash $h flips $flips: no shared band")
    }
  }

  test("audioHash64: amplitude-scale families and invariants on random PCM") {
    import graft.operators.Multimodal
    val genPcm = Gen.listOfN(256, Gen.chooseNum(-32768, 32767))
      .map(_.map(_.toShort).toArray)
    samples(genPcm).foreach { pcm =>
      val h = Multimodal.audioHash64(pcm)
      // deterministic
      assert(h == Multimodal.audioHash64(pcm.clone()))
      // a constant clip never sets a bit (every block energy == the mean)
      // and doubling... scaling by -1 preserves abs energies exactly
      val neg = pcm.map(s => if (s == Short.MinValue) s else (-s).toShort)
      assert(Multimodal.audioHash64(neg) == h,
        "fingerprint must be phase-invariant (abs amplitude)")
    }
    assert(Multimodal.audioHash64(Array.fill[Short](256)(1234)) == 0L)
  }

  test("containmentPairs: complete and exact vs brute force on random corpora") {
    import graft.operators.Dedup
    import graft.functions.GraftExpressions
    // Tiny vocab + doc-in-doc planting: wrapper docs embed an earlier
    // doc's text so asymmetric containment pairs actually occur.
    val genDoc = for {
      n <- Gen.chooseNum(3, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield ws.mkString(" ")
    val bases = samples(genDoc).take(25)
    val corpus = bases.zipWithIndex.map { case (t, i) =>
      // every third doc wraps its predecessor in boilerplate
      if (i % 3 == 2) (i.toLong, s"pre pre pre ${bases(i - 1)} post post post")
      else (i.toLong, t)
    }
    val docs = corpus.toDF("doc_id", "text")
    val fast = Dedup.containmentPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val sets = docs.select(col("doc_id"),
        GraftExpressions.shingleHashes64(col("text"), Dedup.ShingleSize).as("hv"))
      .withColumn("n", size(col("hv")).cast("long")).filter(col("n") > 0)
    val brute = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.hv"), col("b.hv"))).cast("double") /
          least(col("a.n"), col("b.n"))).as("c"))
      .filter(col("c") >= 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fast == brute)
    assert(brute.nonEmpty, "planting failed to produce containment pairs")
  }

  test("late interaction: MaxSim equals brute force on random corpora") {
    import graft.operators.{Similarity, TextAnalysis}
    // Tiny vocab forces dim collisions, shared dims, negative cosines and
    // multi-chunk docs (up to ~3 RAG chunks at 64/32) — the adversarial
    // surface the real-corpus replay test can't systematically cover.
    val genDoc = for {
      n <- Gen.chooseNum(1, 90)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    } yield ws.mkString(" ")
    // Plant a guaranteed NEGATIVE best-match: two single-letter docs whose
    // letters hash to the SAME dim with OPPOSITE signs have chunk cosine
    // exactly -1, so the (query 0, doc 29) pair exercises the max(0, ·)
    // clamp — found from the featurizer itself, not assumed.
    val probeTokens = (0 until 200).map(i => s"w$i")
    val letterFeats = TextAnalysis.chunkFeatureCountsOf(
        TextAnalysis.ragChunksOf(probeTokens.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val (negA, negB) = letterFeats.groupBy(_._2).values
      .flatMap { xs =>
        for {
          a <- xs.find(_._3 > 0)
          b <- xs.find(_._3 < 0)
        } yield (probeTokens(a._1.toInt), probeTokens(b._1.toInt))
      }.head
    val corpus = samples(genDoc).take(30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .map {
        case (0L, _)  => (0L, s"$negA $negA $negA")
        case (29L, _) => (29L, s"$negB $negB")
        case other    => other
      }
    val docs = corpus.toDF("doc_id", "text")
    val cc = TextAnalysis.chunkFeatureCountsOf(TextAnalysis.ragChunksOf(docs))
    val qf = cc.filter(col("doc_id") < Similarity.NumQueryVectors)
    val got = Similarity.liScoresOver(qf, cc, None).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force over collected chunk features: per q-chunk (ascending)
    // the max cosine over the cand's OVERLAPPING chunks clamped at 0,
    // folded left from 0.0 — the declared sparse semantics
    val feats = cc.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
    val byChunk = feats.groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(t => t._2 -> t._3).toMap }
    val sq = byChunk.map { case (k, m) => k -> m.values.map(c => c * c).sum }
    def cosOf(a: (Long, Long), b: (Long, Long)): Double = {
      val (ma, mb) = (byChunk(a), byChunk(b))
      val dot = ma.keySet.intersect(mb.keySet).toSeq.map(k => ma(k) * mb(k)).sum
      dot.toDouble / (math.sqrt(sq(a).toDouble) * math.sqrt(sq(b).toDouble))
    }
    val docIds = byChunk.keys.map(_._1).toSet
    val brute = (for {
      q <- docIds.filter(_ < Similarity.NumQueryVectors)
      cand <- docIds if cand != q
    } yield {
      val qChunks = byChunk.keys.filter(_._1 == q).toSeq.sortBy(_._2)
      val dChunks = byChunk.keys.filter(_._1 == cand).toSeq
      val terms = qChunks.flatMap { qc =>
        val overlapping = dChunks.filter(dc =>
          byChunk(qc).keySet.intersect(byChunk(dc).keySet).nonEmpty)
        if (overlapping.isEmpty) None
        else Some(math.max(0.0, overlapping.map(dc => cosOf(qc, dc)).max))
      }
      ((q, cand), terms)
    }).collect { case (k, terms) if terms.nonEmpty =>
      k -> terms.foldLeft(0.0)(_ + _)
    }.toMap
    assert(got == brute)
    assert(brute.nonEmpty, "generation produced no chunk interactions")
    // the planted anti-correlated pair: cosine exactly -1, clamped to a
    // PRESENT row with score 0.0 (overlap exists, no positive evidence)
    assert(cosOf((0L, 0L), (29L, 0L)) == -1.0)
    assert(got((0L, 29L)) == 0.0)
  }

  test("packTokens: random corpora conserve tokens at exact capacity") {
    import graft.operators.Curation
    val genDoc = for {
      n <- Gen.chooseNum(1, 600) // straddles: some docs exceed PackCapacity
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield ws.mkString(" ")
    val corpus = samples(genDoc).take(40).zipWithIndex.map { case (t, i) =>
      (i.toLong, s"src${i % 3}", t)
    }
    val docs = corpus.toDF("doc_id", "source", "text")
    val packs = Curation.packTokens(docs).collect()
    // conservation: non-pad slots across packs == total token count
    val totalTokens = corpus.map(_._3.split(" ", -1).length.toLong).sum
    assert(packs.map(_.getLong(3)).sum == totalTokens)
    // every pack materializes exactly capacity slots; pads only on each
    // source's last pack
    val lastPack = packs.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).max).toMap
    packs.foreach { r =>
      assert(r.getString(5).split(",", -1).length == Curation.PackCapacity)
      if (r.getLong(1) < lastPack(r.getString(0))) assert(r.getLong(4) == 0L)
      assert(r.getLong(3) + r.getLong(4) == Curation.PackCapacity)
    }
  }
}
