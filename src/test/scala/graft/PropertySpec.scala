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
