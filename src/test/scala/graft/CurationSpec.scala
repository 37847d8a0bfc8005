package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text").select(
      col("doc_id"), col("text"), col("source"))

  // 8 tokens = exactly one chunk; repeat it to plant duplicates.
  private val chunkA = "a b c d e f g h"
  private val chunkB = "p q r s t u v w"

  test("chunkDedup: first occurrence wins, later copies removed") {
    val d = docs(
      (1L, "s", s"$chunkA $chunkB"), // two chunks, both first occurrences
      (2L, "s", chunkA),             // fully duplicate -> doc drops out
      (3L, "s", s"$chunkB x y z"))   // chunkB dup, tail chunk survives
    val out = Curation.chunkDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1) == (2L, s"$chunkA $chunkB"))
    assert(!out.contains(2L))
    assert(out(3) == (1L, "x y z"))
  }

  test("chunkDedup: kept chunks across the corpus = distinct chunks") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val kept = Curation.chunkDedup(d).agg(sum("n_kept")).as[Long].head()
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val distinctChunks = d
      .select(col("doc_id"), explode(sequence(lit(0),
        (ceil(size(toks) / 8.0) - 1).cast("int"))).as("i"), toks.as("t"))
      .select(array_join(slice(col("t"), col("i") * 8 + 1, lit(8)), " ").as("c"))
      .distinct().count()
    assert(kept == distinctChunks)
  }

  test("spanDedup: repeated span removed token-precisely, context kept") {
    // doc 2 repeats doc 1's 10-token span inside unique context: exactly
    // the 10 span tokens vanish, the surrounding unique tokens survive.
    val span = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val d = docs(
      (1L, "s", span),
      (2L, "s", s"u1 u2 u3 $span v1 v2 v3"))
    val out = Curation.spanDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1) == (10L, span))
    assert(out(2) == (6L, "u1 u2 u3 v1 v2 v3"))
  }

  test("spanDedup: misaligned repeats caught (stride-1 windows)") {
    // the repeat sits at offset 3 in doc 2 — a fixed-chunk pass at chunk
    // size 8 would slice it differently and miss it
    val span = "m1 m2 m3 m4 m5 m6 m7 m8"
    val d = docs(
      (1L, "s", s"$span tail1 tail2"),
      (2L, "s", s"x1 x2 x3 $span"))
    val out = Curation.spanDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1) == (10L, s"$span tail1 tail2"))
    assert(out(2) == (3L, "x1 x2 x3"))
  }

  test("spanDedup: short docs untouched, self-repetition collapsed") {
    val d = docs(
      (1L, "s", "short doc under eight tokens"),        // n < SpanTokens
      (2L, "s", Seq.fill(20)("rep").mkString(" ")))     // run of one token
    val out = Curation.spanDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1) == (5L, "short doc under eight tokens"))
    // windows p=1..12 are dups of p=0 -> positions 1..19 removed
    assert(out(2) == (1L, "rep"))
  }

  test("lengthBatches: bit-length bands bound padding waste structurally") {
    import graft.operators.Curation
    val df = Curation.lengthBatches(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    val n = Tables.documents(spark, sf).count()
    // every doc indexed exactly once
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == n)
    rows.foreach { case (_, toks, band, shard, _, pos, bmax, fill) =>
      // band = bit length - 1: token count in [2^band, 2^(band+1))
      assert(toks >= (1L << band) && toks < (1L << (band + 1)))
      assert(shard >= 0 && shard < Curation.BatchShards)
      assert(pos >= 0 && pos < Curation.BatchDocs)
      assert(toks <= bmax)
      // max/min < 2 within a band => fill > 0.5 for EVERY batch, the
      // structural bound banding exists to provide
      assert(fill > 0.5 && fill <= 1.0)
    }
    // fill replays from the batch members; batches hold <= BatchDocs docs;
    // batch identity is (band, shard, batch_seq)
    rows.groupBy(r => (r._3, r._4, r._5)).foreach { case (_, b) =>
      assert(b.length <= Curation.BatchDocs)
      assert(b.map(_._6).sorted.toSeq == (0L until b.length).toSeq)
      val expect = b.map(_._2).sum.toDouble / (b.length * b.map(_._2).max)
      b.foreach { case (_, _, _, _, _, _, _, fill) => assert(fill == expect) }
    }
    // the md5 sub-shard is real parallelism, not a column: the dominant
    // band spreads across every shard, so no rank-window partition holds a
    // band's full corpus share (the single-task straggler this guards)
    val byBand = rows.groupBy(_._3)
    val (_, dominant) = byBand.maxBy(_._2.length)
    assert(dominant.map(_._4).distinct.length == Curation.BatchShards)
    // and the physical rank window really partitions on (band, shard) —
    // asserted on the WindowExec node's partitionSpec expressions, not a
    // rendered plan line (string rendering truncates long specs under
    // maxToStringFields and would silently stop pinning the sub-shard)
    val windowSpecs = flattenPlan(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.map(_.toString)
    }
    assert(windowSpecs.exists(spec =>
      spec.exists(_.contains("band")) && spec.exists(_.contains("shard"))))
  }

  test("packSequences: packs respect capacity and partition token mass") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = Curation.packSequences(d).cache()
    // every (source, pack) holds at most the capacity
    val overfull = packed.groupBy("source", "pack_id")
      .agg(sum("n_in_pack").as("fill"))
      .filter(col("fill") > Curation.PackCapacity).count()
    assert(overfull == 0)
    // every pack except the last per source is exactly full
    val lastPack = packed.groupBy("source").agg(max("pack_id").as("last"))
    val notFull = packed.groupBy("source", "pack_id")
      .agg(sum("n_in_pack").as("fill"))
      .join(lastPack, "source")
      .filter(col("pack_id") < col("last") &&
        col("fill") =!= Curation.PackCapacity).count()
    assert(notFull == 0)
    // per-document contributions add back to its token count
    val broken = packed.groupBy("doc_id").agg(
      sum("n_in_pack").as("got"), first("n_tokens").as("want"))
      .filter(col("got") =!= col("want")).count()
    assert(broken == 0)
    packed.unpersist()
  }

  test("packSequences: straddling doc split across adjacent packs") {
    // 200 + 100 tokens: doc 2 contributes 56 to pack 0 and 44 to pack 1
    val t1 = Seq.fill(200)("x").mkString(" ")
    val t2 = Seq.fill(100)("y").mkString(" ")
    val out = Curation.packSequences(docs((1L, "s", t1), (2L, "s", t2)))
      .select("pack_id", "doc_id", "n_in_pack").as[(Long, Long, Long)]
      .collect().toSet
    assert(out == Set((0L, 1L, 200L), (0L, 2L, 56L), (1L, 2L, 44L)))
  }

  test("packTokens: materialized packs conserve tokens, pad only the tail") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val packs = Curation.packTokens(d).cache()
    // token conservation: per-source token mass matches the pack_stats view
    val stats = Curation.packStats(spark, "/root/testdata/sf0.001")
      .select(col("source"), col("n_tokens").as("want"))
    val broken = packs.groupBy("source").agg(sum("n_tokens").as("got"))
      .join(stats, "source").filter(col("got") =!= col("want")).count()
    assert(broken == 0)
    // every materialized sequence is exactly capacity long (ids + pads),
    // and only each source's LAST pack carries padding
    val rows = packs.collect()
    val lastPack = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).max).toMap
    rows.foreach { r =>
      val (src, packId) = (r.getString(0), r.getLong(1))
      val ids = r.getString(5).split(",")
      assert(ids.length == Curation.PackCapacity,
        s"pack ($src, $packId) materialized ${ids.length} slots")
      // hashed ids are non-negative, so "-1" slots are exactly the pads
      val nPad = r.getLong(4)
      assert(ids.count(_ == Curation.PadTokenId.toString) == nPad)
      if (packId < lastPack(src))
        assert(nPad == 0L, s"non-final pack ($src, $packId) padded")
      assert(r.getLong(3) + nPad == Curation.PackCapacity)
    }
    packs.unpersist()
  }

  test("packTokens: boundary markers and padding on a straddling doc") {
    // 200 + 100 tokens in one source: pack 0 = doc1 + 56 head tokens of
    // doc2 (doc_starts "0,200"); pack 1 = 44 tail tokens + 212 pads
    // (doc_starts "" — nothing starts there)
    val t1 = Seq.fill(200)("x").mkString(" ")
    val t2 = Seq.fill(100)("y").mkString(" ")
    val out = Curation.packTokens(docs((1L, "s", t1), (2L, "s", t2)))
      .select("pack_id", "n_docs", "n_tokens", "n_pad", "token_ids", "doc_starts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(out.length == 2)
    val (p0, p1) = (out(0), out(1))
    assert((p0._1, p0._2, p0._3, p0._4, p0._6) == (0L, 2L, 256L, 0L, "0,200"))
    assert((p1._1, p1._2, p1._3, p1._4, p1._6) == (1L, 1L, 44L, 212L, ""))
    // pads are all the marker id, and the x/y token ids are uniform runs
    val ids1 = p1._5.split(",")
    assert(ids1.length == 256 && ids1.drop(44).forall(_ == "-1"))
    assert(ids1.take(44).distinct.length == 1 && ids1.take(44).head != "-1")
    val ids0 = p0._5.split(",")
    assert(ids0.take(200).distinct.length == 1 && ids0.drop(200).distinct.length == 1)
    assert(ids0.take(200).head != ids0.drop(200).head)
  }

  test("bloomDecontaminate: equals the exact anti-join, bloom has no false negatives") {
    // plant an exact duplicate pair straddling the eval split: evalId's
    // md5 starts with '0' (eval side), trainId's does not
    val md5hex = (i: Long) => java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes).take(1).map("%02x".format(_)).mkString
    val evalId = (0L to 1000L).find(md5hex(_).startsWith("0")).get
    val Seq(t1, t2, t3) =
      (0L to 1000L).filter(!md5hex(_).startsWith("0")).take(3)
    val leaked = "secret benchmark answer text"
    val d = docs(
      (evalId, "s", leaked),
      (t1, "s", leaked),            // leaked -> must be dropped
      (t2, "s", "clean doc one"),
      (t3, "s", "clean doc two"))
    val out = Curation.bloomDecontaminate(d).select("doc_id").as[Long]
      .collect().toSet
    assert(out == Set(t2, t3))
  }

  test("bloomDecontaminate: prefilter prunes the corpus before the exact join") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = d.filter(expr(
      "substr(md5(cast(doc_id as string)), 1, 1) <> '0'")).count()
    val candidates = Curation.bloomCandidates(d)
    // exact matches (ground truth) must all survive the bloom...
    val exact = d.select(col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
      expr("substr(md5(cast(doc_id as string)), 1, 1) = '0'").as("ev"))
    val truth = exact.filter(!col("ev")).join(
      exact.filter(col("ev")).select("fp").distinct(), Seq("fp"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    val cand = candidates.select("doc_id").as[Long].collect().toSet
    assert(truth.subsetOf(cand))
    // ...and the bloom must actually prune (candidates << training corpus)
    assert(cand.size < train / 2,
      s"bloom passed ${cand.size} of $train training docs")
  }

  test("bloomDecontaminate: final plan scans documents exactly twice") {
    // eval-side scan happens once at sketch-build (evalFps persisted); the
    // output plan touches the parquet corpus only for confirmed-ids and
    // the emitting pass.
    // Pin the pre-AQE physical plan: AQE may legitimately drop the whole
    // anti-join at tiny SF (empty confirmed set -> empty-relation
    // propagation), so the structural scan count lives in sparkPlan.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Curation.bloomDecontaminate(d)
    val plan = out.queryExecution.sparkPlan
    val parquetScans = plan.collect { case f: FileSourceScanExec => f }.size
    val cachedScans = plan.collect { case c: InMemoryTableScanExec => c }.size
    assert(parquetScans == 2,
      s"expected exactly 2 parquet scans (confirmed-ids + emit), got $parquetScans:\n$plan")
    assert(cachedScans >= 1, "eval fingerprint set should be served from cache")
    assert(out.count() > 0) // and the query still runs end to end
  }

  test("writeTrainShards: layout + manifest agree with the audit view") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Curation.writeTrainShards(d, out)
    // manifest written, parses, and matches the audit query row-for-row
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "_manifest.json")), "UTF-8")
    assert(manifest.startsWith("[") && manifest.contains("\"shard_id\""))
    val audit = Curation.trainShards(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val laid = spark.read.parquet(out)
    // partitionBy dir values read back as inferred INT — normalize to long
    val got = laid.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == audit)
    // every doc present exactly once; files are doc_id-sorted within shard
    assert(laid.count() == d.count())
    assert(laid.select("doc_id").distinct().count() == d.count())
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == Curation.NumShards)
    val someShard = spark.read.parquet(shardDirs.head.getPath)
      .select("doc_id").collect().map(_.getLong(0))
    assert(someShard.sorted.sameElements(someShard), "shard not doc_id-sorted")
  }

  test("trainShards: every doc lands in exactly one shard, ids in range") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val shards = Curation.trainShards(d).collect()
    assert(shards.map(_.getLong(1)).sum == d.count())
    assert(shards.forall { r =>
      val id = r.getLong(0); id >= 0 && id < Curation.NumShards
    })
    // deterministic: a second run produces the identical manifest
    val again = Curation.trainShards(d).collect()
    assert(shards.toSeq == again.toSeq)
  }

  test("packing: two-level prefix sum replays the per-source running sum") {
    // withCumulativeTokens promises cum_end == sum(tok) OVER (PARTITION BY
    // source ORDER BY doc_id) bit-for-bit — the contract that lets the
    // packing oracles stay a plain SQL window while the engine runs the
    // sharded two-level shape. Checked on the real corpus, where sources
    // interleave doc_ids and every sub-shard is non-trivially populated.
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.documents(spark, sf)
    val base = d.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val direct = base.withColumn("want_end",
        sum(col("n_tokens")).over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .select(col("doc_id"), col("want_end"))
    val twoLevel = Curation.withCumulativeTokens(d, base, "n_tokens")
      .select(col("doc_id"), col("cum_end"), col("cum_start"), col("n_tokens"))
    val joined = twoLevel.join(direct, Seq("doc_id")).cache()
    try {
      assert(joined.count() == base.count())
      assert(joined.filter(col("cum_end") =!= col("want_end")).count() == 0)
      assert(joined.filter(
        col("cum_start") =!= col("cum_end") - col("n_tokens")).count() == 0)
    } finally joined.unpersist()
  }

  test("packing: id spans near Long.MaxValue cut shards without overflow") {
    // ADVICE r18: the old shard cut multiplied (doc_id - mn) by PackShards,
    // overflowing Long for sources whose id span exceeds ~2^58 and silently
    // breaking the monotone-cut invariant (wrong packs, no error). The
    // width-based divide-then-multiply form never multiplies a data-sized
    // value — sparse 64-bit ids pack correctly.
    import org.apache.spark.sql.expressions.Window
    val top = Long.MaxValue
    val ids = Seq(0L, 1L, top / 3, top / 2, top - 2, top - 1)
    val d = ids.zipWithIndex.map { case (id, i) =>
      (id, "s", Seq.fill(i + 1)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val base = d.select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
    val got = Curation.withCumulativeTokens(d, base, "n_tokens")
      .select(col("doc_id"), col("cum_end")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ids.sorted.zipWithIndex.map { case (id, k) =>
      id -> ids.sorted.take(k + 1).map(x => ids.indexOf(x) + 1L).sum
    }.toMap
    assert(got == want)
    // ...and the packs built on top of it respect capacity
    val packs = Curation.packSequences(d)
    assert(packs.groupBy(col("pack_id")).agg(sum(col("n_in_pack")).as("t"))
      .filter(col("t") > Curation.PackCapacity).count() == 0)
  }

  test("packing: stale offsets fail loudly instead of mis-packing") {
    // ADVICE r18: the offset tables materialize at plan construction; if
    // the input grows a source or an id outside the recorded ranges before
    // execution, the executed plan must REFUSE, not silently drop or
    // mis-pack those rows. Simulated by constructing against a `docs`
    // frame narrower than the executed `base`.
    val d = docs((1L, "s", "a b"), (2L, "s", "c d e"))
    // unseen source at execution time
    val widerSrc = docs((1L, "s", "a b"), (2L, "s", "c d e"),
      (3L, "t", "x y")).select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"))
    def saysStale(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(c => Option(c.getMessage).exists(_.contains("stale")))
    val e1 = intercept[Exception] {
      Curation.withCumulativeTokens(d, widerSrc, "n_tokens").collect()
    }
    assert(saysStale(e1), s"wrong failure: $e1")
    // The cached-offsets form of the same hazard is now closed AT THE
    // KEY (ADVICE r19): offsets ride the StateCache keyed by (corpus
    // dir, content fingerprint), so a REWRITTEN dir MISSES the cache and
    // rebuilds fresh offsets instead of pairing session-cached tables
    // with fresh rows — the rewritten corpus packs correctly with no
    // guard trip.
    val dir = TempDirs.scoped("graft_curation_stale")
    docs((1L, "s", "a b"), (2L, "s", "c d e")).write.mode("overwrite")
      .parquet(dir)
    val v1 = Curation.packSequences(spark.read.parquet(dir),
      Some((dir, "staletest")))
    assert(v1.count() > 0)
    docs((1L, "s", "a b"), (1000L, "s", "x y")).write.mode("overwrite")
      .parquet(dir)
    val v2 = Curation.packSequences(spark.read.parquet(dir),
      Some((dir, "staletest")))
    assert(v2.filter(col("doc_id") === 1000L).count() == 1,
      "rewritten dir served stale cached offsets instead of rebuilding")
    // The adversarial form (review finding): an id BELOW mn by less than
    // one shard width TRUNCATES into shard 0 (SQL div rounds toward
    // zero) and lands on a valid offset row — before the fingerprint,
    // only the explicit range check caught it; now the rewrite misses
    // the cache and the new id packs correctly. ids 1..100 → width 4;
    // doc 0 → (0-1) div 4 = 0.
    val dir2 = TempDirs.scoped("graft_curation_stale2")
    (1L to 100L).map(i => (i, "s", "w " * 3)).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(dir2)
    assert(Curation.packSequences(spark.read.parquet(dir2),
      Some((dir2, "staletest2"))).count() > 0)
    (0L to 100L).map(i => (i, "s", "w " * 3)).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(dir2)
    val v3 = Curation.packSequences(spark.read.parquet(dir2),
      Some((dir2, "staletest2")))
    assert(v3.filter(col("doc_id") === 0L).count() == 1,
      "sub-range id slipped through stale cached offsets")
    // The construction-vs-execution window the fingerprint CANNOT see
    // (offsets collected at plan build, input rewritten before the plan
    // executes) is still covered by the in-plan guard — e1 above drives
    // exactly that split via the narrower construction frame.
  }

  test("packing: no window partitions on source alone (physical plan pin)") {
    // the r17 `weak`: a window partitioned by source ALONE is a
    // single-task cumulative sum over a whole source at 100 TB. Pinned on
    // the WindowExec nodes' partitionSpec expressions (string rendering
    // truncates under maxToStringFields), for both packing entry points
    // and the trainer pipeline that composes them.
    val d = graft.Tables.documents(spark, sf)
    for (df <- Seq(Curation.packSequences(d), Curation.packTokens(d),
        Curation.trainerPipeline(spark, sf))) {
      val specs = flattenPlan(df.queryExecution.executedPlan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.map(_.toString)
      }
      // the bounded per-(source, pshard) window is there...
      assert(specs.exists(s =>
        s.exists(_.contains("source")) && s.exists(_.contains("pshard"))))
      // ...and no window partitions a whole source into one task
      val offenders = specs.filter(s =>
        s.exists(_.contains("source")) && !s.exists(_.contains("pshard")))
      assert(offenders.isEmpty,
        s"window partitioned on source alone: $offenders")
    }
  }
}
