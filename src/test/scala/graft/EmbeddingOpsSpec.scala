package graft

import org.apache.spark.sql.functions._
import graft.operators.{EmbeddingOps, Similarity}

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantize: planted vectors round-trip with known codes") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = EmbeddingOps.quantized(df).orderBy("vec_id").collect()
    // scale 1.0; codes: 127, floor(-63.5+0.5)=-63, 0
    assert(out(0).getDouble(2) == 1.0)
    assert(out(0).getString(3) == "127,-63,0")
    // all-zero vector: scale 0, zero codes, zero error
    assert(out(1).getDouble(2) == 0.0)
    assert(out(1).getString(3) == "0,0,0")
    assert(out(1).getDouble(4) == 0.0)
  }

  test("quantize: reconstruction error bounded by half a quantization step") {
    val rows = EmbeddingOps.quantizeInt8(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dims = r.getLong(1)
      val scale = r.getDouble(2)
      val err = r.getDouble(4)
      // per-dim error <= scale/127/2 (+ float slack), L2 <= sqrt(d) * that
      val bound = math.sqrt(dims.toDouble) * scale / (2 * 127.0) * (1 + 1e-6)
      assert(err <= bound, s"vec ${r.getLong(0)}: err $err > bound $bound")
    }
  }

  test("hierarchical codebook: partitioning-invariant, dense (coarse, sub) ids") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cb1 = Similarity.learnHierarchicalCentroids(emb, 16,
      "test_hier_c1", "test_hier_l1")
    // the per-cell refine runs inside flatMapGroups — its seeds must be
    // partitioning-independent (the sort-by-vec_id claim), or no two
    // cluster runs would train the same codebook
    val cb2 = Similarity.learnHierarchicalCentroids(emb.repartition(7), 16,
      "test_hier_c2", "test_hier_l2")
    assert(cb1.coarse.map(_.toSeq).toSeq == cb2.coarse.map(_.toSeq).toSeq)
    assert(cb1.groups.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.groups.map(_.map(_.toSeq).toSeq).toSeq)
    assert(cb1.bases.toSeq == cb2.bases.toSeq)
    // global leaf ids are dense prefix sums of group sizes
    assert(cb1.bases.toSeq ==
      cb1.groups.scanLeft(0)(_ + _.length).init.toSeq)
    assert(cb1.leafCount <= 16)
    // every leaf the assignment can produce exists: each vector's cell
    // is within [0, leafCount)
    val cells = Similarity.hierAssignedCells(emb, cb1)
      .select(col("cell")).distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < cb1.leafCount))
  }

  test("semdedup decision layer over hierarchical cells matches brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cb = Similarity.learnHierarchicalCentroids(emb, 16,
      "test_hier_c3", "test_hier_l3")
    val assigned = Similarity.hierAssignedCells(emb, cb)
    val got = EmbeddingOps.semDedupOver(assigned)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // independent recompute: per cell (no salting at this scale), a
    // vector is a dup of the smallest lower id within the threshold
    val rows = assigned.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; na += x * x; nb += y * y; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = rows.map { case (id, v, cell) =>
      val dupOf = rows.filter { case (oid, ov, ocell) =>
        ocell == cell && oid < id &&
          cos(ov, v) >= EmbeddingOps.SemDedupThreshold
      }.map(_._1).sorted.headOption
      (id, cell, dupOf.getOrElse(id), if (dupOf.isDefined) 1L else 0L)
    }
    assert(got.toSeq == want.toSeq)
  }

  test("semdedup matches an independent brute-force same-cell reimplementation") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val centroids = Similarity.learnCentroids(emb)
    val got = EmbeddingOps.semDedupOn(emb, centroids)
      .orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    // independent reimplementation: plain Scala, no shared kernels
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = centroids.map(_.map(_.toDouble))
    def cellOf(v: Array[Double]): Int =
      cents.zipWithIndex.map { case (c, i) => (-cos(v, c), i) }.min._2
    val cells = vecs.map { case (id, v) => id -> cellOf(v) }.toMap
    val expected = vecs.map { case (id, v) =>
      val dupOf = vecs
        .filter { case (oid, ov) =>
          oid < id && cells(oid) == cells(id) &&
            cos(ov, v) >= EmbeddingOps.SemDedupThreshold
        }
        .map(_._1).sorted.headOption
      (id, cells(id), dupOf.getOrElse(id), if (dupOf.isDefined) 1L else 0L)
    }
    assert(got.toSeq == expected.toSeq)
  }

  test("calibration: exact local recount of the md5-bucket pair moments") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def md5hex8(x: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dd += x * y; na += x * x; nb += y * y; i += 1
      }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }
    val byBucket = emb.keys.toSeq
      .groupBy(id => md5hex8(id) % EmbeddingOps.CalibrationBuckets)
      .filter(_._2.size >= 2)
    val cs = byBucket.values.toSeq.map { ids =>
      val v = cos(emb(ids.min), emb(ids.max)) * 1e9
      new JBD(v).setScale(0, RoundingMode.HALF_UP).longValueExact()
    }
    val n = cs.size.toLong
    val sc = cs.sum
    val scc = cs.map(c => BigInt(c) * BigInt(c)).sum
    val mean = sc.toDouble / n.toDouble / 1e9
    val varNum = (BigInt(n) * scc - BigInt(sc) * BigInt(sc)).toDouble
    val std = math.sqrt(varNum / (n * n).toDouble) / 1e9
    val row = EmbeddingOps.thresholdCalibration(spark, sf).collect().head
    assert(row.getLong(0) == n)
    assert(row.getDouble(1) == mean)
    assert(row.getDouble(2) == std)
    assert(row.getDouble(3) == mean + EmbeddingOps.CalibrationZ * std)
    // the calibrated cutoff sits above the background tail the fixed
    // 0.45 threshold was drowning in
    assert(row.getDouble(3) > Similarity.NearDupThreshold)
  }

  test("calibrated dedup: survivors equal the candidate-pair recount") {
    val thr = EmbeddingOps.thresholdCalibration(spark, sf)
      .collect().head.getDouble(3)
    // nearDupPairs is the same candidate stream filtered at 0.45; the
    // calibrated cutoff is above it (asserted in the moments test), so
    // filtering the public pair stream reproduces the decision input
    val dups = Similarity.nearDupPairs(spark, sf).collect()
      .filter(_.getDouble(2) >= thr).map(_.getLong(1)).toSet
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val survivors = EmbeddingOps.calibratedDedup(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(survivors == all -- dups)
  }

  test("int8 search preserves the exact top-k (recall floor)") {
    val exact = Similarity.topKExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val i8 = EmbeddingOps.topKInt8(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(i8.contains).toDouble / exact.size
    // measured 1.0 at both verification scales; floor leaves margin for
    // corpus regeneration
    assert(recall >= 0.9, s"int8 recall@10 $recall below floor")
  }

  test("semdedup: survivor rule invariants hold") {
    val out = EmbeddingOps.semDedup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, keeper, isDup) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(keeper <= id)
      assert((keeper == id) == (isDup == 0L))
    }
  }

  test("binary pack: planted sign patterns produce the known words") {
    val allPos = Array.fill(64)(1.0f)
    val allNeg = Array.fill(64)(-1.0f)
    val zeros = Array.fill(64)(0.0f) // x >= 0 counts as 1
    val bit0 = allNeg.clone(); bit0(0) = 1.0f
    val bit33 = allNeg.clone(); bit33(33) = 1.0f
    val df = Seq((1L, allPos), (2L, allNeg), (3L, zeros),
      (4L, bit0), (5L, bit33)).toDF("vec_id", "embedding")
    val got = EmbeddingOps.packedSignBits(df).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0xFFFFFFFFL, 0xFFFFFFFFL),
      (2L, 0L, 0L),
      (3L, 0xFFFFFFFFL, 0xFFFFFFFFL),
      (4L, 1L, 0L),
      (5L, 0L, 2L)))
  }

  test("binary serve: rows come from the hamming shortlist, ordered by exact cosine") {
    val codes = EmbeddingOps.quantizeBinary(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Long =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // independent brute-force shortlist per query
    val shortlists = (0L until Similarity.NumQueryVectors).map { q =>
      q -> codes.keys.filter(_ != q).toSeq
        .map(id => (ham(codes(q), codes(id)), id))
        .sorted.take(EmbeddingOps.BinaryShortlist).map(_._2).toSet
    }.toMap
    val out = EmbeddingOps.topKBinary(spark, sf).collect()
    assert(out.length == Similarity.NumQueryVectors * Similarity.TopK)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      byRank.foreach { r =>
        assert(shortlists(q).contains(r.getLong(2)),
          s"query $q served vec ${r.getLong(2)} outside the hamming shortlist")
        assert(r.getLong(3) >= 0 && r.getLong(3) <= 64)
      }
      // rerank order: exact cosine desc, id asc on ties
      val scores = byRank.map(r => (r.getDouble(4), r.getLong(2)))
      assert(scores.zip(scores.tail).forall { case (a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) })
    }
  }

  test("matryoshka serve: rows come from the prefix-cosine shortlist") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosD(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val shortlists = (0L until Similarity.NumQueryVectors).map { q =>
      val qp = emb(q).take(EmbeddingOps.MatryoshkaDims)
      q -> emb.keys.filter(_ != q).toSeq
        .map(id => (-cosD(qp, emb(id).take(EmbeddingOps.MatryoshkaDims)), id))
        .sorted.take(EmbeddingOps.MatryoshkaShortlist).map(_._2).toSet
    }.toMap
    val out = EmbeddingOps.topKMatryoshka(spark, sf).collect()
    assert(out.length == Similarity.NumQueryVectors * Similarity.TopK)
    out.foreach { r =>
      assert(shortlists(r.getLong(0)).contains(r.getLong(2)),
        s"query ${r.getLong(0)} served vec ${r.getLong(2)} outside the prefix shortlist")
    }
  }

  test("binary and matryoshka recall audits agree with a local recount") {
    val exact = Similarity.topKExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recount(approx: Set[(Long, Long)], audit: Array[org.apache.spark.sql.Row]): Unit =
      audit.foreach { r =>
        val q = r.getLong(0)
        val hits = exact.count { case (eq, id) => eq == q && approx((q, id)) }
        assert(r.getLong(1) == hits.toLong)
        assert(r.getDouble(2) == hits.toDouble / Similarity.TopK)
      }
    recount(EmbeddingOps.topKBinary(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet,
      EmbeddingOps.binaryRecall(spark, sf).collect())
    recount(EmbeddingOps.topKMatryoshka(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet,
      EmbeddingOps.matryoshkaRecall(spark, sf).collect())
  }
}
