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
}
