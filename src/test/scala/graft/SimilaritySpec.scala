package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal -> 0, identical -> 1, opposite -> -1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(1f, 0f), Array(-1f, 0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val c = df.collect().map(_.getDouble(0))
    assert(math.abs(c(0)) < 1e-12)
    assert(math.abs(c(1) - 1.0) < 1e-12)
    assert(math.abs(c(2) + 1.0) < 1e-12)
  }

  test("exact top-k: k rows per query, ranked by descending score") {
    val out = Similarity.topKExact(spark, sf).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.NumQueryVectors)
    byQuery.values.foreach { rows =>
      assert(rows.length == Similarity.TopK)
      val scores = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // self never appears among its own neighbors
      assert(!rows.exists(r => r.getLong(2) == r.getLong(0)))
    }
  }

  test("ANN top-k: same shape as exact, rank-i score bounded by exact rank-i") {
    val exactByQR = Similarity.topKExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ann = Similarity.topKAnn(spark, sf).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      exactByQR.get((r.getLong(0), r.getLong(1))).foreach { exactScore =>
        assert(r.getDouble(3) <= exactScore + 1e-12)
      }
    }
  }

  test("IVF top-k: k results per query, deterministic across runs") {
    val a = Similarity.topKIvf(spark, sf).collect()
    val byQuery = a.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.NumQueryVectors)
    byQuery.values.foreach(rows => assert(rows.length == Similarity.TopK))
    val b = Similarity.topKIvf(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("custom expressions are callable from SQL after registration") {
    graft.functions.GraftExpressions.register(spark)
    val row = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").collect()(0)
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
  }

  test("near-dup pairs: symmetric threshold semantics, a < b ordering") {
    val rows = Similarity.nearDupPairs(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= Similarity.NearDupThreshold)
    }
  }
}
