package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EmbeddingOps, Multimodal, QualityGate, Similarity}

/** Consistency pins for the audit-tier queries: each audit table must
  * agree with the standalone declared queries it summarizes (the
  * definitional-equality contract the funnel and recall queries claim).
  */
class AuditSpec extends SparkSpec {

  test("funnel stages agree with the standalone declared queries") {
    val f = Dedup.curationFunnel(spark, sf).collect().head
    val docs = Tables.documents(spark, sf)
    val nTotal = docs.count()
    assert(f.getLong(0) == nTotal)

    val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
    val nTrain = docs.filter(!isEval).count()
    assert(f.getLong(1) == nTrain)

    // n_gate: train docs passing the standalone gopher gate
    val keepIds = QualityGate.gopherRules(spark, sf)
      .filter(col("keep")).select(col("doc_id"))
    val nGate = docs.filter(!isEval).select(col("doc_id"))
      .join(keepIds, "doc_id").count()
    assert(f.getLong(2) == nGate)

    // monotone funnel, and the final stage is nonempty at test scale
    assert(f.getLong(0) >= f.getLong(1) && f.getLong(1) >= f.getLong(2) &&
      f.getLong(2) >= f.getLong(3) && f.getLong(3) >= f.getLong(4))
    assert(f.getLong(4) > 0 && f.getLong(5) > 0)
  }

  test("dedup group stats cover the corpus exactly") {
    val stats = Dedup.dedupGroupStats(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(stats.map(_.getLong(2)).sum == nDocs) // n_docs column partitions the corpus
    stats.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
  }

  test("ann recall equals a direct comparison of the two declared top-ks") {
    val rec = Similarity.annRecall(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Similarity.topKExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.topKAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val expected = exact.groupBy(_._1).map { case (q, hits) =>
      q -> hits.count(ann.contains).toLong
    }
    assert(rec == expected)
  }

  test("embedding stats count every vector and see the unit norms") {
    val stats = EmbeddingOps.embeddingStats(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(stats.map(_.getLong(1)).sum == n)
    stats.foreach { r =>
      assert(r.getLong(2) == 0L) // no zero vectors in this corpus
      assert(r.getDouble(3) > 0.99 && r.getDouble(4) < 1.01) // unit-normalized
      assert(r.getLong(5) == 64L && r.getLong(6) == 64L)
    }
  }

  test("pack stats conserve tokens and fill every non-final pack") {
    import graft.operators.Curation
    import graft.functions.TextFunctions
    val stats = Curation.packStats(spark, sf).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      // contiguous chopping: every pack except each source's last is full
      assert(r.getLong(2) >= r.getLong(1) - 1)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
    val byStats = stats.map(r => r.getString(0) -> r.getLong(3)).toMap
    val byDocs = Tables.documents(spark, sf).groupBy(col("source"))
      .agg(sum(TextFunctions.tokenCount(col("text"))).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStats == byDocs) // packing loses no tokens
  }

  test("modal dedup funnel agrees with the three standalone dedup decisions") {
    val f = Multimodal.dedupFunnel(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    def rollup(dec: org.apache.spark.sql.DataFrame) = {
      val rows = dec.collect().map(_.getLong(2))
      (rows.length.toLong, rows.sum, rows.length - rows.sum)
    }
    assert(f("image") == rollup(Multimodal.phashDedup(spark, sf)))
    assert(f("audio") == rollup(Multimodal.audioDedup(spark, sf)))
    assert(f("video") == rollup(Multimodal.videoDedup(spark, sf)))
    assert(f.keySet == Set("image", "audio", "video"))
  }

  test("quality survivor picks each component's longest doc, tie min id") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, sf)
    val toks = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comps = Dedup.dedupGroups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byComp = comps.groupBy(_._2)
    val rows = Dedup.qualitySurvivor(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count()) // partitions corpus
    rows.foreach { r =>
      val members = byComp(r.getLong(0)).map(_._1)
      assert(members.length.toLong == r.getLong(1))
      val expected = members.minBy(d => (-toks(d), d))
      assert(r.getLong(2) == expected && r.getLong(3) == toks(expected))
    }
  }

  test("balanced sample caps every source with contiguous ranks") {
    val rows = QualityGate.balancedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = rows.groupBy(_._2)
    val nSources = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(bySource.size.toLong == nSources)
    bySource.values.foreach { g =>
      assert(g.length <= QualityGate.BalancedCapPerSource)
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  test("phash dedup decision agrees with the pair stream") {
    val pairs = Multimodal.phashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expectedDupOf = pairs.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(_._1).min
    }
    val got = Multimodal.phashDedup(spark, sf).collect()
    got.foreach { r =>
      val (id, keeper, isDup) = (r.getLong(0), r.getLong(1), r.getLong(2))
      expectedDupOf.get(id) match {
        case Some(k) => assert(keeper == k && isDup == 1L)
        case None    => assert(keeper == id && isDup == 0L)
      }
    }
  }
}
