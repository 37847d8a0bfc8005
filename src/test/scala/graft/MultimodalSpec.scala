package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table: binary payloads with cycling kinds and byte-exact sizes") {
    val rows = Multimodal.mediaStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Multimodal.kinds.contains(r.getString(1)))
      assert(r.getLong(2) > 0)
      assert(r.getString(3).length == 16) // 8 bytes -> 16 hex chars
    }
  }

  test("frame sample: 4 equal frames per media item") {
    val rows = Multimodal.frameSample(spark, sf).collect()
    val byMedia = rows.groupBy(_.getLong(0))
    byMedia.values.foreach { frames =>
      assert(frames.length == Multimodal.NumFrames)
      assert(frames.map(_.getLong(2)).distinct.length == 1) // equal length
    }
  }

  test("feature extract stub: deterministic, dimension-stable, norm matches") {
    val feats = Multimodal.extractFeatures(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feat.length == 8)
      val norm = math.sqrt(f.feat.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - f.feat_norm) < 1e-9)
      // payload is ascii text: bucket means must be in printable range
      assert(f.feat.forall(v => v >= 32f && v < 127f))
    }
    // determinism: second run identical
    val again = Multimodal.extractFeatures(spark, sf).collect()
    assert(feats.sortBy(_.media_id).map(_.feat.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feat.toSeq).toSeq)
  }
}
