package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("cms: overestimate is nonnegative and zero for collision-free rows") {
    val out = Sketches.heavyHittersQuery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) >= 0, s"undercount: $r")
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("cms grid is a monoid: split-and-fold equals the whole grid") {
    val docs = Tables.documents(spark, sf)
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val whole = Sketches.cmsGrid(toks(docs)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val folded = Sketches.cmsGrid(toks(docs.filter(col("doc_id") % 2 === 0)))
      .unionByName(Sketches.cmsGrid(toks(docs.filter(col("doc_id") % 2 === 1))))
      .groupBy(col("row"), col("bucket")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(folded == whole && whole.nonEmpty)
    // bounded state: the grid never exceeds depth x width cells
    assert(whole.size <= Sketches.CmsDepth * Sketches.CmsWidth)
  }
}
