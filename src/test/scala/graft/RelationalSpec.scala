package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("every declared relational query runs and returns rows at sf0.001") {
    Relational.specs.foreach { spec =>
      val n = spec.fn(spark, sf).count()
      assert(n > 0, s"${spec.name} returned no rows")
    }
  }

  test("star join groups to the five regions") {
    val rows = Relational.starJoin(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).sorted.sameElements(
      Array("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")))
    // revenue_e4 is exact integer units; revenue is its single float division
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1) / 10000.0)
      assert(r.getLong(3) > 0)
    }
  }

  test("topk is ordered descending with deterministic tie-break") {
    val rows = Relational.topK(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("window top-per-group emits at most 3 per nation, rank starts at 1") {
    val rows = Relational.windowTopPerGroup(spark, sf).collect()
    val byNation = rows.groupBy(_.getLong(0))
    assert(byNation.values.forall(_.length <= 3))
    assert(byNation.values.forall(_.map(_.getLong(3)).min == 1))
  }

  test("json flatten extracts integer k from props payload") {
    val rows = Relational.jsonFlatten(spark, sf).limit(50).collect()
    assert(rows.forall(r => !r.isNullAt(2)))
  }

  test("normalize-cast strips non-numerics and casts to double") {
    val rows = Relational.normalizeCast(spark, sf).limit(50).collect()
    assert(rows.forall(r => r.getDouble(1) >= 0))
  }

  test("ts format emits warehouse string-timestamp contract") {
    val re = "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$".r
    val rows = Relational.tsFormat(spark, sf).limit(50).collect()
    assert(rows.forall(r => re.matches(r.getString(1))))
  }
}
