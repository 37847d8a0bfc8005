package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink coverage: the engine reads and writes the mainstream file
  * formats losslessly (the reference had no file formats at all —
  * SURVEY.md §2.2 — but a complete engine needs them). Timestamps are
  * excluded from the CSV/JSON roundtrips' exact compare only where the
  * format itself is lossy about types; schemas are supplied explicitly on
  * read, as they must be at scale (inference = an extra full scan). */
class SourcesSpec extends SparkSpec {

  private def sample = Tables.customer(spark, sf).orderBy(col("c_custkey")).limit(200)

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    val x = a.orderBy(col("c_custkey")).collect()
    val y = b.orderBy(col("c_custkey")).collect()
    assert(x.length == y.length)
    x.zip(y).foreach { case (r1, r2) => assert(r1 == r2) }
  }

  test("parquet roundtrip is lossless") {
    val dir = Files.createTempDirectory("graft_pq").toString
    sample.write.mode("overwrite").parquet(dir)
    assertSame(sample, spark.read.parquet(dir))
  }

  test("csv roundtrip with explicit schema is lossless") {
    val dir = Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(sample.schema).option("header", "true").csv(dir)
    assertSame(sample, back)
  }

  test("json roundtrip with explicit schema is lossless") {
    val dir = Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assertSame(sample, back)
  }

  test("orc roundtrip is lossless") {
    val dir = Files.createTempDirectory("graft_orc").toString
    sample.write.mode("overwrite").orc(dir)
    assertSame(sample, spark.read.orc(dir))
  }

  test("streamGlob matches exactly the table, never a .parquet_old sibling") {
    // Both physical layouts a table ships in, each with a decoy sibling
    // that the old trailing-* glob silently ingested (r15 ADVICE #4):
    // a directory-shaped table next to `documents.parquet_old`, and a
    // single-file table next to the same. The exact-match glob must read
    // the table's rows once — not doubled.
    val rows = sample.select(col("c_custkey"), col("c_name"))
    val n = rows.count()

    val dirCase = Files.createTempDirectory("graft_glob_dir").toString
    rows.write.parquet(s"$dirCase/documents.parquet")
    rows.write.parquet(s"$dirCase/documents.parquet_old")

    val fileCase = Files.createTempDirectory("graft_glob_file").toString
    rows.coalesce(1).write.parquet(s"$fileCase/tmpw")
    val part = new java.io.File(s"$fileCase/tmpw").listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.copy(part, java.nio.file.Paths.get(s"$fileCase/documents.parquet"))
    Files.copy(part, java.nio.file.Paths.get(s"$fileCase/documents.parquet_old"))

    Seq(dirCase, fileCase).foreach { base =>
      val glob = Tables.streamGlob(base, "documents")
      // batch read through the same glob (schema-inference path)
      assert(spark.read.parquet(glob).count() == n)
      // streaming read: drain with availableNow into memory
      val q = spark.readStream.schema(rows.schema).parquet(glob)
        .writeStream.format("memory")
        .queryName(s"glob_${base.hashCode.abs}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft_glob_ckpt").toString)
        .start()
      q.awaitTermination()
      assert(spark.table(s"glob_${base.hashCode.abs}").count() == n)
    }
  }

  test("partitioned parquet write prunes on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    sample.write.mode("overwrite").partitionBy("c_mktsegment").parquet(dir)
    val seg = sample.select(col("c_mktsegment")).distinct().collect()
      .map(_.getString(0)).head
    val pruned = spark.read.parquet(dir).filter(col("c_mktsegment") === seg)
    // partition pruning: only the matching directory is listed in the plan
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      sample.filter(col("c_mktsegment") === seg).count())
    assert(scan.contains("PartitionFilters"))
  }
}
