package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The V2 connector must agree with the wholetext DocSource byte-for-byte
  * and push column pruning into the scan (doc_id-only reads never open the
  * files). */
class DocV2SourceSpec extends SparkSpec {

  private val dir = "/root/reference/sample_input_files"

  private def v2(n: Int) =
    spark.read.format("graft-docs").option("numFiles", n.toString).load(dir)

  test("v2 source equals the wholetext DocSource on the reference corpus") {
    val a = v2(6).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val b = DocSource.read(spark, dir, 6).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.length == 6)
    assert(a.toSeq == b.toSeq)
  }

  test("numFiles selects a strict prefix, like the reference CLI") {
    assert(v2(1).select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(0L))
    assert(v2(5).count() == 5)
  }

  test("column pruning reaches the scan: doc_id-only plans read no content") {
    val df = v2(6).select("doc_id")
    val scans = df.queryExecution.executedPlan.collect { case s: BatchScanExec => s }
    assert(scans.nonEmpty, s"no BatchScanExec in:\n${df.queryExecution.executedPlan}")
    val schema = scans.head.scan.readSchema()
    assert(schema.fieldNames.toSeq == Seq("doc_id"),
      s"content not pruned: ${schema.simpleString}")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (0L to 5L))
  }

  test("doc_id predicates prune input partitions (file-level filter pushdown)") {
    val df = v2(6).filter(col("doc_id") >= 2 && col("doc_id") < 5)
    val scans = df.queryExecution.executedPlan.collect { case s: BatchScanExec => s }
    assert(scans.nonEmpty)
    // the filter reached the scan…
    assert(scans.head.scan.description().contains("pushedFilters=[") &&
      scans.head.scan.description().contains("doc_id"),
      s"filters not pushed: ${scans.head.scan.description()}")
    // …and only the 3 matching files were planned as partitions
    assert(scans.head.inputRDD.getNumPartitions == 3)
    assert(df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L, 4L))
  }

  test("map1 char-class pipeline over the v2 source matches the golden totals") {
    // golden 1.output: map1 over file 0 only (num_files=1) — FIXTURES.md §A
    graft.functions.Registry.register(spark)
    val rows = v2(1)
      .select(expr("char_class_counts(content)").as("c"))
      .select(
        sum(element_at(col("c"), 1)).as("letters"),
        sum(element_at(col("c"), 2)).as("numbers"),
        sum(element_at(col("c"), 3)).as("others"))
      .head()
    val expected = scala.io.Source.fromFile("/root/reference/sample_output_files/1.output")
      .getLines().map(_.split(' ')).map(a => a(0) -> a(1).toLong).toMap
    assert(rows.getLong(0) == expected("letters"))
    assert(rows.getLong(1) == expected("numbers"))
    assert(rows.getLong(2) == expected("others"))
  }
}
