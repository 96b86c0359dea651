package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink format coverage beyond parquet and text: CSV and JSON
  * round-trips preserve the documents table exactly (schema provided on
  * read — schema inference on a 100 TB lake is an anti-pattern, so the
  * engine always reads with explicit schemas). */
class FormatsSpec extends SparkSpec {

  private def docs = graft.core.Tables.documents(spark, sfDir)

  test("CSV round-trip preserves all rows and values") {
    val dir = Files.createTempDirectory("graft-csv").toString
    docs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").csv(dir)
    val back = spark.read.schema(docs.schema)
      .option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JSON round-trip preserves all rows and values") {
    val dir = Files.createTempDirectory("graft-json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("ORC round-trip preserves all rows and values") {
    val dir = Files.createTempDirectory("graft-orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docs.schema).orc(dir)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("parquet round-trips under zstd, snappy, and gzip codecs") {
    for (codec <- Seq("zstd", "snappy", "gzip")) {
      val dir = Files.createTempDirectory(s"graft-$codec").toString
      docs.write.mode("overwrite").option("compression", codec).parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == docs.count(), s"codec $codec lost rows")
      assert(back.exceptAll(docs).isEmpty, s"codec $codec corrupted values")
    }
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val oneLang = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = oneLang.queryExecution.executedPlan.toString
    // partition pruning: the scan's partition filter carries the lang
    // predicate, so only lang=en directories are read
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition pruning in:\n$plan")
    assert(oneLang.count() == docs.filter(col("lang") === "en").count())
  }
}
