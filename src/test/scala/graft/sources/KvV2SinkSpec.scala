package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.Registry
import graft.operators.MapReduceTasks

/** The V2 write path (`format("graft-kv")`) must honor the reference's
  * output contract (sorted "key value" lines for golden parity), the
  * two-phase rename commit (no partial/temp files visible after commit),
  * and overwrite-as-truncate semantics. */
class KvV2SinkSpec extends SparkSpec {
  import spark.implicits._

  private val inDir = "/root/reference/sample_input_files"

  private def readAllLines(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq

  test("graft-kv golden mode: task1 written via the V2 sink byte-matches 1.output") {
    Registry.register(spark)
    val tmp = Files.createTempDirectory("graft-kv-golden").toString
    MapReduceTasks.task1(DocSource.read(spark, inDir, 1))
      .orderBy("key")
      .coalesce(1)
      .write.format("graft-kv").mode("append").save(tmp)
    val files = Files.list(Paths.get(tmp)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(files.size == 1, s"expected one part file, got $files")
    val golden = new String(Files.readAllBytes(
      Paths.get("/root/reference/sample_output_files/1.output")), "UTF-8")
    assert(new String(Files.readAllBytes(files.head), "UTF-8") == golden)
    // the commit cleaned up its temporary epoch directory
    assert(!Files.exists(Paths.get(tmp, "_temporary")) ||
      Files.list(Paths.get(tmp, "_temporary")).count() == 0)
  }

  test("multi-partition write emits one file per partition; lines are complete") {
    val tmp = Files.createTempDirectory("graft-kv-multi").toString
    val df = (1 to 1000).map(i => (s"k$i", i.toLong)).toDF("key", "value")
      .repartition(4)
    df.write.format("graft-kv").mode("append").save(tmp)
    val parts = Files.list(Paths.get(tmp)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(parts.size == 4)
    val lines = readAllLines(tmp)
    assert(lines.size == 1000)
    assert(lines.toSet == (1 to 1000).map(i => s"k$i $i").toSet)
  }

  test("mode overwrite truncates previous output; append accumulates") {
    val tmp = Files.createTempDirectory("graft-kv-trunc").toString
    Seq(("a", 1L)).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").mode("append").save(tmp)
    Seq(("b", 2L)).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").mode("append").save(tmp)
    assert(readAllLines(tmp).sorted == Seq("a 1", "b 2"))
    Seq(("c", 3L)).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").mode("overwrite").save(tmp)
    assert(readAllLines(tmp) == Seq("c 3"))
  }

  test("int-typed value column writes the same lines as long-typed") {
    val tmp = Files.createTempDirectory("graft-kv-int").toString
    Seq(("x", 7), ("y", 8)).toDF("key", "value").coalesce(1)
      .write.format("graft-kv").mode("append").save(tmp)
    assert(readAllLines(tmp).sorted == Seq("x 7", "y 8"))
  }

  test("a wrong schema is rejected at planning time") {
    val tmp = Files.createTempDirectory("graft-kv-bad").toString
    val bad = Seq((1.5, "x")).toDF("a", "b")
    val e = intercept[Exception] {
      bad.write.format("graft-kv").mode("append").save(tmp)
    }
    assert(e.getMessage.contains("graft-kv") ||
      e.getCause != null && e.getCause.getMessage.contains("graft-kv"))
  }
}
