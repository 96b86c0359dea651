package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.agg.{GenericMapTask, ReduceOps, ReferenceTasks}
import graft.core.Doc
import graft.functions.Registry
import graft.operators.MapReduceTasks

/** The correctness floor (FIXTURES.md §A, SURVEY.md §5): byte-match the
  * reference's golden outputs sample_output_files/{1,2,3}.output, produced
  * over the exact numFiles prefixes the reference used (1, 5, 6 — verified
  * by recomputation in SURVEY §5). Covers DocSource (wholetext prefix
  * read), the three map tasks, the sum reduce, and TextSink's golden mode.
  */
class GoldenParitySpec extends SparkSpec {

  private val inDir = "/root/reference/sample_input_files"
  private val outDir = "/root/reference/sample_output_files"

  private val cases = Seq(
    (1, 1, MapReduceTasks.task1 _),
    (2, 5, MapReduceTasks.task2 _),
    (3, 6, MapReduceTasks.task3 _))

  private def golden(task: Int): String =
    new String(Files.readAllBytes(Paths.get(s"$outDir/$task.output")), "UTF-8")

  private def asText(df: DataFrame): String =
    df.orderBy("key").collect()
      .map(r => s"${r.get(0)} ${r.get(1)}").mkString("", "\n", "\n")

  for ((task, numFiles, fn) <- cases) {
    test(s"task $task over $numFiles files byte-matches $task.output") {
      Registry.register(spark)
      val docs = DocSource.read(spark, inDir, numFiles)
      assert(asText(fn(docs)) == golden(task))
    }
  }

  test("TextSink.writeGoldenFile produces the exact golden file bytes") {
    Registry.register(spark)
    val tmp = Files.createTempDirectory("graft-golden").toString
    val out = s"$tmp/1.output"
    TextSink.writeGoldenFile(MapReduceTasks.task1(DocSource.read(spark, inDir, 1)), out)
    assert(new String(Files.readAllBytes(Paths.get(out)), "UTF-8") == golden(1))
  }

  test("generic pluggable path (GenericMapTask + sumReduce) matches task1 golden") {
    import spark.implicits._
    val docs = DocSource.read(spark, inDir, 1)
      .withColumnRenamed("doc_id", "docId").as[Doc]
    val reduced = ReduceOps.sumReduce(GenericMapTask(ReferenceTasks.map1)(docs))
    val text = reduced.orderBy("key").collect()
      .map(kv => s"${kv.key} ${kv.value}").mkString("", "\n", "\n")
    assert(text == golden(1))
  }

  test("generic path agrees with optimized pipelines on all 6 files, all tasks") {
    import spark.implicits._
    Registry.register(spark)
    val docs = DocSource.read(spark, inDir, 6)
    val typed = docs.withColumnRenamed("doc_id", "docId").as[Doc]
    val pairs = Seq(
      (MapReduceTasks.task1 _, ReferenceTasks.map1 _),
      (MapReduceTasks.task2 _, ReferenceTasks.map2 _),
      (MapReduceTasks.task3 _, ReferenceTasks.map3 _))
    for ((opt, ref) <- pairs) {
      val fast = opt(docs).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val gen = ReduceOps.sumReduce(GenericMapTask(ref)(typed))
        .collect().map(kv => (kv.key, kv.value.toLong)).toSeq.sortBy(_._1)
      assert(fast == gen)
    }
  }

  test("binaryFile variant reads the identical corpus as wholetext") {
    val a = DocSource.read(spark, inDir, 6).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b = DocSource.readBinary(spark, inDir, 6).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
  }

  test("partitioned TextSink output concatenates to the sorted golden stream") {
    Registry.register(spark)
    val dir = Files.createTempDirectory("graft-sink").toString + "/out"
    TextSink.write(MapReduceTasks.task2(DocSource.read(spark, inDir, 5)), dir)
    // partition files read back in order must reproduce the sorted lines
    val lines = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(lines.mkString("", "\n", "\n") == golden(2))
  }

  test("CLI rejects bad arguments") {
    intercept[IllegalArgumentException] {
      graft.cli.Main.main(Array("x"))
    }
    intercept[IllegalArgumentException] {
      DocSource.read(spark, inDir, 0)
    }
  }

  test("DocSource honors the numFiles prefix, not the directory content") {
    assert(DocSource.read(spark, inDir, 2).count() == 2)
    val ids = DocSource.read(spark, inDir, 3).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L))
  }

  test("7-char key truncation at reduce (tasks.c:157-158 parity)") {
    import spark.implicits._
    val kvs = Seq(
      graft.core.KeyValue("abcdefgh", 1), // truncates to abcdefg
      graft.core.KeyValue("abcdefg", 2),
      graft.core.KeyValue("short", 3)).toDS()
    val out = ReduceOps.sumReduce(kvs).collect().map(kv => kv.key -> kv.value).toMap
    assert(out == Map("abcdefg" -> 3, "short" -> 3))
  }

  test("int32 wraparound sum parity with C int accumulation") {
    import spark.implicits._
    val kvs = Seq(
      graft.core.KeyValue("k", Int.MaxValue),
      graft.core.KeyValue("k", 1)).toDS()
    assert(ReduceOps.sumReduce(kvs).collect().head.value == Int.MinValue)
  }
}
