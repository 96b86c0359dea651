package graft.cli

import org.apache.spark.sql.SparkSession

import graft.functions.Registry
import graft.operators.MapReduceTasks
import graft.sources.{DocSource, TextSink}

/** Task-dispatch CLI with the reference driver's argument semantics
  * (main.cpp:68-95) minus the MPI worker counts, which Spark owns:
  *
  *   Main <inputDir> <numFiles> <outputPath> <taskNum>
  *
  * Reads `{inputDir}/{i}.txt` for i < numFiles, runs map task 1/2/3, and
  * writes the key-sorted `"key value"` single-file output — the exact
  * shape graded by the reference's golden files.
  *
  * Second form — the full analytics inventory from the same entry point:
  *
  *   Main query <name> <sfDir> <outDir>
  *
  * runs any of the named `SparkEntry.queries` pipelines against a
  * scale-factor directory and writes the result as parquet, making every
  * operator in the library reachable without writing Scala.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("query")) { runQuery(args.drop(1)); return }
    require(args.length == 4,
      "usage: graft.cli.Main <inputDir> <numFiles> <outputPath> <taskNum>\n" +
        "   or: graft.cli.Main query <name> <sfDir> <outDir>")
    val Array(inputDir, numFiles, outputPath, taskNum) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Tables.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    Registry.register(spark)
    val docs = DocSource.read(spark, inputDir, numFiles.toInt)
    val result = taskNum.toInt match {
      case 1 => MapReduceTasks.task1(docs)
      case 2 => MapReduceTasks.task2(docs)
      case 3 => MapReduceTasks.task3(docs)
      case n => throw new IllegalArgumentException(s"unknown task $n (1|2|3)")
    }
    TextSink.writeGoldenFile(result, outputPath)
    spark.stop()
  }

  private def runQuery(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: graft.cli.Main query <name> <sfDir> <outDir>")
    val Array(name, sfDir, outDir) = args
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query '$name'; available:\n  " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString("\n  ")))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-$name")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Tables.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
