package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text sink with the reference engine's output contract: one `"key value"`
  * line per record (format line main.cpp:171), key-sorted — the reference's
  * own output order is nondeterministic (unordered_map iteration,
  * main.cpp:285) and its golden files are key-sorted, so sorted output is
  * the canonical form.
  *
  * Two modes:
  *  - [[write]]: partitioned directory output (the scale path — the sort is
  *    a distributed range-partitioned sort and each partition writes its
  *    own file; files concatenate in partition order to a globally sorted
  *    stream).
  *  - [[writeGoldenFile]]: exactly one file at `path`, for byte-parity with
  *    the reference's single-file master sink (main.cpp:157-174). Uses
  *    coalesce(1) + a FileSystem rename of the staged part file — legacy-
  *    parity mode only, an anti-pattern at scale; no data flows through the
  *    driver either way.
  */
object TextSink {

  private def formatted(df: DataFrame): DataFrame =
    df.orderBy("key")
      .select(concat_ws(" ", col("key"), col("value")).as("value"))

  def write(df: DataFrame, dir: String): Unit =
    formatted(df).write.mode("overwrite").text(dir)

  def writeGoldenFile(df: DataFrame, path: String): Unit = {
    val staging = path + ".staging"
    // coalesce(1) after orderBy: coalesce does not shuffle, it concatenates
    // the sorted range partitions in partition-index order, so the single
    // output file stays globally key-sorted.
    formatted(df).coalesce(1).write.mode("overwrite").text(staging)
    val spark = df.sparkSession
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new Path(staging, "part-*"))
    require(part.length == 1, s"expected one staged part file, got ${part.length}")
    val target = new Path(path)
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(part(0).getPath, target)
    fs.delete(new Path(staging), true)
  }
}
