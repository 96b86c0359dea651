package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-file text source with the reference engine's input contract:
  * documents are `{dir}/{i}.txt` for `i ∈ [0, numFiles)` (path convention
  * main.cpp:28-34, scan loop main.cpp:141-155). The file list is explicit —
  * NOT a directory glob — because the reference's `num_files` argument
  * selects a strict prefix of the corpus (the golden outputs 1.output and
  * 2.output are computed over 1 and 5 of the 6 sample files).
  *
  * Each file becomes one row (doc_id, content). `doc_id` is recovered from
  * the filename, not from task ordering, so it is stable under any split
  * or scheduling.
  *
  * Scale note: `wholetext` materializes each document as a single row, so
  * one file = one task's memory. That matches the reference exactly (it
  * too buffers whole files, main.cpp:36-47) and is right for corpus files
  * up to ~100s of MB; for multi-GB single documents a chunked
  * `binaryFile`-based reader would replace this source.
  */
object DocSource {

  def read(spark: SparkSession, dir: String, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val paths = (0 until numFiles).map(i => s"$dir/$i.txt")
    spark.read.option("wholetext", "true").text(paths: _*)
      .select(
        regexp_extract(input_file_name(), "(\\d+)\\.txt$", 1)
          .cast("long").as("doc_id"),
        col("value").as("content"))
  }

  /** binaryFile-based variant of [[read]] — same (doc_id, content) output,
    * different scan machinery: the binary source streams file content as a
    * `binary` column (with path/length/modTime metadata) rather than
    * decoding through the text line reader, which is the base to build a
    * chunked reader on when single documents outgrow task memory. Decoding
    * to string here assumes UTF-8, like the text variant. */
  def readBinary(spark: SparkSession, dir: String, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val paths = (0 until numFiles).map(i => s"$dir/$i.txt")
    spark.read.format("binaryFile").load(paths: _*)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.txt$", 1).cast("long").as("doc_id"),
        decode(col("content"), "UTF-8").as("content"))
  }
}
