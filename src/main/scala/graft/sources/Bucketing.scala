package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once on its join key so
  * every later join/aggregation on that key is exchange-free — the
  * co-located-join lever for repeatedly-joined 100 TB tables (pay one
  * shuffle at ingest, never at query time).
  *
  * Spark only honors bucket metadata through the catalog (`saveAsTable`),
  * not bare parquet paths, so these write managed tables into the session's
  * warehouse. See BucketingSpec for the proof: a self-join on the bucket
  * key compiles to SortMergeJoin with NO Exchange on either side.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
