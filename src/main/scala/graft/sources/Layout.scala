package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}

/** Data-layout control for scan pruning — the write-side half of "filters
  * reach the scan". Parquet stores min/max statistics per file and per row
  * group; a reader's pushed predicate skips any unit whose range misses.
  * But stats only PRUNE if the layout gives them narrow ranges: randomly
  * laid-out data has every file spanning the whole domain, so every file
  * matches every filter.
  *
  * [[writeSorted]] range-repartitions on the clustering key (Spark samples
  * the key distribution to build balanced, globally-ordered, DISJOINT
  * partition ranges) and sorts within each partition, so each output
  * file's [min, max] is tight and non-overlapping — a point/range filter
  * then touches ~1 file instead of all of them. LayoutSpec proves it from
  * the parquet footers: disjoint file ranges, and a Spark scan over a
  * narrow filter reads fewer rows than the file count times file size
  * would imply.
  *
  * This is the single-column form of the technique multi-dimensional
  * layouts (Z-order/Hilbert curves) generalize; for one predicate column,
  * plain range-sort IS the optimal layout.
  */
object Layout {

  /** Write `df` as parquet clustered by `key`: `files` range partitions,
    * each internally sorted, each a separate file with tight footer
    * stats. */
  def writeSorted(df: DataFrame, key: String, path: String, files: Int): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** The comparison baseline: same data, hash-scattered layout — every
    * file spans the full key domain, so footer stats prune nothing. */
  def writeScattered(df: DataFrame, key: String, path: String, files: Int): Unit =
    df.repartition(files, col(key))
      .write.mode("overwrite").parquet(path)

  /** Morton (Z-order) interleave of two non-negative integer keys: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1, so sorting by the
    * z-value clusters rows that are close in BOTH dimensions — the
    * standard multi-dimensional layout (the curve behind Delta/Iceberg's
    * OPTIMIZE ZORDER BY; Morton 1966). A static fold of shift/mask
    * Columns, fully codegen'd. Caller bounds both keys below 2^bits. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .plus(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Write `df` parquet Z-ordered on two keys: range-partition + sort on
    * the interleaved z-value, so every file's footer box is tight in BOTH
    * key dimensions — a predicate on EITHER key (or a box on both) prunes
    * files, where [[writeSorted]] only ever prunes its single sort key.
    * This is the layout choice that matters at 100 TB: re-clustering once
    * at write time buys every subsequent scan's pruning. */
  def writeZOrdered(
      df: DataFrame, k1: String, k2: String,
      path: String, files: Int, bits: Int = 21): Unit =
    df.withColumn("__z", zValue(col(k1), col(k2), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
