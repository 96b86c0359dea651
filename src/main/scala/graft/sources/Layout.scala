package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

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
}
