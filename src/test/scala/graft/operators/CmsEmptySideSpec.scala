package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The planner scalar on degenerate corpora (r14 advice): a hash row
  * whose two CMS sides share no cells proves the true join empty — the
  * estimate must be 0, not an overstatement from dropping the row, and
  * never an NPE from an empty min. Forced here with a corpus that has
  * clicks but ZERO purchase events (one whole side's sketch is empty,
  * so every hash row is unshared). */
class CmsEmptySideSpec extends SparkSpec {

  private lazy val emptyPurchaseDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("cms_empty").toString
    val ev = spark.range(100).select(
      col("id").as("event_id"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("ts"),
      (col("id") % 7).as("user_id"),
      lit("click").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    ev.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("cmsJoinEstimate returns 0 (not NPE, not an overstatement) when " +
    "one join side is empty") {
    assert(Diagnostics.cmsJoinEstimate(spark, emptyPurchaseDir) == 0L)
  }

  test("joinSizeEstimate emits all 4 hash rows with inner_product 0 and " +
    "a green bound on the empty-side corpus") {
    val rows = Diagnostics.joinSizeEstimate(spark, emptyPurchaseDir).collect()
    assert(rows.length == 4, "the spine must keep unshared hash rows")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("inner_product")) == 0L)
      assert(r.getLong(r.fieldIndex("est_min")) == 0L)
      assert(r.getLong(r.fieldIndex("exact_size")) == 0L)
      assert(r.getBoolean(r.fieldIndex("within_bound")))
    }
  }
}
