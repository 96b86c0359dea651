package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** The generic profiler must agree with independently-computed per-column
  * facts, and stay one row per schema column for any table. */
class ProfileSpec extends SparkSpec {

  test("profile emits one row per column with exact counts on orders") {
    val orders = Tables.orders(spark, sfDir)
    val nRows = orders.count()
    val rows = Profile.profileOrders(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == orders.schema.fieldNames.toSet)
    rows.values.foreach { r =>
      assert(r.getLong(1) == nRows)
      assert(r.getLong(2) == 0L) // testdata has no nulls
    }
    import org.apache.spark.sql.functions._
    val ndOk = orders.select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(rows("o_custkey").getLong(3) == ndOk)
    val mm = orders.agg(min("o_totalprice"), max("o_totalprice")).collect()(0)
    assert(rows("o_totalprice").getDouble(4) == mm.getDouble(0))
    assert(rows("o_totalprice").getDouble(5) == mm.getDouble(1))
    // numeric columns carry no string stats and vice versa
    assert(rows("o_totalprice").isNullAt(6) && rows("o_orderstatus").isNullAt(4))
    assert(rows("o_orderdate").getString(6).matches("""\d{4}-\d{2}-\d{2} .*"""))
  }

  test("profiler handles null-bearing columns") {
    import spark.implicits._
    val df = Seq((1, Some("a")), (2, None), (3, Some("b")))
      .toDF("id", "s")
    val p = Profile.profile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(p("s").getLong(2) == 1L)      // one null
    assert(p("s").getLong(3) == 2L)      // two distinct non-null values
    assert(p("s").getString(6) == "a" && p("s").getString(7) == "b")
    assert(p("id").getLong(2) == 0L && p("id").getDouble(4) == 1.0)
  }
}
