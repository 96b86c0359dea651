package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeSet, CurrentRow, Expression, GenericInternalRow,
  JoinedRow, LessThan, LessThanOrEqual, Literal, RowFrame, RowNumber,
  SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection,
  UnsafeRow, WindowExpression, WindowSpecDefinition
}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution
}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension path for grouped top-k — the pattern
  *
  *   row_number() OVER (PARTITION BY g ORDER BY o)  ...  WHERE rn <= k
  *
  * rewritten into a first-class operator with better physics than the
  * window it replaces: Spark's WindowExec (and its 3.5+ WindowGroupLimit
  * helper) must SORT every partition's rows on (g, o) before assigning
  * row numbers, so a group with 10^8 rows costs an O(n log n) sort to keep
  * 3. [[TopKPerGroupExec]] instead keeps a bounded k-row buffer per group
  * in a hash map — O(n·log k) with no sort anywhere, shuffle-clustered on
  * the group key only, and map-side memory bounded by groups×k rows.
  *
  * The three pieces demonstrate the full custom-operator surface:
  * [[TopKPerGroup]] (logical), [[RewriteRankLimitToTopK]]
  * (`Rule[LogicalPlan]` matching the window+filter shape, including plans
  * Spark has already annotated with [[WindowGroupLimit]]), and
  * [[TopKPerGroupStrategy]] (`SparkStrategy` → [[TopKPerGroupExec]]).
  * Installed per-session via [[NativeTopK.install]]
  * (`spark.experimental.*`) or for all sessions via
  * [[graft.GraftExtensions]].
  *
  * Semantics are identical to row_number only when the ordering is total
  * within each group (ties broken by a unique column); the rule therefore
  * rewrites unconditionally but every shipped query using it carries a
  * unique tiebreaker, and the result is oracle-checked against the same
  * SQL as the window formulation.
  */
case class TopKPerGroup(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Matches Filter(rn <= k, [Project,] Window(row_number as rn)) — with an
  * optional interposed [[WindowGroupLimit]] from Spark's own
  * InferWindowGroupLimit, which becomes redundant and is dropped — and
  * replaces the stack with [[TopKPerGroup]]. The rank attribute keeps its
  * ExprId so downstream references (projects, sorts) are untouched. */
object RewriteRankLimitToTopK extends Rule[LogicalPlan] {

  private object RankLimit {
    /** (rankAttr, k) from `rn <= k` / `rn < k`. */
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) => Some((a, k - 1))
      case _ => None
    }
  }

  private object RowNumberWindow {
    /** (rnAlias, partitionSpec, orderSpec, child-below-any-group-limit). */
    def unapply(plan: LogicalPlan): Option[(Alias, Seq[Expression], Seq[SortOrder], LogicalPlan)] =
      plan match {
        case Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(part, order,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            _, _, child, _) =>
          val base = child match {
            case WindowGroupLimit(_, _, _, _, inner) => inner
            case other => other
          }
          Some((alias, part, order, base))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(RankLimit(rn, k), RowNumberWindow(alias, part, order, base))
        if rn.exprId == alias.exprId && order.nonEmpty && k >= 0 =>
      TopKPerGroup(part, order, k, alias.toAttribute, base)
    case Filter(RankLimit(rn, k),
          p @ Project(projList, RowNumberWindow(alias, part, order, base)))
        if rn.exprId == alias.exprId && order.nonEmpty && k >= 0 &&
          projList.forall(_.isInstanceOf[Attribute]) =>
      Project(p.projectList, TopKPerGroup(part, order, k, alias.toAttribute, base))
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(part, order, k, rankAttr, child) =>
      TopKPerGroupExec(part, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Hash-aggregation-style bounded top-k: one pass, per-group k-row sorted
  * buffers (binary-search insertion), no sort operator, no
  * requiredChildOrdering. Requires clustering on the group key so each
  * group lands wholly in one partition (Spark inserts the exchange). */
case class TopKPerGroupExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.SQLMetrics

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil
  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"),
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "number of input rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partSpec = partitionSpec
    val ordSpec = orderSpec
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val groups = longMetric("numGroups")
    val inRows = longMetric("numInputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partSpec, childOutput)
      val rowConv = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val ord = GenerateOrdering.generate(ordSpec, childOutput)
      val buffers = new java.util.LinkedHashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        inRows += 1
        val key = keyProj(row)
        var buf = buffers.get(key)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[UnsafeRow](kLocal)
          buffers.put(key.copy(), buf)
        }
        // binary search for the insertion point in the (orderSpec)-sorted
        // buffer; skip entirely when the row can't displace the current kth
        if (buf.length < kLocal || ord.compare(row, buf.last) < 0) {
          var lo = 0
          var hi = buf.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ord.compare(buf(mid), row) <= 0) lo = mid + 1 else hi = mid
          }
          buf.insert(lo, rowConv(row).copy())
          if (buf.length > kLocal) buf.remove(buf.length - 1)
        }
      }
      groups += buffers.size()
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val entries = buffers.values().iterator()
      new Iterator[InternalRow] {
        private var cur: scala.collection.mutable.ArrayBuffer[UnsafeRow] = _
        private var i = 0
        override def hasNext: Boolean = {
          while ((cur == null || i >= cur.length) && entries.hasNext) {
            cur = entries.next(); i = 0
          }
          cur != null && i < cur.length
        }
        override def next(): InternalRow = {
          rankRow.setInt(0, i + 1)
          val r = outProj(joined(cur(i), rankRow))
          i += 1
          outRows += 1
          r
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Query surface: top-3 orders per customer through the native operator,
  * constructed directly as a [[TopKPerGroup]] logical node (via the
  * Dataset.ofRows shim). Only the STRATEGY is installed session-wide —
  * it is inert for every plan that doesn't contain the node, so other
  * queries' window plans are untouched and the bench keeps an honest
  * window-vs-native comparison. The rewrite RULE is the opt-in path for
  * `spark.sql.extensions=graft.GraftExtensions` sessions (and is
  * exercised by PlansSpec in an isolated session). Shares the window
  * variant's oracle — the two formulations must agree exactly. */
object NativeTopK {

  /** Idempotently add the physical strategy to this session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy

  /** Also enable the window→top-k rewrite (session-wide — every
    * rank-limit window in the session goes native; used by the spec and
    * by GraftExtensions sessions). */
  def installWithRewrite(spark: SparkSession): Unit = {
    install(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteRankLimitToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankLimitToTopK
  }

  /** Build a DataFrame computing top-k per group over `df` through the
    * native operator. `orderCols` are (column, ascending) pairs; the rank
    * column is appended as `rn`. The ordering should be total within each
    * group (include a unique tiebreaker) for well-defined results. */
  def topKOf(df: DataFrame, partCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending}
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    def attr(n: String) = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${child.output.map(_.name)}"))
    val node = TopKPerGroup(
      partitionSpec = partCols.map(attr),
      orderSpec = orderCols.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending) },
      k = k,
      rankAttr = AttributeReference("rn", IntegerType, nullable = false)(),
      child = child)
    org.apache.spark.sql.GraftPlanShim.ofRows(spark, node)
  }

  def top3Native(spark: SparkSession, dir: String): DataFrame =
    topKOf(
      graft.core.Tables.orders(spark, dir)
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy("o_custkey", "rn")

  /** Same operator, different shape: top-3 spenders per hour — the group
    * key is a derived time bucket, showing the node composes with any
    * upstream aggregation. */
  def top3UsersPerHour(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val hourly = graft.core.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("user_id"))
      .agg(sum(col("value").cast(DecimalType(15, 2))).cast("double")
        .as("hour_value"))
    topKOf(hourly, Seq("bucket"),
      Seq(("hour_value", false), ("user_id", true)), 3)
      .orderBy("bucket", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_native_pergroup" -> (top3Native _),
    "topk_native_hourly_users" -> (top3UsersPerHour _)
  )

  val oracle: Map[String, String] = Map(
    "topk_native_pergroup" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "topk_native_hourly_users" ->
      """WITH hourly AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS hour_value
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, user_id, hour_value, rn FROM (
        |  SELECT bucket, user_id, hour_value,
        |    CAST(row_number() OVER (PARTITION BY bucket ORDER BY hour_value DESC, user_id) AS INTEGER) AS rn
        |  FROM hourly)
        |WHERE rn <= 3 ORDER BY bucket, rn""".stripMargin
  )
}
