package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_intersect_count(a, b)` over two SORTED-ASCENDING, DISTINCT
  * `array<bigint>` columns → the intersection cardinality as a long.
  *
  * Equal by definition to `size(array_intersect(a, b))` on such inputs
  * (the precondition every dedup pipeline here satisfies: shingle-hash
  * sets are built `distinct` and `sort_array`ed), but computed as a
  * single linear merge with zero allocation — `array_intersect` builds a
  * hash set of one side AND materializes the intersection array, only for
  * `size` to throw it away. The verification step of the Jaccard /
  * MinHash-LSH pipelines runs this once per candidate pair, so the saved
  * allocations are per-pair, not per-query.
  *
  * The oracle SQL keeps counting via its own join/list arithmetic — the
  * VALUE is what's pinned, and SetExpressionsSpec differentially pins
  * this expression to `size(array_intersect(...))` on random inputs.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val xi = ctx.freshName("xi")
    val yj = ctx.freshName("yj")
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
        int $nx = $x.numElements();
        int $ny = $y.numElements();
        int $i = 0, $j = 0;
        long $c = 0L;
        while ($i < $nx && $j < $ny) {
          long $xi = $x.getLong($i);
          long $yj = $y.getLong($j);
          if ($xi == $yj) { $c++; $i++; $j++; }
          else if ($xi < $yj) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
