package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cosine_sim(a, b)` over two `array<float>` embedding columns → double.
  *
  * One fused pass accumulates dot product and both squared norms in doubles
  * (each float widened exactly), then `dot / (sqrt(na) * sqrt(nb))`. The
  * accumulation order is strictly sequential and mirrored in the DuckDB
  * oracle (`list_reduce` fold), so results are bit-identical across engines
  * — which is what makes the similarity queries hash-checkable.
  *
  * Scale rationale: the naive Spark formulation is three `aggregate()` /
  * `zip_with()` passes over the arrays per pair; at N·k similarity
  * computations per top-k query this expression keeps the hot loop inside
  * whole-stage codegen with zero per-element boxing or lambda dispatch.
  * Null elements count as 0.0 so the result is deterministic for ragged
  * data; a zero-norm side yields SQL NULL.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yi = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val denom = ctx.freshName("denom")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = $x.isNullAt($i) ? 0.0 : (double) $x.getFloat($i);
          double $yi = $y.isNullAt($i) ? 0.0 : (double) $y.getFloat($i);
          $dot += $xi * $yi;
          $na += $xi * $xi;
          $nb += $yi * $yi;
        }
        double $denom = Math.sqrt($na) * Math.sqrt($nb);
        if ($denom == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / $denom;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(a, b)` over two `array<float>` columns → double, same
  * sequential float→double accumulation as [[CosineSimilarity]]'s dot
  * term. Pairing it with PREcomputed per-vector norms turns an N·k cosine
  * scan from three array passes per pair into one:
  * `dot/(norm_a*norm_b)` is bit-identical to `cosine_sim` because
  * `sqrt(na)` is the same IEEE value whether computed per pair or once per
  * vector. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yi = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dot = ctx.freshName("dot")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += ($x.isNullAt($i) ? 0.0 : (double) $x.getFloat($i))
                * ($y.isNullAt($i) ? 0.0 : (double) $y.getFloat($i));
        }
        ${ev.value} = $dot;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `sq_dist(a, b)` → double: the exact squared euclidean distance with
  * the same ascending-component IEEE accumulation as the declarative
  * `aggregate(sequence(0, n-1), 0.0, (acc, i) -> acc + (a[i]-b[i])²)`
  * fold it replaces (r16): d = (double)a[i] − (double)b[i]; acc += d·d.
  * HOF folds are CodegenFallback, so the exact ground-truth L2 passes in
  * the IVF/ADC recall queries ran 64 boxed lambda steps per candidate
  * pair; this native codegen loop produces the bit-identical double for
  * every pair, so rankings and gate hashes are unchanged. Accepts
  * array<float> or array<double> on either side independently. */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist expects array<float>/array<double> operands, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    val getX = if (isFloat(left)) "getFloat" else "getDouble"
    val getY = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = ((double) $x.$getX($i)) - ((double) $y.$getY($i));
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

/** `CentroidSqDists(embedding, cents)` → `array<double>` of squared
  * euclidean distances to each codebook centroid, in codebook order.
  *
  * Why native (r16): the coarse-IVF assignment was a
  * `transform(sequence(0, k−1), j -> aggregate(sequence(0, 63), …))`
  * nested higher-order fold — HOFs are CodegenFallback, so every row
  * paid k·64 BOXED lambda steps. With the corpus-scaled k (k = n/1000,
  * [[graft.operators.Similarity]]) that interpreted constant grew with k
  * and the 10×-probe assignment pass read 3× its k=8 cost
  * (sim_ivf_kmeans 8.1 → 24.8 s at sf1). This expression runs the same
  * arithmetic as ONE tight codegen'd double loop over a referenced
  * `double[][]` codebook.
  *
  * Bit-exactness contract: per centroid, terms accumulate in ascending
  * component order from a 0.0 seed — `acc += (emb[i] − c[i])²` —
  * exactly the IEEE order of both the HOF fold it replaces and the
  * DuckDB oracle's `list_reduce(list_prepend(0.0, list_transform(…)))`,
  * so every gated distance/argmin hash is unchanged.
  *
  * The codebook rides as constructor metadata (broadcast with the task
  * closure like any literal; k ≤ 256 × 64 doubles = 128 KB ceiling),
  * NOT as a child expression — a k×64 literal array child would be
  * re-evaluated generically per row. */
case class CentroidSqDists(child: Expression, cents: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_sq_dists expects array<float> or array<double>, got ${t.simpleString}")
  }

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val isF = childIsFloat
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val c = matrix(j)
      var acc = 0.0
      var i = 0
      while (i < c.length) {
        val d = (if (isF) x.getFloat(i).toDouble else x.getDouble(i)) - c(i)
        acc += d * d
        i += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centMatrix", matrix, "double[][]")
    val out = ctx.freshName("out")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val c = ctx.freshName("c")
    val d = ctx.freshName("d")
    val get = if (childIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, x => {
      s"""
        double[] $out = new double[$m.length];
        for (int $j = 0; $j < $m.length; $j++) {
          double[] $c = $m[$j];
          double $acc = 0.0;
          for (int $i = 0; $i < $c.length; $i++) {
            double $d = ((double) $x.$get($i)) - $c[$i];
            $acc += $d * $d;
          }
          $out[$j] = $acc;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidSqDists =
    copy(child = newChild)
}
