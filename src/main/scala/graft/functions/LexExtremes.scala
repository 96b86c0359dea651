package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** `lex_max(a, b)` / `lex_min(a, b)` → `struct(a, b)` — the lexicographic
  * (a, b) extreme with the SAME ordering the built-in `max(struct(a, b))`
  * uses, but on a MUTABLE two-slot aggregation buffer.
  *
  * Why this exists (r15 verdict item 2): `max`/`min` over a struct keep
  * the struct itself as the buffer value, and a struct is not a mutable
  * UnsafeRow field type, so ONE such extreme silently drags the whole
  * aggregation — every co-resident codegen-friendly sum/count — onto
  * interpreted SortAggregate (`UnsafeRow.isMutable` is the planner's
  * split criterion; measured 5× on the profile stats pass at sf1, and
  * `evt_streaks` read 8.2× on the 10× probe for the same reason). This
  * aggregate stores the two fields in two primitive buffer slots
  * (double/long/date/… — anything mutable), so the deterministic
  * ARGMAX/ARGMIN pattern `extreme of (value, tiebreak-key)` plans as
  * codegen HashAggregate like any sum.
  *
  * Semantics: rows with a NULL first field are ignored (exactly the
  * built-in Max/Min null discipline); the second field is assumed
  * non-null on the rows that compete (the argmax call sites feed keys
  * and jaccards, never null — a NULL tiebreak competes as "not better",
  * keeping the buffer). Empty group → NULL struct, matching max(struct).
  *
  * Output field names are `a` and `b`: consumers select `x.a` / `x.b`.
  */
case class LexExtreme(left: Expression, right: Expression, isMax: Boolean)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def prettyName: String = if (isMax) "lex_max" else "lex_min"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("a", left.dataType), StructField("b", right.dataType)))

  override def checkInputDataTypes(): TypeCheckResult = {
    // orderable is required for correctness; a MUTABLE primitive type is
    // the whole point (an immutable slot would re-create the
    // SortAggregate fallback this aggregate exists to avoid), so an
    // immutable field type is rejected loudly rather than planned slowly.
    val bad = Seq(left, right).map(_.dataType).find(t =>
      !RowOrdering.isOrderable(t) || !UnsafeRow.isMutable(t))
    bad match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs orderable fixed-length (mutable-buffer) " +
          s"field types, got ${t.catalogString} — use max(struct(...)) " +
          "for immutable types and accept the SortAggregate")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val bufA = AttributeReference("lexA", left.dataType)()
  private lazy val bufB = AttributeReference("lexB", right.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bufA, bufB)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, left.dataType),
    Literal.create(null, right.dataType))

  /** (a, b) beats the current (curA, curB): empty buffer always loses;
    * otherwise strict on the first field, tie broken strictly on the
    * second — the exact struct-comparison order of max(struct(a, b)). */
  private def beats(a: Expression, b: Expression,
      curA: Expression, curB: Expression): Expression = {
    val primary = if (isMax) GreaterThan(a, curA) else LessThan(a, curA)
    val tie = if (isMax) GreaterThan(b, curB) else LessThan(b, curB)
    Or(IsNull(curA), Or(primary, And(EqualTo(a, curA), tie)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // a null `take` (null tiebreak on an exact first-field tie) keeps the
    // buffer: If treats a null predicate as false
    val take = And(IsNotNull(left), beats(left, right, bufA, bufB))
    Seq(If(take, left, bufA), If(take, right, bufB))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = And(IsNotNull(bufA.right),
      beats(bufA.right, bufB.right, bufA.left, bufB.left))
    Seq(If(take, bufA.right, bufA.left), If(take, bufB.right, bufB.left))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(bufA), Literal.create(null, dataType),
      CreateNamedStruct(Seq(Literal("a"), bufA, Literal("b"), bufB)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LexExtreme =
    copy(left = newLeft, right = newRight)
}
