package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `multiset_subtract(xs, ds)` — remove ONE copy of each element of `ds`
  * from `xs` (`array_except` would drop ALL copies). Element order of the
  * survivors is preserved. Null elements are never matched (kept).
  *
  * Interpreted eval on purpose (CodegenFallback): the consumer is
  * [[graft.sinks.MaterializedView]]'s reserve maintenance, which runs
  * this over touched-groups-sized frames of k-deep arrays — and the
  * lambda-HOF formulation (`filter` with nested `filter`/`slice`) it
  * replaces mis-evaluated when BOTH the lo and hi subtraction, the
  * exhaustion predicates, and the reserve-merge expressions shared one
  * wide projection (independent lambda trees interfered; isolated, each
  * evaluated correctly). A lambda-free native expression is immune by
  * construction and O(|xs|·|ds|) per row, which is k² at depth k.
  */
case class MultisetSubtract(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with Serializable {
  override def dataType: DataType = left.dataType
  @transient private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(elemType)
  override def nullSafeEval(xsAny: Any, dsAny: Any): Any = {
    val xs = xsAny.asInstanceOf[ArrayData]
    val ds = dsAny.asInstanceOf[ArrayData]
    val dn = ds.numElements()
    val used = new Array[Boolean](dn)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < xs.numElements()) {
      val x = xs.get(i, elemType)
      var matched = false
      if (x != null) {
        var j = 0
        while (!matched && j < dn) {
          if (!used(j)) {
            val d = ds.get(j, elemType)
            if (d != null && ordering.equiv(x, d)) {
              used(j) = true
              matched = true
            }
          }
          j += 1
        }
      }
      if (!matched) out += x
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `array_bound_filter(xs, bound, keepLe)` — the elements of `xs` that
  * are `<= bound` (`keepLe = true`) or `>= bound` (`keepLe = false`),
  * order preserved; null elements are dropped (not comparable). NULL
  * `bound` yields NULL (BinaryExpression null-intolerance), which the
  * consumer guards with `when`.
  *
  * Same lambda-free rationale as [[MultisetSubtract]]: the natural
  * `filter(xs, x -> x <= bound)` HOF is exactly the
  * outer-capture-lambda shape that mis-evaluated when two independent
  * trees (the lo and hi reserve merges) shared one wide projection in
  * [[graft.sinks.MaterializedView]]'s refresh. O(|xs|) per row on
  * touched-groups-sized frames of k-deep arrays.
  */
case class ArrayBoundFilter(left: Expression, right: Expression,
    keepLe: Boolean)
    extends BinaryExpression with CodegenFallback with Serializable {
  override def dataType: DataType = left.dataType
  @transient private lazy val elemType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(elemType)
  override def nullSafeEval(xsAny: Any, boundAny: Any): Any = {
    val xs = xsAny.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < xs.numElements()) {
      val x = xs.get(i, elemType)
      if (x != null) {
        val c = ordering.compare(x, boundAny)
        if (if (keepLe) c <= 0 else c >= 0) out += x
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  /** See [[MultisetSubtract]]. */
  def multisetSubtract(xs: Column, ds: Column): Column =
    GraftSqlBridge.column(MultisetSubtract(
      GraftSqlBridge.expression(xs), GraftSqlBridge.expression(ds)))

  /** See [[ArrayBoundFilter]]. */
  def boundFilter(xs: Column, bound: Column, keepLe: Boolean): Column =
    GraftSqlBridge.column(ArrayBoundFilter(
      GraftSqlBridge.expression(xs), GraftSqlBridge.expression(bound), keepLe))
}
