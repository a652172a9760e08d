package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Codegen'd |A ∩ B| over two SORTED string arrays, by linear merge.
  *
  * The built-in `size(array_intersect(a, b))` builds a hash set and
  * materializes the intersection array for every ROW — in a similarity
  * join's verification stage that row is a candidate PAIR, so the
  * allocation churn is per-pair, and `array_union` for the denominator
  * doubles it. Sorting each document's shingle set once (per doc, before
  * the join) lets the pair-side work collapse to an allocation-free
  * two-pointer merge that only counts: jaccard =
  * inter / (|A| + |B| - inter). Same trick as the merge step of a
  * sort-merge join, applied inside one expression.
  *
  * Both inputs MUST be sorted ascending with Spark's string ordering
  * (`array_sort`'s UTF8String binary order); unsorted input silently
  * undercounts.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SortedOverlapCount requires (array<string>, array<string>), got $other")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedOverlapCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.SortedOverlapCount.count($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}

object SortedOverlapCount {

  /** Two-pointer merge count; the kernel the generated code calls. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Column API over two sorted ARRAY<STRING> columns. */
  def sortedOverlapCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedOverlapCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
