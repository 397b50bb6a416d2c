/* In-tree extension package: lives under org.apache.spark.sql so it
 * can use the private[sql] Expression/Column bridge — the standard
 * pattern for Spark-native extension libraries. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst intersection size for SORTED string arrays — the
  * exact-verify hot path of the near-dup joins (d4 / d4_neardup).
  *
  * `size(array_intersect(a, b))` builds a hash set over `a` and
  * probes every element of `b` PER ROW — at half a million candidate
  * pairs with ~150-token sets, the per-row set construction and
  * UTF8String hashing dominate the verify stage. When both arrays are
  * pre-sorted once per DOCUMENT (array_sort at tokenize time — cost
  * amortized over every pair the doc appears in), intersection size
  * is a single merge walk of binary comparisons with zero per-row
  * allocation, inside whole-stage codegen.
  *
  * PRECONDITION: both inputs sorted ascending in UTF8String binary
  * order (exactly `array_sort`'s ordering for StringType) with no
  * null elements. The result is the plain set-intersection size, so
  * swapping this in for `size(array_intersect(...))` over the same
  * (distinct, sorted) inputs cannot change query output — the DuckDB
  * oracles stay hash-identical.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (x.isNullAt(i) || y.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_intersect_size: null array elements are not supported")
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $na = $x.numElements();
         |int $nb = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_size: null array elements are not supported");
         |  }
         |  int $cmp = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  /** Column surface: codegen'd merge-walk intersection size over two
    * sorted array<string> columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
