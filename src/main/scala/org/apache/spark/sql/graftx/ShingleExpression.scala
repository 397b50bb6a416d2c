/* In-tree extension package: lives under org.apache.spark.sql so it
 * can use the private[sql] Expression/Column bridge — the standard
 * pattern for Spark-native extension libraries. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst word-n-gram shingling (the MinHash/dedup hot
  * path). Replaces the per-document Scala UDF: operating directly on
  * `ArrayData`/`UTF8String` skips the UDF's UTF8String → String →
  * Array[String] → UTF8String conversion round-trip, and
  * `doGenCode` keeps the surrounding split/explode/md5 pipeline in
  * whole-stage codegen (the kernel itself is one static call, like
  * Spark's own collection expressions).
  *
  * Semantics are IDENTICAL to the old UDF (d2/d8 oracle parity):
  * inputs are the tokens of Spark's `split(text, " ")` (limit −1 —
  * trailing empties kept, matching DuckDB `string_split`); fewer
  * than n tokens → empty array; else the num−n+1 sliding windows
  * joined by a single space. */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes
    with Serializable {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(in: Any): Any =
    Shingles.build(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"org.apache.spark.sql.graftx.Shingles.build($x, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared kernel for interpreted eval and codegen. */
  def build(tokens: ArrayData, n: Int): ArrayData = {
    val num = tokens.numElements()
    if (num < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](num - n + 1)
      var i = 0
      while (i <= num - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column surface: shingles over a token array. */
  def shingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(Shingles(ExpressionUtils.expression(tokens), n))
}
