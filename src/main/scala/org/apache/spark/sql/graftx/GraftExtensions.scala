package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native graft
  * expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` plans the codegen'd
  * expression. Enable with
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graftx.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftExtensions.dotProductBuilder))
  }
}

object GraftExtensions {
  private[graftx] val dotProductBuilder: Seq[Expression] => Expression =
    children => {
      require(children.length == 2, "dot_product(a, b) takes 2 arguments")
      DotProduct(children(0), children(1))
    }

  /** Imperative registration for an already-built session (extensions
    * only apply at build time — `getOrCreate` on an existing session
    * ignores `withExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", dotProductBuilder, "built-in")
}
