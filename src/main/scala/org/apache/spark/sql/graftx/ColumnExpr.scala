package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column

/** Column predicate-tree access (Spark 4 removed the public
  * `Column.expr`; the column's node tree and the classic converter
  * are `private[sql]`, reachable from this shim package). The tree is
  * surfaced as a tiny neutral ADT — just enough for
  * `Versioned.deleteWhere`'s necessary-bounds analysis; anything
  * unrecognized collapses to [[ColumnExpr.Opaque]] (analyzers must
  * treat it as unbounded). */
object ColumnExpr {
  sealed trait Node
  final case class Fn(name: String, args: Seq[Node]) extends Node
  final case class Attr(name: String) extends Node
  final case class Lit(value: Any) extends Node
  case object Opaque extends Node

  def nodeOf(c: Column): Node = conv(c.node)

  private def conv(n: org.apache.spark.sql.internal.ColumnNode): Node =
    n match {
      case f: org.apache.spark.sql.internal.UnresolvedFunction =>
        Fn(f.functionName.toLowerCase(java.util.Locale.ROOT),
          f.arguments.map(conv))
      case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
        Attr(a.nameParts.last)
      case l: org.apache.spark.sql.internal.Literal => Lit(l.value)
      case _ => Opaque
    }
}
