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
  final case class Attr(parts: Seq[String]) extends Node {
    def name: String = parts.last
  }
  final case class Lit(value: Any) extends Node
  case object Opaque extends Node

  def nodeOf(c: Column): Node = conv(c.node)

  /** Parse a raw SQL expression string straight to the ADT (round
    * 14): `functions.expr(sql)`'s Column wraps a SqlExpression node
    * that [[conv]] cannot see through — the constraint-reference
    * checks in rename/drop need the parsed tree, not Opaque. */
  def nodeOfSql(sql: String): Node =
    convCatalyst(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sql))

  /** Does the predicate reference a `<qualifier>.…` attribute? (Used
    * by merge to detect clause conditions over the TARGET side.) */
  def referencesQualifier(c: Column, qualifier: String): Boolean = {
    def walk(n: Node): Boolean = n match {
      case Fn(_, args) => args.exists(walk)
      case Attr(parts) => parts.length > 1 &&
        parts.head.equalsIgnoreCase(qualifier)
      case _ => false
    }
    walk(nodeOf(c))
  }

  /** Qualify every BARE attribute reference with `qualifier` (round
    * 16, one-join merge): a clause condition written against plain
    * source column names must evaluate over the two-sided
    * target/source pair join exactly as it evaluated over the aliased
    * single-sided source frame in the per-clause-join design —
    * without the rewrite, plain names are AMBIGUOUS over the join.
    * Already-qualified references (`target.x`, `source.x`) pass
    * through untouched. */
  def qualifyBare(c: Column, qualifier: String): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    // ExpressionUtils.expression wraps the ColumnNode LAZILY
    // (ColumnNodeExpression is a leaf to transformUp) — convert
    // eagerly through the classic converter so the catalyst tree is
    // walkable, then rewrite the bare references.
    val in = org.apache.spark.sql.classic.ColumnNodeToExpressionConverter
      .apply(c.node)
    val out = in.transformUp {
        case a: UnresolvedAttribute if a.nameParts.length == 1 =>
          UnresolvedAttribute(qualifier +: a.nameParts)
      }
    org.apache.spark.sql.classic.ExpressionUtils.column(out)
  }

  private def conv(n: org.apache.spark.sql.internal.ColumnNode): Node =
    n match {
      case f: org.apache.spark.sql.internal.UnresolvedFunction =>
        Fn(f.functionName.toLowerCase(java.util.Locale.ROOT),
          f.arguments.map(conv))
      case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
        Attr(a.nameParts)
      case l: org.apache.spark.sql.internal.Literal => Lit(l.value)
      // Columns minted from catalyst trees (the SQL MERGE/DELETE
      // rewrite path builds clause conditions via
      // ExpressionUtils.column): surface the catalyst shape under the
      // same ADT so referencesQualifier/predBounds see through them.
      case w: org.apache.spark.sql.classic.ExpressionColumnNode =>
        convCatalyst(w.expression)
      case _ => Opaque
    }

  private def convCatalyst(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Node = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Attr(a.nameParts)
      case a: ce.AttributeReference => Attr(a.qualifier :+ a.name)
      case l: ce.Literal => Lit(l.value)
      case ce.And(l, r) => Fn("and", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.Or(l, r) => Fn("or", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.Not(c) => Fn("not", Seq(convCatalyst(c)))
      case ce.EqualTo(l, r) => Fn("=", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.EqualNullSafe(l, r) =>
        Fn("<=>", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.GreaterThan(l, r) =>
        Fn(">", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.GreaterThanOrEqual(l, r) =>
        Fn(">=", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.LessThan(l, r) => Fn("<", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.LessThanOrEqual(l, r) =>
        Fn("<=", Seq(convCatalyst(l), convCatalyst(r)))
      case ce.In(v, list) => Fn("in", convCatalyst(v) +: list.map(convCatalyst))
      case other => Fn(other.prettyName.toLowerCase(java.util.Locale.ROOT),
        other.children.map(convCatalyst))
    }
  }
}
