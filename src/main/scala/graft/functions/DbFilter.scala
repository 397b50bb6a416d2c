package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiler for the reference's trainer `dbfilter` predicates
  * (SURVEY §2.3 F4; reference: fitting/basic.py:57–60, `_invert_filters`
  * 164–204, `_filter_dbs` 347–391).
  *
  * Reference semantics: `{attr: {operator, value}}` where value may be
  * a literal or an *object-attribute reference* resolved against
  * another table (`|db|name|chain|`). The reference compiles these to
  * eval'd Python lambdas; here they become Catalyst expressions, and
  * reference-values become broadcast scalar subqueries — so the filter
  * stays fully distributed and pushdown-eligible.
  */
object DbFilter {

  sealed trait Value
  final case class Lit(v: Any) extends Value
  /** Scalar resolved from another DataFrame: an aggregate producing
    * exactly one row/col (the analog of the reference's
    * `|db|attr|` object reference chain). */
  final case class ScalarRef(df: DataFrame, agg: Column) extends Value

  final case class Filter(attr: String, op: String, value: Value)

  /** Apply filters to `df`. Literal filters become plain `where`
    * clauses (pushed to the scan); ScalarRef filters become a
    * broadcast single-row cross join + where, keeping everything on
    * executors (no driver collect in the plan-building hot path).
    */
  def apply(df: DataFrame, filters: Seq[Filter]): DataFrame =
    filters.foldLeft(df) { (d, f) =>
      f.value match {
        case Lit(v) => d.where(cmp(col(f.attr), f.op, lit(v)))
        case ScalarRef(src, agg) =>
          val scalarName = s"__dbf_${f.attr}_scalar"
          val one = src.agg(agg.as(scalarName))
          d.join(broadcast(one))
            .where(cmp(col(f.attr), f.op, col(scalarName)))
            .drop(scalarName)
      }
    }

  private def cmp(c: Column, op: String, v: Column): Column = op match {
    case "<"  => c < v
    case ">"  => c > v
    case "<=" => c <= v
    case ">=" => c >= v
    case "==" | "=" => c === v
    case "!=" => c =!= v
    case o    => throw new IllegalArgumentException(s"bad dbfilter op: $o")
  }
}
