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

  /** Parse the reference's string filter form: `attr op value` where
    * value is a literal or an `|db|agg(attr)|` object-reference chain
    * (basic.py:164–204 `_invert_filters`). The db name is resolved
    * against `tables`; supported aggs: avg/min/max/sum. */
  def parse(expr: String, tables: Map[String, DataFrame]): Filter = {
    val m = raw"^(\S+)\s*(<=|>=|==|!=|<|>|=)\s*(.+)$$".r
    expr.trim match {
      case m(attr, op, rhs) =>
        val value = rhs.trim match {
          case r if r.startsWith("|") && r.endsWith("|") =>
            val parts = r.stripPrefix("|").stripSuffix("|").split("\\|")
            require(parts.length == 2, s"bad object reference: $r")
            val df = tables.getOrElse(parts(0),
              throw new IllegalArgumentException(s"unknown db ${parts(0)}"))
            val aggR = raw"^(avg|min|max|sum)\((\S+)\)$$".r
            parts(1) match {
              case aggR(fn, col0) =>
                val c = col(col0)
                ScalarRef(df, fn match {
                  case "avg" => avg(c); case "min" => min(c)
                  case "max" => max(c); case "sum" => sum(c)
                })
              case other =>
                throw new IllegalArgumentException(s"bad agg ref: $other")
            }
          case r if r.matches("-?\\d+(\\.\\d+)?") =>
            Lit(if (r.contains('.')) r.toDouble else r.toLong)
          case r => Lit(r.stripPrefix("'").stripSuffix("'"))
        }
        Filter(attr, op, value)
      case other =>
        throw new IllegalArgumentException(s"bad dbfilter expr: $other")
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
