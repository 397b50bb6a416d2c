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
    * value is a literal or an object-reference chain
    * (basic.py:164–204 `_invert_filters`):
    *
    *  - `|db|name|chain|` — the general form: `name` resolves against
    *    `tables` (fnmatch semantics in the reference; exact name
    *    here), `chain` is a dotted attribute path navigated into the
    *    table's (possibly nested-struct) columns. A bare chain takes
    *    the value via `first` — the reference reads one object's
    *    attribute, so the target is a single-row/uniform table; an
    *    `agg(chain)` terminal (avg/min/max/sum/count) reduces a
    *    multi-row table to the scalar explicitly.
    *  - `|ip|self|chain|` — trainer self-reference: resolved against
    *    `tables("self")` the same way (basic.py:186–191).
    *  - `|name|agg(attr)|` — legacy 2-part agg form.
    */
  def parse(expr: String, tables: Map[String, DataFrame]): Filter = {
    val m = raw"^(\S+)\s*(<=|>=|==|!=|<|>|=)\s*(.+)$$".r
    expr.trim match {
      case m(attr, op, rhs) =>
        val value = rhs.trim match {
          case r if r.startsWith("|") && r.endsWith("|") =>
            val parts = r.stripPrefix("|").stripSuffix("|").split("\\|")
            parts match {
              case Array(otype @ ("db" | "ip"), oname, chain) =>
                val key = if (otype == "ip" && oname == "self") "self" else oname
                val df = tables.getOrElse(key,
                  throw new IllegalArgumentException(s"unknown $otype $key"))
                ScalarRef(df, chainAgg(chain))
              case Array(name, chain) =>
                val df = tables.getOrElse(name,
                  throw new IllegalArgumentException(s"unknown db $name"))
                ScalarRef(df, chainAgg(chain))
              case _ =>
                throw new IllegalArgumentException(s"bad object reference: $r")
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

  /** Compile an attribute chain (`a.b.c` or `agg(a.b.c)`) to the
    * scalar-producing aggregate column. */
  private def chainAgg(chain: String): Column = {
    val aggR = raw"^(avg|min|max|sum|count)\((\S+)\)$$".r
    chain match {
      case aggR(fn, path) =>
        val c = col(path)
        fn match {
          case "avg" => avg(c); case "min" => min(c)
          case "max" => max(c); case "sum" => sum(c)
          case "count" => count(c)
        }
      case path => first(col(path), ignoreNulls = true)
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
