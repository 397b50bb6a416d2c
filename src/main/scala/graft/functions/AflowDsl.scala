package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the reference's AFLOW filter DSL (SURVEY §2.3 F3;
  * reference: database/aflux.py:23–135, operator table at 84–95,
  * `kfilter` at 97–129).
  *
  * Reference semantics: predicates are nested lists combining keyword
  * comparisons with ops `< > == % ~ & |`, where on *string* operands
  * `<` means suffix-match, `>` means prefix-match, `%` means contains,
  * and `~` negates. The reference compiles these to remote REST query
  * params; here they compile straight to Catalyst `Column` expressions
  * so pushdown/pruning apply (no eval, no UDF).
  */
object AflowDsl {

  sealed trait Pred
  /** key <op> value. Numeric values get numeric comparison; string
    * values get the AFLOW string semantics for < > %. */
  final case class Cmp(key: String, op: String, value: Any) extends Pred
  final case class And(ps: Pred*) extends Pred
  final case class Or(ps: Pred*) extends Pred
  final case class Not(p: Pred) extends Pred

  def compile(p: Pred): Column = p match {
    case And(ps @ _*) => ps.map(compile).reduce(_ && _)
    case Or(ps @ _*)  => ps.map(compile).reduce(_ || _)
    case Not(q)       => !compile(q)
    case Cmp(k, op, v) =>
      val c = col(k)
      (op, v) match {
        case ("==", s: String) => c === lit(s)
        case ("==", n)         => c === lit(n)
        case ("<", s: String)  => c.endsWith(lit(s))   // aflux.py:88 suffix
        case (">", s: String)  => c.startsWith(lit(s)) // aflux.py:89 prefix
        case ("%", s: String)  => c.contains(lit(s))   // aflux.py:90 contains
        case ("<", n)          => c < lit(n)
        case (">", n)          => c > lit(n)
        case ("<=", n)         => c <= lit(n)
        case (">=", n)         => c >= lit(n)
        case ("!=", n)         => c =!= lit(n)
        case (o, _) => throw new IllegalArgumentException(s"bad AFLOW op: $o")
      }
  }
}
