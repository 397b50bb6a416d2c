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

  /** Parse the reference's nested-list DSL text form, e.g.
    * `[["p_name","%","widget"],"&",["!",["p_size","<",10]]]` —
    * lists are predicates or op-joined sequences (aflux.py:97–129
    * `kfilter` recursion). Literals: double-quoted strings, numbers.
    */
  def parse(s: String): Pred = {
    val (p, rest) = parseNode(s.trim)
    require(rest.trim.isEmpty, s"trailing DSL input: $rest")
    p
  }

  private def parseNode(s: String): (Pred, String) = {
    require(s.startsWith("["), s"expected [ at: $s")
    var rest = s.drop(1).trim
    val elems = scala.collection.mutable.ArrayBuffer[Either[Pred, String]]()
    while (!rest.startsWith("]")) {
      if (rest.startsWith("[")) {
        val (p, r) = parseNode(rest)
        elems += Left(p); rest = r.trim
      } else {
        val tokR = """^("([^"]*)"|-?\d+(\.\d+)?|\w+)""".r
        val m = tokR.findFirstMatchIn(rest)
          .getOrElse(throw new IllegalArgumentException(s"bad DSL token: $rest"))
        val raw = m.group(1)
        elems += Right(if (raw.startsWith("\"")) raw.drop(1).dropRight(1) else raw)
        rest = rest.drop(m.end).trim
      }
      if (rest.startsWith(",")) rest = rest.drop(1).trim
    }
    rest = rest.drop(1) // consume ]
    val pred = elems.toSeq match {
      // ["!", [..]] negation
      case Seq(Right("!"), Left(p)) => Not(p)
      // [key, op, value] leaf
      case Seq(Right(k), Right(op), Right(v)) =>
        val value: Any =
          if (v.matches("-?\\d+")) v.toInt
          else if (v.matches("-?\\d+\\.\\d+")) v.toDouble
          else v
        Cmp(k, op, value)
      // [p1, "&"|"|", p2, ...] op-joined sequence
      case seq if seq.length >= 3 && seq.length % 2 == 1 =>
        val parts = seq.zipWithIndex.collect { case (Left(p), _) => p }
        val ops = seq.collect { case Right(o) => o }.distinct
        require(ops.length == 1 && (ops.head == "&" || ops.head == "|"),
          s"mixed/unknown joiners: $ops")
        if (ops.head == "&") And(parts: _*) else Or(parts: _*)
      case other =>
        throw new IllegalArgumentException(s"bad DSL node: $other")
    }
    (pred, rest)
  }

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
