package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.classic.ExpressionUtils

/** Catalyst trees for the COMPOSED (non-native) SQL surfaces — the
  * content hash and the adaptive chunk length. Registered SQL
  * functions cannot embed the Column DSL (a builder's output skips the
  * ColumnNode conversion, leaving an Unevaluable wrapper in the plan),
  * so these build the catalyst expression tree directly; the Column
  * API surfaces (`graft.core.Hashing.contentHashCol`) delegate HERE so
  * the SQL function and the Dataset operator cannot drift. Everything
  * expands to built-in expressions — fully codegen'd, no UDF. */
object ComposedExpressions {

  /** array_join(transform(flatten(m), x -> format_number(x, 8)), ",")
    * — the canonical %.8f matrix flattening of the content hash. */
  private def flat(m: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("__ch_x"))
    ArrayJoin(
      ArrayTransform(Flatten(m), LambdaFunction(FormatNumber(x, Literal(8)), Seq(x))),
      Literal(","), None)
  }

  /** sha1 over canonicalized cell ⊕ positions ⊕ species — the
    * expression behind both `content_hash(...)` in SQL and
    * `Hashing.contentHashCol`. */
  def contentHashExpr(cell: Expression, positions: Expression,
      species: Expression): Expression =
    Sha1(ConcatWs(Seq(Literal("|"), flat(cell), flat(positions),
      ArrayJoin(species, Literal(","), None))))

  /** Column form (Dataset API surface). */
  def contentHash(cell: Column, positions: Column, species: Column): Column =
    ExpressionUtils.column(contentHashExpr(
      ExpressionUtils.expression(cell), ExpressionUtils.expression(positions),
      ExpressionUtils.expression(species)))

  /** CASE WHEN n <= t_1 THEN 1 … ELSE 8 END over shared integer
    * thresholds (see Hashing.prefixThresholds). */
  def chunkLenExpr(n: Expression, thresholds: Seq[(Int, Long)]): Expression =
    CaseWhen(
      thresholds.map { case (l, t) =>
        (LessThanOrEqual(n, Literal(t)): Expression, Literal(l): Expression)
      },
      Some(Literal(8)))

  /** LIKE with the fnmatch pattern compiled at plan time. */
  def fnmatchExpr(input: Expression, pattern: String): Expression =
    new Like(input, Literal(graft.functions.Fnmatch.toLike(pattern)))
}
