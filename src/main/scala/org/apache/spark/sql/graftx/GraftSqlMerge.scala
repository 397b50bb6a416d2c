package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** SQL `MERGE INTO` for graftv tables (round 12).
  *
  * Spark's own MERGE planning requires the connector to implement
  * `SupportsRowLevelOperations` (a rewrite-plan protocol sized for
  * Delta/Iceberg's file-replacement executors); graftv's upsert
  * machinery already exists as [[graft.sources.Versioned.mergeClauses]]
  * — file-granular COW with Delta clause semantics, CDF, and conflict
  * rebase. This parser-level bridge is the idiomatic
  * `SparkSessionExtensions` seam for that: the delegate parser
  * produces the standard [[MergeIntoTable]] plan, and a top-level
  * rewrite repackages it as a leaf command that — AT RUN TIME —
  * resolves whether the target is a graftv table (session-catalog
  * `USING graftv` tables by provider, or the Delta-style
  * `graftv.`/path`` direct form) and routes it through the library
  * merge. Non-graftv targets re-enter Spark's own machinery
  * untouched, so the extension never changes behavior for other
  * formats.
  *
  * Mapping (mirrors the reference's active-set upsert loop, the
  * write pattern behind database/active.py:158–205):
  *  - `ON` must be a conjunction of `t.k = s.k` equalities on
  *    same-named columns — they become the merge KEYS (graftv rows
  *    are identified by key columns, not row ids);
  *  - `WHEN MATCHED [AND c] THEN UPDATE SET *` → whole-row update;
  *    `UPDATE SET col = expr, …` → partial-column SET map;
  *    `THEN DELETE` → tombstone clause; chains keep SQL order
  *    (first-match-wins, Delta's rule);
  *  - `WHEN NOT MATCHED [AND c] THEN INSERT *` / `INSERT (cols)
  *    VALUES (exprs)` → insert clauses (unset columns NULL);
  *  - `WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE / UPDATE SET
  *    col = expr` → target-row clauses over the rows no source key
  *    matches (Delta's third clause family; conditions and SETs see
  *    the target row alone, and the merge reads the whole table —
  *    there is no key range to prune by);
  *  - the source must be union-compatible with the target: every
  *    table column present (it is projected to the table schema
  *    before the merge; staging-only source columns are not
  *    reachable from clause expressions — keep flags in table
  *    columns or express them in the ON/AND conditions);
  *  - `WITH SCHEMA EVOLUTION` → the engine's additive mergeSchema:
  *    source-only columns join the table as nullable, untouched
  *    files read back null-filled, time travel sees each version
  *    under its own DDL.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  private def rewrite(plan: LogicalPlan): LogicalPlan =
    // time travel FIRST: the command wrappers are LEAF nodes (their
    // inner plan is not a child), so a VERSION AS OF inside e.g. a
    // MERGE source must resolve before the wrap or never
    GraftTimeTravel(session, plan) match {
      case m: MergeIntoTable => GraftMergeIntoCommand(m)
      case u: UpdateTable => GraftUpdateCommand(u)
      case a: AddColumns => GraftAddColumnsCommand(a)
      case a: org.apache.spark.sql.catalyst.plans.logical.AlterColumns =>
        GraftAlterColumnsCommand(a)
      case a: org.apache.spark.sql.catalyst.plans.logical.RenameColumn =>
        GraftRenameColumnCommand(a)
      case a: org.apache.spark.sql.catalyst.plans.logical.DropColumns =>
        GraftDropColumnsCommand(a)
      // Spark's parser emits AddCheckConstraint for CHECK and
      // AddConstraint for the other families (PK/FK/UNIQUE — which
      // the command rejects for graftv targets)
      case a: org.apache.spark.sql.catalyst.plans.logical
          .AddCheckConstraint =>
        GraftAddConstraintCommand(a, a.child, Some(
          (a.checkConstraint.userProvidedName, a.checkConstraint.condition)))
      case a: org.apache.spark.sql.catalyst.plans.logical.AddConstraint =>
        GraftAddConstraintCommand(a, a.table, None)
      case d: org.apache.spark.sql.catalyst.plans.logical.DropConstraint =>
        GraftDropConstraintCommand(d)
      case other => other
    }
  override def parsePlan(sqlText: String): LogicalPlan =
    // maintenance statements (OPTIMIZE/VACUUM/RESTORE/DESCRIBE
    // HISTORY) lead with keywords Spark's grammar does not know —
    // pre-matched so the delegate's ParseException stays the error
    // for anything malformed (see GraftSqlMaintenance.scala)
    if (GraftMaintenanceSql.leads(sqlText))
      GraftMaintenanceSql.parse(sqlText)
        .getOrElse(rewrite(delegate.parsePlan(sqlText)))
    else rewrite(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    if (GraftMaintenanceSql.leads(sqlText))
      GraftMaintenanceSql.parse(sqlText)
        .getOrElse(rewrite(delegate.parsePlanWithParameters(sqlText, ctx)))
    else rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

/** Shared target resolution for the SQL row-level commands: unwrap
  * the (possibly aliased) relation, then decide graftv-ness at RUN
  * time — `graftv.`/path`` directly, or a session-catalog table by
  * provider. */
private[graftx] object GraftSqlTarget {
  /** (alias, nameParts) of a bare/aliased relation target. */
  def unwrap(p: LogicalPlan, what: String,
      alias: Option[String] = None): (Option[String], Seq[String]) =
    p match {
      case SubqueryAlias(id, child) =>
        unwrap(child, what, alias.orElse(Some(id.name)))
      case UnresolvedRelation(parts, _, _) => (alias, parts)
      case other => throw new IllegalArgumentException(
        s"graftv $what: the target must be a table, got ${other.nodeName}")
    }

  /** The graftv table path, or None when the target is another
    * format's table (the caller re-enters Spark's native handling).
    * Only table-genuinely-absent exceptions classify as "not ours"
    * (ADVICE r12: a catch-all here silently re-routed a graftv MERGE
    * through Spark's native path on a transient metastore/IO failure,
    * masking the real error); anything else propagates. A leading
    * `spark_catalog` part is stripped (the session catalog's
    * fully-qualified 3-part form). */
  def pathOf(spark: SparkSession, tParts: Seq[String]): Option[String] = {
    val parts =
      if (tParts.length == 3 &&
        tParts.head.equalsIgnoreCase("spark_catalog")) tParts.tail
      else tParts
    if (parts.length == 2 && parts.head.equalsIgnoreCase("graftv"))
      Some(parts(1)) // graftv.`/path` direct form
    else {
      val identOpt = parts match {
        case Seq(tbl) => Some(TableIdentifier(tbl))
        case Seq(db, tbl) => Some(TableIdentifier(tbl, Some(db)))
        case _ => None
      }
      identOpt.flatMap { ident =>
        try {
          val meta = spark.sessionState.catalog.getTableMetadata(ident)
          if (meta.provider.exists(_.equalsIgnoreCase("graftv")))
            Some(meta.location.toString)
          else None
        } catch {
          case _: org.apache.spark.sql.catalyst.analysis
            .NoSuchTableException => None
          // covers NoSuchNamespaceException too (its subclass)
          case _: org.apache.spark.sql.catalyst.analysis
            .NoSuchDatabaseException => None
        }
      }
    }
  }
}

/** Leaf command carrying the PARSED (unresolved) MergeIntoTable; all
  * resolution happens in run() through public DataFrame machinery, so
  * the analyzer never sees a plan shape it would reject. */
case class GraftMergeIntoCommand(merge: MergeIntoTable)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import graft.sources.Versioned

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (tAlias, tParts) =
      GraftSqlTarget.unwrap(merge.targetTable, "MERGE INTO")
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None =>
        // not ours: hand the ORIGINAL plan to Spark's machinery (its
        // native row-level-operation path, or its native error)
        org.apache.spark.sql.classic.Dataset.ofRows(spark, merge)
          .collect().toSeq
      case Some(path) =>
        runGraft(spark, path, tAlias.getOrElse(tParts.last))
    }
  }

  private def runGraft(spark: org.apache.spark.sql.classic.SparkSession,
      path: String, targetQual: String): Seq[Row] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"graftv MERGE INTO: $msg")
    // WITH SCHEMA EVOLUTION maps to the engine's mergeSchema: source-
    // only columns join the table as nullable (see
    // Versioned.mergeClauses)

    val sourceQual: Option[String] = merge.sourceTable match {
      case SubqueryAlias(id, _) => Some(id.name)
      case UnresolvedRelation(parts, _, _) => Some(parts.last)
      case _ => None
    }
    def isQual(parts: Seq[String], q: String): Boolean =
      parts.length > 1 && parts.head.equalsIgnoreCase(q)

    // clause expressions re-qualify to the engine's `target`/`source`
    // aliases; unqualified names stay (they resolve source-side in
    // source-only conditions, and error loudly where ambiguous)
    def requalify(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute if isQual(a.nameParts, targetQual) =>
        UnresolvedAttribute("target" +: a.nameParts.tail)
      case a: UnresolvedAttribute
          if sourceQual.exists(q => isQual(a.nameParts, q)) =>
        UnresolvedAttribute("source" +: a.nameParts.tail)
    }
    def colOf(e: Expression): Column = ExpressionUtils.column(requalify(e))

    // ---- ON: conjunction of t.k = s.k equalities → merge keys
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys: Seq[String] = conjuncts(merge.mergeCondition).map {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          a: UnresolvedAttribute, b: UnresolvedAttribute) =>
        val (t, s) =
          if (isQual(a.nameParts, targetQual)) (a, b)
          else if (isQual(b.nameParts, targetQual)) (b, a)
          else fail(s"ON conjunct ${a.sql} = ${b.sql} must qualify the " +
            s"target side as $targetQual.<col>")
        require(sourceQual.forall(q => isQual(s.nameParts, q)),
          s"graftv MERGE INTO: ON conjunct must compare against the " +
            s"source (${s.sql})")
        require(t.nameParts.last.equalsIgnoreCase(s.nameParts.last),
          s"graftv MERGE INTO: ON keys must be same-named columns " +
            s"(got ${t.sql} = ${s.sql}); rename in the source query")
        t.nameParts.last
      case other => fail("the ON condition must be a conjunction of " +
        s"target.k = source.k equalities, got ${other.sql}")
    }

    def setOf(assigns: Seq[Assignment]): Map[String, Column] =
      assigns.map { a =>
        val name = a.key match {
          case k: UnresolvedAttribute => k.nameParts.last
          case other => fail(s"SET key must be a column, got ${other.sql}")
        }
        name -> colOf(a.value)
      }.toMap

    val matchedClauses: Seq[Versioned.WhenMatched] =
      merge.matchedActions.map {
        case DeleteAction(cond) =>
          Versioned.WhenMatched.Delete(cond.map(colOf))
        case UpdateAction(cond, assigns, _) =>
          Versioned.WhenMatched.Update(cond.map(colOf), setOf(assigns))
        case UpdateStarAction(cond) =>
          Versioned.WhenMatched.Update(cond.map(colOf), Map.empty)
        case other => fail(s"unsupported matched action $other")
      }
    val notMatchedClauses: Seq[Versioned.WhenNotMatched] =
      merge.notMatchedActions.map {
        case InsertAction(cond, assigns) =>
          Versioned.WhenNotMatched.Insert(cond.map(colOf), setOf(assigns))
        case InsertStarAction(cond) =>
          Versioned.WhenNotMatched.Insert(cond.map(colOf), Map.empty)
        case other => fail(s"unsupported not-matched action $other")
      }
    // WHEN NOT MATCHED BY SOURCE: target-row-scoped — strip the
    // target qualifier so conditions/SETs resolve over the row alone
    // (there is no source row; source references error loudly)
    def tgtRowCol(e: Expression): Column =
      ExpressionUtils.column(e.transformUp {
        case a: UnresolvedAttribute if isQual(a.nameParts, targetQual) =>
          UnresolvedAttribute(a.nameParts.tail)
      })
    def tgtSetOf(assigns: Seq[Assignment]): Map[String, Column] =
      assigns.map { a =>
        val name = a.key match {
          case k: UnresolvedAttribute => k.nameParts.last
          case other => fail(s"SET key must be a column, got ${other.sql}")
        }
        name -> tgtRowCol(a.value)
      }.toMap
    val nmbsClauses: Seq[Versioned.WhenMatched] =
      merge.notMatchedBySourceActions.map {
        case DeleteAction(cond) =>
          Versioned.WhenMatched.Delete(cond.map(tgtRowCol))
        case UpdateAction(cond, assigns, _) =>
          Versioned.WhenMatched.Update(cond.map(tgtRowCol),
            tgtSetOf(assigns))
        case other => fail(s"unsupported not-matched-by-source action $other")
      }

    // ---- source: resolve, then project to the table schema (the
    // engine's union-compatibility contract)
    val srcRaw = org.apache.spark.sql.classic.Dataset.ofRows(
      spark, merge.sourceTable)
    val tableSchema = StructType.fromDDL(Versioned.snapshot(path).schemaDdl)
    val missing = tableSchema.fields.map(_.name)
      .filterNot(c => srcRaw.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"graftv MERGE INTO: the source is missing table column(s) " +
        s"${missing.mkString(", ")} — the source must be " +
        "union-compatible with the target")
    // table columns cast to their table types; with WITH SCHEMA
    // EVOLUTION the source-only columns ride along (they become the
    // evolved columns)
    val tableCast = tableSchema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
        .as(f.name)).toIndexedSeq
    val extras =
      if (!merge.withSchemaEvolution) Nil
      else srcRaw.columns.toSeq.filterNot(c =>
        tableSchema.fieldNames.exists(_.equalsIgnoreCase(c)))
        .map(org.apache.spark.sql.functions.col)
    val src = srcRaw.select(tableCast ++ extras: _*)

    Versioned.mergeClauses(src, path, keys, matchedClauses,
      notMatchedClauses, nmbsClauses,
      mergeSchema = merge.withSchemaEvolution)
    Seq.empty
  }
}

/** SQL `UPDATE t SET c = expr, … [WHERE pred]` for graftv tables
  * (round 12): routed through [[graft.sources.Versioned.updateWhere]]
  * — file-granular COW keyed on the predicate's necessary bounds, CDF
  * update_preimage/update_postimage rows, append-rebase conflict
  * resolution. SET expressions and the predicate are over the target
  * ROW (qualified references are stripped to plain columns). Non-
  * graftv targets re-enter Spark's native machinery untouched. */
case class GraftUpdateCommand(update: UpdateTable)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import graft.sources.Versioned

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (tAlias, tParts) = GraftSqlTarget.unwrap(update.table, "UPDATE")
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None =>
        org.apache.spark.sql.classic.Dataset.ofRows(spark, update)
          .collect().toSeq
      case Some(path) =>
        val targetQual = tAlias.getOrElse(tParts.last)
        // row-scoped rewrite: target-qualified refs become plain
        // column refs (updateWhere evaluates over the row alone)
        def requalify(e: Expression): Expression = e.transformUp {
          case a: UnresolvedAttribute if a.nameParts.length > 1 &&
              a.nameParts.head.equalsIgnoreCase(targetQual) =>
            UnresolvedAttribute(a.nameParts.tail)
        }
        def colOf(e: Expression) = ExpressionUtils.column(requalify(e))
        val set: Map[String, org.apache.spark.sql.Column] =
          update.assignments.map { a =>
            val name = a.key match {
              case k: UnresolvedAttribute => k.nameParts.last
              case other => throw new IllegalArgumentException(
                s"graftv UPDATE: SET key must be a column, got ${other.sql}")
            }
            name -> colOf(a.value)
          }.toMap
        val pred = update.condition.map(colOf)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        Versioned.updateWhere(spark, path, pred, set)
        Seq.empty
    }
  }
}
