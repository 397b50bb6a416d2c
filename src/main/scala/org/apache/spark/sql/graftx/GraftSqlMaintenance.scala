package org.apache.spark.sql.graftx

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** SQL MAINTENANCE statements for graftv tables (round 12) — the
  * statements Delta's extension parser adds for ITS lake format,
  * re-expressed over the graftv library surface:
  *
  *   OPTIMIZE <t> [ZORDER BY (c1[, c2])] [INTO <n> FILES]
  *   VACUUM <t> [RETAIN <n> VERSIONS]
  *   RESTORE <t> TO VERSION AS OF <v>
  *   DESCRIBE HISTORY <t>
  *
  * `<t>` is a session-catalog `USING graftv` table, `db.t`, or the
  * direct `graftv.`/path`` form. Spark's grammar has none of these
  * statements, so [[GraftSqlParser]] pre-matches the leading keyword
  * and hands the text here; anything that does not fully match falls
  * through to the delegate parser (whose ParseException is the right
  * error for a malformed statement). Non-graftv targets are a loud
  * error — these are graftv statements, there is no native fallback.
  *
  * Semantics note: VACUUM retains VERSIONS (the unit of graftv's log
  * retention), not hours — the statement mirrors
  * [[graft.sources.Versioned.vacuum]] honestly instead of aping
  * Delta's clock-based contract, and the in-flight-writer mtime grace
  * stays at its library default.
  */
private[graftx] object GraftMaintenanceSql {
  private def p(re: String): Pattern =
    Pattern.compile(re, Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  // <t>: `graftv`.`/path` | graftv.`/path` | `db`.`t` | db.t | t
  private val Tbl = """((?:[\w$]+|`[^`]*`)(?:\s*\.\s*(?:[\w$]+|`[^`]*`))?)"""
  private val Optimize = p(
    s"""^\\s*OPTIMIZE\\s+$Tbl(?:\\s+WHERE\\s+(.+?))?(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?(?:\\s+INTO\\s+(\\d+)\\s+FILES)?\\s*;?\\s*$$""")
  // OPTIMIZE t COMPACT [TARGET n MB] (round 16): stats-driven
  // small-file binpack — only files under target/2 (plus DV'd ones)
  // rewrite; right-sized files carry by reference.
  private val Compact = p(
    s"""^\\s*OPTIMIZE\\s+$Tbl\\s+COMPACT(?:\\s+TARGET\\s+(\\d+)\\s*MB)?\\s*;?\\s*$$""")
  private val Vacuum = p(
    s"""^\\s*VACUUM\\s+$Tbl(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*$$""")
  private val Restore = p(
    s"""^\\s*RESTORE\\s+$Tbl\\s+TO\\s+(?:VERSION\\s+AS\\s+OF\\s+(\\d+)|TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')\\s*;?\\s*$$""")
  private val History = p(
    s"""^\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Tbl\\s*;?\\s*$$""")
  private val Detail = p(
    s"""^\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Tbl\\s*;?\\s*$$""")
  // CONVERT TO GRAFTV parquet.`/dir` (round 13, Delta's CONVERT TO
  // DELTA shape): the target is a parquet DIRECTORY, not a graftv
  // table — the statement CREATES the table in place.
  private val Convert = p(
    s"""^\\s*CONVERT\\s+TO\\s+GRAFTV\\s+$Tbl\\s*;?\\s*$$""")
  // REORG TABLE t APPLY (PURGE) (round 15, Delta's statement):
  // rewrite ONLY the deletion-vector-carrying files (live rows) and
  // drop their sidecars — cost proportional to masked bytes, the
  // targeted alternative to a whole-scope OPTIMIZE.
  private val Reorg = p(
    s"""^\\s*REORG\\s+TABLE\\s+$Tbl\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*;?\\s*$$""")
  // CREATE TABLE t SHALLOW CLONE s [VERSION AS OF v] [LOCATION '/p']
  // (round 14, Delta's shallow-clone statement): zero-copy birth of a
  // new independent table referencing the source snapshot's files.
  // LOCATION accepts single- OR double-quoted literals (round 16:
  // only a double-quoted form can carry a path containing ')
  private val Clone = p(
    s"""^\\s*CREATE\\s+TABLE\\s+$Tbl\\s+SHALLOW\\s+CLONE\\s+$Tbl(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?(?:\\s+LOCATION\\s+(?:'([^']+)'|"([^"]+)"))?\\s*;?\\s*$$""")
  // (ALTER TABLE ADD/DROP CONSTRAINT rides the PLAN-rewrite hook like
  // ADD COLUMNS — Spark 4 parses the statements natively into
  // AddConstraint/DropConstraint plans; see GraftAddConstraintCommand.)

  /** Cheap pre-gate: does the statement LEAD with one of our
    * keywords? (Only then is the full match attempted — everything
    * else goes straight to the delegate parser.) */
  private val Lead = p(
    """^\s*(OPTIMIZE|VACUUM|RESTORE|CONVERT|REORG)\b.*|^\s*DESC(?:RIBE)?\s+(HISTORY|DETAIL)\b.*|^\s*CREATE\s+TABLE\b.*\bSHALLOW\s+CLONE\b.*""")
  def leads(sqlText: String): Boolean = Lead.matcher(sqlText).matches()

  /** Split a (possibly backticked) multipart identifier on its
    * TOP-LEVEL dots — dots inside backticks (e.g. a path ending in
    * `.parquet`) stay in their part. Backticks are stripped. */
  private def parts(tbl: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inTick = false
    tbl.foreach {
      case '`' => inTick = !inTick
      case '.' if !inTick => out += sb.toString.trim; sb.clear()
      case c => sb.append(c)
    }
    out += sb.toString.trim
    out.toSeq
  }

  def parse(sqlText: String): Option[LogicalPlan] = {
    val cpm = Compact.matcher(sqlText)
    if (cpm.matches())
      return Some(GraftCompactCommand(parts(cpm.group(1)),
        Option(cpm.group(2)).map(_.toInt)))
    val om = Optimize.matcher(sqlText)
    if (om.matches()) {
      val zorder = Option(om.group(3)).map(_.split(',').map(_.trim)
        .filter(_.nonEmpty).map(c => parts(c).last).toSeq).getOrElse(Nil)
      return Some(GraftOptimizeCommand(parts(om.group(1)), zorder,
        Option(om.group(4)).map(_.toInt),
        Option(om.group(2)).map(_.trim)))
    }
    val vm = Vacuum.matcher(sqlText)
    if (vm.matches())
      return Some(GraftVacuumCommand(parts(vm.group(1)),
        Option(vm.group(2)).map(_.toInt),
        dryRun = vm.group(3) != null))
    val rm = Restore.matcher(sqlText)
    if (rm.matches())
      return Some(GraftRestoreCommand(parts(rm.group(1)),
        Option(rm.group(2)).map(_.toInt),
        Option(rm.group(3))))
    val hm = History.matcher(sqlText)
    if (hm.matches())
      return Some(GraftHistoryCommand(parts(hm.group(1))))
    val dm = Detail.matcher(sqlText)
    if (dm.matches())
      return Some(GraftDetailCommand(parts(dm.group(1))))
    val cm = Convert.matcher(sqlText)
    if (cm.matches())
      return Some(GraftConvertCommand(parts(cm.group(1))))
    val rg = Reorg.matcher(sqlText)
    if (rg.matches())
      return Some(GraftReorgCommand(parts(rg.group(1))))
    val clm = Clone.matcher(sqlText)
    if (clm.matches())
      return Some(GraftCloneCommand(parts(clm.group(1)),
        parts(clm.group(2)),
        Option(clm.group(3)).map(_.toInt),
        Option(clm.group(4)).orElse(Option(clm.group(5)))))
    None
  }

  private[graftx] def graftPathOf(spark: SparkSession,
      tParts: Seq[String], what: String): String =
    GraftSqlTarget.pathOf(spark, tParts).getOrElse(
      throw new IllegalArgumentException(
        s"$what is a graftv statement: ${tParts.mkString(".")} is not " +
          "a graftv table (USING graftv, or the graftv.`/path` form)"))

  private[graftx] def attrsOf(ddl: String): Seq[Attribute] =
    StructType.fromDDL(ddl).fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())

  /** Timestamp STRING → epoch millis for maintenance statements,
    * mirroring the read-side time-travel rules: epoch-millis digits
    * pass through; `T`-form ISO parses as a zoned instant first, then
    * zone-less in the SESSION zone; `yyyy-MM-dd[ HH:mm:ss]` resolves
    * in the SESSION zone (never the JVM default — ADVICE r12). */
  private[graftx] def tsStringToMillis(spark: SparkSession,
      t: String): Long = {
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    if (t.nonEmpty && t.forall(_.isDigit)) t.toLong
    else if (t.contains("T"))
      try java.time.Instant.parse(t).toEpochMilli
      catch {
        case _: Exception =>
          java.time.LocalDateTime.parse(t).atZone(zone)
            .toInstant.toEpochMilli
      }
    else if (t.contains(" "))
      java.time.LocalDateTime.parse(t.replace(' ', 'T')).atZone(zone)
        .toInstant.toEpochMilli
    else
      java.time.LocalDate.parse(t).atStartOfDay(zone)
        .toInstant.toEpochMilli
  }
}

/** `OPTIMIZE t [WHERE pred] [ZORDER BY (…)] [INTO n FILES]` →
  * [[graft.sources.Versioned.optimize]] (compaction is an ONLINE op:
  * it rebases over any interloping append; WHERE scopes the rewrite
  * to the files whose stats may hold a matching row — compact
  * today's partition, never the table). Returns the new version (the
  * CURRENT version when WHERE touches no file — a no-op publishes
  * nothing). */
case class GraftOptimizeCommand(tParts: Seq[String], zorder: Seq[String],
    files: Option[Int], whereSql: Option[String] = None)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenanceSql.attrsOf("version INT")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts, "OPTIMIZE")
    // parse the WHERE text into a CATALYST expression and wrap it
    // (ExpressionUtils.column) — functions.expr() wraps a lazy
    // SqlExpression node the stats-pruning analyzer cannot see
    // through
    val whereCol = whereSql.map(s =>
      org.apache.spark.sql.classic.ExpressionUtils.column(
        spark.sessionState.sqlParser.parseExpression(s)))
    Seq(Row(graft.sources.Versioned.optimize(spark, path,
      numFiles = files.getOrElse(1), clusterBy = zorder,
      where = whereCol)))
  }
}

/** `OPTIMIZE t COMPACT [TARGET n MB]` →
  * [[graft.sources.Versioned.compact]]: stats-driven small-file
  * binpack reading selection from the log's size pseudo-stats —
  * cost ∝ small-file bytes, never table bytes. Returns the new
  * version (the current one when nothing is small enough). */
case class GraftCompactCommand(tParts: Seq[String], targetMb: Option[Int])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenanceSql.attrsOf("version INT")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts, "OPTIMIZE")
    Seq(Row(graft.sources.Versioned.compact(spark, path,
      targetBytes = targetMb.map(_.toLong * 1024 * 1024).getOrElse(0L))))
  }
}

/** `VACUUM t [RETAIN n VERSIONS] [DRY RUN]` →
  * [[graft.sources.Versioned.vacuum]] with the library's default
  * in-flight-writer grace. Returns the reclaimed (or, DRY RUN, the
  * would-be-reclaimed) file count — the operator's preflight before
  * waiving time travel past the horizon (Delta's form). */
case class GraftVacuumCommand(tParts: Seq[String], retain: Option[Int],
    dryRun: Boolean = false)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenanceSql.attrsOf("removed_files INT, dry_run BOOLEAN")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts, "VACUUM")
    Seq(Row(graft.sources.Versioned.vacuum(path,
      retainVersions = retain.getOrElse(
        graft.sources.Versioned.CheckpointInterval),
      dryRun = dryRun).size, dryRun))
  }
}

/** `RESTORE t TO VERSION AS OF v` / `… TO TIMESTAMP AS OF 'ts'` →
  * [[graft.sources.Versioned.restore]] (non-destructive: the rollback
  * is a NEW version, history stays intact). A timestamp resolves
  * through the same monotone-stamp lookup as read-side time travel,
  * zone-less literals in the SESSION zone. */
case class GraftRestoreCommand(tParts: Seq[String],
    toVersion: Option[Int], toTimestamp: Option[String] = None)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenanceSql.attrsOf("version INT")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts, "RESTORE")
    val v = toVersion.getOrElse {
      val ts = toTimestamp.getOrElse(throw new IllegalArgumentException(
        "RESTORE needs TO VERSION AS OF <v> or TO TIMESTAMP AS OF '<ts>'"))
      graft.sources.Versioned.timestampToVersion(path,
        GraftMaintenanceSql.tsStringToMillis(spark, ts))
    }
    Seq(Row(graft.sources.Versioned.restore(path, v)))
  }
}

/** `DESCRIBE HISTORY t` → [[graft.sources.Versioned.history]]: one
  * row per version with op, monotone-adjusted stamp, checkpoint flag,
  * file count, and CDF availability. O(versions) driver rows. */
case class GraftHistoryCommand(tParts: Seq[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenanceSql.attrsOf(
    "version INT, op STRING, timestamp_ms BIGINT, " +
      "is_checkpoint BOOLEAN, n_files INT, has_change_feed BOOLEAN")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts,
      "DESCRIBE HISTORY")
    graft.sources.Versioned.history(spark, path).collect().toSeq
  }
}

/** `DESCRIBE DETAIL t` (round 13, Delta's statement) →
  * [[graft.sources.Versioned.describeDetail]]: one row of
  * table-level facts. */
case class GraftDetailCommand(tParts: Seq[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] = GraftMaintenanceSql.attrsOf(
    "format STRING, location STRING, schema_ddl STRING, " +
      "partition_columns STRING, version INT, num_files INT, " +
      "created_ts_ms BIGINT, last_modified_ts_ms BIGINT, " +
      "num_versions INT, constraints STRING")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts,
      "DESCRIBE DETAIL")
    graft.sources.Versioned.describeDetail(spark, path).collect().toSeq
  }
}

/** `CONVERT TO GRAFTV parquet.`/dir`` (round 13) →
  * [[graft.sources.Versioned.convertParquet]]: adopt an existing
  * parquet directory as a graftv table IN PLACE — no data rewrite,
  * the v1 `convert` manifest references the part files where they
  * lie. The target must be the `parquet.`/dir`` form (the directory
  * is not a table yet, so there is nothing to resolve in the
  * catalog). Returns the created version and adopted file count. */
case class GraftConvertCommand(tParts: Seq[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenanceSql.attrsOf("version INT, num_files INT")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = tParts match {
      case Seq(fmt, p) if fmt.equalsIgnoreCase("parquet") => p
      case other => throw new IllegalArgumentException(
        "CONVERT TO GRAFTV takes a parquet directory as " +
          "parquet.`/path`, got " + other.mkString("."))
    }
    val v = graft.sources.Versioned.convertParquet(spark, path)
    Seq(Row(v, graft.sources.Versioned.snapshot(path).files.size))
  }
}

/** `REORG TABLE t APPLY (PURGE)` (round 15) →
  * [[graft.sources.Versioned.purgeDeletionVectors]]: rewrite only the
  * DV-carrying files (their live rows), dropping the sidecars; clean
  * files carry by reference. Returns the new version and how many
  * masked files were purged (0 purged = no-op, version unchanged). */
case class GraftReorgCommand(tParts: Seq[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenanceSql.attrsOf("version INT, purged_files INT")
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts,
      "REORG TABLE")
    val nDv = graft.sources.Versioned.snapshot(path).dvs.size
    val v = graft.sources.Versioned.purgeDeletionVectors(spark, path)
    Seq(Row(v, nDv))
  }
}

/** `CREATE TABLE t SHALLOW CLONE s [VERSION AS OF v] [LOCATION p]`
  * (round 14; Delta's shallow clone): zero-copy birth of a NEW,
  * fully independent graftv table whose v1 references the source
  * snapshot's data files (hard links locally — metadata-only, no
  * bytes move; see [[graft.sources.Versioned.cloneTable]]). The
  * target location comes from LOCATION, or from the graftv.`/path`
  * name form; a plain catalog NAME without LOCATION gets a managed
  * path under the session warehouse and is REGISTERED in the
  * catalog, so `SELECT … FROM t` works immediately. */
case class GraftCloneCommand(tgtParts: Seq[String],
    srcParts: Seq[String], versionAsOf: Option[Int],
    location: Option[String])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] =
    GraftMaintenanceSql.attrsOf("version INT, num_files INT")
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftMaintenanceSql.graftPathOf(spark, srcParts,
      "SHALLOW CLONE")
    val (dst, register) = location match {
      case Some(p) =>
        // graftv.`/path` ALSO names a location — a LOCATION clause on
        // top is ambiguous unless they agree (round 15, ADVICE r14:
        // the embedded path was silently dropped in favor of LOCATION)
        def n(s: String) =
          s.stripPrefix("file:").replaceAll("/+$", "")
        tgtParts match {
          case Seq(fmt, tp) if fmt.equalsIgnoreCase("graftv") &&
              n(tp) != n(p) =>
            throw new IllegalArgumentException(
              "SHALLOW CLONE target graftv.`" + tp + "` conflicts " +
                s"with LOCATION '$p' — drop one or make them match")
          case _ => ()
        }
        (p, tgtParts.length >= 1 &&
          !tgtParts.head.equalsIgnoreCase("graftv"))
      case None => tgtParts match {
        case Seq(fmt, p) if fmt.equalsIgnoreCase("graftv") => (p, false)
        case Seq(name) =>
          val wh = spark.sessionState.conf.getConfString(
            "spark.sql.warehouse.dir")
          (s"${wh.stripSuffix("/")}/$name", true)
        case other => throw new IllegalArgumentException(
          "SHALLOW CLONE target must be a name, a graftv.`/path`, " +
            s"or carry LOCATION — got ${other.mkString(".")}")
      }
    }
    val v = graft.sources.Versioned.cloneTable(spark, src, dst,
      versionAsOf)
    if (register) {
      // quote every identifier part; the LOCATION goes through the
      // catalog API's options map, NOT an interpolated string literal
      // — backslash escapes are inert under
      // spark.sql.parser.escapedStringLiterals=true and quote-doubling
      // trips adjacent-literal concatenation, so no SQL-side escaping
      // of a path is parser-mode independent (round 16, ADVICE r15)
      val name = tgtParts
        .map(p => "`" + p.replace("`", "``") + "`").mkString(".")
      spark.catalog.createTable(name, "graftv", Map("path" -> dst))
    }
    Seq(Row(v, graft.sources.Versioned.snapshot(dst).files.size))
  }
}

/** `ALTER TABLE t ADD CONSTRAINT n CHECK (expr)` for graftv tables
  * (round 13, Delta's constraint statement — Spark 4 parses it
  * natively into `AddConstraint`, intercepted by the same plan-
  * rewrite hook as ADD COLUMNS): existing rows are validated first
  * (one scan, loud error with the violation count), then a
  * metadata-only commit carries the constraint; every subsequent
  * write door validates its fresh files against the set before
  * publishing. Non-graftv targets re-enter Spark's native constraint
  * machinery untouched. Only CHECK constraints are supported
  * (PRIMARY KEY / FOREIGN KEY / UNIQUE are loud errors — there is no
  * index to back them). */
case class GraftAddConstraintCommand(
    native: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    table: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    // the CHECK (name, condition SQL) extracted as STRINGS at parse
    // time — an Expression-typed field here would be collected into
    // this command's `expressions` and the analyzer would try (and
    // fail) to resolve its columns against a leaf command; None =
    // a non-CHECK constraint family (rejected for graftv targets)
    check: Option[(String, String)])
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the parser wraps the target in its own validation shape
    // (Filter(condition, UnresolvedTable) for CHECK) — find the
    // table node wherever it sits
    val tParts = table.collectFirst {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case ur: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        ur.multipartIdentifier
    }.getOrElse(throw new IllegalArgumentException(
      s"ALTER TABLE: unexpected target ${table.nodeName}"))
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None => // not ours: Spark's native constraint path
        org.apache.spark.sql.classic.Dataset.ofRows(spark, native)
          .collect().toSeq
      case Some(path) =>
        val (name, condition) = check.getOrElse(
          throw new IllegalArgumentException(
            "graftv supports CHECK constraints only (PRIMARY KEY / " +
              "FOREIGN KEY / UNIQUE have no index to back them)"))
        graft.sources.Versioned.addConstraint(spark, path, name,
          condition)
        Seq.empty
    }
  }
}

/** `ALTER TABLE t DROP CONSTRAINT [IF EXISTS] n` for graftv tables —
  * a metadata-only commit without the constraint; IF EXISTS makes an
  * unknown name a no-op instead of a loud error. */
case class GraftDropConstraintCommand(
    alter: org.apache.spark.sql.catalyst.plans.logical.DropConstraint)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val tParts = alter.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case other => throw new IllegalArgumentException(
        s"ALTER TABLE: unexpected target ${other.nodeName}")
    }
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None =>
        org.apache.spark.sql.classic.Dataset.ofRows(spark, alter)
          .collect().toSeq
      case Some(path) =>
        val known = graft.sources.Versioned.constraintsOf(path)
          .keys.exists(_.equalsIgnoreCase(alter.name))
        if (!known && alter.ifExists) Seq.empty
        else {
          graft.sources.Versioned.dropConstraint(path, alter.name)
          Seq.empty
        }
    }
  }
}

/** `ALTER TABLE t ADD COLUMNS (c TYPE, …)` for graftv tables (round
  * 13): routed through the metadata-only
  * [[graft.sources.Versioned.addColumns]] commit — old files
  * null-fill, time travel keeps per-version DDL. Non-graftv targets
  * re-enter Spark's native ALTER machinery untouched. The session
  * catalog's stored schema is NOT touched: for graftv tables the log
  * is the schema's source of truth and the provider serves it on
  * every load. FIRST/AFTER positions, nested fields and DEFAULTs are
  * loud errors (evolution only APPENDS top-level nullable columns). */
case class GraftAddColumnsCommand(
    alter: org.apache.spark.sql.catalyst.plans.logical.AddColumns)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val tParts = alter.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case other => throw new IllegalArgumentException(
        s"ALTER TABLE: unexpected target ${other.nodeName}")
    }
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None => // not ours: Spark's native ALTER path
        org.apache.spark.sql.classic.Dataset.ofRows(spark, alter)
          .collect().toSeq
      case Some(path) =>
        def fail(msg: String): Nothing =
          throw new IllegalArgumentException(
            s"graftv ALTER TABLE ADD COLUMNS: $msg")
        // nested fields add to their dotted parent path (round 15,
        // Versioned.addColumns' `parent`); group by parent so one
        // statement can mix targets
        alter.columnsToAdd.foreach { c =>
          if (c.position.nonEmpty) fail(
            s"FIRST/AFTER on ${c.colName} — added columns append at " +
              "the end")
          if (c.default.nonEmpty) fail(
            s"DEFAULT on ${c.colName} — added columns are null-filled")
        }
        alter.columnsToAdd.groupBy(_.path.map(_.name.mkString("."))
            .getOrElse("")).foreach { case (parent, cols) =>
          val fields = cols.map(c =>
            StructField(c.colName, c.dataType, nullable = true))
          graft.sources.Versioned.addColumns(path,
            StructType(fields).toDDL, parent)
        }
        Seq.empty
    }
  }
}

/** `ALTER TABLE t ALTER COLUMN c TYPE t2` for graftv tables (round
  * 14, VERDICT r13 #6): routed through the metadata-only
  * [[graft.sources.Versioned.alterColumnType]] commit — allowed
  * strictly along the safe widening lattice (byte<short<int<long,
  * float<double); old files keep their narrower physical type and
  * promote at scan time; time travel keeps per-version DDL.
  * Non-graftv targets re-enter Spark's native ALTER machinery
  * untouched. Comment/nullability/position/default changes on graftv
  * targets are loud errors (nothing in the manifest stores them). */
case class GraftAlterColumnsCommand(
    alter: org.apache.spark.sql.catalyst.plans.logical.AlterColumns)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val tParts = alter.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case other => throw new IllegalArgumentException(
        s"ALTER TABLE: unexpected target ${other.nodeName}")
    }
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None => // not ours: Spark's native ALTER path
        org.apache.spark.sql.classic.Dataset.ofRows(spark, alter)
          .collect().toSeq
      case Some(path) =>
        def fail(msg: String): Nothing =
          throw new IllegalArgumentException(
            s"graftv ALTER TABLE ALTER COLUMN: $msg")
        alter.specs.foreach { s =>
          if (s.column.name.length != 1) fail(
            s"nested field ${s.column.name.mkString(".")} — only " +
              "top-level columns can be widened")
          if (s.newDataType.isEmpty) fail(
            s"${s.column.name.mkString(".")}: only TYPE changes are " +
              "supported (comment/nullability/position/default are " +
              "not graftv table properties)")
          if (s.newNullability.nonEmpty || s.newComment.nonEmpty ||
            s.newPosition.nonEmpty || s.newDefaultExpression.nonEmpty ||
            s.dropDefault) fail(
            s"${s.column.name.mkString(".")}: only TYPE changes are " +
              "supported")
        }
        alter.specs.foreach { s =>
          graft.sources.Versioned.alterColumnType(path,
            s.column.name.head, s.newDataType.get.sql)
        }
        Seq.empty
    }
  }
}

/** `ALTER TABLE t RENAME COLUMN a TO b` for graftv tables (round 14,
  * VERDICT r13 #3): a metadata-only commit — the column keeps its
  * stable physical name, old versions read under their own names via
  * time travel, zero files rewritten (Delta's column-mapping
  * discipline). Non-graftv targets pass through. */
case class GraftRenameColumnCommand(
    alter: org.apache.spark.sql.catalyst.plans.logical.RenameColumn)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val tParts = alter.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case other => throw new IllegalArgumentException(
        s"ALTER TABLE: unexpected target ${other.nodeName}")
    }
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None =>
        org.apache.spark.sql.classic.Dataset.ofRows(spark, alter)
          .collect().toSeq
      case Some(path) =>
        // nested paths rename the struct FIELD (round 15) — the same
        // metadata-only stable-physical-name discipline
        graft.sources.Versioned.renameColumn(path,
          alter.column.name.mkString("."), alter.newName)
        Seq.empty
    }
  }
}

/** `ALTER TABLE t DROP COLUMN [IF EXISTS] c, …` for graftv tables
  * (round 14): metadata-only commits — files keep the bytes (unread
  * once unmapped), the physical name is tombstoned against
  * resurrection by a later ADD COLUMNS of the same name. */
case class GraftDropColumnsCommand(
    alter: org.apache.spark.sql.catalyst.plans.logical.DropColumns)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val spark = sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val tParts = alter.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case other => throw new IllegalArgumentException(
        s"ALTER TABLE: unexpected target ${other.nodeName}")
    }
    GraftSqlTarget.pathOf(spark, tParts) match {
      case None =>
        org.apache.spark.sql.classic.Dataset.ofRows(spark, alter)
          .collect().toSeq
      case Some(path) =>
        alter.columnsToDrop.foreach { c =>
          val dotted = c.name.mkString(".")
          // IF EXISTS: a missing path (any segment) is a silent no-op
          try graft.sources.Versioned.dropColumn(path, dotted)
          catch {
            case e: IllegalArgumentException
                if alter.ifExists &&
                  e.getMessage.contains("no column") => ()
          }
        }
        Seq.empty
    }
  }
}

/** SQL time travel for graftv tables (round 12):
  * `SELECT … FROM t VERSION AS OF v` /
  * `… TIMESTAMP AS OF '2026-08-15 12:00:00'`. Spark resolves
  * [[org.apache.spark.sql.catalyst.analysis.RelationTimeTravel]]
  * through the catalog's time-travel API, which the V1 session
  * catalog does not route to a TableProvider (its ResolveRelations
  * throws UNSUPPORTED_FEATURE.TIME_TRAVEL before any injected
  * resolution rule runs) — so [[GraftSqlParser]] applies this
  * transform at PARSE time: graftv relations under a time-travel
  * node become the same DSv2 table the `versionAsOf` reader option
  * produces (the version directly, or the monotone-stamp version
  * lookup for a timestamp literal). Non-graftv (or
  * non-literal-timestamp) relations are left for Spark's own
  * machinery. */
object GraftTimeTravel {
  import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  /** Zone-less literals resolve in the SESSION time zone
    * (`spark.sql.session.timeZone`), never the JVM default — Spark
    * and Delta's rule; the same query must pick the same version
    * regardless of the machine's zone (ADVICE r12). */
  private def tsMillisOf(e: Expression,
      zone: java.time.ZoneId): Option[Long] =
    if (!e.resolved || !e.foldable) None
    else e.dataType match {
      case TimestampType =>
        Option(e.eval()).map(_.asInstanceOf[Long] / 1000L) // micros → ms
      case StringType => Option(e.eval()).flatMap { raw =>
        val t = raw.toString
        def tryMs(b: => Long): Option[Long] =
          try Some(b) catch { case _: Exception => None }
        if (t.forall(_.isDigit) && t.nonEmpty) tryMs(t.toLong)
        else if (t.contains("T"))
          // zoned instant first; zone-LESS ISO resolves in the
          // session zone
          tryMs(java.time.Instant.parse(t).toEpochMilli).orElse(tryMs(
            java.time.LocalDateTime.parse(t)
              .atZone(zone).toInstant.toEpochMilli))
        else
          // "yyyy-MM-dd HH:mm:ss[.fff]", or date-only at midnight
          // (the shape Delta's TIMESTAMP AS OF accepts), session zone
          tryMs(java.time.LocalDateTime
            .parse(t.replace(' ', 'T'))
            .atZone(zone).toInstant.toEpochMilli).orElse(tryMs(
            java.time.LocalDate.parse(t).atStartOfDay(zone)
              .toInstant.toEpochMilli))
      }
      case _ => None
    }

  def apply(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case tt @ RelationTimeTravel(ur: UnresolvedRelation, ts, ver) =>
        GraftSqlTarget.pathOf(spark, ur.multipartIdentifier) match {
          case Some(path) =>
            val zone = java.time.ZoneId.of(
              spark.sessionState.conf.sessionLocalTimeZone)
            val asOf: Option[Int] = ver match {
              case Some(v) =>
                try Some(v.toInt)
                catch {
                  case _: NumberFormatException =>
                    throw new IllegalArgumentException(
                      s"graftv VERSION AS OF needs an integer version, " +
                        s"got '$v'")
                }
              case None => ts.flatMap(tsMillisOf(_, zone)).map(ms =>
                graft.sources.Versioned.timestampToVersion(path, ms))
            }
            asOf match {
              case Some(_) => DataSourceV2Relation.create(
                graft.sources.VersionedSource.tableAsOf(path, asOf),
                None, None)
              case None => tt // non-literal timestamp: Spark's problem
            }
          case None => tt // not ours
        }
    }
}

/** `SELECT * FROM table_changes('t', start [, end])` — Delta's CDC
  * table function over graftv change feeds (round 12): the rows plus
  * `_change_type` / `_commit_version` for the commits in
  * [start, end] (INCLUSIVE both, Delta's convention; the library's
  * `readChanges(from, to)` is exclusive-from — the TVF maps
  * `startingversion = start - 1`). `end` defaults to the latest
  * version. The first argument resolves like every other graftv SQL
  * target (catalog table name or a raw table path). Arguments must
  * be literals (they select the scan range at plan time). */
object GraftTableChanges {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  private def litString(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be a string literal, got ${other.sql}")
  }
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      // reject instead of silently truncating (ADVICE r12)
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"table_changes: $what $v is out of the version range")
      v.toInt
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be an integer literal, got ${other.sql}")
  }

  def apply(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"table_changes(table, startVersion[, endVersion]) takes 2 or 3 " +
        s"arguments, got ${args.length}")
    val spark = SparkSession.active
    val name = litString(args.head, "the table name")
    val tParts =
      if (name.contains('/')) Seq("graftv", name) // a raw table path
      else name.split('.').toSeq
    // dotted names: t | db.t | spark_catalog.db.t (ADVICE r12: deeper
    // nesting used to misparse into a silent "not a graftv table")
    require(name.contains('/') || tParts.length <= 2 ||
      (tParts.length == 3 && tParts.head.equalsIgnoreCase("spark_catalog")),
      s"table_changes: cannot resolve '$name' — use t, db.t, " +
        "spark_catalog.db.t, or a raw table path")
    val path = GraftMaintenanceSql.graftPathOf(spark, tParts,
      "table_changes")
    val allVersions = graft.sources.Versioned.versions(path)
    if (allVersions.isEmpty) {
      // a CREATE TABLE'd-but-never-written table has an EMPTY change
      // feed (round 14, ADVICE; Delta's rule — a created table's CDF
      // exists and is empty, it does not error). The declared schema
      // lives in the CATALOG, so a raw-path target with no log stays
      // a loud error (there is no schema to describe the feed with).
      require(!name.contains('/'),
        s"table_changes: $name has no committed versions yet")
      litInt(args(1), "startVersion") // still validate literal shape
      val cdf = spark.table(name).schema
        .add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.IntegerType)
      return DataSourceV2Relation.create(
        graft.sources.VersionedSource.emptyChanges(path, cdf), None, None,
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(), None)
    }
    val start = litInt(args(1), "startVersion")
    require(start >= 1, s"table_changes: startVersion must be >= 1 " +
      s"(got $start); version 1 is the first commit")
    val end = if (args.length == 3) litInt(args(2), "endVersion")
      else allVersions.max
    require(end >= start,
      s"table_changes: endVersion $end < startVersion $start")
    val opts = new java.util.HashMap[String, String]()
    opts.put("readchangefeed", "true")
    opts.put("startingversion", (start - 1).toString) // inclusive start
    opts.put("endingversion", end.toString)
    DataSourceV2Relation.create(
      graft.sources.VersionedSource.tableChanges(path), None, None,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts), None)
  }
}
