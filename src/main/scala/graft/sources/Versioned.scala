package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Versioned parquet tables: snapshot isolation, time travel, restore
  * and vacuum — the table-format semantics SURVEY §1.3 points at
  * (Delta-style versioning; reference keeps a poor man's version in
  * the dbcat sidecars, utility.py:933–983). No external format jars
  * exist in this environment, so the LOG PROTOCOL is implemented
  * directly, the way the published Delta design does it (Armbrust et
  * al., "Delta Lake: High-Performance ACID Table Storage over Cloud
  * Object Stores", VLDB 2020):
  *
  *  - A table is a directory: immutable parquet data files under
  *    `data/c-<commit>/`, plus an ordered log `_log/v%06d.json` of
  *    manifests. Readers never list `data/` — the log is the source
  *    of truth, so a crashed writer's orphaned files are invisible.
  *  - A manifest is either a DELTA (`full=false`, the files this
  *    commit ADDS) or a CHECKPOINT (`full=true`, the complete live
  *    file set). Overwrites and restores are checkpoints by nature;
  *    appends self-checkpoint every [[CheckpointInterval]] commits so
  *    snapshot resolution replays a bounded manifest suffix
  *    (≤ interval), not the whole history — the log equivalent of
  *    Delta's parquet checkpoints.
  *  - Commit = write data files, then publish the next `v%06d.json`
  *    with an ATOMIC create-exclusive (hard-link a fully-written temp
  *    file into place; `CREATE_NEW` fallback). Two racing writers
  *    target the same version number; exactly one link succeeds, the
  *    loser re-reads the log and retries on top (optimistic
  *    concurrency). Append/append races always merge cleanly; the
  *    retry re-resolves the live set so a lost append lands on top of
  *    a concurrent overwrite with last-writer-wins append semantics.
  *
  * 100 TB shape: the log is O(files-per-commit) driver-side JSON and
  * snapshot resolution is O(interval) manifest reads; the data path
  * is plain immutable parquet, so reads keep pushdown/pruning and
  * writes are normal distributed parquet jobs. On a real cluster the
  * create-exclusive publish maps to the object store's put-if-absent
  * (or a log store service), which is exactly where Delta's LogStore
  * abstraction sits.
  */
object Versioned {

  /** Append commits self-checkpoint at this cadence: any snapshot read
    * replays at most this many manifests past its base checkpoint. */
  val CheckpointInterval = 10

  /** Per-file [min, max] of every top-level BIGINT column. */
  type FileStats = Map[String, Map[String, (Long, Long)]]

  final case class Snapshot(version: Int, files: Seq[String],
      schemaDdl: String, baseVersion: Int, replayedManifests: Int,
      stats: FileStats = Map.empty)

  /** `txns` is the Delta SetTransaction analog: the highest batch id
    * committed per writer app, carried FORWARD in every manifest so
    * reading the latest manifest alone answers "was this micro-batch
    * already committed?" — the exactly-once handshake for streaming
    * sinks under foreachBatch's at-least-once replays.
    *
    * `tsMs` is the commit timestamp, stamped by [[publish]] at link
    * time (round 10) — the resolution target of `timestampAsOf`
    * (Delta's human-facing time travel; the reference's own dbcat
    * sidecars record a timestamp the version-number API could not
    * answer, utility.py:952–983). `changes` lists the row-level CDF
    * parquet a merge/delete commit persisted beside its rewritten
    * files (Delta CDF's update_preimage/postimage/delete rows).
    *
    * `stats` is the data-skipping tier IN the log (round 10, the
    * Delta discipline): per added file, [min, max] of every top-level
    * BIGINT column, read once from the just-written footers at commit
    * time (local and page-hot) so a later MERGE prunes its rewrite
    * set from the manifest alone — zero footer opens against a
    * 10⁵-file table. Checkpoints carry the full live set's stats
    * forward; files from pre-stats manifests fall back to footer
    * reads at merge time. */
  private final case class Manifest(version: Int, op: String,
      full: Boolean, files: Seq[String], schemaDdl: String,
      txns: Map[String, Long] = Map.empty, tsMs: Long = 0L,
      changes: Option[Seq[String]] = None,
      stats: FileStats = Map.empty)

  // -------------------------------------------------------- log I/O

  /** Accept both plain paths and `file:` URIs (the session catalog
    * hands DSv2 providers a URI-form location for `CREATE TABLE …
    * USING graftv`). URI-first (round 10, replacing an accreted
    * string-prefix chain with a dead Windows-drive regex): parse once,
    * dispatch on the scheme. Any scheme other than file/absent is a
    * loud error — the local java.nio log I/O below is the
    * single-filesystem tier; a cluster deployment routes these through
    * the object store's put-if-absent instead (see the class doc). */
  private def norm(path: String): String = {
    val uri = try new java.net.URI(path) catch {
      case _: java.net.URISyntaxException => return path // plain path
    }
    uri.getScheme match {
      case null => path // scheme-less: already a filesystem path
      case "file" => uri.getPath
      case other => sys.error(s"versioned: unsupported path scheme " +
        s"'$other' in $path (local paths and file: URIs only in this " +
        "environment)")
    }
  }

  private def dataPath(path: String, commitId: String): Path =
    Paths.get(norm(path), "data", s"c-$commitId")

  private def logDir(path: String): Path = Paths.get(norm(path), "_log")

  /** `Files.list` with the stream closed (it holds a directory fd). */
  private def listDir(p: Path): Vector[Path] = {
    val s = Files.list(p)
    try s.iterator.asScala.toVector finally s.close()
  }

  private def manifestPath(path: String, v: Int): Path =
    logDir(path).resolve(f"v$v%06d.json")

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def toJson(m: Manifest): String = {
    val files = m.files.map(jstr).mkString("[", ", ", "]")
    // the "changes" key is written ONLY by CDF-recording ops: its
    // absence marks a manifest whose row-level delta was never
    // persisted (pre-r10, or an op that has none), distinctly from a
    // merge/delete that touched zero rows (present-but-empty array)
    val changes = m.changes.map(cs =>
      s""""changes": ${cs.map(jstr).mkString("[", ", ", "]")}, """)
      .getOrElse("")
    val txns = m.txns.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: $v" }.mkString("{", ", ", "}")
    val stats = m.stats.toSeq.sortBy(_._1).map { case (f, cols) =>
      s"${jstr(f)}: " + cols.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
        s"${jstr(c)}: [$lo, $hi]"
      }.mkString("{", ", ", "}")
    }.mkString("{", ", ", "}")
    s"""{"version": ${m.version}, "op": ${jstr(m.op)}, """ +
      s""""full": ${m.full}, "ts": ${m.tsMs}, """ +
      s""""schema": ${jstr(m.schemaDdl)}, """ +
      s""""txns": $txns, $changes"stats": $stats, "files": $files}"""
  }

  private def parseManifest(p: Path): Manifest = {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(Files.readString(p))
    def str(f: String) = (j \ f) match {
      case JString(s) => s
      case other => sys.error(s"versioned: manifest $p field $f: $other")
    }
    Manifest(
      version = (j \ "version") match {
        case JInt(v) => v.toInt
        case other => sys.error(s"versioned: manifest $p version: $other")
      },
      op = str("op"),
      full = (j \ "full") match {
        case JBool(b) => b
        case other => sys.error(s"versioned: manifest $p full: $other")
      },
      files = (j \ "files") match {
        case JArray(xs) => xs.map { case JString(s) => s
          case other => sys.error(s"versioned: manifest $p file: $other") }
        case other => sys.error(s"versioned: manifest $p files: $other")
      },
      schemaDdl = str("schema"),
      txns = (j \ "txns") match {
        case JObject(fields) => fields.map {
          case (k, JInt(v)) => k -> v.toLong
          case (k, other) => sys.error(s"versioned: manifest $p txn $k: $other")
        }.toMap
        case JNothing => Map.empty // pre-txn manifests
        case other => sys.error(s"versioned: manifest $p txns: $other")
      },
      tsMs = (j \ "ts") match {
        case JInt(v) => v.toLong
        // pre-r10 manifests carry no stamp: the file's mtime is the
        // honest fallback (it IS the publish instant for a hard link)
        case JNothing => Files.getLastModifiedTime(p).toMillis
        case other => sys.error(s"versioned: manifest $p ts: $other")
      },
      changes = (j \ "changes") match {
        case JArray(xs) => Some(xs.map { case JString(s) => s
          case other => sys.error(s"versioned: manifest $p change: $other") })
        case JNothing => None // pre-CDF manifest / non-CDF op
        case other => sys.error(s"versioned: manifest $p changes: $other")
      },
      stats = (j \ "stats") match {
        case JObject(files) => files.map {
          case (f, JObject(cols)) => f -> cols.map {
            case (c, JArray(List(JInt(lo), JInt(hi)))) =>
              c -> (lo.toLong, hi.toLong)
            case (c, other) =>
              sys.error(s"versioned: manifest $p stat $f.$c: $other")
          }.toMap
          case (f, other) =>
            sys.error(s"versioned: manifest $p stats $f: $other")
        }.toMap
        case JNothing => Map.empty // pre-stats manifests
        case other => sys.error(s"versioned: manifest $p stats: $other")
      })
  }

  /** All committed versions, ascending (empty for a fresh/absent table). */
  def versions(path: String): Seq[Int] = {
    val dir = logDir(path)
    if (!Files.isDirectory(dir)) return Seq.empty
    listDir(dir)
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  /** Publish `m` as version `m.version` atomically. True on success,
    * false if that version number was taken by a racing writer. The
    * content is fully written to a temp file FIRST; the publish is a
    * hard link (atomic existence + content), so concurrent readers
    * never observe a partial manifest. */
  private def publish(path: String, m: Manifest): Boolean = {
    val dir = logDir(path)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, ".tmp-", ".json")
    // stamp at link time, uniformly for every op: the manifest content
    // IS the commit instant, so timestampAsOf never depends on fs
    // metadata surviving copies/backups
    Files.writeString(tmp, toJson(m.copy(tsMs = System.currentTimeMillis())))
    val target = manifestPath(path, m.version)
    try {
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException =>
          // no hard links (exotic fs): create-exclusive copy
          Files.write(target, Files.readAllBytes(tmp),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
      }
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  // ----------------------------------------------------- snapshots

  /** Resolve the live file set at `asOf` (default: latest): walk back
    * to the nearest checkpoint, then replay the delta suffix. */
  def snapshot(path: String, asOf: Option[Int] = None): Snapshot = {
    val vs = versions(path)
    require(vs.nonEmpty, s"versioned: no committed versions under $path")
    val v = asOf.getOrElse(vs.max)
    require(vs.contains(v),
      s"versioned: version $v not in log (have ${vs.mkString(",")})")
    val upTo = vs.filter(_ <= v)
    // v1 is always full (first commit has nothing to delta against)
    var files = Vector.empty[String]
    var ddl = ""
    var base = -1
    var replayed = 0
    // walk backwards until the first full manifest, then forward-apply
    val suffix = upTo.reverse.takeWhile { ver =>
      base = ver; !parseManifest(manifestPath(path, ver)).full
    }
    val toApply = (base +: suffix.reverse).distinct
    var stats: FileStats = Map.empty
    toApply.foreach { ver =>
      val m = parseManifest(manifestPath(path, ver))
      replayed += 1
      if (m.full) { files = m.files.toVector; stats = m.stats }
      else { files = files ++ m.files; stats = stats ++ m.stats }
      ddl = m.schemaDdl
    }
    Snapshot(v, files, ddl, base, replayed, stats)
  }

  /** Resolve a wall-clock instant to a version — Delta's
    * `timestampAsOf` semantics: the LATEST commit whose stamp is ≤
    * `tsMs`; an instant before the first commit is a loud error; an
    * instant after the last resolves to the latest. Stamps are made
    * MONOTONE by running max during the scan (two racing writers can
    * publish v and v+1 with skewed clocks; a later version must never
    * resolve to an earlier instant — the same adjustment Delta applies
    * to its commit file times). O(versions) driver-side JSON reads,
    * like every other log walk here. */
  def timestampToVersion(path: String, tsMs: Long): Int = {
    val vs = versions(path)
    require(vs.nonEmpty, s"versioned: no committed versions under $path")
    var adjusted = Long.MinValue
    var resolved = -1
    vs.foreach { v =>
      adjusted = math.max(adjusted, parseManifest(manifestPath(path, v)).tsMs)
      if (adjusted <= tsMs) resolved = v
    }
    require(resolved >= 0,
      s"versioned: timestamp $tsMs predates the first commit of $path " +
        s"(earliest ${parseManifest(manifestPath(path, vs.min)).tsMs})")
    resolved
  }

  /** The (monotone-adjusted) commit instant of `v` — what
    * `timestampAsOf` resolves against; exposed for history listings. */
  def commitTimestamp(path: String, v: Int): Long = {
    val vs = versions(path)
    require(vs.contains(v), s"versioned: version $v not in log")
    vs.filter(_ <= v)
      .map(x => parseManifest(manifestPath(path, x)).tsMs).max
  }

  /** Timestamp-based time travel: read the table as of a wall-clock
    * instant (epoch millis). `read(…, Some(v))`'s human-facing twin. */
  def readAsOfTimestamp(spark: SparkSession, path: String,
      tsMs: Long): DataFrame =
    read(spark, path, Some(timestampToVersion(path, tsMs)))

  /** History listing (Delta DESCRIBE HISTORY): one row per committed
    * version, ascending — op, the monotone-adjusted commit instant
    * `timestampAsOf` resolves against, whether the manifest is a
    * checkpoint, how many files it lists, and whether it persisted a
    * row-level change set. O(versions) driver-side JSON reads. */
  def history(spark: SparkSession, path: String): DataFrame = {
    var adjusted = Long.MinValue
    val rows = versions(path).map { v =>
      val m = parseManifest(manifestPath(path, v))
      adjusted = math.max(adjusted, m.tsMs)
      Row(v, m.op, adjusted, m.full, m.files.size,
        m.changes.isDefined)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType.fromDDL("version INT, op STRING, timestamp_ms BIGINT, " +
        "is_checkpoint BOOLEAN, n_files INT, has_change_feed BOOLEAN"))
  }

  // ------------------------------------------------------- commits

  private def listParquet(dir: Path): Seq[String] =
    listDir(dir)
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .sorted

  /** Commit `df` to the table at `path`. `mode` = "append" |
    * "overwrite". Returns the committed version number. Appends to an
    * existing table require an identical schema DDL (loud error — the
    * reference's silent schema-drift failure mode) unless
    * `mergeSchema = true`, which allows ADDITIVE evolution: new
    * columns join the table schema as nullable, common columns must
    * keep their types, and old files read back with the new columns
    * null-filled (the committed DDL per manifest means time travel
    * sees each version under its own schema). Overwrite may change
    * the schema freely. */
  def commit(df: DataFrame, path: String, mode: String = "append",
      mergeSchema: Boolean = false): Int =
    commitInternal(df, path, mode, txn = None, mergeSchema = mergeSchema)
      .getOrElse(
        sys.error(s"versioned: plain commit cannot be skipped ($path)"))

  /** Exactly-once commit: append `df` tagged (appId, batchId); if a
    * manifest already records a batch id ≥ `batchId` for `appId` the
    * commit is a no-op returning None — safe under foreachBatch's
    * at-least-once replays. Any data files a losing replay wrote stay
    * invisible (the log is the source of truth) and are reclaimed by
    * [[vacuum]]. */
  def commitIfAbsent(df: DataFrame, path: String, appId: String,
      batchId: Long): Option[Int] = {
    if (lastTxn(path, appId).exists(_ >= batchId)) return None // fast path
    commitInternal(df, path, "append", txn = Some(appId -> batchId))
  }

  /** Highest batch id committed by `appId`, from the LATEST manifest
    * alone (txns are carried forward at every commit). */
  def lastTxn(path: String, appId: String): Option[Long] = {
    val vs = versions(path)
    if (vs.isEmpty) None
    else parseManifest(manifestPath(path, vs.max)).txns.get(appId)
  }

  /** foreachBatch adapter: `stream.writeStream.foreachBatch(
    * Versioned.streamingSink(path, appId)).start()` gives an
    * exactly-once versioned-table sink. */
  def streamingSink(path: String, appId: String): (DataFrame, Long) => Unit =
    (df, batchId) => { commitIfAbsent(df, path, appId, batchId); () }

  private def commitInternal(df: DataFrame, path: String, mode: String,
      txn: Option[(String, Long)], mergeSchema: Boolean = false)
      : Option[Int] = {
    require(mode == "append" || mode == "overwrite",
      s"versioned: mode must be append|overwrite, got $mode")
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val dataRel = s"data/c-$commitId"
    df.write.mode("errorifexists").parquet(s"$path/$dataRel")
    val added = listParquet(dataPath(path, commitId))
      .map(f => s"$dataRel/$f")
    added.foreach(f => require(f.forall(c => c.isLetterOrDigit ||
      "./-_=".contains(c)), s"versioned: unsafe file name $f"))
    // asNullable: parquet round-trips lose NOT NULL anyway; storing the
    // nullable form keeps a Seq-derived first commit (non-null encoders)
    // append-compatible with later parquet-derived commits.
    val ddl = StructType(df.schema.fields.map(_.copy(nullable = true))).toDDL
    // footer stats of the just-written files, once, outside the retry
    // loop (the files don't change across publish retries)
    val addedStats = fileStatsOf(df.sparkSession, path, added)
    var attempt = 0
    while (attempt < 64) {
      val vs = versions(path)
      val cur = if (vs.isEmpty) 0 else vs.max
      val v = cur + 1
      val prevTxns =
        if (cur == 0) Map.empty[String, Long]
        else parseManifest(manifestPath(path, cur)).txns
      txn.foreach { case (app, b) =>
        // re-check under the current log head: a racing replay of the
        // same batch may have won while we were writing data files
        if (prevTxns.get(app).exists(_ >= b)) return None
      }
      val (full, files, outDdl, stats) =
        if (mode == "overwrite" || cur == 0) (true, added, ddl, addedStats)
        else {
          val prev = snapshot(path, Some(cur))
          val committed =
            if (prev.schemaDdl == ddl) ddl
            else if (!mergeSchema)
              throw new IllegalArgumentException(
                s"versioned: append schema mismatch at $path v$v:\n  table: " +
                  s"${prev.schemaDdl}\n  append: $ddl (pass mergeSchema = " +
                  "true for additive evolution)")
            else {
              // ADDITIVE evolution: table columns keep their position
              // and type; genuinely new columns append as nullable.
              // Old files read back under the merged DDL with the new
              // columns null-filled (parquet fills absent columns).
              val prevS = StructType.fromDDL(prev.schemaDdl)
              val newS = StructType.fromDDL(ddl)
              prevS.fields.foreach { pf =>
                newS.fields.find(_.name == pf.name).foreach { nf =>
                  require(nf.dataType == pf.dataType,
                    s"versioned: mergeSchema cannot change ${pf.name}: " +
                      s"${pf.dataType} -> ${nf.dataType} at $path v$v")
                }
              }
              val extra = newS.fields.filterNot(f =>
                prevS.fieldNames.contains(f.name))
              StructType(prevS.fields ++ extra).toDDL
            }
          if (v % CheckpointInterval == 0)
            (true, prev.files ++ added, committed,
              prev.stats ++ addedStats) // checkpoint carries stats forward
          else (false, added, committed, addedStats)
        }
      if (publish(path, Manifest(v, mode, full, files, outDdl,
        prevTxns ++ txn, stats = stats))) return Some(v)
      attempt += 1 // lost the race: re-resolve on top of the winner
    }
    sys.error(s"versioned: gave up after $attempt contended commits at $path")
  }

  /** Non-destructive rollback (Delta RESTORE): commit a checkpoint
    * whose live set is `toVersion`'s. History is preserved. */
  def restore(path: String, toVersion: Int): Int = {
    val snap = snapshot(path, Some(toVersion))
    var attempt = 0
    while (attempt < 64) {
      val cur = versions(path).max
      val v = cur + 1
      // txns roll FORWARD across a restore (the data rolls back, the
      // exactly-once ledger must not — a replayed batch is still dup)
      val txns = parseManifest(manifestPath(path, cur)).txns
      if (publish(path, Manifest(v, "restore", full = true, snap.files,
        snap.schemaDdl, txns, stats = snap.stats))) return v
      attempt += 1
    }
    sys.error(s"versioned: gave up restoring $path to v$toVersion")
  }

  // ------------------------------------------------- merge (upsert)

  /** Per-file [min, max] of every top-level BIGINT column, from
    * parquet FOOTERS — no data scan, O(files) metadata reads. Called
    * ONCE per commit on the just-written (local, page-hot) files and
    * persisted in the manifest (the Delta log-stats discipline), so
    * later merges prune from the log alone; also the fallback for
    * files committed by pre-stats manifests. A column whose stats are
    * absent in any block records the conservative full range
    * (never-skipped). */
  private def fileStatsOf(spark: SparkSession, path: String,
      files: Seq[String]): FileStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$path/$f"), conf)
      val reader = ParquetFileReader.open(in)
      try {
        val acc = scala.collection.mutable.Map[String, (Long, Long)]()
        reader.getFooter.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala.foreach { col =>
            val name = col.getPath.toDotString
            if (!name.contains('.')) { // top-level only
              val st: org.apache.parquet.column.statistics.Statistics[_] =
                col.getStatistics
              val range =
                if (st == null || st.isEmpty || !st.hasNonNullValue)
                  Some((Long.MinValue, Long.MaxValue)) // conservative
                else st.genericGetMin match {
                  case n: java.lang.Long => Some((n.longValue,
                    st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
                  case _ => None // non-BIGINT column: no range stats
                }
              range.foreach { case (lo, hi) =>
                val (plo, phi) =
                  acc.getOrElse(name, (Long.MaxValue, Long.MinValue))
                acc(name) = (math.min(plo, lo), math.max(phi, hi))
              }
            }
          }
        }
        f -> acc.toMap
      } finally reader.close()
    }.toMap
  }

  /** [min, max] of `key` per file: from the SNAPSHOT's manifest stats
    * when present (zero I/O), footer reads only for files committed by
    * pre-stats manifests. Missing key column is a loud error. */
  private def fileKeyRanges(spark: SparkSession, path: String,
      snap: Snapshot, key: String): Seq[(String, Long, Long)] = {
    val (known, unknown) = snap.files.partition(snap.stats.contains)
    val fromLog = known.map { f =>
      // recorded stats without the key = the file has no matchable
      // key data (empty write partition / pre-evolution file): the
      // empty range intersects nothing, see the fallback note below
      val (lo, hi) = snap.stats(f).getOrElse(key,
        (Long.MaxValue, Long.MinValue))
      (f, lo, hi)
    }
    val fromFooters = fileStatsOf(spark, path, unknown).toSeq.map {
      case (f, cols) =>
        // a file with no range for the key holds no matchable rows:
        // zero row groups (an empty write partition) or a file
        // written before the key column evolved in (its rows read the
        // key as null, and null never equals an update key) — the
        // EMPTY range intersects nothing, so the file carries by
        // reference, exactly the old fold-over-blocks behavior
        val (lo, hi) = cols.getOrElse(key, (Long.MaxValue, Long.MinValue))
        (f, lo, hi)
    }
    fromLog ++ fromFooters
  }

  /** MERGE (upsert) on a BIGINT key, file-granular copy-on-write:
    * matched rows are replaced by their update row, unmatched update
    * rows are inserted. Only files whose footer [min, max] key range
    * intersects the updates' key range are rewritten; every other
    * live file is carried into the new snapshot BY REFERENCE — the
    * Delta COW discipline, so a 100 TB table pays for the files it
    * touches, not its size. Publishes with CONFLICT DETECTION: if any
    * commit landed after the snapshot this merge read, it aborts
    * loudly (a racing writer may have changed rows we rewrote) —
    * optimistic concurrency, the caller retries the whole merge. */
  def merge(updates: DataFrame, path: String, key: String): Int = {
    val spark = updates.sparkSession
    val base = snapshot(path)
    val ddl = StructType(updates.schema.fields.map(_.copy(nullable = true))).toDDL
    require(base.schemaDdl == ddl,
      s"versioned: merge schema mismatch at $path:\n  table: " +
        s"${base.schemaDdl}\n  updates: $ddl")
    require(updates.schema(key).dataType ==
      org.apache.spark.sql.types.LongType,
      s"versioned: merge key $key must be BIGINT, found " +
        s"${updates.schema(key).dataType} at $path")
    // one pass over updates: key range for footer pruning, plus the
    // Delta-MERGE precondition that the SOURCE keys be unique — with
    // duplicate keys every copy of a matched table key is anti-joined
    // away and ALL update rows insert, silently multiplying rows
    // nondeterministically (Delta errors on multiple source matches
    // per target row; so do we, before any file is written).
    val bounds = updates.agg(min(col(key)), max(col(key)),
      count(lit(1)), count_distinct(col(key))).head()
    if (bounds.isNullAt(0)) return base.version // empty updates: no-op
    require(bounds.getLong(2) == bounds.getLong(3),
      s"versioned: merge source has duplicate $key values " +
        s"(${bounds.getLong(2)} rows, ${bounds.getLong(3)} distinct keys) " +
        s"at $path — MERGE requires at most one update row per key")
    val (uLo, uHi) = (bounds.getLong(0), bounds.getLong(1))
    val ranges = fileKeyRanges(spark, path, base, key)
    val (touched, untouched) = ranges.partition {
      case (_, lo, hi) => hi >= uLo && lo <= uHi
    }
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val dataRel = s"data/c-$commitId"
    val existing =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType.fromDDL(base.schemaDdl))
      else spark.read.schema(StructType.fromDDL(base.schemaDdl))
        .parquet(touched.map { case (f, _, _) => s"$path/$f" }: _*)
    existing.join(updates.select(col(key)), Seq(key), "left_anti")
      .unionByName(updates)
      .write.mode("errorifexists").parquet(s"$path/$dataRel")
    val added = listParquet(dataPath(path, commitId))
      .map(f => s"$dataRel/$f")
    val files = untouched.map(_._1) ++ added
    val mergedStats = base.stats.view
      .filterKeys(untouched.map(_._1).toSet).toMap ++
      fileStatsOf(spark, path, added)
    // row-level CDF (round 10): persist this commit's change set
    // beside the rewritten files — matched keys emit their pre- and
    // post-image, unmatched update rows an insert. Touched files are
    // COMPLETE for matched detection: an untouched file's footer range
    // excludes every update key by construction. Like the data files,
    // the change parquet is invisible until the manifest publishes.
    val existingKeys = existing.select(col(key))
    val updateKeys = updates.select(col(key))
    val changeRel = changesOf(
      existing.join(updateKeys, Seq(key), "left_semi"),
      updates.join(existingKeys, Seq(key), "left_semi"),
      updates.join(existingKeys, Seq(key), "left_anti"),
      path, commitId)
    val cur = versions(path).max
    if (cur != base.version)
      throw new java.util.ConcurrentModificationException(
        s"versioned: merge at $path read v${base.version} but the log is " +
          s"at v$cur — a concurrent commit landed; retry the merge")
    val txns = parseManifest(manifestPath(path, cur)).txns
    if (!publish(path, Manifest(cur + 1, "merge", full = true, files,
      base.schemaDdl, txns, changes = Some(changeRel),
      stats = mergedStats)))
      throw new java.util.ConcurrentModificationException(
        s"versioned: merge at $path lost the publish race at " +
          s"v${cur + 1}; retry the merge")
    cur + 1
  }

  /** Persist a commit's row-level change set to `_changes/c-<id>/`:
    * pre/post images and inserts (merge) or deletes, each tagged with
    * Delta CDF's `_change_type`. Returns the relative parquet paths
    * for the manifest. */
  private def changesOf(preimage: DataFrame, postimage: DataFrame,
      inserts: DataFrame, path: String, commitId: String): Seq[String] = {
    val chg = preimage.withColumn("_change_type", lit("update_preimage"))
      .unionByName(postimage.withColumn("_change_type", lit("update_postimage")))
      .unionByName(inserts.withColumn("_change_type", lit("insert")))
    writeChanges(chg, path, commitId)
  }

  private def writeChanges(chg: DataFrame, path: String,
      commitId: String): Seq[String] = {
    val rel = s"_changes/c-$commitId"
    chg.write.mode("errorifexists").parquet(s"$path/$rel")
    listParquet(Paths.get(norm(path), "_changes", s"c-$commitId"))
      .map(f => s"$rel/$f")
  }

  /** DELETE rows matching `pred`: rewrite the live set filtered (at
    * scale, the same footer-range pruning as [[merge]] applies when
    * the predicate is key-range-shaped; arbitrary predicates rewrite
    * what they scan). Publishes as a checkpoint with the same
    * conflict detection as merge. */
  def deleteWhere(spark: SparkSession, path: String,
      pred: org.apache.spark.sql.Column): Int = {
    val base = snapshot(path)
    val live = read(spark, path, Some(base.version))
    val kept = live.where(!pred || pred.isNull)
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val dataRel = s"data/c-$commitId"
    kept.write.mode("errorifexists").parquet(s"$path/$dataRel")
    val added = listParquet(dataPath(path, commitId))
      .map(f => s"$dataRel/$f")
    // row-level CDF: the deleted rows, persisted before publish
    val changeRel = writeChanges(
      live.where(pred).withColumn("_change_type", lit("delete")),
      path, commitId)
    val cur = versions(path).max
    if (cur != base.version)
      throw new java.util.ConcurrentModificationException(
        s"versioned: delete at $path read v${base.version} but the log is " +
          s"at v$cur; retry")
    val txns = parseManifest(manifestPath(path, cur)).txns
    if (!publish(path, Manifest(cur + 1, "delete", full = true, added,
      base.schemaDdl, txns, changes = Some(changeRel),
      stats = fileStatsOf(spark, path, added))))
      throw new java.util.ConcurrentModificationException(
        s"versioned: delete at $path lost the publish race; retry")
    cur + 1
  }

  /** OPTIMIZE: compact the live set into `numFiles` files — same
    * rows, new layout — as a new version. The small-files problem is
    * the chronic failure mode of streaming appends (every micro-batch
    * lands a file; a month of 1-minute batches is 43k files whose
    * footer/open cost dominates the scan); compaction is a pure log
    * operation for readers since time travel still sees the old
    * layout. Same conflict detection as [[merge]]. */
  def optimize(spark: SparkSession, path: String, numFiles: Int = 1,
      clusterBy: Seq[String] = Nil): Int = {
    val base = snapshot(path)
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val dataRel = s"data/c-$commitId"
    val rows = read(spark, path, Some(base.version))
    val laidOut =
      if (clusterBy.isEmpty) rows.repartition(numFiles)
      else {
        // OPTIMIZE … ZORDER BY: range-partition on the layout key so
        // every output file gets a TIGHT min/max footer range in the
        // clustered dimension(s) — [[merge]]'s stats pruning then
        // rewrites only the files a key batch actually intersects
        // (VersionedSpec demonstrates the touched-set shrinking).
        // Two columns interleave via the Morton key; one sorts plain.
        val key = clusterBy match {
          case Seq(a) => col(a)
          case Seq(a, b) => graft.operators.ZOrder.zValue(col(a), col(b))
          case other => sys.error(
            s"versioned: clusterBy supports 1–2 columns, got $other")
        }
        rows.repartitionByRange(numFiles, key)
      }
    laidOut.write.mode("errorifexists").parquet(s"$path/$dataRel")
    val added = listParquet(dataPath(path, commitId))
      .map(f => s"$dataRel/$f")
    val cur = versions(path).max
    if (cur != base.version)
      throw new java.util.ConcurrentModificationException(
        s"versioned: optimize at $path read v${base.version} but the log " +
          s"is at v$cur; retry")
    val txns = parseManifest(manifestPath(path, cur)).txns
    if (!publish(path, Manifest(cur + 1, "optimize", full = true, added,
      base.schemaDdl, txns, stats = fileStatsOf(spark, path, added))))
      throw new java.util.ConcurrentModificationException(
        s"versioned: optimize at $path lost the publish race; retry")
    cur + 1
  }

  /** The files version `v` ADDED (append commits only — loud error
    * otherwise): a delta manifest lists them directly; an append
    * CHECKPOINT carries the full live set, so its additions are the
    * files absent from the previous version's set. */
  private def addedAt(path: String, v: Int, fromVersion: Int,
      toVersion: Int): (Seq[String], String) = {
    val m = parseManifest(manifestPath(path, v))
    require(m.op == "append",
      s"versioned: CDC range ($fromVersion, $toVersion] crosses a " +
        s"'${m.op}' commit at v$v — change feed is append-only")
    val added =
      if (!m.full) m.files
      else {
        val prev =
          if (v <= 1) Set.empty[String] // v1 has no predecessor
          else snapshot(path, Some(v - 1)).files.toSet
        m.files.filterNot(prev)
      }
    (added, m.schemaDdl)
  }

  /** All files appended by versions (`fromVersion`, `toVersion`] —
    * the streaming-source feed ([[VersionedMicroBatchStream]]).
    * `skipChangeCommits`: silently skip non-append commits (their
    * rewrites are not emitted) instead of erroring — the live-tail +
    * OPTIMIZE coexistence mode. */
  private[sources] def appendedFiles(path: String, fromVersion: Int,
      toVersion: Int, skipChangeCommits: Boolean = false): Seq[String] = {
    val range = versions(path).filter(v => v > fromVersion && v <= toVersion)
    val kept =
      if (!skipChangeCommits) range
      else range.filter(v => parseManifest(manifestPath(path, v)).op == "append")
    kept.flatMap(v => addedAt(path, v, fromVersion, toVersion)._1)
  }

  /** CDC read: the row-level changes of versions (`fromVersion`,
    * `toVersion`] with `_change_type` and `_commit_version` columns —
    * Delta CDF semantics, the incremental-consumer feed (probe only
    * NEW documents against the minhash history, `d14`-style; follow
    * an UPSERTED corpus without rescanning it).
    *
    *  - append commits emit their added rows as `insert`;
    *  - merge commits emit the change parquet persisted at commit
    *    time (`update_preimage` / `update_postimage` / `insert`) —
    *    round 10; previously any COW commit in range errored;
    *  - delete commits emit their removed rows as `delete`;
    *  - optimize commits emit NOTHING (pure layout, rows unchanged);
    *  - overwrite / restore still error loudly: they are statements
    *    about whole-table state, and their row-level delta is not
    *    recorded (Delta CDF draws the same line — CDC consumers must
    *    re-baseline across them).
    *
    * Pre-r10 merge/delete commits (no persisted change set) also
    * error, with a message saying so. */
  /** Per-version CDC batches of (`fromVersion`, `toVersion`]:
    * (version, files, ddl, fromChangeParquet). Append versions list
    * their added DATA files (`fromChangeParquet = false` — the
    * consumer tags them `insert`); merge/delete list their persisted
    * change parquet (which carries `_change_type` itself); optimize
    * contributes nothing. Shared by [[readChanges]] and the DSv2
    * change-feed stream. */
  private[sources] def changeBatches(path: String, fromVersion: Int,
      toVersion: Int): Seq[(Int, Seq[String], String, Boolean)] = {
    val range = versions(path).filter(v => v > fromVersion && v <= toVersion)
    range.map { v =>
      val m = parseManifest(manifestPath(path, v))
      m.op match {
        case "append" =>
          val (addedFiles, ddl) = addedAt(path, v, fromVersion, toVersion)
          (v, addedFiles, ddl, false)
        case "merge" | "delete" =>
          val chg = m.changes.getOrElse(sys.error(
            s"versioned: v$v is a pre-CDF '${m.op}' commit with no " +
              "persisted change set — re-baseline past it"))
          (v, chg, m.schemaDdl, true)
        case "optimize" => (v, Nil, m.schemaDdl, true) // layout-only
        case other => sys.error(
          s"versioned: CDC range ($fromVersion, $toVersion] crosses a " +
            s"'$other' commit at v$v — re-baseline from its snapshot")
      }
    }
  }

  def readChanges(spark: SparkSession, path: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    val vs = versions(path)
    require(vs.contains(toVersion) && (fromVersion == 0 ||
      vs.contains(fromVersion)) && fromVersion < toVersion,
      s"versioned: bad change range ($fromVersion, $toVersion] " +
        s"(have ${vs.mkString(",")})")
    val parts = changeBatches(path, fromVersion, toVersion)
    val schema = StructType.fromDDL(parts.last._3)
      .add("_change_type", "string")
    parts.map { case (v, files, _, isChange) =>
      val df =
        if (files.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        else if (isChange)
          spark.read.schema(schema).parquet(files.map(f => s"$path/$f"): _*)
        else spark.read.schema(schema) // absent _change_type reads null
          .parquet(files.map(f => s"$path/$f"): _*)
          .withColumn("_change_type", lit("insert"))
      df.withColumn("_commit_version", lit(v))
    }.reduce(_ unionByName _)
  }


  /** DATA SKIPPING from manifest stats (round 10, Delta's read-path
    * analog of the merge pruning): the live files whose recorded
    * [min, max] for `colName` intersects [lo, hi]. Files with NO
    * stats entry (pre-stats manifests) are conservatively kept; files
    * WITH a stats entry that lacks the column hold no non-null values
    * of it (empty write partition / pre-evolution file), and since
    * every supported predicate is a non-null comparison they are
    * skipped. The DSv2 connector applies this transparently to pushed
    * BIGINT range filters — the filters still run post-scan, pruning
    * only removes files that cannot contain a qualifying row. */
  def pruneFiles(snap: Snapshot, colName: String,
      lo: Long, hi: Long): Seq[String] =
    snap.files.filter { f =>
      snap.stats.get(f) match {
        case None => true // pre-stats manifest: never skip
        case Some(cols) => cols.get(colName) match {
          case Some((flo, fhi)) => fhi >= lo && flo <= hi
          case None => false // no non-null values of the column
        }
      }
    }

  /** Read the table at `asOf` (default latest). Empty live set reads
    * as an empty relation with the committed schema. */
  def read(spark: SparkSession, path: String,
      asOf: Option[Int] = None): DataFrame = {
    val s = snapshot(path, asOf)
    val schema = StructType.fromDDL(s.schemaDdl)
    if (s.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(s.files.map(f => s"$path/$f"): _*)
  }

  /** Files younger than this survive [[vacuum]] even when no retained
    * snapshot references them — the in-flight-writer guard. Writers
    * put data files on disk BEFORE publishing their manifest
    * (optimistic concurrency, see the class doc), so an unreferenced
    * file may be a commit that is milliseconds from becoming visible;
    * reclaiming it would leave the soon-published manifest pointing at
    * deleted data — permanent loss on a COMMITTED version. Delta's
    * VACUUM draws the same line with a modification-time retention
    * horizon (default 7 days); 15 minutes is proportionate to a
    * single-filesystem deployment where a commit's write-to-publish
    * window is seconds. */
  val DefaultVacuumGraceMs: Long = 15L * 60 * 1000

  /** Delete data and change files unreachable from the last
    * `retainVersions` snapshots (Delta VACUUM). DESTRUCTIVE for time
    * travel past the horizon: older versions keep their manifests
    * (audit trail) but their unique files are gone and reading them
    * errors at scan. Files whose mtime is within `graceMs` of now are
    * NEVER reclaimed (see [[DefaultVacuumGraceMs]]); pass 0 only when
    * the caller guarantees no concurrent writer exists.
    * Returns the deleted relative paths. */
  def vacuum(path: String, retainVersions: Int = CheckpointInterval,
      graceMs: Long = DefaultVacuumGraceMs): Seq[String] = {
    val vs = versions(path)
    if (vs.isEmpty) return Seq.empty
    val keepVs = vs.takeRight(retainVersions)
    val keepManifests = keepVs.map(v => parseManifest(manifestPath(path, v)))
    val keep = keepVs.flatMap(v => snapshot(path, Some(v)).files).toSet ++
      keepManifests.flatMap(_.changes.getOrElse(Nil))
    val horizon = System.currentTimeMillis() - graceMs
    def sweep(dirName: String): Vector[String] = {
      val dir = Paths.get(norm(path), dirName)
      if (!Files.isDirectory(dir)) return Vector.empty
      listDir(dir).flatMap { cdir =>
        listDir(cdir).map(f => s"$dirName/${cdir.getFileName}/${f.getFileName}")
      }
    }
    val dead = (sweep("data") ++ sweep("_changes"))
      .filterNot(f => keep.contains(f) ||
        f.split('/').last.startsWith("_")) // keep parquet _SUCCESS markers
      .filter { f =>
        // in-flight-writer guard: a young unreferenced file may belong
        // to a commit racing toward publish — leave it for a later pass
        try Files.getLastModifiedTime(Paths.get(norm(path), f))
          .toMillis <= horizon
        catch { case _: java.nio.file.NoSuchFileException => false }
      }
    dead.sorted.map { f =>
      Files.deleteIfExists(Paths.get(norm(path), f)); f
    }
  }

  // -------------------------------------------- driver query surface

  /** v1_time_travel: exercise the full commit/replay path against the
    * documents table — two appends, an overwrite, a restore — then
    * read EVERY version back through the log and aggregate, plus one
    * TIMESTAMP-based read (row 5): `readAsOfTimestamp` at the last
    * commit's stamp must resolve to v4's state through the monotone
    * stamp scan (commits land milliseconds apart here, so only the
    * latest stamp is tie-free and deterministic — the between-commit
    * and out-of-range cases are VersionedSpec's, with forced stamp
    * gaps). The per-version aggregates are O(versions) single-row
    * collects; the oracle replays the predicates relationally (a
    * versioned read at version v IS the union of the commits live at
    * v). */
  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val tmp = Files.createTempDirectory("graft-versioned-").toString
    try {
      commit(docs.where(col("doc_id") % 3 === 0), tmp, "append") // v1
      commit(docs.where(col("doc_id") % 3 === 1), tmp, "append") // v2
      commit(docs.where(col("doc_id") % 2 === 0), tmp, "overwrite") // v3
      restore(tmp, 2) // v4 == v2's live set
      def aggOf(df: DataFrame) = df
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_doc_id"),
          sum(col("n_chars")).as("sum_chars"))
        .head()
      val rows = (1 to 4).map { v =>
        val r = aggOf(read(spark, tmp, Some(v)))
        Row(v, r.getLong(0), r.getLong(1), r.getLong(2))
      } :+ {
        val r = aggOf(
          readAsOfTimestamp(spark, tmp, commitTimestamp(tmp, 4)))
        Row(5, r.getLong(0), r.getLong(1), r.getLong(2))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType.fromDDL(
          "version INT, n_rows BIGINT, sum_doc_id BIGINT, sum_chars BIGINT"))
        .orderBy(col("version"))
    } finally deleteRecursively(Paths.get(tmp))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** v2_merge_upsert: exercise the COW merge + delete path — seed the
    * table with the even doc_ids, MERGE the multiples of 3 with their
    * char count negated (evens∩3k are updated in place, odd 3k rows
    * are inserted), then DELETE the multiples of 5. Each version's
    * state is read back THROUGH the log and aggregated; the oracle
    * replays the three set algebra states relationally. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val tmp = Files.createTempDirectory("graft-versioned-").toString
    try {
      commit(docs.where(col("doc_id") % 2 === 0), tmp, "append") // v1
      merge(docs.where(col("doc_id") % 3 === 0)
        .withColumn("n_chars", -col("n_chars")), tmp, "doc_id") // v2
      deleteWhere(spark, tmp, col("doc_id") % 5 === 0) // v3
      val rows = (1 to 3).map { v =>
        val r = read(spark, tmp, Some(v))
          .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_doc_id"),
            sum(col("n_chars")).as("sum_chars"))
          .head()
        Row(v, r.getLong(0), r.getLong(1), r.getLong(2))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType.fromDDL(
          "version INT, n_rows BIGINT, sum_doc_id BIGINT, sum_chars BIGINT"))
        .orderBy(col("version"))
    } finally deleteRecursively(Paths.get(tmp))
  }

  /** v3_source_read: the DSv2 connector path — commit two versions,
    * read BOTH through `format("graftv")` (latest + time travel), with
    * the aggregate's column pruning pushed into the connector's
    * parquet read schema (asserted structurally in
    * VersionedSourceSpec). Aggregates are collected per version like
    * v1/v2 (two 1-row collects). */
  def sourceRead(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val tmp = Files.createTempDirectory("graft-versioned-").toString
    try {
      commit(docs.where(col("doc_id") % 4 === 0), tmp, "append") // v1
      commit(docs.where(col("doc_id") % 4 === 2), tmp, "append") // v2
      val rows = Seq(
        spark.read.format("graftv").option("versionAsOf", 1).load(tmp)
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc")).head(),
        spark.read.format("graftv").load(tmp)
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc")).head())
        .zipWithIndex.map { case (r, i) =>
          Row(i + 1, r.getLong(0), r.getLong(1))
        }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType.fromDDL("version INT, n_rows BIGINT, sum_chars BIGINT"))
        .orderBy(col("version"))
    } finally deleteRecursively(Paths.get(tmp))
  }

  /** v4_change_feed: row-level CDC through the log — three append
    * commits AND a COW merge (round 10), then `readChanges(1, 4)`
    * aggregated per (`_commit_version`, `_change_type`); the oracle
    * replays each commit's predicate — appends are the appended
    * relations as `insert` rows, and the merge's pre/post images are
    * the matched keys under the before/after state (the same set
    * algebra the v2 oracle uses). */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val tmp = Files.createTempDirectory("graft-versioned-").toString
    try {
      commit(docs.where(col("doc_id") % 3 === 0), tmp, "append") // v1
      commit(docs.where(col("doc_id") % 3 === 1), tmp, "append") // v2
      commit(docs.where(col("doc_id") % 3 === 2), tmp, "append") // v3
      merge(docs.where(col("doc_id") % 5 === 0)
        .withColumn("n_chars", -col("n_chars")), tmp, "doc_id") // v4 (COW)
      val rows = readChanges(spark, tmp, fromVersion = 1, toVersion = 4)
        .groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_doc_id"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("_commit_version"), col("_change_type"))
        .collect().toSeq // O(versions × change kinds) rows
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(r.getInt(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))), 1),
        StructType.fromDDL(
          "commit_version INT, change_type STRING, n_rows BIGINT, " +
            "sum_doc_id BIGINT, sum_chars BIGINT"))
        .orderBy(col("commit_version"), col("change_type"))
    } finally deleteRecursively(Paths.get(tmp))
  }

  /** v5_schema_evolution: a mergeSchema append adds a column; the
    * read unions old (null-filled) and new files under the evolved
    * DDL. The oracle replays the null-fill law relationally: the
    * pre-evolution half contributes NULL extras. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val tmp = Files.createTempDirectory("graft-versioned-").toString
    try {
      commit(docs.where(col("doc_id") % 2 === 0), tmp, "append") // v1 (id, n)
      commit(docs.where(col("doc_id") % 2 === 1)
        .withColumn("extra", col("n_chars") * 2), tmp, "append",
        mergeSchema = true) // v2 evolves: extra joins as nullable
      val r = read(spark, tmp)
        .agg(count(lit(1)).as("n_rows"),
          count(col("extra")).as("n_extra"),
          sum(coalesce(col("extra"), lit(0L))).as("sum_extra"),
          sum(col("n_chars")).as("sum_chars"))
        .head()
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(
          r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))), 1),
        StructType.fromDDL("n_rows BIGINT, n_extra BIGINT, " +
          "sum_extra BIGINT, sum_chars BIGINT"))
    } finally deleteRecursively(Paths.get(tmp))
  }

  /** v6_cdf_apply: the CDF-apply LAW as an oracle gate — after an
    * append + COW merge + delete, the table's final state is
    * reconstructed purely FROM THE CHANGE FEED (adds = inserts +
    * postimages, removes = preimages + deletes, multiset difference)
    * and aggregated; the DuckDB twin derives the same state by the
    * v2-style set algebra. This is what a downstream incremental
    * consumer of an upserted corpus does — the gate proves the feed
    * is a complete, sufficient description of the table's evolution
    * (the single-threaded law the model fuzz asserts per-commit, now
    * driver-checked cross-engine). */
  def cdfApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val tmp = Files.createTempDirectory("graft-versioned-").toString
    try {
      commit(docs.where(col("doc_id") % 2 === 0), tmp, "append") // v1
      merge(docs.where(col("doc_id") % 3 === 0)
        .withColumn("n_chars", -col("n_chars")), tmp, "doc_id") // v2
      deleteWhere(spark, tmp, col("doc_id") % 5 === 0) // v3
      val ch = readChanges(spark, tmp, fromVersion = 0, toVersion = 3)
      val mult = when(col("_change_type").isin("insert", "update_postimage"),
        1).otherwise(-1)
      val state = ch.groupBy(col("doc_id"), col("n_chars"))
        .agg(sum(mult).as("m"))
        .where(col("m") === 1)
      val r = state
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("sum_doc_id"),
          sum(col("n_chars")).as("sum_chars"))
        .head()
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(
          r.getLong(0), r.getLong(1), r.getLong(2))), 1),
        StructType.fromDDL(
          "n_rows BIGINT, sum_doc_id BIGINT, sum_chars BIGINT"))
    } finally deleteRecursively(Paths.get(tmp))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_time_travel" -> (timeTravel _),
    "v2_merge_upsert" -> (mergeUpsert _),
    "v3_source_read" -> (sourceRead _),
    "v4_change_feed" -> (changeFeed _),
    "v5_schema_evolution" -> (schemaEvolution _),
    "v6_cdf_apply" -> (cdfApply _))

  val oracle: Map[String, String] = Map(
    "v6_cdf_apply" -> """
      WITH state2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN -n_chars ELSE n_chars END
                 AS n_chars
        FROM documents WHERE doc_id % 2 = 0 OR doc_id % 3 = 0),
      state3 AS (SELECT * FROM state2 WHERE doc_id % 5 <> 0)
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM state3""",
    "v4_change_feed" -> """
      WITH agg AS (
        SELECT 2 AS commit_version, 'insert' AS change_type,
               count(*) AS n_rows, sum(doc_id) AS sum_doc_id,
               sum(n_chars) AS sum_chars
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        SELECT 3, 'insert', count(*), sum(doc_id), sum(n_chars)
        FROM documents WHERE doc_id % 3 = 2
        UNION ALL
        SELECT 4, 'update_preimage', count(*), sum(doc_id), sum(n_chars)
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT 4, 'update_postimage', count(*), sum(doc_id), sum(-n_chars)
        FROM documents WHERE doc_id % 5 = 0)
      SELECT CAST(commit_version AS INT) AS commit_version,
             change_type,
             CAST(n_rows AS BIGINT) AS n_rows,
             CAST(sum_doc_id AS BIGINT) AS sum_doc_id,
             CAST(sum_chars AS BIGINT) AS sum_chars
      FROM agg ORDER BY commit_version, change_type""",
    "v5_schema_evolution" -> """
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)
               AS n_extra,
             CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars * 2
                           ELSE 0 END) AS BIGINT) AS sum_extra,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents""",
    "v3_source_read" -> """
      WITH agg AS (
        SELECT 1 AS version, count(*) AS n_rows, sum(n_chars) AS sum_chars
        FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT 2, count(*), sum(n_chars)
        FROM documents WHERE doc_id % 4 IN (0, 2))
      SELECT CAST(version AS INT) AS version,
             CAST(n_rows AS BIGINT) AS n_rows,
             CAST(sum_chars AS BIGINT) AS sum_chars
      FROM agg ORDER BY version""",
    "v2_merge_upsert" -> """
      WITH state2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN -n_chars ELSE n_chars END
                 AS n_chars
        FROM documents WHERE doc_id % 2 = 0 OR doc_id % 3 = 0),
      agg AS (
        SELECT 1 AS version, count(*) AS n_rows,
               sum(doc_id) AS sum_doc_id, sum(n_chars) AS sum_chars
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT 2, count(*), sum(doc_id), sum(n_chars) FROM state2
        UNION ALL
        SELECT 3, count(*), sum(doc_id), sum(n_chars) FROM state2
        WHERE doc_id % 5 <> 0)
      SELECT CAST(version AS INT) AS version,
             CAST(n_rows AS BIGINT) AS n_rows,
             CAST(sum_doc_id AS BIGINT) AS sum_doc_id,
             CAST(sum_chars AS BIGINT) AS sum_chars
      FROM agg ORDER BY version""",
    "v1_time_travel" -> """
      WITH agg AS (
        SELECT 1 AS version, count(*) AS n_rows,
               sum(doc_id) AS sum_doc_id, sum(n_chars) AS sum_chars
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT 2, count(*), sum(doc_id), sum(n_chars)
        FROM documents WHERE doc_id % 3 IN (0, 1)
        UNION ALL
        SELECT 3, count(*), sum(doc_id), sum(n_chars)
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT 4, count(*), sum(doc_id), sum(n_chars)
        FROM documents WHERE doc_id % 3 IN (0, 1)
        UNION ALL
        -- row 5: the timestampAsOf read of the latest stamp == v4
        SELECT 5, count(*), sum(doc_id), sum(n_chars)
        FROM documents WHERE doc_id % 3 IN (0, 1))
      SELECT CAST(version AS INT) AS version,
             CAST(n_rows AS BIGINT) AS n_rows,
             CAST(sum_doc_id AS BIGINT) AS sum_doc_id,
             CAST(sum_chars AS BIGINT) AS sum_chars
      FROM agg ORDER BY version""")
}
