package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file BLOOM sidecars — point-lookup data skipping for versioned
  * tables (round 16; the role Delta's bloom-filter index plays,
  * re-derived from its published behavior: min/max range stats prune
  * NOTHING for high-cardinality unordered keys — a uuid column's
  * [lo, hi] spans the whole key space in every file, so a point
  * DELETE/UPDATE/MERGE on a 100 TB uuid-keyed table rewrites or scans
  * every file. A per-file bloom over the configured key columns makes
  * "which files can hold these keys" O(matching files) with a bounded
  * false-positive rate, composing with the DV path: point DML becomes
  * bloom-prune → DV-mask, both ∝ the touched keys).
  *
  * Design — CONTENT-ADDRESSED, not manifest-recorded: a bloom is a
  * PURE FUNCTION of its immutable data file (like the parquet footer
  * stats the range tier reads), so the log carries no new state. The
  * sidecar for data file `rel` lives at `_bloom/<sha1(rel)>.bf`;
  * readers discover it by existence and its absence always degrades
  * to the range tier (never wrong results, only weaker pruning). No
  * manifest format change, nothing new to replay/checkpoint/clone —
  * and a crashed commit's orphan sidecar is unreachable garbage
  * reclaimed with its data file.
  *
  * Write path: [[buildFor]] is invoked from the per-commit stats seam
  * for every batch of FRESH data files when
  * `spark.graft.bloom.columns` names key columns (logical names;
  * recorded under their stable PHYSICAL names so column renames never
  * invalidate a sidecar). Two passes over the new files only: a
  * footer-served per-file row count to size each filter (~9.6
  * bits/key for 1 % fpp), then one distributed scan that ORs per-file
  * bit sets executor-side and writes each sidecar from the task that
  * merged it — the driver sees only file names. Bits are an OR-fold,
  * so task retries and row order cannot change the bytes.
  *
  * Read path: [[survivors]] tests a finite key set (from an
  * equality/IN predicate or a small MERGE source) against candidate
  * files EXECUTOR-SIDE — one task per candidate reads that file's
  * sidecar (per-JVM cache, like DV masks) and answers may-contain;
  * the driver ships only keys (bounded by the caller) and gets back
  * booleans. A file lacking a sidecar, or lacking the probed column,
  * is conservatively kept. */
private[sources] object BloomFilters {

  private val Magic = 0x47424631 // "GBF1"
  val ColumnsConf = "spark.graft.bloom.columns"
  val FppConf = "spark.graft.bloom.fpp"
  /** MERGE sources with at most this many distinct key tuples probe
    * blooms (the CDC-upsert regime); larger sources stay on the range
    * tier — their driver key set would be unbounded. */
  val MergeKeyCap = 8192

  final case class Bloom(k: Int, mBits: Long, words: Array[Long]) {
    def mayContain(keyBytes: Array[Byte]): Boolean = {
      val h1 = hash64(keyBytes, 0x9e3779b97f4a7c15L)
      val h2 = hash64(keyBytes, 0xc2b2ae3d27d4eb4fL) | 1L
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
        if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L)
          return false
        i += 1
      }
      true
    }
  }

  /** Deterministic cross-JVM 64-bit hash: FNV-1a folded with a
    * splitmix64 finalizer (public constants). Quality only needs to
    * be bloom-grade; determinism is the contract. */
  private def hash64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Canonical probe bytes per key value; None = type outside the
    * bloom domain (mirrors the [[Versioned.ColStat]] tiers: widened
    * integers and ASCII-safe strings — here any UTF-8 string). */
  def keyBytes(v: Any): Option[Array[Byte]] = v match {
    case l: Long => Some(longBytes(l))
    case i: Int => Some(longBytes(i.toLong))
    case s: Short => Some(longBytes(s.toLong))
    case b: Byte => Some(longBytes(b.toLong))
    case s: String => Some(s.getBytes("UTF-8"))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.getBytes)
    case _ => None
  }

  private def longBytes(l: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (l >>> (56 - 8 * i)).toByte; i += 1 }
    b
  }

  /** Sidecar path for a table-relative data file — sha1 of the rel
    * path, so the mapping survives with no manifest entry. */
  def sidecarRel(dataRel: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val hex = md.digest(dataRel.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    s"_bloom/$hex.bf"
  }

  private def paramsFor(n: Long, fpp: Double): (Long, Int) = {
    // m = -n ln p / (ln 2)^2, k = m/n ln 2; fpp 1 % → ~9.6 bits/key, k 7
    val m0 = math.ceil(-n.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    val m = math.max(64L, (m0 + 63) & ~63L)
    val k = math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)
    (m, math.min(k, 16))
  }

  private def writeSidecar(abs: Path,
      blooms: Seq[(String, Bloom)]): Unit = {
    Option(abs.getParent).foreach(Files.createDirectories(_))
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(abs)))
    try {
      out.writeInt(Magic)
      out.writeInt(1)
      out.writeInt(blooms.size)
      blooms.sortBy(_._1).foreach { case (col, b) =>
        out.writeUTF(col)
        out.writeInt(b.k)
        out.writeLong(b.mBits)
        out.writeInt(b.words.length)
        b.words.foreach(out.writeLong)
      }
    } finally out.close()
  }

  private def readSidecar(abs: Path): Map[String, Bloom] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(abs)))
    try {
      require(in.readInt() == Magic, s"versioned: $abs is not a bloom sidecar")
      val ver = in.readInt()
      require(ver == 1, s"versioned: unsupported bloom version $ver at $abs")
      (0 until in.readInt()).map { _ =>
        val col = in.readUTF()
        val k = in.readInt()
        val m = in.readLong()
        val words = Array.fill(in.readInt())(in.readLong())
        col -> Bloom(k, m, words)
      }.toMap
    } finally in.close()
  }

  /** Executor-local sidecar cache (immutable files — the DV-mask
    * discipline, [[DeletionVectors.maskFor]]). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Bloom]]()

  private def sidecarFor(abs: String): Map[String, Bloom] = {
    val hit = cache.get(abs)
    if (hit != null) hit
    else {
      if (cache.size >= 1024) cache.clear()
      val m = readSidecar(Paths.get(abs))
      cache.putIfAbsent(abs, m)
      m
    }
  }

  /** Physical bloom columns this session asks for, or empty = off. */
  def configuredPhysCols(spark: SparkSession,
      colMap: Map[String, String]): Seq[String] =
    spark.conf.getOption(ColumnsConf).map(_.split(",").toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map(c => colMap.getOrElse(c, c))).getOrElse(Nil)

  /** Build + write sidecars for FRESH data files (called from the
    * per-commit stats seam). `physCols` are physical names; columns
    * absent from the files or outside the long/string domain are
    * skipped. Returns the rels a sidecar was written for. */
  def buildFor(spark: SparkSession, tableRoot: String, rels: Seq[String],
      physCols: Seq[String], rowCounts: Map[String, Long] = Map.empty)
      : Seq[String] = {
    if (rels.isEmpty || physCols.isEmpty) return Nil
    val absRoot = Paths.get(tableRoot).toAbsolutePath.toString
    val abs = rels.map(r => s"$absRoot/$r")
    val raw = spark.read.parquet(abs: _*)
    val present = physCols.filter(c => raw.schema.exists(f =>
      f.name == c && (f.dataType match {
        case LongType | IntegerType | ShortType | ByteType | StringType => true
        case _ => false
      })))
    if (present.isEmpty) return Nil
    val types: Map[String, DataType] =
      present.map(c => c -> raw.schema(c).dataType).toMap
    // per-file row counts size each filter. The commit seam passes
    // them in from the footer stats it just read driver-side (round
    // 17 — the former pass 1 here was a distributed
    // groupBy(file).count()+collect per commit); the scan job below
    // only survives as a fallback for callers without counts.
    val counts: Map[String, Long] =
      if (rels.forall(rowCounts.contains))
        rels.map(r => s"$absRoot/$r" -> rowCounts(r)).toMap
      else raw
        .groupBy(col("_metadata.file_path").as("__f")).count()
        .collect().map(r => DeletionVectors.normFilePath(r.getString(0)) ->
          r.getLong(1)).toMap
    val fpp = spark.conf.getOption(FppConf).map(_.toDouble).getOrElse(0.01)
    val plan: Map[String, (String, Long, Int)] = rels.map { r =>
      val n = math.max(counts.getOrElse(s"$absRoot/$r", 1L), 1L)
      val (m, k) = paramsFor(n, fpp)
      s"$absRoot/$r" -> ((r, m, k))
    }.toMap
    val planB = spark.sparkContext.broadcast(plan)
    val typesB = spark.sparkContext.broadcast(types)
    val presentB = spark.sparkContext.broadcast(present)
    val rootB = spark.sparkContext.broadcast(absRoot)
    // pass 2: one scan; per-partition per-file bit sets, OR-reduced
    // per file, each sidecar written by the task that merged it
    val written = raw
      .select((col("_metadata.file_path").as("__f") +: present.map(col)): _*)
      .rdd.mapPartitions { it =>
        val acc = scala.collection.mutable.Map[String, Array[Array[Long]]]()
        it.foreach { row =>
          val f = DeletionVectors.normFilePath(row.getString(0))
          val (_, m, k) = planB.value(f)
          val sets = acc.getOrElseUpdate(f,
            Array.fill(presentB.value.size)(new Array[Long]((m >>> 6).toInt)))
          var ci = 0
          while (ci < presentB.value.size) {
            if (!row.isNullAt(ci + 1)) {
              val bytes = (typesB.value(presentB.value(ci)) match {
                case LongType => keyBytes(row.getLong(ci + 1))
                case IntegerType => keyBytes(row.getInt(ci + 1))
                case ShortType => keyBytes(row.getShort(ci + 1))
                case ByteType => keyBytes(row.getByte(ci + 1))
                case _ => keyBytes(row.getString(ci + 1))
              }).get
              val h1 = hash64(bytes, 0x9e3779b97f4a7c15L)
              val h2 = hash64(bytes, 0xc2b2ae3d27d4eb4fL) | 1L
              var i = 0
              while (i < k) {
                val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
                sets(ci)((bit >>> 6).toInt) |= 1L << (bit & 63)
                i += 1
              }
            }
            ci += 1
          }
        }
        acc.iterator
      }
      .reduceByKey { (a, b) =>
        var ci = 0
        while (ci < a.length) {
          var w = 0
          while (w < a(ci).length) { a(ci)(w) |= b(ci)(w); w += 1 }
          ci += 1
        }
        a
      }
      .map { case (f, sets) =>
        val (rel, m, k) = planB.value(f)
        writeSidecar(Paths.get(rootB.value, sidecarRel(rel)),
          presentB.value.zipWithIndex.map { case (c, i) =>
            c -> Bloom(k, m, sets(i))
          })
        rel
      }.collect().toSeq
    planB.destroy(); typesB.destroy(); presentB.destroy(); rootB.destroy()
    written
  }

  /** The candidate rels that MAY contain a row satisfying every
    * per-column finite key set (AND semantics — the caller derived
    * `keySets` as NECESSARY conditions). Probes run executor-side,
    * one task per candidate; files without a sidecar (or without a
    * probed column) are kept. Returns the surviving subset. */
  def survivors(spark: SparkSession, tableRoot: String,
      candidates: Seq[String], keySets: Map[String, Seq[Any]])
      : Set[String] = {
    val probe = keySets.toSeq.map { case (c, vs) =>
      c -> vs.flatMap(keyBytes)
    }.filter(_._2.nonEmpty)
    if (candidates.isEmpty || probe.isEmpty) return candidates.toSet
    val absRoot = Paths.get(tableRoot).toAbsolutePath.toString
    val withSidecar = candidates.filter(r =>
      Files.exists(Paths.get(absRoot, sidecarRel(r))))
    if (withSidecar.isEmpty) return candidates.toSet
    val probeB = spark.sparkContext.broadcast(probe)
    val rootB = spark.sparkContext.broadcast(absRoot)
    val kept = spark.sparkContext
      .parallelize(withSidecar, math.max(1,
        math.min(withSidecar.size, 256)))
      .filter { rel =>
        val blooms = sidecarFor(s"${rootB.value}/${sidecarRel(rel)}")
        probeB.value.forall { case (c, keys) =>
          blooms.get(c) match {
            case None => true // column not bloom'd in this file: keep
            case Some(b) => keys.exists(b.mayContain)
          }
        }
      }.collect().toSet
    probeB.destroy(); rootB.destroy()
    candidates.filterNot(withSidecar.toSet).toSet ++ kept
  }
}
