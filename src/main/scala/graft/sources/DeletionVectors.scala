package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion vectors — merge-on-read point DML for versioned tables
  * (round 15, VERDICT r14 #1; the Delta DV discipline re-derived from
  * its published behavior: a DELETE/UPDATE that touches few rows of
  * large files commits a per-file sidecar of deleted row ORDINALS
  * instead of rewriting file bytes, scans mask the ordinals, and
  * OPTIMIZE purges by rewriting; the reference has no row-level DML
  * at all — its closest analog is rewriting whole rset files,
  * database/__init__.py:1062–1067 — so this is pure table-format
  * surface).
  *
  * Sidecar format (version 1): `magic int, version int, count long,
  * count × long` — the sorted distinct 0-based row ordinals of the
  * data file that are deleted. Ordinals are PHYSICAL positions
  * (parquet row order, the same index `_metadata.row_index` exposes),
  * so a sidecar is valid for the file forever: data files are
  * immutable. Plain sorted longs, not a compressed bitmap: DV
  * populations are bounded by design (large-fraction deletes take the
  * COW path, OPTIMIZE purges accumulations), so the sidecar is
  * KB-scale; a production object-store tier would swap in roaring
  * bitmaps behind the same two functions without touching any caller.
  *
  * 100 TB shape: a scattered 1000-row delete on a 100 TB table writes
  * ~8 KB of sidecars + one manifest instead of rewriting every
  * touched file (potentially TBs). Reads pay a per-row ordinal mask
  * ONLY on DV-carrying files — clean files (the overwhelming
  * majority) keep their native vectorized scan. The mask state
  * broadcast to executors is O(total DV'd rows), bounded by the
  * COW-crossover fraction and reclaimed at OPTIMIZE. */
private[sources] object DeletionVectors {

  private val Magic = 0x47445631 // "GDV1"

  /** Write a sidecar of sorted distinct ordinals; returns nothing —
    * the caller owns naming and the manifest entry. */
  def write(abs: Path, positions: Array[Long]): Unit = {
    java.util.Arrays.sort(positions)
    var i = 1
    var n = if (positions.isEmpty) 0 else 1
    while (i < positions.length) { // dedup in place (already sorted)
      if (positions(i) != positions(n - 1)) {
        positions(n) = positions(i); n += 1
      }
      i += 1
    }
    Option(abs.getParent).foreach(Files.createDirectories(_))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(Files.newOutputStream(abs)))
    try {
      out.writeInt(Magic)
      out.writeInt(1)
      out.writeLong(n.toLong)
      var j = 0
      while (j < n) { out.writeLong(positions(j)); j += 1 }
    } finally out.close()
  }

  /** Read a sidecar back: sorted distinct ordinals. */
  def read(abs: Path): Array[Long] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(Files.newInputStream(abs)))
    try {
      require(in.readInt() == Magic, s"versioned: $abs is not a DV sidecar")
      require(in.readInt() == 1, s"versioned: unsupported DV version at $abs")
      val n = in.readLong().toInt
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = in.readLong(); i += 1 }
      out
    } finally in.close()
  }

  /** Deleted-ordinal sets for `dvs` (data-file relPath → sidecar
    * relPath), keyed by ABSOLUTE data-file path — the normalized form
    * `_metadata.file_path` values reduce to. Driver-side sidecar
    * reads, O(DV'd rows) memory. */
  def loadMask(tableRoot: String,
      dvs: Map[String, String]): Map[String, Array[Long]] =
    dvs.map { case (dataRel, dvRel) =>
      s"$tableRoot/$dataRel" -> read(Paths.get(tableRoot, dvRel))
    }

  /** Normalize a `_metadata.file_path` URI to the plain absolute
    * path [[loadMask]] keys by: `file:///a/b` / `file:/a/b` → `/a/b`;
    * non-file forms pass through. */
  def normFilePath(s: String): String =
    if (s.startsWith("file:")) {
      val rest = s.stripPrefix("file:")
      "/" + rest.dropWhile(_ == '/')
    } else s

  /** Predicate Column: TRUE iff the row at (`file`, `pos`) is still
    * live under `mask`. The mask rides the UDF closure — Spark
    * broadcasts it once per stage with the task binary; per-row cost
    * is one hash lookup + binary search in that file's ordinal
    * array. Applied ONLY to DV-carrying files' scans. */
  def liveFilter(mask: Map[String, Array[Long]])(
      file: Column, pos: Column): Column = {
    val live = udf { (f: String, p: Long) =>
      mask.get(normFilePath(f)) match {
        case Some(dead) => java.util.Arrays.binarySearch(dead, p) < 0
        case None => true
      }
    }
    live(file, pos)
  }

  /** Mask-aware file scan: `clean` files keep Spark's native
    * vectorized multi-file parquet scan; DV-carrying files scan with
    * `_metadata.row_index` and drop masked ordinals, then union back.
    * Both legs read the same physical schema, so the union is
    * positional and the caller's logical aliasing applies uniformly. */
  def maskedUnion(cleanScan: Option[DataFrame],
      dvScan: Option[DataFrame]): DataFrame =
    (cleanScan, dvScan) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        sys.error("versioned: maskedUnion of zero scans")
    }
}
