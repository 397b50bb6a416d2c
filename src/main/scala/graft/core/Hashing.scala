package graft.core

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical content hashing (SURVEY §2.5 D1–D7; reference:
  * database/active.py:181–184 auid = sha1(cell ⊕ positions ⊕ symbols);
  * database/__init__.py:461–470 hash_group, 1285–1293 hash_db).
  *
  * Floats are canonicalized to fixed decimal text so the hash is
  * stable across engines/partitionings; available both Scala-side
  * (for Dataset kernels) and as Column expressions (for SQL-surface
  * dedup, fully codegen'd).
  */
object Hashing {

  /** %.8f canonical float text (negative zero normalized). */
  def canon(x: Double): String = {
    val v = if (x == 0.0) 0.0 else x
    "%.8f".format(v)
  }

  def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** sha1(cell ⊕ positions ⊕ per-atom species) — active.py:181–184.
    * The species SEQUENCE (not the compressed formula) must enter the
    * hash: substitution generators permute species at fixed positions,
    * and a formula-level hash would collapse all permutations. */
  def contentHash(c: Config): String = {
    val sb = new StringBuilder
    c.cell.foreach(r => r.foreach(v => sb.append(canon(v)).append(',')))
    c.positions.foreach(r => r.foreach(v => sb.append(canon(v)).append(',')))
    sb.append(c.species.mkString(","))
    sha1Hex(sb.toString)
  }

  /** Column form: sha1 over canonicalized flattened arrays + species.
    * transform/flatten stay deterministic per-row (no aggregation
    * order dependence). */
  def contentHashCol(cell: Column, positions: Column, species: Column): Column = {
    def flat(m: Column): Column =
      array_join(transform(flatten(m), v => format_number(v, 8)), ",")
    sha1(concat_ws("|", flat(cell), flat(positions), array_join(species, ",")))
  }

  /** Hierarchical, skew-proof relation hash (D7 production form).
    *
    * The flat form (collect_list every row hash of a group, sort,
    * concat, md5) holds the ENTIRE group in one agg buffer — it
    * spills visibly at sf0.1 (d7 warm pass 1.9 s → 24 s) and dies on
    * a hot group at 100 TB. Here rows bucket by their OWN hash
    * prefix, so the definition stays order-independent and every
    * buffer is bounded:
    *
    *   chunk  = first 5 hex chars of row_h  (16^5 ≈ 1M buckets)
    *   super  = first 3 hex chars           (4096 buckets)
    *   L1: md5(concat of sorted row_h)   per (group, chunk)
    *   L2: md5(concat of L1 ordered by chunk) per (group, super)
    *   L3: md5(concat of L2 ordered by super) per group
    *
    * md5 is uniform ⇒ L1 buffers hold ~|group|/16^5 rows (a
    * billion-row group ⇒ ~1k hashes), L2 ≤ 256 entries, L3 ≤ 4096 —
    * all fixed, no windows, no skew (prefix buckets can't be hot).
    * Because chunk boundaries are VALUE-determined (hex prefixes of
    * the sorted order), equal row multisets give equal hashes under
    * any partitioning, and DuckDB replicates the definition exactly
    * (Relational.oracle d7). Input must carry a `row_h` column. */
  def chunkedHashAgg(rows: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val g = groupCols.map(col)
    def ordered(key: String, v: String): Column =
      array_join(transform(
        array_sort(collect_list(struct(col(key), col(v)))),
        x => x.getField(v)), "")
    val l1 = rows
      .withColumn("__chunk", substring(col("row_h"), 1, 5))
      .groupBy(g :+ col("__chunk"): _*)
      .agg(count(lit(1)).as("__n"),
        md5(array_join(array_sort(collect_list(col("row_h"))), "")).as("__ch"))
      .withColumn("__super", substring(col("__chunk"), 1, 3))
    val l2 = l1.groupBy(g :+ col("__super"): _*)
      .agg(sum(col("__n")).as("__n"), md5(ordered("__chunk", "__ch")).as("__sh"))
    l2.groupBy(g: _*)
      .agg(sum(col("__n")).as("n"), md5(ordered("__super", "__sh")).as("table_hash"))
  }

  /** Distributed whole-relation hash (D7): md5 per row, then the
    * chunked hierarchical combine — deterministic under any
    * partitioning, bounded agg buffers at any row count. Returns the
    * hex digest. */
  def tableHash(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted.toSeq.map(col)
    val h = df.select(md5(to_json(struct(cols: _*))).as("row_h"))
    chunkedHashAgg(h, Nil).collect()(0).getAs[String]("table_hash")
  }
}
