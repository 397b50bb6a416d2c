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

  /** Distributed whole-relation hash (D7): md5 per row, sorted, then
    * hashed — deterministic under any partitioning. Returns a 1-row DF. */
  def tableHash(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted.toSeq.map(col)
    val h = df.select(md5(to_json(struct(cols: _*))).as("h"))
      .agg(md5(array_join(array_sort(collect_list(col("h"))), "")).as("th"))
    h.collect()(0).getString(0)
  }
}
