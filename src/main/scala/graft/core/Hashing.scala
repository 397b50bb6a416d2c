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
    * order dependence). Delegates to the shared catalyst builder that
    * also backs the registered `content_hash(...)` SQL function. */
  def contentHashCol(cell: Column, positions: Column, species: Column): Column =
    org.apache.spark.sql.graftx.ComposedExpressions
      .contentHash(cell, positions, species)

  /** Target L1 bucket occupancy of the adaptive chunk prefix: the
    * prefix length is the smallest L with n ≤ ChunkTargetRows·16^L,
    * so L1 buffers hold ~32–512 row hashes regardless of input size.
    * Interpolated into BOTH engines (chunkLenCol / chunkLenSql) —
    * changing it regenerates the d7 oracle automatically. */
  val ChunkTargetRows: Long = 512L

  /** (len, maxRows) steps for prefix lengths 1..7; above the last
    * threshold the prefix is 8 hex chars (4·10⁹ buckets — enough for
    * 10¹²-row relations at ~256 rows/bucket). */
  def prefixThresholds: Seq[(Int, Long)] =
    (1 to 7).map(l => (l, ChunkTargetRows * (1L << (4 * l))))

  /** Adaptive chunk-prefix length as a Column of the total row count
    * (integer comparisons only — bit-exact cross-engine). */
  def chunkLenCol(n: Column): Column =
    prefixThresholds.foldRight(lit(8): Column) { case ((l, t), acc) =>
      when(n <= t, lit(l)).otherwise(acc)
    }

  /** The same adaptive length as DuckDB SQL over `nExpr` — generated
    * from the SAME thresholds so the twin cannot drift. */
  def chunkLenSql(nExpr: String): String =
    prefixThresholds.map { case (l, t) => s"WHEN $nExpr <= $t THEN $l" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Hierarchical, skew-proof relation hash (D7 production form).
    *
    * The flat form (collect_list every row hash of a group, sort,
    * concat, md5) holds the ENTIRE group in one agg buffer — it
    * spills visibly at sf0.1 (d7 warm pass 1.9 s → 24 s) and dies on
    * a hot group at 100 TB. Here rows bucket by their OWN hash
    * prefix, so the definition stays order-independent and every
    * buffer is bounded:
    *
    *   len    = adaptive hex-prefix length from the TOTAL row count
    *            (smallest L with n ≤ 512·16^L — see chunkLenCol; a
    *            fixed 5-char prefix cost 3–4× at sf0.1, where 1M
    *            buckets ≈ row count and every level re-keyed ~n rows)
    *   chunk  = first `len` hex chars of row_h
    *   super  = chunk minus its last 2 hex chars (≤ 256 chunks/super)
    *   L1: md5(concat of sorted row_h)   per (group, chunk)
    *   L2: md5(concat of L1 ordered by chunk) per (group, super)
    *   L3: md5(concat of L2 ordered by super) per group
    *
    * md5 is uniform ⇒ L1 buffers hold ~n/16^len ≤ ~512 rows, L2 ≤ 256
    * entries, L3 ≤ 16^(len−2) — all bounded, no windows, no skew
    * (prefix buckets can't be hot). The count that picks `len` rides
    * the plan as a 1-row broadcast (column-pruned scan — near-free on
    * parquet), so the choice is value-determined: equal row multisets
    * give equal hashes under any partitioning, and DuckDB replicates
    * the definition exactly — Relational.oracle d7 interpolates
    * chunkLenSql over the same thresholds. Input must carry a `row_h`
    * column. */
  def chunkedHashAgg(rows: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val g = groupCols.map(col)
    def ordered(key: String, v: String): Column =
      array_join(transform(
        array_sort(collect_list(struct(col(key), col(v)))),
        x => x.getField(v)), "")
    val total = rows.agg(count(lit(1)).as("__total"))
    // ONE data shuffle for L1+L2: partitioning by (group, super) up
    // front clusters both L1's keys (a superset — chunk determines
    // super) and L2's, so EnsureRequirements inserts no exchange
    // between the two aggregations; only L3 reshuffles, and its input
    // is ≤ 16^(len−2) rows per group. Physical-plan change only — the
    // hash DEFINITION (and the DuckDB twin) is untouched. A (group,
    // super) partition holds n/16^(len−2) rows (md5-uniform, can't be
    // hot); below ~2M rows (len ≤ 3) that's few partitions, which is
    // single-node territory anyway.
    val base = rows
      .crossJoin(broadcast(total))
      .withColumn("__chunk",
        col("row_h").substr(lit(1), chunkLenCol(col("__total"))))
      .withColumn("__super", col("__chunk").substr(lit(1),
        greatest(length(col("__chunk")) - 2, lit(0))))
      .repartition(g ++ Seq(col("__super")): _*)
    val l1 = base
      .groupBy(g ++ Seq(col("__super"), col("__chunk")): _*)
      .agg(count(lit(1)).as("__n"),
        md5(array_join(array_sort(collect_list(col("row_h"))), "")).as("__ch"))
    val l2 = l1.groupBy(g :+ col("__super"): _*)
      .agg(sum(col("__n")).as("__n"), md5(ordered("__chunk", "__ch")).as("__sh"))
    l2.groupBy(g: _*)
      .agg(sum(col("__n")).as("n"), md5(ordered("__super", "__sh")).as("table_hash"))
  }

  /** The chunked hierarchical hash as ONE Spark SQL statement over a
    * registered view — the pure-SQL surface of [[chunkedHashAgg]]
    * (the grouping STRUCTURE is a query shape, not a scalar function,
    * so it ships as generated SQL rather than a registered function;
    * the scalar piece, `chunk_len`, IS registered via
    * GraftExtensions). Same adaptive-prefix law, same three bounded
    * levels, byte-identical result — MinHashSpec asserts equality
    * against chunkedHashAgg. `relation` must expose the group columns
    * plus a hex `row_h`. */
  def tableHashSql(relation: String, groupCols: Seq[String]): String = {
    val gSel = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    val gOut = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ", ")
    def orderedSql(key: String, v: String): String =
      s"md5(array_join(transform(array_sort(collect_list(struct($key, $v)))," +
        s" x -> x.$v), ''))"
    s"""WITH tot AS (SELECT COUNT(*) AS total FROM $relation),
       |l1 AS (
       | SELECT $gSel
       |  substr(row_h, 1, ${chunkLenSql("total")}) AS chunk,
       |  COUNT(*) AS n1,
       |  md5(array_join(array_sort(collect_list(row_h)), '')) AS ch
       | FROM $relation CROSS JOIN tot GROUP BY ALL),
       |l2 AS (
       | SELECT $gSel
       |  substr(chunk, 1, GREATEST(LENGTH(chunk) - 2, 0)) AS sup,
       |  SUM(n1) AS n2,
       |  ${orderedSql("chunk", "ch")} AS sh
       | FROM l1 GROUP BY ALL)
       |SELECT ${gOut}SUM(n2) AS n, ${orderedSql("sup", "sh")} AS table_hash
       |FROM l2 ${if (groupCols.isEmpty) "" else groupCols.mkString("GROUP BY ", ", ", "")}""".stripMargin
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
