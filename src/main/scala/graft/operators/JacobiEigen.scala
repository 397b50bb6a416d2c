package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic eigensolver for the g8 frozen-phonon
  * slice (reference: database/hessian.py:206–271 eigen-explode) — the
  * round-8 completion of the "quantize before you decide" program for
  * the one operator it seemed closed to: an ITERATIVE EIGENSOLVER.
  *
  * The insight: a fixed-sweep cyclic Jacobi diagonalization
  * (Jacobi 1846; Golub & Van Loan §8.5) uses ONLY +, −, ×, ÷, sqrt
  * and comparisons — every one of which IEEE 754 requires to be
  * correctly rounded. No transcendental is ever evaluated (the
  * rotation's tan/cos come from the sqrt-based half-angle identities:
  * t = sign(θ)/(|θ| + √(θ²+1)), c = 1/√(t²+1)), so with a pinned
  * operation ORDER the whole iteration is a deterministic function of
  * the input bits in ANY IEEE engine — JVM bytecode, Spark codegen,
  * DuckDB's vectorized interpreter all produce the same 64-bit
  * pattern at every step. Fixing the sweep count (no convergence
  * test) keeps the control flow data-independent, so batching and
  * engine cannot diverge; 5 cyclic sweeps on a 6×6 drive the
  * off-diagonal mass to ~1e-30 (quadratic convergence), far below
  * the 1e-6 output quantization.
  *
  * The H matrix itself is assembled RELATIONALLY from the committed
  * 2-atom hessian seed fixture by replaying G7+stub+G8 symbolically:
  * central-difference columns over the displaced stub forces
  * (F = −k(r − r̄); n = 2 makes the centroid an exact /2.0), then
  * (H + Hᵀ)/2. The generating Scala loop emits ONE SQL text per
  * entry, used verbatim by BOTH engines (Spark `expr`, DuckDB CTE) —
  * the expression trees are identical by construction, the g4
  * discipline. The Jacobi recursion itself runs as a typed per-seed
  * kernel on the Spark side (the kernel's own groupByKey-per-seed
  * distribution shape: a 3n×3n matrix is task-local however big the
  * seed table is) and as generated unrolled CTEs on the DuckDB side,
  * with formula texts and the Scala statements written against the
  * same pinned parenthesization.
  *
  * The Breeze path (Hessian.eigenConfigs, LAPACK dsyevd) stays the
  * general library surface — GeneratorsSpec pins its physics, and
  * JacobiEigenSpec pins THIS kernel's eigenvalues against Breeze to
  * 1e-9 plus the stub's analytic spectrum (λ = k·(1 − 1/n)·n = k on
  * the translation-orthogonal subspace: 3 positive modes at k, 3
  * zero modes dropped by the reference's λ > 0, |λ| ≥ 1e-5 cutoff).
  *
  * Scale shape: one broadcast-sized wide row per seed; the eigen
  * work is O(dim³) per seed inside its own task; nothing shuffles. */
object JacobiEigen {

  val Sweeps = 5
  val Dim = 6 // 3n for the 2-atom seed
  val Delta = "0.01"
  private val Ax = Array("x", "y", "z")

  /** Upper-triangle storage order (r ≤ c), row-major: 21 entries. */
  val pairs: Seq[(Int, Int)] =
    for (r <- 0 until Dim; c <- r until Dim) yield (r, c)

  private def en(r: Int, c: Int): String =
    if (r <= c) s"e_${r}_$c" else s"e_${c}_$r"

  // ------------------------------------------------------------------
  // H assembly texts (shared verbatim by Spark expr and DuckDB SQL)
  // ------------------------------------------------------------------

  /** Coordinate b of atom j under the (i, a, ±δ) displacement. */
  private def pos(j: Int, b: Int, i: Int, a: Int, sign: Int): String =
    if (j == i && b == a) s"(p$j${Ax(b)} ${if (sign > 0) "+" else "-"} $Delta)"
    else s"p$j${Ax(b)}"

  /** Stub force on atom j, axis b (k = 1): −(p_jb − (p_0b + p_1b)/2). */
  private def force(j: Int, b: Int, i: Int, a: Int, sign: Int): String =
    s"-(${pos(j, b, i, a, sign)} - (${pos(0, b, i, a, sign)} + " +
      s"${pos(1, b, i, a, sign)}) / 2.0)"

  /** Raw central difference H[(i,a)][(j,b)] = −(F⁺ − F⁻)/(2δ). */
  private def hRaw(row: Int, col: Int): String = {
    val (i, a) = (row / 3, row % 3)
    val (j, b) = (col / 3, col % 3)
    s"-((${force(j, b, i, a, 1)}) - (${force(j, b, i, a, -1)})) " +
      s"/ (2.0 * $Delta)"
  }

  /** Symmetrized entry (r ≤ c): ((H_rc) + (H_cr)) / 2. */
  def hText(r: Int, c: Int): String =
    s"((${hRaw(r, c)}) + (${hRaw(c, r)})) / 2.0"

  // ------------------------------------------------------------------
  // The Scala Jacobi kernel (pinned op order — every formula below is
  // mirrored character-for-character in the SQL texts)
  // ------------------------------------------------------------------

  /** Fixed-sweep cyclic Jacobi on the 21 upper entries (pairs order);
    * returns the 6 diagonal values. */
  def jacobiDiag(e0: Seq[Double]): Array[Double] = {
    val a = Array.ofDim[Double](Dim, Dim)
    pairs.zipWithIndex.foreach { case ((r, c), i) =>
      a(r)(c) = e0(i); a(c)(r) = e0(i)
    }
    for (_ <- 0 until Sweeps; p <- 0 until Dim - 1; q <- p + 1 until Dim) {
      val apq = a(p)(q)
      // jt = CASE WHEN apq = 0 THEN 0 ELSE sign(th)/(|th| + sqrt(th*th + 1))
      val jt =
        if (apq == 0.0) 0.0
        else {
          val th = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          (if (th >= 0.0) 1.0 else -1.0) /
            (math.abs(th) + math.sqrt(th * th + 1.0))
        }
      val jc = 1.0 / math.sqrt(jt * jt + 1.0)
      val app = a(p)(p); val aqq = a(q)(q)
      val newPp = jc * jc * app - 2.0 * jc * (jt * jc) * apq +
        (jt * jc) * (jt * jc) * aqq
      val newQq = (jt * jc) * (jt * jc) * app + 2.0 * jc * (jt * jc) * apq +
        jc * jc * aqq
      for (r <- 0 until Dim if r != p && r != q) {
        val arp = a(r)(p); val arq = a(r)(q)
        val nrp = jc * arp - (jt * jc) * arq
        val nrq = (jt * jc) * arp + jc * arq
        a(r)(p) = nrp; a(p)(r) = nrp
        a(r)(q) = nrq; a(q)(r) = nrq
      }
      a(p)(p) = newPp; a(q)(q) = newQq
      a(p)(q) = 0.0; a(q)(p) = 0.0
    }
    Array.tabulate(Dim)(i => a(i)(i))
  }

  // ------------------------------------------------------------------
  // Spark surface
  // ------------------------------------------------------------------

  /** g8 twin: fixture atoms → wide position row → relational H →
    * per-seed Jacobi → eigen rows with the reference's cutoff. */
  def g8Twin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val atoms = s.read.parquet(graft.sources.SeedFixture.hessianSeedPath)
    val pcols = for (i <- 0 to 1; ax <- Ax) yield
      max(when(col("atom_idx") === i, col(ax))).as(s"p$i$ax")
    val wide = atoms.groupBy(col("seed_uuid"))
      .agg(pcols.head, pcols.tail: _*)
    val ecols = pairs.map { case (r, c) => expr(hText(r, c)).as(en(r, c)) }
    val h = wide.select((col("seed_uuid") +: ecols): _*)
    val diag = h
      .select(col("seed_uuid"),
        array(pairs.map { case (r, c) => col(en(r, c)) }: _*).as("e"))
      .as[(String, Seq[Double])]
      .map { case (id, e) => (id, jacobiDiag(e).toSeq) }
      .toDF("seed_uuid", "diag")
    diag
      .select(col("seed_uuid"), posexplode(col("diag")).as(Seq("i", "lam")))
      .where(col("lam") > 0.0 && abs(col("lam")) >= 1e-5)
      .withColumn("lam_micro", round(col("lam") * lit(1000000.0)).cast("long"))
      .select(
        md5(concat_ws(":", lit("heig"), col("seed_uuid"), col("i")))
          .as("uuid"),
        lit("hessian_eig").as("config_type"),
        (col("lam_micro") / lit(1000000.0)).as("eigenvalue"))
      .orderBy(col("eigenvalue"), col("uuid"))
  }

  // ------------------------------------------------------------------
  // DuckDB twin: unrolled CTE per rotation, same formula texts
  // ------------------------------------------------------------------

  def oracleG8: String = {
    val wideCols = (for (i <- 0 to 1; ax <- Ax) yield
      s"  MAX(CASE WHEN atom_idx = $i THEN $ax END) AS p$i$ax")
      .mkString(",\n")
    val hCols = pairs.map { case (r, c) =>
      s"  ${hText(r, c)} AS ${en(r, c)}"
    }.mkString(",\n")
    val sb = new StringBuilder
    sb.append(
      s"""WITH atoms AS (
         | SELECT seed_uuid, atom_idx, x, y, z
         | FROM read_parquet('${graft.sources.SeedFixture.hessianSeedPath}/*.parquet')),
         |wide AS (
         | SELECT seed_uuid,
         |$wideCols
         | FROM atoms GROUP BY seed_uuid),
         |j_0 AS MATERIALIZED (
         | SELECT seed_uuid,
         |$hCols
         | FROM wide)""".stripMargin)
    var k = 0
    for (_ <- 0 until Sweeps; p <- 0 until Dim - 1; q <- p + 1 until Dim) {
      val th = s"((${en(q, q)} - ${en(p, p)}) / (2.0 * ${en(p, q)}))"
      val jt = s"CASE WHEN ${en(p, q)} = 0.0 THEN 0.0 ELSE " +
        s"(CASE WHEN $th >= 0.0 THEN 1.0 ELSE -1.0 END) / " +
        s"(abs($th) + sqrt($th * $th + 1.0)) END"
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
      // a 270-CTE recursion inlined is an exponentially large
      // expression tree (the IntKmeans unrolled-Lloyd lesson). Each
      // CTE is one row wide, so materialization is free.
      sb.append(s",\nt_${k + 1} AS MATERIALIZED (\n SELECT *, $jt AS jt" +
        s" FROM j_$k)")
      sb.append(s",\ns_${k + 1} AS MATERIALIZED (\n SELECT *, " +
        s"1.0 / sqrt(jt * jt + 1.0) AS jc FROM t_${k + 1})")
      val entries = pairs.map { case (r, c) =>
        val e =
          if (r == p && c == q) "0.0"
          else if (r == p && c == p)
            s"jc * jc * ${en(p, p)} - 2.0 * jc * (jt * jc) * ${en(p, q)}" +
              s" + (jt * jc) * (jt * jc) * ${en(q, q)}"
          else if (r == q && c == q)
            s"(jt * jc) * (jt * jc) * ${en(p, p)} + 2.0 * jc * (jt * jc)" +
              s" * ${en(p, q)} + jc * jc * ${en(q, q)}"
          else if (r == p || c == p) {
            val x = if (r == p) c else r // the non-p index, x != q
            s"jc * ${en(x, p)} - (jt * jc) * ${en(x, q)}"
          } else if (r == q || c == q) {
            val x = if (r == q) c else r // the non-q index, x != p
            s"(jt * jc) * ${en(x, p)} + jc * ${en(x, q)}"
          } else en(r, c)
        s"  $e AS ${en(r, c)}"
      }.mkString(",\n")
      sb.append(s",\nj_${k + 1} AS MATERIALIZED (\n SELECT seed_uuid,\n" +
        s"$entries\n FROM s_${k + 1})")
      k += 1
    }
    val diagSel = (0 until Dim).map(i =>
      s"  SELECT seed_uuid, $i AS i, e_${i}_$i AS lam FROM j_$k")
      .mkString("\n  UNION ALL\n")
    sb.append(
      s""",
         |diag AS (
         |$diagSel),
         |kept AS (
         | SELECT seed_uuid, i, lam,
         |  CAST(round(lam * 1000000.0) AS BIGINT) AS lam_micro
         | FROM diag WHERE lam > 0.0 AND abs(lam) >= 0.00001)
         |SELECT md5(concat_ws(':', 'heig', seed_uuid, i)) AS uuid,
         | 'hessian_eig' AS config_type,
         | lam_micro / 1000000.0 AS eigenvalue
         |FROM kept
         |ORDER BY eigenvalue, uuid""".stripMargin)
    sb.toString
  }
}
