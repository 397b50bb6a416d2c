package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic PCA: power iteration with Hotelling
  * deflation over an INTEGER-quantized covariance matrix, every
  * arithmetic step exact integer math (the IntKmeans discipline —
  * quantize BEFORE you decide), so the top-r projection replays
  * bit-for-bit in DuckDB SQL (`oracleS6`) and `s6_pca_project`
  * upgrades from a rows-only check to a full hash-level oracle.
  * The float path (operators/Pca.scala, Breeze eigSym) remains the
  * library API; IntPcaSpec pins that the integer components agree
  * with it to quantization precision.
  *
  * 100 TB shape is identical to Pca.fit: ONE distributed pass
  * produces (n, Σqv, Σqv·qvᵀ) via mapPartitions + treeReduce — Long
  * addition is associative, so the combine ORDER cannot change the
  * result (the property the float scatter lacked, and the reason s6
  * had no oracle). Exactly one O(d²) Long triple reaches the driver
  * (32 KB at d = 64); the power iteration is driver-local
  * (microseconds); projection is a stateless codegen dot-product map
  * against broadcast literal components.
  *
  * Integer-exactness budget (d = 64, |x| ≤ ~1.2 ⟹ |qv| ≤ ~1.2e3 at
  * Q = 1e3, components at VS = 512):
  *  - scatter: |S_ij| ≤ 1.5e6·N — Long-safe to N ≈ 6e12 rows;
  *  - covariance: |C_ij| ≤ ~1.5e6, ≤ ~1e8 after 8 worst-case
  *    deflations (each adds ≤ λ ≤ trace ≤ 9e7);
  *  - mat-vec: |w_i| ≤ 64·1e8·512 ≈ 3.3e12;
  *  - deflation numerator: |w_i·v_j| ≤ 1.7e15 < 2^52 — the bound
  *    that makes DuckDB's FLOOR(p::DOUBLE / den) EXACT for any den
  *    (p < 2^52 ⟹ the double quotient cannot round across an
  *    integer boundary). Scala uses Math.floorDiv throughout, which
  *    has no magnitude constraint — the 2^52 budget only needs to
  *    hold at oracle scale, and holds to 125× with 10× margin.
  *
  * Determinism decisions, each mirrored in the SQL twin:
  *  - start vectors: ±VS entries from md5("pc:<seed>:<c>:<j>"), the
  *    engine-neutral keyed digest (IntKmeans.planesSign pattern);
  *  - renormalization: s = floorDiv(max|w|, VS) + 1, v' =
  *    floorDiv(w, s) — zero vectors stay zero, no special case;
  *  - sign fix: largest-|coordinate| positive, ties to the lowest
  *    index (the Pca.fit convention, made integer-exact);
  *  - deflation: C' = C − floorDiv(w_i·v_j, vᵀv) (Hotelling; the
  *    floor is applied per-entry in (i, j) orientation — C' is not
  *    exactly symmetric, which power iteration never needs).
  */
object IntPca {

  /** Milli quantization — coarser than IntKmeans.Q (1e4) because the
    * deflation product w_i·v_j must stay under 2^52 (see budget). */
  val Q = 1e3

  /** Component scale: |v_j| ≤ VS after each renormalization. */
  val VS = 512L

  /** (id, qv) with qv = round(x·1e3) as array<long>. */
  def quantize(df: DataFrame, idCol: String, vCol: String): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
      transform(col(vCol),
        x => round(x.cast("double") * lit(Q), 0).cast("long")).as("qv"))

  /** Exact distributed integer scatter: (n, Σqv, Σ qv·qvᵀ row-major).
    * Long sums are associative — any treeReduce shape gives the same
    * triple, bit for bit. */
  def scatter(q: DataFrame): (Long, Array[Long], Array[Long]) = {
    val rdd = q.select(col("qv")).rdd.map(_.getSeq[Long](0).toArray)
    rdd.mapPartitions { it =>
      var n = 0L
      var sum: Array[Long] = null
      var s: Array[Long] = null
      it.foreach { v =>
        val d = v.length
        if (sum == null) { sum = new Array[Long](d); s = new Array[Long](d * d) }
        require(v.length == sum.length,
          s"intpca: ragged embedding dim ${v.length} vs ${sum.length}")
        n += 1
        var i = 0
        while (i < d) {
          sum(i) += v(i)
          val vi = v(i)
          var j = 0
          while (j < d) { s(i * d + j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((n, sum, s))
    }.treeReduce { case ((n1, u1, s1), (n2, u2, s2)) =>
      var i = 0
      while (i < u1.length) { u1(i) += u2(i); i += 1 }
      i = 0
      while (i < s1.length) { s1(i) += s2(i); i += 1 }
      (n1 + n2, u1, s1)
    }
  }

  /** Fitted integer model: floor-mean (Q units) and r components at
    * VS scale, rows = components. */
  case class Model(meanQ: Array[Long], comps: Array[Array[Long]]) {
    def d: Int = meanQ.length
    def r: Int = comps.length
  }

  /** ±VS start vector for component `c` from the keyed digest —
    * +VS iff the first hex char of md5("pc:<seed>:<c>:<j>") is odd
    * (j 1-based, the planesSign convention). */
  def startVec(dim: Int, c: Int, seed: Long): Array[Long] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j0 =>
      val h = mdt.digest(s"pc:$seed:$c:${j0 + 1}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) VS else -VS
    }
  }

  /** Driver-local integer power iteration + deflation over the d×d
    * integer covariance. All Long arithmetic via Math.floorDiv —
    * exact at any magnitude the scatter can produce. */
  def fitFromScatter(n: Long, sum: Array[Long], s: Array[Long], r: Int,
      iters: Int, seed: Long): Model = {
    val d = sum.length
    require(r >= 1 && r <= d, s"intpca: r=$r out of range for d=$d")
    val meanQ = sum.map(Math.floorDiv(_, n))
    // C_ij = floorDiv(S_ij, n) − mq_i·mq_j
    val cm = Array.tabulate(d * d) { idx =>
      val i = idx / d; val j = idx % d
      Math.floorDiv(s(idx), n) - meanQ(i) * meanQ(j)
    }
    def matVec(m: Array[Long], v: Array[Long]): Array[Long] =
      Array.tabulate(d) { i =>
        var acc = 0L; var j = 0
        while (j < d) { acc += m(i * d + j) * v(j); j += 1 }
        acc
      }
    val comps = new Array[Array[Long]](r)
    var c = 0
    while (c < r) {
      var v = startVec(d, c, seed)
      var t = 0
      while (t < iters) {
        val w = matVec(cm, v)
        var mx = 0L
        var i = 0
        while (i < d) { val a = math.abs(w(i)); if (a > mx) mx = a; i += 1 }
        val sc = Math.floorDiv(mx, VS) + 1
        v = w.map(Math.floorDiv(_, sc))
        t += 1
      }
      // sign fix: largest-|coordinate| positive, ties lowest index
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(v(i)) > math.abs(v(best))) best = i
        i += 1
      }
      if (v(best) < 0L) v = v.map(x => -x)
      comps(c) = v
      if (c < r - 1) {
        // Hotelling deflation: C −= floorDiv((C·v)_i · v_j, vᵀv)
        val w = matVec(cm, v)
        var den = 0L
        i = 0
        while (i < d) { den += v(i) * v(i); i += 1 }
        if (den > 0L) {
          var idx = 0
          while (idx < d * d) {
            cm(idx) -= Math.floorDiv(w(idx / d) * v(idx % d), den)
            idx += 1
          }
        }
      }
      c += 1
    }
    Model(meanQ, comps)
  }

  /** One-pass fit over (idCol, vCol array<float/double>). */
  def fit(df: DataFrame, idCol: String, vCol: String, r: Int, iters: Int,
      seed: Long): Model = {
    val (n, sum, s) = scatter(quantize(df, idCol, vCol))
    fitFromScatter(n, sum, s, r, iters, seed)
  }

  /** Exact integer dot as a codegen'd double expression: operands and
    * every partial sum are integer-valued doubles far below 2^52
    * (|qv−mq|·VS ≤ 6.2e5 per term, ≤ 4e7 summed at d = 64), so BLAS
    * or codegen accumulation order cannot change the result. */
  private def doti(x: Column, y: Column): Column =
    org.apache.spark.sql.graftx.VectorExpressions.dotProduct(x, y)

  /** Project onto the model: (idCol, proj_0_q..proj_<r-1>_q), each
    * proj_c_q = Σ_j (qv_j − mq_j)·u_cj as a long — a stateless
    * whole-stage-codegen map, nothing shuffles. */
  def project(df: DataFrame, idCol: String, vCol: String,
      model: Model): DataFrame = {
    val q = quantize(df, idCol, vCol)
    val mqLit = array(model.meanQ.map(x => lit(x.toDouble)): _*)
    val centered = transform(col("qv"),
      (x, i) => x.cast("double") - element_at(mqLit, i + 1))
    val projs = model.comps.zipWithIndex.map { case (u, c) =>
      val uLit = array(u.map(x => lit(x.toDouble)): _*)
      doti(col("cv"), uLit).cast("long").as(s"proj_${c}_q")
    }
    q.withColumn("cv", centered)
      .select(col(idCol) +: projs.toSeq: _*)
  }

  /** Query-surface entry (s6_pca_project, oracle since round 7):
    * top-8 deterministic integer PCA projection of the embeddings
    * table. Output is harness-safe scalar longs per component, keyed
    * and ordered by vec_id. */
  def s6PcaProject(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val e = graft.Tables(spark, dir, "embeddings")
    val model = fit(e, "vec_id", "embedding", r = 8, iters = Iters,
      seed = Seed)
    project(e, "vec_id", "embedding", model).orderBy(col("vec_id"))
  }

  /** Pinned s6 parameters — the SQL twin unrolls exactly this many
    * iterations, so entry and oracle must share them. */
  val Iters = 24
  val Seed = 7L

  // ------------------------------------------------------------------
  // DuckDB SQL twin (fixture oracle: 64-dim `embeddings` table)
  // ------------------------------------------------------------------

  private val OddHex = "('1','3','5','7','9','b','d','f')"

  /** Power-iteration chain for component `c` over matrix table
    * mat<c>(i, j, c): v<c>_0 (±VS digest start) → v<c>_<iters>,
    * then the sign-fixed u<c>, and (unless last) den/wu/mat<c+1>
    * deflation CTEs. Every FLOOR(p::DOUBLE / q) here is exact: p is
    * an exact-double integer < 2^52 (see object doc). */
  private def compChainSql(c: Int, dim: Int, iters: Int, seed: Long,
      last: Boolean): String = {
    val v0 =
      s"""v${c}_0 AS MATERIALIZED (
         | SELECT j, CASE WHEN substr(md5('pc:$seed:$c:' || j), 1, 1)
         |  IN $OddHex THEN $VS ELSE -$VS END AS v
         | FROM range(1, ${dim + 1}) t(j))""".stripMargin
    val its = (1 to iters).map { t =>
      s"""w${c}_$t AS (
         | SELECT m.i AS j, CAST(SUM(m.c * v.v) AS BIGINT) AS w
         | FROM mat$c m JOIN v${c}_${t - 1} v ON m.j = v.j GROUP BY m.i),
         |s${c}_$t AS (
         | SELECT CAST(FLOOR(MAX(ABS(w))::DOUBLE / $VS) AS BIGINT) + 1 AS s
         | FROM w${c}_$t),
         |v${c}_$t AS MATERIALIZED (
         | SELECT j, CAST(FLOOR(w::DOUBLE / (SELECT s FROM s${c}_$t)) AS BIGINT) AS v
         | FROM w${c}_$t)""".stripMargin
    }
    val sign =
      s"""sg$c AS (
         | SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
         | FROM v${c}_$iters ORDER BY ABS(v) DESC, j ASC LIMIT 1),
         |u$c AS MATERIALIZED (
         | SELECT j, v * (SELECT sg FROM sg$c) AS v FROM v${c}_$iters)""".stripMargin
    val defl = if (last) Nil else List(
      s"""den$c AS (SELECT CAST(SUM(v * v) AS BIGINT) AS den FROM u$c),
         |wu$c AS MATERIALIZED (
         | SELECT m.i, CAST(SUM(m.c * v.v) AS BIGINT) AS w
         | FROM mat$c m JOIN u$c v ON m.j = v.j GROUP BY m.i),
         |mat${c + 1} AS MATERIALIZED (
         | SELECT m.i, m.j,
         |  m.c - CASE WHEN (SELECT den FROM den$c) = 0 THEN 0
         |   ELSE CAST(FLOOR((w.w * v.v)::DOUBLE /
         |        (SELECT den FROM den$c)) AS BIGINT) END AS c
         | FROM mat$c m JOIN wu$c w ON w.i = m.i JOIN u$c v ON v.j = m.j)""".stripMargin)
    ((v0 +: its) ++ List(sign) ++ defl).mkString(",\n")
  }

  /** Complete s6 oracle: integer scatter via the unnested self-join,
    * floor-mean/covariance, r unrolled power-iteration + deflation
    * chains, projection as a grouped integer dot per (vec_id, comp). */
  def oracleS6(r: Int, iters: Int, seed: Long, dim: Int): String = {
    val projCols = (0 until r).map(c =>
      s"SUM(CASE WHEN u.comp = $c THEN (ex.x - mq.m) * u.v ELSE 0 END)::BIGINT AS proj_${c}_q")
      .mkString(",\n  ")
    val uUnion = (0 until r)
      .map(c => s"SELECT $c AS comp, j, v FROM u$c").mkString("\n  UNION ALL ")
    s"""WITH e AS MATERIALIZED (
       | SELECT vec_id, [ROUND(x::DOUBLE * 1e3)::BIGINT FOR x IN embedding] AS qv
       | FROM embeddings),
       |ex AS MATERIALIZED (
       | SELECT vec_id, j, qv[j] AS x FROM e CROSS JOIN range(1, ${dim + 1}) t(j)),
       |nn AS (SELECT COUNT(*)::BIGINT AS n FROM e),
       |mq AS MATERIALIZED (
       | SELECT j, CAST(FLOOR(SUM(x)::DOUBLE / (SELECT n FROM nn)) AS BIGINT) AS m
       | FROM ex GROUP BY j),
       |mat0 AS MATERIALIZED (
       | SELECT a.j AS i, b.j AS j,
       |  CAST(FLOOR(SUM(a.x * b.x)::DOUBLE / (SELECT n FROM nn)) AS BIGINT)
       |   - mi.m * mj.m AS c
       | FROM ex a JOIN ex b USING (vec_id)
       | JOIN mq mi ON mi.j = a.j JOIN mq mj ON mj.j = b.j
       | GROUP BY a.j, b.j, mi.m, mj.m),
       |${(0 until r).map(c => compChainSql(c, dim, iters, seed, c == r - 1)).mkString(",\n")},
       |uu AS MATERIALIZED (
       |  $uUnion)
       |SELECT ex.vec_id,
       |  $projCols
       |FROM ex JOIN mq ON mq.j = ex.j JOIN uu u ON u.j = ex.j
       |GROUP BY ex.vec_id
       |ORDER BY ex.vec_id""".stripMargin
  }
}
