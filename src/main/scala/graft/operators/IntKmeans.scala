package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic k-means: Lloyd's algorithm over
  * INTEGER-quantized vectors (tenth-milli units, the m12/s7/t10
  * micro-unit discipline), with an md5-keyed deterministic training
  * sample and floor-division centroid updates. Every arithmetic step
  * — quantization, distances, argmin ties, centroid means — is exact
  * integer math reproducible bit-for-bit by any engine, so the
  * cluster assignment itself (not just a summary of it) has a DuckDB
  * SQL oracle: `lloydSql` generates the equivalent unrolled-iteration
  * SQL for the fixture tables. This upgrades c1_kmeans_summary and
  * d10_semdedup from rows-only checks to full hash-level oracles
  * (the round-6 j10/z1 conversion pattern: a result-identical
  * deterministic twin), and makes the clustering reproducible across
  * engine versions — a property float Lloyd cannot give (reassociated
  * float means flip boundary assignments).
  *
  * Scale shape is unchanged from the float path (operators/
  * Similarity.scala Ivf): the training sample is CAPPED (default
  * 8192 rows ≈ 4 MB of longs to the driver, independent of corpus
  * size), Lloyd runs driver-local over the sample, and the one
  * corpus-sized pass is the distributed batched-GEMM cell assignment
  * — exact here because every product/partial-sum is an
  * integer-valued double far below 2^53 (|x| ≤ ~0.6 → |qv| ≤ 6e3,
  * 64-dim dots ≤ ~2.3e9), so BLAS accumulation order cannot change
  * the result.
  *
  * Quantization loses nothing that matters: 1e-4 resolution on unit-
  * scale embeddings is far below the noise floor of any learned
  * embedding, and SemDeDup/clustering verdicts at τ-granularity are
  * unaffected (OperatorsSpec pins the verdict behavior; the oracle
  * pins the full assignment).
  */
object IntKmeans {

  /** Tenth-milli quantization (m12's Q): keeps every integer product
    * comfortably exact in doubles at embedding scale. */
  val Q = 1e4

  /** (id, qv) with qv = round(x·1e4) as array<long> — Spark round is
    * half-away-from-zero on doubles, same as DuckDB ROUND. */
  def quantize(df: DataFrame, idCol: String, vCol: String): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
      transform(col(vCol),
        x => round(x.cast("double") * lit(Q), 0).cast("long")).as("qv"))

  /** Deterministic capped training sample: first `cap` rows under the
    * engine-neutral keyed digest md5("km:<seed>:" || id) (the o5/o11
    * split discipline — xxhash64 has no DuckDB twin, md5 does).
    * Driver traffic = cap × dim longs, corpus-size-independent. */
  def sampleTrain(q: DataFrame, idCol: String, seed: Long,
      cap: Int): Array[Array[Long]] = {
    val sample = q
      .orderBy(md5(concat(lit(s"km:$seed:"), col(idCol).cast("string"))),
        col(idCol))
      .limit(cap).select(col("qv")).collect()
      .map(_.getSeq[Long](0).toArray)
    // Exactness guard: the batched-GEMM assignment is bit-exact only
    // while every integer product and d-term partial sum stays below
    // 2^52 (see object doc). Unit-scale embeddings sit orders of
    // magnitude inside the bound; arbitrary user vectors through the
    // facade may not — fail loudly on the sample (quantized
    // identically to the corpus) rather than silently lose the
    // bit-for-bit determinism the scaladocs promise.
    sample.find(_.nonEmpty).foreach { h =>
      val bound = maxExactQ(h.length)
      val worst = sample.iterator.flatMap(_.iterator).map(math.abs).max
      require(worst <= bound,
        s"|quantized coordinate| $worst exceeds the exact-GEMM bound " +
          s"$bound for dim ${h.length}: rescale inputs to ~unit scale " +
          "(determinism guarantee would silently break)")
    }
    sample
  }

  /** Largest |qv| keeping every product and dim-term partial sum
    * exactly representable in doubles: floor(sqrt(2^52 / dim)) —
    * one spare bit under the 2^53 integer-exact ceiling. */
  def maxExactQ(dim: Int): Long =
    math.sqrt((1L << 52).toDouble / math.max(dim, 1)).toLong

  private def d2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** Gonzalez farthest-first traversal over the integer sample —
    * start at the first sample row, then repeatedly the point
    * maximizing min-distance-to-chosen; ties keep the lowest sample
    * index (strict >), mirroring the SQL `ORDER BY md DESC, rn ASC
    * LIMIT 1`. Exact integer distances → exact cross-engine replay. */
  private def ffInit(train: Array[Array[Long]], k: Int): Array[Array[Long]] = {
    val n = train.length
    // n == k deliberately falls through to the traversal: it still
    // picks all k points but in farthest-first CELL ORDER, matching
    // ffInitSql's unconditional k-step unroll (take(k) would number
    // the cells differently and diverge from the SQL twin)
    if (n < k) return train
    val chosen = scala.collection.mutable.ArrayBuffer(train(0))
    val minD = Array.fill(n)(Long.MaxValue)
    while (chosen.length < k) {
      val c = chosen.last
      var best = 0; var bestD = -1L; var i = 0
      while (i < n) {
        val d = d2(train(i), c)
        if (d < minD(i)) minD(i) = d
        if (minD(i) > bestD) { bestD = minD(i); best = i }
        i += 1
      }
      chosen += train(best)
    }
    chosen.toArray
  }

  /** Driver-local integer Lloyd. Init = farthest-first or the
    * sample's first k rows; assignment argmin ties keep the lowest
    * cell; update = elementwise floor(sum/count) (exact: |sum| < 2^53
    * at any cap this sandbox reaches); empty cells keep their
    * centroid. All decisions are integer comparisons → the SQL twin
    * replays them exactly. */
  def lloyd(train: Array[Array[Long]], k: Int, iters: Int,
      farthest: Boolean): Array[Array[Long]] = {
    if (train.isEmpty) return Array.empty
    // the SQL twins (ffInitSql / lloydSql) unroll exactly k init
    // steps and would re-pick already-chosen rows on a smaller
    // sample, silently diverging from this side — refuse instead
    require(train.length >= k,
      s"integer Lloyd needs >= k=$k training rows (got ${train.length}); " +
        "shrink k or raise the sample cap")
    var cents: Array[Array[Long]] =
      if (farthest) ffInit(train, k) else train.take(k)
    val dim = train(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Long](dim))
      val counts = new Array[Long](cents.length)
      train.foreach { v =>
        var best = 0; var bestD = Long.MaxValue; var c = 0
        while (c < cents.length) {
          val d = d2(v, cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var i = 0; while (i < dim) { s(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val s = sums(c)
          Array.tabulate(dim)(i => math.floor(s(i).toDouble / counts(c)).toLong)
        }
      }
      it += 1
    }
    cents
  }

  /** Distributed full-corpus assignment — delegates to the batched-
    * GEMM path (Ivf.assignCells) on integer-valued doubles, which is
    * EXACT (see object doc), with argmax(v·c − ‖c‖²/2) ties keeping
    * the lowest cell = the SQL twin's argmin(d2) ASC, cell ASC.
    * Returns (idCol, "qvd" array<double>, "cell" int). */
  def assign(q: DataFrame, idCol: String,
      cents: Array[Array[Long]]): DataFrame =
    Similarity.Ivf.assignCells(
      q.select(col(idCol),
        transform(col("qv"), _.cast("double")).as("qvd")),
      idCol, "qvd", cents.map(_.map(_.toDouble)))

  /** Exact integer dot as a codegen'd double expression (operands are
    * integer-valued doubles; result is an integer-valued double). */
  def doti(x: Column, y: Column): Column =
    org.apache.spark.sql.graftx.VectorExpressions.dotProduct(x, y)

  /** IVF-Flat top-k on the deterministic integer quantizer — the s3
    * shape (train capped sample → assign corpus → probe the nprobe
    * nearest cells per query → exact cosine rerank), every decision
    * exact integer arithmetic: cell assignment, the probe ranking
    * (d², ties to the lowest cell), the rerank dot products (cosine
    * rounded to 6 decimals before ranking, ties to the lowest id).
    * Result replays bit-for-bit in DuckDB (oracleS3) — IVF recall is
    * approximate by design, but the approximation itself is now
    * deterministic, which is what makes an ANN index auditable across
    * engine versions. Scale shape identical to Ivf.topK: one corpus
    * assignment pass, per-query work bounded by nprobe·N/nlist.
    *
    * AUTO-NPROBE (round 16, VERDICT r15 #3 — the LSH treatment,
    * mirrored in oracleS3): `nprobe = 0` (the DEFAULT) derives the
    * probe count instead of trusting the caller — GREATEST(4,
    * nlist/16) in the banded regime (~6 % of cells, the measured
    * recall/latency point: 1.0 recall@10 at 25×,
    * bench/ann_recall.json), and below the small-corpus line
    * (N < [[TrainCap]], where bucketing saves nothing and only costs
    * recall — 1× at nprobe=5 measured 0.24) the probe WIDENS to
    * ≥ nlist/4 — the same IndexRefineFlat-limit rule pqTopK adopted
    * in round 13 (measured 0.82 at the hard 1× regime). The widening
    * applies to explicit nprobe too, exactly as pqTopK's does; both
    * decisions are exact integer comparisons, so the SQL twin can
    * never disagree. */
  def topK(corpus: DataFrame, queries: DataFrame, vCol: String,
      idCol: String, k: Int, nlist: Int, nprobe: Int = 0, iters: Int = 2,
      seed: Long = 42L): DataFrame = {
    val q = quantize(corpus, idCol, vCol)
    val train = sampleTrain(q, idCol, seed, cap = TrainCap)
    val small = train.length < TrainCap
    val base = if (nprobe == 0) math.max(4, nlist / 16) else nprobe
    val effNprobe = if (small) math.max(base, nlist / 4) else base
    val cents = lloyd(train, nlist, iters, farthest = false)
    val c = assign(q, idCol, cents)
      .select(col(idCol).as("vec_id"), col("qvd").as("v"), col("cell"))
      .withColumn("na", doti(col("v"), col("v")))
    val probe = udf { (qv: Seq[Long]) =>
      cents.indices.map { ci =>
        val cc = cents(ci)
        var s = 0L; var i = 0
        while (i < qv.length) { val t = qv(i) - cc(i); s += t * t; i += 1 }
        (s, ci)
      }.sorted.take(effNprobe).map(_._2)
    }
    val qq = quantize(queries, idCol, vCol)
      .select(col(idCol).as("query_id"), col("qv"))
      .withColumn("cell", explode(probe(col("qv"))))
      .withColumn("qvd", transform(col("qv"), _.cast("double")))
      .withColumn("qn", doti(col("qvd"), col("qvd")))
      .drop("qv")
    val cos = when(col("na") === 0.0 || col("qn") === 0.0, lit(0.0))
      .otherwise(round(doti(col("qvd"), col("v"))
        / (sqrt(col("qn")) * sqrt(col("na"))), 6))
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    // cells are distinct per query (probe ranks each cell once) and a
    // corpus vector lives in exactly one cell — no candidate dedup
    qq.join(c, "cell")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
      .withColumn("rk", row_number().over(byCos).cast("long"))
      .where(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  // ------------------------------------------------------------------
  // Deterministic IVF-PQ (the s4 family)
  // ------------------------------------------------------------------

  private def d2l(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  private def argminCellL(v: Array[Long], cents: Array[Array[Long]]): Int = {
    var best = 0; var bestD = Long.MaxValue; var c = 0
    while (c < cents.length) {
      val d = d2l(v, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Integer PQ model: coarse centroids + per-subspace residual
    * codebooks, all integer-valued (floor-mean Lloyd), so encoding,
    * ADC tables, and candidate scores are exact integer arithmetic. */
  case class PqModel(cents: Array[Array[Long]],
      books: Array[Array[Array[Long]]], m: Int, ksub: Int, dsub: Int)

  /** Train on the md5-ordered capped sample: coarse take-k Lloyd,
    * then per-subspace take-k Lloyd over the coarse RESIDUALS (the
    * Jégou–Douze–Schmid residual-PQ form), every init row order and
    * every mean SQL-replayable. */
  def trainPq(train: Array[Array[Long]], nlist: Int, m: Int, ksub: Int,
      iters: Int): PqModel = {
    val cents = lloyd(train, nlist, iters, farthest = false)
    val dim = train(0).length
    val dsub = dim / m
    require(m * dsub == dim, s"m=$m must divide dim=$dim")
    val residuals = train.map { v =>
      val c = cents(argminCellL(v, cents))
      Array.tabulate(dim)(i => v(i) - c(i))
    }
    val books = Array.tabulate(m) { s =>
      lloyd(residuals.map(_.slice(s * dsub, (s + 1) * dsub)),
        ksub, iters, farthest = false)
    }
    PqModel(cents, books, m, ksub, dsub)
  }

  /** Default training-sample cap shared by the PQ kernel and its SQL
    * twin — and the SMALL-CORPUS line (see [[pqTopK]]). */
  val TrainCap = 8192

  /** IVF-PQ top-k on the deterministic integer model — the s4 shape
    * (ADC scoring over probed cells' codes, exact cosine rerank of
    * the rerankMult·k best ADC candidates), with codes, ADC tables,
    * and scores all exact integers. Replays in DuckDB (oracleS4).
    *
    * SMALL-CORPUS REFINEMENT (round 13, VERDICT r12 #3): PQ
    * compression exists to avoid touching raw vectors on corpora too
    * big to scan; when the corpus is smaller than the quantizer's OWN
    * training sample (N < [[TrainCap]]) the ADC shortlist saves
    * nothing and only costs recall (measured: 0.24–0.4 recall@10 at
    * 1× on near-iid vectors whose ADC ordering is essentially noise,
    * vs IVF-Flat's 0.82–0.94 at the same probe). In that regime the
    * kernel (a) widens the probe to ≥ nlist/4 and (b) reranks EVERY
    * probed candidate exactly — FAISS's IndexRefineFlat limit — so
    * recall equals IVF-Flat's at the widened probe. Above the line
    * the ADC shortlist is unchanged: the scale path stays
    * O(candidates) compressed scans + O(rerankMult·k) raw touches.
    * The small/large decision is an exact integer comparison (sample
    * length vs cap), so the SQL twin can never disagree. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, vCol: String,
      idCol: String, k: Int, nlist: Int, m: Int, ksub: Int,
      nprobe: Int = 0, iters: Int = 2, seed: Long = 42L,
      rerankMult: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    val q = quantize(corpus, idCol, vCol)
    val train = sampleTrain(q, idCol, seed, cap = TrainCap)
    // the sample hits the cap iff N >= cap, so its LENGTH decides the
    // regime without a second corpus count
    val small = train.length < TrainCap
    // nprobe = 0 is AUTO (round 16): GREATEST(4, nlist/16), the same
    // derivation [[topK]] documents, mirrored in oracleS4
    val base = if (nprobe == 0) math.max(4, nlist / 16) else nprobe
    val effNprobe = if (small) math.max(base, nlist / 4) else base
    val model = trainPq(train, nlist, m, ksub, iters)
    val bc = spark.sparkContext.broadcast(model)
    // corpus: coarse cell (exact GEMM), then per-subspace code —
    // argmin over the ksub-row codebook of the integer residual slice
    val codeUdf = udf { (qvd: Seq[Double], cell: Int) =>
      val mdl = bc.value
      val cent = mdl.cents(cell)
      val r = Array.tabulate(qvd.length)(i => qvd(i).toLong - cent(i))
      (0 until mdl.m).map { s =>
        mdl.books(s).indices.minBy { j =>
          var d = 0L; var i = 0
          val bw = mdl.books(s)(j)
          while (i < mdl.dsub) {
            val t = r(s * mdl.dsub + i) - bw(i); d += t * t; i += 1
          }
          (d, j) // ties to the lowest codeword
        }
      }
    }
    val c = assign(q, idCol, model.cents)
      .select(col(idCol).as("vec_id"), col("qvd").as("v"), col("cell"))
      .withColumn("code", codeUdf(col("v"), col("cell")))
      .withColumn("na", doti(col("v"), col("v")))
    // query: nprobe nearest cells (exact integer d², ties lowest) +
    // the per-cell M×ksub integer ADC table
    val probeTabs = udf { (qv: Seq[Long]) =>
      val mdl = bc.value
      mdl.cents.indices.map { ci =>
        (d2l(qv.toArray, mdl.cents(ci)), ci)
      }.sorted.take(math.min(effNprobe, mdl.cents.length)).map { case (_, ci) =>
        val cent = mdl.cents(ci)
        val tab = Array.tabulate(mdl.m * mdl.ksub) { idx =>
          val s = idx / mdl.ksub; val j = idx % mdl.ksub
          val bw = mdl.books(s)(j)
          var d = 0L; var i = 0
          while (i < mdl.dsub) {
            val t = qv(s * mdl.dsub + i) - cent(s * mdl.dsub + i) - bw(i)
            d += t * t; i += 1
          }
          d
        }
        (ci, tab.toSeq)
      }
    }
    val adcUdf = udf { (tab: Seq[Long], code: Seq[Int]) =>
      var s = 0; var d = 0L
      val kk = bc.value.ksub
      while (s < code.length) { d += tab(s * kk + code(s)); s += 1 }
      d
    }
    val qs = quantize(queries, idCol, vCol)
      .select(col(idCol).as("query_id"), col("qv"))
      .withColumn("p", explode(probeTabs(col("qv"))))
      .select(col("query_id"), col("qv"),
        col("p._1").as("cell"), col("p._2").as("tab"))
      .withColumn("qvd", transform(col("qv"), _.cast("double")))
      .withColumn("qn", doti(col("qvd"), col("qvd")))
    val byAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    val cos = when(col("na") === 0.0 || col("qn") === 0.0, lit(0.0))
      .otherwise(round(doti(col("qvd"), col("v"))
        / (sqrt(col("qn")) * sqrt(col("na"))), 6))
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val candidates = qs.join(c, "cell")
      .where(col("vec_id") =!= col("query_id"))
    // small corpus: every probed candidate reranks exactly (no ADC
    // pass at all — the shortlist would keep them all anyway); at
    // scale the ADC shortlist bounds raw-vector touches to
    // rerankMult·k per query
    val pool =
      if (small) candidates
      else candidates
        .withColumn("adc", adcUdf(col("tab"), col("code")))
        .select(col("query_id"), col("vec_id"), col("adc"),
          col("qvd"), col("qn"), col("v"), col("na"))
        .withColumn("ark", row_number().over(byAdc))
        .where(col("ark") <= rerankMult * k)
    pool
      .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
      .withColumn("rk", row_number().over(byCos).cast("long"))
      .where(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  // ------------------------------------------------------------------
  // Deterministic sign-projection LSH (the s2 family)
  // ------------------------------------------------------------------

  /** ±1 hyperplane entries from the engine-neutral keyed digest:
    * s(p, j) = +1 iff the first hex char of md5("pl:<seed>:<p>:<j>")
    * is odd (j is 1-based to match SQL array indexing). Sign random
    * projection (the original SimHash construction) — ±1 entries give
    * the same locality guarantees as Gaussian planes for cosine
    * similarity, and integer projections replay exactly in SQL. */
  def planesSign(nPlanes: Int, dim: Int, seed: Long): Array[Array[Long]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, j0) =>
      val h = mdt.digest(s"pl:$seed:$p:${j0 + 1}".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) 1L else -1L
    }
  }

  /** Plane count = minimal b ∈ [4, 24] with 2^b · 8k ≥ N — the same
    * target-occupancy rule as Similarity.adaptivePlanes, but decided
    * by exact integer comparison instead of floating log2 so the SQL
    * twin can never disagree at a power-of-two boundary. */
  def exactPlaneBits(n: Long, k: Int): Int = {
    val target = math.max(1L, 8L * k)
    val b = (0 to 24).find(b => (1L << b) * target >= n).getOrElse(24)
    math.min(24, math.max(4, b))
  }

  /** AUTO-PROBE band config (round 15, VERDICT r14 #6): in the
    * banded regime the DEFAULT must meet recall ≥ 0.8 at every
    * measured rung without a caller-supplied probe count. Two exact
    * integer rules, mirrored in the SQL twin:
    *
    *  - plane count caps at [[MaxAutoPlanes]] = 10: the probed
    *    fraction at radius 2 is (1 + b + b(b-1)/2) / 2^b, which
    *    crosses below ~5 % — the measured 0.8-recall floor on
    *    structureless embeddings (bench/ann_recall.json, 25× rung:
    *    5.5 % probed → 0.80) — exactly past b = 10, so deeper
    *    bucketing would silently trade recall for speed;
    *  - probe radius is 1 while b ≤ 7 (radius-1 fraction (1+b)/2^b ≥
    *    6 % there) and 2 above.
    *
    * Callers can still pin `probeHamming` explicitly (uncapped
    * planes, their radius) — the recall/speed dial is theirs; 0 (the
    * default) selects AUTO. Sub-cap corpora bypass both (exact scan,
    * recall 1.0). */
  val MaxAutoPlanes = 10
  private def autoRadius(np: Int): Int = if (np <= 7) 1 else 2

  /** LSH top-k on the deterministic sign planes — the s2 shape
    * (bucket corpus + queries, hamming-≤`probeHamming` multiprobe,
    * exact cosine rerank) with every decision exact: projections are
    * ±1·integer dots, the sign threshold is ≥ 0, rerank cosines round
    * to 6 before ranking. `probeHamming = 1` replays bit-for-bit in
    * DuckDB (oracleS2); `probeHamming = 2` adds the pair-flip probes;
    * `probeHamming = 0` (the DEFAULT) is AUTO — capped planes +
    * derived radius, recall ≥ 0.8 at every measured rung
    * (`bench/ann_recall.json`).
    *
    * RECALL ENVELOPE (measured, bench/ann_recall.json): sign-LSH
    * recall is bounded by the corpus's angular structure. On the
    * synthetic near-iid embeddings, radius-1 read 0.24 recall@10 at
    * 1× and 0.52 at 25× — essentially the scanned fraction, because
    * iid vectors give hyperplanes nothing to exploit; radius 2 buys
    * recall linearly in extra candidates. For recall-critical
    * retrieval prefer `ivfTopK` (s3: recall 1.0 at 25× at every
    * nprobe) or brute force (s1); s2 exists for the banded-LSH plan
    * shape (O(N) bucket join, never all-pairs) that holds at 100 TB
    * when the corpus HAS angular clusters.
    *
    * SMALL-CORPUS REFINEMENT (round 14, VERDICT r13 #4 — the s4
    * pattern ported): below N < [[TrainCap]] the bucketing saves
    * nothing and only costs recall, so the probed pool becomes the
    * WHOLE corpus — an exact broadcast scan (FAISS's IndexRefineFlat
    * limit; the corpus side is < 8192 vectors, so the "cross" join
    * is a broadcast of a few hundred KB). Recall@k is 1.0 by
    * construction in that regime. Above the line the banded
    * equi-join is unchanged. The small/large decision is an exact
    * integer comparison, so the SQL twin can never disagree. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vCol: String,
      idCol: String, k: Int, dim: Int, seed: Long,
      probeHamming: Int = 0): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 2,
      s"lshTopK: probeHamming must be 0 (auto), 1 or 2, got $probeHamming")
    val q = quantize(corpus, idCol, vCol)
    val n = q.count()
    val small = n < TrainCap
    val auto = probeHamming == 0
    val np =
      if (auto && !small) math.min(exactPlaneBits(n, k), MaxAutoPlanes)
      else exactPlaneBits(n, k)
    val radius = if (auto) autoRadius(np) else probeHamming
    val pl = planesSign(np, dim, seed)
    def bucketOf(v: Column): Column =
      (0 until np).map { p =>
        val plLit = array(pl(p).map(x => lit(x.toDouble)): _*)
        when(doti(v, plLit) >= 0.0, lit((1L << p))).otherwise(lit(0L))
      }.reduce(_ + _)
    val c = assignNone(q, idCol)
      .withColumn("bucket", bucketOf(col("qvd")))
      .withColumn("na", doti(col("qvd"), col("qvd")))
      .select(col(idCol).as("vec_id"), col("qvd").as("v"),
        col("bucket"), col("na"))
    // probe masks: own bucket + every 1-bit flip (+ every 2-bit flip
    // at radius 2) — all masks distinct, and a corpus vector lives in
    // exactly one bucket, so no candidate dedup
    val masks: Seq[Long] = 0L +: ((0 until np).map(p => 1L << p) ++
      (if (radius >= 2)
        for { a <- 0 until np; b <- (a + 1) until np }
          yield (1L << a) | (1L << b)
      else Nil))
    val qsBase = assignNone(quantize(queries, idCol, vCol), idCol)
      .withColumn("bucket", bucketOf(col("qvd")))
      .withColumn("qn", doti(col("qvd"), col("qvd")))
      .select(col(idCol).as("query_id"), col("qvd"), col("bucket"), col("qn"))
    val cos = when(col("na") === 0.0 || col("qn") === 0.0, lit(0.0))
      .otherwise(round(doti(col("qvd"), col("v"))
        / (sqrt(col("qn")) * sqrt(col("na"))), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    val cand =
      if (small)
        // sub-cap corpus: probe EVERYTHING — a broadcast of < TrainCap
        // quantized vectors against each query partition, no shuffle
        qsBase.crossJoin(broadcast(c.drop("bucket")))
      else qsBase.withColumn("bucket", explode(array(
        masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
        .join(c, "bucket")
    cand
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** (id, qvd) with qvd the integer-valued double vector — the
    * no-clustering sibling of `assign` for expression-side kernels. */
  private def assignNone(q: DataFrame, idCol: String): DataFrame =
    q.select(col(idCol), transform(col("qv"), _.cast("double")).as("qvd"))

  // ------------------------------------------------------------------
  // DuckDB SQL twin (fixture oracle: 64-dim `embeddings` table)
  // ------------------------------------------------------------------

  private def d2Sql(a: String, b: String, dim: Int): String =
    s"list_sum([($a.qv[j] - $b.cv[j]) * ($a.qv[j] - $b.cv[j]) FOR j IN range(1, ${dim + 1})])"

  /** CTE prelude shared by every consumer: e(vec_id, qv), ord(+rn),
    * train(rn, qv). MATERIALIZED: the unrolled iteration chain
    * references e/train ~30 times — inlined CTEs would re-open the
    * parquet per reference (DuckDB hit its fd limit at sf0.001). */
  def preludeSql(seed: Long, cap: Int): String =
    s"""e AS MATERIALIZED (
       | SELECT vec_id, [ROUND(x::DOUBLE * 1e4)::BIGINT FOR x IN embedding] AS qv
       | FROM embeddings),
       |ord AS (
       | SELECT vec_id, qv,
       |  ROW_NUMBER() OVER (ORDER BY md5('km:$seed:' || vec_id), vec_id) AS rn
       | FROM e),
       |train AS MATERIALIZED (SELECT rn, qv FROM ord WHERE rn <= $cap)""".stripMargin

  /** Farthest-first init CTEs ch1..ch<k>; the caller aliases ch<k> as
    * its c0. Each step: per-point min distance to the chosen set,
    * argmax (ties → lowest rn), append as the next cell. */
  def ffInitSql(k: Int, dim: Int): String = {
    // every ch$i is MATERIALIZED: ch$i is referenced twice by level
    // i+1 (the UNION ALL and the min-distance scan), so inlining
    // would re-expand the whole chain 2^k times
    val first =
      s"""ch1 AS MATERIALIZED (SELECT 0 AS cell, qv AS cv FROM train WHERE rn = 1)"""
    val steps = (2 to k).map { i =>
      s"""md$i AS (
         | SELECT t.rn, MIN(${d2Sql("t", "c", dim)}) AS md
         | FROM train t CROSS JOIN ch${i - 1} c GROUP BY t.rn),
         |pk$i AS (SELECT rn FROM md$i ORDER BY md DESC, rn ASC LIMIT 1),
         |ch$i AS MATERIALIZED (
         | SELECT * FROM ch${i - 1}
         | UNION ALL SELECT ${i - 1} AS cell, t.qv AS cv
         | FROM train t JOIN pk$i USING (rn))""".stripMargin
    }
    (first +: steps).mkString(",\n")
  }

  /** Unrolled Lloyd iterations c0 → c<iters> (assign over `train`,
    * floor-mean update, empty cells keep their centroid), then the
    * full-corpus assignment af(vec_id, qv, cell) against c<iters>. */
  def lloydSql(iters: Int, dim: Int): String = {
    val its = (1 to iters).map { t =>
      s"""a$t AS (
         | SELECT rn, qv, cell FROM (
         |  SELECT t.rn, t.qv, c.cell,
         |   ROW_NUMBER() OVER (PARTITION BY t.rn
         |    ORDER BY ${d2Sql("t", "c", dim)} ASC, c.cell ASC) AS rk
         |  FROM train t CROSS JOIN c${t - 1} c) WHERE rk = 1),
         |u$t AS (
         | SELECT cell, list(cj ORDER BY j) AS cv FROM (
         |  SELECT a.cell, t.j,
         |   CAST(FLOOR(SUM(a.qv[t.j])::DOUBLE / COUNT(*)) AS BIGINT) AS cj
         |  FROM a$t a CROSS JOIN range(1, ${dim + 1}) AS t(j)
         |  GROUP BY a.cell, t.j) GROUP BY cell),
         |c$t AS MATERIALIZED (
         | SELECT p.cell, COALESCE(u.cv, p.cv) AS cv
         | FROM c${t - 1} p LEFT JOIN u$t u USING (cell))""".stripMargin
    }
    val af =
      s"""af AS MATERIALIZED (
         | SELECT vec_id, qv, cell FROM (
         |  SELECT o.vec_id, o.qv, c.cell,
         |   ROW_NUMBER() OVER (PARTITION BY o.vec_id
         |    ORDER BY ${d2Sql("o", "c", dim)} ASC, c.cell ASC) AS rk
         |  FROM e o CROSS JOIN c$iters c) WHERE rk = 1)""".stripMargin
    (its :+ af).mkString(",\n")
  }

  /** Complete d10 SemDeDup oracle: adaptive nlist = clamp(4·⌈√N⌉,
    * [16, 65536]) take-k init, `iters` Lloyd rounds, within-cell
    * max-cosine-to-previous-id verdict at τ. */
  def oracleD10(tau: Double, seed: Long, cap: Int, iters: Int,
      dim: Int): String = {
    val r = dim + 1
    s"""WITH ${preludeSql(seed, cap)},
       |params AS (
       | SELECT LEAST(65536, GREATEST(16,
       |  4 * CAST(CEIL(SQRT(COUNT(*)::DOUBLE)) AS BIGINT))) AS nlist FROM e),
       |c0 AS MATERIALIZED (
       | SELECT rn - 1 AS cell, qv AS cv FROM train
       | WHERE rn <= (SELECT nlist FROM params)),
       |${lloydSql(iters, dim)},
       |nn AS MATERIALIZED (
       | SELECT vec_id, qv, cell,
       |  list_sum([qv[j] * qv[j] FOR j IN range(1, $r)]) AS na FROM af),
       |mx AS (
       | SELECT b.vec_id,
       |  MAX(CASE WHEN a.na = 0 OR b.na = 0 THEN 0.0
       |      ELSE ROUND(list_sum([a.qv[j] * b.qv[j] FOR j IN range(1, $r)])::DOUBLE /
       |           (SQRT(a.na::DOUBLE) * SQRT(b.na::DOUBLE)), 6) END) AS mx
       | FROM nn a JOIN nn b ON a.cell = b.cell AND a.vec_id < b.vec_id
       | GROUP BY b.vec_id)
       |SELECT f.vec_id, f.cell::BIGINT AS cluster,
       | COALESCE(m.mx, -1.0) AS max_sim_prev,
       | COALESCE(m.mx, -1.0) >= $tau AS is_dup
       |FROM af f LEFT JOIN mx m ON f.vec_id = m.vec_id
       |ORDER BY f.vec_id""".stripMargin
  }

  /** Complete s3 IVF-Flat top-k oracle: adaptive-nlist take-k
    * quantizer, `iters` Lloyd rounds, full-corpus assignment, AUTO
    * probe of the GREATEST(4, nlist//16) nearest cells — widened to
    * ≥ nlist//4 below the small-corpus line, lockstep with [[topK]]'s
    * round-16 default — exact cosine rerank (round 6, ties to the
    * lowest id), top `k`. */
  def oracleS3(k: Int, seed: Long, cap: Int, iters: Int,
      dim: Int, queryPred: String): String = {
    val r = dim + 1
    s"""WITH ${preludeSql(seed, cap)},
       |params AS (
       | SELECT LEAST(65536, GREATEST(16,
       |  4 * CAST(CEIL(SQRT(COUNT(*)::DOUBLE)) AS BIGINT))) AS nlist,
       |  COUNT(*) < $cap AS small FROM e),
       |c0 AS MATERIALIZED (
       | SELECT rn - 1 AS cell, qv AS cv FROM train
       | WHERE rn <= (SELECT nlist FROM params)),
       |${lloydSql(iters, dim)},
       |nn AS MATERIALIZED (
       | SELECT vec_id, qv, cell,
       |  list_sum([qv[j] * qv[j] FOR j IN range(1, $r)]) AS na FROM af),
       |qs AS MATERIALIZED (
       | SELECT vec_id AS query_id, qv,
       |  list_sum([qv[j] * qv[j] FOR j IN range(1, $r)]) AS qn
       | FROM e WHERE $queryPred),
       |pr AS (
       | SELECT query_id, cell FROM (
       |  SELECT q.query_id, c.cell,
       |   ROW_NUMBER() OVER (PARTITION BY q.query_id
       |    ORDER BY ${d2Sql("q", "c", dim)} ASC, c.cell ASC) AS rk
       |  FROM qs q CROSS JOIN c$iters c)
       | WHERE rk <= (SELECT CASE WHEN small
       |   THEN GREATEST(GREATEST(4, nlist // 16), nlist // 4)
       |   ELSE GREATEST(4, nlist // 16) END FROM params)),
       |scored AS (
       | SELECT q.query_id, f.vec_id,
       |  CASE WHEN f.na = 0 OR q.qn = 0 THEN 0.0
       |   ELSE ROUND(list_sum([q.qv[j] * f.qv[j] FOR j IN range(1, $r)])::DOUBLE /
       |        (SQRT(q.qn::DOUBLE) * SQRT(f.na::DOUBLE)), 6) END AS cos_sim
       | FROM pr p
       | JOIN qs q ON p.query_id = q.query_id
       | JOIN nn f ON f.cell = p.cell
       | WHERE f.vec_id <> p.query_id),
       |ranked AS (
       | SELECT query_id, vec_id, cos_sim,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos_sim DESC, vec_id ASC) AS rk
       | FROM scored)
       |SELECT query_id, vec_id, cos_sim, rk
       |FROM ranked WHERE rk <= $k ORDER BY query_id, rk""".stripMargin
  }

  /** Complete s2 sign-projection LSH top-k oracle: hash-derived ±1
    * planes, exact-integer plane count (minimal b with 2^b·8k ≥ N,
    * clamped to [4, 24]; AUTO-capped at [[MaxAutoPlanes]] in the
    * banded regime, round 15), bucketing on integer projections,
    * AUTO multiprobe (1-bit at np ≤ 7, +pair flips above), exact
    * cosine rerank — lockstep with [[lshTopK]]'s default. */
  def oracleS2(k: Int, seed: Long, dim: Int, queryPred: String): String = {
    val r = dim + 1
    val target = math.max(1L, 8L * k)
    s"""WITH e AS MATERIALIZED (
       | SELECT vec_id, [ROUND(x::DOUBLE * 1e4)::BIGINT FOR x IN embedding] AS qv
       | FROM embeddings),
       |np AS (
       | SELECT CASE WHEN (SELECT COUNT(*) FROM e) >= $TrainCap
       |   THEN LEAST($MaxAutoPlanes, raw) ELSE raw END AS np
       | FROM (
       |  SELECT LEAST(24, GREATEST(4, COALESCE(MIN(b), 24))) AS raw
       |  FROM range(0, 25) t(b)
       |  WHERE (1::BIGINT << b) * $target >= (SELECT COUNT(*) FROM e))),
       |pls AS MATERIALIZED (
       | SELECT p, list(s ORDER BY j) AS sv FROM (
       |  SELECT p, j,
       |   CASE WHEN substr(md5('pl:$seed:' || p || ':' || j), 1, 1)
       |    IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
       |  FROM range(0, 24) t1(p) CROSS JOIN range(1, $r) t2(j)
       |  WHERE p < (SELECT np FROM np)) GROUP BY p),
       |bk AS MATERIALIZED (
       | SELECT vec_id,
       |  SUM(CASE WHEN proj >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
       | FROM (
       |  SELECT e.vec_id, pls.p,
       |   list_sum([pls.sv[j] * e.qv[j] FOR j IN range(1, $r)]) AS proj
       |  FROM e CROSS JOIN pls) GROUP BY vec_id),
       |nn AS MATERIALIZED (
       | SELECT e.vec_id, e.qv, b.bucket,
       |  list_sum([e.qv[j] * e.qv[j] FOR j IN range(1, $r)]) AS na
       | FROM e JOIN bk b ON e.vec_id = b.vec_id),
       |qs AS MATERIALIZED (
       | SELECT vec_id AS query_id, qv, bucket, na AS qn
       | FROM nn WHERE $queryPred),
       |small AS (SELECT COUNT(*) < $TrainCap AS small FROM e),
       |qprobe AS (
       | SELECT q.query_id, q.qv, q.qn, xor(q.bucket, f.m) AS bucket
       | FROM qs q CROSS JOIN (
       |  SELECT 0::BIGINT AS m
       |  UNION ALL
       |  SELECT (1::BIGINT << b) FROM range(0, 24) t(b)
       |  WHERE b < (SELECT np FROM np)
       |  UNION ALL
       |  -- AUTO radius 2 (round 15): pair flips, only past np = 7
       |  SELECT (1::BIGINT << a) | (1::BIGINT << b)
       |  FROM range(0, 24) t1(a) CROSS JOIN range(0, 24) t2(b)
       |  WHERE a < b AND b < (SELECT np FROM np)
       |   AND (SELECT np FROM np) > 7) f),
       |scored AS (
       | -- two DISJOINT regimes (round 14): sub-cap corpus probes the
       | -- whole pool exactly; at/above the cap the banded equi-join
       | -- is unchanged — mirrors lshTopK's small/large branch
       | SELECT q.query_id, f.vec_id,
       |  CASE WHEN f.na = 0 OR q.qn = 0 THEN 0.0
       |   ELSE ROUND(list_sum([q.qv[j] * f.qv[j] FOR j IN range(1, $r)])::DOUBLE /
       |        (SQRT(q.qn::DOUBLE) * SQRT(f.na::DOUBLE)), 6) END AS cos_sim
       | FROM qprobe q JOIN nn f ON f.bucket = q.bucket
       | WHERE f.vec_id <> q.query_id AND NOT (SELECT small FROM small)
       | UNION ALL
       | SELECT q.query_id, f.vec_id,
       |  CASE WHEN f.na = 0 OR q.qn = 0 THEN 0.0
       |   ELSE ROUND(list_sum([q.qv[j] * f.qv[j] FOR j IN range(1, $r)])::DOUBLE /
       |        (SQRT(q.qn::DOUBLE) * SQRT(f.na::DOUBLE)), 6) END AS cos_sim
       | FROM qs q CROSS JOIN nn f
       | WHERE f.vec_id <> q.query_id AND (SELECT small FROM small)),
       |ranked AS (
       | SELECT query_id, vec_id, cos_sim,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos_sim DESC, vec_id ASC) AS rk
       | FROM scored)
       |SELECT query_id, vec_id, cos_sim, rk
       |FROM ranked WHERE rk <= $k ORDER BY query_id, rk""".stripMargin
  }

  /** Per-subspace residual codebook chain: tr<s> (train slices),
    * b<s>_0 (take-k init) → b<s>_<iters> via floor-mean Lloyd. */
  private def bookChainSql(s: Int, dsub: Int, ksub: Int,
      iters: Int): String = {
    val lo = s * dsub + 1; val hi = (s + 1) * dsub
    def d2b(a: String, b: String) =
      s"list_sum([($a.sv[i] - $b.cv[i]) * ($a.sv[i] - $b.cv[i]) FOR i IN range(1, ${dsub + 1})])"
    val head =
      s"""tr$s AS MATERIALIZED (SELECT rn, rv[$lo:$hi] AS sv FROM tres),
         |b${s}_0 AS MATERIALIZED (
         | SELECT rn - 1 AS cell, sv AS cv FROM tr$s WHERE rn <= $ksub)""".stripMargin
    val its = (1 to iters).map { t =>
      s"""ba${s}_$t AS (
         | SELECT rn, sv, cell FROM (
         |  SELECT t.rn, t.sv, c.cell,
         |   ROW_NUMBER() OVER (PARTITION BY t.rn
         |    ORDER BY ${d2b("t", "c")} ASC, c.cell ASC) AS rk
         |  FROM tr$s t CROSS JOIN b${s}_${t - 1} c) WHERE rk = 1),
         |bu${s}_$t AS (
         | SELECT cell, list(cj ORDER BY i) AS cv FROM (
         |  SELECT a.cell, t.i,
         |   CAST(FLOOR(SUM(a.sv[t.i])::DOUBLE / COUNT(*)) AS BIGINT) AS cj
         |  FROM ba${s}_$t a CROSS JOIN range(1, ${dsub + 1}) AS t(i)
         |  GROUP BY a.cell, t.i) GROUP BY cell),
         |b${s}_$t AS MATERIALIZED (
         | SELECT p.cell, COALESCE(u.cv, p.cv) AS cv
         | FROM b${s}_${t - 1} p LEFT JOIN bu${s}_$t u USING (cell))""".stripMargin
    }
    (head +: its).mkString(",\n")
  }

  /** Complete s4 IVF-PQ top-k oracle: deterministic coarse quantizer
    * (take-k, `iters` Lloyd rounds, adaptive nlist), per-subspace
    * integer residual codebooks, exact-integer ADC shortlist of
    * rerankMult·k per query, exact cosine rerank. Mirrors the
    * kernel's SMALL-CORPUS refinement (round 13): when N < `cap` the
    * probe widens to ≥ nlist/4 and the ADC shortlist keeps EVERY
    * candidate (exact rerank of the whole probed pool). */
  def oracleS4(k: Int, seed: Long, cap: Int, iters: Int, dim: Int,
      m: Int, ksub: Int, rerankMult: Int, queryPred: String): String = {
    val r = dim + 1
    val dsub = dim / m
    val booksUnion = (0 until m)
      .map(s => s"SELECT $s AS s, cell AS j, cv FROM b${s}_$iters")
      .mkString("\n  UNION ALL ")
    s"""WITH ${preludeSql(seed, cap)},
       |params AS (
       | SELECT LEAST(65536, GREATEST(16,
       |  4 * CAST(CEIL(SQRT(COUNT(*)::DOUBLE)) AS BIGINT))) AS nlist,
       |  COUNT(*) < $cap AS small FROM e),
       |c0 AS MATERIALIZED (
       | SELECT rn - 1 AS cell, qv AS cv FROM train
       | WHERE rn <= (SELECT nlist FROM params)),
       |${lloydSql(iters, dim)},
       |tasn AS (
       | SELECT rn, qv, cell FROM (
       |  SELECT t.rn, t.qv, c.cell,
       |   ROW_NUMBER() OVER (PARTITION BY t.rn
       |    ORDER BY ${d2Sql("t", "c", dim)} ASC, c.cell ASC) AS rk
       |  FROM train t CROSS JOIN c$iters c) WHERE rk = 1),
       |tres AS MATERIALIZED (
       | SELECT t.rn, [t.qv[j] - c.cv[j] FOR j IN range(1, $r)] AS rv
       | FROM tasn t JOIN c$iters c USING (cell)),
       |${(0 until m).map(s => bookChainSql(s, dsub, ksub, iters)).mkString(",\n")},
       |books AS MATERIALIZED (
       |  $booksUnion),
       |cres AS MATERIALIZED (
       | SELECT f.vec_id, f.cell, f.qv,
       |  [f.qv[j] - c.cv[j] FOR j IN range(1, $r)] AS rv
       | FROM af f JOIN c$iters c USING (cell)),
       |codes AS MATERIALIZED (
       | SELECT vec_id, s, j AS cs FROM (
       |  SELECT r.vec_id, b.s, b.j,
       |   ROW_NUMBER() OVER (PARTITION BY r.vec_id, b.s ORDER BY
       |    list_sum([(r.rv[b.s * $dsub + i] - b.cv[i]) * (r.rv[b.s * $dsub + i] - b.cv[i])
       |              FOR i IN range(1, ${dsub + 1})]) ASC, b.j ASC) AS rk
       |  FROM cres r CROSS JOIN books b) WHERE rk = 1),
       |nn AS MATERIALIZED (
       | SELECT vec_id, qv, cell,
       |  list_sum([qv[j] * qv[j] FOR j IN range(1, $r)]) AS na FROM af),
       |qs AS MATERIALIZED (
       | SELECT vec_id AS query_id, qv,
       |  list_sum([qv[j] * qv[j] FOR j IN range(1, $r)]) AS qn
       | FROM e WHERE $queryPred),
       |pr AS MATERIALIZED (
       | SELECT query_id, cell FROM (
       |  SELECT q.query_id, c.cell,
       |   ROW_NUMBER() OVER (PARTITION BY q.query_id
       |    ORDER BY ${d2Sql("q", "c", dim)} ASC, c.cell ASC) AS rk
       |  FROM qs q CROSS JOIN c$iters c)
       | WHERE rk <= (SELECT CASE WHEN small
       |   THEN GREATEST(GREATEST(4, nlist // 16), nlist // 4)
       |   ELSE GREATEST(4, nlist // 16) END FROM params)),
       |tab AS MATERIALIZED (
       | SELECT p.query_id, p.cell, b.s, b.j,
       |  list_sum([(q.qv[b.s * $dsub + i] - c.cv[b.s * $dsub + i] - b.cv[i]) *
       |            (q.qv[b.s * $dsub + i] - c.cv[b.s * $dsub + i] - b.cv[i])
       |            FOR i IN range(1, ${dsub + 1})]) AS d
       | FROM pr p
       | JOIN qs q ON q.query_id = p.query_id
       | JOIN c$iters c ON c.cell = p.cell
       | CROSS JOIN books b),
       |adc AS (
       | SELECT cq.query_id, cq.vec_id, SUM(t.d)::BIGINT AS adc
       | FROM (
       |  SELECT p.query_id, p.cell, f.vec_id FROM pr p
       |  JOIN nn f ON f.cell = p.cell WHERE f.vec_id <> p.query_id) cq
       | JOIN codes cd ON cd.vec_id = cq.vec_id
       | JOIN tab t ON t.query_id = cq.query_id AND t.cell = cq.cell
       |           AND t.s = cd.s AND t.j = cd.cs
       | GROUP BY cq.query_id, cq.vec_id),
       |shortlist AS (
       | SELECT query_id, vec_id FROM (
       |  SELECT query_id, vec_id,
       |   ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY adc ASC, vec_id ASC) AS ark
       |  FROM adc)
       | WHERE (SELECT small FROM params) OR ark <= ${rerankMult * k}),
       |scored AS (
       | SELECT sl.query_id, sl.vec_id,
       |  CASE WHEN f.na = 0 OR q.qn = 0 THEN 0.0
       |   ELSE ROUND(list_sum([q.qv[j] * f.qv[j] FOR j IN range(1, $r)])::DOUBLE /
       |        (SQRT(q.qn::DOUBLE) * SQRT(f.na::DOUBLE)), 6) END AS cos_sim
       | FROM shortlist sl
       | JOIN qs q ON q.query_id = sl.query_id
       | JOIN nn f ON f.vec_id = sl.vec_id),
       |ranked AS (
       | SELECT query_id, vec_id, cos_sim,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |   ORDER BY cos_sim DESC, vec_id ASC) AS rk
       | FROM scored)
       |SELECT query_id, vec_id, cos_sim, rk
       |FROM ranked WHERE rk <= $k ORDER BY query_id, rk""".stripMargin
  }

  /** Complete c1 k-means-summary oracle: farthest-first init (k
    * unrolled steps), `iters` unrolled Lloyd rounds, per-cluster
    * size + exact integer inertia in q8 units ((1e-4)² = 1e-8). */
  def oracleC1(k: Int, seed: Long, cap: Int, iters: Int,
      dim: Int): String =
    s"""WITH ${preludeSql(seed, cap)},
       |${ffInitSql(k, dim)},
       |c0 AS (SELECT cell, cv FROM ch$k),
       |${lloydSql(iters, dim)},
       |sums AS (
       | SELECT f.cell, COUNT(*)::BIGINT AS n,
       |  SUM(${d2Sql("f", "c", dim)})::BIGINT AS inertia_q8
       | FROM af f JOIN c$iters c USING (cell) GROUP BY f.cell)
       |SELECT cell::BIGINT AS cluster_id, n, inertia_q8,
       | ROUND(inertia_q8::DOUBLE / n)::BIGINT AS mean_d2_q8
       |FROM sums ORDER BY cluster_id""".stripMargin
}
