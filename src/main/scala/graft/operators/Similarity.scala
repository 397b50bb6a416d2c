package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftx.VectorExpressions
import graft.core.Rng

/** Approximate nearest-neighbor search over an embedding column —
  * the sub-linear scale path beside the exact `s1_knn_bruteforce`
  * baseline (north-star extension).
  *
  * Random-hyperplane LSH: `nPlanes` deterministic pseudo-random
  * hyperplanes (seeded Gaussian, engine-stable via graft.core.Rng)
  * give each vector a sign-bit signature → integer bucket.
  * Candidates = bucket collisions, optionally multiprobed by flipping
  * each signature bit (catches near-boundary neighbors); exact cosine
  * reranks the candidate set.
  *
  * 100 TB shape: the planes are a broadcast literal; bucketing is a
  * stateless projection on the corpus scan; the query join shuffles
  * only on the short bucket key; rerank touches |candidates| ≪ N
  * rows. Nothing is ever collected to the driver.
  */
object Similarity {

  /** Deterministic planes: nPlanes × dim Gaussians. */
  def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      val r = Rng.forKey(seed, s"plane:$p")
      Seq.fill(dim)(r.nextGaussian())
    }

  private def bucketExpr(v: Column, pl: Seq[Seq[Double]]): Column =
    pl.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(VectorExpressions.dotProduct(v, planeCol) >= 0,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Attach LSH bucket to a (id, v: array<double>) DataFrame. */
  def bucketize(df: DataFrame, vCol: String, pl: Seq[Seq[Double]]): DataFrame =
    df.withColumn("bucket", bucketExpr(col(vCol), pl))

  /** Top-k ANN: queries and corpus share the bucketing; multiprobe
    * expands each query to its bucket plus all 1-bit-flipped buckets.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, vCol: String,
      idCol: String, k: Int, nPlanes: Int, seed: Long, dim: Int): DataFrame = {
    val pl = planes(nPlanes, dim, seed)
    val c = bucketize(corpus, vCol, pl)
      .select(col(idCol).as("vec_id"), col(vCol).as("v"), col("bucket"))
      .withColumn("nrm", sqrt(VectorExpressions.dotProduct(col("v"), col("v"))))
    val probes = (0 until nPlanes).map(i => lit(1 << i))
    val q = bucketize(queries, vCol, pl)
      .select(col(idCol).as("query_id"), col(vCol).as("qv"), col("bucket"))
      .withColumn("qn", sqrt(VectorExpressions.dotProduct(col("qv"), col("qv"))))
      // multiprobe: own bucket + each 1-bit flip (bitwise xor)
      .withColumn("bucket", explode(array(
        col("bucket") +: probes.map(p => col("bucket").bitwiseXOR(p)): _*)))
    val cos = round(VectorExpressions.cosine(col("qv"), col("v"),
      col("qn"), col("nrm")), 6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    q.join(c, "bucket")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** IVF (inverted-file) ANN — the second scale path beside the
    * hyperplane LSH: partition the corpus into `nlist` Voronoi cells
    * around learned centroids; a query probes only its `nprobe`
    * nearest cells. Candidates come from an equi-join on the short
    * cell id — the same 100 TB shape as the LSH bucket join, but with
    * data-adaptive cells (better recall on clustered corpora).
    *
    * Training is Lloyd iterations expressed as DataFrame aggregation:
    * assign (per-row argmin over the broadcast centroid array) →
    * groupBy(cell).avg. Only the k×dim centroid matrix crosses the
    * driver per round — never row data. Deterministic: seeded
    * hash-ranked init, fixed iteration count. */
  object Ivf {

    /** Seeded deterministic init + `iters` Lloyd rounds.
      *
      * Training runs on a deterministic keyed-digest SAMPLE capped at
      * `trainSample` vectors (the standard IVF discipline — FAISS
      * trains quantizers on ~nlist·256 points): Lloyd cost stops
      * scaling with the corpus, while assignment (the one full pass)
      * still covers every vector. Below the cap the sample IS the
      * corpus, so small-scale results are unchanged.
      *
      * The sample is collected and Lloyd runs DRIVER-LOCAL as dense
      * matrix products (the FAISS shape: quantizers train in memory).
      * Driver traffic is bounded by the CAP — trainSample×dim doubles
      * (4 MB at 8192×64) — independent of corpus size, the same
      * control-plane discipline as collecting the centroid matrix;
      * running Lloyd as per-round Spark jobs paid ~0.5 s scheduling
      * overhead per round to aggregate the same ≤4 MB. */
    def centroids(corpus: DataFrame, vCol: String, idCol: String,
        nlist: Int, iters: Int, seed: Long,
        trainSample: Int = 8192,
        farthestInit: Boolean = false): Array[Array[Double]] = {
      val train: Array[Array[Double]] = corpus
        .withColumn("__h", xxhash64(col(idCol), lit(seed)))
        .orderBy(col("__h")).limit(trainSample)
        .select(col(vCol)).collect()
        .map(_.getSeq[Double](0).toArray)
      if (train.isEmpty) return Array.empty
      lloydLocal(train, nlist, iters, farthestInit)
    }

    /** Column-major Breeze matrix over row-major training vectors. */
    private def toMatrix(rows: Array[Array[Double]]) = {
      val n = rows.length
      val dim = rows(0).length
      new breeze.linalg.DenseMatrix(n, dim,
        Array.tabulate(n * dim)(j => rows(j % n)(j / n)))
    }

    /** Driver-local Lloyd: init = the training set's own first k rows
      * (deterministic under the keyed-digest order that selected the
      * sample), `iters` GEMM-argmin + mean-update rounds, empty cells
      * keep their centroid. Shared by the IVF coarse quantizer and
      * the PQ sub-codebooks — both train on bounded samples, so this
      * never sees corpus-sized input. */
    /** Gonzalez farthest-first traversal init (deterministic: starts
      * from the sample's first row under the keyed-digest order,
      * strict > keeps the lowest index on distance ties). For
      * well-separated clusters this provably seeds one center per
      * cluster — the take-k init can seed two centers in one blob
      * and Lloyd never recovers (the k-means summary operator's
      * failure mode; at IVF's nlist ≈ 4√N the many-cells regime
      * washes init quality out, so IVF keeps take-k and its committed
      * outputs). O(n·k·dim), sample-bounded like Lloyd itself. */
    private def farthestFirstInit(train: Array[Array[Double]],
        k: Int): Array[Array[Double]] = {
      val n = train.length
      if (n <= k) return train.take(k)
      val chosen = scala.collection.mutable.ArrayBuffer(train(0))
      val minD = Array.fill(n)(Double.MaxValue)
      while (chosen.length < k) {
        val c = chosen.last
        var best = 0; var bestD = -1.0; var i = 0
        while (i < n) {
          var d = 0.0; var j = 0
          val v = train(i)
          while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
          if (d < minD(i)) minD(i) = d
          if (minD(i) > bestD) { bestD = minD(i); best = i }
          i += 1
        }
        chosen += train(best)
      }
      chosen.toArray
    }

    private[operators] def lloydLocal(train: Array[Array[Double]], k: Int,
        iters: Int, farthestInit: Boolean = false): Array[Array[Double]] = {
      var cents =
        if (farthestInit) farthestFirstInit(train, k) else train.take(k)
      val n = train.length
      val dim = train(0).length
      val X = toMatrix(train)
      (0 until iters).foreach { _ =>
        val assign = argminCells(X, cents)
        val sums = Array.fill(cents.length)(new Array[Double](dim))
        val counts = new Array[Long](cents.length)
        var r = 0
        while (r < n) {
          val c = assign(r); counts(c) += 1
          val s = sums(c); val v = train(r)
          var i = 0; while (i < dim) { s(i) += v(i); i += 1 }
          r += 1
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c) // empty cell keeps its centroid
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }

    /** Argmin cell per row of X (n×dim) against the centroid rows —
      * one GEMM (scores = X·Cᵀ) plus the ‖c‖²/2 correction:
      * argmin‖v−c‖² = argmax(v·c − ‖c‖²/2). Strict > keeps the
      * lowest cell index on ties, matching the old per-row loop. */
    private def argminCells(X: breeze.linalg.DenseMatrix[Double],
        cents: Array[Array[Double]]): Array[Int] = {
      val k = cents.length
      val dim = cents(0).length
      val C = new breeze.linalg.DenseMatrix(k, dim,
        Array.tabulate(k * dim)(j => cents(j % k)(j / k)))
      val s = X * C.t // n×k — netlib dgemm
      val half = Array.tabulate(k) { c =>
        var h = 0.0; var i = 0
        while (i < dim) { h += cents(c)(i) * cents(c)(i); i += 1 }
        h / 2
      }
      Array.tabulate(X.rows) { r =>
        var best = 0; var bestS = s(r, 0) - half(0); var c = 1
        while (c < k) {
          val sc = s(r, c) - half(c)
          if (sc > bestS) { bestS = sc; best = c }
          c += 1
        }
        best
      }
    }

    /** Distributed cell assignment — the ONE full-corpus pass. Runs
      * as per-partition batched GEMM (1024-row blocks against the
      * broadcast centroid matrix) instead of a per-row UDF loop: the
      * boxed Seq[Double] argmin at nlist ≈ √N cost O(N·nlist·dim) in
      * scalar ops and was the measured scale-killer (s3 at the 25×
      * point: 40 s of assignment; the GEMM form is ~100× denser).
      * Batch size only groups work — results are row-independent. */
    def assignCells(df: DataFrame, idCol: String, vCol: String,
        cents: Array[Array[Double]]): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(cents)
      df.select(col(idCol).cast("long"), col(vCol).cast("array<double>"))
        .as[(Long, Array[Double])]
        .mapPartitions { it =>
          val cs = bc.value
          val dim = if (cs.isEmpty) 0 else cs(0).length
          it.grouped(1024).flatMap { g =>
            val batch = g.toArray
            val n = batch.length
            val X = new breeze.linalg.DenseMatrix(n, dim,
              Array.tabulate(n * dim)(j => batch(j % n)._2(j / n)))
            val assign = argminCells(X, cs)
            batch.iterator.zipWithIndex.map { case ((id, v), r) =>
              (id, v, assign(r))
            }
          }
        }
        .toDF(idCol, vCol, "cell")
    }

    private def probeUdf(cents: Array[Array[Double]], nprobe: Int) =
      udf { (v: Seq[Double]) =>
        cents.indices.map { c =>
          var d = 0.0; var i = 0
          val cent = cents(c)
          while (i < v.length) { val t = v(i) - cent(i); d += t * t; i += 1 }
          (d, c)
        }.sorted.take(nprobe).map(_._2)
      }

    /** Top-k ANN: cell equi-join candidates + exact cosine rerank. */
    def topK(corpus: DataFrame, queries: DataFrame, vCol: String,
        idCol: String, k: Int, nlist: Int, nprobe: Int, iters: Int,
        seed: Long): DataFrame = {
      val cents = centroids(corpus, vCol, idCol, nlist, iters, seed)
      val c = assignCells(
        corpus.select(col(idCol).as("vec_id"), col(vCol).as("v")),
        "vec_id", "v", cents)
        .withColumn("nrm", sqrt(VectorExpressions.dotProduct(col("v"), col("v"))))
      val q = queries
        .select(col(idCol).as("query_id"), col(vCol).as("qv"))
        .withColumn("cell", explode(probeUdf(cents, nprobe)(col("qv"))))
        .withColumn("qn", sqrt(VectorExpressions.dotProduct(col("qv"), col("qv"))))
      val cos = round(VectorExpressions.cosine(col("qv"), col("v"),
        col("qn"), col("nrm")), 6)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
      q.join(c, "cell")
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
        .dropDuplicates("query_id", "vec_id")
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= k)
        .orderBy(col("query_id"), col("rk"))
    }

    /** IVF-PQ (Jégou–Douze–Schmid, "Product Quantization for Nearest
      * Neighbor Search", TPAMI 2011) — the memory-bound 100 TB tier
      * beside IVF-Flat: each vector stores its coarse cell plus M
      * sub-codebook indices (M bytes at ksub ≤ 256) instead of
      * dim × 8 bytes, a 64× compression at dim = 64 / M = 8. Queries
      * score candidates by asymmetric distance (ADC): one M×ksub
      * lookup table per (query, probed cell), then each candidate
      * costs M table adds — no float vector is touched until the
      * short exact-rerank list.
      *
      * coarse cell c + per-subspace codes over the RESIDUAL v − c
      * (residual PQ — tighter cells than raw-vector PQ). */
    case class PqModel(cents: Array[Array[Double]],
        books: Array[Array[Array[Double]]]) { // m × ksub × dsub
      def m: Int = books.length
      def ksub: Int = books(0).length
      def dsub: Int = books(0)(0).length
    }

    /** Train coarse + sub-codebooks driver-local on the capped
      * keyed-digest sample (the `centroids` discipline: bounded
      * driver traffic, deterministic under the seed). */
    def trainPq(corpus: DataFrame, vCol: String, idCol: String,
        nlist: Int, m: Int, ksub: Int, iters: Int, seed: Long,
        trainSample: Int = 8192): PqModel = {
      val train: Array[Array[Double]] = corpus
        .withColumn("__h", xxhash64(col(idCol), lit(seed)))
        .orderBy(col("__h")).limit(trainSample)
        .select(col(vCol)).collect()
        .map(_.getSeq[Double](0).toArray)
      require(train.nonEmpty, "trainPq: empty corpus")
      val dim = train(0).length
      require(dim % m == 0, s"trainPq: dim $dim not divisible by m=$m")
      val dsub = dim / m
      val cents = lloydLocal(train, nlist, iters)
      val assign = argminCells(toMatrix(train), cents)
      val resid = Array.tabulate(train.length) { r =>
        val c = cents(assign(r)); val v = train(r)
        Array.tabulate(dim)(i => v(i) - c(i))
      }
      val books = Array.tabulate(m) { s =>
        lloydLocal(resid.map(_.slice(s * dsub, (s + 1) * dsub)), ksub, iters)
      }
      PqModel(cents, books)
    }

    /** Distributed encode — the one full-corpus pass: batched GEMM
      * coarse assignment (the `assignCells` kernel), then per-row
      * sub-codebook argmin over the residual (m·ksub·dsub ≈ 1k flops
      * per row; ties keep the lowest code index). The full vector is
      * carried alongside here because the local bench reranks from
      * the same table; a 100 TB deployment stores codes in the hot
      * index and fetches vectors only for the rerank list. */
    def encodePq(df: DataFrame, idCol: String, vCol: String,
        model: PqModel): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(model)
      df.select(col(idCol).cast("long"), col(vCol).cast("array<double>"))
        .as[(Long, Array[Double])]
        .mapPartitions { it =>
          val mdl = bc.value
          val (m, ksub, dsub) = (mdl.m, mdl.ksub, mdl.dsub)
          it.grouped(1024).flatMap { g =>
            val batch = g.toArray
            val cell = argminCells(toMatrix(batch.map(_._2)), mdl.cents)
            batch.iterator.zipWithIndex.map { case ((id, v), r) =>
              val c = mdl.cents(cell(r))
              val code = Array.tabulate(m) { s =>
                var best = 0; var bestD = Double.MaxValue; var j = 0
                while (j < ksub) {
                  val bw = mdl.books(s)(j)
                  var d = 0.0; var i = 0
                  while (i < dsub) {
                    val t = v(s * dsub + i) - c(s * dsub + i) - bw(i)
                    d += t * t; i += 1
                  }
                  if (d < bestD) { bestD = d; best = j }
                  j += 1
                }
                best
              }
              (id, v, cell(r), code)
            }
          }
        }
        .toDF(idCol, vCol, "cell", "code")
    }

    /** Top-k: ADC scoring over the probed cells' codes, exact cosine
      * rerank of the `rerankMult`·k best ADC candidates per query.
      * Both windows partition on query_id; candidates reach the join
      * via the short cell key — the IVF shape with M-byte payloads. */
    def topKPq(corpus: DataFrame, queries: DataFrame, vCol: String,
        idCol: String, k: Int, nlist: Int, m: Int, ksub: Int,
        nprobe: Int, iters: Int, seed: Long,
        rerankMult: Int = 4): DataFrame = {
      val model = trainPq(corpus, vCol, idCol, nlist, m, ksub, iters, seed)
      val spark = corpus.sparkSession
      val bc = spark.sparkContext.broadcast(model)
      val enc = encodePq(
        corpus.select(col(idCol).as("vec_id"), col(vCol).as("v")),
        "vec_id", "v", model)
        .withColumn("nrm",
          sqrt(VectorExpressions.dotProduct(col("v"), col("v"))))
      // per (query, probed cell): the M×ksub ADC table of squared
      // residual-to-codeword distances — computed once per probe,
      // m table adds per candidate afterwards
      val probeTabs = udf { (qv: Seq[Double]) =>
        val mdl = bc.value
        val (mm, kk, dd) = (mdl.m, mdl.ksub, mdl.dsub)
        mdl.cents.indices.map { c =>
          val cent = mdl.cents(c)
          var d = 0.0; var i = 0
          while (i < qv.length) { val t = qv(i) - cent(i); d += t * t; i += 1 }
          (d, c)
        }.sorted.take(math.min(nprobe, mdl.cents.length)).map { case (_, c) =>
          val cent = mdl.cents(c)
          val tab = Array.tabulate(mm * kk) { idx =>
            val s = idx / kk; val j = idx % kk
            val bw = mdl.books(s)(j)
            var d = 0.0; var i = 0
            while (i < dd) {
              val t = qv(s * dd + i) - cent(s * dd + i) - bw(i)
              d += t * t; i += 1
            }
            d
          }
          (c, tab.toSeq)
        }
      }
      val adcScore = udf { (tab: Seq[Double], code: Seq[Int]) =>
        var s = 0; var d = 0.0
        val kk = bc.value.ksub
        while (s < code.length) { d += tab(s * kk + code(s)); s += 1 }
        d
      }
      val q = queries
        .select(col(idCol).as("query_id"), col(vCol).as("qv"))
        .withColumn("p", explode(probeTabs(col("qv"))))
        .select(col("query_id"), col("qv"),
          col("p._1").as("cell"), col("p._2").as("tab"))
        .withColumn("qn",
          sqrt(VectorExpressions.dotProduct(col("qv"), col("qv"))))
      val byAdc = Window.partitionBy(col("query_id"))
        .orderBy(col("adc").asc, col("vec_id").asc)
      val cos = round(VectorExpressions.cosine(col("qv"), col("v"),
        col("qn"), col("nrm")), 6)
      val byCos = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
      q.join(enc, "cell")
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("adc", adcScore(col("tab"), col("code")))
        .select(col("query_id"), col("vec_id"), col("adc"),
          col("qv"), col("qn"), col("v"), col("nrm"))
        .dropDuplicates("query_id", "vec_id")
        .withColumn("ark", row_number().over(byAdc))
        .where(col("ark") <= rerankMult * k)
        .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
        .withColumn("rk", row_number().over(byCos).cast("long"))
        .where(col("rk") <= k)
        .orderBy(col("query_id"), col("rk"))
    }
  }

  /** Query-surface entry: IVF ANN over the embeddings table. Oracle-
    * checked since round 7: the coarse quantizer is the deterministic
    * integer Lloyd (IntKmeans.topK / IntKmeans.oracleS3), so the
    * approximate result itself replays exactly in DuckDB; recall vs
    * the exact baseline stays asserted in OperatorsSpec. */
  def s3AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(spark, dir, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") < 5)
    // adaptive cell count (≈4√N, see adaptiveNlist): a FIXED nlist
    // makes the per-query candidate set nprobe·N/nlist — linear in
    // the corpus, defeating the point of IVF. nprobe rides along at
    // ~6% of the cells (the FAISS-ish recall/latency point), so
    // per-query work is ~N/16 dot products against a probed subset.
    val nlist = adaptiveNlist(e.count())
    // nprobe = 0 is AUTO (round 16): GREATEST(4, nlist/16), widened
    // to ≥ nlist/4 below the small-corpus line — oracleS3 in lockstep
    IntKmeans.topK(e, q, "embedding", "vec_id", k = 10, nlist = nlist,
      nprobe = 0, iters = 2, seed = 42L)
  }

  /** Query-surface entry: IVF-PQ ANN over the embeddings table.
    * Oracle-checked since round 7: coarse quantizer, per-subspace
    * residual codebooks, PQ codes, and ADC scores are all exact
    * integers under the deterministic kernel (IntKmeans.pqTopK /
    * oracleS4), so the compressed-index approximation itself replays
    * in DuckDB; recall vs the exact baseline and planted-duplicate
    * behavior stay asserted in OperatorsSpec. m=8 subspaces × ksub=16
    * codewords over the 64-dim embeddings → 8 nibble codes per vector
    * where IVF-Flat keeps 512 bytes. Round 13: below the small-corpus
    * line (N < IntKmeans.TrainCap) the kernel widens the probe and
    * exact-reranks every probed candidate (IndexRefineFlat limit) —
    * measured recall@10 0.82–0.94 at the hard 1× regime
    * (bench/ann_recall.json; was 0.24–0.4), 1.0 at 25× with the ADC
    * scale path unchanged. */
  def s4AnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(spark, dir, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") < 5)
    val nlist = adaptiveNlist(e.count())
    // nprobe = 0 is AUTO (round 16) — same derivation as the old
    // explicit value in the banded regime, oracleS4 in lockstep
    IntKmeans.pqTopK(e, q, "embedding", "vec_id", k = 10, nlist = nlist,
      m = 8, ksub = 16, nprobe = 0, iters = 2, seed = 42L)
  }

  /** Plane count scaled to the corpus: enough sign bits that the
    * expected bucket occupancy is ~8·k candidates — nPlanes =
    * ⌈log₂(N / 8k)⌉ clamped to [4, 24]. At N = 2·10³ that is 5
    * planes; at N = 10⁹ it is 24 (16M buckets). Only the O(1) count
    * crosses the driver. */
  def adaptivePlanes(n: Long, k: Int): Int = {
    val target = math.max(1L, 8L * k)
    val bits = math.ceil(math.log(math.max(1.0, n.toDouble / target))
      / math.log(2)).toInt
    math.min(24, math.max(4, bits))
  }

  /** D10 SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication", arXiv:2303.09540):
    * semantic near-duplicate removal by clustering embeddings and
    * pruning within clusters. Each vector joins its IVF cell; inside
    * a cell, a vector whose cosine to any EARLIER-id cell member is
    * ≥ `tau` is flagged a duplicate — "keep one representative per
    * ε-ball", made deterministic by keeping the lowest id. Scale
    * shape: the quantizer trains on a capped sample, assignment is
    * the one full corpus pass, and the verify join is blocked per
    * cell — nlist grows with N to bound cell size, so the pair
    * volume stays O(N · cell) and never goes all-pairs.
    *
    * Round 7: the quantizer is the cross-engine-deterministic integer
    * Lloyd (operators/IntKmeans.scala) — every assignment decision is
    * exact integer arithmetic, the cosine rides exact integer dots,
    * and the WHOLE output (cluster ids included) now has a DuckDB
    * oracle (IntKmeans.oracleD10) instead of a rows-only check. */
  def semDedup(emb: DataFrame, vCol: String, idCol: String, nlist: Int,
      tau: Double, iters: Int, seed: Long): DataFrame = {
    val q = IntKmeans.quantize(emb, idCol, vCol)
    val train = IntKmeans.sampleTrain(q, idCol, seed, cap = 8192)
    val cents = IntKmeans.lloyd(train, nlist, iters, farthest = false)
    val c = IntKmeans.assign(q, idCol, cents)
      .select(col(idCol).as("vec_id"), col("qvd"),
        col("cell").cast("long").as("cluster"))
      .withColumn("na", IntKmeans.doti(col("qvd"), col("qvd"))) // exact int-valued
    val prev = c.select(col("cluster"), col("vec_id").as("prev_id"),
      col("qvd").as("pv"), col("na").as("nb"))
    // cosine over exact integer dots; rounded BEFORE the max so the
    // max compares the same 6-decimal values the oracle compares
    val cs = when(col("na") === 0.0 || col("nb") === 0.0, lit(0.0))
      .otherwise(round(IntKmeans.doti(col("qvd"), col("pv"))
        / (sqrt(col("na")) * sqrt(col("nb"))), 6))
    val sims = c.join(prev, "cluster")
      .where(col("prev_id") < col("vec_id"))
      .select(col("vec_id"), cs.as("cs"))
      .groupBy(col("vec_id")).agg(max(col("cs")).as("mx"))
    c.select(col("vec_id"), col("cluster"))
      .join(sims, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("mx"), lit(-1.0)).as("max_sim_prev"),
        (coalesce(col("mx"), lit(-1.0)) >= tau).as("is_dup"))
      .orderBy(col("vec_id"))
  }

  /** Cell count scaled to the corpus: nlist ≈ 4·√N clamped to
    * [16, 65536] — the classic IVF balance (FAISS's guideline is
    * 4√N…16√N). The two costs that nlist trades off are assignment,
    * O(N·nlist·dim), and within-cell verify volume, O(N²·dim/nlist);
    * they meet at nlist ∝ √N, where both grow as N^1.5 (an earlier
    * ⌈N/512⌉ rule bounded the verify side but made assignment
    * quadratic — measured as a 40 s s3 at the 25× bench point).
    * Only the O(1) count crosses the driver. */
  def adaptiveNlist(n: Long): Int =
    math.min(65536L, math.max(16L,
      4L * math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** Query-surface entry: SemDeDup over the embeddings table. Oracle-
    * checked since round 7 (IntKmeans.oracleD10 replays the integer
    * Lloyd + within-cell verdict exactly in DuckDB); behavior is also
    * asserted on a constructed corpus in OperatorsSpec. τ matches
    * d5's near-dup notion for this synthetic embedding table. */
  def d10SemDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(spark, dir, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    semDedup(e, "v", "vec_id", nlist = adaptiveNlist(e.count()),
      tau = 0.3, iters = 2, seed = 42L)
  }

  /** Query-surface entry over the embeddings table. Oracle-checked
    * since round 7: hash-derived ±1 sign-projection planes + integer
    * projections replay exactly in DuckDB (IntKmeans.lshTopK /
    * oracleS2); recall vs the exact baseline stays asserted in
    * OperatorsSpec. The Gaussian-plane kernel (`annTopK`) remains the
    * general-dim library surface.
    *
    * RETRIEVAL-QUALITY NOTE (round 14; `bench/ann_recall.json`):
    * below [[IntKmeans.TrainCap]] vectors the kernel probes the WHOLE
    * pool exactly (recall 1.0 by construction — the s4 small-corpus
    * pattern, VERDICT r13 #4); at scale, recall on synthetic near-iid
    * embeddings tracks the scanned fraction (0.52 at 25× radius-1 —
    * sign-LSH has no angular clusters to exploit there).
    * Recall-critical large-corpus callers should use s3
    * ([[s3AnnIvf]], measured 1.0 at 25× at every nprobe) or s1 brute
    * force; `probeHamming = 2` on [[IntKmeans.lshTopK]] is the
    * in-family recall dial. s2's value is the PLAN SHAPE: a banded
    * equi-join that never goes all-pairs at 100 TB. */
  def s2AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(spark, dir, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") < 5)
    IntKmeans.lshTopK(e, q, "embedding", "vec_id", k = 10, dim = 64,
      seed = 42L)
  }
}
