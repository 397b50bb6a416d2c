package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * standard preprocessing step a large-scale embedding pipeline runs
  * before ANN indexing or clustering (decorrelate + reduce dims; cf.
  * the OPQ rotation in Ge et al., "Optimized Product Quantization",
  * and FAISS's PCAMatrix pre-transform).
  *
  * 100 TB shape: the fit is ONE distributed pass producing the d-dim
  * mean and d×d scatter matrix via `treeReduce` — partials combine
  * executor-side in log depth, so exactly one (count, sum, S) triple
  * of O(d²) doubles reaches the driver (32 KB at d = 64), never row
  * data. The eigendecomposition is driver-local on the d×d covariance
  * (Breeze `eigSym`, microseconds at d = 64), and projection is a
  * stateless batched-GEMM map over the corpus against the broadcast
  * component matrix — the `Ivf.assignCells` discipline.
  *
  * Determinism: eigenvector SIGN is fixed by making each component's
  * largest-magnitude coordinate positive (ties to the lowest index),
  * so the projection is a function of the covariance alone.
  */
object Pca {

  /** Fitted transform: mean, top-r components (column-orthonormal,
    * d×r), and ALL d eigenvalues descending (λ_i = variance along
    * component i; the tail is what truncation to r discards). */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def d: Int = mean.length
    def r: Int = components.length
  }

  /** One-pass distributed fit. `vCol` must be array<double> of a
    * fixed dimension d; r ≤ d components are kept. */
  def fit(df: DataFrame, vCol: String, r: Int): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vCol).cast("array<double>")).as[Array[Double]]
    // per-partition (n, Σv, Σvvᵀ) — S kept as the full dense d×d (at
    // d = 64 the symmetry saving is not worth the index arithmetic)
    val (n, sum, s) = vecs.rdd
      .mapPartitions { it =>
        var n = 0L
        var sum: Array[Double] = null
        var s: Array[Double] = null
        it.foreach { v =>
          val d = v.length
          if (sum == null) { sum = new Array[Double](d); s = new Array[Double](d * d) }
          require(v.length == sum.length,
            s"pca: ragged embedding dim ${v.length} vs ${sum.length}")
          n += 1
          var i = 0
          while (i < d) {
            sum(i) += v(i)
            var j = 0
            val vi = v(i)
            while (j < d) { s(i * d + j) += vi * v(j); j += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((n, sum, s))
      }
      .treeReduce { case ((n1, u1, s1), (n2, u2, s2)) =>
        var i = 0
        while (i < u1.length) { u1(i) += u2(i); i += 1 }
        i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        (n1 + n2, u1, s1)
      }
    val d = sum.length
    require(r >= 1 && r <= d, s"pca: r=$r out of range for d=$d")
    val mean = sum.map(_ / n)
    // cov = S/n − mean meanᵀ (population covariance; the scaling
    // cancels in the eigenvector directions)
    val cov = breeze.linalg.DenseMatrix.tabulate(d, d) { (i, j) =>
      s(i * d + j) / n - mean(i) * mean(j)
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(i => (-es.eigenvalues(i), i))
    val comps = order.take(r).map { idx =>
      val v = Array.tabulate(d)(i => es.eigenvectors(i, idx))
      // sign fix: largest-|coordinate| positive, ties lowest index
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(v(i)) > math.abs(v(best))) best = i
        i += 1
      }
      if (v(best) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(mean, comps, order.map(es.eigenvalues(_)).toArray)
  }

  /** Project (id, v) rows onto the model's components: one stateless
    * map against the broadcast d×r matrix, batched as a GEMM. Output
    * is (idCol, proj array<double> length r). */
  def project(df: DataFrame, idCol: String, vCol: String,
      model: PcaModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(vCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = bc.value
        val (d, r) = (m.d, m.r)
        // U: d×r column-major
        val U = new breeze.linalg.DenseMatrix(d, r,
          Array.tabulate(d * r)(j => m.components(j / d)(j % d)))
        it.grouped(1024).flatMap { g =>
          val batch = g.toArray
          val n = batch.length
          val X = new breeze.linalg.DenseMatrix(n, d,
            Array.tabulate(n * d) { j =>
              batch(j % n)._2(j / n) - m.mean(j / n)
            })
          val P = X * U // n×r
          batch.iterator.zipWithIndex.map { case ((id, _), row) =>
            (id, Array.tabulate(r)(c => P(row, c)))
          }
        }
      }
      .toDF(idCol, "proj")
  }

  // The s6_pca_project query entry lives in operators/IntPca.scala
  // since round 7: the integer power-iteration twin is cross-engine
  // deterministic and therefore DuckDB-oracleable, which the float
  // eigSym fit here (reassociated double partials) can never be.
  // This Breeze path remains the library API (Graft.vectors
  // .pcaProject); IntPcaSpec pins the two against each other.
}
