package graft.generators

import breeze.linalg.{eigSym, DenseMatrix}
import graft.core.{Config, Hashing}
import graft.calculators.Calculator

/** Frozen-phonon Hessian pipeline (SURVEY §2.2 G7/G8; reference:
  * database/hessian.py:622–680 displacement generation via phonopy,
  * 206–271 eigen-explode, 37–62 roll/unroll).
  *
  * G7: central-difference displacements — for each atom i and
  * direction a, two configs at ±δ. After the calculator fills forces,
  * G8 assembles H[ia, jb] = −(F⁺_jb − F⁻_jb)/(2δ), symmetrizes,
  * diagonalizes (Breeze eigSym = LAPACK dsyevd), and emits one
  * pseudo-config per eigenpair above the near-zero cutoff
  * (hessian.py:250–253: |λ| ≥ 1e-5 and λ > 0).
  *
  * Spark surface: G7 is a `flatMap`, G8 a `groupByKey(seed).mapGroups`
  * — the per-seed force matrix is tiny (3n × 3n) even when the seed
  * table is huge, so the kernel parallelizes across seeds.
  */
object Hessian {

  final case class Displacement(seedUuid: String, atom: Int, dir: Int,
      sign: Int, delta: Double, config: Config)

  /** G7: emit the 6n displaced configs for one seed. */
  def displacements(seed: Config, delta: Double = 0.01): Seq[Displacement] =
    for {
      i <- 0 until seed.n
      a <- 0 until 3
      s <- Seq(1, -1)
    } yield {
      val pos = seed.positions.zipWithIndex.map { case (p, idx) =>
        if (idx == i) p.updated(a, p(a) + s * delta) else p
      }
      val c = seed.copy(uuid = "", groupUuid = seed.uuid, positions = pos,
        energy = None, force = None, configType = Some("hessian_disp"),
        params = seed.params ++ Map(
          "disp_atom" -> i.toString, "disp_dir" -> a.toString,
          "disp_sign" -> s.toString, "disp_delta" -> delta.toString))
      Displacement(seed.uuid, i, a, s, delta,
        c.copy(uuid = Hashing.contentHash(c)))
    }

  /** G8: assemble + diagonalize from calculated displacements; emit
    * eigen pseudo-configs carrying `{key}_hessian` eigenvalue and the
    * eigenvector as a property (hessian.py:255–261). */
  def eigenConfigs(seed: Config, calculated: Seq[Displacement],
      eigCutoff: Double = 1e-5): Seq[Config] = {
    val dim = 3 * seed.n
    val h = DenseMatrix.zeros[Double](dim, dim)
    val byKey = calculated.groupBy(d => (d.atom, d.dir)).toSeq.sortBy(_._1)
    byKey.foreach { case ((i, a), two) =>
      val plus = two.find(_.sign == 1).get
      val minus = two.find(_.sign == -1).get
      val fp = plus.config.force.get
      val fm = minus.config.force.get
      val row = i * 3 + a
      for (j <- 0 until seed.n; b <- 0 until 3)
        h(row, j * 3 + b) = -(fp(j)(b) - fm(j)(b)) / (2 * plus.delta)
    }
    val sym = (h + h.t) / 2.0 // symmetrize (io.py:42–55 order_stress analog)
    val es = eigSym(sym)
    (0 until dim).flatMap { e =>
      val lam = es.eigenvalues(e)
      if (lam > 0 && math.abs(lam) >= eigCutoff) { // hessian.py:250–253
        val vec = (0 until dim).map(r => es.eigenvectors(r, e))
        val c = seed.copy(uuid = "", groupUuid = seed.uuid,
          configType = Some("hessian_eig"),
          params = seed.params + ("stub_hessian" -> lam.toString),
          properties = seed.properties +
            ("hessian_eigvec" -> vec))
        Some(c.copy(uuid = Hashing.contentHash(c)))
      } else None
    }
  }

  /** Convenience: full G7→calc→G8 for one seed with a calculator. */
  def forSeed(seed: Config, calc: Calculator,
      delta: Double = 0.01): Seq[Config] = {
    val disp = displacements(seed, delta)
      .map(d => d.copy(config = calc.extract(d.config)))
    eigenConfigs(seed, disp)
  }
}
