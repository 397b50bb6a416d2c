package graft.core

/** K-point grid generation (SURVEY §2.9 K8; reference:
  * kpoints.py:24–39 gamma-only + KPOINTS file rendering; the
  * Mueller-server and GRkgridgen paths are remote/Fortran services —
  * the in-engine equivalent is the standard Monkhorst-Pack /
  * Γ-centered grid sized from a linear k-point density).
  */
object Kpoints {

  /** Reciprocal lattice vectors (rows), 2π convention. */
  def reciprocal(cell: Lattice.Mat3): Lattice.Mat3 = {
    val inv = Lattice.inverse(cell)
    // b_i = 2π (A⁻¹)ᵀ rows
    (0 until 3).map(i => (0 until 3).map(j => 2 * math.Pi * inv(j)(i)))
  }

  /** Grid divisions from a target linear density (points per Å⁻¹):
    * nᵢ = max(1, round(|bᵢ| · density)). */
  def divisions(cell: Lattice.Mat3, density: Double): Seq[Int] =
    reciprocal(cell).map { b =>
      val len = math.sqrt(b.map(x => x * x).sum)
      math.max(1, math.round(len * density).toInt)
    }

  /** Γ-centered fractional k-points with weights (dedup by inversion
    * symmetry k ≡ −k, weights doubled for the paired points). */
  def gammaCentered(n: Seq[Int]): Seq[(Seq[Double], Double)] = {
    // signed integer ratio BEFORE dividing: (2/3 − 1) and −(1/3) differ
    // in their last float bit, which would break inversion matching
    def frac(i: Int, d: Int): Double =
      (if (i * 2 > d) i - d else i).toDouble / d
    val raw = for {
      i <- 0 until n(0); j <- 0 until n(1); k <- 0 until n(2)
    } yield Seq(frac(i, n(0)), frac(j, n(1)), frac(k, n(2)))
    val total = raw.length.toDouble
    val seen = scala.collection.mutable.LinkedHashMap[Seq[Double], Double]()
    raw.foreach { kp =>
      // inverse wrapped back into (−0.5, 0.5]: −0.5 ≡ 0.5 (mod 1)
      val neg = kp.map { x =>
        val w = if (x == 0.0) 0.0 else -x
        if (w <= -0.5 + 1e-12) w + 1.0 else w
      }
      if (seen.contains(kp)) seen(kp) += 1.0 / total
      else if (seen.contains(neg)) seen(neg) += 1.0 / total
      else seen(kp) = 1.0 / total
    }
    seen.toSeq
  }

  /** Monkhorst–Pack fractional k-points with inversion-deduped
    * weights (the classic shifted grid, Monkhorst & Pack, PRB 13,
    * 5188 (1976): kᵣ = (2r − q − 1)/2q — Γ is excluded for even
    * divisions, which is the point of the scheme). */
  def monkhorstPack(n: Seq[Int]): Seq[(Seq[Double], Double)] = {
    def frac(r: Int, q: Int): Double = (2.0 * (r + 1) - q - 1) / (2.0 * q)
    val raw = for {
      i <- 0 until n(0); j <- 0 until n(1); k <- 0 until n(2)
    } yield Seq(frac(i, n(0)), frac(j, n(1)), frac(k, n(2)))
    val total = raw.length.toDouble
    val seen = scala.collection.mutable.LinkedHashMap[Seq[Double], Double]()
    raw.foreach { kp =>
      val neg = kp.map(x => if (x == 0.0) 0.0 else -x)
      if (seen.contains(kp)) seen(kp) += 1.0 / total
      else if (seen.contains(neg)) seen(neg) += 1.0 / total
      else seen(kp) = 1.0 / total
    }
    seen.toSeq
  }

  /** Render a VASP-style KPOINTS file (kpoints.py rendering analog). */
  def kpointsFile(n: Seq[Int], gamma: Boolean = true): String =
    s"""Automatic mesh
       |0
       |${if (gamma) "Gamma" else "Monkhorst-Pack"}
       |${n(0)} ${n(1)} ${n(2)}
       |0 0 0
       |""".stripMargin
}
