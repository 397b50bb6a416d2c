package graft.core

/** Crystal-structure kernels (SURVEY §2.9 K3–K5; reference:
  * database/utility.py:240–381 `make_primitive`, 383–496
  * `hermite_normal_form`, 525–590 `decompress`).
  *
  * Pure integer/real lattice math — invoked inside `map`/`flatMap`
  * kernels, never on the driver over row data.
  */
object Crystal {

  type IMat = Array[Array[Long]]

  def idet(m: IMat): Long =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))

  /** Hermite normal form via integer column operations (K4):
    * returns (H, U) with H = A·U, U unimodular (|det U| = 1), H
    * lower-triangular with positive diagonal and 0 ≤ H(i)(j) < H(i)(i)
    * for j < i. */
  def hermiteNormalForm(a: IMat): (IMat, IMat) = {
    require(idet(a) != 0, "singular integer matrix")
    val h = a.map(_.clone())
    val u = Array(Array(1L, 0L, 0L), Array(0L, 1L, 0L), Array(0L, 0L, 1L))
    def colSwap(i: Int, j: Int): Unit = {
      for (r <- 0 until 3) {
        val t = h(r)(i); h(r)(i) = h(r)(j); h(r)(j) = t
        val s = u(r)(i); u(r)(i) = u(r)(j); u(r)(j) = s
      }
    }
    def colAdd(dst: Int, src: Int, k: Long): Unit = {
      for (r <- 0 until 3) {
        h(r)(dst) += k * h(r)(src)
        u(r)(dst) += k * u(r)(src)
      }
    }
    def colNeg(i: Int): Unit =
      for (r <- 0 until 3) { h(r)(i) = -h(r)(i); u(r)(i) = -u(r)(i) }

    for (row <- 0 until 3) {
      // euclidean reduction: zero out columns right of the pivot
      var again = true
      while (again) {
        again = false
        for (c <- row + 1 until 3 if h(row)(c) != 0) {
          if (h(row)(row) == 0) colSwap(row, c)
          else {
            val q = Math.floorDiv(h(row)(c), h(row)(row))
            colAdd(c, row, -q)
            if (h(row)(c) != 0) { colSwap(row, c); again = true }
          }
        }
      }
      if (h(row)(row) < 0) colNeg(row)
      // reduce columns left of the pivot into [0, pivot)
      for (c <- 0 until row) {
        val q = Math.floorDiv(h(row)(c), h(row)(row))
        colAdd(c, row, -q)
      }
    }
    (h, u)
  }

  /** All lower-triangular HNF matrices with determinant n — one per
    * index-n sublattice of Z³ (the sublattice enumeration underlying
    * G1; reference delegates to phenum). Rows are the basis vectors;
    * uniqueness of the row span requires each subdiagonal entry to be
    * reduced modulo the diagonal entry of its COLUMN (row ops change
    * d by multiples of a, e by a, f by b), so d,e ∈ [0,a), f ∈ [0,b).
    * Count per diagonal (a,b,c) is a²·b; Σ over abc=n matches the
    * number-theoretic sublattice count. */
  def hnfsOfDeterminant(n: Long): Seq[IMat] =
    for {
      a <- 1L to n if n % a == 0
      rem = n / a
      b <- 1L to rem if rem % b == 0
      c = rem / b
      d <- 0L until a
      e <- 0L until a
      f <- 0L until b
    } yield Array(Array(a, 0L, 0L), Array(d, b, 0L), Array(e, f, c))

  private val tol = 1e-6

  private def wrap01(x: Double): Double = {
    val f = x - math.floor(x)
    if (f > 1.0 - tol) 0.0 else f
  }

  /** Fractional coordinates of cartesian positions in `cell`. */
  def fractional(cell: Lattice.Mat3, pos: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val inv = Lattice.inverse(cell)
    pos.map(p => Lattice.rowMat(p, inv).map(wrap01))
  }

  private def sameSite(a: Seq[Double], b: Seq[Double]): Boolean =
    (0 until 3).forall { i =>
      val d = math.abs(a(i) - b(i))
      math.min(d, 1.0 - d) < tol
    }

  /** K3 make_primitive: find the smallest cell reproducing the
    * structure. Candidate translations are fractional differences to
    * atoms of the least-common species; a valid translation maps every
    * atom onto an equal-species atom. The primitive cell is built from
    * three shortest independent lattice vectors of the translation
    * group (reference: database/utility.py:240–381). */
  def makePrimitive(c: Config): Config = {
    val frac = fractional(c.cell, c.positions)
    val species = c.species
    val rarest = species.groupBy(identity).minBy { case (s, xs) => (xs.length, s) }._1
    val anchorIdx = species.indexOf(rarest)
    val anchor = frac(anchorIdx)
    val candidates = frac.indices
      .filter(i => species(i) == rarest)
      .map(i => (0 until 3).map(k => wrap01(frac(i)(k) - anchor(k))))
      .filterNot(t => t.forall(x => math.abs(x) < tol))
    val valid = candidates.filter { t =>
      frac.indices.forall { i =>
        val shifted = (0 until 3).map(k => wrap01(frac(i)(k) + t(k)))
        frac.indices.exists(j => species(j) == species(i) && sameSite(shifted, frac(j)))
      }
    }
    if (valid.isEmpty) return c
    // translation lattice = cell rows scaled: full set = valid ∪ unit vectors
    val unitT = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0))
    val allT = (valid ++ unitT).map(t => Lattice.rowMat(t, c.cell))
    // pick 3 shortest linearly independent translations (greedy)
    val sorted = allT.sortBy(v => v.map(x => x * x).sum)
    val basis = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    for (v <- sorted if basis.length < 3) {
      val candidateBasis = basis :+ v
      if (candidateBasis.length < 3 || {
        val m = candidateBasis.toSeq
        math.abs(Lattice.det(Seq(m(0), m(1), m(2)))) > tol
      }) {
        if (candidateBasis.length < 3) {
          // reject collinear/coplanar additions
          val indep = basis.length match {
            case 0 => v.map(x => x * x).sum > tol
            case 1 =>
              val c0 = basis(0)
              val cross = Seq(
                c0(1) * v(2) - c0(2) * v(1),
                c0(2) * v(0) - c0(0) * v(2),
                c0(0) * v(1) - c0(1) * v(0))
              cross.map(x => x * x).sum > tol
            case _ => true
          }
          if (indep) basis += v
        } else basis += v
      }
    }
    if (basis.length < 3) return c
    val newCell: Lattice.Mat3 = Seq(basis(0), basis(1), basis(2))
    val ratio = math.abs(Lattice.det(c.cell) / Lattice.det(newCell))
    val nPrim = math.round(c.n / ratio).toInt
    if (nPrim >= c.n) return c
    // keep atoms whose fractional coords (in the new cell) are unique
    val newFrac = fractional(newCell, c.positions)
    val kept = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- newFrac.indices) {
      if (!kept.exists(j => species(j) == species(i) && sameSite(newFrac(j), newFrac(i))))
        kept += i
    }
    val keptIdx = kept.toSeq
    val cart = keptIdx.map(i => Lattice.rowMat(newFrac(i), newCell))
    Config.of(keptIdx.map(species), newCell, cart,
      groupUuid = c.uuid, configType = Some("primitive"))
  }

  /** K5 decompress: rebuild a crystal from (primitive cell, basis
    * fractional positions, per-site species-int types, integer HNF)
    * (reference: database/utility.py:525–590). */
  def decompress(primCell: Lattice.Mat3, basisFrac: Seq[Seq[Double]],
      types: Seq[Int], typeNames: Map[Int, String], hnf: IMat): Config = {
    val basisCart = basisFrac.map(f => Lattice.rowMat(f, primCell))
    val prim = Config.of(types.map(typeNames), primCell, basisCart)
    Generators.supercellFromIntMatrix(prim, hnf.map(_.map(_.toInt).toSeq).toSeq)
  }

  // bridge so decompress can reuse the supercell kernel
  private object Generators {
    def supercellFromIntMatrix(c: Config, m: Seq[Seq[Int]]): Config =
      graft.generators.Generators.supercell(c, m.flatten)
  }
}
