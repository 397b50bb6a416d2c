package graft.generators

import graft.core.{Config, Crystal, Hashing, Lattice}

/** G1 derivative-superstructure enumeration (reference:
  * database/enumerated.py:33–129 params — sizes, lattice, concs,
  * keep_supers; setup 354–448 delegates the kernel to the compiled
  * `phenum` engine; euid dedup 406–427).
  *
  * From-scratch kernel with full symmetry reduction, following the
  * published derivative-structure algorithm (Hart & Forcade, "Algorithm
  * for generating derivative structures", PRB 77, 224115 (2008)):
  *
  *  1. sublattices of index n = lower-triangular HNFs of determinant
  *     n (Crystal.hnfsOfDeterminant), reduced to equivalence classes
  *     under the parent lattice's point group (two HNFs are the same
  *     superlattice if a rotation maps one onto the other);
  *  2. labelings of the n sites over the species set, canonicalized
  *     under the full space group of the empty superlattice — the
  *     superlattice-preserving point-group rotations combined with
  *     the n internal translations (the euid analog);
  *  3. superperiodic labelings (fixed by a nontrivial pure
  *     translation) dropped unless `keepSupers` — they are duplicates
  *     of smaller cells (enumerated.py keep_supers);
  *  4. optional concentration restrictions: per-species rational
  *     ranges `(min, max, denom)` exactly as the reference's `concs`
  *     n×3 lists (enumerated.py:211–229).
  *
  * Counts validated against the reference's own enum.x output tables
  * (templates/struct_enum.out_2_{fcc,bcc,sc}, consumed by
  * fitting/mtp.py:108–136): binary fcc sizes 1–4 → 2, 2, 6, 19.
  *
  * Spark shape: the (size × HNF-class) grid is the distributed axis —
  * a `flatMap` over a grid DataFrame; labelings never leave the task
  * that owns their HNF class.
  */
object Enumerated {

  /** 1-atom primitive cells (enumerated.py:155–167). */
  def primitiveCell(lattice: String, a: Double): (Lattice.Mat3, Seq[Seq[Double]]) =
    lattice match {
      case "sc" => (Seq(Seq(a, 0, 0), Seq(0, a, 0), Seq(0, 0, a)),
        Seq(Seq(0.0, 0.0, 0.0)))
      case "fcc" => (Seq(Seq(0, a / 2, a / 2), Seq(a / 2, 0, a / 2),
        Seq(a / 2, a / 2, 0)), Seq(Seq(0.0, 0.0, 0.0)))
      case "bcc" => (Seq(Seq(-a / 2, a / 2, a / 2), Seq(a / 2, -a / 2, a / 2),
        Seq(a / 2, a / 2, -a / 2)), Seq(Seq(0.0, 0.0, 0.0)))
      case other => throw new IllegalArgumentException(s"lattice $other")
    }

  private val tol = 1e-6

  /** The 48 cubic point-group operations (signed permutation
    * matrices) — candidate rotations; each is kept only where it
    * actually preserves the parent lattice. */
  val cubicOps: Seq[Lattice.Mat3] = for {
    perm <- Seq(0, 1, 2).permutations.toSeq
    s0 <- Seq(1.0, -1.0); s1 <- Seq(1.0, -1.0); s2 <- Seq(1.0, -1.0)
  } yield {
    val signs = Seq(s0, s1, s2)
    (0 until 3).map(i => (0 until 3).map(j =>
      if (j == perm(i)) signs(i) else 0.0))
  }

  private def isIntegerMat(m: Lattice.Mat3): Boolean =
    m.forall(_.forall(x => math.abs(x - math.rint(x)) < tol))

  /** Rotations preserving the parent lattice: `A·Rᵀ·A⁻¹` integer
    * (A rows = lattice vectors; all 48 for sc/fcc/bcc). */
  def latticeOps(cell: Lattice.Mat3): Seq[Lattice.Mat3] = {
    val inv = Lattice.inverse(cell)
    cubicOps.filter { r =>
      isIntegerMat(Lattice.matmul(Lattice.matmul(cell, transpose(r)), inv))
    }
  }

  private def transpose(m: Lattice.Mat3): Lattice.Mat3 =
    (0 until 3).map(i => (0 until 3).map(j => m(j)(i)))

  /** Reduce det-n HNFs to one representative per point-group orbit:
    * H1 ~ H2 iff ∃R with S1·Rᵀ·S2⁻¹ integer unimodular (S = H·A). */
  def hnfClasses(cell: Lattice.Mat3, n: Long): Seq[Crystal.IMat] = {
    val ops = latticeOps(cell)
    val all = Crystal.hnfsOfDeterminant(n)
    def smat(h: Crystal.IMat): Lattice.Mat3 =
      Lattice.matmul(h.map(_.map(_.toDouble)).toSeq.map(_.toSeq), cell)
    val reps = scala.collection.mutable.ArrayBuffer[(Crystal.IMat, Lattice.Mat3)]()
    all.foreach { h =>
      val s = smat(h)
      val dup = reps.exists { case (_, sr) =>
        val srInv = Lattice.inverse(sr)
        ops.exists(r =>
          isIntegerMat(Lattice.matmul(Lattice.matmul(s, transpose(r)), srInv)))
      }
      if (!dup) reps += ((h, s))
    }
    reps.map(_._1).toSeq
  }

  final case class Enumerated(size: Int, hnfIndex: Int, labeling: String,
      config: Config)

  /** Enumerate symmetry-unique labelings for ONE (lattice, size,
    * hnf-class) cell — the per-task kernel.
    *
    * @param concs optional per-species `(min, max, denom)` rational
    *   concentration restrictions (enumerated.py concs).
    * @param keepSupers keep superperiodic labelings (enumerated.py
    *   keep_supers; default false, as the reference).
    */
  def labelingsFor(lattice: String, a: Double, species: Seq[String],
      hnf: Crystal.IMat, hnfIndex: Int,
      concs: Option[Seq[(Int, Int, Int)]] = None,
      keepSupers: Boolean = false): Seq[Enumerated] = {
    val (pcell, pbasis) = primitiveCell(lattice, a)
    val prim = Config.of(Seq("X"), pcell, pbasis)
    val sup = Generators.supercell(prim, hnf.flatten.map(_.toInt).toSeq)
    val n = sup.n
    val frac = Crystal.fractional(sup.cell, sup.positions)
    def findSite(x: Seq[Double]): Int = {
      val w = x.map(v => { val f = v - math.floor(v); if (f > 1 - tol) 0.0 else f })
      frac.indices.find { j =>
        (0 until 3).forall { k =>
          val d = math.abs(w(k) - frac(j)(k))
          math.min(d, 1.0 - d) < tol
        }
      }.getOrElse(throw new IllegalStateException("site map not closed"))
    }
    // pure internal translations as site permutations
    val trans: Seq[Seq[Int]] = frac.indices.map { t =>
      val shift = frac(t)
      frac.indices.map(i => findSite((0 until 3).map(k => frac(i)(k) + shift(k))))
    }
    // superlattice-preserving parent rotations as site permutations:
    // R qualifies if S·Rᵀ·S⁻¹ is integer (superlattice maps to itself);
    // each maps site i's cartesian position to another site mod S.
    val parentOps = latticeOps(pcell)
    val supInv = Lattice.inverse(sup.cell)
    val rotPerms: Seq[Seq[Int]] = parentOps.flatMap { r =>
      val u = Lattice.matmul(Lattice.matmul(sup.cell, transpose(r)), supInv)
      if (!isIntegerMat(u)) None
      else {
        val rt = transpose(r)
        val perm = sup.positions.map { p =>
          val rp = Lattice.rowMat(p, rt)
          findSite(Lattice.rowMat(rp, supInv))
        }
        Some(perm)
      }
    }
    // full group = {t ∘ r}: distinct compositions
    val group: Seq[Array[Int]] = (for {
      t <- trans; r <- rotPerms
    } yield r.map(t).toArray).distinctBy(_.toSeq)
    val superTrans = trans.filter(p => p != p.indices.toSeq)

    val k = species.length
    require(n < 40 && BigInt(k).pow(n) <= BigInt(4000000),
      s"labeling space k^n = $k^$n too large for exhaustive enumeration")
    val total = math.pow(k, n).toLong
    val powers = Array.iterate(1L, n)(_ * k)
    val concOk: Array[Int] => Boolean = concs match {
      case None => _ => true
      case Some(rs) =>
        require(rs.length == k, "one (min,max,denom) triple per species")
        lab => rs.zipWithIndex.forall { case ((lo, hi, denom), s) =>
          val c = lab.count(_ == s)
          lo * n <= c * denom && c * denom <= hi * n
        }
    }
    val seen = scala.collection.mutable.Set[String]()
    (0L until total).flatMap { code =>
      val lab = Array.tabulate(n)(i => ((code / powers(i)) % k).toInt)
      if (!concOk(lab)) None
      else if (!keepSupers && superTrans.exists(p => p.indices.forall(i =>
        lab(p(i)) == lab(i)))) None // duplicate of a smaller cell
      else {
        val canonical = group.map(p => p.map(lab).mkString(",")).min
        if (seen.add(canonical)) {
          val c = sup.withSpecies(lab.map(species).toSeq)
            .copy(uuid = "", groupUuid = "", configType = Some("enum"))
          Some(Enumerated(n, hnfIndex, canonical,
            c.copy(uuid = Hashing.contentHash(c))))
        } else None
      }
    }
  }

  /** Full enumeration over cell sizes [minSize, maxSize] with
    * point-group-reduced HNF classes. */
  def enumerate(lattice: String, a: Double, species: Seq[String],
      minSize: Int, maxSize: Int,
      concs: Option[Seq[(Int, Int, Int)]] = None,
      keepSupers: Boolean = false): Seq[Enumerated] = {
    val (pcell, _) = primitiveCell(lattice, a)
    for {
      n <- minSize to maxSize
      (hnf, idx) <- hnfClasses(pcell, n).zipWithIndex
      e <- labelingsFor(lattice, a, species, hnf, idx, concs, keepSupers)
    } yield e
  }
}
