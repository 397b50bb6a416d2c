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
  * hcp (2-atom basis) is supported through the same kernel: site
  * groups are built as {R|τ} with τ swept over site differences, so
  * nonsymmorphic operations (the hcp 6₃ screw, the z→−z mirror with
  * its fractional translation) participate. Size-1 counts match the
  * reference's struct_enum.out_2_hcp (3: pure A, pure B, alternating);
  * at size ≥ 2 this kernel counts FEWER structures than that table
  * (10 vs 12 at two cells) because the full space group merges
  * labelings the table lists separately — e.g. AABB vs ABBA c-axis
  * stackings, which the 6₃ screw maps onto each other (verifiable by
  * hand: the screw advances every close-packed layer by one position).
  * The stricter canon means no two emitted hcp structures are
  * isometric, which is the property downstream dedup relies on.
  *
  * The fixture's surplus rows are provably NOT a coarser symmetry
  * convention that could be reproduced by weakening this kernel's
  * group. Two facts, both checkable against the fixture by hand:
  * (1) its own header says it came from enum.x's "Random structure
  * enumeration" mode with the "Equivalency list … Not used"; (2) at
  * size 3 it lists 10 labelings for the √3×√3·R30 in-plane class but
  * 13 for the c-sheared R30 class, even though {C3|0} is a symmetry
  * of BOTH superlattices that acts nontrivially on both — no orbit
  * partition under ANY affine-operation group can produce that
  * asymmetry (we verified: translations+inversion gives 13/13 → sizes
  * 1–4 = 3/12/65/381; adding any consistent C3 gives 7/7 → 53 total;
  * the fixture's 3/12/62/356 sits strictly between and matches
  * neither). The surplus rows are duplicate crystals produced by
  * enum.x's g-space member-ordering dedup quirks, so we keep the
  * full-space-group canon rather than chase bit-parity with them.
  *
  * Spark shape: the (size × HNF-class) grid is the distributed axis —
  * a `flatMap` over a grid DataFrame; labelings never leave the task
  * that owns their HNF class.
  */
object Enumerated {

  /** Primitive cells (enumerated.py:155–167): 1-atom sc/fcc/bcc and
    * the 2-atom hcp basis (ideal c/a). */
  def primitiveCell(lattice: String, a: Double): (Lattice.Mat3, Seq[Seq[Double]]) =
    lattice match {
      case "sc" => (Seq(Seq(a, 0, 0), Seq(0, a, 0), Seq(0, 0, a)),
        Seq(Seq(0.0, 0.0, 0.0)))
      case "fcc" => (Seq(Seq(0, a / 2, a / 2), Seq(a / 2, 0, a / 2),
        Seq(a / 2, a / 2, 0)), Seq(Seq(0.0, 0.0, 0.0)))
      case "bcc" => (Seq(Seq(-a / 2, a / 2, a / 2), Seq(a / 2, -a / 2, a / 2),
        Seq(a / 2, a / 2, -a / 2)), Seq(Seq(0.0, 0.0, 0.0)))
      case "hcp" =>
        val c = a * math.sqrt(8.0 / 3)
        val cell = Seq(Seq(a, 0, 0),
          Seq(-a / 2, a * math.sqrt(3) / 2, 0), Seq(0, 0, c))
        val frac2 = Seq(1.0 / 3, 2.0 / 3, 0.5)
        (cell, Seq(Seq(0.0, 0.0, 0.0), Lattice.rowMat(frac2, cell)))
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

  /** The 24 D6h operations (rotations about z by 60° steps × y-mirror
    * × z-mirror) — candidates for hexagonal parents. */
  val hexOps: Seq[Lattice.Mat3] = for {
    k <- 0 until 6
    my <- Seq(1.0, -1.0); mz <- Seq(1.0, -1.0)
  } yield {
    val (c, s) = (math.cos(k * math.Pi / 3), math.sin(k * math.Pi / 3))
    // Rz(θ) · diag(1, my, mz)
    Seq(Seq(c, -s * my, 0.0), Seq(s, c * my, 0.0), Seq(0.0, 0.0, mz))
  }

  /** Rotations preserving the parent lattice: `A·Rᵀ·A⁻¹` integer
    * (A rows = lattice vectors; 48 cubic + 24 hexagonal candidates —
    * the survivors are the lattice's point group). */
  def latticeOps(cell: Lattice.Mat3): Seq[Lattice.Mat3] = {
    val inv = Lattice.inverse(cell)
    (cubicOps ++ hexOps).filter { r =>
      isIntegerMat(Lattice.matmul(Lattice.matmul(cell, transpose(r)), inv))
    }.distinctBy(_.map(_.map(x => math.rint(x * 1e9) / 1e9)))
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

  /** Arrow displacement directions for a lattice: the orbit closure
    * of the +x and +z axes under the parent point group — closed
    * under every group operation by construction (cubic parents → the
    * 6 signed axes; hexagonal parents → 6 in-plane directions at 60°
    * steps plus ±z). phenum attaches these as displacement
    * decorations (enumerated.py:46–77 arrows/displace; the
    * `incl_arrows` lattice.in flag at :336–341). */
  def arrowDirections(lattice: String): Seq[Seq[Double]] = {
    val (pcell, _) = primitiveCell(lattice, 1.0)
    val ops = latticeOps(pcell)
    val seeds = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0))
    val out = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    for (s <- seeds; r <- ops) {
      val d = Lattice.rowMat(s, transpose(r))
      if (!out.exists(e => (0 until 3).forall(t => math.abs(e(t) - d(t)) < tol)))
        out += d
    }
    out.toSeq
  }

  /** Enumerate symmetry-unique labelings for ONE (lattice, size,
    * hnf-class) cell — the per-task kernel.
    *
    * @param concs optional per-species `(min, max, denom)` rational
    *   concentration restrictions (enumerated.py concs).
    * @param keepSupers keep superperiodic labelings (enumerated.py
    *   keep_supers; default false, as the reference).
    * @param arrows optional per-species arrow fractions ≤ 1
    *   (enumerated.py:225–247 _get_arrows): ⌊fraction·count_s⌋ atoms
    *   of species s carry a displacement arrow pointing along one of
    *   [[arrowDirections]]. Decorated structures are deduplicated
    *   under the labeling's STABILIZER subgroup with each operation
    *   acting jointly on sites (permutation) and directions
    *   (rotation) — orbit-stabilizer gives exactly one representative
    *   per symmetry class of (labeling, arrow) pairs.
    * @param displace Cartesian displacement magnitude applied along
    *   each arrow (enumerated.py displace; default 0.0 as the
    *   reference — decorations stay distinct via the euid-style
    *   uuid even at zero displacement).
    */
  /** The site-symmetry data of one empty decorated superlattice: the
    * supercell config, the space-group site/rotation pairs, the bare
    * site-permutation group, and the nontrivial pure lattice
    * translations (the superperiodic filter). Extracted from
    * [[labelingsFor]] so the labeling-canon group can be materialized
    * as a fixture relation (the g1 oracle twin's input — r8). */
  final case class SiteSymmetry(sup: Config,
      groupOps: Seq[(Array[Int], Lattice.Mat3)],
      group: Seq[Array[Int]], superTrans: Seq[Seq[Int]])

  def siteSymmetry(lattice: String, a: Double,
      hnf: Crystal.IMat): SiteSymmetry = {
    val (pcell, pbasis) = primitiveCell(lattice, a)
    val prim = Config.of(Seq.fill(pbasis.length)("X"), pcell, pbasis)
    val spec = hnf.flatten.map(_.toInt).toSeq
    val sup = Generators.supercell(prim, spec)
    val n = sup.n
    val frac = Crystal.fractional(sup.cell, sup.positions)
    val supInv = Lattice.inverse(sup.cell)
    def findSiteOpt(x: Seq[Double]): Option[Int] = {
      val w = x.map(v => { val f = v - math.floor(v); if (f > 1 - tol) 0.0 else f })
      frac.indices.find { j =>
        (0 until 3).forall { k =>
          val d = math.abs(w(k) - frac(j)(k))
          math.min(d, 1.0 - d) < tol
        }
      }
    }
    def fracOf(cart: Seq[Double]): Seq[Double] = Lattice.rowMat(cart, supInv)
    // pure parent-LATTICE translations (NOT arbitrary site shifts —
    // with a multi-atom basis the inter-sublattice offset is not a
    // translation of the lattice): the |det hnf| lattice points of the
    // supercell, obtained from a 1-atom twin of the same cell.
    val latticePoints = Generators.supercell(
      Config.of(Seq("X"), pcell, Seq(Seq(0.0, 0.0, 0.0))), spec).positions
    val trans: Seq[Seq[Int]] = latticePoints.map { tvec =>
      frac.indices.map { i =>
        findSiteOpt(fracOf((0 until 3).map(k => sup.positions(i)(k) + tvec(k))))
          .getOrElse(throw new IllegalStateException("translation not closed"))
      }
    }
    // space-group operations {R|τ} of the EMPTY decorated lattice:
    // R must preserve the superlattice (S·Rᵀ·S⁻¹ integer); τ
    // candidates are p_j − R·p_0 for every site j (this sweeps the
    // fractional translations of nonsymmorphic groups — hcp's 6₃
    // screw — together with all lattice translations); an (R, τ) is
    // kept when it permutes the site set bijectively.
    val parentOps = latticeOps(pcell)
    // (site permutation, rotation) pairs — the rotation part acts on
    // arrow directions when arrow decorations are enumerated
    val groupOps: Seq[(Array[Int], Lattice.Mat3)] = (for {
      r <- parentOps
      u = Lattice.matmul(Lattice.matmul(sup.cell, transpose(r)), supInv)
      if isIntegerMat(u)
      rt = transpose(r)
      rotated = sup.positions.map(p => Lattice.rowMat(p, rt))
      j <- frac.indices
      tau = (0 until 3).map(k => sup.positions(j)(k) - rotated(0)(k))
      perm = rotated.map(rp =>
        findSiteOpt(fracOf((0 until 3).map(k => rp(k) + tau(k)))))
      if perm.forall(_.isDefined)
      p = perm.map(_.get)
      if p.distinct.length == n
    } yield (p.toArray, r)).distinctBy { case (p, r) =>
      (p.toSeq, r.map(_.map(x => math.rint(x * 1e6))))
    }
    val group: Seq[Array[Int]] = groupOps.map(_._1).distinctBy(_.toSeq)
    val superTrans = trans.filter(p => p != p.indices.toSeq)
    SiteSymmetry(sup, groupOps, group, superTrans)
  }

  def labelingsFor(lattice: String, a: Double, species: Seq[String],
      hnf: Crystal.IMat, hnfIndex: Int,
      concs: Option[Seq[(Int, Int, Int)]] = None,
      keepSupers: Boolean = false,
      arrows: Option[Seq[Double]] = None,
      displace: Double = 0.0): Seq[Enumerated] = {
    val SiteSymmetry(sup, groupOps, group, superTrans) =
      siteSymmetry(lattice, a, hnf)
    val n = sup.n

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
    // arrow machinery (built only when requested): direction list +
    // per-op direction permutation (rotation part acting on arrows)
    val dirs: Seq[Seq[Double]] =
      if (arrows.isDefined) arrowDirections(lattice) else Nil
    val opsWithDirPerm: Seq[(Array[Int], Array[Int])] =
      if (arrows.isEmpty) Nil
      else groupOps.map { case (p, r) =>
        val rt = transpose(r)
        val dp = dirs.map { d =>
          val rd = Lattice.rowMat(d, rt)
          val idx = dirs.indexWhere(e =>
            (0 until 3).forall(t => math.abs(e(t) - rd(t)) < tol))
          require(idx >= 0, "direction set not closed under the group")
          idx
        }.toArray
        // the site perm acts as g⁻¹ (L'(j) = L(σ(j)), matching the
        // labeling canon), so the direction part must be R⁻¹ too —
        // invert dp so the pair (p, dpInv) is one group action
        val dpInv = new Array[Int](dp.length)
        dp.indices.foreach(x => dpInv(dp(x)) = x)
        (p, dpInv)
      }

    /** All decorated variants of one surviving labeling: choose
      * ⌊fraction·count_s⌋ arrowed sites per species × a direction
      * each, deduplicated under the labeling's stabilizer acting
      * jointly on sites and directions. */
    def arrowVariants(lab: Array[Int], canonical: String,
        base: Config): Seq[Enumerated] = {
      val fr = arrows.get
      require(fr.length == k, "one arrow fraction per species")
      require(fr.forall(f => f >= 0 && f <= 1), "arrow fractions must be ≤ 1")
      val stab = opsWithDirPerm.filter { case (p, _) =>
        p.indices.forall(i => lab(p(i)) == lab(i))
      }
      val perSpecies: Seq[Seq[Map[Int, Int]]] = (0 until k).map { s =>
        val sites = lab.indices.filter(lab(_) == s)
        val m = math.floor(fr(s) * sites.length).toInt
        if (m == 0) Seq(Map.empty[Int, Int])
        else sites.combinations(m).toSeq.flatMap { subset =>
          def rec(i: Int): Seq[List[(Int, Int)]] =
            if (i == m) Seq(Nil)
            else for { d <- dirs.indices.toList; rest <- rec(i + 1) }
              yield (subset(i), d) :: rest
          rec(0).map(_.toMap)
        }
      }
      val nChoices = perSpecies.map(_.size.toLong).product
      require(nChoices <= 500000L,
        s"arrow decoration space $nChoices too large for exhaustive walk")
      val assignments: Seq[Array[Int]] = perSpecies
        .foldLeft(Seq(Map.empty[Int, Int]))((acc, ch) =>
          for (m0 <- acc; m1 <- ch) yield m0 ++ m1)
        .map(m => Array.tabulate(n)(i => m.getOrElse(i, -1)))
      val seenA = scala.collection.mutable.Set[String]()
      assignments.flatMap { av =>
        val canonA = stab.map { case (p, dp) =>
          p.indices.map { j =>
            val x = av(p(j)); if (x < 0) -1 else dp(x)
          }.mkString(",")
        }.min
        if (seenA.add(canonA)) {
          val pos = base.positions.zipWithIndex.map { case (p0, i) =>
            if (av(i) < 0 || displace == 0.0) p0
            else (0 until 3).map(t => p0(t) + displace * dirs(av(i))(t))
          }
          val c = base.copy(positions = pos)
          // euid analog: the arrow decoration enters the uuid even at
          // displace = 0 (the reference's euids stay distinct because
          // they hash the enum record, not the coordinates)
          Some(Enumerated(n, hnfIndex, s"$canonical|a:$canonA",
            c.copy(uuid = Hashing.sha1Hex(Hashing.contentHash(c) + "|a:" + canonA))))
        } else None
      }
    }

    val seen = scala.collection.mutable.Set[String]()
    (0L until total).flatMap { code =>
      val lab = Array.tabulate(n)(i => ((code / powers(i)) % k).toInt)
      if (!concOk(lab)) Nil
      else if (!keepSupers && superTrans.exists(p => p.indices.forall(i =>
        lab(p(i)) == lab(i)))) Nil // duplicate of a smaller cell
      else {
        val canonical = group.map(p => p.map(lab).mkString(",")).min
        if (seen.add(canonical)) {
          val c = sup.withSpecies(lab.map(species).toSeq)
            .copy(uuid = "", groupUuid = "", configType = Some("enum"))
          if (arrows.isEmpty)
            Seq(Enumerated(n, hnfIndex, canonical,
              c.copy(uuid = Hashing.contentHash(c))))
          else arrowVariants(lab, canonical, c)
        } else Nil
      }
    }
  }

  /** Full enumeration over cell sizes [minSize, maxSize] with
    * point-group-reduced HNF classes. */
  def enumerate(lattice: String, a: Double, species: Seq[String],
      minSize: Int, maxSize: Int,
      concs: Option[Seq[(Int, Int, Int)]] = None,
      keepSupers: Boolean = false,
      arrows: Option[Seq[Double]] = None,
      displace: Double = 0.0): Seq[Enumerated] = {
    val (pcell, _) = primitiveCell(lattice, a)
    for {
      n <- minSize to maxSize
      (hnf, idx) <- hnfClasses(pcell, n).zipWithIndex
      e <- labelingsFor(lattice, a, species, hnf, idx, concs, keepSupers,
        arrows, displace)
    } yield e
  }

  /** `nconfigs` random-sample semantics (enumerated.py:354–448): the
    * reference loops phenum with re-seeded attempts until `nconfigs`
    * UNIQUE euids accumulate (euid-dedup at :406–427). The
    * deterministic distributed equivalent needs no retry loop —
    * enumerated structures are already unique, so a keyed-digest rank
    * (sha1 of seed:uuid) selects a pinned-seed pseudo-random sample
    * of exactly `nconfigs`; on a cluster this is the orderBy(digest)
    * + limit TakeOrdered shape (MaterialsOps.g1EnumSampled). */
  def enumerateSample(lattice: String, a: Double, species: Seq[String],
      minSize: Int, maxSize: Int, nconfigs: Int, ranSeed: Long,
      concs: Option[Seq[(Int, Int, Int)]] = None,
      keepSupers: Boolean = false,
      arrows: Option[Seq[Double]] = None,
      displace: Double = 0.0): Seq[Enumerated] =
    enumerate(lattice, a, species, minSize, maxSize, concs, keepSupers,
      arrows, displace)
      .sortBy(e => Hashing.sha1Hex(s"$ranSeed:${e.config.uuid}"))
      .take(nconfigs)
}
