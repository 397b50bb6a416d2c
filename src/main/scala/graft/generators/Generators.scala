package graft.generators

import scala.util.Random
import graft.core.{Config, Formula, Hashing, Lattice, Rng}
import graft.sources.Xdatcar

/** Row-producing generators (SURVEY §2.2). Each is a pure function
  * `Config => Seq[Config]` keyed by (globalSeed, seed-config uuid) —
  * the Spark surface applies them as `Dataset.flatMap`, so generation
  * scales with the seed table and replays identically under any
  * partitioning (Rng discipline, SURVEY §4).
  *
  * Dedup is NOT done here: generators emit candidates with
  * content-hash uuids; the relational layer anti-joins them against
  * the already-seen set (D1–D6), exactly like the reference's
  * euid/suid/vuid guards.
  */
object Generators {

  // ------------------------------------------------------------ G2

  /** Random unique species substitutions honoring target stoichiometry
    * (reference: database/substitution.py:168–236 `_set_stoichiometry`,
    * 280–291 `_get_substitution`).
    *
    * @param stoich  element → fraction; fractions must sum to 1.
    */
  def substitution(seedCfg: Config, stoich: Map[String, Double],
      nconfigs: Int, ranSeed: Long, maxAttempts: Int = 1000): Seq[Config] = {
    val total = stoich.values.sum
    require(math.abs(total - 1.0) < 1e-9,
      s"stoichiometry fractions must sum to 1, got $total") // substitution.py:176
    val n = seedCfg.n
    // largest-remainder apportionment of n atoms to elements
    val quota = stoich.toSeq.sortBy(_._1).map { case (el, f) => (el, f * n) }
    val base = quota.map { case (el, q) => (el, q.toInt) }
    val rem = n - base.map(_._2).sum
    val order = quota.zip(base).sortBy { case ((_, q), (_, b)) => -(q - b) }
    val counts = order.zipWithIndex.map { case (((el, _), (_, b)), i) =>
      (el, if (i < rem) b + 1 else b)
    }.toMap
    val pool: Seq[String] = counts.toSeq.sortBy(_._1)
      .flatMap { case (el, c) => Seq.fill(c)(el) }
    val r = Rng.forKey(ranSeed, s"sub:${seedCfg.uuid}")
    val seen = scala.collection.mutable.Set[Seq[String]]()
    var out = Vector.empty[Config]
    var attempts = 0
    while (out.length < nconfigs && attempts < maxAttempts) {
      attempts += 1
      val assignment = Rng.shuffle(pool, r)
      if (seen.add(assignment))
        out :+= seedCfg.withSpecies(assignment).copy(
          uuid = "", configType = Some("sub"), groupUuid = seedCfg.uuid)
          .pipe(c => c.copy(uuid = Hashing.contentHash(c)))
    }
    out
  }

  // ------------------------------------------------------------ G3

  /** Vacancy generator: delete `ceil(n·vacPerAtom)` random atom
    * indices per output config; exhaustive combinations when the
    * count is small, rejection sampling otherwise (reference:
    * database/vacancy.py:108–164, 268–318). */
  def vacancy(seedCfg: Config, vacPerAtom: Double, nconfigs: Int,
      ranSeed: Long): Seq[Config] = {
    val n = seedCfg.n
    val k = math.max(1, math.ceil(n * vacPerAtom).toInt)
    require(k < n, s"vacancy count $k must be < natoms $n")
    val r = Rng.forKey(ranSeed, s"vac:${seedCfg.uuid}")
    val nCombs = combinations(n, k)
    val removals: Seq[Seq[Int]] =
      if (nCombs <= 1000) // exhaustive path (vacancy.py:130–141)
        Rng.shuffle((0 until n).combinations(k).map(_.toSeq).toSeq, r)
          .take(nconfigs)
      else {
        val seen = scala.collection.mutable.Set[Seq[Int]]()
        while (seen.size < nconfigs)
          seen.add(Rng.shuffle(0 until n, r).take(k).sorted)
        seen.toSeq.sorted(Ordering.Implicits.seqOrdering[Seq, Int])
      }
    removals.map { rm =>
      val keep = (0 until n).filterNot(rm.contains)
      val c = seedCfg.copy(
        uuid = "",
        groupUuid = seedCfg.uuid,
        n = keep.length,
        species = keep.map(seedCfg.species),
        symbols = Formula.compress(keep.map(seedCfg.species)),
        positions = keep.map(seedCfg.positions),
        force = None, energy = None,
        configType = Some("vac"),
        params = seedCfg.params + ("removed" -> rm.mkString(",")))
      c.copy(uuid = Hashing.contentHash(c))
    }
  }

  private def combinations(n: Int, k: Int): Double =
    (0 until k).map(i => (n - i).toDouble / (i + 1)).product

  // ------------------------------------------------------------ G4

  /** Distortion generator: random 3×3 strain ~ N(I, diag(covDiag)),
    * determinant normalized to `volumeFactor`, applied to cell and
    * positions; optional Gaussian `rattle` of positions (reference:
    * database/distortion.py:220–263). */
  def distortion(seedCfg: Config, nconfigs: Int, covDiag: Double,
      volumeFactor: Double, rattle: Double, ranSeed: Long): Seq[Config] = {
    val r = Rng.forKey(ranSeed, s"dist:${seedCfg.uuid}")
    (0 until nconfigs).map { i =>
      var m: Lattice.Mat3 = (0 until 3).map(a => (0 until 3).map { b =>
        val mean = if (a == b) 1.0 else 0.0
        mean + r.nextGaussian() * math.sqrt(covDiag)
      })
      val d = Lattice.det(m)
      require(math.abs(d) > 1e-9, "degenerate distortion draw")
      val scale = math.cbrt(volumeFactor / math.abs(d))
      m = m.map(_.map(_ * scale))
      val newCell = Lattice.matmul(seedCfg.cell, m)
      val newPos = seedCfg.positions.map { p =>
        val q = Lattice.rowMat(p, m)
        if (rattle > 0) q.map(_ + r.nextGaussian() * rattle) else q
      }
      val c = seedCfg.copy(uuid = "", groupUuid = seedCfg.uuid,
        cell = newCell, positions = newPos,
        energy = None, force = None,
        configType = Some("dist"),
        params = seedCfg.params + ("draw" -> i.toString))
      c.copy(uuid = Hashing.contentHash(c))
    }
  }

  // ------------------------------------------------------------ G13

  /** Supercell transform: integer multiple matrix M (3-, 9-element or
    * diagonal), new cell = M·cell; atoms replicated over the |det M|
    * lattice points inside the supercell (reference:
    * matdb/transforms.py:54–90 make_supercell via ase;
    * atoms.py:210–216). */
  def supercell(seedCfg: Config, spec: Seq[Int]): Config = {
    val m: Seq[Seq[Int]] = Lattice.conformSupercell(spec)
    val md: Lattice.Mat3 = m.map(_.map(_.toDouble))
    val nCells = math.round(math.abs(Lattice.det(md))).toInt
    require(nCells >= 1, "supercell determinant must be >= 1")
    val newCell = Lattice.matmul(md, seedCfg.cell)
    val mInv = Lattice.inverse(md)
    // enumerate integer translations t = (i,j,k) whose fractional
    // coordinate t·M⁻¹ lies in [0,1)³ — exactly |det M| of them
    val bound = m.flatten.map(math.abs).max * 3 + 1
    val eps = 1e-9
    val shifts = for {
      i <- -bound to bound; j <- -bound to bound; k <- -bound to bound
      frac = Lattice.rowMat(Seq(i.toDouble, j.toDouble, k.toDouble), mInv)
      if frac.forall(f => f >= -eps && f < 1.0 - eps)
    } yield Seq(i.toDouble, j.toDouble, k.toDouble)
    require(shifts.length == nCells,
      s"expected $nCells lattice points, found ${shifts.length}")
    val cart = shifts.map(t => Lattice.rowMat(t, seedCfg.cell))
    val newPositions = for {
      t <- cart
      p <- seedCfg.positions
    } yield Seq(p(0) + t(0), p(1) + t(1), p(2) + t(2))
    val newSpecies = cart.flatMap(_ => seedCfg.species)
    val c = seedCfg.copy(uuid = "", groupUuid = seedCfg.uuid,
      n = newSpecies.length, species = newSpecies,
      symbols = Formula.compress(newSpecies),
      cell = newCell, positions = newPositions,
      energy = None, force = None, configType = Some("super"))
    c.copy(uuid = Hashing.contentHash(c))
  }

  // ------------------------------------------------------------ G5 (strain)

  /** Uniform volumetric strains: scale cell by (1+s/100)^(1/3) per
    * strain percentage (reference: database/md.py:264–293 setup). */
  def strains(seedCfg: Config, strainPcts: Seq[Double]): Seq[Config] =
    strainPcts.map { s =>
      val f = math.cbrt(1.0 + s / 100.0)
      val c = seedCfg.copy(uuid = "", groupUuid = seedCfg.uuid,
        cell = seedCfg.cell.map(_.map(_ * f)),
        positions = seedCfg.positions.map(_.map(_ * f)),
        energy = None, force = None,
        configType = Some("strain"),
        params = seedCfg.params + ("strain" -> s.toString))
      c.copy(uuid = Hashing.contentHash(c))
    }

  // ------------------------------------------------------------ G6 (liquid)

  /** G6 liquid group: DFT configs from a subsampled liquid-temperature
    * MD trajectory (reference database/liquid.py:24–117 — a
    * downstream map over the G5/MD output). Semantics preserved:
    * the stage is GATED on the MD base being ready (liquid.py:58–63
    * `ready()`/`setup()` both bail when `mdbase.ready()` is false —
    * here: empty frame list fails loudly instead of silently emitting
    * nothing), every `rate`-th frame becomes a calculation seed
    * (md.py subsample handoff), configs are tagged `config_type=liq`
    * (liquid.py:83 `xyz(config_type="liq")`) and content-hash
    * deduped like every other generator. */
  def liquid(frames: Seq[Xdatcar.Frame], rate: Int = 1): Seq[Config] = {
    require(frames.nonEmpty,
      "MD base not ready: no trajectory frames (liquid.py ready() gate)")
    require(rate >= 1, s"subsample rate must be >= 1, got $rate")
    Xdatcar.subsample(frames, rate).map { f =>
      val seed = f.config
      val c = seed.copy(uuid = "", groupUuid = seed.uuid,
        energy = None, force = None, configType = Some("liq"),
        params = seed.params + ("md_step" -> f.step.toString))
      c.copy(uuid = Hashing.contentHash(c))
    }.distinctBy(_.uuid)
  }

  private implicit class Pipe[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
