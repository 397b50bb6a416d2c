package graft.generators

import graft.core.{Config, Hashing, Lattice}

/** G9 prototype-structure generator (reference: database/prototype.py:
  * 62–151 selection — per-arity name-list / "all" / random-k with
  * seed, 228–260 product loop, 262–292 permutations restriction,
  * 294–324 lattice-parameter fixup; fitting/mtp.py:124–136 runs the
  * same library through create_to_relax).
  *
  * The reference ships the AFLOW prototype archive
  * (templates/prototypes.tar.gz: uniqueUnaries/Binaries/Ternaries).
  * Here a from-scratch library of 50 canonical prototypes stands in,
  * built from published Strukturbericht crystallography (conventional
  * cells with ideal/published internal parameters; all data public
  * domain). Same operator semantics: per-arity selection × allowed
  * species permutations, vegard-fixed lattice parameter,
  * sha1(name+permutation) puuid, content-hash dedup.
  */
object Prototypes {

  /** name → (conventional cell for a=1, fractional basis as
    * (siteType, fractional coords)). */
  final case class Proto(name: String, cell: Lattice.Mat3,
      basis: Seq[(Int, Seq[Double])]) {
    def arity: Int = basis.map(_._1).distinct.length
    def system: String = arity match {
      case 1 => "unary"
      case 2 => "binary"
      case 3 => "ternary"
    }
  }

  private val cube: Lattice.Mat3 =
    Seq(Seq(1.0, 0, 0), Seq(0, 1.0, 0), Seq(0, 0, 1.0))
  private def tet(ca: Double): Lattice.Mat3 =
    Seq(Seq(1.0, 0, 0), Seq(0, 1.0, 0), Seq(0, 0, ca))
  private def hex(ca: Double): Lattice.Mat3 =
    Seq(Seq(1.0, 0, 0), Seq(-0.5, math.sqrt(3) / 2, 0), Seq(0, 0, ca))

  private def wrap(x: Double): Double = {
    val f = x - math.floor(x)
    if (f > 1 - 1e-9) 0.0 else f
  }
  private type Site = (Int, Seq[Double])
  private def shift(sites: Seq[Site], ts: Seq[Seq[Double]]): Seq[Site] =
    for { t <- ts; (sp, f) <- sites }
      yield sp -> (0 until 3).map(i => wrap(f(i) + t(i)))
  /** Expand a face-centered conventional cell basis. */
  private def plusFcc(sites: Site*): Seq[Site] =
    shift(sites, Seq(Seq(0.0, 0, 0), Seq(0.0, 0.5, 0.5),
      Seq(0.5, 0.0, 0.5), Seq(0.5, 0.5, 0.0)))
  /** Expand a body-centered conventional cell basis. */
  private def plusI(sites: Site*): Seq[Site] =
    shift(sites, Seq(Seq(0.0, 0, 0), Seq(0.5, 0.5, 0.5)))
  private def s(sp: Int, x: Double, y: Double, z: Double): Site =
    sp -> Seq(x, y, z)

  // ---- unaries (11) -------------------------------------------------
  private val unaries: Seq[Proto] = {
    val ca = math.sqrt(8.0 / 3) // ideal hcp
    Seq(
      Proto("A1_fcc", cube, plusFcc(s(0, 0, 0, 0))),
      Proto("A2_bcc", cube, plusI(s(0, 0, 0, 0))),
      Proto("A3_hcp", hex(ca), Seq(
        s(0, 1.0 / 3, 2.0 / 3, 0.25), s(0, 2.0 / 3, 1.0 / 3, 0.75))),
      Proto("A3p_dhcp", hex(2 * ca), Seq( // double-hcp (α-La)
        s(0, 0, 0, 0), s(0, 0, 0, 0.5),
        s(0, 1.0 / 3, 2.0 / 3, 0.25), s(0, 2.0 / 3, 1.0 / 3, 0.75))),
      Proto("A4_diamond", cube,
        plusFcc(s(0, 0, 0, 0), s(0, 0.25, 0.25, 0.25))),
      Proto("A4p_lonsdaleite", hex(ca), Seq( // hexagonal diamond
        s(0, 1.0 / 3, 2.0 / 3, 0), s(0, 2.0 / 3, 1.0 / 3, 0.5),
        s(0, 1.0 / 3, 2.0 / 3, 0.375), s(0, 2.0 / 3, 1.0 / 3, 0.875))),
      Proto("A5_beta_sn", tet(0.5456), Seq(
        s(0, 0, 0, 0), s(0, 0.5, 0, 0.25),
        s(0, 0.5, 0.5, 0.5), s(0, 0, 0.5, 0.75))),
      Proto("A6_in", tet(1.521), plusFcc(s(0, 0, 0, 0))),
      Proto("A9_graphite", hex(2.726), Seq(
        s(0, 0, 0, 0.25), s(0, 0, 0, 0.75),
        s(0, 1.0 / 3, 2.0 / 3, 0.25), s(0, 2.0 / 3, 1.0 / 3, 0.75))),
      Proto("A15_beta_w", cube, Seq(
        s(0, 0, 0, 0), s(0, 0.5, 0.5, 0.5),
        s(0, 0.25, 0, 0.5), s(0, 0.75, 0, 0.5),
        s(0, 0.5, 0.25, 0), s(0, 0.5, 0.75, 0),
        s(0, 0, 0.5, 0.25), s(0, 0, 0.5, 0.75))),
      Proto("Ah_sc", cube, Seq(s(0, 0, 0, 0))))
  }

  // ---- binaries (32) ------------------------------------------------
  private val binaries: Seq[Proto] = Seq(
    Proto("B1_rocksalt", cube,
      plusFcc(s(0, 0, 0, 0), s(1, 0.5, 0.5, 0.5))),
    Proto("B2_cscl", cube, Seq(s(0, 0, 0, 0), s(1, 0.5, 0.5, 0.5))),
    Proto("B3_zincblende", cube,
      plusFcc(s(0, 0, 0, 0), s(1, 0.25, 0.25, 0.25))),
    Proto("B4_wurtzite", hex(math.sqrt(8.0 / 3)), Seq(
      s(0, 1.0 / 3, 2.0 / 3, 0), s(0, 2.0 / 3, 1.0 / 3, 0.5),
      s(1, 1.0 / 3, 2.0 / 3, 0.375), s(1, 2.0 / 3, 1.0 / 3, 0.875))),
    Proto("B8_1_nias", hex(1.391), Seq(
      s(0, 0, 0, 0), s(0, 0, 0, 0.5),
      s(1, 1.0 / 3, 2.0 / 3, 0.25), s(1, 2.0 / 3, 1.0 / 3, 0.75))),
    Proto("B8_2_ni2in", hex(1.234), Seq(
      s(0, 0, 0, 0), s(0, 0, 0, 0.5),
      s(0, 1.0 / 3, 2.0 / 3, 0.75), s(0, 2.0 / 3, 1.0 / 3, 0.25),
      s(1, 1.0 / 3, 2.0 / 3, 0.25), s(1, 2.0 / 3, 1.0 / 3, 0.75))),
    Proto("Bh_wc", hex(0.976), Seq(
      s(0, 0, 0, 0), s(1, 1.0 / 3, 2.0 / 3, 0.5))),
    Proto("B10_pbo", tet(1.260), Seq( // z_Pb = 0.2385 (published)
      s(1, 0, 0, 0), s(1, 0.5, 0.5, 0),
      s(0, 0, 0.5, 0.2385), s(0, 0.5, 0, 0.7615))),
    Proto("B17_pts", tet(1.735), Seq(
      s(0, 0, 0.5, 0), s(0, 0.5, 0, 0.5),
      s(1, 0, 0, 0.25), s(1, 0, 0, 0.75))),
    Proto("B20_fesi", cube, { // u_Fe = 0.1358, u_Si = 0.844 (published)
      def orbit(sp: Int, u: Double) = Seq(
        s(sp, u, u, u),
        s(sp, wrap(0.5 + u), wrap(0.5 - u), wrap(-u)),
        s(sp, wrap(-u), wrap(0.5 + u), wrap(0.5 - u)),
        s(sp, wrap(0.5 - u), wrap(-u), wrap(0.5 + u)))
      orbit(0, 0.1358) ++ orbit(1, 0.844)
    }),
    Proto("B32_natl", cube, plusFcc(
      s(0, 0, 0, 0), s(0, 0.25, 0.25, 0.25),
      s(1, 0.5, 0.5, 0.5), s(1, 0.75, 0.75, 0.75))),
    Proto("B35_cosn", hex(0.805), Seq(
      s(0, 0.5, 0, 0), s(0, 0, 0.5, 0), s(0, 0.5, 0.5, 0),
      s(1, 0, 0, 0), s(1, 1.0 / 3, 2.0 / 3, 0.5), s(1, 2.0 / 3, 1.0 / 3, 0.5))),
    Proto("C1_fluorite", cube, plusFcc(
      s(0, 0, 0, 0), s(1, 0.25, 0.25, 0.25), s(1, 0.75, 0.75, 0.75))),
    Proto("C2_pyrite", cube, { // u_S = 0.384 (published)
      val u = 0.384
      val ss = Seq(
        Seq(u, u, u), Seq(0.5 + u, 0.5 - u, -u),
        Seq(-u, 0.5 + u, 0.5 - u), Seq(0.5 - u, -u, 0.5 + u))
      plusFcc(s(0, 0, 0, 0)) ++
        (ss ++ ss.map(_.map(x => -x))).map(f =>
          s(1, wrap(f(0)), wrap(f(1)), wrap(f(2))))
    }),
    Proto("C3_cuprite", cube, Seq(
      s(1, 0, 0, 0), s(1, 0.5, 0.5, 0.5),
      s(0, 0.25, 0.25, 0.25), s(0, 0.25, 0.75, 0.75),
      s(0, 0.75, 0.25, 0.75), s(0, 0.75, 0.75, 0.25))),
    Proto("C4_rutile", tet(0.644), { // u_O = 0.305 (published)
      val u = 0.305
      Seq(s(0, 0, 0, 0), s(0, 0.5, 0.5, 0.5),
        s(1, u, u, 0), s(1, wrap(-u), wrap(-u), 0),
        s(1, 0.5 + u, 0.5 - u, 0.5), s(1, 0.5 - u, 0.5 + u, 0.5))
    }),
    Proto("C6_cdi2", hex(1.613), Seq(
      s(0, 0, 0, 0),
      s(1, 1.0 / 3, 2.0 / 3, 0.25), s(1, 2.0 / 3, 1.0 / 3, 0.75))),
    Proto("C11b_mosi2", tet(2.452), { // ideal z_Si = 1/3
      plusI(s(0, 0, 0, 0), s(1, 0, 0, 1.0 / 3), s(1, 0, 0, 2.0 / 3))
    }),
    Proto("C15_cu2mg", cube, plusFcc(
      s(0, 0, 0, 0), s(0, 0.25, 0.25, 0.25),
      s(1, 0.625, 0.625, 0.625), s(1, 0.625, 0.875, 0.875),
      s(1, 0.875, 0.625, 0.875), s(1, 0.875, 0.875, 0.625))),
    Proto("C15b_aube5", cube, plusFcc(
      s(0, 0, 0, 0), s(1, 0.25, 0.25, 0.25),
      s(1, 0.625, 0.625, 0.625), s(1, 0.625, 0.875, 0.875),
      s(1, 0.875, 0.625, 0.875), s(1, 0.875, 0.875, 0.625))),
    Proto("C32_alb2", hex(1.084), Seq(
      s(0, 0, 0, 0),
      s(1, 1.0 / 3, 2.0 / 3, 0.5), s(1, 2.0 / 3, 1.0 / 3, 0.5))),
    Proto("D0_3_alfe3", cube, plusFcc(
      s(1, 0, 0, 0), s(0, 0.5, 0.5, 0.5),
      s(0, 0.25, 0.25, 0.25), s(0, 0.75, 0.75, 0.75))),
    Proto("D0_9_reo3", cube, Seq(
      s(0, 0, 0, 0),
      s(1, 0.5, 0, 0), s(1, 0, 0.5, 0), s(1, 0, 0, 0.5))),
    Proto("D0_19_mg3cd", hex(math.sqrt(8.0 / 3) / 2), { // 2×2×1 hcp order
      // ordered hcp superstructure: minority at one of four columns
      val layerA = Seq((1.0 / 6, 1.0 / 3), (2.0 / 3, 1.0 / 3),
        (1.0 / 6, 5.0 / 6), (2.0 / 3, 5.0 / 6))
      val layerB = Seq((1.0 / 3, 1.0 / 6), (5.0 / 6, 1.0 / 6),
        (1.0 / 3, 2.0 / 3), (5.0 / 6, 2.0 / 3))
      layerA.zipWithIndex.map { case ((x, y), i) =>
        s(if (i == 0) 1 else 0, x, y, 0.25) } ++
        layerB.zipWithIndex.map { case ((x, y), i) =>
          s(if (i == 0) 1 else 0, x, y, 0.75) }
    }),
    Proto("D0_22_al3ti", tet(2.234), Seq(
      s(1, 0, 0, 0), s(1, 0.5, 0.5, 0.5),
      s(0, 0, 0, 0.5), s(0, 0.5, 0.5, 0),
      s(0, 0, 0.5, 0.25), s(0, 0.5, 0, 0.25),
      s(0, 0, 0.5, 0.75), s(0, 0.5, 0, 0.75))),
    Proto("D1_3_al4ba", tet(2.508), { // z_Al = 0.38 (published)
      val z = 0.38
      plusI(s(1, 0, 0, 0),
        s(0, 0, 0.5, 0.25), s(0, 0.5, 0, 0.25),
        s(0, 0, 0, z), s(0, 0, 0, wrap(-z)))
    }),
    Proto("D1_a_moni4", tet(0.622), { // x=2/5, y=1/5 (ideal)
      val (x, y) = (0.4, 0.2)
      plusI(s(1, 0, 0, 0),
        s(0, x, y, 0), s(0, wrap(-x), wrap(-y), 0),
        s(0, wrap(-y), x, 0), s(0, y, wrap(-x), 0))
    }),
    Proto("D2_1_cab6", cube, { // x_B = 0.207 (published)
      val x = 0.207
      Seq(s(0, 0, 0, 0),
        s(1, x, 0.5, 0.5), s(1, wrap(-x), 0.5, 0.5),
        s(1, 0.5, x, 0.5), s(1, 0.5, wrap(-x), 0.5),
        s(1, 0.5, 0.5, x), s(1, 0.5, 0.5, wrap(-x)))
    }),
    Proto("D2_d_cacu5", hex(0.803), Seq(
      s(1, 0, 0, 0),
      s(0, 1.0 / 3, 2.0 / 3, 0), s(0, 2.0 / 3, 1.0 / 3, 0),
      s(0, 0.5, 0, 0.5), s(0, 0, 0.5, 0.5), s(0, 0.5, 0.5, 0.5))),
    Proto("L1_0", cube, Seq(
      s(0, 0, 0, 0), s(0, 0.5, 0.5, 0),
      s(1, 0.5, 0, 0.5), s(1, 0, 0.5, 0.5))),
    Proto("L1_2", cube, Seq(
      s(1, 0, 0, 0), s(0, 0, 0.5, 0.5),
      s(0, 0.5, 0, 0.5), s(0, 0.5, 0.5, 0))),
    Proto("NbO", cube, Seq(
      s(0, 0, 0.5, 0.5), s(0, 0.5, 0, 0.5), s(0, 0.5, 0.5, 0),
      s(1, 0.5, 0, 0), s(1, 0, 0.5, 0), s(1, 0, 0, 0.5))))

  // ---- ternaries (7) ------------------------------------------------
  private val ternaries: Seq[Proto] = Seq(
    Proto("E2_1_perovskite", cube, Seq(
      s(0, 0, 0, 0), s(1, 0.5, 0.5, 0.5),
      s(2, 0.5, 0.5, 0), s(2, 0.5, 0, 0.5), s(2, 0, 0.5, 0.5))),
    Proto("L2_1_heusler", cube, plusFcc(
      s(2, 0, 0, 0), s(1, 0.5, 0.5, 0.5),
      s(0, 0.25, 0.25, 0.25), s(0, 0.75, 0.75, 0.75))),
    Proto("C1_b_half_heusler", cube, plusFcc(
      s(0, 0, 0, 0), s(1, 0.25, 0.25, 0.25), s(2, 0.5, 0.5, 0.5))),
    Proto("XA_inverse_heusler", cube, plusFcc(
      s(0, 0, 0, 0), s(0, 0.25, 0.25, 0.25),
      s(1, 0.5, 0.5, 0.5), s(2, 0.75, 0.75, 0.75))),
    Proto("E1_1_chalcopyrite", tet(2.0), Seq( // ideal u = 1/4
      s(0, 0, 0, 0), s(0, 0, 0.5, 0.25),
      s(0, 0.5, 0.5, 0.5), s(0, 0.5, 0, 0.75),
      s(1, 0, 0, 0.5), s(1, 0, 0.5, 0.75),
      s(1, 0.5, 0.5, 0), s(1, 0.5, 0, 0.25),
      s(2, 0.25, 0.25, 0.125), s(2, 0.75, 0.75, 0.125),
      s(2, 0.75, 0.25, 0.875), s(2, 0.25, 0.75, 0.875),
      s(2, 0.75, 0.75, 0.625), s(2, 0.25, 0.25, 0.625),
      s(2, 0.25, 0.75, 0.375), s(2, 0.75, 0.25, 0.375))),
    Proto("K2NiF4", tet(3.27), { // z_K = 0.355, z_F = 0.155 (published)
      val (zk, zf) = (0.355, 0.155)
      plusI(s(1, 0, 0, 0),
        s(0, 0, 0, zk), s(0, 0, 0, wrap(-zk)),
        s(2, 0, 0.5, 0), s(2, 0.5, 0, 0),
        s(2, 0, 0, zf), s(2, 0, 0, wrap(-zf)))
    }),
    Proto("delafossite_cufeo2", hex(5.640), { // z_O = 0.1086 (published)
      val z = 0.1086
      val centering = Seq(Seq(0.0, 0, 0),
        Seq(2.0 / 3, 1.0 / 3, 1.0 / 3), Seq(1.0 / 3, 2.0 / 3, 2.0 / 3))
      shift(Seq(s(0, 0, 0, 0), s(1, 0, 0, 0.5),
        s(2, 0, 0, z), s(2, 0, 0, wrap(-z))), centering)
    }))

  val library: Seq[Proto] = unaries ++ binaries ++ ternaries

  /** Selection for one arity class (prototype.py:112–146). */
  sealed trait Select
  /** Name substrings, glob-style `*{name}*` (prototype.py:124–131). */
  final case class Names(names: Seq[String]) extends Select
  case object All extends Select
  /** Seeded shuffle, keep k (prototype.py:135–140). */
  final case class RandomK(k: Int, seed: Long) extends Select

  def select(system: String, sel: Select): Seq[Proto] = {
    val pool = library.filter(_.system == system)
    sel match {
      case All => pool
      case Names(ns) => ns.flatMap(n => pool.filter(_.name.contains(n)))
      case RandomK(k, seed) =>
        new scala.util.Random(seed).shuffle(pool).take(k)
    }
  }

  /** Ordered species permutations of the right arity (prototype.py:
    * 262–292: k-permutations of the allowed species, optionally
    * restricted to an explicit list per arity class). */
  def permutations(species: Seq[String], arity: Int,
      restrict: Map[String, Seq[Seq[String]]] = Map.empty): Seq[Seq[String]] = {
    val system = Seq("unary", "binary", "ternary")(arity - 1)
    restrict.getOrElse(system,
      species.sorted.combinations(arity).flatMap(_.permutations).toSeq)
  }

  private def decorate(proto: Proto, perm: Seq[String],
      latpars: Map[String, Double]): Config = {
    val siteSpecies = proto.basis.map { case (t, _) => perm(t) }
    val concs = siteSpecies.groupBy(identity)
      .map { case (el, xs) => el -> xs.size.toDouble / siteSpecies.size }
    val a0 = concs.map { case (el, c) => c * latpars(el) }.sum // vegard
    val cell = proto.cell.map(_.map(_ * a0))
    val pos = proto.basis.map { case (_, f) => Lattice.rowMat(f, cell) }
    val c = Config.of(siteSpecies, cell, pos,
      configType = Some("prototype"))
    c.copy(params = Map("prototype" -> proto.name,
      "perm" -> perm.mkString("-"),
      "puuid" -> Hashing.sha1Hex(proto.name + perm.mkString(","))))
  }

  /** Full reference semantics: per-arity selection × allowed species
    * permutations, vegard lattice parameter, content-hash dedup. */
  def generateBy(structures: Map[String, Select], species: Seq[String],
      latpars: Map[String, Double],
      restrict: Map[String, Seq[Seq[String]]] = Map.empty): Seq[Config] = {
    val out = for {
      (system, sel) <- structures.toSeq.sortBy(_._1)
      proto <- select(system, sel)
      perm <- permutations(species, proto.arity, restrict)
    } yield decorate(proto, perm, latpars)
    out.groupBy(_.uuid).map(_._2.head).toSeq.sortBy(_.uuid)
  }

  /** Name-list convenience used by the pipeline specs ("all" = whole
    * library). */
  def generate(names: Seq[String], species: Seq[String],
      latpars: Map[String, Double]): Seq[Config] = {
    val chosen =
      if (names == Seq("all")) library
      else library.filter(p => names.exists(p.name.contains))
    val out = for {
      proto <- chosen
      perm <- permutations(species, proto.arity)
        if proto.arity <= species.length
    } yield decorate(proto, perm, latpars)
    out.groupBy(_.uuid).map(_._2.head).toSeq.sortBy(_.uuid)
  }
}
