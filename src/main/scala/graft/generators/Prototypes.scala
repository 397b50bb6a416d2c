package graft.generators

import graft.core.{Config, Hashing, Lattice}

/** G9 prototype-structure generator (reference: database/prototype.py:
  * 62–151 selection, 228–260 product loop, 262–292 permutations,
  * 294–324 lattice-parameter fixup).
  *
  * The reference ships an AFLOW prototype archive; here a built-in
  * library of the canonical small prototypes stands in (same operator
  * semantics: prototypes × allowed species permutations, vegard-fixed
  * lattice parameter, sha1(name+permutation) dedup).
  */
object Prototypes {

  /** name → (conventional cell for a=1, fractional basis, #site types). */
  final case class Proto(name: String, cell: Lattice.Mat3,
      basis: Seq[(Int, Seq[Double])]) {
    def arity: Int = basis.map(_._1).distinct.length
  }

  private val cube: Lattice.Mat3 =
    Seq(Seq(1.0, 0, 0), Seq(0, 1.0, 0), Seq(0, 0, 1.0))

  val library: Seq[Proto] = Seq(
    Proto("A1_fcc", cube, Seq(
      0 -> Seq(0.0, 0.0, 0.0), 0 -> Seq(0.0, 0.5, 0.5),
      0 -> Seq(0.5, 0.0, 0.5), 0 -> Seq(0.5, 0.5, 0.0))),
    Proto("A2_bcc", cube, Seq(
      0 -> Seq(0.0, 0.0, 0.0), 0 -> Seq(0.5, 0.5, 0.5))),
    Proto("Ah_sc", cube, Seq(0 -> Seq(0.0, 0.0, 0.0))),
    Proto("B1_rocksalt", cube, Seq(
      0 -> Seq(0.0, 0.0, 0.0), 0 -> Seq(0.0, 0.5, 0.5),
      0 -> Seq(0.5, 0.0, 0.5), 0 -> Seq(0.5, 0.5, 0.0),
      1 -> Seq(0.5, 0.5, 0.5), 1 -> Seq(0.5, 0.0, 0.0),
      1 -> Seq(0.0, 0.5, 0.0), 1 -> Seq(0.0, 0.0, 0.5))),
    Proto("B2_cscl", cube, Seq(
      0 -> Seq(0.0, 0.0, 0.0), 1 -> Seq(0.5, 0.5, 0.5))),
    Proto("B3_zincblende", cube, Seq(
      0 -> Seq(0.0, 0.0, 0.0), 0 -> Seq(0.0, 0.5, 0.5),
      0 -> Seq(0.5, 0.0, 0.5), 0 -> Seq(0.5, 0.5, 0.0),
      1 -> Seq(0.25, 0.25, 0.25), 1 -> Seq(0.25, 0.75, 0.75),
      1 -> Seq(0.75, 0.25, 0.75), 1 -> Seq(0.75, 0.75, 0.25))),
    Proto("L1_0", cube, Seq(
      0 -> Seq(0.0, 0.0, 0.0), 0 -> Seq(0.5, 0.5, 0.0),
      1 -> Seq(0.5, 0.0, 0.5), 1 -> Seq(0.0, 0.5, 0.5))))

  /** Ordered species permutations of the right arity (prototype.py:
    * 262–292: k-permutations of the allowed species). */
  def permutations(species: Seq[String], arity: Int): Seq[Seq[String]] =
    species.sorted.combinations(arity).flatMap(_.permutations).toSeq

  /** Generate prototype configs: selection × permutations, lattice
    * parameter from the concentration-weighted vegard rule
    * (data.py:19–40), content-hash dedup (puuid analog). */
  def generate(names: Seq[String], species: Seq[String],
      latpars: Map[String, Double]): Seq[Config] = {
    val chosen =
      if (names == Seq("all")) library
      else library.filter(p => names.contains(p.name))
    val out = for {
      proto <- chosen
      perm <- permutations(species, proto.arity)
    } yield {
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
    // dedup by content hash (identical structures from different perms
    // of symmetric prototypes)
    out.groupBy(_.uuid).map(_._2.head).toSeq.sortBy(_.uuid)
  }
}
