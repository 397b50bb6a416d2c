package graft.generators

import graft.core.{Config, Crystal, Hashing, Lattice}

/** G1 derivative-superstructure enumeration (reference:
  * database/enumerated.py:33–129 params, 354–448 setup — the heavy
  * lifting there is delegated to the compiled `phenum` kernel).
  *
  * This is a from-scratch kernel: sublattices of index n are the HNF
  * matrices of determinant n (Crystal.hnfsOfDeterminant); labelings
  * of the n sites over the species set are deduplicated by their
  * canonical form under the supercell's translation group (the euid
  * analog, enumerated.py:406–427). Scope: translation-group symmetry
  * (parent point-group reduction is a round-2 refinement — counts are
  * therefore an over-count of the fully-reduced phenum sets, never an
  * under-count; every emitted structure is still a valid distinct-
  * by-translation derivative structure).
  *
  * Spark shape: the (size × HNF) grid is the distributed axis — a
  * `flatMap` over a grid DataFrame; labelings never leave the task
  * that owns their HNF.
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

  final case class Enumerated(size: Int, hnfIndex: Int, labeling: String,
      config: Config)

  /** Enumerate unique labelings for ONE (lattice, size, hnf) cell —
    * the per-task kernel. */
  def labelingsFor(lattice: String, a: Double, species: Seq[String],
      hnf: Crystal.IMat, hnfIndex: Int): Seq[Enumerated] = {
    val (pcell, pbasis) = primitiveCell(lattice, a)
    val prim = Config.of(Seq("X"), pcell, pbasis)
    val sup = Generators.supercell(prim, hnf.flatten.map(_.toInt).toSeq)
    val n = sup.n
    val frac = Crystal.fractional(sup.cell, sup.positions)
    // translation-group permutations of the site indices
    val perms: Seq[Seq[Int]] = frac.indices.map { t =>
      val shift = frac(t)
      frac.indices.map { i =>
        val moved = (0 until 3).map(k => {
          val x = frac(i)(k) + shift(k); x - math.floor(x)
        })
        frac.indices.find { j =>
          (0 until 3).forall { k =>
            val d = math.abs(moved(k) - frac(j)(k))
            math.min(d, 1.0 - d) < 1e-6
          }
        }.getOrElse(throw new IllegalStateException("translation not closed"))
      }
    }
    val k = species.length
    val total = math.pow(k, n).toInt
    val seen = scala.collection.mutable.Set[String]()
    (0 until total).flatMap { code =>
      val lab = Array.tabulate(n)(i =>
        (code / math.pow(k, i).toInt) % k)
      // require every species present (derivative structures of the
      // alloy, endpoints excluded — enumerated.py concentration gate)
      if (lab.distinct.length < k) None
      else {
        val canonical = perms.map(p => p.map(lab).mkString(",")).min
        if (seen.add(canonical)) {
          val c = sup.withSpecies(lab.map(species).toSeq)
            .copy(uuid = "", groupUuid = "", configType = Some("enum"))
          Some(Enumerated(n, hnfIndex, canonical,
            c.copy(uuid = Hashing.contentHash(c))))
        } else None
      }
    }
  }

  /** Full enumeration over cell sizes [minSize, maxSize]. */
  def enumerate(lattice: String, a: Double, species: Seq[String],
      minSize: Int, maxSize: Int): Seq[Enumerated] =
    for {
      n <- minSize to maxSize
      (hnf, idx) <- Crystal.hnfsOfDeterminant(n).zipWithIndex
      e <- labelingsFor(lattice, a, species, hnf, idx)
    } yield e
}
