package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{Config, Crystal, Formula}
import graft.sources.{ExtXyz, Poscar}

/** Property-based invariants for the pure kernels (the reference has
  * no property tests — SURVEY §5; these guard the from-scratch math).
  * Plain scalacheck generators with a pinned seed (the scalatest
  * bridge artifact isn't on the offline classpath).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 100): Seq[T] = {
    var seed = Seed(42L)
    val out = Seq.newBuilder[T]
    var tries = 0
    while (out.knownSize < n && tries < n * 50) {
      g.apply(Gen.Parameters.default, seed).foreach(out += _)
      seed = seed.next
      tries += 1
    }
    out.result()
  }

  private val elementGen: Gen[String] =
    Gen.oneOf("Ag", "Pd", "Cu", "Co", "W", "V", "Si", "H")
  private val speciesGen: Gen[List[String]] =
    Gen.nonEmptyListOf(elementGen).map(_.take(12))

  test("formula compress/expand round-trips for any species multiset") {
    samples(speciesGen).foreach { sp =>
      assert(Formula.expand(Formula.compress(sp)) === sp.sorted)
    }
  }

  test("type map is a bijection over the distinct species") {
    samples(speciesGen).foreach { sp =>
      val tm = Formula.typeMap(sp)
      val inv = Formula.inverseTypeMap(sp)
      assert(tm.size === sp.distinct.size)
      tm.foreach { case (el, i) => assert(inv(i) === el) }
    }
  }

  private val intMatGen: Gen[Crystal.IMat] = Gen.listOfN(9, Gen.choose(-8L, 8L))
    .map(vals => vals.grouped(3).map(_.toArray).toArray)
    .suchThat(m => Crystal.idet(m) != 0)

  test("HNF invariants hold for arbitrary nonsingular integer matrices") {
    // ≥1000 cases (VERDICT r6 task #8): the reference asserts these
    // invariants on fixed fixtures (database/utility.py:383–496); the
    // fuzz covers the integer-arithmetic edge cases (negative pivots,
    // zero columns needing swaps, |det| up to 8³·6)
    val mats = samples(intMatGen, 1000)
    assert(mats.length >= 1000)
    mats.foreach { a =>
      val (h, u) = Crystal.hermiteNormalForm(a)
      assert(math.abs(Crystal.idet(u)) === 1L)
      assert(Crystal.idet(h) === math.abs(Crystal.idet(a)))
      assert(h(0)(1) === 0L && h(0)(2) === 0L && h(1)(2) === 0L)
      for (i <- 0 until 3; j <- 0 until 3)
        assert((0 until 3).map(k => a(i)(k) * u(k)(j)).sum === h(i)(j))
      for (i <- 0 until 3; j <- 0 until i)
        assert(h(i)(j) >= 0 && h(i)(j) < h(i)(i))
    }
  }

  // random well-conditioned lattice + grid-snapped distinct sites
  // (1/8 fractional steps keep every pairwise distance far above the
  // 1e-6 site tolerance)
  private val primCandidateGen: Gen[Config] = for {
    n <- Gen.choose(1, 3)
    sp <- Gen.listOfN(n, elementGen)
    a <- Gen.choose(3.0, 6.0); b <- Gen.choose(3.0, 6.0); c <- Gen.choose(3.0, 6.0)
    off <- Gen.listOfN(3, Gen.choose(-0.5, 0.5))
    cells <- Gen.listOfN(n, Gen.choose(0, 511)).suchThat(_.distinct.length == n)
  } yield {
    val cell = Seq(Seq(a, 0.0, 0.0), Seq(off(0), b, 0.0), Seq(off(1), off(2), c))
    val frac = cells.map(g => Seq((g & 7) / 8.0, ((g >> 3) & 7) / 8.0, ((g >> 6) & 7) / 8.0))
    Config.of(sp, cell, frac.map(f => graft.core.Lattice.rowMat(f, cell)))
  }

  test("decompress ∘ compress = id over random primitives × random HNFs (K3/K5)") {
    // ≥1000 (primitive, HNF) cases: decompress expands a primitive by
    // an index-n HNF; make_primitive (the compress direction) must
    // recover exactly the primitive's atom count, volume, and species
    // mix (reference asserts the same round-trip, utility.py:525–590)
    val cases = for {
      cand <- samples(primCandidateGen, 250)
      // primitivize first: a random 2–3 atom basis can legitimately
      // carry internal translation symmetry (e.g. a body-centered
      // same-species pair), in which case the primitive is smaller
      prim = Crystal.makePrimitive(cand)
      detN <- 1L to 4L
      hnf <- {
        val all = Crystal.hnfsOfDeterminant(detN)
        Seq(all(math.abs(prim.uuid.hashCode % all.length)))
      }
    } yield (prim, hnf, detN)
    assert(cases.length >= 1000)
    cases.foreach { case (prim, hnf, detN) =>
      val typeNames = prim.species.distinct.sorted.zipWithIndex
        .map { case (s, i) => i -> s }.toMap
      val nameTypes = typeNames.map(_.swap)
      val frac = Crystal.fractional(prim.cell, prim.positions)
      val big = Crystal.decompress(prim.cell, frac,
        prim.species.map(nameTypes), typeNames, hnf)
      assert(big.n === prim.n * detN, s"decompress index-$detN count")
      val vol = math.abs(graft.core.Lattice.det(big.cell))
      val pvol = math.abs(graft.core.Lattice.det(prim.cell))
      assert(math.abs(vol - pvol * detN) < 1e-6 * pvol * detN)

      val back = Crystal.makePrimitive(big)
      assert(back.n === prim.n,
        s"compress must recover the $detN× primitive atom count")
      val bvol = math.abs(graft.core.Lattice.det(back.cell))
      assert(math.abs(bvol - pvol) < 1e-6 * pvol,
        "compress must recover the primitive volume")
      assert(back.species.sorted === prim.species.sorted)
    }
  }

  private val configGen: Gen[Config] = for {
    n <- Gen.choose(1, 6)
    sp <- Gen.listOfN(n, elementGen)
    a <- Gen.choose(3.0, 6.0)
    pos <- Gen.listOfN(n, Gen.listOfN(3, Gen.choose(0.0, 5.0)))
  } yield Config.of(sp,
    Seq(Seq(a, 0.0, 0.0), Seq(0.1, a, 0.0), Seq(0.0, 0.2, a)),
    pos.map(_.toSeq))

  test("POSCAR round-trip preserves geometry for arbitrary configs") {
    samples(configGen, 50).foreach { c =>
      val r = Poscar.read(Poscar.write(c))
      assert(r.n === c.n)
      for (i <- 0 until 3; j <- 0 until 3)
        assert(math.abs(r.cell(i)(j) - c.cell(i)(j)) < 1e-9)
      assert(r.species.sorted === c.species.sorted)
    }
  }

  test("extxyz round-trip preserves species order and positions") {
    samples(configGen, 50).foreach { c =>
      val r = ExtXyz.read(ExtXyz.write(c)).head
      assert(r.species === c.species)
      for (i <- 0 until c.n; j <- 0 until 3)
        assert(math.abs(r.positions(i)(j) - c.positions(i)(j)) < 1e-8)
    }
  }

  test("content hash: equal configs collide, perturbed configs don't") {
    samples(configGen, 50).foreach { c =>
      val same = Config.of(c.species, c.cell, c.positions)
      assert(same.uuid === Config.of(c.species, c.cell, c.positions).uuid)
      val moved = Config.of(c.species, c.cell,
        c.positions.updated(0, c.positions(0).map(_ + 0.001)))
      assert(moved.uuid !== same.uuid)
    }
  }

  test("linspace/logspace: length, endpoints, monotonicity (K11)") {
    import graft.functions.SpecialValues
    val g = for {
      a <- Gen.choose(-100.0, 100.0)
      span <- Gen.choose(0.001, 200.0)
      n <- Gen.choose(2, 40)
    } yield (a, a + span, n)
    samples(g).foreach { case (a, b, n) =>
      val xs = SpecialValues.values(s"linspace($a, $b, $n)").get
      assert(xs.length === n)
      assert(math.abs(xs.head - a) < 1e-9 && math.abs(xs.last - b) < 1e-9)
      xs.zip(xs.tail).foreach { case (p, q) => assert(p < q) }
      // range(a, b, step) never includes the stop
      val r = SpecialValues.values(s"range(0, $n, 1)").get
      assert(r.length === n && r.last === (n - 1).toDouble)
    }
  }

  test("AFLUX matchbook: each keyword appears exactly once (S9)") {
    import graft.functions.AflowDsl.{And, Cmp}
    import graft.sources.Aflux
    val kwGen = Gen.oneOf("Egap", "nspecies", "natoms", "spacegroup_relax")
    val cmpGen = for {
      k <- kwGen
      op <- Gen.oneOf("==", "<", ">")
      v <- Gen.choose(1, 500)
    } yield Cmp(k, op, v)
    val andGen = Gen.nonEmptyListOf(cmpGen).map(cs => And(cs.take(6): _*))
    samples(andGen).foreach { p =>
      val items = Aflux.matchbookItems(p)
      val keys = items.map(_._1)
      assert(keys.distinct.length === keys.length,
        s"duplicate keyword block in $items")
      // every distinct keyword of the predicate is covered
      assert(keys.toSet ===
        p.ps.map { case Cmp(k, _, _) => k; case _ => "" }.toSet)
    }
  }

  test("prototype decoration: vegard a0 inside the latpar hull (G9)") {
    import graft.generators.Prototypes
    val latGen = for {
      a <- Gen.choose(3.0, 5.0)
      b <- Gen.choose(3.0, 5.0)
    } yield Map("Ag" -> a, "Pd" -> b)
    samples(latGen, 30).foreach { lp =>
      val out = Prototypes.generate(Seq("L1_2", "B2_cscl"), Seq("Ag", "Pd"), lp)
      out.foreach { c =>
        val a0 = c.cell(0)(0) / Prototypes.library
          .find(_.name == c.params("prototype")).get.cell(0)(0)
        assert(a0 >= lp.values.min - 1e-9 && a0 <= lp.values.max + 1e-9)
      }
    }
  }

  test("WAV codec round-trips arbitrary 16-bit PCM payloads (mm decode)") {
    import graft.sources.Wav
    val audioGen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.choose(1, 4)
      n <- Gen.choose(0, 400)
      xs <- Gen.listOfN(n * ch,
        Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield Wav.Audio(rate, ch, xs.map(_.toShort).toArray)
    samples(audioGen, 60).foreach { a =>
      val rt = Wav.decode(Wav.encode(a))
      assert(rt.sampleRate === a.sampleRate)
      assert(rt.channels === a.channels)
      assert(rt.samples.toSeq === a.samples.toSeq)
    }
  }

  test("BMP codec round-trips arbitrary images incl. padded odd widths") {
    import graft.sources.Bmp
    val imgGen = for {
      w <- Gen.choose(1, 23)
      h <- Gen.choose(1, 11)
      px <- Gen.listOfN(w * h, Gen.choose(0, 0xFFFFFF))
    } yield Bmp.Image(w, h, px.toArray)
    samples(imgGen, 60).foreach { img =>
      val rt = Bmp.decode(Bmp.encode(img))
      assert(rt.width === img.width && rt.height === img.height)
      assert(rt.rgb.toSeq === img.rgb.toSeq)
    }
  }

  test("Y4M codec round-trips arbitrary videos across colorspaces (mm decode)") {
    import graft.sources.Y4m
    val videoGen = for {
      cs <- Gen.oneOf("444", "420", "mono")
      // 4:2:0 chroma planes use ceil(w/2)*ceil(h/2) — odd dims included
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 8)
      nF <- Gen.choose(0, 5)
      fps <- Gen.choose(1, 60)
    } yield {
      val cSize = cs match {
        case "444" => w * h
        case "420" => ((w + 1) / 2) * ((h + 1) / 2)
        case _ => 0
      }
      Y4m.Video(w, h, fps, 1, cs, Vector.tabulate(nF)(f =>
        Y4m.Frame(
          Array.tabulate(w * h)(i => (f * 31 + i).toByte),
          Array.tabulate(cSize)(i => (f * 17 + i).toByte),
          Array.tabulate(cSize)(i => (f * 7 + i).toByte))))
    }
    samples(videoGen, 60).foreach { v =>
      val enc = Y4m.encode(v)
      val rt = Y4m.decode(enc)
      assert(rt.width === v.width && rt.height === v.height)
      assert(rt.fpsNum === v.fpsNum && rt.colorspace === v.colorspace)
      assert(rt.frames.length === v.frames.length)
      rt.frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.y.toSeq === b.y.toSeq)
        assert(a.u.toSeq === b.u.toSeq)
        assert(a.v.toSeq === b.v.toSeq)
      }
      assert(Y4m.frameCount(enc) === v.frames.length)
    }
  }

  test("tar codec round-trips arbitrary entry sets (S15)") {
    import graft.sources.Tar
    val entryGen = for {
      n <- Gen.choose(0, 8)
      entries <- Gen.listOfN(n, for {
        name <- Gen.identifier.map(_.take(40))
        size <- Gen.choose(0, 1500) // crosses 512-byte block boundaries
        bytes <- Gen.listOfN(size, Gen.choose(Byte.MinValue, Byte.MaxValue))
      } yield Tar.Entry(name, bytes.toArray))
    } yield entries.zipWithIndex.map { case (e, i) =>
      e.copy(name = s"$i/${e.name}") // unique paths
    }
    samples(entryGen, 40).foreach { entries =>
      val rt = Tar.decode(Tar.encode(entries))
      assert(rt.map(_.name) === entries.map(_.name))
      rt.zip(entries).foreach { case (a, b) =>
        assert(a.bytes.toSeq === b.bytes.toSeq)
      }
      assert(Tar.gunzip(Tar.gzip(Tar.encode(entries))).toSeq ===
        Tar.encode(entries).toSeq)
    }
  }

  test("HDF5 codec round-trips arbitrary configs (uuid/params/geometry)") {
    import graft.sources.Hdf5
    val cfgGen = for {
      sp <- speciesGen
      cellDiag <- Gen.listOfN(3, Gen.choose(2.0, 8.0))
      pos <- Gen.listOfN(sp.length,
        Gen.listOfN(3, Gen.choose(0.0, 2.0)))
      nParams <- Gen.choose(0, 4)
      params <- Gen.mapOfN(nParams, Gen.zip(
        Gen.identifier.map(_.take(8)), Gen.identifier.map(_.take(12))))
      energy <- Gen.option(Gen.choose(-50.0, 0.0))
    } yield Config.of(sp,
      Seq(Seq(cellDiag(0), 0.0, 0.0), Seq(0.0, cellDiag(1), 0.0),
        Seq(0.0, 0.0, cellDiag(2))),
      pos.map(_.toSeq))
      .copy(params = params, energy = energy)
    val dir = java.nio.file.Files.createTempDirectory("h5prop").toString
    samples(cfgGen, 40).zipWithIndex.foreach { case (cfg, i) =>
      val p = s"$dir/rt_$i.h5"
      Hdf5.writeAtoms(p, cfg)
      val back = Hdf5.readAtoms(p)
      assert(back.uuid === cfg.uuid)
      assert(back.species === cfg.species)
      assert(back.params === cfg.params)
      assert(back.energy === cfg.energy)
      for (r <- cfg.positions.indices; c <- 0 until 3)
        assert(math.abs(back.positions(r)(c) - cfg.positions(r)(c)) < 1e-12)
      for (r <- 0 until 3; c <- 0 until 3)
        assert(math.abs(back.cell(r)(c) - cfg.cell(r)(c)) < 1e-12)
    }
  }
}
