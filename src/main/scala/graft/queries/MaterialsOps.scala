package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Config
import graft.generators.Generators
import graft.pipeline.MaterialsPipeline

/** Materials-domain operator surface (SURVEY §2.2 generators, §2.5
  * dedup, §2.10 pipeline). g2/g3/g13/g9 are hash-level oracles since
  * r8 via committed fixture relations (seeds, cells, prototype site
  * counts) + md5-keyed deterministic twins; the rest run JVM kernels
  * (Breeze eigendecomposition, combinatorial enumeration, Gaussian
  * draws) with ScalaTest golden assertions (determinism, physics
  * invariants) → rows-only.
  *
  * These take the sfDir parameter for contract uniformity but operate
  * on the deterministic seed fixtures (the reference's seeds are
  * POSCAR files, not relational tables).
  */
object MaterialsOps {

  /** G2 substitution, oracle-green since r8 — the deterministic
    * md5-keyed twin of Generators.substitution (reference semantics:
    * database/substitution.py:280–291 `_get_substitution` seeds
    * np.random for reproducible symbol shuffles; here the shuffle IS
    * the reproducibility): seeds come from the committed atom-level
    * fixture parquet (sources/SeedFixture.scala), each of 64 draws
    * ranks a seed's atom sites by md5("sub:<seed>:<draw>:<idx>"),
    * the first n/2 ranks take Ag and the rest Pd (largest-remainder
    * apportionment of the 50/50 stoichiometry on the even-n
    * fixture), duplicate assignments collapse to their first draw
    * (the reference's `seen` uniqueness guard), and the first 8
    * distinct assignments per seed survive. Every step is relational
    * (window rank, group-min, row_number) and replays bit-for-bit in
    * DuckDB — the first g-family hash-level oracle, and the recipe
    * for the rest of the family. The JVM-RNG kernel
    * (Generators.substitution) stays the general library surface
    * with its GeneratorsSpec pins.
    *
    * Scale shape: everything is partitioned by (seed, draw) — the
    * generation grid — with one group-by collapse per seed; at 100 TB
    * the seed table shards across executors and no stage sees more
    * than atoms × draws rows per seed. */
  def g2Substitution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val atoms = s.read.parquet(graft.sources.SeedFixture.path)
      .select(col("seed_uuid"), col("atom_idx"), col("n"))
    val draws = s.range(0, 64).select(col("id").cast("int").as("draw"))
    val w = Window.partitionBy(col("seed_uuid"), col("draw"))
      .orderBy(md5(concat_ws(":", lit("sub"), col("seed_uuid"),
        col("draw"), col("atom_idx"))), col("atom_idx"))
    val ranked = atoms.crossJoin(broadcast(draws))
      .withColumn("rk", row_number().over(w))
      .withColumn("elem",
        when(col("rk") * 2 <= col("n"), lit("Ag")).otherwise(lit("Pd")))
    val asg = ranked.groupBy(col("seed_uuid"), col("n"), col("draw"))
      .agg(concat_ws(",", transform(
        array_sort(collect_list(struct(col("atom_idx"), col("elem")))),
        _.getField("elem"))).as("assignment"))
    val firsts = asg.groupBy(col("seed_uuid"), col("n"), col("assignment"))
      .agg(min(col("draw")).as("first_draw"))
    val w2 = Window.partitionBy(col("seed_uuid")).orderBy(col("first_draw"))
    val half = (col("n") / 2).cast("int").cast("string")
    firsts.withColumn("pick", row_number().over(w2))
      .where(col("pick") <= 8)
      .select(
        md5(concat_ws(":", lit("sub"), col("seed_uuid"), col("assignment")))
          .as("uuid"),
        col("seed_uuid").as("group_uuid"),
        concat(lit("Ag"), half, lit("Pd"), half).as("symbols"),
        col("n").cast("long").as("n"),
        lit("sub").as("config_type"),
        col("assignment"))
  }

  /** G3 vacancy, oracle-green since r8 — the deterministic md5-keyed
    * twin of Generators.vacancy (reference semantics:
    * database/vacancy.py:108–164 — delete ceil(n·0.25) random sites,
    * exhaustive combinations on small n, unique, capped): removal
    * candidates are the exact k-subsets of each seed's sites
    * (k = ceil(n/4) ∈ {1, 2} on the fixture: singletons, or an
    * idx<idx self-join for pairs), ranked per seed by
    * md5("vac:<seed>:<combo>") with the first nconfigs=4 surviving —
    * the md5 rank IS the reference's reproducible shuffle. The kept
    * atoms' formula is recomputed relationally (per-element totals
    * minus removed counts, compressed Formula-style with the
    * count-1 elision), so the twin checks stoichiometry, not just
    * row counts. Fully relational → replays bit-for-bit in DuckDB.
    * The JVM-RNG kernel (Generators.vacancy) stays the general
    * library surface with its GeneratorsSpec pins.
    *
    * Scale shape: candidate generation is a per-seed self-join
    * (atoms × atoms within a seed partition — O(n²) per seed, the
    * exhaustive-combination regime the reference itself caps at
    * 1000 combos); ranking and the formula rebuild are per-seed
    * window/agg work on the same seed_uuid key, one shuffle. */
  def g3Vacancy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val atoms = s.read.parquet(graft.sources.SeedFixture.path)
    val kOf = expr("(n + 3) div 4")
    val singles = atoms.where(kOf === 1)
      .select(col("seed_uuid"), col("n"),
        col("atom_idx").cast("string").as("removed"))
    val a = atoms.select(col("seed_uuid"), col("n"), col("atom_idx").as("ai"))
    val b = atoms.select(col("seed_uuid").as("su_b"), col("atom_idx").as("bi"))
    val pairs = a.join(b, col("seed_uuid") === col("su_b") &&
        col("ai") < col("bi"))
      .where(kOf === 2)
      .select(col("seed_uuid"), col("n"),
        concat_ws(",", col("ai"), col("bi")).as("removed"))
    val removals = singles.union(pairs)
    val w = Window.partitionBy(col("seed_uuid"))
      .orderBy(md5(concat_ws(":", lit("vac"), col("seed_uuid"),
        col("removed"))), col("removed"))
    val picked = removals.withColumn("pick", row_number().over(w))
      .where(col("pick") <= 4)
    val remAtoms = picked.select(col("seed_uuid").as("su_r"), col("removed"),
      explode(split(col("removed"), ",")).as("rm_s"))
      .select(col("su_r"), col("removed"), col("rm_s").cast("int").as("rm_idx"))
    val remCnt = remAtoms.join(
        atoms.select(col("seed_uuid").as("su_a"), col("atom_idx"),
          col("element")),
        col("su_r") === col("su_a") && col("rm_idx") === col("atom_idx"))
      .groupBy(col("su_r"), col("removed").as("removed_r"),
        col("element").as("el_r"))
      .agg(count(lit(1)).as("rc"))
    val tot = atoms.groupBy(col("seed_uuid").as("su_t"), col("element"))
      .agg(count(lit(1)).as("tc"))
    val kept = picked.join(tot, col("seed_uuid") === col("su_t"))
      .join(remCnt,
        col("seed_uuid") === col("su_r") &&
          col("removed") === col("removed_r") &&
          col("element") === col("el_r"), "left")
      .withColumn("kc", col("tc") - coalesce(col("rc"), lit(0L)))
      .where(col("kc") > 0)
      .select(col("seed_uuid"), col("n"), col("removed"),
        col("element"), col("kc"))
    val sym = kept.groupBy(col("seed_uuid"), col("n"), col("removed"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("element"),
          when(col("kc") === 1, lit("")).otherwise(col("kc").cast("string"))
            .as("cnt")))),
        e => concat(e.getField("element"), e.getField("cnt"))))
        .as("symbols"))
    sym.select(
      md5(concat_ws(":", lit("vac"), col("seed_uuid"), col("removed")))
        .as("uuid"),
      col("seed_uuid").as("group_uuid"),
      col("symbols"),
      (col("n") - expr("(n + 3) div 4")).cast("long").as("n"),
      lit("vac").as("config_type"),
      col("removed"))
  }

  /** Number of strain draws per seed (mirrors the kernel's
    * nconfigs=4 surface) and the Irwin–Hall width: a standard normal
    * as the sum of 12 md5-derived 32-bit uniforms, centered and
    * scaled by 2³² — mean 0, variance exactly 12·(1/12) = 1, and
    * every step exact integer arithmetic until one final
    * power-of-two division (exact in IEEE), so the "Gaussian" draw
    * itself replays bit-for-bit in any engine. */
  private val G4Draws = 4
  private val G4Terms = 12

  /** One Irwin–Hall(12) standard-normal column keyed by `key`:
    * Σₜ U32(md5(key:t)) − 6·2³², divided by 2³². The subtraction and
    * sum stay in BIGINT (< 2³⁶), the division is an exponent shift —
    * both exact, so Spark and DuckDB agree to the last bit. */
  private def ihGauss(key: Column): Column = {
    val sum12 = (0 until G4Terms).map(t =>
      conv(substring(md5(concat_ws(":", key, lit(t))), 1, 8), 16, 10)
        .cast("long")).reduce(_ + _)
    (sum12 - lit(6L * 4294967296L)).cast("double") / lit(4294967296.0)
  }

  /** The same Irwin–Hall column as DuckDB SQL text, term-for-term. */
  private def ihGaussSql(key: String): String = {
    val terms = (0 until G4Terms).map(t =>
      s"CAST(('0x'||substr(md5(concat_ws(':',$key,$t)),1,8)) AS BIGINT)")
      .mkString(" + ")
    s"(CAST($terms - 25769803776 AS DOUBLE) / 4294967296.0)"
  }

  /** G4 distortion, oracle-green since r8, ATOM-LEVEL — the
    * deterministic twin of Generators.distortion (reference:
    * database/distortion.py:220–263 — random 3×3 strain ~
    * N(I, diag(cov)), applied to cell and positions, plus a Gaussian
    * position rattle). The kernel's JVM `nextGaussian` (Box–Muller:
    * runtime ln/cos, the libm-ulp divergence class) is replaced by
    * Irwin–Hall(12) normals built from md5-derived 32-bit uniforms —
    * variance exactly 1 with NO transcendental anywhere, so the
    * strain matrix m = I + 0.02·G, its determinant (the kernel's
    * degeneracy/volume audit, exposed as a column), the strained
    * positions p·m and the 0.001-amplitude rattle are all the same
    * correctly-rounded IEEE products/sums in Spark and DuckDB —
    * bit-equal, hash-level oracle. The kernel's cbrt volume
    * normalization is the one step that cannot cross engines
    * (irrational root); it stays on the JVM kernel surface
    * (GeneratorsSpec pins det(norm) ≈ volumeFactor), and the twin's
    * det column audits the same quantity pre-normalization.
    * MaterialsTwinSpec recomputes a draw end-to-end with
    * java MessageDigest and asserts bit-for-bit equality.
    *
    * Scale shape: the strain grid is seeds × draws (the generation
    * grid — broadcast); the atom scan joins it broadcast and never
    * shuffles; rattle is per-row expression work on the scan. */
  def g4Distortion(s: SparkSession, dir: String): DataFrame = {
    val atoms = s.read.parquet(graft.sources.SeedFixture.path)
    val seeds = s.read.parquet(graft.sources.SeedFixture.cellsPath)
      .select(col("seed_uuid"))
    val draws = s.range(0, G4Draws).select(col("id").cast("int").as("draw"))
    var grid = seeds.crossJoin(broadcast(draws))
    for (a <- 0 until 3; b <- 0 until 3) {
      val g = ihGauss(concat_ws(":", lit("dist"), col("seed_uuid"),
        col("draw"), lit(a), lit(b)))
      val e = if (a == b) lit(1.0) + g * lit(0.02) else g * lit(0.02)
      grid = grid.withColumn(s"m$a$b", e)
    }
    grid = grid.withColumn("det",
      col("m00") * (col("m11") * col("m22") - col("m12") * col("m21")) -
        col("m01") * (col("m10") * col("m22") - col("m12") * col("m20")) +
        col("m02") * (col("m10") * col("m21") - col("m11") * col("m20")))
    def pos(axis: Int): Column = {
      val strained = col("x") * col(s"m0$axis") +
        col("y") * col(s"m1$axis") + col("z") * col(s"m2$axis")
      val rat = ihGauss(concat_ws(":", lit("rat"), col("seed_uuid"),
        col("draw"), col("atom_idx"), lit(axis)))
      strained + rat * lit(0.001)
    }
    atoms.join(broadcast(grid), "seed_uuid")
      .select(
        md5(concat_ws(":", lit("dist"), col("seed_uuid"), col("draw")))
          .as("uuid"),
        col("seed_uuid").as("group_uuid"),
        lit("dist").as("config_type"),
        col("draw"),
        col("n").cast("long").as("n"),
        col("atom_idx"),
        col("element"),
        pos(0).as("x"), pos(1).as("y"), pos(2).as("z"),
        col("det"))
  }

  /** G13 supercell, oracle-green since r8, ATOM-LEVEL — the
    * relational twin of Generators.supercell for the diagonal
    * (2,2,1) spec (reference: matdb/transforms.py:54–90): each seed
    * atom is replicated over the |det M| = 4 lattice translations
    * t = i·a + j·b (i, j ∈ {0, 1}), new position = p + (i·a + j·b)
    * with the SAME left-to-right IEEE association in Spark and
    * DuckDB (i, j ∈ {0, 1} make the products exact, the adds
    * correctly rounded — bit-equal across engines), cell-major atom
    * ordering shift_idx·n + atom_idx exactly like the kernel's
    * `for t <- cart; p <- positions`. The oracle therefore checks
    * the replicated GEOMETRY, not just counts; MaterialsTwinSpec
    * additionally pins twin positions == kernel positions
    * bit-for-bit. Needs the seed-level cell fixture
    * (SeedFixture.cellsPath).
    *
    * Scale shape: a 4-row broadcast cross join (the shift grid) and
    * a broadcast seed→cell join — the corpus scan never shuffles. */
  def g13Supercell(s: SparkSession, dir: String): DataFrame = {
    val atoms = s.read.parquet(graft.sources.SeedFixture.path)
    val cells = s.read.parquet(graft.sources.SeedFixture.cellsPath)
      .withColumnRenamed("seed_uuid", "su_c")
    val shifts = s.range(0, 4).select(
      (col("id") / 2).cast("int").as("i"), (col("id") % 2).cast("int").as("j"))
    val tot = atoms.groupBy(col("seed_uuid").as("su_t"), col("element"))
      .agg(count(lit(1)).as("tc"))
    val sym = tot.groupBy(col("su_t"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("element"),
          when(col("tc") * 4 === 1, lit(""))
            .otherwise((col("tc") * 4).cast("string")).as("cnt")))),
        e => concat(e.getField("element"), e.getField("cnt"))))
        .as("symbols"))
    atoms.crossJoin(broadcast(shifts))
      .join(broadcast(cells), col("seed_uuid") === col("su_c"))
      .join(broadcast(sym), col("seed_uuid") === col("su_t"))
      .select(
        md5(concat_ws(":", lit("sup"), col("seed_uuid"), lit("2,2,1")))
          .as("uuid"),
        col("seed_uuid").as("group_uuid"),
        col("symbols"),
        (col("n") * 4).cast("long").as("n"),
        ((col("i") * 2 + col("j")) * col("n") + col("atom_idx"))
          .as("atom_idx"),
        col("element"),
        (col("x") + (col("i") * col("ax") + col("j") * col("bx"))).as("x"),
        (col("y") + (col("i") * col("ay") + col("j") * col("by"))).as("y"),
        (col("z") + (col("i") * col("az") + col("j") * col("bz"))).as("z"))
  }

  /** G1 enumeration, oracle-green since r8 — the relational form of
    * the Hart–Forcade labeling walk (PRB 77, 224115; reference:
    * database/enumerated.py:354–448 delegating to phenum). The
    * combinatorial kernel (Enumerated.labelingsFor) canonicalizes
    * each of the 2ⁿ labelings by MIN over the empty superlattice's
    * space-group site permutations and drops labelings fixed by a
    * nontrivial pure translation (superperiodic = duplicate of a
    * smaller cell). Both rules are pure relational algebra once the
    * site-permutation group is a RELATION — which the committed
    * enum_group fixture provides (SeedFixture.enumGroupDf, generated
    * by the kernel's own siteSymmetry): labelings = a range join
    * (code < 2ⁿ), the orbit = labelings × group-ops with digit
    * (code >> maps_to) % 2, canonical = MIN(permuted) per code,
    * superperiodic = EXISTS translation-op with permuted = original.
    * MaterialsTwinSpec pins twin (size, hnf_index, labeling, symbols)
    * set == kernel set, and the fixture == a siteSymmetry recompute.
    *
    * Scale shape: the (size × HNF-class) grid is the distributed
    * axis; each class's 2ⁿ × |group| orbit work is an equi-join on
    * (size, hnf_index) — labelings never leave their class partition,
    * and the group table is broadcast-sized. At real enumeration
    * scale (n ≈ 20, 10⁶ labelings/class) the same plan holds with
    * the code range generated per-class. */
  def g1Enumerated(s: SparkSession, dir: String): DataFrame = {
    val ops = s.read.parquet(graft.sources.SeedFixture.enumGroupPath)
    val grid = ops.select(col("size"), col("hnf_index"), col("n")).distinct()
    val codes = s.range(0, 16).select(col("id").as("code"))
    val labelings = grid.join(broadcast(codes),
      col("code") < expr("shiftleft(1, n)"))
    val sites = s.range(0, 4).select(col("id").as("site_idx"))
    val orig = labelings.join(broadcast(sites), col("site_idx") < col("n"))
      .withColumn("digit", expr("shiftright(code, site_idx) % 2"))
      .groupBy(col("size"), col("hnf_index"), col("n"), col("code"))
      .agg(concat_ws(",", transform(
        array_sort(collect_list(struct(col("site_idx"), col("digit")))),
        _.getField("digit"))).as("orig"))
    val perOp = labelings.join(ops, Seq("size", "hnf_index", "n"))
      .withColumn("digit", expr("shiftright(code, maps_to) % 2"))
      .groupBy(col("size"), col("hnf_index"), col("n"), col("code"),
        col("op_id"), col("is_translation"))
      .agg(concat_ws(",", transform(
        array_sort(collect_list(struct(col("site_idx"), col("digit")))),
        _.getField("digit"))).as("permuted"))
    val canon = perOp.join(orig, Seq("size", "hnf_index", "n", "code"))
      .groupBy(col("size"), col("hnf_index"), col("n"), col("code"))
      .agg(min(col("permuted")).as("canonical"),
        max(when(col("is_translation") && col("permuted") === col("orig"),
          1).otherwise(0)).as("superper"))
      .where(col("superper") === 0)
    val uniq = canon
      .select(col("size"), col("hnf_index"), col("n"), col("canonical"))
      .distinct()
      .withColumn("pd", length(translate(col("canonical"), "0,", "")))
    def part(el: String, cnt: Column): Column =
      when(cnt === 0, lit("")).when(cnt === 1, lit(el))
        .otherwise(concat(lit(el), cnt.cast("string")))
    uniq.select(col("size"), col("hnf_index"),
      col("canonical").as("labeling"),
      md5(concat_ws(":", lit("enum"), lit("fcc"), col("size"),
        col("hnf_index"), col("canonical"))).as("uuid"),
      concat(part("Ag", col("n") - col("pd")), part("Pd", col("pd")))
        .as("symbols"))
  }

  /** G1 nconfigs sampling (enumerated.py:354–448): keyed-digest rank
    * over the enumeration — md5(seed:uuid) orders the structures
    * pseudo-randomly but deterministically, and orderBy+limit
    * compiles to TakeOrderedAndProject (per-partition top-n, no
    * global sort materialization). Oracle-green since r8 on top of
    * the g1 twin. */
  def g1EnumSampled(s: SparkSession, dir: String): DataFrame = {
    val nconfigs = 12
    val seed = 42
    g1Enumerated(s, dir)
      .withColumn("__r", md5(concat_ws(":", lit(seed), col("uuid"))))
      .orderBy(col("__r"))
      .limit(nconfigs)
      .drop("__r")
  }

  /** G9 prototype decoration, oracle-green since r8 — the relational
    * twin of Prototypes.generate (reference: database/prototype.py:
    * 228–260 product loop, 262–292 permutation restriction): the
    * prototype library's site-count table is a committed fixture
    * (SeedFixture.protoSitesPath), the species-permutation grid for
    * (Ag, Pd) a 6-row literal relation, and the decorated
    * stoichiometry (slot → element counts → compressed formula) pure
    * group-by/string work — the arity ≤ |species| guard falls out of
    * the inner join. The geometric decoration (vegard lattice
    * parameter, fractional → cartesian) stays the JVM kernel
    * (Prototypes.decorate) with its PipelineSpec pins; MaterialsTwin-
    * Spec asserts the twin's (prototype, perm, symbols, n) set equals
    * the kernel surface's exactly.
    *
    * Scale shape: library × perms is a broadcast-sized grid; one
    * group-by on (prototype, perm) — at a real library scale (10⁵
    * protos × large alloy spaces) the grid shards by prototype and
    * nothing else shuffles. */
  def g9Prototypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sites = s.read.parquet(graft.sources.SeedFixture.protoSitesPath)
    val perms = Seq(
      (1, "Ag", 0, "Ag"), (1, "Pd", 0, "Pd"),
      (2, "Ag-Pd", 0, "Ag"), (2, "Ag-Pd", 1, "Pd"),
      (2, "Pd-Ag", 0, "Pd"), (2, "Pd-Ag", 1, "Ag"))
      .toDF("p_arity", "perm", "p_slot", "element")
    val elCounts = sites
      .join(broadcast(perms),
        col("arity") === col("p_arity") && col("slot") === col("p_slot"))
      .groupBy(col("proto_name"), col("nsites"), col("perm"),
        col("element"))
      .agg(sum(col("slot_cnt")).as("ec"))
    elCounts.groupBy(col("proto_name"), col("nsites"), col("perm"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("element"),
          when(col("ec") === 1, lit("")).otherwise(col("ec").cast("string"))
            .as("cnt")))),
        e => concat(e.getField("element"), e.getField("cnt"))))
        .as("symbols"))
      .select(
        md5(concat_ws(":", lit("proto"), col("proto_name"), col("perm")))
          .as("uuid"),
        col("symbols"),
        col("nsites").cast("long").as("n"),
        col("proto_name").as("prototype"),
        col("perm"))
  }

  /** Position quantization for the m6 twin: 2¹⁷ micro-units per Å.
    * Once positions are BIGINT, every cross-row aggregate (centroid
    * sums, Σdisp², species offsets, group sums of energies) is exact
    * integer arithmetic — order-free, so Spark's parallel agg and
    * DuckDB's serial agg agree bit-for-bit. Magnitudes: q ≤ 8.2 Å ×
    * 2¹⁷ ≈ 1.1e6, n·q − Σq ≤ 8.6e6, squared × 24 terms ≈ 1.8e15 —
    * inside both BIGINT and the 2⁵³ exact-double window. */
  private val M6Scale = 131072.0
  private val M6Scale2 = 17179869184.0 // 2^34 = M6Scale²

  /** m6 end-to-end, oracle-green since r8 — the deterministic twin of
    * MaterialsPipeline.endToEnd (reference shape: seed → generate →
    * dedup → calculator extract → split → summary; database/
    * __init__.py setup/extract driver + utility.py:42–165 split
    * sizing). Every stage is the already-oracled twin recipe chained
    * end-to-end:
    *
    *  1. substitution — the g2 twin verbatim (64 md5-ranked draws,
    *     first 8 distinct assignments per seed; C(4,2)=6 caps the
    *     4-atom seed at 6 → 14 configs on the fixture);
    *  2. widen — each config + 2 vacancy variants (g3 recipe:
    *     md5-ranked k-subsets, k = ⌈n/4⌉) + 2 strain variants (g4
    *     recipe: Irwin–Hall(12) strain, σ = 0.02 = √0.0004, no
    *     rattle) → 14 + 28 + 28 = 70 configs;
    *  3. stub energies — StubCalculator's harmonic model
    *     (E = ½k·Σ|rᵢ − r̄|² + species offset, F = −k·disp) replayed
    *     in integer space: positions quantized to 2¹⁷ micro-units,
    *     n²·Σ|rᵢ − r̄|² = Σ(n·q − Σq)² exact BIGINT, species offset
    *     md5-derived (u32 % 1000, the md5 analog of the kernel's
    *     Rng.deriveSeed offset), per-config doubles rebuilt with
    *     mirrored expression trees (IEEE sqrt is correctly-rounded —
    *     exact cross-engine), then re-quantized to energy micro-units
    *     so the GROUP sums are integer again;
    *  4. split — md5-rank with the reference's ceil sizing
    *     (Ntrain = ⌈0.8N⌉, Nhold = ⌈0.8(N−Ntrain)⌉), the relational
    *     analog of Splits.assign's keyed-hash rank;
    *  5. summary — (config_type, bucket) counts + micro-unit-exact
    *     averages.
    *
    * The JVM pipeline (MaterialsPipeline.endToEnd: real Box–Muller
    * draws, Splits.assign's scale-safe ranged rank) stays the library
    * surface with its PipelineSpec pins; MaterialsTwinSpec pins the
    * twin's config census (14/28/28), split sizing, physics
    * (vac/dist energies vs their parent), and determinism.
    *
    * Scale shape: stages 1–2 are generation-grid work (seeds × draws,
    * broadcast joins onto the seed-atom scan); stage 3 is one
    * window + agg keyed by config uuid; stage 4's global rank is
    * control-plane-sized here (the generation grid) — at corpus scale
    * the split IS Splits.assign's ranged rank (o5). */
  def m6EndToEnd(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val atoms = s.read.parquet(graft.sources.SeedFixture.path)
    // stage 1: substitution (g2 twin)
    val draws = s.range(0, 64).select(col("id").cast("int").as("draw"))
    val w = Window.partitionBy(col("seed_uuid"), col("draw"))
      .orderBy(md5(concat_ws(":", lit("sub"), col("seed_uuid"),
        col("draw"), col("atom_idx"))), col("atom_idx"))
    val ranked = atoms.select(col("seed_uuid"), col("atom_idx"), col("n"))
      .crossJoin(broadcast(draws))
      .withColumn("rk", row_number().over(w))
      .withColumn("elem",
        when(col("rk") * 2 <= col("n"), lit("Ag")).otherwise(lit("Pd")))
    val asg = ranked.groupBy(col("seed_uuid"), col("n"), col("draw"))
      .agg(concat_ws(",", transform(
        array_sort(collect_list(struct(col("atom_idx"), col("elem")))),
        _.getField("elem"))).as("assignment"))
    val firsts = asg.groupBy(col("seed_uuid"), col("n"), col("assignment"))
      .agg(min(col("draw")).as("first_draw"))
    val w2 = Window.partitionBy(col("seed_uuid")).orderBy(col("first_draw"))
    // cfgs/cfgAtoms are PINNED once (round 16): the four downstream
    // branches (sub, vacancy sites+pairs, strain grid) each re-ran
    // the substitution window/agg chain — ReuseExchange misses across
    // the branches' differing projections. Both pins are tiny
    // (8 configs per seed × atoms). Eager-by-nature in
    // CacheHygieneSpec.
    val cfgs = firsts.withColumn("pick", row_number().over(w2))
      .where(col("pick") <= 8)
      .select(md5(concat_ws(":", lit("sub"), col("seed_uuid"),
        col("assignment"))).as("cfg_uuid"),
        col("seed_uuid"), col("assignment"))
      .localCheckpoint()
    val cfgAtoms = cfgs.join(atoms, "seed_uuid")
      .select(col("cfg_uuid"), col("atom_idx"),
        element_at(split(col("assignment"), ","),
          (col("atom_idx") + 1).cast("int")).as("element"),
        col("x"), col("y"), col("z"), col("n"))
      .localCheckpoint()
    // stage 2a: the config itself
    val subBranch = cfgAtoms.select(col("cfg_uuid").as("uuid"),
      lit("sub").as("config_type"), col("n").as("n_at"),
      col("atom_idx"), col("element"), col("x"), col("y"), col("z"))
    // stage 2b: vacancy variants (g3 recipe, nconfigs = 2)
    val kOf = expr("(n + 3) div 4")
    val sites = cfgAtoms.select(col("cfg_uuid"), col("atom_idx"), col("n"))
    val singles = sites.where(kOf === 1)
      .select(col("cfg_uuid"), col("n"),
        col("atom_idx").cast("string").as("removed"))
    val sa = sites.select(col("cfg_uuid"), col("n"), col("atom_idx").as("ai"))
    val sb = sites.select(col("cfg_uuid").as("cu_b"), col("atom_idx").as("bi"))
    val pairs = sa.join(sb, col("cfg_uuid") === col("cu_b") &&
        col("ai") < col("bi"))
      .where(kOf === 2)
      .select(col("cfg_uuid"), col("n"),
        concat_ws(",", col("ai"), col("bi")).as("removed"))
    val wv = Window.partitionBy(col("cfg_uuid"))
      .orderBy(md5(concat_ws(":", lit("vac"), col("cfg_uuid"),
        col("removed"))), col("removed"))
    val vacPicked = singles.union(pairs)
      .withColumn("pick", row_number().over(wv))
      .where(col("pick") <= 2)
      .select(col("cfg_uuid"), col("removed"),
        (col("n") - expr("(n + 3) div 4")).as("n_keep"))
    val vacBranch = vacPicked.join(cfgAtoms, "cfg_uuid")
      .where(!array_contains(split(col("removed"), ","),
        col("atom_idx").cast("string")))
      .select(md5(concat_ws(":", lit("vac"), col("cfg_uuid"),
        col("removed"))).as("uuid"),
        lit("vac").as("config_type"), col("n_keep").as("n_at"),
        col("atom_idx"), col("element"), col("x"), col("y"), col("z"))
    // stage 2c: strain variants (g4 recipe, 2 draws, no rattle)
    val ddraws = s.range(0, 2).select(col("id").cast("int").as("draw"))
    var grid = cfgs.select(col("cfg_uuid")).crossJoin(broadcast(ddraws))
    for (p <- 0 until 3; q <- 0 until 3) {
      val g = ihGauss(concat_ws(":", lit("m6d"), col("cfg_uuid"),
        col("draw"), lit(p), lit(q)))
      val e = if (p == q) lit(1.0) + g * lit(0.02) else g * lit(0.02)
      grid = grid.withColumn(s"m$p$q", e)
    }
    def spos(axis: Int): Column =
      col("x") * col(s"m0$axis") + col("y") * col(s"m1$axis") +
        col("z") * col(s"m2$axis")
    val distBranch = cfgAtoms.join(broadcast(grid), "cfg_uuid")
      .select(md5(concat_ws(":", lit("dist"), col("cfg_uuid"),
        col("draw"))).as("uuid"),
        lit("dist").as("config_type"), col("n").as("n_at"),
        col("atom_idx"), col("element"),
        spos(0).as("x"), spos(1).as("y"), spos(2).as("z"))
    val widened = subBranch.unionByName(vacBranch).unionByName(distBranch)
    // stage 3: integer-quantized stub energies
    val quant = widened
      .withColumn("qx", round(col("x") * lit(M6Scale)).cast("long"))
      .withColumn("qy", round(col("y") * lit(M6Scale)).cast("long"))
      .withColumn("qz", round(col("z") * lit(M6Scale)).cast("long"))
      .withColumn("offa",
        conv(substring(md5(concat(lit("el:"), col("element"))), 1, 8),
          16, 10).cast("long") % 1000)
    val wc = Window.partitionBy(col("uuid"))
    val dev = quant
      .withColumn("sx", sum(col("qx")).over(wc))
      .withColumn("sy", sum(col("qy")).over(wc))
      .withColumn("sz", sum(col("qz")).over(wc))
    val perCfg = dev.groupBy(col("uuid"), col("config_type"), col("n_at"))
      .agg(sum(
        (col("n_at") * col("qx") - col("sx")) *
          (col("n_at") * col("qx") - col("sx")) +
        (col("n_at") * col("qy") - col("sy")) *
          (col("n_at") * col("qy") - col("sy")) +
        (col("n_at") * col("qz") - col("sz")) *
          (col("n_at") * col("qz") - col("sz"))).as("ss"),
        sum(col("offa")).as("off"))
    val en = perCfg
      .withColumn("energy",
        lit(0.5) * col("ss").cast("double") /
          (col("n_at") * col("n_at")).cast("double") / lit(M6Scale2) +
          col("off").cast("double") / lit(1000.0))
      .withColumn("fnorm",
        sqrt(col("ss").cast("double") /
          (col("n_at") * col("n_at")).cast("double") / lit(M6Scale2)))
      .withColumn("e_micro", round(col("energy") * lit(1000000.0)).cast("long"))
      .withColumn("f_micro", round(col("fnorm") * lit(1000000.0)).cast("long"))
    // stage 4: md5-rank split with the reference's ceil sizing
    val ws = Window.orderBy(md5(concat_ws(":", lit("split"), col("uuid"))),
      col("uuid"))
    val split4 = en
      .withColumn("rk", row_number().over(ws).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
      .withColumn("n_train", ceil(col("nn").cast("double") * lit(0.8)))
      .withColumn("n_hold",
        ceil((col("nn") - col("n_train")).cast("double") * lit(0.8)))
      .withColumn("bucket",
        when(col("rk") <= col("n_train"), "train")
          .when(col("rk") <= col("n_train") + col("n_hold"), "holdout")
          .otherwise("super"))
    // stage 5: summary with micro-unit-exact averages
    split4.groupBy(col("config_type"), col("bucket"))
      .agg(count(lit(1)).as("n_configs"),
        (sum(col("e_micro")).cast("double") / lit(1000000.0) /
          count(lit(1)).cast("double")).as("avg_energy"),
        (sum(col("f_micro")).cast("double") / lit(1000000.0) /
          count(lit(1)).cast("double")).as("avg_fnorm"))
  }

  /** G8 hessian eigen-explode, oracle-green since r8 — the
    * cross-engine-deterministic fixed-sweep Jacobi twin
    * (operators/JacobiEigen.scala: relational central-difference H
    * assembly over the committed 2-atom seed fixture, then cyclic
    * Jacobi built from correctly-rounded IEEE ops only). The Breeze
    * kernel (MaterialsPipeline.hessianSlice → Hessian.eigenConfigs,
    * LAPACK dsyevd) stays the library surface under PipelineSpec /
    * GeneratorsSpec; JacobiEigenSpec pins the two spectra against
    * each other to 1e-9. */
  def g8HessianEigen(s: SparkSession, dir: String): DataFrame =
    graft.operators.JacobiEigen.g8Twin(s, dir)

  /** DuckDB twin of g4Distortion, generated term-for-term from the
    * same (a, b, t) loops so the expression trees — and therefore
    * every IEEE rounding — match the Spark side exactly. */
  private def g4DistortionSql: String = {
    val mCols = (for (a <- 0 until 3; b <- 0 until 3) yield {
      val ih = ihGaussSql(s"'dist',s.seed_uuid,d.draw,$a,$b")
      val e = if (a == b) s"1.0 + $ih * 0.02" else s"$ih * 0.02"
      s"  $e AS m$a$b"
    }).mkString(",\n")
    def pos(axis: Int): String = {
      val ih = ihGaussSql(s"'rat',a.seed_uuid,g.draw,a.atom_idx,$axis")
      s"(a.x*g.m0$axis + a.y*g.m1$axis + a.z*g.m2$axis) + $ih * 0.001"
    }
    s"""WITH seeds AS (
       | SELECT seed_uuid FROM
       |  read_parquet('${graft.sources.SeedFixture.cellsPath}/*.parquet')),
       |draws AS (SELECT CAST(r AS INT) AS draw FROM range(0, $G4Draws) t(r)),
       |grid0 AS (
       | SELECT s.seed_uuid, d.draw,
       |$mCols
       | FROM seeds s CROSS JOIN draws d),
       |grid AS (
       | SELECT *,
       |  m00*(m11*m22 - m12*m21) - m01*(m10*m22 - m12*m20)
       |   + m02*(m10*m21 - m11*m20) AS det
       | FROM grid0),
       |atoms AS (
       | SELECT seed_uuid, atom_idx, element, x, y, z, n
       | FROM read_parquet('${graft.sources.SeedFixture.path}/*.parquet'))
       |SELECT md5(concat_ws(':', 'dist', a.seed_uuid, g.draw)) AS uuid,
       | a.seed_uuid AS group_uuid, 'dist' AS config_type, g.draw,
       | CAST(a.n AS BIGINT) AS n, a.atom_idx, a.element,
       | ${pos(0)} AS x,
       | ${pos(1)} AS y,
       | ${pos(2)} AS z,
       | g.det
       |FROM atoms a JOIN grid g ON g.seed_uuid = a.seed_uuid
       |ORDER BY group_uuid, g.draw, atom_idx""".stripMargin
  }

  /** DuckDB twin of m6EndToEnd — each CTE mirrors one Spark stage,
    * with the strain terms generated from the same (p, q, t) loops so
    * every IEEE rounding matches (the g4 discipline, chained). */
  private def m6Sql: String = {
    val mCols = (for (p <- 0 until 3; q <- 0 until 3) yield {
      val ih = ihGaussSql(s"'m6d',c.cfg_uuid,d.draw,$p,$q")
      val e = if (p == q) s"1.0 + $ih * 0.02" else s"$ih * 0.02"
      s"  $e AS m$p$q"
    }).mkString(",\n")
    s"""WITH atoms AS (
       | SELECT seed_uuid, atom_idx, element, x, y, z, n
       | FROM read_parquet('${graft.sources.SeedFixture.path}/*.parquet')),
       |draws AS (SELECT CAST(r AS INT) AS draw FROM range(0, 64) t(r)),
       |ranked AS (
       | SELECT a.seed_uuid, a.n, d.draw, a.atom_idx,
       |  ROW_NUMBER() OVER (PARTITION BY a.seed_uuid, d.draw
       |   ORDER BY md5(concat_ws(':', 'sub', a.seed_uuid, d.draw,
       |    a.atom_idx)), a.atom_idx) AS rk
       | FROM atoms a CROSS JOIN draws d),
       |asg AS (
       | SELECT seed_uuid, n, draw,
       |  string_agg(CASE WHEN rk * 2 <= n THEN 'Ag' ELSE 'Pd' END,
       |   ',' ORDER BY atom_idx) AS assignment
       | FROM ranked GROUP BY seed_uuid, n, draw),
       |firsts AS (
       | SELECT seed_uuid, n, assignment, MIN(draw) AS first_draw
       | FROM asg GROUP BY seed_uuid, n, assignment),
       |cfgs AS (
       | SELECT md5(concat_ws(':', 'sub', seed_uuid, assignment))
       |   AS cfg_uuid, seed_uuid, assignment
       | FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY seed_uuid
       |    ORDER BY first_draw) AS pick FROM firsts)
       | WHERE pick <= 8),
       |cfg_atoms AS (
       | SELECT c.cfg_uuid, a.atom_idx,
       |  string_split(c.assignment, ',')[a.atom_idx + 1] AS element,
       |  a.x, a.y, a.z, a.n
       | FROM cfgs c JOIN atoms a ON a.seed_uuid = c.seed_uuid),
       |vac_cand AS (
       | SELECT cfg_uuid, n, CAST(atom_idx AS VARCHAR) AS removed
       | FROM cfg_atoms WHERE (n + 3) // 4 = 1
       | UNION ALL
       | SELECT a.cfg_uuid, a.n,
       |  concat_ws(',', a.atom_idx, b.atom_idx) AS removed
       | FROM cfg_atoms a JOIN cfg_atoms b
       |  ON a.cfg_uuid = b.cfg_uuid AND a.atom_idx < b.atom_idx
       | WHERE (a.n + 3) // 4 = 2),
       |vac_picked AS (
       | SELECT cfg_uuid, removed, n - (n + 3) // 4 AS n_keep
       | FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cfg_uuid
       |    ORDER BY md5(concat_ws(':', 'vac', cfg_uuid, removed)),
       |     removed) AS pick
       |   FROM vac_cand)
       | WHERE pick <= 2),
       |dgrid AS (
       | SELECT c.cfg_uuid, d.draw,
       |$mCols
       | FROM cfgs c CROSS JOIN draws d WHERE d.draw < 2),
       |widened AS (
       | SELECT cfg_uuid AS uuid, 'sub' AS config_type, n AS n_at,
       |  atom_idx, element, x, y, z
       | FROM cfg_atoms
       | UNION ALL
       | SELECT md5(concat_ws(':', 'vac', v.cfg_uuid, v.removed)),
       |  'vac', v.n_keep, a.atom_idx, a.element, a.x, a.y, a.z
       | FROM vac_picked v JOIN cfg_atoms a ON a.cfg_uuid = v.cfg_uuid
       | WHERE NOT list_contains(string_split(v.removed, ','),
       |   CAST(a.atom_idx AS VARCHAR))
       | UNION ALL
       | SELECT md5(concat_ws(':', 'dist', a.cfg_uuid, g.draw)),
       |  'dist', a.n, a.atom_idx, a.element,
       |  a.x*g.m00 + a.y*g.m10 + a.z*g.m20,
       |  a.x*g.m01 + a.y*g.m11 + a.z*g.m21,
       |  a.x*g.m02 + a.y*g.m12 + a.z*g.m22
       | FROM cfg_atoms a JOIN dgrid g ON g.cfg_uuid = a.cfg_uuid),
       |quant AS (
       | SELECT uuid, config_type, n_at,
       |  CAST(round(x * 131072.0) AS BIGINT) AS qx,
       |  CAST(round(y * 131072.0) AS BIGINT) AS qy,
       |  CAST(round(z * 131072.0) AS BIGINT) AS qz,
       |  CAST(('0x'||substr(md5('el:'||element),1,8)) AS BIGINT) % 1000
       |   AS offa
       | FROM widened),
       |dev AS (
       | SELECT *,
       |  SUM(qx) OVER (PARTITION BY uuid) AS sx,
       |  SUM(qy) OVER (PARTITION BY uuid) AS sy,
       |  SUM(qz) OVER (PARTITION BY uuid) AS sz
       | FROM quant),
       |per_cfg AS (
       | SELECT uuid, config_type, n_at,
       |  SUM((n_at*qx - sx)*(n_at*qx - sx)
       |    + (n_at*qy - sy)*(n_at*qy - sy)
       |    + (n_at*qz - sz)*(n_at*qz - sz)) AS ss,
       |  SUM(offa) AS off
       | FROM dev GROUP BY uuid, config_type, n_at),
       |en AS (
       | SELECT uuid, config_type,
       |  CAST(round((0.5 * CAST(ss AS DOUBLE)
       |    / CAST(n_at * n_at AS DOUBLE) / 17179869184.0
       |    + CAST(off AS DOUBLE) / 1000.0) * 1000000.0) AS BIGINT)
       |   AS e_micro,
       |  CAST(round(sqrt(CAST(ss AS DOUBLE)
       |    / CAST(n_at * n_at AS DOUBLE) / 17179869184.0) * 1000000.0)
       |   AS BIGINT) AS f_micro
       | FROM per_cfg),
       |splitted AS (
       | SELECT *,
       |  ROW_NUMBER() OVER (ORDER BY md5(concat_ws(':', 'split', uuid)),
       |   uuid) AS rk,
       |  COUNT(*) OVER () AS nn
       | FROM en),
       |bucketed AS (
       | SELECT *,
       |  CAST(ceil(CAST(nn AS DOUBLE) * 0.8) AS BIGINT) AS n_train,
       |  CAST(ceil(CAST(nn - CAST(ceil(CAST(nn AS DOUBLE) * 0.8)
       |    AS BIGINT) AS DOUBLE) * 0.8) AS BIGINT) AS n_hold
       | FROM splitted)
       |SELECT config_type,
       | CASE WHEN rk <= n_train THEN 'train'
       |      WHEN rk <= n_train + n_hold THEN 'holdout'
       |      ELSE 'super' END AS bucket,
       | COUNT(*) AS n_configs,
       | CAST(SUM(e_micro) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
       |  AS avg_energy,
       | CAST(SUM(f_micro) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
       |  AS avg_fnorm
       |FROM bucketed
       |GROUP BY config_type, bucket
       |ORDER BY config_type, bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_enumerated" -> (g1Enumerated _),
    "g1_enum_sampled" -> (g1EnumSampled _),
    "g9_prototypes" -> (g9Prototypes _),
    "g2_substitution" -> (g2Substitution _),
    "g3_vacancy" -> (g3Vacancy _),
    "g4_distortion" -> (g4Distortion _),
    "g13_supercell" -> (g13Supercell _),
    "g8_hessian_eigen" -> (g8HessianEigen _),
    "m6_materials_e2e" -> (m6EndToEnd _),
  )

  /** DuckDB twin of g1Enumerated — the labeling walk as SQL over the
    * committed group relation. */
  private def g1Sql: String =
    s"""WITH ops AS (
       | SELECT size, hnf_index, n, op_id, site_idx, maps_to,
       |  is_translation
       | FROM read_parquet('${graft.sources.SeedFixture.enumGroupPath}/*.parquet')),
       |grid AS (SELECT DISTINCT size, hnf_index, n FROM ops),
       |codes AS (SELECT r AS code FROM range(0, 16) t(r)),
       |labelings AS (
       | SELECT g.size, g.hnf_index, g.n, c.code
       | FROM grid g JOIN codes c ON c.code < (1 << g.n)),
       |orig AS (
       | SELECT l.size, l.hnf_index, l.n, l.code,
       |  string_agg(CAST((l.code >> s.r) % 2 AS VARCHAR), ','
       |   ORDER BY s.r) AS orig
       | FROM labelings l JOIN range(0, 4) s(r) ON s.r < l.n
       | GROUP BY 1, 2, 3, 4),
       |per_op AS (
       | SELECT l.size, l.hnf_index, l.n, l.code, o.op_id,
       |  o.is_translation,
       |  string_agg(CAST((l.code >> o.maps_to) % 2 AS VARCHAR), ','
       |   ORDER BY o.site_idx) AS permuted
       | FROM labelings l JOIN ops o
       |  ON o.size = l.size AND o.hnf_index = l.hnf_index
       | GROUP BY 1, 2, 3, 4, 5, 6),
       |canon AS (
       | SELECT p.size, p.hnf_index, p.n, p.code,
       |  MIN(p.permuted) AS canonical,
       |  MAX(CASE WHEN p.is_translation AND p.permuted = r.orig
       |    THEN 1 ELSE 0 END) AS superper
       | FROM per_op p JOIN orig r ON r.size = p.size
       |  AND r.hnf_index = p.hnf_index AND r.code = p.code
       | GROUP BY 1, 2, 3, 4),
       |uniq AS (
       | SELECT DISTINCT size, hnf_index, n, canonical
       | FROM canon WHERE superper = 0),
       |sym AS (
       | SELECT size, hnf_index, n, canonical,
       |  length(translate(canonical, '0,', '')) AS pd
       | FROM uniq)
       |SELECT size, hnf_index, canonical AS labeling,
       | md5(concat_ws(':', 'enum', 'fcc', size, hnf_index, canonical))
       |  AS uuid,
       | (CASE WHEN n - pd = 0 THEN '' WHEN n - pd = 1 THEN 'Ag'
       |   ELSE 'Ag' || CAST(n - pd AS VARCHAR) END) ||
       | (CASE WHEN pd = 0 THEN '' WHEN pd = 1 THEN 'Pd'
       |   ELSE 'Pd' || CAST(pd AS VARCHAR) END) AS symbols
       |FROM sym
       |ORDER BY size, hnf_index, labeling""".stripMargin

  /** g2/g3/g4/g13/g9/m6/g1 are oracle-checked since r8 via the
    * committed seed/library/group fixtures + md5-keyed deterministic
    * twins (g4's Gaussians are Irwin–Hall integer sums — the
    * Box–Muller ln/cos the kernel uses is exactly the libm-ulp
    * divergence class the twins exist to avoid; m6 chains the
    * g2/g3/g4 recipes through integer-quantized stub energies and an
    * md5-rank split; g1 replays the Hart–Forcade labeling canon over
    * the committed site-permutation group). g8 is oracle-checked too:
    * the fixed-sweep Jacobi twin (JacobiEigen.oracleG8) replays the
    * JVM kernel bit-for-bit in unrolled DuckDB CTEs; the Breeze/LAPACK
    * eigensolver remains the library-tier path, pinned to the Jacobi
    * spectrum at 1e-9 by spec. */
  val oracle: Map[String, String] = Map(
    "g8_hessian_eigen" -> graft.operators.JacobiEigen.oracleG8,
    "g1_enumerated" -> g1Sql,
    "g1_enum_sampled" ->
      s"""WITH g1 AS ($g1Sql),
         |sampled AS (
         | SELECT * FROM g1
         | ORDER BY md5(concat_ws(':', 42, uuid)), uuid LIMIT 12)
         |SELECT size, hnf_index, labeling, uuid, symbols FROM sampled
         |ORDER BY size, hnf_index, labeling""".stripMargin,
    "g4_distortion" -> g4DistortionSql,
    "m6_materials_e2e" -> m6Sql,
    "g2_substitution" ->
      s"""WITH draws AS (SELECT r AS draw FROM range(0, 64) t(r)),
         |atoms AS (
         | SELECT seed_uuid, atom_idx, n
         | FROM read_parquet('${graft.sources.SeedFixture.path}/*.parquet')),
         |ranked AS (
         | SELECT a.seed_uuid, a.n, d.draw, a.atom_idx,
         |  ROW_NUMBER() OVER (PARTITION BY a.seed_uuid, d.draw
         |   ORDER BY md5(concat_ws(':', 'sub', a.seed_uuid, d.draw,
         |    a.atom_idx)), a.atom_idx) AS rk
         | FROM atoms a CROSS JOIN draws d),
         |asg AS (
         | SELECT seed_uuid, n, draw,
         |  string_agg(CASE WHEN rk * 2 <= n THEN 'Ag' ELSE 'Pd' END,
         |   ',' ORDER BY atom_idx) AS assignment
         | FROM ranked GROUP BY seed_uuid, n, draw),
         |firsts AS (
         | SELECT seed_uuid, n, assignment, MIN(draw) AS first_draw
         | FROM asg GROUP BY seed_uuid, n, assignment),
         |picked AS (
         | SELECT *, ROW_NUMBER() OVER (PARTITION BY seed_uuid
         |   ORDER BY first_draw) AS pick
         | FROM firsts)
         |SELECT md5(concat_ws(':', 'sub', seed_uuid, assignment)) AS uuid,
         | seed_uuid AS group_uuid,
         | 'Ag' || (n // 2) || 'Pd' || (n // 2) AS symbols,
         | n::BIGINT AS n, 'sub' AS config_type, assignment
         |FROM picked WHERE pick <= 8
         |ORDER BY uuid""".stripMargin,
    "g3_vacancy" ->
      s"""WITH atoms AS (
         | SELECT seed_uuid, atom_idx, element, n
         | FROM read_parquet('${graft.sources.SeedFixture.path}/*.parquet')),
         |singles AS (
         | SELECT seed_uuid, n, CAST(atom_idx AS VARCHAR) AS removed
         | FROM atoms WHERE (n + 3) // 4 = 1),
         |pairs AS (
         | SELECT a.seed_uuid, a.n,
         |  concat_ws(',', a.atom_idx, b.atom_idx) AS removed
         | FROM atoms a JOIN atoms b
         |  ON a.seed_uuid = b.seed_uuid AND a.atom_idx < b.atom_idx
         | WHERE (a.n + 3) // 4 = 2),
         |removals AS (
         | SELECT * FROM singles UNION ALL SELECT * FROM pairs),
         |picked AS (
         | SELECT *, ROW_NUMBER() OVER (PARTITION BY seed_uuid
         |   ORDER BY md5(concat_ws(':', 'vac', seed_uuid, removed)),
         |    removed) AS pick
         | FROM removals QUALIFY pick <= 4),
         |rem_atoms AS (
         | SELECT seed_uuid, removed,
         |  CAST(UNNEST(string_split(removed, ',')) AS INT) AS rm_idx
         | FROM picked),
         |rem_cnt AS (
         | SELECT r.seed_uuid, r.removed, a.element, COUNT(*) AS rc
         | FROM rem_atoms r JOIN atoms a
         |  ON a.seed_uuid = r.seed_uuid AND a.atom_idx = r.rm_idx
         | GROUP BY 1, 2, 3),
         |tot AS (
         | SELECT seed_uuid, element, COUNT(*) AS tc FROM atoms
         | GROUP BY 1, 2),
         |kept AS (
         | SELECT p.seed_uuid, p.n, p.removed, t.element,
         |  t.tc - COALESCE(rc.rc, 0) AS kc
         | FROM picked p
         | JOIN tot t ON t.seed_uuid = p.seed_uuid
         | LEFT JOIN rem_cnt rc ON rc.seed_uuid = p.seed_uuid
         |  AND rc.removed = p.removed AND rc.element = t.element
         | WHERE t.tc - COALESCE(rc.rc, 0) > 0),
         |sym AS (
         | SELECT seed_uuid, n, removed,
         |  string_agg(element || CASE WHEN kc = 1 THEN ''
         |    ELSE CAST(kc AS VARCHAR) END, '' ORDER BY element)
         |   AS symbols
         | FROM kept GROUP BY 1, 2, 3)
         |SELECT md5(concat_ws(':', 'vac', seed_uuid, removed)) AS uuid,
         | seed_uuid AS group_uuid, symbols,
         | CAST(n - (n + 3) // 4 AS BIGINT) AS n,
         | 'vac' AS config_type, removed
         |FROM sym ORDER BY uuid""".stripMargin,
    "g13_supercell" ->
      s"""WITH atoms AS (
         | SELECT seed_uuid, atom_idx, element, x, y, z, n
         | FROM read_parquet('${graft.sources.SeedFixture.path}/*.parquet')),
         |cells AS (
         | SELECT * FROM
         |  read_parquet('${graft.sources.SeedFixture.cellsPath}/*.parquet')),
         |shifts AS (
         | SELECT r // 2 AS i, r % 2 AS j FROM range(0, 4) t(r)),
         |tot AS (
         | SELECT seed_uuid, element, COUNT(*) AS tc FROM atoms
         | GROUP BY 1, 2),
         |sym AS (
         | SELECT seed_uuid,
         |  string_agg(element || CASE WHEN tc * 4 = 1 THEN ''
         |    ELSE CAST(tc * 4 AS VARCHAR) END, '' ORDER BY element)
         |   AS symbols
         | FROM tot GROUP BY 1)
         |SELECT md5(concat_ws(':', 'sup', a.seed_uuid, '2,2,1')) AS uuid,
         | a.seed_uuid AS group_uuid, y.symbols,
         | CAST(a.n * 4 AS BIGINT) AS n,
         | CAST((s.i * 2 + s.j) * a.n + a.atom_idx AS INT) AS atom_idx,
         | a.element,
         | a.x + (s.i * c.ax + s.j * c.bx) AS x,
         | a.y + (s.i * c.ay + s.j * c.by) AS y,
         | a.z + (s.i * c.az + s.j * c.bz) AS z
         |FROM atoms a CROSS JOIN shifts s
         |JOIN cells c ON c.seed_uuid = a.seed_uuid
         |JOIN sym y ON y.seed_uuid = a.seed_uuid
         |ORDER BY group_uuid, atom_idx""".stripMargin,
    "g9_prototypes" ->
      s"""WITH sites AS (
         | SELECT proto_name, arity, nsites, slot, slot_cnt FROM
         |  read_parquet('${graft.sources.SeedFixture.protoSitesPath}/*.parquet')),
         |perms AS (
         | SELECT * FROM (VALUES
         |  (1, 'Ag', 0, 'Ag'), (1, 'Pd', 0, 'Pd'),
         |  (2, 'Ag-Pd', 0, 'Ag'), (2, 'Ag-Pd', 1, 'Pd'),
         |  (2, 'Pd-Ag', 0, 'Pd'), (2, 'Pd-Ag', 1, 'Ag'))
         |  p(p_arity, perm, p_slot, element)),
         |el_counts AS (
         | SELECT s.proto_name, s.nsites, p.perm, p.element,
         |  SUM(s.slot_cnt) AS ec
         | FROM sites s JOIN perms p
         |  ON s.arity = p.p_arity AND s.slot = p.p_slot
         | GROUP BY 1, 2, 3, 4),
         |sym AS (
         | SELECT proto_name, nsites, perm,
         |  string_agg(element || CASE WHEN ec = 1 THEN ''
         |    ELSE CAST(ec AS VARCHAR) END, '' ORDER BY element)
         |   AS symbols
         | FROM el_counts GROUP BY 1, 2, 3)
         |SELECT
         | md5(concat_ws(':', 'proto', proto_name, perm)) AS uuid,
         | symbols, CAST(nsites AS BIGINT) AS n,
         | proto_name AS prototype, perm
         |FROM sym ORDER BY prototype, perm""".stripMargin)
}
