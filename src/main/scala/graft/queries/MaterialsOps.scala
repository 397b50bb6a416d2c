package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Config
import graft.generators.Generators
import graft.pipeline.MaterialsPipeline

/** Materials-domain operator surface (SURVEY §2.2 generators, §2.5
  * dedup, §2.10 pipeline). Mostly rows-only (JVM kernels: Breeze
  * eigendecomposition, combinatorial enumeration) with ScalaTest
  * golden assertions (determinism, physics invariants); g2 is
  * oracle-checked since r8 via the committed seed fixture + an
  * md5-keyed deterministic twin.
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
      .orderBy(col("uuid"))
  }

  def g3Vacancy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MaterialsPipeline.seedDs(s)
      .flatMap(c => Generators.vacancy(c, 0.25, nconfigs = 4, ranSeed = 42L))
      .toDF()
      .select(col("uuid"), col("symbols"), col("n"),
        col("params").getItem("removed").as("removed"))
      .orderBy(col("uuid"))
  }

  def g4Distortion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MaterialsPipeline.seedDs(s)
      .flatMap(c => Generators.distortion(c, nconfigs = 4, covDiag = 0.0004,
        volumeFactor = 1.02, rattle = 0.001, ranSeed = 42L))
      .toDF()
      .select(col("uuid"), col("symbols"), col("n"), col("configType"))
      .orderBy(col("uuid"))
  }

  def g13Supercell(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    MaterialsPipeline.seedDs(s)
      .map(c => Generators.supercell(c, Seq(2, 2, 1)))
      .toDF()
      .select(col("uuid"), col("symbols"), col("n"))
      .orderBy(col("uuid"))
  }

  /** G1 enumeration, distributed over the (size × HNF-class) grid:
    * the point-group-reduced sublattice classes are the Dataset axis;
    * each task enumerates symmetry-unique labelings for its own
    * sublattice (the Spark shape — at scale the grid is huge and
    * labelings never leave their task). Class reduction is O(HNF²·48)
    * integer checks on the driver — cheap next to the labeling walk. */
  def g1Enumerated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pcell = graft.generators.Enumerated.primitiveCell("fcc", 4.05)._1
    val grid = for {
      n <- 2 to 4
      (hnf, idx) <- graft.generators.Enumerated.hnfClasses(pcell, n.toLong)
        .zipWithIndex
    } yield (n, idx, hnf.map(_.toSeq).toSeq)
    s.createDataset(grid).repartition(col("_2"))
      .flatMap { case (n, idx, hnfRows) =>
        val hnf: graft.core.Crystal.IMat = hnfRows.map(_.toArray).toArray
        graft.generators.Enumerated
          .labelingsFor("fcc", 4.05, Seq("Ag", "Pd"), hnf, idx)
          .map(e => (e.size, e.hnfIndex, e.labeling, e.config.uuid,
            e.config.symbols))
      }
      .toDF("size", "hnf_index", "labeling", "uuid", "symbols")
      .orderBy(col("size"), col("hnf_index"), col("labeling"))
  }

  /** G1 nconfigs sampling (enumerated.py:354–448): keyed-digest rank
    * over the distributed enumeration stream — md5(seed:uuid) orders
    * the structures pseudo-randomly but deterministically, and
    * orderBy+limit compiles to TakeOrderedAndProject (per-partition
    * top-n, no global sort materialization). Same grid-distributed
    * kernel as g1Enumerated. */
  def g1EnumSampled(s: SparkSession, dir: String): DataFrame = {
    val nconfigs = 12
    val seed = 42
    g1Enumerated(s, dir)
      .withColumn("__r", md5(concat_ws(":", lit(seed), col("uuid"))))
      .orderBy(col("__r"))
      .limit(nconfigs)
      .drop("__r")
      .orderBy(col("size"), col("hnf_index"), col("labeling"))
  }

  /** G9 prototype decoration: library × species permutations. */
  def g9Prototypes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val protos = graft.generators.Prototypes.generate(
      Seq("all"), Seq("Ag", "Pd"), Map("Ag" -> 4.09, "Pd" -> 3.89))
    s.createDataset(protos).toDF()
      .select(col("uuid"), col("symbols"), col("n"),
        col("params").getItem("prototype").as("prototype"),
        col("params").getItem("perm").as("perm"))
      .orderBy(col("prototype"), col("perm"))
  }

  def m6EndToEnd(s: SparkSession, dir: String): DataFrame =
    MaterialsPipeline.endToEnd(s)

  def g8HessianEigen(s: SparkSession, dir: String): DataFrame =
    MaterialsPipeline.hessianSlice(s)

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

  /** g2 is oracle-checked since r8 via the committed seed fixture +
    * md5-keyed deterministic twin (see g2Substitution); the remaining
    * g-family entries still run JVM kernels (Breeze eigendecompos-
    * ition, combinatorial enumeration) with no SQL twin → rows-only. */
  val oracle: Map[String, String] = Map(
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
         |ORDER BY uuid""".stripMargin)
}
