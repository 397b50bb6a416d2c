package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.calculators.StubCalculator
import graft.core.Config
import graft.generators.{Generators, Hessian}
import graft.operators.Splits

/** The reference's whole shape in miniature, Spark-first (SURVEY §7
  * "minimum end-to-end slice"): seed → generator flatMap → content-
  * hash dedup → calculator extract → split → relational read.
  *
  * Scale notes: the seed table is the unit of parallelism — every
  * stage is a `flatMap`/`map` over it (no driver-side row
  * materialization, unlike the reference's in-RAM AtomsList,
  * atoms.py:585–589); dedup is one shuffle on the content hash;
  * split assignment is a keyed hash rank. At 100 TB the same plan
  * holds with the seeds partitioned by group.
  */
object MaterialsPipeline {

  /** Deterministic AgPd seeds (mirrors tests/AgPd fixtures): a 4-atom
    * conventional fcc cell and its 2×1×1 supercell. */
  def seeds: Seq[Config] = {
    val a = 4.05
    val cell = Seq(Seq(a, 0.0, 0.0), Seq(0.0, a, 0.0), Seq(0.0, 0.0, a))
    val pos = Seq(
      Seq(0.0, 0.0, 0.0), Seq(0.0, a / 2, a / 2),
      Seq(a / 2, 0.0, a / 2), Seq(a / 2, a / 2, 0.0))
    val fcc4 = Config.of(Seq("Ag", "Ag", "Ag", "Ag"), cell, pos,
      configType = Some("seed"))
    Seq(fcc4, Generators.supercell(fcc4, Seq(2, 1, 1)))
  }

  def seedDs(spark: SparkSession): Dataset[Config] = {
    import spark.implicits._
    spark.createDataset(seeds).repartition(2)
  }

  /** generator flatMap → dedup-by-content-hash (D1–D6: the uuid IS the
    * content hash, so dropDuplicates is the anti-join guard). */
  def generate(seeds: Dataset[Config], ranSeed: Long): Dataset[Config] = {
    import seeds.sparkSession.implicits._
    val stoich = Map("Ag" -> 0.5, "Pd" -> 0.5)
    seeds.flatMap(c => Generators.substitution(c, stoich, nconfigs = 8, ranSeed))
      .dropDuplicates("uuid")
  }

  /** Full slice: generate → vacancy+distortion widen → stub-DFT
    * extract → split-tagged summary. */
  def endToEnd(spark: SparkSession, ranSeed: Long = 42L): DataFrame = {
    import spark.implicits._
    val calc = StubCalculator(k = 1.0, ranSeed = ranSeed)
    val gen = generate(seedDs(spark), ranSeed)
    val widened = gen
      .flatMap(c => Seq(c) ++
        Generators.vacancy(c, 0.25, nconfigs = 2, ranSeed) ++
        Generators.distortion(c, 2, covDiag = 0.0004,
          volumeFactor = 1.0, rattle = 0.0, ranSeed = ranSeed))
      .dropDuplicates("uuid")
    val calculated = widened.map(calc.extract(_))
    val assign = Splits.assign(calculated.toDF(), "uuid", "main",
      trainFrac = 0.8, seed = ranSeed)
    calculated.toDF()
      .join(assign.select(col("uuid"), col("bucket")), Seq("uuid"))
      .groupBy(col("configType"), col("bucket"))
      .agg(count(lit(1)).as("n_configs"),
        round(avg(col("energy")), 6).as("avg_energy"),
        round(avg(sqrt(aggregate(flatten(col("force")),
          lit(0.0), (acc, x) => acc + x * x))), 6).as("avg_fnorm"))
      .orderBy(col("configType"), col("bucket"))
  }

  /** The 2-atom hessian seed (shared with the fixture writer so the
    * g8 twin's committed relation and this kernel agree by
    * construction). */
  def hessianSeed: Config = {
    val a = 4.05
    Config.of(Seq("Ag", "Pd"),
      Seq(Seq(a, 0.0, 0.0), Seq(0.0, a, 0.0), Seq(0.0, 0.0, a)),
      Seq(Seq(0.0, 0.0, 0.0), Seq(a / 2, a / 2, a / 2)),
      configType = Some("seed"))
  }

  /** Hessian slice: 2-atom seed → G7 displacements → stub forces →
    * G8 eigen-explode (distributed per-seed via groupByKey). */
  def hessianSlice(spark: SparkSession, ranSeed: Long = 42L): DataFrame = {
    import spark.implicits._
    val calc = StubCalculator(k = 1.0, ranSeed = ranSeed)
    val seed2 = hessianSeed
    val disp = spark.createDataset(Seq(seed2))
      .flatMap(s => Hessian.displacements(s))
      .map(d => d.copy(config = calc.extract(d.config)))
    disp.groupByKey(_.seedUuid)
      .flatMapGroups { (uuid, it) =>
        val ds = it.toSeq
        val seed = seed2 // single-seed slice; general form carries seeds via join
        Hessian.eigenConfigs(seed, ds)
      }
      .toDF()
      .select(col("uuid"), col("configType"),
        round(col("params").getItem("stub_hessian").cast("double"), 6)
          .as("eigenvalue"))
      .orderBy(col("eigenvalue"), col("uuid"))
  }
}
