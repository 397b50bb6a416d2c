package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Committed seed-configuration fixture (atom-level parquet) — the
  * r8 recipe that makes materials generators oracle-checkable: the
  * reference's seeds are POSCAR files on disk (tests/AgPd fixtures),
  * which is exactly why the g-family was "code-internal seeds → no
  * oracle"; materializing the SAME seeds as a parquet relation gives
  * DuckDB the generator's input, and an md5-keyed deterministic twin
  * of the generator's randomness then replays end-to-end in SQL
  * (see MaterialsOps.g2Substitution).
  *
  * Schema: one row per atom site —
  * (seed_uuid string, atom_idx int, element string,
  *  x y z double, n int) — seed_uuid is the seed Config's content
  * hash, n its atom count. Regenerate with
  * `sbt "runMain graft.sources.SeedFixture"` (deterministic: seeds
  * are code-defined constants, coalesce(1), sorted). */
object SeedFixture {

  /** Absolute path so the Spark side and the driver's DuckDB process
    * (unknown cwd) read the identical committed file. */
  val path = "/root/repo/fixtures/seed_configs.parquet"

  /** Seed-level lattice vectors (one row per seed: the 3×3 cell,
    * row-major ax..cz) — the g13 supercell twin needs the cell to
    * replicate positions relationally (r8). */
  val cellsPath = "/root/repo/fixtures/seed_cells.parquet"

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.pipeline.MaterialsPipeline.seeds.flatMap { c =>
      c.species.indices.map { i =>
        (c.uuid, i, c.species(i),
          c.positions(i)(0), c.positions(i)(1), c.positions(i)(2), c.n)
      }
    }.toDF("seed_uuid", "atom_idx", "element", "x", "y", "z", "n")
  }

  def cellsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.pipeline.MaterialsPipeline.seeds.map { c =>
      (c.uuid,
        c.cell(0)(0), c.cell(0)(1), c.cell(0)(2),
        c.cell(1)(0), c.cell(1)(1), c.cell(1)(2),
        c.cell(2)(0), c.cell(2)(1), c.cell(2)(2))
    }.toDF("seed_uuid", "ax", "ay", "az", "bx", "by", "bz",
      "cx", "cy", "cz")
  }

  /** Prototype-library site-count table (one row per (prototype,
    * species slot): proto_name, arity, nsites, slot, slot_cnt) — the
    * g9 decoration twin's input relation (r8): with the library
    * materialized, the per-arity selection × species-permutation
    * product loop and the decorated stoichiometry replay in SQL. */
  val protoSitesPath = "/root/repo/fixtures/proto_sites.parquet"

  def protoSitesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.generators.Prototypes.library.flatMap { p =>
      p.basis.groupBy(_._1).toSeq.map { case (slot, xs) =>
        (p.name, p.arity, p.basis.length, slot, xs.length)
      }
    }.toDF("proto_name", "arity", "nsites", "slot", "slot_cnt")
  }

  /** g1 labeling-canon group fixture (r8): one row per (cell-size,
    * HNF-class, space-group op, site) — site_idx → maps_to is the
    * op's site permutation, is_translation marks the nontrivial pure
    * lattice translations (the superperiodic filter). With the group
    * materialized, the Hart–Forcade labeling walk (min-over-orbit
    * canonicalization + superperiodic drop) replays as joins +
    * group-bys in any engine (MaterialsOps.g1Enumerated twin).
    * Surface: fcc a=4.05, sizes 2–4, binary species — the g1 entry's
    * parameters. */
  val enumGroupPath = "/root/repo/fixtures/enum_group.parquet"

  def enumGroupDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pcell = graft.generators.Enumerated.primitiveCell("fcc", 4.05)._1
    val rows = for {
      size <- 2 to 4
      (hnf, idx) <- graft.generators.Enumerated.hnfClasses(pcell, size.toLong)
        .zipWithIndex
      sym = graft.generators.Enumerated.siteSymmetry("fcc", 4.05, hnf)
      superSet = sym.superTrans.map(_.toSeq).toSet
      (perm, opId) <- sym.group.zipWithIndex
      isTrans = superSet.contains(perm.toSeq)
      siteIdx <- perm.indices
    } yield (size, idx, sym.sup.n, opId, siteIdx, perm(siteIdx), isTrans)
    rows.toDF("size", "hnf_index", "n", "op_id", "site_idx", "maps_to",
      "is_translation")
  }

  /** g8 hessian seed fixture (r8): the 2-atom frozen-phonon seed as
    * an atom relation — the input of the Jacobi eigensolver twin
    * (operators/JacobiEigen.scala). Kept SEPARATE from
    * seed_configs.parquet: adding a seed there would change the
    * g2/g3/g4/g13/m6 oracles. */
  val hessianSeedPath = "/root/repo/fixtures/hessian_seed.parquet"

  def hessianSeedDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val c = graft.pipeline.MaterialsPipeline.hessianSeed
    c.species.indices.map { i =>
      (c.uuid, i, c.species(i),
        c.positions(i)(0), c.positions(i)(1), c.positions(i)(2), c.n)
    }.toDF("seed_uuid", "atom_idx", "element", "x", "y", "z", "n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()
    df(spark).coalesce(1)
      .orderBy(col("seed_uuid"), col("atom_idx"))
      .write.mode("overwrite").parquet(path)
    cellsDf(spark).coalesce(1)
      .orderBy(col("seed_uuid"))
      .write.mode("overwrite").parquet(cellsPath)
    protoSitesDf(spark).coalesce(1)
      .orderBy(col("proto_name"), col("slot"))
      .write.mode("overwrite").parquet(protoSitesPath)
    enumGroupDf(spark).coalesce(1)
      .orderBy(col("size"), col("hnf_index"), col("op_id"), col("site_idx"))
      .write.mode("overwrite").parquet(enumGroupPath)
    hessianSeedDf(spark).coalesce(1)
      .orderBy(col("seed_uuid"), col("atom_idx"))
      .write.mode("overwrite").parquet(hessianSeedPath)
    spark.stop()
  }
}
