package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r8 g-family oracle recipe: the committed atom-level
  * seed fixture must mirror the code-defined seeds exactly, and the
  * deterministic g2 twin must honor the generator's semantics
  * (stoichiometry, uniqueness, per-seed cap) — the oracle proves
  * Spark ≡ DuckDB; this spec proves both equal the intended
  * generator behavior. */
class SeedFixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("committed fixture parquet mirrors the code-defined seeds") {
    val committed = spark.read.parquet(graft.sources.SeedFixture.path)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6)))
      .sortBy(t => (t._1, t._2))
    val fresh = graft.sources.SeedFixture.df(spark)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6)))
      .sortBy(t => (t._1, t._2))
    assert(committed.toSeq === fresh.toSeq,
      "fixtures/seed_configs.parquet is stale - rerun " +
        "`sbt \"runMain graft.sources.SeedFixture\"`")
    // two seeds: the 4-atom fcc cell and its 2x1x1 supercell
    assert(committed.map(_._1).distinct.length === 2)
    assert(committed.map(_._7).distinct.sorted.toSeq === Seq(4, 8))
  }

  test("committed cells fixture mirrors the code-defined seed cells") {
    val committed = spark.read.parquet(graft.sources.SeedFixture.cellsPath)
      .collect().map(r => (0 to 9).map(r.get)).sortBy(_.head.toString)
    val fresh = graft.sources.SeedFixture.cellsDf(spark)
      .collect().map(r => (0 to 9).map(r.get)).sortBy(_.head.toString)
    assert(committed.toSeq === fresh.toSeq,
      "fixtures/seed_cells.parquet is stale - rerun " +
        "`sbt \"runMain graft.sources.SeedFixture\"`")
    assert(committed.length === 2)
  }

  test("g2 twin: stoichiometry, uniqueness, per-seed cap, determinism") {
    val out = graft.queries.MaterialsOps.g2Substitution(spark, "")
    val rows = out.collect()
    // per-seed counts: n=4 has only C(4,2)=6 distinct assignments
    // (cap 8 unreachable), n=8 caps at nconfigs=8
    val bySeed = rows.groupBy(_.getString(1)).map { case (g, rs) =>
      rs.head.getLong(3) -> rs.length
    }
    assert(bySeed === Map(4L -> 6, 8L -> 8))
    rows.foreach { r =>
      val asg = r.getString(5).split(",")
      val n = r.getLong(3).toInt
      assert(asg.length === n)
      assert(asg.count(_ == "Ag") === n / 2)
      assert(r.getString(2) === s"Ag${n / 2}Pd${n / 2}")
      assert(r.getString(4) === "sub")
    }
    // assignments unique per seed (the reference's `seen` guard)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getString(5)).distinct.length === rs.length)
    }
    // bit-exact rerun
    val again = graft.queries.MaterialsOps.g2Substitution(spark, "")
      .collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
