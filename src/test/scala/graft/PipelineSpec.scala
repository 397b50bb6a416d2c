package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Splits
import graft.pipeline.MaterialsPipeline
import graft.fit.TrainTable
import graft.calculators.StubCalculator

class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("materials end-to-end slice produces split-tagged physics summary") {
    val df = MaterialsPipeline.endToEnd(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getString(0)).toSet
    assert(types.contains("sub") && types.contains("vac") && types.contains("dist"))
    // deterministic replay
    val again = MaterialsPipeline.endToEnd(spark).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("split assignment is reproducible and correctly sized (O5/J6)") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"id$i").toDF("uuid")
    val a1 = Splits.assign(df, "uuid", "s1", 0.8, 42L).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    val a2 = Splits.assign(df, "uuid", "s1", 0.8, 42L).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(a1 === a2) // replay
    val counts = a1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") === 80)   // ceil(100*0.8)
    assert(counts("holdout") === 16) // ceil(20*0.8)
    assert(counts("super") === 4)
    val diffSeed = Splits.assign(df, "uuid", "s1", 0.8, 43L).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(diffSeed !== a1)
  }

  test("hessian slice runs distributed and yields spring eigenvalues") {
    val rows = MaterialsPipeline.hessianSlice(spark).collect()
    assert(rows.length === 3)
    rows.foreach(r => assert(math.abs(r.getDouble(2) - 1.0) < 1e-4))
  }

  test("train-table conform renames calculator keys (F10) and exports CFG") {
    import spark.implicits._
    val calc = StubCalculator()
    val ds = MaterialsPipeline.seedDs(spark).map(calc.extract(_))
    val conformed = TrainTable.conform(ds, "stub")
    conformed.collect().foreach { c =>
      assert(c.params.contains("ref_energy"))
      assert(!c.params.contains("stub_energy"))
    }
    val cfgs = TrainTable.toCfgLines(conformed, Seq("Ag", "Pd")).collect()
    assert(cfgs.length === 2)
    assert(cfgs.forall(_.startsWith("BEGIN_CFG")))
    assert(cfgs.forall(_.contains(" Energy")))
  }
}
