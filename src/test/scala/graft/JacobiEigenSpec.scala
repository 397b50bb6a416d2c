package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JacobiEigen

class JacobiEigenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("committed hessian-seed fixture mirrors the code-defined seed") {
    val committed = spark.read
      .parquet(graft.sources.SeedFixture.hessianSeedPath)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6)))
      .toSet
    val fresh = graft.sources.SeedFixture.hessianSeedDf(spark)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getInt(6)))
      .toSet
    assert(committed === fresh)
  }

  test("fixed-sweep Jacobi spectrum agrees with Breeze on the kernel pipeline") {
    // the twin's full 6-value spectrum vs LAPACK dsyevd on the SAME
    // physical problem, run through the real kernel pipeline
    // (displacements -> stub forces -> assembly -> eigSym)
    val seed = graft.pipeline.MaterialsPipeline.hessianSeed
    val calc = graft.calculators.StubCalculator(k = 1.0)
    val disp = graft.generators.Hessian.displacements(seed)
      .map(d => d.copy(config = calc.extract(d.config)))
    // Breeze eigenvalues via the kernel's own assembly
    import breeze.linalg.{eigSym, DenseMatrix}
    val dim = 3 * seed.n
    val h = DenseMatrix.zeros[Double](dim, dim)
    disp.groupBy(d => (d.atom, d.dir)).foreach { case ((i, a), two) =>
      val fp = two.find(_.sign == 1).get.config.force.get
      val fm = two.find(_.sign == -1).get.config.force.get
      for (j <- 0 until seed.n; b <- 0 until 3)
        h(i * 3 + a, j * 3 + b) = -(fp(j)(b) - fm(j)(b)) / 0.02
    }
    val breezeEigs = eigSym((h + h.t) / 2.0).eigenvalues.toArray.sorted
    // twin H entries from the shared formula texts, evaluated in SQL
    val wide = spark.read
      .parquet(graft.sources.SeedFixture.hessianSeedPath)
      .groupBy(org.apache.spark.sql.functions.col("seed_uuid"))
      .agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.expr(
            "CASE WHEN atom_idx = 0 THEN x END")).as("p0x"),
        (for (i <- 0 to 1; ax <- Seq("x", "y", "z"); if !(i == 0 && ax == "x"))
          yield org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.expr(
              s"CASE WHEN atom_idx = $i THEN $ax END")).as(s"p$i$ax")): _*)
    val e = wide.selectExpr(
      JacobiEigen.pairs.map { case (r, c) => JacobiEigen.hText(r, c) }: _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Double])
    val jacobiEigs = JacobiEigen.jacobiDiag(e).sorted
    assert(jacobiEigs.length === breezeEigs.length)
    jacobiEigs.zip(breezeEigs).foreach { case (j, b) =>
      assert(math.abs(j - b) < 1e-9, s"jacobi $j vs breeze $b")
    }
    // analytic stub spectrum: three zero modes (translations), three
    // modes at k·n/n... = k = 1.0 exactly on this harmonic model
    assert(jacobiEigs.count(l => math.abs(l - 1.0) < 1e-9) === 3)
    assert(jacobiEigs.count(l => math.abs(l) < 1e-9) === 3)
  }

  test("g8 twin: cutoff semantics, quantized output, determinism") {
    val rows = JacobiEigen.g8Twin(spark, "").collect()
    assert(rows.length === 3) // zero modes dropped by lam > 0, |lam| >= 1e-5
    rows.foreach { r =>
      assert(r.getString(1) === "hessian_eig")
      assert(r.getDouble(2) === 1.0) // micro-quantized analytic eigenvalue
    }
    assert(rows.map(_.getString(0)).distinct.length === 3)
    val again = JacobiEigen.g8Twin(spark, "").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
