package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DetQuantiles

/** Pins for the deterministic bottom-k sample quantile sketch
  * (operators/DetQuantiles.scala) behind the r8 a9_quantiles_approx
  * oracle conversion: determinism, the lossless-merge identity,
  * the rank-error envelope vs exact, and exactness below the sample
  * cap. */
class DetQuantilesSpec extends AnyFunSuite {

  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  private def orders = Tables(spark, dir, "orders")

  test("bit-for-bit deterministic across runs and partitionings") {
    val a = DetQuantiles.quantiles(orders, "o_orderpriority",
      "o_totalprice", col("o_orderkey")).collect().toSeq
    val b = DetQuantiles.quantiles(orders.repartition(17),
      "o_orderpriority", "o_totalprice", col("o_orderkey"))
      .collect().toSeq
    assert(a === b)
  }

  test("bottom-k sample is losslessly mergeable (KMV identity)") {
    // bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B)) — the merge
    // can be applied per-partition/per-source without changing the
    // sample CONTENT, the property that makes the sketch a sketch.
    val ha = orders.where(col("o_orderkey") % 2 === 0)
    val hb = orders.where(col("o_orderkey") % 2 =!= 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
        .toSet
    val direct = key(DetQuantiles.bottomK(orders, "o_orderpriority",
      "o_totalprice", col("o_orderkey")))
    val partials = DetQuantiles.bottomK(ha, "o_orderpriority",
      "o_totalprice", col("o_orderkey"))
      .union(DetQuantiles.bottomK(hb, "o_orderpriority", "o_totalprice",
        col("o_orderkey")))
    // re-apply bottom-k to the merged partials: same (g, v, rk) rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("rk"))
    val merged = key(partials.withColumn("pos", row_number().over(w))
      .where(col("pos") <= DetQuantiles.K).drop("pos"))
    assert(merged === direct)
  }

  test("estimates stay inside the sampling rank-error envelope") {
    // for each estimate v̂_φ, the realized rank of v̂_φ in the FULL
    // group must be within ~4·sqrt(φ(1−φ)/k) of φ (Chernoff on the
    // binomial rank count; 4 sigma ≈ 1e-4 failure odds per cell).
    val est = DetQuantiles.quantiles(orders, "o_orderpriority",
      "o_totalprice", col("o_orderkey")).collect()
    val full = orders.select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sorted }
    est.foreach { r =>
      val g = r.getString(0)
      val vals = full(g)
      Seq((r.getDouble(1), 0.25), (r.getDouble(2), 0.50),
        (r.getDouble(3), 0.90)).foreach { case (v, phi) =>
        val rank = vals.count(_ <= v).toDouble / vals.length
        val tol = 4.0 * math.sqrt(phi * (1 - phi) / DetQuantiles.K) + 0.01
        assert(math.abs(rank - phi) < tol,
          s"group $g phi=$phi: realized rank $rank (tol $tol)")
      }
    }
  }

  test("below the sample cap the estimates are exact order statistics") {
    import spark.implicits._
    val tiny = (1 to 100).map(i => ("g", i.toDouble, i.toLong))
      .toDF("grp", "x", "id")
    val out = DetQuantiles.quantiles(tiny, "grp", "x", col("id"))
      .collect().head
    // m = n = 100 < k: rank ceil(0.25·100)=25, ceil(0.5·100)=50,
    // ceil(0.9·100)=90 over the fully-sampled sorted values 1..100
    assert(out.getDouble(1) === 25.0)
    assert(out.getDouble(2) === 50.0)
    assert(out.getDouble(3) === 90.0)
    assert(out.getLong(4) === 100L)
  }
}
