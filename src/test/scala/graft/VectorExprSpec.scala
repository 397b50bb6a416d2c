package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftx.VectorExpressions

class VectorExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("DotProduct matches the interpreted aggregate/zip_with bit-for-bit") {
    import spark.implicits._
    val df = (1 to 200).map { i =>
      val a = (0 until 64).map(j => math.sin(i * 64 + j))
      val b = (0 until 64).map(j => math.cos(i * 64 + j))
      (i, a, b)
    }.toDF("id", "a", "b")
    val both = df.select(
      VectorExpressions.dotProduct(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
        lit(0.0), (acc, z) => acc + z).as("interp"))
    assert(both.where(col("native") =!= col("interp")).count() === 0)
  }

  test("DotProduct widens float arrays exactly") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val v = df.select(VectorExpressions.dotProduct(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(v === 13.0)
  }

  test("SortedIntersectSize equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    import org.apache.spark.sql.graftx.SortedIntersect.sortedIntersectSize
    // deterministic pseudo-random token sets, sorted+distinct as the
    // d4 verify path prepares them
    val rng = new scala.util.Random(7L)
    val rows = (1 to 200).map { _ =>
      def set() = (1 to rng.nextInt(40))
        .map(_ => s"tok${rng.nextInt(60)}").distinct.sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
    val both = df.select(
      sortedIntersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(both.where(col("native") =!= col("builtin")).count() === 0)
    // edges: empty sides, disjoint, identical
    val edges = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c"))).toDF("a", "b")
    val vals = edges.select(sortedIntersectSize(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(vals === Seq(0, 0, 0, 3))
    // null ELEMENTS violate the sorted-no-nulls precondition: fail
    // loudly with a typed message, not an NPE from generated code
    val withNull = Seq((Seq(null, "x"), Seq("a", "x"))).toDF("a", "b")
    val e = intercept[Exception](
      withNull.select(sortedIntersectSize(col("a"), col("b"))).collect())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("null array elements")), msgs.mkString(" | "))
  }

  test("PositionalEqualCount equals the size(filter(sequence)) lambda bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.graftx.PositionalEqual.equalCount
    val k = 16
    val df = (1 to 300).map { i =>
      val a = (0 until k).map(j => ((i * 31 + j * 7) % 97).toLong)
      val b = (0 until k).map(j => ((i * 17 + j * 7) % 97).toLong)
      (i, a, b)
    }.toDF("id", "a", "b")
    val both = df.select(
      equalCount(col("a"), col("b")).as("native"),
      size(filter(sequence(lit(1), lit(k)),
        i => element_at(col("a"), i) === element_at(col("b"), i))).as("interp"))
    assert(both.where(col("native") =!= col("interp")).count() === 0)
    // identical arrays count k; disjoint count 0; length mismatch raises
    val edge = Seq((Seq(1L, 2L), Seq(1L, 2L), Seq(3L, 4L), Seq(1L, 2L, 3L)))
      .toDF("a", "b", "c", "d")
    val r = edge.select(equalCount(col("a"), col("b")),
      equalCount(col("a"), col("c"))).collect()(0)
    assert(r.getInt(0) === 2 && r.getInt(1) === 0)
    val e = intercept[Exception] {
      edge.select(equalCount(col("a"), col("d"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause.getMessage.contains("length mismatch"))
  }

  test("DotProduct participates in whole-stage codegen") {
    // LocalTableScan plans skip codegen entirely — use a range scan so
    // the projection actually enters a WholeStageCodegen stage.
    // (arrays built with array() — a higher-order transform() in the
    // same projection would itself knock the stage out of codegen)
    val df = spark.range(100)
      .select(
        array((0 to 9).map(i => (col("id") + i).cast("double")): _*).as("a"),
        array((0 to 9).map(i => (col("id") * i).cast("double")): _*).as("b"))
    val q = df.select(VectorExpressions.dotProduct(col("a"), col("b")).as("d"))
    val codegenStages = q.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty)
    assert(q.agg(sum(col("d"))).collect()(0).getDouble(0) > 0)
  }
}
