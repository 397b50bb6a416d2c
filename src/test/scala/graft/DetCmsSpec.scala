package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DetCms

/** Pins for the deterministic md5-bucket CMS behind the r8 sk3
  * oracle: the oracle proves Spark ≡ DuckDB; this spec proves the
  * kernel computes the intended MATH (CMS upper bound, pigeonhole
  * recall, register additivity, bit-determinism), so an
  * agreeing-but-wrong drift on both sides cannot hide. */
class DetCmsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("registers are additive across sources (cell-wise integer sum)") {
    import spark.implicits._
    val docs = (1 to 12).flatMap { i =>
      Seq(("src_a", Seq.fill(i)(s"w$i").mkString(" ")),
        ("src_b", Seq.fill(2 * i)(s"w$i").mkString(" ")))
    }.zipWithIndex.map { case ((s, t), id) => (id.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    def countsOf(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    def regMap(d: org.apache.spark.sql.DataFrame) =
      DetCms.registers(countsOf(d)).collect()
        .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val global = regMap(docs)
    val a = regMap(docs.where(col("source") === "src_a"))
    val b = regMap(docs.where(col("source") === "src_b"))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(global === merged)
    // register mass per row = total token mass (every token hits
    // exactly one bucket per row)
    val mass = (1 to 12).map(3 * _).sum.toLong
    (0 until DetCms.D).foreach { r =>
      assert(global.collect { case ((ri, _), c) if ri == r => c }.sum === mass)
    }
  }

  test("heavy hitters: upper bound, pigeonhole recall, determinism (real table)") {
    val docs = Tables(spark, sf, "documents")
    val exact = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMass = exact.values.sum
    val out = DetCms.heavyHittersOf(docs, 10000L).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val outMap = out.toMap
    // no false negatives: every token with exact mass >= phi*N present
    exact.foreach { case (tok, n) =>
      if (n * 1000000L >= 10000L * nMass)
        assert(outMap.contains(tok), s"true heavy hitter $tok missing")
    }
    // CMS never under-counts
    outMap.foreach { case (tok, est) =>
      assert(est >= exact(tok), s"$tok: est $est < exact ${exact(tok)}")
    }
    // bit-exact rerun (the determinism the oracle relies on)
    val again = DetCms.heavyHittersOf(docs, 10000L).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq === again.toSeq)
    assert(out.nonEmpty)
  }

  test("agrees with the native-blob kernel on the true-hitter set") {
    // both tiers guarantee pigeonhole recall, so the TRUE hitters are
    // in both outputs; symmetric difference is only near-threshold
    // over-admits, which for this corpus' vocab (far below d*w
    // saturation) should be empty for the deterministic tier too
    val docs = Tables(spark, sf, "documents")
    val det = DetCms.heavyHittersOf(docs, 10000L).collect()
      .map(_.getString(0)).toSet
    val native = graft.queries.DedupOps.heavyHittersOf(docs, 10000L)
      .collect().map(_.getString(0)).toSet
    assert((det -- native).isEmpty || (native -- det).isEmpty,
      s"disjoint over-admits: det-only ${det -- native}, native-only ${native -- det}")
    assert((det intersect native).nonEmpty)
  }
}
