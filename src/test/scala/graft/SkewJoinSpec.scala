package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("salted join equals the plain join on a planted mega-key") {
    import spark.implicits._
    // key 7 owns 90% of the probe side — the classic straggler shape
    val left = ((1 to 900).map(i => (7L, i)) ++
      (1 to 100).map(i => (i.toLong % 5, -i))).toDF("k", "lv")
    val right = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "rv")
    val plain = left.join(right, "k")
    val salted = SkewJoin.saltedJoin(left, right, "k", hotKeys = Seq(7L), salt = 4)
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.collect().map(_.toSeq).sortBy(_.toString).toSeq ===
      plain.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("hot probe rows actually spread across salt values; cold build rows don't replicate") {
    import spark.implicits._
    val left = (1 to 800).map(i => (7L, i)).toDF("k", "lv")
    val salts = left.withColumn("__salt",
      pmod(xxhash64(col("k"), col("lv")), lit(4)))
      .select("__salt").distinct().count()
    assert(salts === 4L, "per-row hash must cover the salt range")
    // build-side replication is hot-rows × salt only
    val right = Seq((7L, "hot"), (1L, "cold")).toDF("k", "rv")
    val replicated = right.withColumn("__salt",
      explode(when(col("k").isInCollection(Seq(7L)),
        sequence(lit(0L), lit(3L))).otherwise(array(lit(0L)))))
    assert(replicated.count() === 5L) // 4 hot + 1 cold
  }

  test("topHotKeys finds the planted heavy keys deterministically") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => 7L) ++ (1 to 300).map(_ => 3L) ++
      (1 to 10).flatMap(i => Seq(i.toLong + 100))).toDF("k")
    assert(SkewJoin.topHotKeys(df, "k", 2) === Seq(7L, 3L))
  }

  test("j10 query matches the plain-join aggregate at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val salted = queries.Relational.j10SkewJoin(spark, sf).collect()
      .sortBy(_.getString(0)) // query output is unordered (r16)
    val li = Tables(spark, sf, "lineitem")
    val o = Tables(spark, sf, "orders")
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(salted.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
  }
}
