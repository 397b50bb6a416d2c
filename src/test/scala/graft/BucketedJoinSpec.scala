package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketed

/** Bucketing = pay the shuffle once at write time: a join between two
  * tables bucketed the same way on the join key must plan with ZERO
  * Exchange operators, and its result must equal the plain join. */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("co-bucketed join plans with zero Exchange and matches the plain join") {
    val sf = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("bucketed").toString
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    try {
      Bucketed.write(li, "b_lineitem", s"$tmp/li", "l_orderkey", 8)
      Bucketed.write(o, "b_orders", s"$tmp/o", "o_orderkey", 8)
      // force the shuffle-join path: a broadcast would hide the property
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Bucketed.join(spark, "b_lineitem", "b_orders",
          "l_orderkey", "o_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n$plan")
        val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
        assert(j.count() === expected)
        // and the bucket layout also feeds keyed AGGREGATION shuffle-free
        val agg = spark.table("b_lineitem").groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")))
        assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
          "bucketed groupBy on the bucket key must not re-shuffle")
      } finally
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
