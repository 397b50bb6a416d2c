package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Table parquet is read with mergeSchema off and the session-default
  * parquet options; filters/projections applied downstream are pushed
  * into the scan by Catalyst (verify with `.explain("formatted")` —
  * `PushedFilters`/`ReadSchema` must reflect the query).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanosecond
      // timestamp type, so read it as epoch-nanos LongType and convert
      // where needed (see Relational.s10HourlyEvents).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql surface parity
    * with the DuckDB oracle, which sees the same names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
