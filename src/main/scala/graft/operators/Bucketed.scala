package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located joins — the storage-layout answer
  * to repeated large-×-large joins on the same key (the brief's
  * "repartition()/bucketing for co-located joins" line): both fact
  * tables are written pre-hash-partitioned into the same number of
  * buckets on the join key, so every future join between them reads
  * matching buckets directly and plans a sort-merge join with ZERO
  * Exchange — the shuffle is paid once at write time, amortized over
  * every subsequent join/aggregation on that key. At 100 TB this is
  * the difference between re-shuffling 100 TB per query and never
  * shuffling it again; it composes with AQE (nothing to re-plan:
  * there is no exchange) and with partition pruning (buckets live
  * under ordinary date/source partitions).
  *
  * Spark-native mechanics: `bucketBy` requires a catalog table (the
  * bucket spec lives in the metastore, not the parquet footers), so
  * writers here register external tables at an explicit path.
  * `spark.sql.sources.bucketing.enabled` is on by default; reading
  * back via `spark.table` restores the hash-partitioned distribution
  * and (with `sortBy`) the in-bucket order that lets the sort-merge
  * join skip its sorts too. BucketedJoinSpec asserts the no-Exchange
  * plan property mechanically. */
object Bucketed {

  /** Write `df` as an external bucketed + in-bucket-sorted table. */
  def write(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key: with equal
    * bucket counts on the same key this plans exchange-free. */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
