package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Config
import graft.pipeline.ConfigRow

/** Parquet conventions for Config relations (SURVEY §2.1 S1/S2/S14;
  * reference: atoms.py:591–654 whole-file HDF5 lists, one group per
  * uuid — replaced by columnar parquet partitioned by the group key).
  *
  * Partitioning by `groupUuid` gives partition pruning for the
  * reference's dominant access pattern (read one group's rset:
  * database/__init__.py:449–453) and bounds file counts at scale
  * (one directory per group, AQE-coalesced writes within).
  */
object ConfigsIO {

  def write(ds: Dataset[Config], path: String): Unit =
    ds.toDF().write
      .mode("overwrite")
      .partitionBy("groupUuid")
      .parquet(path)

  def read(spark: SparkSession, path: String): Dataset[Config] = {
    import spark.implicits._
    spark.read.parquet(path)
      .withColumn("iteration", lit(0)) // ConfigRow mirror needs it
      .as[ConfigRow].map(_.toConfig)
  }

  /** Group-pruned read (the rset access path — verify with explain:
    * PartitionFilters must carry the groupUuid predicate). */
  def readGroup(spark: SparkSession, path: String, groupUuid: String): Dataset[Config] = {
    import spark.implicits._
    spark.read.parquet(path)
      .where(col("groupUuid") === groupUuid)
      .withColumn("iteration", lit(0))
      .as[ConfigRow].map(_.toConfig)
  }
}
