package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fnmatch

/** The Controller catalog re-expressed as a queryable metadata table
  * (SURVEY §3.3; reference: database/__init__.py:1710–1786 `find`,
  * 1788–1822 steps/sequences listings, 1585–1686 Controller state).
  *
  * Schema (FIXTURES.md A2): one row per (db, group, seed, params)
  * leaf with uuid, status and counts. `find` compiles the reference's
  * `group.dbname[.seed][.params]` fnmatch patterns to LIKE predicates
  * over it; uuid lookups are point filters (J1). Status roll-up (A1)
  * is a rollup aggregation.
  */
object Catalog {

  /** Catalog from a configs DataFrame (derives group rows; the
    * reference materializes this in RAM from the YAML spec + folder
    * scan — here it's an aggregation of the data itself). */
  def fromConfigs(configs: DataFrame, dbName: String): DataFrame =
    configs
      .groupBy(col("configType").as("grp"), col("groupUuid").as("seed"))
      .agg(
        count(lit(1)).as("nconfigs"),
        sum(when(col("energy").isNotNull, 1).otherwise(0)).as("n_done"),
        min(col("uuid")).as("uuid"))
      .withColumn("db", lit(dbName))
      .withColumn("status",
        when(col("n_done") === col("nconfigs"), "done")
          .when(col("n_done") > 0, "running")
          .otherwise("pending"))

  /** `find` with the reference's pattern language: `grp.db[.seed]`,
    * fnmatch wildcards, or a bare uuid fast-path (J1). */
  def find(catalog: DataFrame, pattern: String): DataFrame = {
    val parts = pattern.split("[./]")
    if (parts.length == 1 && !pattern.contains("*") && !pattern.contains("?")
        && pattern.length >= 32)
      catalog.where(col("uuid") === pattern) // uuid point lookup
    else {
      val grpPat = parts.lift(0).getOrElse("*")
      val dbPat = parts.lift(1).getOrElse("*")
      val seedPat = parts.lift(2).getOrElse("*")
      catalog
        .where(Fnmatch.matches(col("grp"), grpPat) &&
          Fnmatch.matches(col("db"), dbPat) &&
          Fnmatch.matches(col("seed"), seedPat))
    }
  }

  /** A1 recursive status roll-up over the hierarchy. */
  def statusRollup(catalog: DataFrame): DataFrame =
    catalog.rollup(col("db"), col("grp"))
      .agg(sum(col("nconfigs")).as("n_total"),
        sum(col("n_done")).as("n_done"),
        count(lit(1)).as("n_groups"))
      .orderBy(col("db").asc_nulls_first, col("grp").asc_nulls_first)
}
