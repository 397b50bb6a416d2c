package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator ids from SURVEY §2 to DataFrame builders
  * over a scale-factor dir; `oracleSql` gives the DuckDB-equivalent
  * SQL (same column names — the driver compares sorted-by-name
  * hashed values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.j3RevenueByRegion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.DedupOps.queries ++
      graft.queries.SimilarityOps.queries ++
      graft.queries.MaterialsOps.queries ++
      graft.queries.Extras.queries ++
      graft.queries.PackOps.queries ++
      graft.sources.Aflux.queries ++
      graft.sources.Versioned.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.TextOps.oracle ++
      graft.queries.DedupOps.oracle ++
      graft.queries.SimilarityOps.oracle ++
      graft.queries.MaterialsOps.oracle ++
      graft.queries.Extras.oracle ++
      graft.queries.PackOps.oracle ++
      graft.sources.Aflux.oracle ++
      graft.sources.Versioned.oracle
}
