package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named train/holdout/super splits with persisted ids (SURVEY §1.1
  * "splits", §2.7 O5, §2.4 J6; reference: database/utility.py:42–165 —
  * sizes Ntrain=ceil(N·p), Nhold=ceil((N−Ntrain)·p), Nsuper=rest at
  * 106–110; ids persisted at 113–126 so splits replay exactly).
  *
  * Assignment is a deterministic keyed shuffle: rows are ranked by
  * xxhash64(id, salt(splitName, seed)) — engine-independent, stable
  * under any partitioning — and cut into contiguous ranges by the
  * reference's sizing rule. The assignment table (id → bucket) is the
  * persisted artifact; re-splitting = re-joining it (J6), never
  * re-deriving from an RNG.
  */
object Splits {

  /** Compute bucket assignment for `df` keyed by `idCol`.
    *
    * Scale-safe global rank: rows are range-partitioned on
    * `(__h, id)` — a total order, so partition i's rows all rank
    * before partition i+1's — then the global rank of a row is
    * (prefix-sum of earlier partitions' counts) + (rank local to its
    * partition). Only the O(partitions) count vector crosses the
    * driver; no single-partition sort of row data (the naive
    * `Window.orderBy` with no partitionBy funnels the whole table
    * through one task).
    *
    * @param trainFrac e.g. 0.8 → Ntrain=ceil(0.8N), Nhold=ceil(0.8(N−Ntrain)).
    */
  def assign(df: DataFrame, idCol: String, splitName: String,
      trainFrac: Double, seed: Long): DataFrame =
    assignImpl(df, idCol, splitName, trainFrac, seed, materialize = true)

  /** `materialize = false` builds the lazy plan without pinning —
    * for plan audits (PlanSpec) only: executing it would let the
    * range boundaries resample between the counts job and the rank
    * job. The real path pins the shuffle, materializes the result,
    * and releases the pinned blocks before returning (no cached
    * leftovers per call). */
  private[graft] def assignImpl(df: DataFrame, idCol: String,
      splitName: String, trainFrac: Double, seed: Long,
      materialize: Boolean): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Range boundaries are sampled per-execution, so pin the
    // partitioning with persist(): the counts job and the rank job
    // must see identical partition ids.
    val ranged0 = df.select(col(idCol))
      .withColumn("__h", xxhash64(col(idCol), lit(s"$splitName:$seed")))
      .repartitionByRange(parts, col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val ranged = if (materialize) ranged0.persist() else ranged0
    val counts = ranged.groupBy("__pid").count()
      .as[(Int, Long)].collect().toMap
    val n = counts.valuesIterator.sum
    val nTrain = math.ceil(n * trainFrac).toLong
    val nHold = math.ceil((n - nTrain) * trainFrac).toLong
    val offsets = (0 until parts)
      .scanLeft((0, 0L)) { case ((_, acc), pid) =>
        (pid, acc + counts.getOrElse(pid - 1, 0L))
      }.tail
    val offsetsDf = offsets.toDF("__pid", "__off")
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__h"), col(idCol))
    val out = ranged
      .withColumn("__lrk", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("__rk", col("__off") + col("__lrk"))
      .withColumn("bucket",
        when(col("__rk") <= nTrain, "train")
          .when(col("__rk") <= nTrain + nHold, "holdout")
          .otherwise("super"))
      .select(col(idCol), lit(splitName).as("split_name"), col("bucket"))
    if (!materialize) out
    else {
      // run the rank job while the pinned shuffle is alive, then free
      // it — assign() leaves no cached blocks behind
      val result = out.localCheckpoint(true)
      ranged.unpersist()
      result
    }
  }

  /** Persist an assignment (the reference's ids pickle → a table). */
  def persistAssignment(assign: DataFrame, path: String): Unit =
    assign.write.mode("overwrite").parquet(path)

  /** Reproduce a split by re-joining persisted ids (J6). */
  def apply(df: DataFrame, idCol: String, assignment: DataFrame,
      bucket: String): DataFrame =
    df.join(assignment.where(col("bucket") === bucket).select(idCol),
      Seq(idCol), "left_semi")
}
