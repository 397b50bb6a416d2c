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
    * @param trainFrac e.g. 0.8 → Ntrain=ceil(0.8N), Nhold=ceil(0.8(N−Ntrain)).
    */
  def assign(df: DataFrame, idCol: String, splitName: String,
      trainFrac: Double, seed: Long): DataFrame = {
    val n = df.count()
    val nTrain = math.ceil(n * trainFrac).toLong
    val nHold = math.ceil((n - nTrain) * trainFrac).toLong
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__h"), col(idCol))
    df.select(col(idCol))
      .withColumn("__h", xxhash64(col(idCol), lit(s"$splitName:$seed")))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("bucket",
        when(col("__rk") <= nTrain, "train")
          .when(col("__rk") <= nTrain + nHold, "holdout")
          .otherwise("super"))
      .select(col(idCol), lit(splitName).as("split_name"), col("bucket"))
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
