package graft.fit

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.Config

/** Fit-validation metrics (SURVEY §2.6 A5; reference:
  * fitting/basic.py:450–488 `validate` — arrays of e_ref/e_ip,
  * flattened f_ref/f_ip, v_ref/v_ip for RMS).
  *
  * Inputs: two Dataset[Config] keyed by uuid — reference results and
  * IP predictions. Output: one row of RMS/MAE per quantity, computed
  * distributed (per-config errors → aggregate), never collecting row
  * data.
  */
object Validate {

  def metrics(ref: Dataset[Config], pred: Dataset[Config]): DataFrame = {
    val r = ref.toDF().select(col("uuid"), col("energy").as("e_ref"),
      col("force").as("f_ref"), col("virial").as("v_ref"), col("n"))
    val p = pred.toDF().select(col("uuid"), col("energy").as("e_ip"),
      col("force").as("f_ip"), col("virial").as("v_ip"))
    val joined = r.join(p, "uuid")
      .withColumn("e_err2", pow(col("e_ref") - col("e_ip"), 2))
      .withColumn("e_abs", abs(col("e_ref") - col("e_ip")))
      // flattened per-component force errors (basic.py flattens too)
      .withColumn("f_err2",
        aggregate(zip_with(flatten(col("f_ref")), flatten(col("f_ip")),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
      .withColumn("f_n", size(flatten(col("f_ref"))))
      .withColumn("v_err2",
        aggregate(zip_with(col("v_ref"), col("v_ip"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
    joined.agg(
      count(lit(1)).as("n_configs"),
      sqrt(avg(col("e_err2"))).as("e_rms"),
      avg(col("e_abs")).as("e_mae"),
      sqrt(sum(col("f_err2")) / sum(col("f_n"))).as("f_rms"),
      sqrt(avg(col("v_err2") / 9)).as("v_rms"))
  }
}
