package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar quantization of an embedding column — the SQ8 compression
  * step (FAISS `ScalarQuantizer`, QT_8bit-style) an embedding
  * pipeline runs to cut index memory 4× before serving: each float
  * coordinate becomes a signed byte code against a per-vector scale.
  * Symmetric per-vector absmax scaling: scale = max|v_i| / 127,
  * code_i = round(v_i / scale) ∈ [−127, 127] (the all-zero vector
  * gets scale 0 and all-zero codes).
  *
  * 100 TB shape: a stateless per-row map — no shuffle, no driver
  * state, nothing to fit. Every step is a column expression
  * (higher-order `transform`/`zip_with`/`aggregate` over the array),
  * so the scan prunes to (vec_id, embedding) and the whole operator
  * rides one projection over the parquet scan.
  *
  * Determinism across engines: scale and codes are pure IEEE double
  * arithmetic (cast, abs, max, divide, round-half-away-from-zero) —
  * identical in Spark and DuckDB; the oracle-facing summary reduces
  * every float to integers BEFORE any reassociable sum (the t10
  * micro-unit discipline): per-element integer quantization, then
  * order-free integer addition.
  */
object Quantize {

  /** The real operator: adds `scale` (double) and `codes`
    * (array<int>, each in [−127, 127]) per row. `vCol` must be a
    * numeric array column. */
  def quantize(df: DataFrame, vCol: String): DataFrame = {
    val v = transform(col(vCol), x => x.cast("double"))
    val absmax = array_max(transform(v, x => abs(x)))
    df.withColumn("scale",
        when(absmax === lit(0.0), lit(0.0)).otherwise(absmax / lit(127.0)))
      .withColumn("codes",
        when(col("scale") === lit(0.0), transform(v, _ => lit(0)))
          .otherwise(transform(v, x => round(x / col("scale"), 0).cast("int"))))
  }

  /** Oracle query `s7_scalar_quantize`: integer per-vector summary
    * that pins down the full code vector — scale in nano-units,
    * saturated-code count, code L1 mass, a 1-based position-weighted
    * checksum (catches any permutation or single-code change), and
    * the reconstruction SSE in pico-units (quantized per element,
    * summed as integers → order-free). */
  def s7ScalarQuantize(s: SparkSession, dir: String): DataFrame = {
    val q = quantize(
      Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
      "embedding")
    val v = transform(col("embedding"), x => x.cast("double"))
    val codesL: Column = transform(col("codes"), x => x.cast("long"))
    val errPico = zip_with(v, col("codes"), (vi, ci) =>
      round((vi - ci.cast("double") * col("scale")) *
        (vi - ci.cast("double") * col("scale")) * lit(1e12), 0).cast("long"))
    q.select(
      col("vec_id"),
      round(col("scale") * lit(1e9), 0).cast("long").as("scale_nano"),
      size(filter(col("codes"), x => abs(x) === lit(127))).cast("long").as("n_sat"),
      aggregate(codesL, lit(0L), (a, x) => a + abs(x)).as("code_l1"),
      aggregate(transform(col("codes"), (x, i) => x.cast("long") * (i.cast("long") + lit(1L))),
        lit(0L), (a, x) => a + x).as("code_dot"),
      aggregate(errPico, lit(0L), (a, x) => a + x).as("err_pico"))
      .orderBy(col("vec_id"))
  }
}
