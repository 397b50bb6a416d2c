package graft.fit

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** M10: model-based quality filtering — the fastText/classifier tier
  * of a curation pipeline (the reference's closest analog is the
  * fit/validate loop over extracted features, basic.py:393–448;
  * here the "potential" is a document-quality model).
  *
  * Shape, which is the point at 100 TB: weak labels and features are
  * pure column expressions (one scan); training runs on the SMALL
  * deterministic train split via MLlib's LogisticRegression (driver
  * coordinates L-BFGS over executor-side gradient aggregates — the
  * model, not the data, crosses the driver); scoring broadcasts the
  * fitted coefficient vector and is again one scan. No stage ever
  * collects row data.
  *
  * Determinism note: L-BFGS gradient sums are float reductions whose
  * order varies with partitioning, so coefficients are run-stable
  * only to ~1e-12 — the query is rows-only (no DuckDB oracle) and the
  * spec asserts held-out ACCURACY (threshold with wide margin), plus
  * bit-stable labels/features.
  */
object QualityModel {

  private def toks = split(col("text"), " ")

  /** Weak supervision + features, all codegen column expressions.
    * Label: the t2 quality heuristic ≥ 0.3, taken from the SAME
    * expression t2 computes (`TextOps.qualityParts` — not a copy, so
    * the documented correspondence can't drift). A pipeline would use
    * human/LLM ratings on a sample; the PLUMBING is identical. The
    * feature set deliberately overlaps the label's inputs only
    * partially, so the model has signal to learn and the spec's
    * accuracy bound is meaningful but not tautological. */
  private[graft] def featurize(docs: DataFrame): DataFrame = {
    val nTok = size(toks).cast("double")
    val (stopRatio, quality) = graft.queries.TextOps.qualityParts
    docs.select(
      col("doc_id"),
      (quality >= 0.3).cast("double").as("label"),
      nTok.as("f_ntok"),
      (length(col("text")).cast("double") / nTok).as("f_avg_len"),
      stopRatio.as("f_stop"),
      (size(array_distinct(toks)).cast("double") / nTok).as("f_distinct"))
  }

  private val featureCols = Array("f_ntok", "f_avg_len", "f_stop", "f_distinct")

  /** Train on the deterministic 80 % split, score EVERY doc; returns
    * (doc_id, label, prediction, match) ordered by doc_id. */
  def m10QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val feats = featurize(Tables(s, dir, "documents"))
    val assembler = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
    val train = assembler.transform(
      feats.where(pmod(col("doc_id"), lit(5)) =!= 0))
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
    val model = lr.fit(train)
    model.transform(assembler.transform(feats))
      .select(col("doc_id"), col("label").cast("long").as("label"),
        col("prediction").cast("long").as("prediction"),
        (col("label") === col("prediction")).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Held-out accuracy (docs the fit never saw): the spec's gate. */
  private[graft] def holdoutAccuracy(scored: DataFrame): Double = {
    val hold = scored.where(pmod(col("doc_id"), lit(5)) === 0)
    val agg = hold.agg(
      sum(when(col("correct"), 1L).otherwise(0L)).as("ok"),
      count(lit(1)).as("n")).collect()(0)
    agg.getLong(0).toDouble / agg.getLong(1)
  }
}
