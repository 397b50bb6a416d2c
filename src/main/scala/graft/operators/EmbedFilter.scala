package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** M12: embedding-centroid quality filtering — the curation tier
  * that scores every document's embedding by cosine similarity to
  * the centroid of a small curated seed set and keeps what clears a
  * threshold (the FineWeb-Edu / DCLM-style "classifier-lite" gate;
  * within the reference's vocabulary it is the same select-by-
  * fitness discipline as the eligibility predicates, basic.py
  * fit/holdout selection, applied to an embedding column).
  *
  * 100 TB shape, which is the point: the seed aggregation is ONE
  * partial-aggregated shuffle of dim×partitions rows (posexplode →
  * groupBy(position) → sum — never a per-row collect), the centroid
  * (dim longs) is the only thing that crosses the driver (the IVF
  * centroid-matrix discipline), and scoring broadcasts that dim-long
  * literal back as a column expression, so the scoring pass is a
  * single codegen'd scan with no shuffle except the determinism
  * sort. Nothing pairwise anywhere.
  *
  * Cross-engine determinism (the t10/s7 micro-unit discipline): the
  * per-element float→integer quantization happens BEFORE any
  * reassociable sum — the centroid is the elementwise integer SUM of
  * quantized seed vectors (cosine is scale-invariant, so the sum
  * stands in for the mean with no division), and dot/norms are exact
  * integer arithmetic; only the final cosine touches doubles, via
  * the same non-reassociable expression shape on both engines. */
object EmbedFilter {

  /** Quantization: tenth-milli units keep every later integer
    * product comfortably inside exact-double range (qv ≤ ~1e4,
    * centroid ≤ seeds·1e4, dot ≤ dim·qv·cent ≪ 2^53 at any sf the
    * sandbox reaches; the require below fails loudly otherwise). */
  private val Q = 1e4
  private val CosThreshold = 0.7

  /** The m12 kernel over an arbitrary (id, vector, isSeed) relation —
    * spec-testable with hand-computable cosines. Output: every row
    * scored (a filter consumes `keep`; curation pipelines log the
    * score, so rejected rows keep theirs). */
  def filterByCentroid(vecs: DataFrame, idCol: String, vCol: String,
      seedCol: Column, threshold: Double = CosThreshold): DataFrame = {
    val qv = transform(col(vCol),
      x => round(x.cast("double") * lit(Q), 0).cast("long"))
    val quantized = vecs.select(col(idCol), seedCol.as("__seed"), qv.as("qv"))

    // elementwise integer sum across seed rows: dim×partitions
    // partial sums shuffle once; dim longs reach the driver
    val centRows = quantized.where(col("__seed"))
      .select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("c"))
      .orderBy(col("pos")).collect()
    require(centRows.nonEmpty, "m12: empty seed set — nothing to anchor the filter")
    val cent: Array[Long] = centRows.map(_.getLong(1))
    val nbBig = cent.map(c => BigInt(c) * BigInt(c)).sum
    require(nbBig > 0, "m12: all-zero seed centroid")
    require(nbBig.isValidLong, s"m12: centroid norm $nbBig exceeds Long — lower Q")
    val nb = nbBig.toLong

    val centLit = array(cent.map(lit(_)): _*)
    val dot = aggregate(zip_with(col("qv"), centLit, (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val na = aggregate(transform(col("qv"), x => x * x),
      lit(0L), (acc, x) => acc + x)
    val cos = when(col("na") === 0L, lit(0.0)).otherwise(
      round(col("dot_q").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(lit(nb.toDouble))), 6))
    quantized
      .select(col(idCol), dot.as("dot_q"), na.as("na"))
      .withColumn("cos_sim", cos)
      .select(col(idCol), col("dot_q"), col("cos_sim"),
        (col("cos_sim") >= threshold).as("keep"))
      .orderBy(col(idCol))
  }

  /** Oracle query `m12_embedding_filter`: label-0 vectors are the
    * curated seed slice (the plumbing is identical for human- or
    * LLM-rated seeds). */
  def m12EmbeddingFilter(s: SparkSession, dir: String): DataFrame =
    filterByCentroid(
      Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"), col("label")),
      "vec_id", "embedding", col("label") === 0)
}
