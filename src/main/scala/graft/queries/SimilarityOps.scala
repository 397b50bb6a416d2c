package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the embedding column.
  *
  * `s1_knn_bruteforce` is the exact baseline: query-set × corpus
  * cosine, top-k per query. At scale the query set is the broadcast
  * side (a handful of probes against a 100 TB corpus → one scan, no
  * shuffle of the corpus); the per-query top-k is a windowed
  * row_number over a small candidate set.
  *
  * The sub-linear scale path (LSH-bucketed ANN) is
  * graft.operators.Similarity (not SQL-expressible → spec-tested).
  */
object SimilarityOps {

  private def dot(x: Column, y: Column): Column =
    org.apache.spark.sql.graftx.VectorExpressions.dotProduct(x, y) // codegen'd inner loop

  def s1KnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v")))) // per-vector, pre-join
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cos = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 10)
      .orderBy(col("query_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_bruteforce" -> (s1KnnBruteforce _),
    // approximate → no SQL oracle (rows-only check); recall is
    // asserted against s1 in OperatorsSpec
    "s2_ann_lsh" -> (graft.operators.Similarity.s2AnnLsh _),
    "s3_ann_ivf" -> (graft.operators.Similarity.s3AnnIvf _),
    "d10_semdedup" -> (graft.operators.Similarity.d10SemDedup _),
    "mm1_multimodal_features" -> (graft.operators.Multimodal.featureSummary _),
  )

  val oracle: Map[String, String] = Map(
    "s1_knn_bruteforce" ->
      """WITH e AS (
        | SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (
        | SELECT q.query_id, e.vec_id,
        |  ROUND(list_sum([q.qv[i]*e.v[i] for i in range(1,65)]) /
        |   (sqrt(list_sum([q.qv[i]*q.qv[i] for i in range(1,65)])) *
        |    sqrt(list_sum([e.v[i]*e.v[i] for i in range(1,65)]))), 6) AS cos_sim
        | FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |ranked AS (
        | SELECT query_id, vec_id, cos_sim,
        |  ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, vec_id ASC) AS rk
        | FROM scored)
        |SELECT query_id, vec_id, cos_sim, rk
        |FROM ranked WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,
  )
}
