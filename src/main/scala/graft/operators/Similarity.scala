package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftx.VectorExpressions
import graft.core.Rng

/** Approximate nearest-neighbor search over an embedding column —
  * the sub-linear scale path beside the exact `s1_knn_bruteforce`
  * baseline (north-star extension).
  *
  * Random-hyperplane LSH: `nPlanes` deterministic pseudo-random
  * hyperplanes (seeded Gaussian, engine-stable via graft.core.Rng)
  * give each vector a sign-bit signature → integer bucket.
  * Candidates = bucket collisions, optionally multiprobed by flipping
  * each signature bit (catches near-boundary neighbors); exact cosine
  * reranks the candidate set.
  *
  * 100 TB shape: the planes are a broadcast literal; bucketing is a
  * stateless projection on the corpus scan; the query join shuffles
  * only on the short bucket key; rerank touches |candidates| ≪ N
  * rows. Nothing is ever collected to the driver.
  */
object Similarity {

  /** Deterministic planes: nPlanes × dim Gaussians. */
  def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      val r = Rng.forKey(seed, s"plane:$p")
      Seq.fill(dim)(r.nextGaussian())
    }

  private def bucketExpr(v: Column, pl: Seq[Seq[Double]]): Column =
    pl.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(VectorExpressions.dotProduct(v, planeCol) >= 0,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Attach LSH bucket to a (id, v: array<double>) DataFrame. */
  def bucketize(df: DataFrame, vCol: String, pl: Seq[Seq[Double]]): DataFrame =
    df.withColumn("bucket", bucketExpr(col(vCol), pl))

  /** Top-k ANN: queries and corpus share the bucketing; multiprobe
    * expands each query to its bucket plus all 1-bit-flipped buckets.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, vCol: String,
      idCol: String, k: Int, nPlanes: Int, seed: Long, dim: Int): DataFrame = {
    val pl = planes(nPlanes, dim, seed)
    val c = bucketize(corpus, vCol, pl)
      .select(col(idCol).as("vec_id"), col(vCol).as("v"), col("bucket"))
      .withColumn("nrm", sqrt(VectorExpressions.dotProduct(col("v"), col("v"))))
    val probes = (0 until nPlanes).map(i => lit(1 << i))
    val q = bucketize(queries, vCol, pl)
      .select(col(idCol).as("query_id"), col(vCol).as("qv"), col("bucket"))
      .withColumn("qn", sqrt(VectorExpressions.dotProduct(col("qv"), col("qv"))))
      // multiprobe: own bucket + each 1-bit flip (bitwise xor)
      .withColumn("bucket", explode(array(
        col("bucket") +: probes.map(p => col("bucket").bitwiseXOR(p)): _*)))
    val cos = round(VectorExpressions.cosine(col("qv"), col("v"),
      col("qn"), col("nrm")), 6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    q.join(c, "bucket")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cos_sim"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Plane count scaled to the corpus: enough sign bits that the
    * expected bucket occupancy is ~8·k candidates — nPlanes =
    * ⌈log₂(N / 8k)⌉ clamped to [4, 24]. At N = 2·10³ that is 5
    * planes; at N = 10⁹ it is 24 (16M buckets). Only the O(1) count
    * crosses the driver. */
  def adaptivePlanes(n: Long, k: Int): Int = {
    val target = math.max(1L, 8L * k)
    val bits = math.ceil(math.log(math.max(1.0, n.toDouble / target))
      / math.log(2)).toInt
    math.min(24, math.max(4, bits))
  }

  /** Query-surface entry over the embeddings table (rows-only check —
    * approximate results have no SQL oracle). */
  def s2AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(spark, dir, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.where(col("vec_id") < 5)
    val k = 10
    annTopK(e, q, "v", "vec_id", k = k,
      nPlanes = adaptivePlanes(e.count(), k), seed = 42L, dim = 64)
  }
}
