package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow-query dissection (dev tool).
  * `sbt "runMain graft.tools.Prof <sfDir> <what>"` */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val what = if (args.length > 1) args(1) else "d4"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    what match {
      case "d4" =>
        val threshold = 0.9
        val toks = split(col("text"), " ")
        val d = graft.Tables(spark, sfDir, "documents")
          .repartition(col("doc_id"))
          .select(col("doc_id"), col("source"),
            array_sort(array_distinct(toks)).as("tset"))
          .withColumn("nt", size(col("tset")))
        time("docs count")(println("  docs=" + d.count()))
        val tok = d.select(col("doc_id"), col("source"), col("nt"),
          explode(col("tset")).as("tok"))
        val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        time("dfreq")(println("  vocab=" + dfreq.count()))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
        val prefix = tok.join(dfreq, "tok")
          .withColumn("pos", row_number().over(w))
          .where(col("pos") <= col("nt") - ceil(col("nt") * threshold) + 1)
        time("prefix")(println("  prefix rows=" + prefix.count()))
        val a = prefix.select(col("source"), col("tok"), col("doc_id").as("doc_a"),
          col("nt").as("na"), col("pos").as("pa"))
        val b = prefix.select(col("source"), col("tok"), col("doc_id").as("doc_b"),
          col("nt").as("nb"), col("pos").as("pb"))
        val o = ceil((col("na") + col("nb")) * lit(threshold / (1 + threshold)))
        val cand = a.join(b, Seq("source", "tok"))
          .where(col("doc_a") < col("doc_b")
            && col("na") >= col("nb") * threshold
            && col("nb") >= col("na") * threshold
            && lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >= o)
          .select(col("doc_a"), col("doc_b"))
        time("cand raw")(println("  cand=" + cand.count()))
        val candD = cand.distinct()
        time("cand distinct")(println("  candD=" + candD.count()))
        val full = graft.queries.DedupOps.d4NgramJaccard(spark, sfDir)
        time("full query")(println("  out=" + full.count()))
      case "d4n" =>
        val docs = graft.Tables(spark, sfDir, "documents")
        val sig = graft.operators.MinHash.signaturesFast(
          docs, "doc_id", "text", k = 72, bands = 12, shingleN = 1,
          materialize = false)
        time("signatures")(println("  sigs=" + sig.count()))
        val exploded = sig
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .select(col("doc_id"), col("source"),
            posexplode(array((0 until 12).map(b => col(s"band_$b")): _*))
              .as(Seq("band_idx", "band_key")))
        val a2 = exploded.select(col("source"), col("band_idx"),
          col("band_key"), col("doc_id").as("doc_a"))
        val b2 = exploded.select(col("source"), col("band_idx"),
          col("band_key"), col("doc_id").as("doc_b"))
        val cand0 = a2.join(b2, Seq("source", "band_idx", "band_key"))
          .where(col("doc_a") < col("doc_b"))
        time("cand raw")(println("  cand=" + cand0.count()))
        time("cand distinct")(println("  candD=" +
          cand0.select(col("doc_a"), col("doc_b")).distinct().count()))
      case "mm2t" =>
        import spark.implicits._
        val hv = graft.operators.Multimodal.imageVariants(spark, sfDir)
          .map { case (id, p) => (id,
            graft.operators.Multimodal.phash64(
              graft.operators.Multimodal.decodeImage(p))) }
          .toDF("vid", "ph")
        val orig = hv.where(col("vid") % 2 === 0)
          .select((col("vid") / 2).cast("long").as("mid"), col("ph").as("pa"))
        val twin = hv.where(col("vid") % 2 === 1)
          .select(((col("vid") - 1) / 2).cast("long").as("mid"), col("ph").as("pb"))
        orig.join(twin, "mid")
          .select(bit_count(col("pa").bitwiseXOR(col("pb"))).as("ham"))
          .groupBy(col("ham")).count().orderBy(col("ham"))
          .collect().foreach(r => println(s"  twin ham=${r.get(0)} n=${r.get(1)}"))
      case "mm2" =>
        val pairs = graft.operators.Multimodal.imagePhashPairs(spark, sfDir)
        time("mm2 pairs")(println("  pairs=" + pairs.count()))
        pairs.groupBy(col("hamming")).count().orderBy(col("hamming"))
          .collect().foreach(r => println(s"  ham=${r.get(0)} n=${r.get(1)}"))
        // cross-check: hamming between phashes of near-dup DOCUMENT
        // pairs (exact d4 pairs restricted to image-kind ids)
        import spark.implicits._
        val hashes = graft.operators.Multimodal
          .mediaFromDocuments(spark, sfDir)
          .filter(_.kind == "image")
          .map(m => (m.media_id,
            graft.operators.Multimodal.phash64(
              graft.operators.Multimodal.decodeImage(m.payload))))
          .toDF("media_id", "ph")
        val d4p = graft.queries.DedupOps.d4NgramJaccard(spark, sfDir)
          .where(col("doc_a") % 3 === 0 && col("doc_b") % 3 === 0)
          .join(hashes.select(col("media_id").as("doc_a"), col("ph").as("pa")), "doc_a")
          .join(hashes.select(col("media_id").as("doc_b"), col("ph").as("pb")), "doc_b")
          .select(bit_count(col("pa").bitwiseXOR(col("pb"))).as("ham"))
        d4p.groupBy(col("ham")).count().orderBy(col("ham"))
          .collect().foreach(r => println(s"  d4img ham=${r.get(0)} n=${r.get(1)}"))
      case "d7" =>
        val q = graft.queries.Relational.d7ContentHash(spark, sfDir)
        time("d7 full")(q.write.format("noop").mode("overwrite").save())
      case "a10" =>
        val q = graft.queries.Extras.a10Winsorize(spark, sfDir)
        time("a10 full")(q.write.format("noop").mode("overwrite").save())
      case name =>
        val q = graft.SparkEntry.queries(name)(spark, sfDir)
        time(name)(q.write.format("noop").mode("overwrite").save())
        time(name + " warm")(q.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
