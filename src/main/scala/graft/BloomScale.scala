package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Measures the round-16 bloom-sidecar claim: on a uuid-keyed table —
  * where every file's [min,max] spans the whole key space, so the
  * range tier prunes NOTHING — point DML touches O(matching files)
  * instead of O(all files).
  *
  * Builds one table of `files` single-file commits keyed by a
  * uuid-like string, then per arm (bloom OFF → ON):
  *
  *  - `point_delete`: DELETE of 1 existing key — files rewritten
  *    (COW) or masked (DV), wall time;
  *  - `point_merge`: MERGE of 16 existing keys — files rewritten
  *    vs carried;
  *  - `miss_delete`: DELETE of a key that does NOT exist — the
  *    all-skip case (bloom: zero files touch);
  *  - sidecar build cost (in the commit, amortized) and on-disk
  *    bytes, reported once.
  *
  * Usage: runMain graft.BloomScale <scaledSfDir> <tableRootDir>
  * <out.json> <label> [files]
  */
object BloomScale {
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val Array(srcDir, rootDir, outJson, label) = args.take(4)
    val nFiles = args.lift(4).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // uuid-like keys derived from doc ids: every commit's key range
    // spans the whole space — the adversarial regime for min/max
    val docs = Tables(spark, srcDir, "documents")
      .select(md5(concat(lit("k"), col("doc_id"))).as("k"),
        col("doc_id"), col("n_chars"), col("text"))
      .localCheckpoint()
    val nDocs = docs.count()
    def keyOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"k$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    }

    val sb = new StringBuilder
    sb ++= s"""{\n  "label": "$label", "n_docs": $nDocs, "files": $nFiles"""

    Seq(false, true).foreach { bloom =>
      val t = s"$rootDir/tbl_${if (bloom) "on" else "off"}"
      if (bloom) spark.conf.set("spark.graft.bloom.columns", "k")
      else spark.conf.unset("spark.graft.bloom.columns")
      var buildSec = 0.0
      (0 until nFiles).foreach { i =>
        val (_, s) = timed(Versioned.commit(
          docs.where(pmod(col("doc_id"), lit(nFiles)) === i)
            .repartition(1), t, "append"))
        buildSec += s
      }
      val sidecarBytes =
        if (!bloom) 0L
        else {
          val dir = java.nio.file.Paths.get(t, "_bloom")
          if (!java.nio.file.Files.isDirectory(dir)) 0L
          else {
            val s = java.nio.file.Files.list(dir)
            try s.mapToLong(java.nio.file.Files.size(_)).sum
            finally s.close()
          }
        }

      def filesTouched(body: => Unit): (Int, Double) = {
        val before = Versioned.snapshot(t).files.toSet
        val (_, sec) = timed(body)
        val after = Versioned.snapshot(t).files.toSet
        // COW: rewritten originals leave; DV: dvs map gains entries
        val cow = before.diff(after).size
        val dv = Versioned.snapshot(t).dvs.size
        (math.max(cow, dv), sec)
      }

      val (delTouched, delSec) = filesTouched(
        Versioned.deleteWhere(spark, t, col("k") === keyOf(7L)))
      val mergeKeys = (0 until 16).map(i => keyOf((i * 37 + 11).toLong))
      import spark.implicits._
      val src = mergeKeys.map(k => (k, "merged")).toDF("k", "text2")
        .join(docs.select(col("k"), col("doc_id"), col("n_chars"),
          col("text")), Seq("k"))
        .select(col("k"), col("doc_id"), col("n_chars"),
          lit("merged").as("text"))
      val (mrgTouched, mrgSec) = filesTouched(
        Versioned.merge(src, t, Seq("k")))
      // an in-range key that exists in NO file: the range tier keeps
      // every file (mid-keyspace), only membership can skip
      val missKey = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.digest("not-a-doc-key".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
      }
      val (missTouched, missSec) = filesTouched(
        Versioned.deleteWhere(spark, t, col("k") === lit(missKey)))
      // the DSv2 read path (round 16): a point SELECT rides the
      // pushed-filter bloom tier — with the tier on, only the files
      // whose sidecars may hold the key are planned at all
      val (selRows, selSec) = timed(
        spark.read.format("graftv").load(t)
          .where(col("k") === lit(keyOf(13L))).count())

      sb ++= s""",\n  "${if (bloom) "bloom_on" else "bloom_off"}": {"""
      sb ++= s""""commit_sec_total": ${r3(buildSec)}, """
      sb ++= s""""sidecar_bytes": $sidecarBytes, """
      sb ++= s""""point_delete": {"files_touched": $delTouched, "sec": ${r3(delSec)}}, """
      sb ++= s""""point_merge_16keys": {"files_touched": $mrgTouched, "sec": ${r3(mrgSec)}}, """
      sb ++= s""""miss_delete": {"files_touched": $missTouched, "sec": ${r3(missSec)}}, """
      sb ++= s""""point_select_dsv2": {"rows": $selRows, "sec": ${r3(selSec)}}}"""
      System.err.println(s"[bloom-scale] $label bloom=$bloom: " +
        f"delete touched $delTouched/$nFiles files in $delSec%.2fs, " +
        f"merge $mrgTouched, miss $missTouched")
    }
    sb ++= "\n}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      sb.toString.getBytes("UTF-8"))
    println(s"[bloom-scale] wrote $outJson")
    spark.stop()
  }
}
