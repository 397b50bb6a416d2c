package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Measures the DELETION-VECTOR point-DML claim at scale (round 15,
  * VERDICT r14 #1): a scattered small delete on a large table should
  * pay ∝ deleted ROWS (sidecars + CDF + manifest) under DVs, vs
  * ∝ touched-file BYTES under copy-on-write. The same table, the same
  * predicate, both paths (COW first, RESTORE, then DV), measuring:
  *
  *  - wall time of the delete;
  *  - bytes the commit added to the table directory (rewritten data
  *    files for COW; sidecars for DV — CDF parquet is common to both
  *    and reported separately);
  *  - the post-delete full-scan time (the DV read-path tax: masked
  *    files drop to the row-based reader until OPTIMIZE purges);
  *  - OPTIMIZE purge time and the scan after it (the recovery).
  *
  * Also measures the crossover leg: a 60%-of-table delete under DV
  * mode must take the per-file COW branch (sidecar count 0), pinning
  * that the fraction triage routes big deletes away from masks.
  *
  * Usage: runMain graft.DvScale <scaledSfDir> <tableDir> <out.json>
  * <label>
  */
object DvScale {
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val Array(srcDir, tableDir, outJson, label) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def dirBytes(rels: Seq[String]): Long =
      rels.map(f => java.nio.file.Files.size(
        java.nio.file.Paths.get(tableDir, f))).sum
    def addedByLast(prevFiles: Set[String], prevDvs: Set[String])
        : (Long, Long, Int) = {
      val snap = Versioned.snapshot(tableDir)
      val newData = snap.files.filterNot(prevFiles)
      val newDvs = snap.dvs.values.toSeq.filterNot(prevDvs)
      (dirBytes(newData), dirBytes(newDvs), newDvs.size)
    }
    def fullScan(): Double = timed {
      Versioned.read(spark, tableDir)
        .agg(count(lit(1)), sum(col("n_chars")), sum(length(col("text"))))
        .collect(); ()
    }
    def withDv[A](on: Boolean)(f: => A): A = {
      spark.conf.set("spark.graft.dv.enabled", on.toString)
      try f finally spark.conf.unset("spark.graft.dv.enabled")
    }

    // ---------------------------------------------------- the table
    val docs = Tables(spark, srcDir, "documents")
    val nDocs = docs.count()
    val tIngest = timed {
      (0 until 8).foreach(i =>
        Versioned.commit(docs.where(pmod(col("doc_id"), lit(8)) === i),
          tableDir, "append"))
      Versioned.optimize(spark, tableDir, numFiles = 32,
        clusterBy = Seq("doc_id"))
    }
    val snap0 = Versioned.snapshot(tableDir)
    val tableBytes = dirBytes(snap0.files)
    // a scattered point predicate: ~nDocs/3000 rows spread over the
    // doc_id-clustered layout, so EVERY file is touched
    val pointPred = pmod(col("doc_id"), lit(3000)) === 17
    val nPoint = docs.where(pointPred).count()
    System.err.println(s"[dv-scale] $label: $nDocs docs, " +
      s"${snap0.files.size} files, ${tableBytes / (1 << 20)} MiB; " +
      s"point delete = $nPoint rows")

    // -------------------------------------------- leg 1: COW delete
    val preV = snap0.version
    val cowSec = withDv(false) {
      timed { Versioned.deleteWhere(spark, tableDir, pointPred); () }
    }
    val (cowDataBytes, _, _) =
      addedByLast(snap0.files.toSet, Set.empty)
    val cowScan = fullScan()
    Versioned.restore(tableDir, preV)

    // --------------------------------------------- leg 2: DV delete
    val snap1 = Versioned.snapshot(tableDir)
    val dvSec = withDv(true) {
      timed { Versioned.deleteWhere(spark, tableDir, pointPred); () }
    }
    val (dvDataBytes, dvSidecarBytes, nSidecars) =
      addedByLast(snap1.files.toSet, Set.empty)
    val maskedScan = fullScan()
    val nAfter = Versioned.read(spark, tableDir).count()
    require(nAfter == nDocs - nPoint, s"dv delete wrong: $nAfter")
    // DV UPDATE on a disjoint scattered slice
    val updPred = pmod(col("doc_id"), lit(3000)) === 23
    val dvUpdSec = withDv(true) {
      timed { Versioned.updateWhere(spark, tableDir, updPred,
        Map("n_chars" -> (col("n_chars") + lit(1L)))); () }
    }
    // ------------------------------------------------- purge + scan
    val purgeSec = timed {
      Versioned.optimize(spark, tableDir, numFiles = 32,
        clusterBy = Seq("doc_id")); ()
    }
    require(Versioned.snapshot(tableDir).dvs.isEmpty, "purge failed")
    val cleanScan = fullScan()

    // ------------------------------------- leg 3: crossover (60 %)
    val bigPred = pmod(col("doc_id"), lit(10)) < 6
    val snap2 = Versioned.snapshot(tableDir)
    val bigSec = withDv(true) {
      timed { Versioned.deleteWhere(spark, tableDir, bigPred); () }
    }
    val bigSidecars = Versioned.snapshot(tableDir).dvs.size
    val (bigDataBytes, _, _) = addedByLast(snap2.files.toSet, Set.empty)

    val json =
      s"""{"label":"$label","n_docs":$nDocs,""" +
      s""""table_bytes":$tableBytes,"ingest_sec":${r3(tIngest)},""" +
      s""""point_rows":$nPoint,""" +
      s""""cow":{"delete_sec":${r3(cowSec)},""" +
      s""""data_bytes_written":$cowDataBytes,""" +
      s""""scan_after_sec":${r3(cowScan)}},""" +
      s""""dv":{"delete_sec":${r3(dvSec)},""" +
      s""""data_bytes_written":$dvDataBytes,""" +
      s""""sidecar_bytes":$dvSidecarBytes,"sidecars":$nSidecars,""" +
      s""""masked_scan_sec":${r3(maskedScan)},""" +
      s""""update_sec":${r3(dvUpdSec)},""" +
      s""""optimize_purge_sec":${r3(purgeSec)},""" +
      s""""scan_after_purge_sec":${r3(cleanScan)}},""" +
      s""""crossover_60pct":{"delete_sec":${r3(bigSec)},""" +
      s""""sidecars":$bigSidecars,""" +
      s""""data_bytes_written":$bigDataBytes}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    System.err.println(s"[dv-scale] $json")
    spark.stop()
  }
}
