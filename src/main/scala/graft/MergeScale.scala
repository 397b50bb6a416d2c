package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Measures the round-11 STRING-KEY merge path at corpus scale: the
  * reference's row identity is a uuid4 string, so the load-bearing
  * question is whether a uuid-keyed upsert on a large table still
  * prunes its copy-on-write set from the manifest's (truncated ASCII)
  * string stats the way the BIGINT path does.
  *
  * Protocol on a `MakeScale`-expanded corpus: commit the documents
  * with a `u-<id>` uuid key in 8 appends, OPTIMIZE range-clustered ON
  * THE STRING KEY (tight per-file string ranges), then merge a small
  * uuid batch three ways and record wall-clock + the carried-file
  * count (files NOT rewritten = proof the string stats pruned):
  *  - a range-tight batch (uuids from one narrow key range);
  *  - a scattered batch (uuids spread across the key space);
  *  - a composite (uuid, bucket) batch through the same machinery.
  *
  * Output: bench/merge_string_<label>.json.
  */
object MergeScale {
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val tableDir = args(1)
    val label = if (args.length > 2) args(2) else "25x"
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

    val docs = Tables(spark, srcDir, "documents")
      .select(
        concat(lit("u-"), lpad(col("doc_id").cast("string"), 12, "0"))
          .as("uid"),
        pmod(col("doc_id"), lit(7)).as("bucket"),
        col("n_chars"), col("doc_id"))
    val tbl = docs.select(col("uid"), col("bucket"), col("n_chars"))
    val nDocs = docs.count()

    val tIngest = timed {
      (0 until 8).foreach(i =>
        Versioned.commit(tbl.where(pmod(col("doc_id"), lit(8)) === i),
          tableDir, "append"))
    }
    val tCluster = timed {
      Versioned.optimize(spark, tableDir, numFiles = 32,
        clusterBy = Seq("uid"))
    }
    val base = Versioned.snapshot(tableDir)
    System.err.println(s"[merge-scale] $label: $nDocs docs, " +
      s"${base.files.size} files clustered on the STRING key; " +
      s"ingest ${r3(tIngest)}s cluster ${r3(tCluster)}s")

    def mergeProbe(name: String, updates: DataFrame,
        keys: Seq[String]): String = {
      val before = Versioned.snapshot(tableDir)
      val nUpd = updates.count()
      val t = timed { Versioned.merge(updates, tableDir, keys) }
      val after = Versioned.snapshot(tableDir)
      val carried = after.files.toSet.intersect(before.files.toSet).size
      val rewritten = before.files.size - carried
      System.err.println(f"[merge-scale] $label $name: $nUpd rows, " +
        f"$carried of ${before.files.size} files carried " +
        f"($rewritten rewritten) in ${t}%.2fs")
      s"""  "$name": {"rows": $nUpd, "files_before": ${before.files.size}, "carried": $carried, "rewritten": $rewritten, "sec": ${r3(t)}}"""
    }

    // key-range endpoints taken FROM the data (the id space is
    // MakeScale-re-keyed, so literal ranges would miss): the sorted
    // uuid list's [1000, 1300) and [10000, 10200) slices — O(slices)
    // driver rows, study-driver only
    val uids = tbl.select(col("uid")).orderBy(col("uid"))
      .limit(10200).collect().map(_.getString(0))
    // 1. range-tight: one narrow uuid range (the clustered layout's
    // best case — the string stats should carry almost everything)
    val tight = mergeProbe("uuid_range_tight",
      tbl.where(col("uid").between(uids(1000), uids(1299)))
        .withColumn("n_chars", -col("n_chars")),
      Seq("uid"))
    // 2. scattered: a hash residue across the whole key space (worst
    // case for range stats — the rewrite set approaches the file
    // count, which is the honest cost of a scattered upsert)
    val scattered = mergeProbe("uuid_scattered",
      tbl.where(pmod(xxhash64(col("uid")), lit(400L)) === 0L)
        .withColumn("n_chars", -col("n_chars")),
      Seq("uid"))
    // 3. composite (uuid, bucket) through the same machinery
    val composite = mergeProbe("composite_uuid_bucket",
      tbl.where(col("uid").between(uids(10000), uids(10199)))
        .withColumn("n_chars", lit(0L)),
      Seq("uid", "bucket"))

    // 4. bulk-insert merge into a 1-file table (round 12; VERDICT r11
    // "What's wrong" #1): the whole corpus merges into a nearly-empty
    // table — the r11 coalesce(touched.size) would funnel every
    // inserted row through ONE writer task; the round-12 file scaling
    // must land multiple output files and keep the write parallel.
    val bulkDir = tableDir + "-bulk"
    Versioned.commit(tbl.limit(1).coalesce(1), bulkDir, "append")
    // target sized to the corpus so the scaling is OBSERVABLE here
    // (~16 files); production default is 2^20 rows/file
    spark.conf.set("spark.graft.versioned.targetFileRows",
      math.max(1000L, nDocs / 16).toString)
    val bulkBefore = Versioned.snapshot(bulkDir)
    val tBulk = timed { Versioned.merge(tbl, bulkDir, Seq("uid")) }
    spark.conf.unset("spark.graft.versioned.targetFileRows")
    val bulkAfter = Versioned.snapshot(bulkDir)
    val bulkRows = Versioned.read(spark, bulkDir).count()
    System.err.println(f"[merge-scale] $label bulk_insert: $nDocs rows " +
      f"into ${bulkBefore.files.size}-file table -> " +
      f"${bulkAfter.files.size} files in ${tBulk}%.2fs " +
      f"(rows_after=$bulkRows)")
    val bulk =
      s"""  "bulk_insert_merge": {"rows": $nDocs, "files_before": ${bulkBefore.files.size}, "files_after": ${bulkAfter.files.size}, "rows_after": $bulkRows, "target_file_rows": ${math.max(1000L, nDocs / 16)}, "sec": ${r3(tBulk)}}"""

    // 5. updateWhere on a tight uuid range (round 12): the COW UPDATE
    // must prune like the point delete. The earlier merge probes left
    // mixed-range rewrite outputs, so re-cluster first — the same
    // OPTIMIZE-restores-pruning maintenance a real table runs.
    Versioned.optimize(spark, tableDir, numFiles = 32,
      clusterBy = Seq("uid"))
    val updBefore = Versioned.snapshot(tableDir)
    val tUpd = timed {
      Versioned.updateWhere(spark, tableDir,
        col("uid").between(uids(2000), uids(2199)),
        Map("n_chars" -> (col("n_chars") + 1L)))
    }
    val updAfter = Versioned.snapshot(tableDir)
    val updCarried = updAfter.files.toSet
      .intersect(updBefore.files.toSet).size
    System.err.println(f"[merge-scale] $label update_tight: " +
      f"$updCarried of ${updBefore.files.size} files carried in ${tUpd}%.2fs")
    val updProbe =
      s"""  "update_where_tight": {"rows": 200, "files_before": ${updBefore.files.size}, "carried": $updCarried, "rewritten": ${updBefore.files.size - updCarried}, "sec": ${r3(tUpd)}}"""

    // 6. NOT-MATCHED-BY-SOURCE sync merge (round 12): its footprint
    // is every unmatched target row, so the WHOLE table rewrites —
    // measured here so the honest cost is on the record (this is the
    // operation's semantics, not a missed optimization)
    val nmbsBefore = Versioned.snapshot(tableDir)
    val tNmbs = timed {
      Versioned.mergeClauses(
        tbl.where(pmod(xxhash64(col("uid")), lit(4L)) === 0L), tableDir,
        Seq("uid"),
        matched = Seq(Versioned.WhenMatched.Update(None)),
        notMatched = Seq(Versioned.WhenNotMatched.Insert(None)),
        notMatchedBySource = Seq(Versioned.WhenMatched.Update(None,
          set = Map("bucket" -> lit(-1L)))))
    }
    val nmbsAfter = Versioned.snapshot(tableDir)
    val nmbsCarried = nmbsAfter.files.toSet
      .intersect(nmbsBefore.files.toSet).size
    System.err.println(f"[merge-scale] $label nmbs_sync: " +
      f"$nmbsCarried of ${nmbsBefore.files.size} files carried " +
      f"(full rewrite by design) in ${tNmbs}%.2fs")
    val nmbsProbe =
      s"""  "nmbs_sync_merge": {"files_before": ${nmbsBefore.files.size}, "carried": $nmbsCarried, "sec": ${r3(tNmbs)}, "note": "whole-table rewrite is the operation's semantics"}"""

    val json = s"""{\n  "label": "$label", "n_docs": $nDocs, "ingest_sec": ${r3(tIngest)}, "cluster_sec": ${r3(tCluster)},\n$tight,\n$scattered,\n$composite,\n$bulk,\n$updProbe,\n$nmbsProbe\n}\n"""
    val p = java.nio.file.Paths.get(s"bench/merge_string_$label.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, json)
    println(json)
    spark.stop()
  }
}
