package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Versioned

/** Child JVM for [[CrossProcessRaceSpec]]: a genuinely independent
  * process (own SparkSession, own filesystem view, no shared JVM
  * state with the parent or its sibling) racing appends into one
  * graftv table. Each append goes through the public
  * [[Versioned.commit]] — the same optimistic-publish/rebase loop
  * every writer uses — so contention is arbitrated purely by the
  * storage primitive (atomic create-exclusive manifest link), exactly
  * the cross-process boundary Delta documents per storage backend.
  *
  * stdout protocol (one line per event, parsed by the parent spec):
  *   COMMITTED writer=<w> seq=<i> version=<v>
  *   CHILD_OK writer=<w> commits=<n>
  */
object RaceChildMain {
  def main(args: Array[String]): Unit = {
    // DV-delete mode (round 16, VERDICT r15 #5): one merge-on-read
    // point delete of an id residue class — landed from a REAL second
    // JVM inside the parent's read-to-publish window, so the parent's
    // own DV delete must abort and the retry must merge THIS mask
    args match {
      case Array(t, "dvdelete", residue) =>
        val spark0 = SparkSession.builder()
          .master("local[2]")
          .appName("graft-race-child-dv")
          .config("spark.sql.shuffle.partitions", "2")
          .config("spark.ui.enabled", "false")
          .config("spark.graft.dv.enabled", "true")
          .getOrCreate()
        spark0.sparkContext.setLogLevel("ERROR")
        try {
          val v = Versioned.deleteWhere(spark0, t,
            org.apache.spark.sql.functions.col("id") % 10 ===
              residue.toLong)
          println(s"DV_OK residue=$residue version=$v")
        } finally spark0.stop()
        return
      case _ => ()
    }
    val (table, writerIdS, nCommitsS, rowsPerS, baseIdOpt) = args match {
      case Array(t, w, n, r) => (t, w, n, r, None)
      // optional 5th arg (round 14, the FORCED-abort arm): an explicit
      // base id so the child's appended keys OVERLAP the parent's
      // merge range — the parent's COW publish then cannot prove the
      // interloper key-disjoint and must abort, cross-process
      case Array(t, w, n, r, b) => (t, w, n, r, Some(b.toLong))
    }
    val writerId = writerIdS.toInt
    val nCommits = nCommitsS.toInt
    val rowsPer = rowsPerS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-child-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      (0 until nCommits).foreach { i =>
        val base = baseIdOpt.getOrElse(writerId * 1000000L) + i * 1000L
        val df = (0 until rowsPer)
          .map(j => (base + j, writerId, i, 0L))
          .toDF("id", "writer", "commit_seq", "v")
        val ver = Versioned.commit(df, table)
        println(s"COMMITTED writer=$writerId seq=$i version=$ver")
      }
      println(s"CHILD_OK writer=$writerId commits=$nCommits")
    } finally spark.stop()
  }
}
