package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-sink ABORT safety contract (round-12 self-review
  * finding): epoch directories are DETERMINISTIC across replays, so a
  * failed REPLAY's abort must delete only the files its own tasks
  * reported — never the directory — or it would destroy the files a
  * prior successful attempt of the same epoch already PUBLISHED
  * (data loss on every later read). Lives in package graft.sources
  * to drive the private[sources] write classes directly: the crash
  * window (publish succeeded, checkpoint marker lost, replay fails)
  * cannot be reached deterministically through a public stream. */
class StreamingAbortSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("aborting a replayed epoch never deletes a prior attempt's published files") {
    import spark.implicits._
    val t = Files.createTempDirectory("graftv-abort-").toString
    Versioned.commit(Seq((0L, "seed")).toDF("id", "s"), t) // the table
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, s STRING")
    val qid = "qfixed-abort-spec"
    val w = new VersionedStreamingWrite(t, schema, qid)
    val factory = w.createStreamingWriterFactory(null)
    def writeAttempt(rows: Seq[(Long, String)], taskId: Long)
        : org.apache.spark.sql.connector.write.WriterCommitMessage = {
      val dw = factory.createWriter(0, taskId, 0L) // epoch 0
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      val ser = org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder(enc).createSerializer()
      rows.foreach { case (id, s) =>
        dw.write(ser(org.apache.spark.sql.Row(id, s)).copy())
      }
      dw.commit()
    }
    // attempt 1 of epoch 0 succeeds and PUBLISHES
    val m1 = writeAttempt(Seq((1L, "a"), (2L, "b")), taskId = 1L)
    w.commit(0L, Array(m1))
    val published = Versioned.read(spark, t).count()
    assert(published === 3L)
    // the checkpoint marker is lost (crash window); attempt 2 replays
    // epoch 0 into the SAME directory, then FAILS -> abort
    val m2 = writeAttempt(Seq((1L, "a"), (2L, "b")), taskId = 2L)
    w.abort(0L, Array(m2))
    // attempt 1's published files must be intact: the table still reads
    assert(Versioned.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((0L, "seed"), (1L, "a"), (2L, "b")),
      "abort of a replayed epoch destroyed published data")
    // and attempt 2's own files are gone (no strays from reported tasks)
    val epochDir = java.nio.file.Paths.get(
      Versioned.normPath(s"$t/${VersionedStreamingWrite.epochRel(qid.take(12), 0L)}"))
    val remaining = {
      val s = java.nio.file.Files.list(epochDir)
      try s.iterator().asScala.toSeq.map(_.getFileName.toString)
        .filterNot(_.startsWith(".")) // local-FS .crc sidecars
      finally s.close()
    }
    val m1Files = m1.asInstanceOf[VersionedCommitMsg].relPaths.toSet
    assert(remaining.toSet === m1Files,
      s"epoch dir should hold exactly attempt 1's files: $remaining")
  }

}
