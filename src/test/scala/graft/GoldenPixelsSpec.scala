package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the committed golden-pixel fixture (the MaterialsTwinSpec
  * discipline): the fixture at fixtures/golden_jpeg_pixels.parquet
  * must equal a fresh decode of the sf0.01 JPEG half. A decoder
  * change (or a driver testdata regeneration) fails HERE first, with
  * the regeneration command in the message — never silently at the
  * mm1/mm2 golden oracles. */
class GoldenPixelsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
    .getOrCreate()

  test("committed golden pixels equal a fresh JPEG decode of sf0.01") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val fresh = graft.sources.GoldenPixels.fresh(spark, dir)
    val committed = spark.read.parquet(graft.sources.GoldenPixels.path)
    val key = Seq("media_id", "px_idx")
    val onlyFresh = fresh.join(committed, key, "left_anti").count()
    val changed = fresh.join(committed
        .withColumnRenamed("lum3", "lum3_c").withColumnRenamed("w", "w_c"),
        key)
      .where(col("lum3") =!= col("lum3_c") || col("w") =!= col("w_c"))
      .count()
    val onlyCommitted = committed.join(fresh, key, "left_anti").count()
    assert(onlyFresh === 0L && onlyCommitted === 0L && changed === 0L,
      s"golden pixels drifted (fresh-only=$onlyFresh committed-only=" +
        s"$onlyCommitted changed=$changed): if the decoder change is " +
        "INTENDED, review and regenerate with " +
        "sbt \"runMain graft.sources.GoldenPixels\"")
    assert(committed.count() > 1000L) // a real pixel population
  }

  test("committed twin golden pixels equal a fresh JPEG-95 re-encode+decode of the BMP half") {
    // round 16 (VERDICT r15 #8): the twin fixture feeds the FULL mm2
    // pairing oracle — pin it against a live re-encode the same way
    // the main fixture is pinned against a live decode.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val fresh = graft.sources.GoldenPixels.freshTwin(spark, dir)
    val committed =
      spark.read.parquet(graft.sources.GoldenPixels.twinPath)
    val key = Seq("media_id", "px_idx")
    val onlyFresh = fresh.join(committed, key, "left_anti").count()
    val changed = fresh.join(committed
        .withColumnRenamed("lum3", "lum3_c").withColumnRenamed("w", "w_c"),
        key)
      .where(col("lum3") =!= col("lum3_c") || col("w") =!= col("w_c"))
      .count()
    val onlyCommitted = committed.join(fresh, key, "left_anti").count()
    assert(onlyFresh === 0L && onlyCommitted === 0L && changed === 0L,
      s"twin golden pixels drifted (fresh-only=$onlyFresh " +
        s"committed-only=$onlyCommitted changed=$changed): if the " +
        "codec change is INTENDED, review and regenerate with " +
        "sbt \"runMain graft.sources.GoldenPixels\"")
    assert(committed.count() > 1000L)
  }

  test("golden pHash query equals the BMP-oracle law applied to the committed pixels") {
    // cross-check INSIDE the engine too: the query's phash64Int over
    // the live decode must equal pHashing the committed pixel rows —
    // the same equality the DuckDB oracle asserts cross-engine.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val fromQuery = graft.operators.Multimodal
      .imagePhashJpegGolden(spark, dir)
      .select(col("media_id"), col("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val px = spark.read.parquet(graft.sources.GoldenPixels.path)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    val fromFixture = px.map { case (id, rows) =>
      val w = rows.head._2
      val rgbLike = new Array[Int](rows.length)
      rows.foreach { case (_, _, i, lum3) =>
        // phash64Int only consumes r+g+b: encode lum3 back into one
        // channel-splittable int (lum3 ≤ 765 > 255, so split across
        // two channels to stay byte-ranged)
        val hi = math.min(lum3, 255)
        val rest = lum3 - hi
        val mid = math.min(rest, 255)
        rgbLike(i) = (hi << 16) | (mid << 8) | (rest - mid)
      }
      id -> graft.operators.Multimodal.phash64Int(
        graft.sources.Bmp.Image(w, rows.length / w, rgbLike))
    }
    assert(fromFixture.size === fromQuery.size)
    fromFixture.foreach { case (id, ph) =>
      assert(fromQuery(id) === ph, s"pHash mismatch for media $id")
    }
  }
}
