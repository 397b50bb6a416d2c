package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GOLDEN-PIXEL fixture for the lossy-JPEG multimodal queries
  * (VERDICT r9 task 7). The T.81 Huffman+IDCT decode has no
  * independent SQL twin — that is mm1/mm2's principled rows-only
  * story — but the FEATURE math downstream of the decoder does:
  * decoding each sf0.01 JPEG image once, reviewing, and committing
  * the pixel matrix as parquet (the SeedFixture discipline, under
  * `fixtures/`) lets DuckDB hash-check the histogram and
  * pool/DCT/median pHash laws over those pixels, shrinking the
  * unoracled surface to the decoder alone — and pinning the decoder
  * itself against silent drift (a changed IDCT/upsample rounding
  * flips committed pixels and fails the oracle).
  *
  * One row per decoded pixel of the JPEG half of the image modality
  * ((doc_id % 3 == 0) ∧ ((doc_id / 3) % 2 == 0) — the complement of
  * mm2_phash_bmp's lossless half): (media_id, w, px_idx,
  * lum3 = r+g+b). lum3 serves both consumers: mm1's luminance bins
  * are (lum3 / 3) / 32 and mm2's integer pHash pools lum3 directly.
  * ~80 images × ≤ 248 px at sf0.01 — a few thousand rows.
  *
  * Regenerate (after an INTENDED decoder change, with review):
  *   sbt "runMain graft.sources.GoldenPixels"
  * GoldenPixelsSpec pins the committed fixture against a fresh
  * decode, MaterialsTwinSpec-style.
  */
object GoldenPixels {
  val path = "/root/repo/fixtures/golden_jpeg_pixels.parquet"

  /** Round 16 (VERDICT r15 #8): the decoded pixels of mm2's
    * BMP-original TWIN variants — each BMP image re-encoded as
    * quality-95 JPEG (imageVariants' exact recipe) and decoded back.
    * With this, EVERY variant mm2_image_phash hashes has committed or
    * law-derivable pixels: JPEG originals (and their lossless-BMP
    * twins) in [[path]], BMP originals via the synthesis law, and
    * these twins here — so the FULL pairing query gets a hash-matched
    * DuckDB oracle, leaving only the codec pair itself unoracled
    * (and drift-pinned by GoldenPixelsSpec). */
  val twinPath = "/root/repo/fixtures/golden_twinjpeg_pixels.parquet"

  /** Fresh decode of the JPEG image half at `dir` as
    * (media_id, w, px_idx, lum3) rows. */
  def fresh(spark: SparkSession, dir: String) = {
    import spark.implicits._
    graft.operators.Multimodal.mediaFromDocuments(spark, dir)
      .filter(m => m.kind == "image" && (m.media_id / 3) % 2 == 0)
      .flatMap { m =>
        val img = graft.operators.Multimodal.decodeImage(m.payload)
        img.rgb.zipWithIndex.map { case (px, i) =>
          (m.media_id, img.width,
            i, ((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF))
        }
      }
      .toDF("media_id", "w", "px_idx", "lum3")
  }

  /** Fresh decode of the BMP half's JPEG-95 twins at `dir`, keyed by
    * the ORIGINAL media id (the twin variant is 2·media_id + 1). */
  def freshTwin(spark: SparkSession, dir: String) = {
    import spark.implicits._
    graft.operators.Multimodal.mediaFromDocuments(spark, dir)
      .filter(m => m.kind == "image" && (m.media_id / 3) % 2 == 1)
      .flatMap { m =>
        val img = graft.operators.Multimodal.decodeImage(m.payload)
        val twin = graft.sources.Jpeg.encode(
          graft.sources.Jpeg.Image(img.width, img.height, img.rgb),
          quality = 95)
        val dec = graft.operators.Multimodal.decodeImage(twin)
        dec.rgb.zipWithIndex.map { case (px, i) =>
          (m.media_id, dec.width,
            i, ((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF))
        }
      }
      .toDF("media_id", "w", "px_idx", "lum3")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions",
      "org.apache.spark.sql.graftx.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fresh(spark, "/root/testdata/sf0.01")
      .coalesce(1)
      .orderBy(col("media_id"), col("px_idx"))
      .write.mode("overwrite").parquet(path)
    println(s"[golden-pixels] wrote $path")
    freshTwin(spark, "/root/testdata/sf0.01")
      .coalesce(1)
      .orderBy(col("media_id"), col("px_idx"))
      .write.mode("overwrite").parquet(twinPath)
    println(s"[golden-pixels] wrote $twinPath")
    spark.stop()
  }
}
