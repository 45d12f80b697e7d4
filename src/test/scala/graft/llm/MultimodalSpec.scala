package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = catalog.table("documents")
    .limit(50)
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  test("mediaPipeline: typed meta + decoded struct + feature vector") {
    val out = Multimodal.mediaPipeline(mediaDf, col("payload"),
      lit("image/png"))
    val schema = out.schema
    assert(schema("media_meta").dataType.catalogString ===
      Multimodal.MediaMetaSchema.catalogString)
    val r = out.select(col("media_meta.mime"), col("media_meta.n_bytes"),
      col("decoded.ok"), size(col("features"))).head()
    assert(r.getString(0) === "image/png")
    assert(r.getLong(1) > 0 && r.getBoolean(2) && r.getInt(3) === 8)
  }

  test("batched mapPartitions decode agrees with the columnar stub") {
    val cols = Multimodal.mediaPipeline(mediaDf, col("payload"),
        lit("image/png"))
      .select(col("doc_id"), col("decoded.width"), col("decoded.height"),
        col("decoded.channels"), col("decoded.ok"))
      .collect().map(_.toSeq).toSet
    val batched = Multimodal.decodeImagesBatched(mediaDf, col("payload"))
      .select(col("doc_id"), col("decoded.width"), col("decoded.height"),
        col("decoded.channels"), col("decoded.ok"))
      .collect().map(_.toSeq).toSet
    assert(batched === cols)
    // output schema keeps the input columns + the typed decoded struct
    val sch = Multimodal.decodeImagesBatched(mediaDf, col("payload")).schema
    assert(sch.fieldNames.toSeq === Seq("doc_id", "payload", "decoded"))
    assert(sch("decoded").dataType.catalogString ===
      Multimodal.DecodedSchema.catalogString)
  }

  test("frame sampling splits the payload into non-empty byte ranges") {
    val out = mediaDf.select(
      Multimodal.stubSampleFrames(col("payload"), 4).as("frames"),
      length(col("payload")).as("len"))
    val r = out.filter(col("len") >= 4).head()
    val frames = r.getSeq[Array[Byte]](0)
    assert(frames.length === 4)
    assert(frames.forall(_.nonEmpty))
  }

  test("REAL codec roundtrip: JDK ImageIO decodes the PNG the " +
      "pipeline encoded — dimensions, channels, magic bytes") {
    val rows = Seq((1L, 17, 9), (2L, 64, 48), (3L, 8, 8))
      .toDF("id", "w", "h")
    val withPayload = Multimodal.encodePngBatched(rows, $"w", $"h",
      $"id")
    val decoded = Multimodal.decodeImagesBatched(withPayload,
        col("payload"), Multimodal.imageIoDecoder)
      .select($"id",
        col("decoded.width"), col("decoded.height"),
        col("decoded.channels"), col("decoded.ok"))
      .as[(Long, Int, Int, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(decoded(1L) === ((1L, 17, 9, 3, true)))
    assert(decoded(2L) === ((2L, 64, 48, 3, true)))
    assert(decoded(3L) === ((3L, 8, 8, 3, true)))
    // magic bytes say png
    val fmts = Multimodal.encodePngBatched(rows, $"w", $"h", $"id")
      .select(Multimodal.sniffFormat(col("payload")))
      .as[String].collect().toSet
    assert(fmts === Set("png"))
  }

  test("REAL codec quarantine: truncated and garbage payloads " +
      "report ok = false instead of throwing") {
    val png = Multimodal.pngBytes(16, 16, 7L)
    assert(Multimodal.imageIoDecoder(png) === ((16, 16, 3, true)))
    assert(Multimodal.imageIoDecoder(png.take(10))._4 === false)
    assert(Multimodal.imageIoDecoder("not an image".getBytes)._4
      === false)
    assert(Multimodal.imageIoDecoder(Array.emptyByteArray)._4
      === false)
    // JPEG also ships with the JDK: encode one, decode it back
    val img = new java.awt.image.BufferedImage(20, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val (jw, jh, jc, jok) = Multimodal.imageIoDecoder(out.toByteArray)
    assert((jw, jh, jc, jok) === ((20, 12, 3, true)))
  }

  test("REAL resize: pinned nearest-neighbor sampling — the 8x8 " +
      "thumbnail's pixels equal the source at the mapped indices") {
    val src = Multimodal.pngBytes(24, 16, 5L)
    val rz = Multimodal.resizeNearest(src, 8, 8)
    assert(Multimodal.imageIoDecoder(rz) === ((8, 8, 3, true)))
    val srcImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(src))
    val rzImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rz))
    for (y2 <- 0 until 8; x2 <- 0 until 8)
      assert(rzImg.getRGB(x2, y2) ===
        srcImg.getRGB(x2 * 24 / 8, y2 * 16 / 8), s"($x2,$y2)")
    // garbage input resizes to the empty quarantine payload
    assert(Multimodal.resizeNearest("junk".getBytes, 8, 8).isEmpty)
  }

  test("REAL audio roundtrip: AudioSystem parses the synthesized WAV " +
      "and the signed-sample sum matches the formula") {
    val n = 100
    val wav = Multimodal.wavBytes(n, 8000, seed = 9L)
    val (rate, ch, bits, frames, sum, ok) = Multimodal.audioFeatures(wav)
    assert((rate, ch, bits, frames, ok) === ((8000, 1, 16, n.toLong,
      true)))
    val expected = (0 until n).map(i =>
      ((9L * 31 + i * 7) & 0xffffL) - 32768L).sum
    assert(sum === expected)
    // quarantine on garbage
    assert(Multimodal.audioFeatures("nope".getBytes)._6 === false)
  }

  test("audioFeatures quarantines parseable-but-unsupported formats " +
      "(big-endian AIFF) instead of summing bytes as LE16") {
    // same PCM samples, AIFF container (big-endian by spec)
    val n = 50
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (((9L * 31 + i * 7) & 0xffffL) - 32768L).toInt
      data(2 * i) = ((v >> 8) & 0xff).toByte // big-endian
      data(2 * i + 1) = (v & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val (rate, ch, bits, frames, sum, ok) =
      Multimodal.audioFeatures(out.toByteArray)
    // header parses (it's a valid AIFF) but the LE16 fold would be
    // byte-swapped garbage, so the row must quarantine
    assert((rate, ch, bits) === ((8000, 1, 16)))
    assert((frames, sum, ok) === ((0L, 0L, false)))
  }

  test("corrupt-media quarantine kernel: mid-stream truncation and " +
      "header smash both quarantine deterministically, per format") {
    // PNG halved mid-IDAT: magic sniffs, decode fails
    val png = Multimodal.pngBytes(20, 12, seed = 7L)
    val pngHalf = png.take(png.length / 2)
    assert(Multimodal.imageIoDecoder(png)._4 === true)
    assert(Multimodal.imageIoDecoder(pngHalf)._4 === false)
    // WAV halved: header (44 bytes) survives, data chunk delivers
    // fewer frames than declared -> the completeness check trips
    val wav = Multimodal.wavBytes(100, 8000, seed = 7L)
    val wavHalf = wav.take(wav.length / 2)
    assert(Multimodal.audioFeatures(wav)._6 === true)
    val (_, _, _, nHalf, _, okHalf) = Multimodal.audioFeatures(wavHalf)
    assert(okHalf === false, s"read $nHalf frames from truncated wav")
    // header smash (drop the first 8 bytes): neither sniffs nor decodes
    assert(Multimodal.imageIoDecoder(png.drop(8))._4 === false)
    assert(Multimodal.audioFeatures(wav.drop(8))._6 === false)
  }

  test("encode*Batched refuses inputs whose columns collide with the " +
      "reserved temp names (positional strip would eat them)") {
    val clash = Seq((1L, 9)).toDF("id", "__w")
    val e = intercept[IllegalArgumentException] {
      Multimodal.encodePngBatched(clash, lit(8), lit(8), $"id")
    }
    assert(e.getMessage.contains("__w"))
    val clash2 = Seq((1L, 9)).toDF("id", "__n")
    intercept[IllegalArgumentException] {
      Multimodal.encodeWavBatched(clash2, lit(4), lit(8000), $"id")
    }
    val clash3 = Seq((1L, 9)).toDF("id", "__f")
    intercept[IllegalArgumentException] {
      Multimodal.encodeGifBatched(clash3, lit(4), lit(4), lit(2),
        $"id")
    }
  }

  test("REAL frame sampling: every 2nd frame of the animated GIF, " +
      "gray pixels lossless against the formula") {
    val bytes = Multimodal.gifBytes(11, 7, nFrames = 5, seed = 42L)
    val frames = Multimodal.gifFrameStats(bytes, every = 2)
    assert(frames.map(_._1) === Seq(0, 2, 4))
    frames.foreach { case (f, w, h, sum) =>
      assert((w, h) === ((11, 7)))
      val expect = (for (y <- 0 until 7; x <- 0 until 11)
        yield (42L * 31 + f * 17 + x * 7 + y * 131) & 0xff).sum
      assert(sum === expect, s"frame $f")
    }
    assert(Multimodal.gifFrameStats("junk".getBytes, 2).isEmpty)
  }

  test("perceptual hash: identical images hash identically across " +
      "re-encodes; different images differ; garbage is null") {
    val a1 = Multimodal.aHash64(Multimodal.pngBytes(24, 16, 77777L))
    val a2 = Multimodal.aHash64(Multimodal.pngBytes(24, 16, 77777L))
    val b = Multimodal.aHash64(Multimodal.pngBytes(24, 16, 1234567L))
    assert(a1 !== null)
    assert(a1.length === 64 && a1.forall(c => c == '0' || c == '1'))
    assert(a1 === a2, "same pixels must hash identically")
    assert(a1 !== b, "different images must (here) differ")
    assert(Multimodal.aHash64("junk".getBytes) === null)
  }
}
