package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schemas, batching, partition sizing) is
  * real, and since round 9 so is the IMAGE decode: the JDK's
  * javax.imageio ships PNG/JPEG/GIF/BMP codecs, so
  * [[imageIoDecoder]] is a genuine bytes→pixels→properties pass
  * (exercised end-to-end by q301 against an oracle that knows the
  * encoded dimensions). The [[stubDecodeImage]] family remains as
  * the deterministic fixture and as the stand-in for codecs the JDK
  * lacks (video, audio, webp) — swap those behind the same schema in
  * production (a `mapPartitions` JNI decoder or `mapInArrow`).
  * Everything downstream of the decode schema is codec-agnostic.
  */
object Multimodal extends Serializable {

  /** Media metadata schema attached next to every binary payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType)))

  /** Wrap a binary payload column with its typed metadata struct. */
  def withMediaMeta(payload: Column, mime: Column): Column =
    struct(mime.as("mime"),
           length(payload).cast(LongType).as("n_bytes"),
           xxhash64(payload).as("checksum"))

  /** Container-format sniffing from MAGIC BYTES — the real first
    * stage of any media ingest (route by actual content, never trust
    * the extension/mime column): hex of the first 8 payload bytes
    * matched against the public signatures. Pure byte ops on the
    * binary column (codegen'd substring/hex — no codec, no UDF), so
    * unlike the decode stubs this path is NOT environment-blocked. */
  def sniffFormat(payload: Column): Column = {
    val h = hex(substring(payload, 1, 8))
    when(h.startsWith("89504E47"), lit("png"))
      .when(h.startsWith("FFD8FF"), lit("jpeg"))
      .when(h.startsWith("47494638"), lit("gif"))
      .when(h.startsWith("52494646"), lit("riff"))
      .otherwise(lit("unknown"))
  }

  /** STUB decode: deterministic fake image properties from payload
    * hashes (stands in for a real codec; see object doc). Output schema
    * is the real contract: struct(width, height, channels, ok). Each
    * property uses its own salted hash — pure integer math, so the
    * batched [[stubDecoder]] reproduces it bit-for-bit. */
  def stubDecodeImage(payload: Column): Column =
    struct(
      (pmod(xxhash64(payload), lit(1920L)) + 1L)
        .cast(IntegerType).as("width"),
      (pmod(xxhash64(payload, lit(1)), lit(1080L)) + 1L)
        .cast(IntegerType).as("height"),
      (pmod(xxhash64(payload, lit(2)), lit(3L)) + 1L)
        .cast(IntegerType).as("channels"),
      (length(payload) > 0).as("ok"))

  /** STUB feature extraction: a fixed-length deterministic pseudo-feature
    * vector (real contract: Array[Float] of `dim`). */
  def stubImageFeatures(payload: Column, dim: Int = 8): Column =
    array((0 until dim).map { i =>
      (pmod(xxhash64(payload, lit(i)), lit(1000L)).cast(DoubleType) /
        lit(1000.0)).cast(FloatType)
    }: _*)

  /** STUB frame sampling for video-like payloads: split the payload into
    * `frames` byte-range "frames" (real contract: array of binary). */
  def stubSampleFrames(payload: Column, frames: Int = 4): Column = {
    val n = length(payload)
    val step = greatest((n / frames).cast(IntegerType), lit(1))
    filter(
      array((0 until frames).map { i =>
        substring(payload, lit(i) * step + 1, step)
      }: _*),
      f => length(f) > 0)
  }

  /** Build a media table from any binary source column: payload + typed
    * meta + decoded properties + features. Partition advice: payloads are
    * large — repartition so partitions stay ~128MB
    * (`df.repartition(ceil(totalBytes / 128MB))`) before wide decode
    * stages; this helper keeps the narrow no-shuffle shape. */
  def mediaPipeline(df: DataFrame, payload: Column, mime: Column): DataFrame =
    df.withColumn("media_meta", withMediaMeta(payload, mime))
      .withColumn("decoded", stubDecodeImage(payload))
      .withColumn("features", stubImageFeatures(payload))

  /** Decoded-image properties produced by a batch decoder. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("ok", BooleanType)))

  /** Deterministic stub byte decoder — same hash-derived fake
    * properties as [[stubDecodeImage]], so the batched and columnar
    * paths are mutually checkable. A real deployment swaps this
    * function for a codec call; nothing else changes. */
  def stubDecoder(bytes: Array[Byte]): (Int, Int, Int, Boolean) = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    // xxhash64(payload) / xxhash64(payload, i): the multi-arg form
    // seeds the int literal's hash with the payload hash
    val h0 = XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    val h1 = XXH64.hashInt(1, h0)
    val h2 = XXH64.hashInt(2, h0)
    def pmod(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }
    ((pmod(h0, 1920L) + 1L).toInt, (pmod(h1, 1080L) + 1L).toInt,
      (pmod(h2, 3L) + 1L).toInt, bytes.length > 0)
  }

  /** BATCHED decode via `mapPartitions` — the shape a real codec needs:
    * the decoder (JNI handle, model, …) is initialized ONCE per
    * partition and fed payloads row by row; output appends a typed
    * `decoded` struct to the input row. This is the Scala analog of a
    * pandas `mapInPandas` decode stage (no Python runtime in a Scala
    * library): row-local, no shuffle, partition-sized batches.
    * `decoder` defaults to the deterministic stub (no codecs in this
    * environment); swap in the real codec behind the same signature. */
  def decodeImagesBatched(df: DataFrame, payload: Column,
      decoder: Array[Byte] => (Int, Int, Int, Boolean) = stubDecoder)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val withP = df.withColumn("__payload", payload)
    val outSchema = StructType(
      df.schema.fields :+ StructField("decoded", DecodedSchema))
    val pIdx = withP.schema.fieldIndex("__payload")
    val result = withP.mapPartitions { it =>
      // per-partition decoder init would go here (JNI/codec handle)
      val dec = decoder
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        val (w, h, c, ok) =
          if (bytes == null) (0, 0, 0, false) else dec(bytes)
        Row.fromSeq(
          row.toSeq.patch(pIdx, Nil, 1) :+ Row(w, h, c, ok))
      }
    }(Encoders.row(outSchema))
    result
  }

  // ---------------------------------------------------------------
  // REAL codec path (round 9): the JDK SHIPS image codecs —
  // javax.imageio reads/writes PNG, JPEG, GIF and BMP with no
  // external dependency — so for those formats the decode stage is
  // NOT environment-blocked after all. The stubs above remain as the
  // deterministic fixtures (and as the stand-in for codecs the JDK
  // lacks: video, audio, webp), but the production-shaped pipeline
  // below is a genuine bytes -> pixels -> properties pass.
  // ---------------------------------------------------------------

  /** REAL image decoder on the JDK's ImageIO: returns (width, height,
    * color components, ok). Undecodable or truncated payloads report
    * ok = false rather than throwing — a media ingest must quarantine
    * bad bytes, not die on them. */
  def imageIoDecoder(bytes: Array[Byte]): (Int, Int, Int, Boolean) =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) (0, 0, 0, false)
      else (img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents, true)
    } catch { case _: Throwable => (0, 0, 0, false) }

  /** Deterministic REAL PNG payload: a w×h RGB image whose pixels are
    * a fixed function of (seed, x, y), encoded by the JDK's PNG
    * writer. Used to synthesize genuine binary media columns from
    * the test tables (which carry none) — the bytes then flow through
    * [[sniffFormat]] and [[imageIoDecoder]] exactly as ingest bytes
    * would. */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (seed * 31 + x * 7 + y * 131).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL feature extraction from decoded pixels: per-channel INTEGER
    * sums over the raster (plus pixel count) — the exact-arithmetic
    * core of mean-color / brightness features, emitted as sums so the
    * numbers are order-independent and bit-replayable (divide once
    * downstream if a mean is wanted). Undecodable payloads report
    * ok = false with zero sums. */
  def pixelChannelSums(bytes: Array[Byte])
      : (Long, Long, Long, Long, Boolean) =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) (0L, 0L, 0L, 0L, false)
      else {
        var (r, g, b) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val px = img.getRGB(x, y)
            r += (px >> 16) & 0xff
            g += (px >> 8) & 0xff
            b += px & 0xff
            x += 1
          }
          y += 1
        }
        (r, g, b, img.getWidth.toLong * img.getHeight, true)
      }
    } catch { case _: Throwable => (0L, 0L, 0L, 0L, false) }

  /** Schema of [[featurizeImagesBatched]]'s appended struct. */
  val PixelSumsSchema: StructType = StructType(Seq(
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType), StructField("n_px", LongType),
    StructField("ok", BooleanType)))

  /** Batched REAL featurize via `mapPartitions` (same shape as
    * [[decodeImagesBatched]]): appends a `px` struct of exact
    * per-channel sums. */
  def featurizeImagesBatched(df: DataFrame, payload: Column)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val withP = df.withColumn("__payload", payload)
    val outSchema = StructType(
      df.schema.fields :+ StructField("px", PixelSumsSchema))
    val pIdx = withP.schema.fieldIndex("__payload")
    withP.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        val (r, g, b, n, ok) =
          if (bytes == null) (0L, 0L, 0L, 0L, false)
          else pixelChannelSums(bytes)
        Row.fromSeq(
          row.toSeq.patch(pIdx, Nil, 1) :+ Row(r, g, b, n, ok))
      }
    }(Encoders.row(outSchema))
  }

  /** REAL nearest-neighbor resize: decode, sample
    * out(x2, y2) = in((x2·w) / w2, (y2·h) / h2) with integer floor
    * division (the replayable mapping), re-encode as PNG. The manual
    * raster walk — not an AWT scaling op — pins the sampling rule so
    * a relational oracle can replay it. Undecodable input yields an
    * empty payload (downstream featurize reports ok = false). */
  def resizeNearest(bytes: Array[Byte], w2: Int, h2: Int)
      : Array[Byte] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) Array.emptyByteArray
      else {
        val out = new java.awt.image.BufferedImage(w2, h2,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y2 = 0
        while (y2 < h2) {
          var x2 = 0
          while (x2 < w2) {
            out.setRGB(x2, y2,
              img.getRGB(x2 * img.getWidth / w2,
                y2 * img.getHeight / h2))
            x2 += 1
          }
          y2 += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Throwable => Array.emptyByteArray }

  /** Batched REAL resize via `mapPartitions`: appends a `resized`
    * binary column (a genuine re-encoded PNG — the thumbnail /
    * model-input-normalization stage). */
  def resizeImagesBatched(df: DataFrame, payload: Column,
                          w2: Int, h2: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val withP = df.withColumn("__payload", payload)
    val outSchema = StructType(
      df.schema.fields :+ StructField("resized", BinaryType))
    val pIdx = withP.schema.fieldIndex("__payload")
    withP.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        val rz = if (bytes == null) Array.emptyByteArray
          else resizeNearest(bytes, w2, h2)
        Row.fromSeq(row.toSeq.patch(pIdx, Nil, 1) :+ rz)
      }
    }(Encoders.row(outSchema))
  }

  // --- audio: the JDK also ships a WAV/AIFF/AU parser
  //     (javax.sound.sampled), so PCM audio decode is real too ---

  /** Deterministic REAL WAV payload: PCM 16-bit mono little-endian,
    * sample i = ((seed·31 + i·7) & 0xffff) − 32768 — a pure function
    * of (seed, i), so feature oracles replay it with no codec. */
  def wavBytes(nSamples: Int, sampleRate: Int, seed: Long)
      : Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((seed * 31 + i * 7) & 0xffffL) - 32768L).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode + feature extraction via the JDK's
    * AudioSystem: parses the container header (sample rate, channels,
    * bits), streams the PCM frames, and sums the signed 16-bit
    * samples — exact integers, order-fixed by the stream. Bad bytes
    * quarantine as ok = false. */
  def audioFeatures(bytes: Array[Byte])
      : (Int, Int, Int, Long, Long, Boolean) =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      // the sample fold below assumes signed 16-bit little-endian PCM;
      // other parseable containers (AIFF/AU big-endian, 8-bit, float)
      // must quarantine rather than report a silently wrong sum
      if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
          f.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
        (f.getSampleRate.toInt, f.getChannels,
          f.getSampleSizeInBits, 0L, 0L, false)
      } else {
        val raw = ais.readAllBytes()
        var (sum, n) = (0L, 0L)
        var i = 0
        while (i + 1 < raw.length) {
          sum += ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort.toLong
          n += 1
          i += 2
        }
        // a mid-stream-truncated payload can still parse its header:
        // the container then DECLARES more frames than the bytes
        // deliver. Silent short reads are the worst media-ingest
        // failure mode — quarantine them, don't report a wrong sum.
        val declared = ais.getFrameLength * f.getChannels
        val complete = declared < 0 || n == declared
        (f.getSampleRate.toInt, f.getChannels,
          f.getSampleSizeInBits, n, sum, complete)
      }
    } catch { case _: Throwable => (0, 0, 0, 0L, 0L, false) }

  /** Schema of [[featurizeAudioBatched]]'s appended struct. */
  val AudioSchema: StructType = StructType(Seq(
    StructField("rate", IntegerType), StructField("channels", IntegerType),
    StructField("bits", IntegerType), StructField("n_samples", LongType),
    StructField("sum_samples", LongType), StructField("ok", BooleanType)))

  /** Batched REAL audio decode/featurize via `mapPartitions`. */
  def featurizeAudioBatched(df: DataFrame, payload: Column)
      : DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val withP = df.withColumn("__payload", payload)
    val outSchema = StructType(
      df.schema.fields :+ StructField("audio", AudioSchema))
    val pIdx = withP.schema.fieldIndex("__payload")
    withP.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        val (r, c, b, n, s, ok) =
          if (bytes == null) (0, 0, 0, 0L, 0L, false)
          else audioFeatures(bytes)
        Row.fromSeq(
          row.toSeq.patch(pIdx, Nil, 1) :+ Row(r, c, b, n, s, ok))
      }
    }(Encoders.row(outSchema))
  }

  /** The encode*Batched builders append temp columns then strip them
    * by position with `dropRight`; if the input ALREADY has a column
    * with one of the temp names, `withColumn` replaces in place
    * instead of appending and the positional strip would silently
    * drop the wrong (caller-owned) columns. Fail loudly instead. */
  private def requireTempNamesFree(df: DataFrame,
                                   names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with reserved " +
        "temp names; rename them before calling encode*Batched")
  }

  /** Batched REAL WAV synthesis via `mapPartitions` (the audio analog
    * of [[encodePngBatched]]). */
  def encodeWavBatched(df: DataFrame, nSamples: Column, rate: Column,
                       seed: Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    requireTempNamesFree(df, "__n", "__r", "__s")
    val withC = df.withColumn("__n", nSamples.cast(IntegerType))
      .withColumn("__r", rate.cast(IntegerType))
      .withColumn("__s", seed.cast(LongType))
    val outSchema = StructType(
      df.schema.fields :+ StructField("payload", BinaryType))
    val ni = withC.schema.fieldIndex("__n")
    val ri = withC.schema.fieldIndex("__r")
    val si = withC.schema.fieldIndex("__s")
    withC.mapPartitions { it =>
      it.map { row =>
        val bytes = wavBytes(row.getInt(ni), row.getInt(ri),
          row.getLong(si))
        Row.fromSeq(row.toSeq.dropRight(3) :+ bytes)
      }
    }(Encoders.row(outSchema))
  }

  // --- multi-frame (video-like) payloads: ImageIO reads ANIMATED
  //     GIFs frame by frame, so frame SAMPLING — the video stage this
  //     object used to stub — is real for GIF containers. 256-gray
  //     frames keep the palette lossless, so frame pixels are
  //     formula-replayable like the PNG path. ---

  /** Deterministic REAL animated GIF: `nFrames` w×h 256-level-gray
    * frames, pixel (f, x, y) = (seed·31 + f·17 + x·7 + y·131) & 0xff
    * — a pure function, losslessly preserved by the GIF palette. */
  def gifBytes(w: Int, h: Int, nFrames: Int, seed: Long)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.getRaster.setSample(x, y, 0,
            ((seed * 31 + f * 17 + x * 7 + y * 131) & 0xff).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    out.toByteArray
  }

  /** REAL frame sampling: decode every `every`-th frame of a
    * multi-frame container and return (frame_ix, width, height,
    * gray-sum) per sampled frame — the keyframe-extraction shape.
    * Undecodable payloads return an empty seq (quarantine). */
  def gifFrameStats(bytes: Array[Byte], every: Int)
      : Seq[(Int, Int, Int, Long)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Seq.empty
      else {
        val reader = readers.next()
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n by every).map { f =>
          val img = reader.read(f)
          var s = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              s += img.getRGB(x, y) & 0xff
              x += 1
            }
            y += 1
          }
          (f, img.getWidth, img.getHeight, s)
        }
      }
    } catch { case _: Throwable => Seq.empty }

  /** Schema of [[sampleFramesBatched]]'s appended struct. */
  val FrameSchema: StructType = StructType(Seq(
    StructField("frame_ix", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_gray", LongType),
    StructField("ok", BooleanType)))

  /** Batched REAL frame sampling via `mapPartitions`: one OUTPUT row
    * per sampled frame (flatMap shape — a clip fans out to its
    * keyframes), `frame.ok = false` single row for undecodable
    * payloads. */
  def sampleFramesBatched(df: DataFrame, payload: Column,
                          every: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val withP = df.withColumn("__payload", payload)
    val outSchema = StructType(
      df.schema.fields :+ StructField("frame", FrameSchema))
    val pIdx = withP.schema.fieldIndex("__payload")
    withP.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        val rest = row.toSeq.patch(pIdx, Nil, 1)
        val frames =
          if (bytes == null) Seq.empty else gifFrameStats(bytes, every)
        if (frames.isEmpty)
          Iterator(Row.fromSeq(rest :+ Row(-1, 0, 0, 0L, false)))
        else frames.iterator.map { case (f, w, h, s) =>
          Row.fromSeq(rest :+ Row(f, w, h, s, true))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Batched REAL animated-GIF synthesis via `mapPartitions`. */
  def encodeGifBatched(df: DataFrame, w: Column, h: Column,
                       nFrames: Column, seed: Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    requireTempNamesFree(df, "__w", "__h", "__f", "__s")
    val withC = df.withColumn("__w", w.cast(IntegerType))
      .withColumn("__h", h.cast(IntegerType))
      .withColumn("__f", nFrames.cast(IntegerType))
      .withColumn("__s", seed.cast(LongType))
    val outSchema = StructType(
      df.schema.fields :+ StructField("payload", BinaryType))
    val wi = withC.schema.fieldIndex("__w")
    val hi = withC.schema.fieldIndex("__h")
    val fi = withC.schema.fieldIndex("__f")
    val si = withC.schema.fieldIndex("__s")
    withC.mapPartitions { it =>
      it.map { row =>
        val bytes = gifBytes(row.getInt(wi), row.getInt(hi),
          row.getInt(fi), row.getLong(si))
        Row.fromSeq(row.toSeq.dropRight(4) :+ bytes)
      }
    }(Encoders.row(outSchema))
  }

  /** REAL perceptual hash (aHash) from decoded pixels: decode,
    * nearest-neighbor-resize to 8×8 with the [[resizeNearest]]
    * mapping, take the GREEN channel (one exact integer per cell —
    * no luminance-weighting rounding hazards), threshold each cell
    * against the integer-floor mean, and emit the 64 bits as a
    * '0'/'1' string in (y, x) raster order. A string, not a packed
    * long: bit 63 shifts range-check differently across engines (the
    * q207 lesson) while a char sequence replays anywhere. Identical
    * images hash identically; near-dups differ in few bits — the
    * image twin of MinHash for multimodal corpus dedup. Undecodable
    * payloads return null (quarantine). */
  def aHash64(bytes: Array[Byte]): String =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val g = new Array[Long](64)
        var sum = 0L
        var i = 0
        while (i < 64) {
          val x2 = i % 8
          val y2 = i / 8
          val px = img.getRGB(x2 * img.getWidth / 8,
            y2 * img.getHeight / 8)
          g(i) = (px >> 8) & 0xff
          sum += g(i)
          i += 1
        }
        val mean = sum / 64
        val sb = new StringBuilder(64)
        var j = 0
        while (j < 64) {
          sb.append(if (g(j) > mean) '1' else '0')
          j += 1
        }
        sb.toString
      }
    } catch { case _: Throwable => null }

  /** Batched REAL perceptual hashing via `mapPartitions`: appends an
    * `ahash` string column. */
  def aHashBatched(df: DataFrame, payload: Column): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val withP = df.withColumn("__payload", payload)
    val outSchema = StructType(
      df.schema.fields :+ StructField("ahash", StringType))
    val pIdx = withP.schema.fieldIndex("__payload")
    withP.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](pIdx)
        val hsh = if (bytes == null) null else aHash64(bytes)
        Row.fromSeq(row.toSeq.patch(pIdx, Nil, 1) :+ hsh)
      }
    }(Encoders.row(outSchema))
  }

  /** Distributed media synthesis: append a REAL PNG `payload` column
    * with per-row dimensions — `mapPartitions`, row-local, the same
    * batched shape as [[decodeImagesBatched]] (payload bytes never
    * leave their partition). */
  def encodePngBatched(df: DataFrame, w: Column, h: Column,
                       seed: Column): DataFrame =
    encodeImageBatched(df, w, h, seed)(pngBytes)

  /** Deterministic REAL JPEG payload: the [[pngBytes]] raster pushed
    * through the JDK's JPEG writer. JPEG is LOSSY — pixel values are
    * NOT formula-replayable (the honest boundary: q311 gates
    * dimensions/decodability only) — but the container geometry and
    * decodability are exact, which is what the ingest-side routing
    * and quarantine logic depend on. */
  def jpegBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (seed * 31 + x * 7 + y * 131).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** [[encodePngBatched]]'s JPEG sibling. */
  def encodeJpegBatched(df: DataFrame, w: Column, h: Column,
                        seed: Column): DataFrame =
    encodeImageBatched(df, w, h, seed)(jpegBytes)

  private def encodeImageBatched(df: DataFrame, w: Column, h: Column,
                                 seed: Column)
      (codec: (Int, Int, Long) => Array[Byte]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    requireTempNamesFree(df, "__w", "__h", "__s")
    val withC = df.withColumn("__w", w.cast(IntegerType))
      .withColumn("__h", h.cast(IntegerType))
      .withColumn("__s", seed.cast(LongType))
    val outSchema = StructType(
      df.schema.fields :+ StructField("payload", BinaryType))
    val wi = withC.schema.fieldIndex("__w")
    val hi = withC.schema.fieldIndex("__h")
    val si = withC.schema.fieldIndex("__s")
    withC.mapPartitions { it =>
      it.map { row =>
        val bytes = codec(row.getInt(wi), row.getInt(hi),
          row.getLong(si))
        Row.fromSeq(row.toSeq.dropRight(3) :+ bytes)
      }
    }(Encoders.row(outSchema))
  }
}
