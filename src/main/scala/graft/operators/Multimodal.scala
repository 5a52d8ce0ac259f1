package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Multimodal column handling: opaque `binary` payloads with typed metadata,
  * plus a decode/feature-extract stage.
  *
  * Three decode paths: [[decodeWav]] is a REAL audio decoder (RIFF/WAV
  * PCM-16 via pure JVM byte arithmetic); [[decodeImage]] is a REAL image
  * decoder (PNG/BMP/GIF/JPEG through the JDK's own javax.imageio — no
  * external library); formats that genuinely need external codecs
  * (MP3/H.264/...) go through `fakeDecode`, a clearly-marked deterministic
  * STUB (the container has no codec libraries).
  * Either way the Spark-side plumbing — binary column, metadata struct,
  * partition-iterator batch shape, output schema — is real and is what
  * matters at scale: decode runs per-partition (no shuffle), and the binary
  * column rides along columnar parquet scans.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata struct to a document
    * table (stand-in for image/audio bytes arriving in a real pipeline).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("content", col("text").cast("binary"))
      .withColumn("media", struct(
        lit("text/plain").as("mime"),
        octet_length(col("content")).cast("bigint").as("n_bytes"),
        (crc32(col("content")) % 1000).cast("int").as("checksum_bucket")))

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (JPEG/PNG/WAV...) here; this deterministic fake derives `dim` floats
    * from byte content so the pipeline shape is testable end-to-end.
    */
  private[graft] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      val z = (h + d) * 0x9E3779B97F4A7C15L
      val m = (z ^ (z >>> 31)) & ((1L << 24) - 1)
      out(d) = m.toFloat / (1 << 24)
      d += 1
    }
    out
  }

  /** Feature extraction over the binary payload column: mapPartitions so a
    * real decoder could amortize per-batch model/codec setup; appends a
    * `features: array<float>` column.
    */
  def extractFeatures(df: DataFrame, payloadCol: String = "content", dim: Int = 16): DataFrame = {
    val schema = df.schema.add("features", ArrayType(FloatType, containsNull = false))
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      // per-partition setup would init the decoder/model once here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // null payload (e.g. null source text) -> empty feature vector
        // rather than an executor-killing NPE mid-pipeline
        val feats = if (bytes == null) Seq.empty[Float] else fakeDecode(bytes, dim).toSeq
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
  }

  /** Deterministic PCM-16 WAV payload for doc `id` — a test-fixture ENCODER
    * whose sample values are a closed-form function of (id, index), so a SQL
    * oracle can recompute the decoded statistics independently. The DECODE
    * side ([[decodeWav]]) is the real RIFF parser; only the payload content
    * is synthetic (the container ships no media fixtures).
    * Samples: s_i = (id*131 + i*17) mod 2001 - 1000, n = 64 + id mod 50,
    * mono 8 kHz.
    */
  private[graft] def synthWav(id: Long): Array[Byte] = {
    val n = (64 + id % 50).toInt
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(1)          // PCM, mono
    buf.putInt(8000); buf.putInt(8000 * 2)    // rate, byte rate
    buf.putShort(2); buf.putShort(16)         // block align, bits
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort(((id * 131 + i * 17) % 2001 - 1000).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic RGB PNG payload for doc `id` — fixture encoder twin of
    * [[synthWav]] for the image modality (PNG written by the JDK's own
    * ImageIO; lossless, so the real [[decodeImage]] recovers the exact
    * pixels). Channel values are closed-form in (id, x, y):
    * r = (id*7 + x*13 + y*31) mod 256, g = (id*11 + x*3 + y*17) mod 256,
    * b = (id*5 + x*23 + y*29) mod 256, w = 8 + id mod 9, h = 6 + id mod 5.
    */
  private[graft] def synthPng(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (6 + id % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
        val g = ((id * 11 + x * 3 + y * 17) % 256).toInt
        val b = ((id * 5 + x * 23 + y * 29) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Append a synthetic media payload column (same mapPartitions batch shape
    * as the decoders; `make` is [[synthWav]] or [[synthPng]]).
    */
  def withSynthPayload(docs: DataFrame, make: Long => Array[Byte],
                       idCol: String = "doc_id"): DataFrame = {
    val schema = docs.schema.add("content",
      org.apache.spark.sql.types.BinaryType)
    implicit val enc = Encoders.row(schema)
    val idx = docs.schema.fieldIndex(idCol)
    // NOT spread here: the WAV consumers' decode is cheap and a blanket
    // exchange measurably regressed them (+0.25 s each in-suite); the
    // expensive PNG encode+decode pipelines spread at their call sites
    // (see Tables.spread).
    docs.mapPartitions(it => it.map(r => Row.fromSeq(r.toSeq :+ make(r.getLong(idx)))))
  }

  /** Decoded WAV metadata + amplitude features. */
  case class WavInfo(sample_rate: Int, n_channels: Int, n_samples: Long,
                     duration_s: Double, mean_abs_amplitude: Double)

  /** REAL audio decode for RIFF/WAV PCM-16 payloads — pure JVM byte parsing,
    * no codec library needed (the clearly-marked [[fakeDecode]] stands in
    * for formats that DO need one, e.g. JPEG/MP3). Returns null for payloads
    * that are not valid PCM-16 WAV.
    *
    * Header layout (little-endian): "RIFF" _ "WAVE", then chunks; the "fmt "
    * chunk carries audio_format(16) channels(22) sample_rate(24); the "data"
    * chunk carries the PCM samples.
    */
  /** Raw decoded PCM: header fields + all 16-bit samples, channel-
    * interleaved in file order. null for payloads that are not PCM-16 WAV.
    */
  private[graft] final case class WavPcm(rate: Int, channels: Int, samples: Array[Int])

  private[graft] def decodeWavPcm(bytes: Array[Byte]): WavPcm = {
    def u8(i: Int) = bytes(i) & 0xFF
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (bytes == null || bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var pos = 12
    var rate = 0; var channels = 0; var fmt = 0
    var dataOff = -1; var dataLen = 0L
    while (pos + 8 <= bytes.length && (dataOff < 0 || rate == 0)) {
      val id = tag(pos); val len = le32(pos + 4)
      if (id == "fmt " && pos + 16 <= bytes.length) {
        fmt = le16(pos + 8); channels = le16(pos + 10); rate = le32(pos + 12).toInt
      } else if (id == "data") { dataOff = pos + 8; dataLen = len }
      // chunks are 2-byte aligned; a corrupt/huge len (negative after toInt)
      // must terminate the scan, not walk backwards
      val step = 8 + len.toInt + (len.toInt & 1)
      if (step <= 8) pos = bytes.length else pos += step
    }
    if (rate <= 0 || channels <= 0 || fmt != 1 || dataOff < 0) return null
    val end = math.min(bytes.length.toLong, dataOff + dataLen).toInt
    val nVals = math.max(0, (end - dataOff) / 2)
    val samples = new Array[Int](nVals)
    var i = 0
    while (i < nVals) {
      samples(i) = (le16(dataOff + 2 * i) << 16) >> 16 // sign-extend 16-bit
      i += 1
    }
    WavPcm(rate, channels, samples)
  }

  private[graft] def decodeWav(bytes: Array[Byte]): WavInfo = {
    val pcm = decodeWavPcm(bytes)
    if (pcm == null) return null
    val nVals = pcm.samples.length
    val nSamples = nVals / pcm.channels
    var sum = 0.0
    var i = 0
    while (i < nVals) { sum += math.abs(pcm.samples(i)); i += 1 }
    WavInfo(pcm.rate, pcm.channels, nSamples, nSamples.toDouble / pcm.rate,
      if (nVals == 0) 0.0 else sum / nVals / 32768.0)
  }

  /** Near-clipping / peak statistics per clip: max |sample|, the count of
    * samples at or above `threshold`, and their share — the loudness-
    * curation twin of the silence ratio (drop clips that spend real time
    * pinned near full scale). Single decode pass per payload, executor-
    * local counters, no shuffle; all-integer intermediates with one floor
    * quantization, so the oracle replays it exactly.
    */
  def wavClipStats(df: DataFrame, payloadCol: String = "content",
                   threshold: Int = 900): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("n_samples", org.apache.spark.sql.types.LongType)
      .add("peak", org.apache.spark.sql.types.IntegerType)
      .add("n_over", org.apache.spark.sql.types.LongType)
      .add("over_ratio", org.apache.spark.sql.types.DoubleType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        val pcm = decodeWavPcm(r.getAs[Array[Byte]](idx))
        if (pcm == null || pcm.samples.length == 0) Iterator.empty
        else {
          var peak = 0; var over = 0L; var i = 0
          while (i < pcm.samples.length) {
            val a = math.abs(pcm.samples(i))
            if (a > peak) peak = a
            if (a >= threshold) over += 1
            i += 1
          }
          val n = pcm.samples.length.toLong
          val ratio = math.floor(over * 10000.0 / n) / 10000
          Iterator.single(Row.fromSeq(keep :+ n :+ peak :+ over :+ ratio))
        }
      }
    }
  }

  /** Per-frame RMS energy over decoded PCM — the feature-extraction step of
    * an audio curation pipeline (silence trimming, energy filtering), one
    * output row per `frame`-sample window. Same mapPartitions shape as the
    * other decoders: decode + window entirely inside the partition, no
    * shuffle; output volume is samples/frame rows. Frame sums are integer
    * squares (exactly representable), so RMS is bit-reproducible in any
    * summation order — the oracle replays it in SQL.
    */
  def wavFrameEnergy(df: DataFrame, payloadCol: String = "content",
                     frame: Int = 16): DataFrame = {
    require(frame > 0, "frame must be positive")
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("frame_no", org.apache.spark.sql.types.IntegerType)
      .add("n", org.apache.spark.sql.types.IntegerType)
      .add("rms", org.apache.spark.sql.types.DoubleType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        val pcm = decodeWavPcm(r.getAs[Array[Byte]](idx))
        if (pcm == null) Iterator.empty
        else {
          val nVals = pcm.samples.length
          val nFrames = (nVals + frame - 1) / frame
          (0 until nFrames).iterator.map { f =>
            val from = f * frame
            val until = math.min(from + frame, nVals)
            var sumSq = 0.0
            var i = from
            while (i < until) {
              val v = pcm.samples(i).toDouble
              sumSq += v * v
              i += 1
            }
            val cnt = until - from
            Row.fromSeq(keep :+ f :+ cnt :+ math.sqrt(sumSq / cnt) / 32768.0)
          }
        }
      }
    }
  }

  /** Exact integer per-frame energies (sum of int16 squares per
    * `frame`-sample window) — the bit-replayable frame feature under
    * [[wavSceneCut]] (the RMS variant [[wavFrameEnergy]] reports the
    * normalized double instead). Same partition-local decode shape.
    */
  private def wavFrameEnergyLong(df: DataFrame, payloadCol: String,
                                 frame: Int): DataFrame = {
    require(frame > 0, "frame must be positive")
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("frame_no", org.apache.spark.sql.types.IntegerType)
      .add("energy", org.apache.spark.sql.types.LongType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        val pcm = decodeWavPcm(r.getAs[Array[Byte]](idx))
        if (pcm == null) Iterator.empty
        else {
          val nVals = pcm.samples.length
          val nFrames = (nVals + frame - 1) / frame
          (0 until nFrames).iterator.map { f =>
            val from = f * frame
            val until = math.min(from + frame, nVals)
            var sumSq = 0L
            var i = from
            while (i < until) {
              val v = pcm.samples(i).toLong
              sumSq += v * v
              i += 1
            }
            Row.fromSeq(keep :+ f :+ sumSq)
          }
        }
      }
    }
  }

  /** Content-based scene segmentation — the video/audio shot-boundary
    * pass a multimodal curation pipeline runs before per-scene sampling:
    * a cut opens wherever the absolute delta of adjacent integer frame
    * energies exceeds `threshold`, and scenes are the gap-and-islands
    * rollup of the cut flags (running sum), reported per (doc, scene) as
    * start/end frame, length, and total energy. Decode + frame energies
    * are partition-local; the lag/cumsum windows are keyed per doc (no
    * global window), and the rollup is one doc-keyed groupBy — shuffle
    * volume is frames-per-doc rows, independent of media bytes. Exact
    * integers end to end, so the oracle replays every cut decision.
    */
  def wavSceneCut(df: DataFrame, payloadCol: String = "content",
                  frame: Int = 16, threshold: Long = 4000000L): DataFrame = {
    val byFrame = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_no")
    val run = byFrame.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    wavFrameEnergyLong(df, payloadCol, frame)
      .withColumn("prev_e", lag(col("energy"), 1).over(byFrame))
      .withColumn("cut",
        when(col("prev_e").isNull, lit(0L))
          .when(abs(col("energy") - col("prev_e")) > threshold, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("scene_no", sum(col("cut")).over(run))
      .groupBy(col("doc_id"), col("scene_no"))
      .agg(min(col("frame_no")).cast("bigint").as("start_frame"),
        max(col("frame_no")).cast("bigint").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("scene_energy"))
  }

  /** Zero-crossing rate per clip — the classic voiced/unvoiced and
    * noisiness discriminator next to energy/silence/pitch: count of
    * adjacent sample pairs with v[i-1]·v[i] < 0 over the decoded PCM-16
    * stream. Pure integer decision (a product of two Int16s can't lose the
    * sign in Long), one partition-local pass, no shuffle; the rate is
    * reported in exact basis points of the n−1 adjacent pairs.
    */
  def wavZeroCrossings(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("n_samples", org.apache.spark.sql.types.LongType)
      .add("n_crossings", org.apache.spark.sql.types.LongType)
      .add("zcr_bp", org.apache.spark.sql.types.LongType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        val pcm = decodeWavPcm(r.getAs[Array[Byte]](idx))
        if (pcm == null || pcm.samples.length < 2) Iterator.empty
        else {
          val s = pcm.samples
          var c = 0L
          var i = 1
          while (i < s.length) {
            if (s(i - 1).toLong * s(i).toLong < 0L) c += 1
            i += 1
          }
          Iterator.single(Row.fromSeq(
            keep :+ s.length.toLong :+ c :+ c * 10000L / (s.length - 1)))
        }
      }
    }
  }

  /** Haitsma–Kalker-style audio fingerprint (Haitsma & Kalker 2002, "A
    * Highly Robust Audio Fingerprinting System", ISMIR — the
    * sign-of-band/frame-energy-delta bit family): per clip, split each
    * `frame`-sample window into two polyphase pseudo-bands (even/odd
    * sample positions — the no-FFT stand-in for their Bark bands), take
    * the band-energy difference D(f) = E(f,even) − E(f,odd), and emit bit
    * f−1 = [D(f) > D(f−1)] — the same double-delta sign HK compute across
    * (frame, band). Band energies are integer sums of int16 squares, so
    * every comparison is exact and the fingerprint is bit-replayable in
    * SQL from the synthWav closed form, like the pHash oracle. One 64-bit
    * fingerprint word per clip from the first <=64 frame deltas
    * (production HK slides 256-frame subfingerprint blocks; one word is
    * the single-block form), plus the frame count and popcount.
    *
    * Scale shape: decode + fingerprint entirely partition-local (the
    * mapPartitions batch shape of every decoder here), no shuffle; output
    * is one fixed-width row per clip, so the downstream dedup groupBy
    * shuffles 16 bytes of key per clip regardless of media size.
    */
  def wavFingerprint(df: DataFrame, payloadCol: String = "content",
                     frame: Int = 4): DataFrame = {
    require(frame >= 2 && frame % 2 == 0, s"frame must be even >= 2, got $frame")
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("n_frames", org.apache.spark.sql.types.IntegerType)
      .add("fp", org.apache.spark.sql.types.LongType)
      .add("n_set", org.apache.spark.sql.types.IntegerType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        val pcm = decodeWavPcm(r.getAs[Array[Byte]](idx))
        if (pcm == null) Iterator.empty
        else {
          val nF = pcm.samples.length / frame // full frames only, like HK
          val d = new Array[Long](nF)
          var f = 0
          while (f < nF) {
            var e0 = 0L; var e1 = 0L; var i = 0
            while (i < frame) {
              val v = pcm.samples(f * frame + i).toLong
              if ((i & 1) == 0) e0 += v * v else e1 += v * v
              i += 1
            }
            d(f) = e0 - e1
            f += 1
          }
          var fp = 0L; var nSet = 0
          // bit f-1 from delta f; cap at 64 bits (frames beyond 65 are
          // outside the single fingerprint word)
          var g = 1
          val bitsEnd = math.min(nF, 65)
          while (g < bitsEnd) {
            if (d(g) > d(g - 1)) { fp |= 1L << (g - 1); nSet += 1 }
            g += 1
          }
          Iterator.single(Row.fromSeq(keep :+ nF :+ fp :+ nSet))
        }
      }
    }
  }

  /** WAV decode over a binary payload column via mapPartitions (same batch
    * shape as [[extractFeatures]]); appends a `wav` struct column, null for
    * non-WAV payloads.
    */
  def decodeWavColumn(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    val schema = df.schema.add("wav",
      org.apache.spark.sql.Encoders.product[WavInfo].schema)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val w = decodeWav(r.getAs[Array[Byte]](idx))
        val wRow = if (w == null) null
          else Row(w.sample_rate, w.n_channels, w.n_samples, w.duration_s, w.mean_abs_amplitude)
        Row.fromSeq(r.toSeq :+ wRow)
      }
    }
  }

  /** Decoded image metadata + luma statistics. */
  case class ImageInfo(width: Int, height: Int, n_pixels: Long, mean_luma: Double)

  private def luma(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
    0.2126 * r + 0.7152 * g + 0.0722 * b
  }

  /** REAL image decode for the formats the JDK ships codecs for (PNG, BMP,
    * GIF, JPEG via javax.imageio — no external library, headless-safe):
    * returns the pixel raster plus [[ImageInfo]] metadata, or None for
    * payloads ImageIO cannot parse. Like [[decodeWav]], this retires the
    * [[fakeDecode]] stub for another whole modality; the stub now stands in
    * only for genuinely codec-bound formats (MP3, H.264, ...).
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(java.awt.image.BufferedImage, ImageInfo)] = {
    if (bytes == null) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      // NonFatal, not just IOException: the JDK's imageio plugins throw
      // RuntimeExceptions (AIOOBE, NegativeArraySize, IllegalArgument) on
      // truncated/fuzzed payloads — on 100 TB of dirty data those must map
      // to "not an image", never to a task-killing escape
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      var sum = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += luma(img.getRGB(x, y)); x += 1 }
        y += 1
      }
      val n = img.getWidth.toLong * img.getHeight
      Some((img, ImageInfo(img.getWidth, img.getHeight, n, sum / n)))
    }
  }

  /** Per-image red-channel histogram over the decoded raster: one output
    * row per (image, 64-wide bucket) with pixel counts — the
    * color-distribution feature a vision-data curation pass computes
    * (exposure/tint filtering). Integer bucket counts are exactly
    * replayable from the fixture's closed form, so the REAL decode path is
    * oracle-gated at histogram granularity, not just the mean.
    */
  def imageChannelHist(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("bucket", org.apache.spark.sql.types.IntegerType)
      .add("n_px", org.apache.spark.sql.types.LongType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case None => Iterator.empty
          case Some((img, _)) =>
            val counts = new Array[Long](4)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val red = (img.getRGB(x, y) >> 16) & 0xFF
                counts(red >> 6) += 1
                x += 1
              }
              y += 1
            }
            (0 until 4).iterator.map(b => Row.fromSeq(keep :+ b :+ counts(b)))
        }
      }
    }
  }

  /** Patch (tile) feature extraction: partition the raster into a gw x gh
    * grid — the ViT-style patch decomposition — and emit one row per tile
    * with its pixel count and mean luma. Tile mapping and the integer luma
    * (2126r + 7152g + 722b, x1e4 fixed point) are shared with
    * [[imagePHash]]; the mean is floor(sum/cnt)/1e4 — exact integers until
    * one deterministic quantization, so the oracle replays it bit-for-bit.
    * One decode pass per image, rows emitted executor-locally.
    */
  def imageTileLuma(df: DataFrame, payloadCol: String = "content",
                    gw: Int = 2, gh: Int = 2): DataFrame = {
    require(gw > 0 && gh > 0, "grid dims must be positive")
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("tile", org.apache.spark.sql.types.IntegerType)
      .add("n_px", org.apache.spark.sql.types.LongType)
      .add("mean_luma", org.apache.spark.sql.types.DoubleType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case None => Iterator.empty
          case Some((img, _)) =>
            val (sums, cnts) = tileLumaSums(img, gw, gh)
            (0 until gw * gh).iterator.filter(cnts(_) > 0).map { c =>
              Row.fromSeq(keep :+ c :+ cnts(c) :+
                (math.floor(sums(c) * 1.0 / cnts(c)) / 10000))
            }
        }
      }
    }
  }

  /** Dominant quantized color per image: each pixel maps to a 64-cell RGB
    * cube key ((r>>6)*16 + (g>>6)*4 + (b>>6)); the modal cell, its pixel
    * count, and its share of the raster come back as one row per image —
    * the palette feature a vision-curation pass uses for monochrome /
    * flat-color filtering. Tie-break: highest count, then LOWEST key.
    *
    * Single decode pass with a 64-slot count array per image — no shuffle,
    * the argmax never leaves the executor. Share is quantized once with
    * floor(x*1e4)/1e4 from exact integer counts.
    */
  def imageDominantColor(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("dom_key", org.apache.spark.sql.types.IntegerType)
      .add("dom_px", org.apache.spark.sql.types.LongType)
      .add("n_pixels", org.apache.spark.sql.types.LongType)
      .add("dom_share", org.apache.spark.sql.types.DoubleType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case None => Iterator.empty
          case Some((img, _)) =>
            val counts = new Array[Long](64)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val key = (((rgb >> 16) & 0xFF) >> 6) * 16 +
                  ((((rgb >> 8) & 0xFF) >> 6) << 2) + ((rgb & 0xFF) >> 6)
                counts(key) += 1
                x += 1
              }
              y += 1
            }
            var best = 0; var i = 1
            while (i < 64) { if (counts(i) > counts(best)) best = i; i += 1 }
            val n = img.getWidth.toLong * img.getHeight
            val share = math.floor(counts(best) * 10000.0 / n) / 10000
            Iterator.single(Row.fromSeq(keep :+ best :+ counts(best) :+ n :+ share))
        }
      }
    }
  }

  /** Resize + feature-extract: scale the image to a gw x gh thumbnail
    * (bilinear) and emit the normalized luma of each cell, row-major — the
    * classic cheap perceptual embedding (and the "resize" op of the brief).
    */
  private[graft] def imageGridLuma(img: java.awt.image.BufferedImage,
                                   gw: Int, gh: Int): Array[Float] = {
    import java.awt.image.BufferedImage
    val small = new BufferedImage(gw, gh, BufferedImage.TYPE_INT_RGB)
    val g2 = small.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g2.drawImage(img, 0, 0, gw, gh, null)
    g2.dispose()
    val out = new Array[Float](gw * gh)
    var i = 0
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) { out(i) = (luma(small.getRGB(x, y)) / 255.0).toFloat; i += 1; x += 1 }
      y += 1
    }
    out
  }

  /** Image decode + resize-grid features over a binary payload column via
    * mapPartitions (same per-partition batch shape as [[extractFeatures]]
    * and [[decodeWavColumn]]); appends an `img` struct and an
    * `img_features: array<float>` column, both null for non-image payloads.
    */
  def decodeImageColumn(df: DataFrame, payloadCol: String = "content",
                        gridW: Int = 4, gridH: Int = 4): DataFrame = {
    val schema = df.schema
      .add("img", org.apache.spark.sql.Encoders.product[ImageInfo].schema)
      .add("img_features", ArrayType(FloatType, containsNull = false))
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      // payloads are already in memory — skip ImageIO's default per-read
      // disk-cache temp file (JVM-global flag, idempotent per executor)
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case Some((img, info)) =>
            Row.fromSeq(r.toSeq :+
              Row(info.width, info.height, info.n_pixels, info.mean_luma) :+
              imageGridLuma(img, gridW, gridH).toSeq)
          case None => Row.fromSeq(r.toSeq :+ null :+ null)
        }
      }
    }
  }

  /** Shared per-cell luma accumulation: integer-basis-point luma
    * (2126 r + 7152 g + 722 b) summed into a gw x gh grid by exact integer
    * division — the ONE definition of cell geometry that imagePHash and
    * imageTileLuma both document as identical.
    */
  private def tileLumaSums(img: java.awt.image.BufferedImage,
                           gw: Int, gh: Int): (Array[Long], Array[Long]) = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val li = 2126L * ((rgb >> 16) & 0xFF) + 7152L * ((rgb >> 8) & 0xFF) +
          722L * (rgb & 0xFF)
        val c = (y * gh / h) * gw + (x * gw / w)
        sums(c) += li; cnts(c) += 1
        x += 1
      }
      y += 1
    }
    (sums, cnts)
  }

  /** Perceptual hash over RAW pixels (no Java2D resize — its bilinear math
    * is implementation-defined and could not be replayed by an oracle):
    * pixels partition into a gw x gh grid by exact integer division, cell
    * luma accumulates in INTEGER basis points (2126 r + 7152 g + 722 b),
    * and bit i sets when cell i's mean exceeds the image mean — compared by
    * integer cross-multiplication, so the hash is exact by construction.
    * Near-duplicate images differ in few bits (hamming-comparable), the
    * image twin of SimHash.
    */
  private[graft] def imagePHash(img: java.awt.image.BufferedImage,
                                gw: Int = 4, gh: Int = 4): (Int, Int) = {
    val (sums, cnts) = tileLumaSums(img, gw, gh)
    val ts = sums.sum; val tc = cnts.sum
    var phash = 0; var nSet = 0; var i = 0
    while (i < gw * gh) {
      if (cnts(i) > 0 && sums(i) * tc > ts * cnts(i)) { phash |= 1 << i; nSet += 1 }
      i += 1
    }
    (phash, nSet)
  }

  /** [[imagePHash]] over a binary payload column via mapPartitions —
    * appends integer `phash` and `n_set` columns (null on undecodable
    * payloads). Same per-partition batch shape as [[decodeImageColumn]].
    */
  def imagePHashColumn(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    val schema = df.schema
      .add("phash", org.apache.spark.sql.types.IntegerType)
      .add("n_set", org.apache.spark.sql.types.IntegerType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case Some((img, _)) =>
            val (p, n) = imagePHash(img)
            Row.fromSeq(r.toSeq :+ p :+ n)
          case None => Row.fromSeq(r.toSeq :+ null :+ null)
        }
      }
    }
  }

  /** Frame sampling for video-like payloads: one row per sampled frame index
    * (every `stride`-th frame in [0, n_frames)), declaratively via
    * explode(sequence(...)) so Catalyst plans it without a shuffle; the
    * per-frame byte extraction then belongs in the per-partition decoder
    * ([[decodeWavColumn]]-style), keyed by (payload, frame_idx).
    */
  def sampleFrames(df: DataFrame, nFramesCol: String, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    df.filter(col(nFramesCol) >= 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col(nFramesCol).cast("int") - 1, lit(stride))))
  }

  /** Blur/sharpness score per image — the Laplacian-energy metric every
    * image-curation pipeline runs before training (drop the blurry/flat
    * frames): for each interior pixel, L = 4·lum − lum(left) − lum(right)
    * − lum(up) − lum(down) over the integer luma lum = 299R + 587G + 114B
    * (the Rec.601 weights at scale 1000 — kept integer so the score is
    * exact), reported as Σ L² with the interior pixel count. REAL decode
    * (javax.imageio) in the same mapPartitions batch shape as the other
    * image features; O(pixels) per image, no shuffle; |L| ≤ 6·255000 so
    * Σ L² fits a Long until ~10⁶ pixels per image.
    */
  def imageSharpness(df: DataFrame, payloadCol: String = "content"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("w", org.apache.spark.sql.types.IntegerType)
      .add("h", org.apache.spark.sql.types.IntegerType)
      .add("n_interior", org.apache.spark.sql.types.IntegerType)
      .add("sharpness", org.apache.spark.sql.types.LongType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case None => Iterator.empty
          case Some((img, _)) =>
            val w = img.getWidth
            val h = img.getHeight
            def lum(x: Int, y: Int): Long = {
              val rgb = img.getRGB(x, y)
              299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
                114L * (rgb & 0xFF)
            }
            var acc = 0L
            var n = 0
            var y = 1
            while (y < h - 1) {
              var x = 1
              while (x < w - 1) {
                val l = 4 * lum(x, y) - lum(x - 1, y) - lum(x + 1, y) -
                  lum(x, y - 1) - lum(x, y + 1)
                acc += l * l
                n += 1
                x += 1
              }
              y += 1
            }
            Iterator.single(Row.fromSeq(keep :+ w :+ h :+ n :+ acc))
        }
      }
    }
  }

  /** Autocorrelation pitch estimate per clip: the lag in [minLag, maxLag]
    * maximizing R(lag) = Σ v[i]·v[i+lag] over the decoded PCM samples —
    * the classic time-domain fundamental-frequency estimator (speech/music
    * curation: voiced-speech detection, tone classification) that needs no
    * FFT library. Everything is integer products of 16-bit samples summed
    * into a Long (exactly representable: |v| <= 2^15, so each term fits in
    * 31 bits and a clip needs > 2^32 samples to overflow — we require far
    * fewer), so the winning lag and its score are bit-reproducible and the
    * SQL oracle can replay them from the synth closed form. Same
    * mapPartitions shape as [[wavFrameEnergy]]: decode + O(samples·lags)
    * scoring entirely inside the partition, one output row per clip, no
    * shuffle.
    */
  def wavAutocorrPitch(df: DataFrame, payloadCol: String = "content",
                       minLag: Int = 2, maxLag: Int = 16): DataFrame = {
    require(0 < minLag && minLag <= maxLag, s"bad lag range [$minLag, $maxLag]")
    val schema = org.apache.spark.sql.types.StructType(
        df.schema.filterNot(_.name == payloadCol))
      .add("n_samples", org.apache.spark.sql.types.IntegerType)
      .add("r0", org.apache.spark.sql.types.LongType)
      .add("best_lag", org.apache.spark.sql.types.IntegerType)
      .add("best_r", org.apache.spark.sql.types.LongType)
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val keep = r.toSeq.patch(idx, Nil, 1)
        val pcm = decodeWavPcm(r.getAs[Array[Byte]](idx))
        if (pcm == null || pcm.samples.length <= maxLag) Iterator.empty
        else {
          val v = pcm.samples
          val n = v.length
          var r0 = 0L
          var i = 0
          while (i < n) { r0 += v(i).toLong * v(i); i += 1 }
          var bestLag = minLag
          var bestR = Long.MinValue
          var lag = minLag
          while (lag <= maxLag) {
            var acc = 0L
            var j = 0
            while (j < n - lag) { acc += v(j).toLong * v(j + lag); j += 1 }
            if (acc > bestR) { bestR = acc; bestLag = lag } // ties keep the SMALLER lag
            lag += 1
          }
          Iterator.single(Row.fromSeq(keep :+ n :+ r0 :+ bestLag :+ bestR))
        }
      }
    }
  }

  /** Multimodal record assembly: documents joined with their embedding
    * vectors into one struct-typed row (text + vector + metadata). The join
    * key is the shared id; at scale both sides are bucketed on it via
    * [[graft.sources.BucketedSink]] — FormatsSpec demonstrates the
    * exchange-free co-bucketed join plan.
    */
  def multimodalJoin(docs: DataFrame, embs: DataFrame): DataFrame =
    withPayload(docs)
      .join(embs, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"),
        struct(col("text"), col("embedding"), col("media")).as("record"),
        col("media.n_bytes").as("n_bytes"),
        size(col("embedding")).cast("bigint").as("dim"),
        col("label").cast("bigint").as("label"),
        col("lang"))
}
