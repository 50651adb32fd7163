package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * transforms.
  *
  * Images are REAL: payloads are PNG-encoded pixel rasters and the
  * decode path runs `javax.imageio` (ships in the JDK) — features are
  * computed from decoded pixels, so any lossless re-encode of the same
  * raster dedups identically. Audio/video decode remains STUBBED with a
  * deterministic fake (this container ships no audio/video codecs — see
  * the builder brief): `fakeDecode` derives stats from the raw bytes
  * reproducibly. Everything around the codec — schema, binary handling,
  * partition-batched processing shape, frame sampling — is identical
  * for all three kinds; swapping in ffmpeg for audio/video changes only
  * the function body.
  *
  * Scale notes: media blobs are processed with `mapPartitions`-style
  * typed transforms (one decoder init per partition, streaming over
  * rows — the same shape a Python pipeline gets from mapInPandas);
  * blobs never enter a shuffle (metadata is extracted first, joins
  * happen on scalar columns).
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      meta_width: Int,
      meta_height: Int,
      meta_duration_ms: Int)

  /** `content_fp_hi`/`content_fp_lo` are two INDEPENDENTLY-seeded FNV
    * states over the same decoded pixel/byte stream — a 128-bit
    * composite identity, mirroring [[ExactDedup.fp]] and
    * [[TextAnalysis.keepCorpus]]: [[dedupMedia]] is a destructive
    * first-writer-wins collapse, and a single 64-bit key silently
    * merges distinct media at the 10^9–10^12-item design point
    * (birthday bound). Each seed induces a different bytes→hash
    * bijection, so an hi collision does not propagate to lo. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      content_fp_hi: Long,
      content_fp_lo: Long,
      mean_byte_x100: Long,
      frame_fps: Seq[Long])

  /** Second FNV initial state (any odd constant ≠ the standard offset
    * basis works; same role as keepCorpus's seeded graft_doc_fp). */
  private val FnvSeed2 = 0x71C67A39E5B495A7L

  /** ImageIO must not touch a display server on executors. */
  private def ensureHeadless(): Unit =
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")

  /** Deterministic small RGB raster for `src`: pixel values are a pure
    * mix64 chain, PNG-encoded (lossless, so decode returns these exact
    * pixels). */
  private[operators] def encodePng(src: Long, seed: Long): (Array[Byte], Int, Int) = {
    ensureHeadless()
    val w = 8 + (Hashing.mix64(seed ^ src ^ 0x11L) & 0x17L).toInt // 8..31
    val h = 8 + (Hashing.mix64(seed ^ src ^ 0x22L) & 0x17L).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var z = Hashing.mix64(seed * 7919 + src)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        z = Hashing.mix64(z)
        img.setRGB(x, y, (z & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(w * h * 3 + 128)
    javax.imageio.ImageIO.write(img, "png", bos)
    (bos.toByteArray, w, h)
  }

  /** Deterministic synthetic media corpus: payload bytes are a pure
    * function of (seed, media_id); ~1/8 of payloads are exact dups of
    * an earlier id (dedup target). kind=image rows carry REAL PNG
    * payloads; audio/video carry opaque deterministic bytes. */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { id0 =>
      val id = id0.longValue
      val src = if (id % 8 == 7) id - 3 else id
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      if (kind == "image") {
        val (bytes, w, h) = encodePng(src, seed)
        MediaRow(id, kind, bytes, w, h, meta_duration_ms = 0)
      } else {
        val len = 256 + (Hashing.mix64(seed ^ src) & 0x3FF).toInt
        val bytes = new Array[Byte](len)
        var i = 0
        var z = Hashing.mix64(seed * 7919 + src)
        while (i < len) { z = Hashing.mix64(z); bytes(i) = (z & 0xFF).toByte; i += 1 }
        MediaRow(id, kind, bytes,
          meta_width = 16 + (Hashing.mix64(src ^ 1) & 0xFF).toInt,
          meta_height = 16 + (Hashing.mix64(src ^ 2) & 0xFF).toInt,
          meta_duration_ms = 1000 + (Hashing.mix64(src ^ 3) & 0xFFFF).toInt)
      }
    }
  }

  /** REAL image decode via javax.imageio: fingerprint + stats over the
    * DECODED pixel raster (row-major RGB), so identity is
    * pixel-content identity, not byte identity. */
  private[operators] def decodeImage(payload: Array[Byte]): (Long, Long, Long, Seq[Long]) = {
    ensureHeadless()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val w = img.getWidth
    val h = img.getHeight
    var fp = 0xCBF29CE484222325L
    var fp2 = FnvSeed2
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) & 0xFFFFFF
        fp = (fp ^ rgb) * 0x100000001B3L
        fp2 = (fp2 ^ rgb) * 0x100000001B3L
        sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    val mean = if (w * h == 0) 0L else sum * 100 / (w.toLong * h * 3)
    (Hashing.mix64(fp), Hashing.mix64(fp2), mean, Seq(Hashing.mix64(fp ^ 0x1000193L)))
  }

  /** STUB decode for audio/video: a real implementation calls the codec
    * here (ffmpeg via JNI, or a Pandas UDF in a PySpark deployment).
    * The fake derives stable per-blob statistics + per-"frame"
    * fingerprints so downstream plumbing is fully exercisable. */
  def fakeDecode(payload: Array[Byte], frames: Int): (Long, Long, Long, Seq[Long]) = {
    var sum = 0L
    var i = 0
    var fp = 0xCBF29CE484222325L
    var fp2 = FnvSeed2
    while (i < payload.length) {
      sum += (payload(i) & 0xFF)
      fp = (fp ^ (payload(i) & 0xFFL)) * 0x100000001B3L
      fp2 = (fp2 ^ (payload(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    val frameFps = (0 until frames).map { f =>
      val start = f * payload.length / frames
      val end = (f + 1) * payload.length / frames
      var h = 0x1000193L + f
      var j = start
      while (j < end) { h = Hashing.combine(h, payload(j) & 0xFFL); j += 1 }
      h
    }
    (Hashing.mix64(fp), Hashing.mix64(fp2),
      if (payload.isEmpty) 0L else sum * 100 / payload.length, frameFps)
  }

  /** Feature extraction: one pass per partition, decoder initialized
    * once per partition (the real-codec shape). Images decode through
    * javax.imageio; audio/video through the documented stub. Frame
    * sampling: 4 pseudo-frames per video, 1 otherwise. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      ensureHeadless() // per-partition decoder init
      rows.map { r =>
        val (fpHi, fpLo, meanX100, frameFps) =
          if (r.kind == "image")
            // a corrupt payload must cost one row, not the stage:
            // degrade that row to the byte-level fingerprint (its
            // identity is then byte identity, which is still a valid —
            // just narrower — dedup key for undecodable blobs)
            try decodeImage(r.payload)
            catch { case _: Exception => fakeDecode(r.payload, 1) }
          else fakeDecode(r.payload, if (r.kind == "video") 4 else 1)
        MediaFeatures(r.media_id, r.kind, r.payload.length, fpHi, fpLo, meanX100, frameFps)
      }
    }
  }

  /** REAL image resize: decode via javax.imageio, scale with an
    * explicit nearest-neighbor Graphics2D transform (deterministic —
    * default interpolation hints may vary by JVM), re-encode PNG.
    * Non-image kinds and undecodable payloads pass through unchanged
    * (one bad row must not fail the stage). Narrow mapPartitions, one
    * headless-decoder init per partition — blobs never shuffle. */
  def resizeImages(
      spark: SparkSession,
      media: Dataset[MediaRow],
      targetW: Int,
      targetH: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      ensureHeadless()
      rows.map { r =>
        if (r.kind != "image") r
        else try {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          require(src != null, "undecodable image payload")
          val dst = new java.awt.image.BufferedImage(
            targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(src, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream(targetW * targetH * 3 + 128)
          javax.imageio.ImageIO.write(dst, "png", bos)
          r.copy(payload = bos.toByteArray, meta_width = targetW, meta_height = targetH)
        } catch { case _: Exception => r }
      }
    }
  }

  /** Exact media dedup over the 128-bit content fingerprint — same
    * first-occurrence-wins shape (and the same two-half collision
    * safety) as turn dedup. */
  def dedupMedia(spark: SparkSession, feats: Dataset[MediaFeatures]): DataFrame = {
    import spark.implicits._
    // canonical member + reference count as window aggregates over the
    // fingerprint partition (the ExactDedup.dedupTurns shape): the
    // payload-free projection happens BEFORE the exchange and the
    // groupBy + join-back pair collapses to ONE exchange + WindowExec.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"content_fp_hi", $"content_fp_lo")
    feats.toDF
      .select($"media_id", $"kind", $"content_fp_hi", $"content_fp_lo")
      .withColumn("rep_media_id", min($"media_id").over(w))
      .withColumn("n_refs", count(lit(1)).over(w))
      .select($"media_id", $"kind", $"content_fp_hi", $"content_fp_lo", $"rep_media_id",
        ($"media_id" === $"rep_media_id").as("is_unique"), $"n_refs")
  }
}
