package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * transforms.
  *
  * The decode step is STUBBED with a deterministic fake (this container
  * ships no image/audio codecs — see the builder brief): `fakeDecode`
  * derives pixel-stats from the bytes reproducibly. Everything around
  * it — schema, binary handling, partition-batched processing shape,
  * frame sampling — is real and tested; swapping in a real codec
  * changes only the function body.
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

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      content_fp: Long,
      mean_byte_x100: Long,
      frame_fps: Seq[Long])

  /** Deterministic synthetic media corpus: payload bytes are a pure
    * function of (seed, media_id); ~1/8 of payloads are exact dups of
    * an earlier id (dedup target). */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { id0 =>
      val id = id0.longValue
      val src = if (id % 8 == 7) id - 3 else id
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 256 + (Hashing.mix64(seed ^ src) & 0x3FF).toInt
      val bytes = new Array[Byte](len)
      var i = 0
      var h = Hashing.mix64(seed * 7919 + src)
      while (i < len) { h = Hashing.mix64(h); bytes(i) = (h & 0xFF).toByte; i += 1 }
      MediaRow(id, kind, bytes,
        meta_width = 16 + (Hashing.mix64(src ^ 1) & 0xFF).toInt,
        meta_height = 16 + (Hashing.mix64(src ^ 2) & 0xFF).toInt,
        meta_duration_ms = 1000 + (Hashing.mix64(src ^ 3) & 0xFFFF).toInt)
    }
  }

  /** STUB decode: a real implementation calls the codec here (e.g.
    * libjpeg/ffmpeg via JNI, or a Pandas UDF in a PySpark deployment).
    * The fake derives stable per-blob statistics + per-"frame"
    * fingerprints so downstream plumbing is fully exercisable. */
  def fakeDecode(payload: Array[Byte], frames: Int): (Long, Long, Seq[Long]) = {
    var sum = 0L
    var i = 0
    var fp = 0xCBF29CE484222325L
    while (i < payload.length) {
      sum += (payload(i) & 0xFF)
      fp = (fp ^ (payload(i) & 0xFFL)) * 0x100000001B3L
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
    (Hashing.mix64(fp), if (payload.isEmpty) 0L else sum * 100 / payload.length, frameFps)
  }

  /** Feature extraction: one pass per partition, decoder "initialized"
    * once per partition (the real-codec shape). Frame sampling: 4
    * pseudo-frames per video, 1 otherwise. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real codec: init decoder context here, once per partition
      rows.map { r =>
        val frames = if (r.kind == "video") 4 else 1
        val (fp, meanX100, frameFps) = fakeDecode(r.payload, frames)
        MediaFeatures(r.media_id, r.kind, r.payload.length, fp, meanX100, frameFps)
      }
    }
  }

  /** Exact media dedup over content fingerprints — same
    * first-occurrence-wins shape as turn dedup. */
  def dedupMedia(spark: SparkSession, feats: Dataset[MediaFeatures]): DataFrame = {
    import spark.implicits._
    val canon = feats.toDF.groupBy($"content_fp")
      .agg(min($"media_id").as("rep_media_id"), count(lit(1)).as("n_refs"))
    feats.toDF.join(canon, Seq("content_fp"))
      .select($"media_id", $"kind", $"content_fp", $"rep_media_id",
        ($"media_id" === $"rep_media_id").as("is_unique"), $"n_refs")
  }
}
