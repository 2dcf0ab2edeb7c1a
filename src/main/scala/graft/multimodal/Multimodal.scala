package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs, plus the decode /
  * feature-extract plumbing a training-data pipeline needs.
  *
  * IMAGE decode is REAL — JDK `javax.imageio` (PNG/BMP/GIF/JPEG, zero
  * external dependencies) to a normalized luminance histogram feature.
  * Audio/video codecs are NOT in this container, so non-image formats
  * take a clearly-marked deterministic byte-histogram stub
  * ([[MediaDecoder.decodeOpaque]]); the Spark-side plumbing — schema,
  * per-partition decoder lifecycle with task-completion cleanup, feature
  * schema — is identical once a real av codec is swapped in.
  *
  * Scale design: payloads never pass through a shuffle (decode before
  * aggregate, project features only); `mapPartitions` amortizes per-batch
  * decoder init (the expensive part with real codecs) across the
  * partition, mirroring how a Python pipeline would use mapInPandas.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the lake data model —
    * reference stores untyped byte streams, client.py:536/556; metadata is
    * its x-ms-properties analogue, client.py:224-225). */
  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Int,
      mean_byte: Double,
      feature: Array[Float])

  object MediaDecoder {
    /** Formats decoded by the REAL `javax.imageio` path. */
    val ImageFormats: Set[String] = Set("png", "bmp", "gif", "jpg", "jpeg")
    def init(): MediaDecoder = new MediaDecoder
  }

  /** Per-partition media decoder. Images go through `javax.imageio` (in
    * the JDK — no new dependency); everything else (audio/video, and the
    * fixture's text-as-media rows) takes the deterministic byte-histogram
    * STUB below, clearly marked, because av codec libs are absent in this
    * environment. */
  final class MediaDecoder {

    /** REAL image decode: 8-bin normalized Rec.601-luma histogram — the
      * kind of cheap content feature a pipeline computes before handing
      * pixels to a vision preprocessor. Undecodable payload → None (a
      * real corpus always has corrupt images; callers get an empty
      * feature to filter on rather than a task-killing exception). */
    def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
      // NonFatal, not just IOException: JDK ImageIO plugins throw
      // RuntimeExceptions (AIOOBE, NegativeArraySize, CMMException...) on
      // malformed input — a fuzzed image must not kill the task
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else {
        val hist = new Array[Float](8)
        val w = img.getWidth
        val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF)
              + 114 * (rgb & 0xFF)) / 1000
            hist(luma >> 5) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < 8) { hist(i) /= n; i += 1 }
        Some(hist)
      }
    }

    /** STUB for non-image media (audio/video codecs absent here): an
      * 8-bin byte histogram — deterministic and schema-identical to the
      * image feature, so swapping in a real codec changes only this
      * function. */
    def decodeOpaque(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](8)
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xFF) >> 5) += 1f; i += 1 }
      if (payload.length > 0) { var j = 0; while (j < 8) { hist(j) /= payload.length; j += 1 } }
      hist
    }

    /** Dispatch on the typed metadata's format tag. */
    def decode(payload: Array[Byte], format: String): Array[Float] =
      // Locale.ROOT: default-locale lowercasing misroutes "GIF" on tr JVMs
      if (MediaDecoder.ImageFormats(format.toLowerCase(java.util.Locale.ROOT)))
        decodeImage(payload).getOrElse(Array.empty[Float])
      else decodeOpaque(payload)

    /** REAL image resize (pure JDK: ImageIO decode → bilinear Graphics2D
      * scale → PNG re-encode): scaled to `targetWidth` preserving aspect
      * ratio; never upscales. Undecodable payload → None (same
      * corrupt-tolerance contract as [[decodeImage]]). */
    def resizeImage(payload: Array[Byte], targetWidth: Int): Option[(Array[Byte], Int, Int)] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0) None
      else if (img.getWidth <= targetWidth) Some((payload, img.getWidth, img.getHeight))
      else {
        val h = math.max(1,
          math.round(img.getHeight * targetWidth.toDouble / img.getWidth).toInt)
        // preserve transparency: INT_RGB would composite PNG/GIF alpha
        // onto black in the re-encode (PNG supports alpha either way)
        val imgType =
          if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
          else java.awt.image.BufferedImage.TYPE_INT_RGB
        val out = new java.awt.image.BufferedImage(targetWidth, h, imgType)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetWidth, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some((bos.toByteArray, targetWidth, h))
      }
    }

    /** ImageIO is stateless; a real av-codec handle releases here. Wired
      * to TaskContext.addTaskCompletionListener in extractFeatures. */
    def close(): Unit = ()
  }

  /** Decode + featurize a media Dataset. One decoder instance per
    * partition (not per row) with task-completion cleanup — the lifecycle
    * that matters when the decoder holds native codec state. Undecodable
    * images yield an empty `feature`; filter `size(feature) > 0`. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = MediaDecoder.init()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      it.map { m =>
        val f = dec.decode(m.payload, m.format)
        val mean =
          if (m.payload.isEmpty) 0.0
          else m.payload.map(b => (b & 0xFF).toDouble).sum / m.payload.length
        MediaFeatures(m.media_id, m.payload.length, mean, f)
      }
    }
  }

  /** Resize: REAL for image formats (ImageIO decode → bilinear scale →
    * PNG re-encode, aspect preserved, no upscale; corrupt → empty
    * payload with zeroed dims, the same filterable convention as
    * extractFeatures). Non-image media (audio/video — codecs absent in
    * this environment) keeps the documented deterministic byte-subsample
    * STUB. Per-partition decoder lifecycle, no shuffle — the pipeline
    * contract either way. */
  def resize(media: Dataset[MediaRecord], targetWidth: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = MediaDecoder.init()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
      it.map { m =>
        if (MediaDecoder.ImageFormats(m.format.toLowerCase(java.util.Locale.ROOT)))
          dec.resizeImage(m.payload, targetWidth) match {
            case Some((bytes, w, h)) =>
              // re-encoded as PNG whenever scaling happened
              val fmt = if (bytes eq m.payload) m.format else "png"
              m.copy(payload = bytes, format = fmt, width = w, height = h)
            case None => m.copy(payload = Array.empty, width = 0, height = 0)
          }
        else if (m.width <= targetWidth || m.payload.isEmpty) m
        else {
          // STUB (non-image): every ceil(w/targetW)-th byte
          val step = math.ceil(m.width.toDouble / targetWidth).toInt
          val out = m.payload.grouped(step).map(_.head).toArray
          m.copy(payload = out, width = out.length)
        }
      }
    }
  }

  /** Frame sampling for video-like payloads: every k-th fixed-size chunk
    * as a "frame" (stub chunking; the real op is the same explode shape). */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (chunk, idx) => (m.media_id, idx, chunk) }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Documents-as-media: wraps `documents.text` bytes into payload+meta —
    * the fixture stand-in for an image table. */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("txt").as("format"),
        col("n_chars").cast("int").as("width"),
        lit(1).as("height"))
      .as[MediaRecord]
  }

  /** mm1_binary_meta — binary-column plumbing the oracle can check:
    * payload size + content hash + metadata struct fields, grouped by
    * format bucket. */
  def mm1BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        col("lang"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"),
        col("lang"))
      .orderBy(col("doc_id"))

  /** mm2_frame_sample — frame sampling as a checkable query: every 4th
    * 64-byte "frame" of each payload with its size and content hash (the
    * video-frame-sampling shape over the text-as-media fixture; a real
    * video swaps the chunker for a keyframe extractor, same explode
    * plan). The fixture text is pure ASCII, so the DuckDB oracle mirrors
    * byte chunks with 1-based character slices exactly. */
  def mm2FrameSample(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, dir), frameBytes = 64, everyK = 4)
      .select(col("media_id"), col("frame_idx"),
        length(col("frame_payload")).as("n_bytes"),
        sha2(col("frame_payload"), 256).as("frame_sha"))
      .orderBy(col("media_id"), col("frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_binary_meta" -> (mm1BinaryMeta _),
    "mm2_frame_sample" -> (mm2FrameSample _),
  )

  val oracle: Map[String, String] = Map(
    "mm1_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
              sha256(text) AS payload_sha, lang
       FROM documents ORDER BY doc_id""",
    "mm2_frame_sample" ->
      """WITH f AS (
        SELECT doc_id AS media_id,
               [{'j': j, 'c': text[j*64+1 : (j+1)*64]}
                FOR j IN range(0, CAST(ceil(length(text) / 64.0) AS INT))] AS frames
        FROM documents),
      e AS (SELECT media_id, unnest(frames, recursive := true) FROM f)
       SELECT media_id, CAST(j AS INTEGER) AS frame_idx,
            CAST(length(c) AS INTEGER) AS n_bytes, sha256(c) AS frame_sha
       FROM e WHERE j % 4 = 0 ORDER BY media_id, frame_idx""",
  )
}
