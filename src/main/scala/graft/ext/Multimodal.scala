package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and per-item decode/feature
  * work runs batched per partition. Image decode is REAL — pure-JVM
  * `javax.imageio` header reads for PNG/JPEG/GIF/BMP (the JDK ships the
  * codecs; no external library). Audio/video would slot into the same
  * batch shape with their own codec init.
  *
  * Reference only maps DT_BYTES/DT_IMAGE to a type
  * (Sample dtsx usage; our expr/Compiler.scala handles the cast); this
  * is the processing surface on top.
  */
object Multimodal {

  /** One media item: id + opaque payload + source-declared metadata. */
  final case class MediaItem(media_id: Long, payload: Array[Byte], mime: String)

  /** Decoded features. `ok` = the payload decoded as an image;
    * non-image payloads keep their byte metadata with (0, 0, false). */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, digest: String,
      width: Int, height: Int, ok: Boolean)

  /** Real image decode via `javax.imageio`: reads ONLY the header —
    * getWidth/getHeight on an ImageReader never decodes pixel data, so
    * per-item cost is a few hundred bytes of parsing regardless of
    * image size. Unrecognized payloads → (0, 0, false). */
  def decodeImage(payload: Array[Byte]): (Int, Int, Boolean) = {
    if (payload == null || payload.isEmpty) return (0, 0, false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) (0, 0, false)
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          (r.getWidth(0), r.getHeight(0), true)
        } catch { case _: Exception => (0, 0, false) }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Deterministic tiny PNG (solid fill) — fixture generator for tests
    * and oracle queries; runs executor-side. */
  def syntheticPng(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image resize (pure JVM): decode, scale to fit within
    * (maxW, maxH) preserving aspect ratio, re-encode as PNG. Returns
    * the original payload untouched when it is not a decodable image
    * or already fits. Video frame-sampling is NOT offered — the JVM
    * ships no video codecs; it would slot into the same per-partition
    * batch shape. */
  def resizeImage(payload: Array[Byte], maxW: Int, maxH: Int): Array[Byte] = {
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    catch { case _: Exception => null }
    if (img == null || (img.getWidth <= maxW && img.getHeight <= maxH)) payload
    else {
      val scale = math.min(maxW.toDouble / img.getWidth,
        maxH.toDouble / img.getHeight)
      val w = math.max(1, (img.getWidth * scale).round.toInt)
      val h = math.max(1, (img.getHeight * scale).round.toInt)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Batched per-partition resize — same executor-local shape as
    * [[extractFeatures]]; non-image payloads pass through unchanged. */
  def resizeAll(items: Dataset[MediaItem], maxW: Int, maxH: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(m =>
      m.copy(payload = resizeImage(m.payload, maxW, maxH))))
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Batched per-partition decode: one codec context per partition (the
    * expensive init a real decoder needs), items streamed through it.
    * This is the Scala analog of a pandas-UDF `mapInPandas` stage —
    * executor-local batches, no driver involvement, no shuffle. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition codec init would go here (ImageIO registry is
      // JVM-global and already warm)
      it.map { m =>
        val (w, h, ok) = decodeImage(m.payload)
        MediaFeatures(m.media_id, m.payload.length.toLong, md5Hex(m.payload), w, h, ok)
      }
    }
  }

  /** Wrap any (id, text) frame as fake media items — payload = UTF-8
    * bytes. Stand-in source until a `binaryFile` corpus exists. */
  def asMediaItems(df: DataFrame, idCol: String, textCol: String,
      mime: String = "application/octet-stream"): Dataset[MediaItem] = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(textCol).cast("binary").as("payload"),
        lit(mime).as("mime"))
      .as[MediaItem]
  }

  /** Column-level metadata that needs no decode (pushdown-friendly:
    * length/digest never read the payload twice). */
  def payloadMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("digest", md5(col(payloadCol)))
}
