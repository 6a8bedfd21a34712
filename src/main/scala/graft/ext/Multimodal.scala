package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and per-item decode/feature
  * work runs batched per partition. The Spark-side shape — schema,
  * partitioning, batch iteration — is real; the actual codec call is a
  * clearly-marked stub (no image/audio libraries in this build), wired
  * so a real decoder drops in without touching the plan.
  *
  * Reference only maps DT_BYTES/DT_IMAGE to a type
  * (Sample dtsx usage; our expr/Compiler.scala handles the cast); this
  * is the processing surface on top.
  */
object Multimodal {

  /** One media item: id + opaque payload + source-declared metadata. */
  final case class MediaItem(media_id: Long, payload: Array[Byte], mime: String)

  /** Decoded features. Real decoders replace [[decodeStub]]; the schema
    * and batch shape stay. */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, digest: String,
      width: Int, height: Int, ok: Boolean)

  /** STUB decoder — deterministic fake in place of an image codec.
    * Derives "dimensions" from the payload hash so tests are stable.
    * Swap body for e.g. javax.imageio / ffmpeg bindings in production. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Boolean) = {
    val h = java.util.Arrays.hashCode(payload)
    (1 + math.floorMod(h, 1920), 1 + math.floorMod(h >> 8, 1080), payload.nonEmpty)
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
      // per-partition init of the (stub) codec context would go here
      it.map { m =>
        val (w, h, ok) = decodeStub(m.payload)
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
