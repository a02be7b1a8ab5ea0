package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata alongside, and
  * decode / feature-extract steps run as partition-batched kernels
  * (`mapPartitions`) so a real decoder processes one batch per task with
  * bounded memory — the Scala analogue of `mapInPandas`.
  *
  * The decode kernels themselves are STUBBED with deterministic fakes
  * (no image/audio codecs in this environment); the Spark-side plumbing —
  * schema, batch shape, partitioning, metadata extraction — is real and
  * tested. Swap [[FakeCodec]] for a JNI/javax codec to productionize.
  */
object Multimodal {

  case class Media(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, mime: String, n_bytes: Int,
                       width: Int, height: Int, digest: String)
  case class Patch(doc_id: Long, patch_id: Int, feature: Array[Float])

  /** STUB decoder: derives deterministic pseudo-dimensions and features
    * from the payload bytes. A real implementation decodes the codec
    * header / samples frames; the call shape is identical.
    */
  object FakeCodec {
    def dims(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (64 + math.abs(h % 1024), 64 + math.abs((h / 1024) % 1024))
    }
    def features(payload: Array[Byte], n: Int): Array[Float] = {
      val rnd = new scala.util.Random(java.util.Arrays.hashCode(payload))
      Array.fill(n)(rnd.nextFloat())
    }
  }

  /** Pack a text table into the opaque-binary shape (test harness for the
    * plumbing; real pipelines read image/audio bytes from object storage).
    */
  def packBinary(docs: DataFrame, mime: String): DataFrame =
    docs.select(col("doc_id"), lit(mime).as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode metadata partition-batched: one kernel invocation per
    * partition, streaming rows — bounded memory however large the corpus.
    */
  def decodeMeta(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        val (w, h) = FakeCodec.dims(m.payload)
        val digest = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaMeta(m.doc_id, m.mime, m.payload.length, w, h, digest)
      }
    }
  }

  /** Feature extraction with fan-out (frame sampling / patching): each
    * payload yields `patches` fixed-size feature vectors — the
    * explode-shaped half of a decode → embed pipeline.
    */
  def extractPatches(media: Dataset[Media], patches: Int, dim: Int): Dataset[Patch] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      (0 until patches).map { p =>
        Patch(m.doc_id, p, FakeCodec.features(m.payload :+ p.toByte, dim))
      }
    }
  }
}
