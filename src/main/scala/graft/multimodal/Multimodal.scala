package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata alongside, and
  * decode / feature-extract steps run as partition-batched kernels
  * (`mapPartitions`) so the decoder processes one batch per task with
  * bounded memory — the Scala analogue of `mapInPandas`.
  *
  * Image (PNG/JPEG/BMP/GIF via javax.imageio) and audio (WAV PCM via
  * javax.sound.sampled) decoding is REAL — both codecs ship in the JDK,
  * no external libraries. Video remains a declared deterministic stub
  * ([[FakeCodec]]): the JDK has no video codec and this environment
  * cannot add one; the plumbing (schema, batching, fan-out) is identical,
  * so a JNI codec drops in per-kernel.
  */
object Multimodal {

  case class Media(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, mime: String, n_bytes: Int,
                       width: Int, height: Int, digest: String)
  case class Patch(doc_id: Long, patch_id: Int, feature: Array[Float])
  case class ImageMeta(doc_id: Long, width: Int, height: Int, channels: Int,
                       mean_luma: Double, dhash: Long)
  case class AudioMeta(doc_id: Long, sample_rate: Int, n_frames: Long,
                       rms: Double, zero_cross_rate: Double)

  /** Real JDK image decode: dimensions, channel count, mean luminance,
    * and a 64-bit dHash (9×8 area-mean grayscale, horizontal gradient
    * sign bits — the standard public perceptual-hash construction).
    */
  object ImageCodec {
    /** Corrupt/truncated/unknown payloads yield None — one bad file in a
      * 100 TB corpus must drop, not fail the job (ImageIO throws
      * IIOException on truncation rather than returning null).
      */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    def luma(rgb: Int): Double = {
      val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
      0.299 * r + 0.587 * g + 0.114 * b
    }

    /** Deterministic area-mean downsample to (gw × gh) gray cells. */
    def grayGrid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Double] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val acc = new Array[Double](gw * gh)
      val cnt = new Array[Long](gw * gh)
      var y = 0
      while (y < h) {
        val gy = math.min(gh - 1, y * gh / h)
        var x = 0
        while (x < w) {
          val gx = math.min(gw - 1, x * gw / w)
          acc(gy * gw + gx) += luma(img.getRGB(x, y))
          cnt(gy * gw + gx) += 1
          x += 1
        }
        y += 1
      }
      acc.indices.map(i => if (cnt(i) > 0) acc(i) / cnt(i) else 0.0).toArray
    }

    def dHash64(img: java.awt.image.BufferedImage): Long = {
      val g = grayGrid(img, 9, 8)
      var bits = 0L
      var row = 0
      while (row < 8) {
        var c = 0
        while (c < 8) {
          if (g(row * 9 + c) > g(row * 9 + c + 1)) bits |= 1L << (row * 8 + c)
          c += 1
        }
        row += 1
      }
      bits
    }
  }

  /** Real JDK WAV decode: PCM samples → RMS + zero-crossing rate. */
  object AudioCodec {
    def decode(payload: Array[Byte]): Option[(Int, Array[Double])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        in.close()
        val bps = fmt.getSampleSizeInBits / 8
        val n = bytes.length / (bps * fmt.getChannels)
        val buf = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        if (fmt.getSampleSizeInBits != 8 && fmt.getSampleSizeInBits != 16) None
        else {
          val samples = new Array[Double](n)
          var i = 0
          while (i < n) {
            // first channel only; 8/16-bit PCM
            var c = 0
            while (c < fmt.getChannels) {
              val v = fmt.getSampleSizeInBits match {
                case 8 => (buf.get() & 0xFF) - 128.0
                case _ => buf.getShort().toDouble
              }
              if (c == 0) samples(i) = v / (1 << (fmt.getSampleSizeInBits - 1))
              c += 1
            }
            i += 1
          }
          Some((fmt.getSampleRate.toInt, samples))
        }
        // any malformed payload (bad RIFF header, truncated body, exotic
        // encodings) drops rather than failing the task
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real MP4 / ISO-BMFF container metadata via a box walk — the public
    * ISO/IEC 14496-12 box structure (size+type headers, ftyp major brand,
    * moov→mvhd timescale/duration, moov→trak→tkhd 16.16 fixed-point
    * presentation dims). METADATA only: the JDK has no video codec, so
    * frame decode stays with the declared [[FakeCodec]] stub; dims and
    * duration here come from the actual container bytes.
    */
  object VideoCodec {
    case class Mp4Meta(width: Int, height: Int, durationMs: Long, brand: String)

    private def u32(b: java.nio.ByteBuffer): Long = b.getInt() & 0xFFFFFFFFL
    private def tag(b: java.nio.ByteBuffer): String = {
      val t = new Array[Byte](4); b.get(t); new String(t, "ISO-8859-1")
    }

    /** None for anything that isn't well-formed ISO-BMFF — corrupt
      * payloads drop, same policy as the image/audio codecs.
      */
    def mp4Meta(payload: Array[Byte]): Option[Mp4Meta] = try {
      val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.BIG_ENDIAN)
      var brand = ""
      var timescale = 0L; var duration = 0L
      var w = 0; var h = 0
      def walk(start: Long, end: Long, depth: Int): Unit = {
        var p = start
        var ok = true
        while (ok && p + 8 <= end) {
          buf.position(p.toInt)
          var sz: Long = u32(buf)
          val typ = tag(buf)
          var hdr = 8L
          if (sz == 1) { sz = buf.getLong(); hdr = 16 }
          else if (sz == 0) sz = end - p
          if (sz < hdr || p + sz > end) ok = false
          else {
            typ match {
              case "ftyp" => brand = tag(buf)
              case "moov" | "trak" | "mdia" =>
                if (depth < 8) walk(p + hdr, p + sz, depth + 1)
              case "mvhd" =>
                val ver = buf.get() & 0xFF
                buf.position(buf.position() + 3) // flags
                // v1: 64-bit ctime/mtime/duration; v0: 32-bit
                buf.position(buf.position() + (if (ver == 1) 16 else 8))
                timescale = u32(buf)
                duration = if (ver == 1) buf.getLong() else u32(buf)
              case "tkhd" =>
                val ver = buf.get() & 0xFF
                buf.position(buf.position() + 3)
                buf.position(buf.position() + (if (ver == 1) 32 else 20))
                buf.position(buf.position() + 52) // reserved+layer+volume+matrix
                val tw = (u32(buf) >> 16).toInt // 16.16 fixed point
                val th = (u32(buf) >> 16).toInt
                if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
              case _ =>
            }
            p += sz
          }
        }
      }
      walk(0, payload.length.toLong, 0)
      if (brand.nonEmpty || timescale > 0 || w > 0)
        Some(Mp4Meta(w, h,
          if (timescale > 0) duration * 1000 / timescale else 0L, brand))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  case class VideoMeta(doc_id: Long, width: Int, height: Int,
                       duration_ms: Long, brand: String)

  /** Real container metadata over a video corpus, partition-batched;
    * non-BMFF payloads drop.
    */
  def decodeVideoMeta(media: Dataset[Media]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        VideoCodec.mp4Meta(m.payload).map(v =>
          VideoMeta(m.doc_id, v.width, v.height, v.durationMs, v.brand))
      }
    }
  }

  /** Deterministic stub — retained ONLY for payloads without any JDK
    * decode path (video FRAMES; container metadata is real, see
    * [[VideoCodec]]); declared, not hidden.
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

  /** Decode metadata partition-batched: real image dimensions for image
    * mimes, stub dims otherwise — one kernel invocation per partition,
    * bounded memory however large the corpus.
    */
  def decodeMeta(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        val (w, h) =
          if (m.mime.startsWith("image/"))
            ImageCodec.decode(m.payload)
              .map(i => (i.getWidth, i.getHeight))
              .getOrElse((-1, -1))
          else FakeCodec.dims(m.payload)
        val digest = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaMeta(m.doc_id, m.mime, m.payload.length, w, h, digest)
      }
    }
  }

  /** Real image metadata + perceptual hash over an image corpus;
    * undecodable payloads drop (the standard data-pipeline policy).
    */
  def decodeImages(media: Dataset[Media]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        ImageCodec.decode(m.payload).map { img =>
          val grid = ImageCodec.grayGrid(img, 8, 8)
          ImageMeta(m.doc_id, img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents,
            grid.sum / grid.length, ImageCodec.dHash64(img))
        }
      }
    }
  }

  /** Perceptual-hash near-duplicate image pairs — the image-side twin of
    * MinHash text dedup. `images` carries `(doc_id, dhash)` (from
    * [[decodeImages]]); the 64-bit fingerprint is banded into four
    * 16-bit keys and candidates come from a band equi-join, so by
    * pigeonhole the index is EXACT (zero recall loss) for
    * `maxHam ≤ 3`: a pair within Hamming 3 differs in at most 3 bands
    * and must collide on the fourth. The refine step scores every
    * candidate with the codegen'd [[graft.functions.Hamming64]]
    * popcount expression — no image bytes, only (id, long) rows,
    * ever shuffle, and one degenerate band bucket (e.g. a corpus of
    * black frames) is capped exactly like text LSH's hot buckets.
    */
  def imageNearDup(images: DataFrame, maxHam: Int = 3,
                   bucketCap: Int = 10000): DataFrame =
    graft.dedup.Dedup.fingerprintNearDup(
      images.select(col("doc_id"), col("dhash").as("fp")),
      bits = 64, nBands = 4, maxHam = maxHam, bucketCap = bucketCap)

  case class ResizedImage(doc_id: Long, src_w: Int, src_h: Int,
                          w: Int, h: Int, pixels: Array[Float])

  /** Real image resize: decode → area-mean downsample to a fixed w×h
    * luma grid in [0, 1] — the normalization step before batching
    * images into a model input tensor. Partition-batched like every
    * codec op; corrupt payloads drop (flatMap on the decode Option).
    */
  def resizeImages(media: Dataset[Media], w: Int, h: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        ImageCodec.decode(m.payload).map { img =>
          ResizedImage(m.doc_id, img.getWidth, img.getHeight, w, h,
            ImageCodec.grayGrid(img, w, h).map(v => (v / 255.0).toFloat))
        }
      }
    }
  }

  /** Real image patch features: gw×gh area-mean gray grid per image —
    * the decode → embed fan-out with actual pixel content.
    */
  def imagePatches(media: Dataset[Media], grid: Int): Dataset[Patch] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        ImageCodec.decode(m.payload).map { img =>
          Patch(m.doc_id, 0,
            ImageCodec.grayGrid(img, grid, grid).map(v => (v / 255.0).toFloat))
        }
      }
    }
  }

  /** Real WAV audio metadata: sample rate, frame count, RMS, zero-cross
    * rate — partition-batched.
    */
  def decodeAudio(media: Dataset[Media]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        AudioCodec.decode(m.payload).map { case (rate, s) =>
          val rms = math.sqrt(s.map(x => x * x).sum / math.max(1, s.length))
          val zc = (1 until s.length).count(i => s(i - 1) * s(i) < 0)
          AudioMeta(m.doc_id, rate, s.length.toLong, rms,
            if (s.length > 1) zc.toDouble / (s.length - 1) else 0.0)
        }
      }
    }
  }

  /** Feature extraction with fan-out (frame sampling / patching) for
    * payloads without a JDK codec (video): each payload yields `patches`
    * fixed-size feature vectors from the declared stub.
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
