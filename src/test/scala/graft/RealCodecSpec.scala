package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import javax.sound.sampled._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Media

/** Real JDK codecs on the multimodal path: PNG via javax.imageio, WAV PCM
  * via javax.sound — fixtures generated in-JVM, no external libraries.
  */
class RealCodecSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(freq: Double, rate: Float, seconds: Double,
                       amp: Double): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      bb.putShort((amp * Short.MaxValue * math.sin(2 * math.Pi * freq * i / rate)).toShort)
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeImages: real PNG dimensions, luma, deterministic dHash") {
    import spark.implicits._
    val halfHalf = pngBytes(32, 16, (x, _) => if (x < 16) 0x000000 else 0xFFFFFF)
    val solid = pngBytes(20, 20, (_, _) => 0x808080)
    val media = Seq(Media(1L, "image/png", halfHalf), Media(2L, "image/png", solid),
      Media(3L, "image/png", halfHalf)).toDS()
    val metas = Multimodal.decodeImages(media).collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).width == 32 && metas(1L).height == 16 && metas(1L).channels == 3)
    assert(approx(metas(1L).mean_luma, 127.5, 1.0))
    assert(approx(metas(2L).mean_luma, 128.0, 1.0))
    assert(metas(1L).dhash == metas(3L).dhash, "identical images share the dHash")
    assert(metas(1L).dhash != metas(2L).dhash, "distinct content differs")
    // left-white/right-black has a falling gradient -> nonzero dHash
    val wb = pngBytes(32, 16, (x, _) => if (x < 16) 0xFFFFFF else 0x000000)
    val m2 = Multimodal.decodeImages(Seq(Media(9L, "image/png", wb)).toDS()).head()
    assert(m2.dhash != 0L)
  }

  test("resizeImages: area-mean downsample preserves left/right structure; corrupt drops") {
    import spark.implicits._
    val halfHalf = pngBytes(32, 16, (x, _) => if (x < 16) 0x000000 else 0xFFFFFF)
    val media = Seq(Media(1L, "image/png", halfHalf),
      Media(2L, "image/png", Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.resizeImages(media, 4, 2).collect()
    assert(out.length == 1 && out.head.doc_id == 1L) // corrupt payload dropped
    val r = out.head
    assert(r.src_w == 32 && r.src_h == 16 && r.w == 4 && r.h == 2
      && r.pixels.length == 8)
    // left half black (0), right half white (1), row-major 4x2
    val row = r.pixels.take(4).map(v => math.round(v * 100) / 100.0).toSeq
    assert(row(0) == 0.0 && row(1) == 0.0 && row(2) >= 0.99 && row(3) >= 0.99,
      s"row $row")
  }

  test("imagePatches: 2x2 grid means reflect actual pixel content") {
    import spark.implicits._
    val halfHalf = pngBytes(32, 32, (x, _) => if (x < 16) 0x000000 else 0xFFFFFF)
    val p = Multimodal.imagePatches(Seq(Media(1L, "image/png", halfHalf)).toDS(), 2)
      .head().feature
    assert(approx(p(0), 0f, 0.01) && approx(p(2), 0f, 0.01), "left cells black")
    assert(approx(p(1), 1f, 0.01) && approx(p(3), 1f, 0.01), "right cells white")
  }

  test("decodeMeta dispatches image mimes to the real decoder") {
    import spark.implicits._
    val png = pngBytes(10, 7, (_, _) => 0x123456)
    val meta = Multimodal.decodeMeta(Seq(Media(5L, "image/png", png)).toDS()).head()
    assert(meta.width == 10 && meta.height == 7)
  }

  test("decodeAudio: WAV sine has the expected RMS and zero-cross rate") {
    import spark.implicits._
    val wav = wavBytes(freq = 440.0, rate = 8000f, seconds = 0.5, amp = 0.5)
    val a = Multimodal.decodeAudio(Seq(Media(1L, "audio/wav", wav)).toDS()).head()
    assert(a.sample_rate == 8000 && a.n_frames == 4000L)
    assert(approx(a.rms, 0.5 / math.sqrt(2), 0.01), s"rms ${a.rms}")
    assert(approx(a.zero_cross_rate, 2 * 440.0 / 8000, 0.01), s"zcr ${a.zero_cross_rate}")
    // non-WAV payload drops instead of crashing
    val bad = Multimodal.decodeAudio(Seq(Media(2L, "audio/wav",
      Array[Byte](1, 2, 3, 4))).toDS()).collect()
    assert(bad.isEmpty)
  }

  test("corrupt payloads drop across all decoders (one bad file must not fail the job)") {
    import spark.implicits._
    val truncatedPng = pngBytes(8, 8, (_, _) => 0xFFFFFF).take(20) // valid magic, cut body
    val garbage = Array.fill[Byte](64)(0x42)
    val good = pngBytes(4, 4, (_, _) => 0x000000)
    val media = Seq(Media(1L, "image/png", truncatedPng),
      Media(2L, "image/png", garbage), Media(3L, "image/png", good)).toDS()
    val metas = Multimodal.decodeImages(media).collect()
    assert(metas.map(_.doc_id).toSet == Set(3L), "only the intact image survives")
    // truncated RIFF header for audio
    val wav = wavBytes(440.0, 8000f, 0.1, 0.5)
    val cut = wav.take(30)
    val a = Multimodal.decodeAudio(Seq(Media(4L, "audio/wav", cut),
      Media(5L, "audio/wav", wav)).toDS()).collect()
    assert(a.map(_.doc_id).toSet == Set(5L))
  }

  /** Minimal ISO-BMFF fixture built box-by-box from the public spec:
    * ftyp(isom) + moov[mvhd(timescale 1000, duration 2500) +
    * trak[tkhd(v0, 640×360 as 16.16 fixed)]].
    */
  private def mp4Bytes(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("ISO-8859-1"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0)               // version 0 + flags
      b.putInt(0).putInt(0)     // ctime, mtime
      b.putInt(timescale).putInt(duration)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84).order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0)                         // version 0 + flags
      b.putInt(0).putInt(0)               // ctime, mtime
      b.putInt(1).putInt(0).putInt(duration) // track id, reserved, duration
      b.position(b.position() + 52)       // reserved/layer/volume/matrix
      b.putInt(w << 16).putInt(h << 16)   // 16.16 fixed
      box("tkhd", b.array())
    }
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** JPEG bytes of a solid-gray w×h frame (ImageIO, in-JVM). */
  private def jpegGray(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal valid MJPEG AVI: RIFF('AVI ' LIST(hdrl avih LIST(strl strh))
    * LIST(movi 00dc…)), little-endian sizes, even-byte chunk padding —
    * the public RIFF grammar, built by hand so the test owns every byte.
    */
  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                       usPerFrame: Long = 40000L): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt((v & 0xFFFFFFFFL).toInt); b.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      id.getBytes("ISO-8859-1") ++ le32(body.length) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ISO-8859-1") ++ body)
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame.toInt) // dwMicroSecPerFrame
      b.putInt(0); b.putInt(0); b.putInt(0) // maxBytesPerSec, padding, flags
      b.putInt(frames.length) // dwTotalFrames
      b.putInt(0); b.putInt(1); b.putInt(0) // initialFrames, streams, bufSize
      b.putInt(w); b.putInt(h)
      b.array()
    }
    val strh = "vids".getBytes("ISO-8859-1") ++
      "MJPG".getBytes("ISO-8859-1") ++ new Array[Byte](48)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    out.write("RIFF".getBytes("ISO-8859-1"))
    out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  test("AviCodec: RIFF walk reads real header meta and extracts MJPEG frames") {
    val frames = Seq(jpegGray(16, 12, 30), jpegGray(16, 12, 128),
      jpegGray(16, 12, 220))
    val avi = mjpegAvi(frames, 16, 12, usPerFrame = 33333L)
    val m = Multimodal.AviCodec.aviMeta(avi).get
    assert(m.width === 16 && m.height === 12)
    assert(m.nFrames === 3L && m.usPerFrame === 33333L)
    assert(m.handler === "MJPG")
    val got = Multimodal.AviCodec.jpegFrames(avi)
    assert(got.map(_._1) === Seq(0, 1, 2))
    // each extracted chunk is byte-identical to the encoded JPEG
    assert(got.map(_._2.toSeq) === frames.map(_.toSeq))
    // junk and truncation drop, never throw
    assert(Multimodal.AviCodec.aviMeta("not an avi".getBytes).isEmpty)
    assert(Multimodal.AviCodec.jpegFrames(avi.take(40)).isEmpty)
  }

  test("sampleVideoFrames: every-nth MJPEG frame decodes to real luma; non-AVI drops") {
    import spark.implicits._
    val frames = Seq(jpegGray(16, 12, 30), jpegGray(16, 12, 128),
      jpegGray(16, 12, 220))
    val media = Seq(
      Media(1L, "video/x-msvideo", mjpegAvi(frames, 16, 12)),
      Media(2L, "video/mp4", mp4Bytes(640, 360, 1000, 2500)), // no JDK codec → drops
      Media(3L, "video/x-msvideo", Array[Byte](9, 9, 9))).toDS()
    val out = Multimodal.sampleVideoFrames(media, everyNth = 2, grid = 4)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.doc_id).toSet === Set(1L))
    assert(out.map(_.frame_idx).toSeq === Seq(0, 2)) // every 2nd of 3
    assert(out.forall(f => f.width == 16 && f.height == 12 &&
      f.features.length == 16))
    // the decoded luma tracks the encoded gray level (JPEG is lossy —
    // solid frames stay within a few levels)
    val lumas = out.map(f => f.frame_idx ->
      f.features.map(_.toDouble).sum / f.features.length * 255.0).toMap
    assert(approx(lumas(0), 30.0, 6.0), s"frame 0 luma ${lumas(0)}")
    assert(approx(lumas(2), 220.0, 6.0), s"frame 2 luma ${lumas(2)}")
  }

  test("VideoCodec: MP4 box walk reads real dims, duration, brand") {
    val m = Multimodal.VideoCodec.mp4Meta(mp4Bytes(640, 360, 1000, 2500)).get
    assert(m.width === 640 && m.height === 360)
    assert(m.durationMs === 2500L) // 2500 ticks at timescale 1000 → 2500 ms
    assert(m.brand === "isom")
    // corrupt payloads drop, they do not throw: pure junk and a payload
    // truncated mid-moov (declared box size overruns the buffer)
    assert(Multimodal.VideoCodec.mp4Meta("not a video".getBytes).isEmpty)
    val trunc = Multimodal.VideoCodec.mp4Meta(mp4Bytes(640, 360, 1000, 2500).take(30))
    assert(trunc.forall(_.width === 0)) // ftyp alone: no dims claimed
  }

  test("decodeVideoMeta datasets: BMFF payloads parse, junk drops") {
    import spark.implicits._
    val vids = Seq(
      Media(1L, "video/mp4", mp4Bytes(1920, 1080, 600, 1200)),
      Media(2L, "video/mp4", Array[Byte](1, 2, 3, 4))).toDS()
    val out = Multimodal.decodeVideoMeta(vids).collect()
    assert(out.map(_.doc_id).toSet == Set(1L))
    val v = out.head
    assert(v.width === 1920 && v.height === 1080 && v.duration_ms === 2000L)
  }

  test("imageNearDup: perturbed copy pairs up, distinct image stays out; codegen'd hamming") {
    import spark.implicits._
    // gradient image, a 2-pixel perturbation of it, and unrelated noise
    val grad = pngBytes(64, 64, (x, y) => { val v = (x * 4) & 0xFF; (v << 16) | (v << 8) | v })
    val gradTweak = pngBytes(64, 64, (x, y) =>
      if (x == 0 && y < 2) 0xFFFFFF else { val v = (x * 4) & 0xFF; (v << 16) | (v << 8) | v })
    val other = pngBytes(64, 64, (x, y) => { val v = ((x * 31 + y * 17) % 256); (v << 16) | (v << 8) | v })
    val media = Seq(Media(1L, "image/png", grad), Media(2L, "image/png", gradTweak),
      Media(3L, "image/png", other)).toDS()
    val metas = Multimodal.decodeImages(media).toDF()
    val pairs = Multimodal.imageNearDup(metas, maxHam = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"perturbed copy must pair up, got $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "unrelated image must not pair")
    // the refine kernel must run inside whole-stage codegen
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("hamming64") || plan.contains("Hamming64"))
  }

  test("Hamming64: exact popcount semantics, null-safe, codegen and interpreted agree") {
    import spark.implicits._
    val df = Seq((0L, 0L), (-1L, 0L), (0x0FL, 0x01L), (Long.MinValue, 0L))
      .toDF("a", "b")
      .select(graft.functions.Hamming64.column(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("h"))
    assert(df.as[Int].collect().toSeq == Seq(0, 64, 3, 1))
  }
}
