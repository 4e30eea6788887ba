package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private lazy val items =
    Multimodal.fromDocuments(spark.read.parquet(s"$sf/documents.parquet"))

  test("fromDocuments produces the canonical multimodal schema") {
    assert(items.schema.fieldNames.toSeq ==
      Seq("item_id", "modality", "payload", "meta"))
    val meta = items.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("width", "height", "sample_rate", "n_frames", "codec"))
  }

  test("extractFeatures is deterministic and sized correctly") {
    import spark.implicits._
    val ds = items.as[Multimodal.Item]
    val f1 = Multimodal.extractFeatures(ds, dims = 8).collect()
      .map(f => f.item_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(ds, dims = 8).collect()
      .map(f => f.item_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.size == 8))
  }

  test("n_bytes matches payload length") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(items.as[Multimodal.Item]).toDF()
    val joined = feats.join(items, "item_id")
      .filter(col("n_bytes") =!= octet_length(col("payload")))
    assert(joined.count() == 0)
  }

  test("frameSamplePlan samples every stride-th frame") {
    import spark.implicits._
    val d = Seq((1L, "video", Array[Byte](), (None: Option[Int], None: Option[Int],
      None: Option[Int], Some(100): Option[Int], Some("h264"): Option[String])))
      .toDF("item_id", "modality", "payload", "meta")
      .withColumn("meta", col("meta").cast(
        "struct<width:int,height:int,sample_rate:int,n_frames:int,codec:string>"))
    val r = Multimodal.frameSamplePlan(d, stride = 10).collect().head
    assert(r.getAs[Long]("n_sampled") == 10) // frames 0,10,...,90
  }

  // --- image codec: programmatic images through the REAL decode path ---

  private def encode(fmt: String, w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  private def imageItem(id: Long, payload: Array[Byte]): Multimodal.Item =
    Multimodal.Item(id, "image", payload,
      Multimodal.Meta(None, None, None, None, Some("img")))

  test("codec decodes a uniform PNG to a single-bucket luminance histogram") {
    // RGB(100,100,100) -> ITU-601 integer luma (100*299+100*587+100*114)/1000
    // = 100 -> bucket 100*16/256 = 6; all 8*4 = 32 pixels land there
    val p = encode("png", 8, 4)((_, _) => 0x646464)
    val f = Multimodal.Codec.features(p, dims = 16)
    val expected = Array.fill(16)(0f); expected(6) = 32f
    assert(f.toSeq == expected.toSeq)
  }

  test("codec decodes a gray-gradient PNG to the exact uniform histogram") {
    // pixel x = RGB(x,x,x) -> luma x exactly -> bucket x/16: 16 pixels each
    val p = encode("png", 256, 1)((x, _) => (x << 16) | (x << 8) | x)
    assert(Multimodal.Codec.features(p, dims = 16).toSeq == Seq.fill(16)(16f))
  }

  test("codec decodes a 1x1 white PNG into the top luminance bucket") {
    val p = encode("png", 1, 1)((_, _) => 0xFFFFFF)
    val f = Multimodal.Codec.features(p, dims = 16)
    val expected = Array.fill(16)(0f); expected(15) = 1f // luma 255 -> 15
    assert(f.toSeq == expected.toSeq)
  }

  test("codec sniffs and decodes BMP and GIF magics like PNG") {
    for (fmt <- Seq("bmp", "gif")) {
      val p = encode(fmt, 8, 4)((_, _) => 0x646464)
      val f = Multimodal.Codec.features(p, dims = 16)
      val expected = Array.fill(16)(0f); expected(6) = 32f
      assert(f.toSeq == expected.toSeq, s"fmt=$fmt")
    }
  }

  test("codec decodes JPEG: histogram mass equals pixel count, not byte count") {
    // JPEG is lossy so bucket values aren't pinned; that the mass is the
    // PIXEL count (not the much larger file byte count) proves the decode
    // branch ran instead of the byte-histogram fallback
    val p = encode("jpg", 8, 4)((_, _) => 0x646464)
    assert(p.length != 32)
    assert(Multimodal.Codec.features(p, dims = 16).sum == 32f)
  }

  private def wav(samples: Array[Short], bigEndian: Boolean = false): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, bigEndian)
    val pcm = new Array[Byte](samples.length * 2)
    for ((s, k) <- samples.zipWithIndex) {
      val (hi, lo) = ((s >> 8).toByte, (s & 0xFF).toByte)
      if (bigEndian) { pcm(2 * k) = hi; pcm(2 * k + 1) = lo }
      else { pcm(2 * k) = lo; pcm(2 * k + 1) = hi }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("codec decodes WAV PCM to the exact amplitude histogram") {
    // one sample centered in each of the 16 amplitude buckets
    val samples = Array.tabulate(16)(k => (-32768 + k * 4096 + 2048).toShort)
    val f = Multimodal.Codec.features(wav(samples), dims = 16)
    assert(f.toSeq == Seq.fill(16)(1f))
    // silence: every sample in the midpoint bucket
    val silent = Multimodal.Codec.features(wav(Array.fill(50)(0.toShort)), 16)
    val expected = Array.fill(16)(0f); expected(8) = 50f
    assert(silent.toSeq == expected.toSeq)
  }

  test("WAV histogram mass equals sample count, not file byte count") {
    val p = wav(Array.fill(37)(123.toShort))
    assert(p.length != 37) // RIFF header + 2 bytes/sample
    assert(Multimodal.Codec.features(p, dims = 16).sum == 37f)
  }

  /** Minimal MJPEG AVI: RIFF/AVI header + LIST movi with one `00dc`
    * chunk per frame (even-padded) — the structure Codec.aviFrames
    * walks. */
  private def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(le32(f.length)); movi.write(f)
      if (f.length % 2 == 1) movi.write(0)
    }
    val body = new java.io.ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write("LIST".getBytes("US-ASCII"))
    body.write(le32(movi.size())); movi.writeTo(body)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(body.size())); body.writeTo(out)
    out.toByteArray
  }

  test("codec decodes MJPEG AVI: sampled frames through the image luma path") {
    // 8x4 uniform gray-100 JPEG frames -> luma bucket 6, 32 px per frame
    val frame = encode("jpg", 8, 4)((_, _) => 0x646464)
    // 3 frames: stride 16 samples only frame 0 -> mass 32
    val f3 = Multimodal.Codec.features(avi(Seq.fill(3)(frame)), dims = 16)
    assert(f3.sum == 32f, f3.toSeq)
    // 17 frames: frames 0 and 16 sampled -> mass 64
    val f17 = Multimodal.Codec.features(avi(Seq.fill(17)(frame)), dims = 16)
    assert(f17.sum == 64f, f17.toSeq)
    // the mass sits where the luminance bucket says, not spread byte-wise
    assert(f3(6) == 32f && f17(6) == 64f)
  }

  test("sampleFrames explodes AVI into per-frame image items; non-video passes through") {
    import spark.implicits._
    val frame = encode("jpg", 8, 4)((_, _) => 0x646464)
    val clip = Multimodal.Item(7L, "video", avi(Seq.fill(33)(frame)),
      Multimodal.Meta(None, None, None, Some(33), Some("mjpeg")))
    val text = Multimodal.Item(8L, "text", "hi".getBytes("UTF-8"),
      Multimodal.Meta(None, None, None, Some(2), Some("utf8")))
    val out = Multimodal.sampleFrames(Seq(clip, text).toDS(), stride = 16)
      .collect().sortBy(_.item_id)
    // 33 frames, stride 16 -> frames 0, 16, 32
    assert(out.map(_.item_id).toSeq == Seq(8L, 7000000L, 7000016L, 7000032L))
    val sampled = out.filter(_.modality == "image")
    assert(sampled.length == 3)
    assert(sampled.forall(_.meta.n_frames.contains(1)))
    // each exploded payload is the original decodable JPEG frame
    sampled.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.payload))
      assert(img != null && img.getWidth == 8 && img.getHeight == 4)
    }
    // the text item passed through untouched
    assert(out.head.item_id == 8L && out.head.modality == "text")
    // and the sampled frames featurize through the image path downstream
    val feats = Multimodal.extractFeatures(
      Multimodal.sampleFrames(Seq(clip).toDS(), stride = 16), dims = 16)
      .collect()
    assert(feats.forall(_.feature.sum == 32f)) // 8x4 pixels per frame
  }

  test("pathologically nested AVI LISTs terminate via the depth bound") {
    // 50k nested LIST headers: without the walk's depth cap this blows
    // the stack with an Error the corrupt-blob catch cannot absorb
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val n = 50000
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    out.write(le32(4 + n * 12)); out.write("AVI ".getBytes("US-ASCII"))
    for (k <- n to 1 by -1) {
      out.write("LIST".getBytes("US-ASCII"))
      out.write(le32(4 + (k - 1) * 12))
      out.write("rec ".getBytes("US-ASCII"))
    }
    val f = Multimodal.Codec.features(out.toByteArray, dims = 16)
    assert(f.sum == out.size().toFloat) // byte fallback, no crash
  }

  test("AVI with undecodable frames falls back to exact byte stats") {
    val junk = avi(Seq(Array[Byte](1, 2, 3, 4))) // not a JPEG frame
    val f = Multimodal.Codec.features(junk, dims = 16)
    val expected = Array.fill(16)(0f)
    for (b <- junk) expected((b & 0xFF) % 16) += 1f
    assert(f.toSeq == expected.toSeq)
  }

  test("truncated RIFF magic falls back to exact byte stats") {
    val p = "RIFFxxxxWAVEgarbage".getBytes("US-ASCII")
    val f = Multimodal.Codec.features(p, dims = 16)
    val expected = Array.fill(16)(0f)
    for (b <- p) expected((b & 0xFF) % 16) += 1f
    assert(f.toSeq == expected.toSeq)
  }

  test("truncated image-magic payload falls back to exact byte stats") {
    // PNG magic + garbage: ImageIO fails, byte histogram (byte mod 16) applies
    val p = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    val f = Multimodal.Codec.features(p, dims = 16)
    val expected = Array.fill(16)(0f)
    for (b <- p) expected((b & 0xFF) % 16) += 1f
    assert(f.toSeq == expected.toSeq)
    assert(f.sum == p.length.toFloat)
  }

  test("extractFeatures runs the image decode branch distributed") {
    import spark.implicits._
    val png = encode("png", 8, 4)((_, _) => 0x646464)
    val mixed = Seq(
      imageItem(1L, png),
      Multimodal.Item(2L, "text", "abc".getBytes("UTF-8"),
        Multimodal.Meta(None, None, None, Some(3), Some("utf8")))).toDS()
    val f = Multimodal.extractFeatures(mixed, dims = 16).collect()
      .map(x => x.item_id -> x.feature).toMap
    val img = Array.fill(16)(0f); img(6) = 32f
    assert(f(1L).toSeq == img.toSeq)           // luminance histogram
    val txt = Array.fill(16)(0f)
    for (b <- "abc".getBytes("UTF-8")) txt((b & 0xFF) % 16) += 1f
    assert(f(2L).toSeq == txt.toSeq)           // byte histogram
  }

  test("resize nearest-neighbor resamples a real PNG pixel-exactly") {
    import spark.implicits._
    // 2x2 quadrant colors; 4x4 target -> each source pixel becomes a 2x2
    // block under nearest-neighbor (src index = floor(dst*2/4))
    val colors = Array(Array(0xFF0000, 0x00FF00), Array(0x0000FF, 0xFFFFFF))
    val src = encode("png", 2, 2)((x, y) => colors(y)(x))
    val out = Multimodal.resize(Seq(imageItem(9L, src)).toDS(), 4, 4).collect().head
    assert(out.meta.width.contains(4) && out.meta.height.contains(4))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(img.getWidth == 4 && img.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xFFFFFF) == colors(y * 2 / 4)(x * 2 / 4),
        s"pixel ($x,$y)")
    // PNG re-encode is lossless and deterministic: run twice, byte-identical
    val again = Multimodal.resize(Seq(imageItem(9L, src)).toDS(), 4, 4)
      .collect().head
    assert(out.payload.toSeq == again.payload.toSeq)
  }

  test("resize of a corrupt image-magic payload takes the byte fallback") {
    import spark.implicits._
    val bad = Array[Byte]('B', 'M', 9, 9, 9) // BMP magic, undecodable
    val out = Multimodal.resize(Seq(imageItem(3L, bad)).toDS(), 4, 3)
      .collect().head
    assert(out.payload.length == 4 * 3 * 3) // byte resample, not a PNG
    assert(out.meta.width.contains(4) && out.meta.height.contains(3))
  }

  test("resize rewrites payload size and meta dims, deterministically") {
    import spark.implicits._
    val ds = items.as[Multimodal.Item]
    val r1 = Multimodal.resize(ds, 4, 3).collect().sortBy(_.item_id)
    val r2 = Multimodal.resize(ds, 4, 3).collect().sortBy(_.item_id)
    assert(r1.forall(_.payload.length == 4 * 3 * 3))
    assert(r1.forall(x => x.meta.width.contains(4) && x.meta.height.contains(3)))
    // untouched meta fields survive; output deterministic across runs
    assert(r1.forall(_.meta.codec.contains("utf8")))
    assert(r1.map(_.payload.toSeq) sameElements r2.map(_.payload.toSeq))
  }
}
