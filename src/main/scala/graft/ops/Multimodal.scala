package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata riding alongside. The Spark-side
  * contracts — schema, partition-sized batch processing, bounded memory per
  * row (chunked payloads via RootFs), executor-local decode — are real and
  * tested, and so are the codec's image, audio, and video paths: `Codec`
  * sniffs the container magic and decodes PNG/JPEG/GIF/BMP payloads with
  * `javax.imageio`, WAV PCM payloads with `javax.sound.sampled`, and
  * MJPEG-in-AVI video (RIFF walk + per-frame ImageIO, every 16th frame)
  * — all JVM-native, no external library — reducing pixels to a
  * deterministic luminance histogram and audio samples to a
  * deterministic amplitude histogram. Everything else (mp3/mp4 and
  * other compressed codecs this JVM cannot decode) reduces to an
  * equally deterministic byte histogram — which keeps EVERY payload
  * featurizable and the whole operator oracle-checkable on a text
  * corpus. Swap/extend the codec body (e.g. a javacv call or Python
  * `mapInPandas` worker for those codecs) without touching the
  * plumbing.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val schema: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("codec", StringType, nullable = true)
    )), nullable = true)
  ))

  final case class Meta(width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], n_frames: Option[Int], codec: Option[String])
  final case class Item(item_id: Long, modality: String,
      payload: Array[Byte], meta: Meta)
  final case class Feature(item_id: Long, modality: String,
      feature: Array[Float], n_bytes: Long)

  /** Content-sniffing decoder. Image containers (PNG/JPEG/GIF/BMP magic)
    * are REALLY decoded — `javax.imageio` ships in the JVM — and reduced
    * to a `dims`-bucket luminance histogram (bucket = luma·dims/256,
    * ITU-R 601 integer luma), a classic cheap perceptual feature. WAV
    * PCM containers (RIFF magic) are really decoded too —
    * `javax.sound.sampled` — into the analogous amplitude histogram.
    * Everything else reduces to a `dims`-bucket byte histogram
    * (bucket = byte mod dims). All are pure counts: deterministic
    * across runs and engines, so the operator's output is checkable by
    * an independent oracle on byte-level corpora (the driver gate does
    * exactly that), and the image path is pinned by MultimodalSpec on
    * programmatically generated PNGs.
    *
    * The sniff runs BEFORE any ImageIO call: on a 100 TB mostly-text
    * corpus the common row costs four byte compares, never a decoder
    * probe. An image-magic payload that fails to decode (truncated
    * file) falls back to byte stats rather than failing the job —
    * corrupt blobs are data, not errors, at scale. */
  object Codec {
    private[ops] def looksLikeImage(p: Array[Byte]): Boolean =
      p != null && p.length >= 4 && (
        (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
        (p(0) == 'B' && p(1) == 'M'))

    /** RIFF/WAVE container magic. */
    private[ops] def looksLikeWav(p: Array[Byte]): Boolean =
      p != null && p.length >= 12 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

    /** RIFF/AVI container magic. */
    private[ops] def looksLikeAvi(p: Array[Byte]): Boolean =
      p != null && p.length >= 12 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

    /** Video-frame payloads (`##db`/`##dc` stream chunks) of an AVI
      * container in stream order — a minimal, allocation-bounded RIFF
      * walk (chunks are [id:4][size:4 LE][data][pad-to-even]; RIFF/LIST
      * chunks carry a 4-byte type then subchunks). Lenient by design:
      * sizes are clamped to the buffer and a corrupt size ends the walk
      * with whatever was collected — truncated tails are data. */
    private[ops] def aviFrames(p: Array[Byte]): Seq[Array[Byte]] = {
      val out = Seq.newBuilder[Array[Byte]]
      def u32(i: Int): Long =
        (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
          ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)
      // real AVIs nest RIFF→LIST(hdrl/movi)→LIST(rec) — depth 3-4; the
      // bound exists because a crafted payload could nest LISTs tens of
      // thousands deep and a StackOverflowError is an Error the codec's
      // corrupt-blob catch would NOT absorb (it would fail the task)
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 16) return
        var i = start
        var ok = true
        while (ok && i + 8 <= end) {
          val id = new String(p, i, 4, "US-ASCII")
          val sz = u32(i + 4)
          val dataStart = i + 8
          if (sz < 0 || sz > Int.MaxValue - 8) ok = false
          else {
            val dataEnd = math.min(dataStart + sz.toInt, end)
            if (id == "RIFF" || id == "LIST") {
              if (dataStart + 4 <= dataEnd) walk(dataStart + 4, dataEnd, depth + 1)
            } else if (id(2) == 'd' && (id(3) == 'b' || id(3) == 'c') &&
                dataEnd > dataStart) {
              out += java.util.Arrays.copyOfRange(p, dataStart, dataEnd)
            }
            i = dataStart + sz.toInt + (sz.toInt & 1)
          }
        }
      }
      walk(0, p.length, 0)
      out.result()
    }

    /** Frame-sampling stride for video featurization — every 16th frame,
      * the same convention `frameSamplePlan`/`q_multimodal_meta` use. */
    private[ops] val FrameStride = 16

    /** MJPEG-in-AVI decode → summed luminance histogram over every
      * `FrameStride`-th frame: each sampled frame payload is a JPEG
      * (or any ImageIO-decodable picture) decoded through the SAME luma
      * path as still images. Returns null when no sampled frame
      * decodes (compressed codecs this JVM can't read) → byte fallback. */
    private def aviHistogram(payload: Array[Byte], dims: Int): Array[Float] =
      try {
        val frames = aviFrames(payload)
        if (frames.isEmpty) null
        else {
          val out = new Array[Float](dims)
          var any = false
          var k = 0
          while (k < frames.length) {
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(frames(k)))
              catch { case _: Exception => null }
            if (img != null) { any = true; lumaInto(img, out, dims) }
            k += FrameStride
          }
          if (any) out else null
        }
      } catch { case _: Exception => null }

    /** Accumulate one decoded image into a `dims`-bucket ITU-601 integer
      * luminance histogram — shared by the still-image and video paths. */
    private def lumaInto(
        img: java.awt.image.BufferedImage, out: Array[Float], dims: Int): Unit = {
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xFF) * 299 +
            ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
          out(luma * dims / 256) += 1f
          x += 1
        }
        y += 1
      }
    }

    /** WAV PCM decode → `dims`-bucket amplitude histogram (bucket =
      * (sample + 32768)·dims/65536 over 16-bit sample values, 8-bit
      * scaled up) — the audio analogue of the luminance histogram: pure
      * counts over decoded samples, deterministic across runs. Only
      * integer PCM is decoded (the WAV payload is a bit-exact parse —
      * no resampling layer whose output could vary by JVM); float/
      * compressed encodings fall back to byte stats like any other
      * undecodable payload. Returns null when not decodable. */
    private def wavHistogram(payload: Array[Byte], dims: Int): Array[Float] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if (!((signed || unsigned) && (bits == 16 || bits == 8))) null
        else {
          val pcm = ais.readAllBytes()
          val out = new Array[Float](dims)
          if (bits == 8) {
            // 8-bit WAV is unsigned by convention; center then scale to
            // the 16-bit lattice so bucket edges match the 16-bit path
            var i = 0
            while (i < pcm.length) {
              val s = ((pcm(i) & 0xFF) - (if (unsigned) 128 else 0)) << 8
              val c = if (signed) (pcm(i).toInt) << 8 else s
              out((c + 32768) * dims / 65536) += 1f
              i += 1
            }
          } else {
            val big = fmt.isBigEndian
            var i = 0
            while (i + 1 < pcm.length) {
              val s =
                if (big) (pcm(i) << 8) | (pcm(i + 1) & 0xFF)
                else (pcm(i + 1) << 8) | (pcm(i) & 0xFF)
              val c = if (unsigned) (s & 0xFFFF) - 32768 else s
              out((c + 32768) * dims / 65536) += 1f
              i += 2
            }
          }
          out
        }
      } catch { case _: Exception => null }

    def features(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      if (payload == null) return out
      if (looksLikeWav(payload)) {
        val hist = wavHistogram(payload, dims)
        if (hist != null) return hist
      }
      if (looksLikeAvi(payload)) {
        val hist = aviHistogram(payload, dims)
        if (hist != null) return hist
      }
      if (looksLikeImage(payload)) {
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          catch { case _: Exception => null }
        if (img != null) {
          lumaInto(img, out, dims)
          return out
        }
      }
      var i = 0
      while (i < payload.length) {
        out((payload(i) & 0xFF) % dims) += 1f
        i += 1
      }
      out
    }
  }

  /** Feature extraction: executor-local, batch-at-a-time over partitions —
    * the Scala analogue of a `mapInPandas` decode worker. Partitioning, row
    * shape, and memory bounds (one payload in flight per task thread) are
    * the contract; the codec body really decodes images (see Codec). */
  def extractFeatures(items: Dataset[Item], dims: Int = 16): Dataset[Feature] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { x =>
        Feature(x.item_id, x.modality,
          Codec.features(x.payload, dims),
          if (x.payload == null) 0L else x.payload.length.toLong)
      }
    }
  }

  /** Video → frame images: explode every `stride`-th video frame of an
    * AVI payload into its own image item — the materialized form of
    * `frameSamplePlan`, and the video→frames step a vision training
    * pipeline runs before featurization. Frame k becomes
    * `item_id·10⁶ + k` (collision-free while corpora stay under 10⁶
    * frames per clip; the factor is a documented contract, not a
    * heuristic) with modality "image", the frame bytes as payload (JPEG
    * for MJPEG streams — directly decodable downstream), and
    * `n_frames = 1`. Non-AVI items pass through UNCHANGED, so the op
    * composes with mixed-modality corpora. Executor-local flatMap over
    * partitions — one clip's frames never leave their task, and a clip
    * expands to at most ceil(frames/stride) rows. */
  def sampleFrames(
      items: Dataset[Item], stride: Int = Codec.FrameStride): Dataset[Item] = {
    import items.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1: $stride")
    items.mapPartitions { it =>
      it.flatMap { x =>
        if (!Codec.looksLikeAvi(x.payload)) Iterator.single(x)
        else {
          val frames = Codec.aviFrames(x.payload)
          if (frames.isEmpty) Iterator.single(x)
          else Iterator.range(0, frames.length, stride).map { k =>
            Item(x.item_id * 1000000L + k, "image", frames(k),
              x.meta.copy(n_frames = Some(1)))
          }
        }
      }
    }
  }

  /** Resize: image payloads (container magic, see Codec) are REALLY
    * decoded, scaled by deterministic nearest-neighbor sampling (no
    * Graphics2D filtering — rendering-hint output can vary across JVM
    * toolkits, a pixel-exact loop cannot), and re-encoded as PNG
    * (lossless, so the resample is bit-reproducible). Non-image payloads
    * get the equivalent byte-level treatment — a deterministic
    * 3-bytes/pixel resample of the source bytes — so byte accounting,
    * meta rewrite, and partition shape hold for every modality.
    * Executor-local and batch-at-a-time like extractFeatures — the
    * `mapInPandas`-worker shape. */
  def resize(items: Dataset[Item], width: Int, height: Int): Dataset[Item] = {
    import items.sparkSession.implicits._
    require(width > 0 && height > 0, s"bad target dims ${width}x$height")
    // w*h*3 is computed in Int below — an unchecked 30000×30000 would
    // wrap negative (or worse, wrap positive and silently mis-size)
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"target ${width}x$height exceeds the byte-array budget")
    items.mapPartitions { it =>
      it.map { x =>
        val decoded =
          if (Codec.looksLikeImage(x.payload))
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(x.payload))
            catch { case _: Exception => null }
          else null
        val out: Array[Byte] =
          if (decoded != null) {
            val dst = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var j = 0
            while (j < height) {
              var i = 0
              while (i < width) {
                dst.setRGB(i, j, decoded.getRGB(
                  (i.toLong * decoded.getWidth / width).toInt,
                  (j.toLong * decoded.getHeight / height).toInt))
                i += 1
              }
              j += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", baos)
            baos.toByteArray
          } else {
            val n = width * height * 3
            val b = new Array[Byte](n)
            if (x.payload != null && x.payload.length > 0) {
              var i = 0
              while (i < n) {
                b(i) = x.payload((i.toLong * x.payload.length / n).toInt)
                i += 1
              }
            }
            b
          }
        x.copy(payload = out,
          meta = x.meta.copy(width = Some(width), height = Some(height)))
      }
    }
  }

  /** Frame sampling plan for video: every `stride`-th frame index, purely
    * declarative (the decode of those frames would happen in the codec
    * worker). */
  def frameSamplePlan(items: DataFrame, stride: Int): DataFrame =
    items
      .withColumn("sampled_frames",
        when(col("meta.n_frames").isNotNull,
          sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(stride)))
          .otherwise(array()))
      .select(col("item_id"), col("modality"),
        size(col("sampled_frames")).cast("long").as("n_sampled"),
        col("sampled_frames"))

  /** Wrap a documents-like table as multimodal items (text → utf-8 payload)
    * — lets every pipeline stage be exercised on the synthetic corpus. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("item_id"),
      lit("text").as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        length(col("text")).as("n_frames"),
        lit("utf8").as("codec")).as("meta"))
}
