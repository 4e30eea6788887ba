package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata riding alongside. The Spark-side
  * contracts — schema, partition-sized batch processing, bounded memory per
  * row (chunked payloads via RootFs), executor-local decode — are real and
  * tested; the actual codec calls are STUBBED with a deterministic fake
  * (this container has no image/audio libraries). Swap `FakeCodec` for a
  * real decoder (e.g. a JNI/javacv call or Python `mapInPandas` worker)
  * without touching the plumbing.
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

  /** STUB decoder: a real implementation would parse the container format
    * (JPEG/WAV/MP4). The fake derives a deterministic d-dim feature from
    * payload bytes so the distributed plumbing is fully testable. */
  object FakeCodec {
    def features(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      if (payload == null) return out
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < payload.length) {
        h = (h ^ payload(i)) * 0x100000001b3L
        out(i % dims) += (h & 0xFFFF) / 65535.0f
        i += 1
      }
      out
    }
  }

  /** Feature extraction: executor-local, batch-at-a-time over partitions —
    * the Scala analogue of a `mapInPandas` decode worker. Partitioning, row
    * shape, and memory bounds (one payload in flight per task thread) are
    * the real contract; only the codec body is fake. */
  def extractFeatures(items: Dataset[Item], dims: Int = 16): Dataset[Feature] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { x =>
        Feature(x.item_id, x.modality,
          FakeCodec.features(x.payload, dims),
          if (x.payload == null) 0L else x.payload.length.toLong)
      }
    }
  }

  /** STUB resize: re-encodes the payload for target dimensions. A real
    * implementation decodes, scales, and re-encodes; the fake emits a
    * deterministic byte stream of the size a `w×h` re-encode would
    * approximate (3 bytes/pixel sampled from the source payload), so
    * byte accounting, meta rewrite, and partition shape are all real and
    * testable. Executor-local and batch-at-a-time like extractFeatures —
    * the `mapInPandas`-worker shape. */
  def resize(items: Dataset[Item], width: Int, height: Int): Dataset[Item] = {
    import items.sparkSession.implicits._
    require(width > 0 && height > 0, s"bad target dims ${width}x$height")
    // w*h*3 is computed in Int below — an unchecked 30000×30000 would
    // wrap negative (or worse, wrap positive and silently mis-size)
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"target ${width}x$height exceeds the byte-array budget")
    items.mapPartitions { it =>
      it.map { x =>
        val n = width * height * 3
        val out = new Array[Byte](n)
        if (x.payload != null && x.payload.length > 0) {
          var i = 0
          while (i < n) {
            // deterministic sample of the source bytes (stands in for the
            // decoded-pixel resample a real codec would do)
            out(i) = x.payload((i.toLong * x.payload.length / n).toInt)
            i += 1
          }
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
