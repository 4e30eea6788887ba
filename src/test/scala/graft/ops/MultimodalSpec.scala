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
