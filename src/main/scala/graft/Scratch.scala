package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary measurement harness (not part of the library; deleted before commit)
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val exact09 = graft.ops.Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.9)
        .select("doc_a", "doc_b")
      val sigs = graft.ops.Dedup.simhash(docs)
      val withH = exact09
        .join(sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sa")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sb")), "doc_b")
        .select(bit_count(col("sa").bitwiseXOR(col("sb"))).as("h"))
      val hist = withH.groupBy("h").count().orderBy("h").collect()
        .map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
      println(s"RESULT $sf hamming(j>=0.9): $hist")
    }
    spark.stop()
  }
}
