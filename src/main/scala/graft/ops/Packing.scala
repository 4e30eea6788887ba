package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-batch layout step: documents are laid
  * end-to-end per shard in a deterministic order and cut into fixed
  * token-budget packs (the concat-then-chunk layout most LLM training
  * uses; a document may span a pack boundary).
  *
  * Scale design: the running token offset is a window cumsum
  * PARTITIONED BY SHARD — shards (source files, date buckets …) are the
  * parallel unit, so no global sort and no single-partition window ever
  * appears; each shard's docs sort locally within its partition. At
  * 100 TB the shard column must bound partition size (same contract as
  * any partitioned window), which input sharding already guarantees in
  * practice. Token counts are computed inline (codegen) — one text
  * pass, and the shuffle carries (shard, doc_id, n_tokens) only.
  *
  * The reference (SmartX-Team/connected-data-lake) has no curation ops —
  * this extends the engine for training pipelines (SURVEY §2.8).
  */
object Packing {

  /** Pack assignments: for each doc, its token offset within the shard's
    * concatenated stream and the [first_pack, last_pack] range of
    * `budget`-token packs it lands in. `orderCol` fixes the layout order
    * (must be unique per shard for determinism). */
  def packAssignments(
      docs: DataFrame,
      budget: Int,
      shardCol: String = "source",
      orderCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val b: Column = lit(budget.toLong)
    docs
      .select(col(shardCol).as("shard"), col(orderCol).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("tok_offset",
        coalesce(sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      // offsets stay far below 2^53, so double floor-division is exact
      .withColumn("first_pack", floor(col("tok_offset") / b).cast("long"))
      .withColumn("last_pack",
        floor((col("tok_offset") + col("n_tokens") - 1) / b).cast("long"))
  }
}
