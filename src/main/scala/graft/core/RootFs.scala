package graft.core

import org.apache.spark.sql.types._

/** The rootfs data model: a dataset is ONE columnar table whose rows are
  * files (or chunks of files). Schema pinned to the reference's 11-column
  * Arrow schema (reference: crates/cdl-fs/src/lib.rs:772-792); type mapping
  * per SURVEY §1.2 (unsigned ints → signed, documented lossy).
  */
object RootFs {

  val TableName = "rootfs"

  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("parent", StringType, nullable = false),
    StructField("atime", TimestampType, nullable = true), // µs precision
    StructField("ctime", TimestampType, nullable = true),
    StructField("mtime", TimestampType, nullable = true),
    StructField("mode", IntegerType, nullable = true),  // ref: UInt32
    StructField("size", LongType, nullable = true),     // ref: UInt64; whole-file size
    StructField("chunk_id", LongType, nullable = false),
    StructField("chunk_offset", LongType, nullable = false),
    StructField("chunk_size", LongType, nullable = false),
    StructField("data", BinaryType, nullable = true),
    // Beyond the reference's 11 columns: a STABLE per-row ordinal stamped
    // at ingest (append-monotonic, recorded in the commit manifest), the
    // equivalent of Lance's row ids that back the reference's O(1)
    // `take` (python/cdlake/filesystem.py:58-63). Parquet min/max
    // row-group stats on it prune random access to the touched files.
    StructField("row_id", LongType, nullable = true)
  ))

  /** One row of rootfs. Metadata (atime..size) is present only on
    * `chunk_id == 0` rows — later chunks carry None so that
    * `size IS NOT NULL` dedupes chunks into one logical file
    * (reference: crates/cdl-fs/src/lib.rs:687). */
  final case class FileRecord(
      name: String,
      parent: String,
      atime: Option[java.sql.Timestamp],
      ctime: Option[java.sql.Timestamp],
      mtime: Option[java.sql.Timestamp],
      mode: Option[Int],
      size: Option[Long],
      chunk_id: Long,
      chunk_offset: Long,
      chunk_size: Long,
      data: Array[Byte],
      row_id: Option[Long] = None)

  /** Number of chunks a file of `size` bytes occupies (closed form of
    * `chunkLayout(...).size` — no Seq materialization for huge files). */
  def chunkCount(size: Long, maxChunkSize: Long): Long =
    if (maxChunkSize <= 0 || size == 0) 1L else (size - 1) / maxChunkSize + 1

  /** Chunk layout for a file of `size` bytes under `maxChunkSize`
    * (0 disables chunking → one chunk). Closed form matches the
    * reference loop (crates/cdl-fs/src/lib.rs:666-697):
    * chunk_id ∈ 0..=((size-1)/max), offset = id*max,
    * chunk_size = min(size, (id+1)*max) - offset. */
  def chunkLayout(size: Long, maxChunkSize: Long): Seq[(Long, Long, Long)] = {
    require(size >= 0, s"negative size $size")
    if (maxChunkSize <= 0 || size == 0) Seq((0L, 0L, size))
    else {
      val n = (size - 1) / maxChunkSize + 1
      (0L until n).map { id =>
        val off = id * maxChunkSize
        (id, off, math.min(size, (id + 1) * maxChunkSize) - off)
      }
    }
  }
}
