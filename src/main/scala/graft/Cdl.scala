package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.core.{DatasetCatalog, GlobalPath}
import graft.fs.CdlFs

/** Top-level facade mirroring the reference's Python API surface
  * (SURVEY §2.4; python/src/lib.rs, python/cdlake/):
  * `Cdl(**catalog).open(url)` → a session bound to one dataset, with
  * `sql` / `readDir` / `readDirAll` / `readFiles` / `copyTo` /
  * `storageOptions` / `tableLocation`.
  *
  * Where the Python API fully materializes one Arrow batch
  * (`concat_batches`, python/src/lib.rs:153-165), the Scala surface keeps
  * DataFrames lazy and offers `sqlCollect` for the collected-result
  * contract. `tableLocation` + `storageOptions` are the external-engine
  * handoff (`to_lance_dataset`/`to_torch_dataset` equivalents): any ML
  * loader that reads parquet can consume the table directly.
  */
final class Cdl(val catalog: DatasetCatalog) {

  def open(spark: SparkSession, url: String): CdlFs =
    CdlFs.open(spark, catalog, url)
}

object Cdl {

  /** `Cdl(**catalog)` — kwargs-merge construction; unknown keys error
    * (the reference's strict `DatasetCatalog::merge`). */
  def apply(kwargs: Map[String, String] = Map.empty): Cdl =
    new Cdl(DatasetCatalog.fromMap(kwargs).fold(e => sys.error(e), identity))

  /** One-call convenience: parse, open, query. */
  def sql(spark: SparkSession, url: String, query: String,
      kwargs: Map[String, String] = Map.empty): DataFrame =
    Cdl(kwargs).open(spark, url).sql(query)
}

/** Collected-result helpers on CdlFs matching the Python bindings. */
object CdlFsOps {
  implicit final class RichCdlFs(private val fs: CdlFs) extends AnyVal {
    /** `sql` + full materialization (the Python one-batch contract). */
    def sqlCollect(q: String): Array[Row] = fs.sql(q).collect()

    /** `read_files(condition)` → payload byte arrays, in (parent, name,
      * chunk_id) order (python/src/lib.rs:105-129). */
    def readFiles(condition: String): Array[Array[Byte]] =
      fs.readFilesByCondition(condition)
        .orderBy("parent", "name", "chunk_id")
        .select("data").collect().map(_.getAs[Array[Byte]](0))
  }
}
