package graft.pond

import org.apache.spark.sql.SparkSession

import graft.core.{DatasetCatalog, GlobalPath}
import graft.fs.{CdlFs, Ingest}

/** Orchestration benchmark with the reference's result shape (SURVEY
  * §2.7): per-run JSON records carrying `kind`, `num_datasets` /
  * `num_ponds`, and `<label>_timestamp_begin/_end` microsecond
  * timestamps around apply + cleanup (reference:
  * benchmark/src/command/create.rs:28-69, ins/elapsed_time.rs:20-41).
  * The workloads are the Spark-side equivalents: dataset create =
  * ingest into a rootfs table; sync = pond-to-pond mirror job.
  */
object OrchestrationBench {

  final case class Result(kind: String, counts: Map[String, Int],
      beginMicros: Long, endMicros: Long) {
    def toJson: String = {
      val countJson = counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s"""{"kind":"$kind",$countJson,""" +
        s""""${kind}_timestamp_begin":$beginMicros,""" +
        s""""${kind}_timestamp_end":$endMicros}"""
    }
  }

  private def timed(kind: String, counts: Map[String, Int])(body: => Unit): Result = {
    val begin = System.currentTimeMillis() * 1000L
    body
    Result(kind, counts, begin, System.currentTimeMillis() * 1000L)
  }

  /** `create dataset --num-k K`: K ingests into fresh rootfs tables. */
  def createDatasets(spark: SparkSession, srcTree: String, workDir: String,
      numK: Int): Result =
    timed("create_datasets", Map("num_datasets" -> numK)) {
      (0 until numK).foreach { i =>
        val fs = CdlFs.open(spark, DatasetCatalog(),
          GlobalPath.parse(s"$workDir/ds$i").fold(sys.error, identity))
        Ingest.run(fs, srcTree)
      }
    }

  /** `create pond --num-k K`: K pond roots registered (directory provision
    * stands in for the MinIO tenant the reference provisions). */
  def createPonds(workDir: String, numK: Int): Result =
    timed("create_ponds", Map("num_ponds" -> numK)) {
      (0 until numK).foreach { i =>
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$workDir/pond$i"))
      }
    }

  /** `sync --num-k K`: K pull-on-create mirror jobs between two ponds. */
  def syncDatasets(spark: SparkSession, srcPond: String, dstPond: String,
      datasets: Seq[String]): Result =
    timed("sync_datasets", Map("num_datasets" -> datasets.size)) {
      val jobs = new PondRegistry.SyncJobs(spark, DatasetCatalog())
      val src = PondRegistry.Pond("src", srcPond, Long.MaxValue, 0)
      val dst = PondRegistry.Pond("dst", dstPond, Long.MaxValue, 0)
      datasets.foreach { ds =>
        jobs.onBind(PondRegistry.Binding(ds, src, dst,
          PondRegistry.PullPolicy.OnCreate, PondRegistry.PushPolicy.Never))
      }
    }
}
