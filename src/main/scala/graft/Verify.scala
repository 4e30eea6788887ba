package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: only run queries whose name starts with the
    // prefix (local iteration); the driver's 2-arg call runs everything
    val (sfDir, outDir, prefix) = args match {
      case Array(a, b)    => (a, b, "")
      case Array(a, b, p) => (a, b, p)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL or an exception message would
    // otherwise make the driver's json.load fail and silently zero the
    // round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // corpus-drift preflight: name the drifted table/column UP FRONT
    // (the r10 events.ts re-encode surfaced as six deep cast errors);
    // the violations also land in preflight.json for verify_local.py.
    // Full escaping matters here too — an "unreadable" violation embeds
    // a raw exception message that can span lines.
    val drift = SchemaContract.report(spark, sfDir)
    Files.writeString(Paths.get(s"$outDir/preflight.json"),
      drift.map(q).mkString("[", ",", "]"))
    SparkEntry.queries
      .filter { case (name, _) => name.startsWith(prefix) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators persist reusable signature tables; drop between queries
      spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
