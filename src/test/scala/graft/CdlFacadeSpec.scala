package graft

import java.nio.file.{Files, Paths}

/** The §2.4 Python-API-parity facade: Cdl(**catalog).open(url) and the
  * collected-result helpers. */
class CdlFacadeSpec extends SparkSuite {

  private lazy val dsUrl: String = {
    val root = Files.createTempDirectory("facade").toString
    Files.write(Paths.get(s"$root/a.txt"), "alpha".getBytes)
    Files.write(Paths.get(s"$root/b.txt"), "bravo!".getBytes)
    val url = s"$root/ds"
    val fs = Cdl(Map("max_chunk_size" -> "4")).open(spark, url)
    graft.fs.Ingest.run(fs, root)
    url
  }

  test("Cdl(**catalog) rejects unknown keys like the reference merge") {
    intercept[RuntimeException] { Cdl(Map("nope" -> "1")) }
  }

  test("open + sql over the dataset") {
    val fs = Cdl(Map.empty).open(spark, dsUrl)
    val rows = fs.sql(
      "SELECT name, size FROM rootfs WHERE size IS NOT NULL ORDER BY name")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a.txt", "b.txt"))
  }

  test("sqlCollect materializes; readFiles returns payload chunks in order") {
    import CdlFsOps._
    val fs = Cdl(Map.empty).open(spark, dsUrl)
    assert(fs.sqlCollect("SELECT count(*) AS n FROM rootfs").head.getLong(0) == 4)
    // chunked at 4 bytes: a.txt -> [alph][a]; concatenation restores bytes
    val chunks = fs.readFiles("name = 'a.txt'")
    assert(chunks.map(new String(_)).mkString == "alpha")
  }

  test("storageOptions + tableLocation form the external handoff") {
    val fs = Cdl(Map("s3_access_key" -> "k")).open(spark, dsUrl)
    assert(fs.storageOptions("fs.s3a.access.key") == "k")
    assert(fs.tableLocation.endsWith("/ds/rootfs"))
  }

  test("orchestration bench emits the reference JSON shape") {
    val work = Files.createTempDirectory("obench").toString
    val tree = Files.createTempDirectory("otree").toString
    Files.write(Paths.get(s"$tree/f.txt"), "x".getBytes)
    val r = graft.pond.OrchestrationBench.createDatasets(spark, tree, work, 2)
    val json = r.toJson
    assert(json.contains(""""kind":"create_datasets""""))
    assert(json.contains(""""num_datasets":2"""))
    assert(json.contains("create_datasets_timestamp_begin"))
    assert(r.endMicros >= r.beginMicros)
    assert(Files.exists(Paths.get(s"$work/ds1/rootfs")))
  }
}
