package graft.ops

import java.nio.file.Files

import graft.SparkSuite

/** Rename-less-scheme contract for the data-swap fences (r16 verdict #1,
  * the round's one `weak`): the retraction/delete/compact swap fences
  * assume `FileSystem.rename` is atomic, which object-store schemes
  * don't provide (copy+delete exposes partially copied partitions to
  * lock-free readers). The contract: mutations FAIL LOUDLY on such
  * schemes unless the operator quiesces readers and sets the override —
  * and under the override the swap still commits correctly (roll-forward
  * is rename-count-agnostic; only the concurrent-reader guarantee is
  * waived). Single-file sidecars (the `_retract_epoch` counter) publish
  * via direct overwrite-PUT on these schemes — no temp corpses, no
  * absent window. The `mock://` scheme (RawLocalFileSystem-backed, so
  * behavior is real) classifies as rename-less by name — exactly like
  * s3a would. */
class SwapFenceContractSpec extends SparkSuite {

  import spark.implicits.newProductEncoder
  import spark.implicits.localSeqToDatasetHolder

  private def conf = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mock.impl", classOf[graft.fs.MockRemoteFileSystem].getName)
    spark.sparkContext.hadoopConfiguration
  }

  test("retraction on a rename-less scheme fails loudly, names the fix, and stages nothing") {
    val c = conf
    val local = Files.createTempDirectory("swapfence_gate").toString
    val dir = s"mock://$local/store"
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    // creation/appends are plain parquet writes — NOT gated (no swap)
    IncrementalDedup.exactBatch(docs, dir).collect()
    val e = intercept[IllegalStateException] {
      Retract.retract(spark, dir, Seq(1L))
    }
    assert(e.getMessage.contains("atomic"), e.getMessage)
    assert(e.getMessage.contains(graft.fs.AtomicRename.OverrideKey),
      e.getMessage)
    // gated BEFORE staging: no tmp dir, no marker, store intact
    val names = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$local/store")).toArray.map(_.toString)
    assert(!names.exists(_.contains("_retract_tmp")), names.mkString(","))
    assert(!names.exists(_.contains("_retract_pending")), names.mkString(","))
    assert(spark.read.parquet(dir).count() == 2L) // 1 keeper per digest + gamma
  }

  test("override (quiesced readers) retracts correctly; epoch publishes by direct PUT") {
    val c = conf
    val local = Files.createTempDirectory("swapfence_override").toString
    val dir = s"mock://$local/store"
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    IncrementalDedup.exactBatch(docs, dir).collect()
    c.setBoolean(graft.fs.AtomicRename.OverrideKey, true)
    try {
      assert(Retract.retract(spark, dir, Seq(1L)) >= 1L)
      // the retired keeper is gone; the survivor's rows intact
      val left = spark.read.parquet(dir)
        .select("keep_doc_id").collect().map(_.getLong(0)).toSet
      assert(!left.contains(1L) && left.contains(3L), left.toString)
      // epoch sidecar: present, parseable, and published WITHOUT a
      // rename (direct overwrite-PUT on rename-less schemes) — so no
      // .tmp corpses and no absent window for readers
      val ep = java.nio.file.Paths.get(s"$local/store/_retract_epoch")
      assert(java.nio.file.Files.exists(ep))
      assert(new String(java.nio.file.Files.readAllBytes(ep)).trim.toLong >= 1L)
      val corpses = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$local/store")).toArray.map(_.toString)
        .filter(_.contains("_retract_epoch.tmp-"))
      assert(corpses.isEmpty, corpses.mkString(","))
    } finally c.unset(graft.fs.AtomicRename.OverrideKey)
  }

  test("store compaction is gated on a rename-less scheme; override compacts correctly") {
    val c = conf
    val local = Files.createTempDirectory("swapfence_compact").toString
    val dir = s"mock://$local/store"
    // two appends fragment the store (two files per touched partition)
    IncrementalDedup.exactBatch(Seq((1L, "alpha")).toDF("doc_id", "text"), dir)
      .collect()
    IncrementalDedup.exactBatch(Seq((2L, "beta")).toDF("doc_id", "text"), dir)
      .collect()
    val e = intercept[IllegalStateException] {
      IncrementalDedup.compactStore(spark, dir)
    }
    assert(e.getMessage.contains("atomic"), e.getMessage)
    c.setBoolean(graft.fs.AtomicRename.OverrideKey, true)
    try {
      IncrementalDedup.compactStore(spark, dir)
      // rows intact after the non-atomic-rename swap (readers quiesced)
      assert(spark.read.parquet(dir)
        .select("keep_doc_id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L))
    } finally c.unset(graft.fs.AtomicRename.OverrideKey)
  }

  test("heal of an already-committed marker is never gated (roll-forward always finishes)") {
    val c = conf
    val local = Files.createTempDirectory("swapfence_heal").toString
    val dir = s"mock://$local/store"
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    IncrementalDedup.exactBatch(docs, dir).collect()
    // simulate a crash AFTER the marker commit on this scheme (a prior
    // overridden run): a drop-line marker for a partition we fabricate
    val root = java.nio.file.Paths.get(s"$local/store")
    val bogus = java.nio.file.Files.list(root).toArray.map(_.toString)
      .filter(_.contains("bp=")).head
    val bpName = java.nio.file.Paths.get(bogus).getFileName.toString
    java.nio.file.Files.write(root.resolve("_retract_pending"),
      s"drop:$bpName".getBytes)
    // sweep (via the next locked read inside a batch) must finish the
    // swap even though the scheme is rename-less and NO override is set
    IncrementalDedup.exactBatch(Seq((9L, "nu")).toDF("doc_id", "text"), dir)
      .collect()
    assert(!java.nio.file.Files.exists(root.resolve("_retract_pending")))
    assert(!java.nio.file.Files.exists(root.resolve(bpName)))
  }
}
