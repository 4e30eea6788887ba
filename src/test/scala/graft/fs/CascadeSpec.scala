package graft.fs

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.core.{DatasetCatalog, GlobalPath}
import graft.ops.IncrementalDedup
import org.apache.spark.sql.functions._

/** Cascaded takedown (r14 verdict #1): the `_graft_stores.json`
  * registry ties a table to its derived stores, and ONE
  * `deleteWhere(cond, cascade = true)` retracts the retired row ids
  * from every attached store — with the obligation durable from the
  * delete's own commit marker, shrinking per completed store, and
  * resumable after any partial failure. */
class CascadeSpec extends SparkSuite {

  private def freshFs(tag: String): (CdlFs, String) = {
    val root = Files.createTempDirectory(s"casc-$tag").toString
    val fixture = s"$root/fixture"
    Files.createDirectories(Paths.get(s"$fixture/keepdir"))
    Files.createDirectories(Paths.get(s"$fixture/purgedir"))
    Files.write(Paths.get(s"$fixture/keepdir/a.txt"), "keep alpha words".getBytes)
    Files.write(Paths.get(s"$fixture/keepdir/b.txt"), "keep beta words".getBytes)
    Files.write(Paths.get(s"$fixture/purgedir/s1.txt"), "purge gamma words".getBytes)
    Files.write(Paths.get(s"$fixture/purgedir/s2.txt"), "purge delta words".getBytes)
    val f = CdlFs.open(spark, DatasetCatalog(maxChunkSize = 1024),
      GlobalPath.parse(s"$root/ds").toOption.get)
    Ingest.run(f, fixture)
    (f, root)
  }

  /** Build an exact-dedup store over the table's rows keyed by row_id. */
  private def buildStore(fs: CdlFs, dir: String): Unit = {
    IncrementalDedup.exactBatch(
      fs.table.select(col("row_id").as("doc_id"),
        col("data").cast("string").as("text")), dir)
    ()
  }

  test("cascade arms run CONCURRENTLY: two store locks observed held at once") {
    // r16 verdict #2: N attached stores used to pay sum-of-walls while
    // each arm was independent. The witness is lock overlap — each arm
    // holds ITS store's lock for the whole retraction, so serial arms
    // can never show two live holders, while the bounded pool shows
    // them within milliseconds of the cascade starting.
    val (fs, root) = freshFs("conc")
    val s1 = s"$root/store1"; val s2 = s"$root/store2"; val s3 = s"$root/store3"
    buildStore(fs, s1); buildStore(fs, s2); buildStore(fs, s3)
    fs.attachStore(s1); fs.attachStore(s2); fs.attachStore(s3)
    val conf = spark.sparkContext.hadoopConfiguration
    @volatile var maxLive = 0
    val sampler = new Thread(() => {
      val deadline = System.currentTimeMillis() + 60000L
      while (System.currentTimeMillis() < deadline && maxLive < 2) {
        val live = Seq(s1, s2, s3).count(d =>
          StoreLock.holder(d, conf).isDefined)
        if (live > maxLive) maxLive = live
        Thread.sleep(5L)
      }
    })
    val retired = fs.table.filter(col("parent") === "/purgedir")
      .select("row_id").collect().map(_.getLong(0)).toSeq
    sampler.start()
    assert(fs.deleteWhere("parent = '/purgedir'", cascade = true) == 2L)
    sampler.join(65000)
    assert(maxLive >= 2,
      s"never observed two concurrent cascade arms (max live locks $maxLive)")
    // correctness unchanged by the concurrency: nothing owed, stores clean
    assert(fs.cascadePendingStores.isEmpty)
    Seq(s1, s2, s3).foreach { d =>
      assert(spark.read.parquet(d)
        .filter(col("keep_doc_id").isin(retired: _*)).count() == 0L, d)
    }
    assert(fs.table.filter(col("parent") === "/purgedir").count() == 0L)
  }

  test("registry: attach/detach round-trips and persists across reopen") {
    val (fs, root) = freshFs("reg")
    val s1 = s"$root/store1"; val s2 = s"$root/store2"
    buildStore(fs, s1); buildStore(fs, s2)
    fs.attachStore(s1)
    fs.attachStore(s2, idCol = "row_id")
    assert(fs.attachedStores == Seq(s1 -> "row_id", s2 -> "row_id"))
    fs.attachStore(s1, idCol = "chunk_id") // re-attach updates in place
    assert(fs.attachedStores.toMap == Map(s1 -> "chunk_id", s2 -> "row_id"))
    val reopened = CdlFs.open(spark, DatasetCatalog(),
      GlobalPath.parse(s"$root/ds").toOption.get)
    assert(reopened.attachedStores.toMap ==
      Map(s1 -> "chunk_id", s2 -> "row_id"))
    assert(fs.detachStore(s1) && !fs.detachStore(s1))
    assert(fs.attachedStores == Seq(s2 -> "row_id"))
    // attaching a non-store fails loudly
    val e = intercept[IllegalArgumentException] {
      fs.attachStore(s"$root/fixture")
    }
    assert(e.getMessage.contains("not a graft store"))
    val e2 = intercept[IllegalArgumentException] {
      fs.attachStore(s1, idCol = "no_such_col")
    }
    assert(e2.getMessage.contains("not a rootfs column"))
  }

  test("one cascaded delete leaves the docs in NO attached store scan") {
    val (fs, root) = freshFs("basic")
    val s1 = s"$root/store_exact"; val s2 = s"$root/store_minhash"
    buildStore(fs, s1)
    IncrementalDedup.minhashBatch(
      fs.table.select(col("row_id").as("doc_id"),
        col("data").cast("string").as("text")), s2)
    fs.attachStore(s1); fs.attachStore(s2)
    val retired = fs.table.filter(col("parent") === "/purgedir")
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(retired.size == 2)
    val deleted = fs.deleteWhere("parent = '/purgedir'", cascade = true)
    assert(deleted == 2)
    // table rows gone AND every attached store scan is clean of the ids
    assert(fs.table.filter(col("parent") === "/purgedir").count() == 0)
    assert(spark.read.parquet(s1)
      .filter(col("keep_doc_id").isin(retired.toSeq: _*)).count() == 0)
    assert(spark.read.parquet(s2)
      .filter(col("doc_id").isin(retired.toSeq: _*)).count() == 0)
    // untouched content survives in both stores
    assert(spark.read.parquet(s1).count() == 2)
    // no obligation left behind
    assert(fs.cascadePendingStores.isEmpty)
    // a cascade with nothing attached is a plain delete
    assert(fs.deleteWhere("parent = '/nowhere'", cascade = true) == 0)
  }

  test("partial failure: marker shrinks per store, resumes, merges") {
    val (fs, root) = freshFs("partial")
    val good = s"$root/good"; val bad = s"$root/bad"
    buildStore(fs, good); buildStore(fs, bad)
    fs.attachStore(bad); fs.attachStore(good) // bad first: fails the run
    // sabotage AFTER attach: unknown variant makes its retraction throw
    val manifest = Paths.get(s"$bad/_graft_store.json")
    val origManifest = new String(Files.readAllBytes(manifest), "UTF-8")
    Files.write(manifest, origManifest
      .replace("\"exact\"", "\"bogus\"").getBytes("UTF-8"))
    val retired1 = fs.table.filter(col("name") === "s1.txt")
      .select("row_id").collect().map(_.getLong(0)).toSet
    intercept[RuntimeException] {
      fs.deleteWhere("name = 's1.txt'", cascade = true)
    }
    // the TABLE delete committed; the broken store is SKIPPED but the
    // healthy one behind it still ran (takedown availability) — only
    // the failed obligation stays in the marker
    assert(fs.table.filter(col("name") === "s1.txt").count() == 0)
    assert(fs.cascadePendingStores == Seq(bad))
    assert(spark.read.parquet(good)
      .filter(col("keep_doc_id").isin(retired1.toSeq: _*)).count() == 0)
    // a second cascaded delete must NOT be blocked by the broken store:
    // its table delete commits, its ids MERGE into the pending marker
    // (for the bad store) and retract from the good one immediately
    val retired2 = fs.table.filter(col("name") === "s2.txt")
      .select("row_id").collect().map(_.getLong(0)).toSet
    intercept[RuntimeException] {
      fs.deleteWhere("name = 's2.txt'", cascade = true)
    }
    assert(fs.table.filter(col("name") === "s2.txt").count() == 0)
    assert(fs.cascadePendingStores == Seq(bad))
    assert(spark.read.parquet(good)
      .filter(col("keep_doc_id").isin(retired2.toSeq: _*)).count() == 0)
    // fix the sabotage and resume: the merged id batches leave it too
    Files.write(manifest, origManifest.getBytes("UTF-8"))
    val done = fs.runCascadePending()
    assert(done.map(_._1) == Seq(bad))
    val all = (retired1 ++ retired2).toSeq
    for (s <- Seq(good, bad))
      assert(spark.read.parquet(s)
        .filter(col("keep_doc_id").isin(all: _*)).count() == 0, s"store $s")
    assert(fs.cascadePendingStores.isEmpty)
    assert(fs.runCascadePending().isEmpty) // idempotent when clean
  }

  test("same store under two id columns: completing one keeps the other owed") {
    val (fs, root) = freshFs("twoids")
    val s = s"$root/store"; val bad = s"$root/nonexistent"
    buildStore(fs, s)
    val rids = fs.table.orderBy("row_id").select("row_id")
      .collect().map(_.getLong(0))
    val (rA, rB) = (rids(0), rids(1))
    // hand-build the marker shape a re-attach between two cascaded
    // deletes produces: the SAME store owed under two id columns, with
    // a failing store between them — completing the first (s, row_id)
    // must not drop (s, chunk_id) from the marker (the old
    // filterNot-by-dir shrink lost it, and a crash there lost the
    // takedown obligation permanently)
    Files.write(Paths.get(s"${fs.tableLocation}/.graft_cascade_pending"),
      (s"""{"ids":{"row_id":[$rA],"chunk_id":[$rB]},"stores":[""" +
        s"""{"dir":"$s","id_col":"row_id"},{"dir":"$bad","id_col":"row_id"},""" +
        s"""{"dir":"$s","id_col":"chunk_id"}]}""").getBytes("UTF-8"))
    intercept[RuntimeException] { fs.runCascadePending() }
    // BOTH same-dir obligations executed around the failing store (the
    // old filterNot-by-dir shrink dropped the second from the marker
    // the moment the first completed — a crash there lost it for good);
    // only the failed store stays owed
    assert(spark.read.parquet(s)
      .filter(col("keep_doc_id").isin(rA, rB)).count() == 0)
    assert(fs.cascadePendingStores == Seq(bad),
      s"marker obligations wrong: ${fs.cascadePendingStores}")
    buildStore(fs, bad) // "fix" the missing store
    val done = fs.runCascadePending()
    assert(done.map(_._1) == Seq(bad))
    assert(fs.cascadePendingStores.isEmpty)
  }

  test("crash in the marker swap window: the orphan tmp is adopted, not lost") {
    // r15 ADVICE: a crash between the HDFS-style delete and rename left
    // .graft_cascade_pending absent with the obligations stranded in a
    // .tmp-* file — the marker then read "clean" and the takedown never
    // completed. readCascadePending must adopt the newest aged tmp.
    val (fs, root) = freshFs("orphan")
    val s1 = s"$root/store1"
    buildStore(fs, s1)
    val rid = fs.table.limit(1).select("row_id").collect()(0).getLong(0)
    val body =
      s"""{"ids":{"row_id":[$rid]},"stores":[{"dir":"$s1","id_col":"row_id"}]}"""
    val stale = """{"ids":{"row_id":[]},"stores":[]}"""
    val loc = fs.tableLocation
    val newer = Paths.get(s"$loc/.graft_cascade_pending.tmp-99-2")
    val older = Paths.get(s"$loc/.graft_cascade_pending.tmp-99-1")
    Files.write(older, stale.getBytes("UTF-8"))
    Files.write(newer, body.getBytes("UTF-8"))
    // age both past the 5 s healthy-writer floor; make `newer` newest
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(older,
      java.nio.file.attribute.FileTime.fromMillis(now - 60000))
    Files.setLastModifiedTime(newer,
      java.nio.file.attribute.FileTime.fromMillis(now - 30000))
    assert(!Files.exists(Paths.get(s"$loc/.graft_cascade_pending")))
    // the read adopts the newest tmp as the live marker, sweeps the rest
    assert(fs.cascadePendingStores == Seq(s1))
    assert(Files.exists(Paths.get(s"$loc/.graft_cascade_pending")))
    assert(!Files.exists(newer) && !Files.exists(older))
    val done = fs.runCascadePending()
    assert(done.map(_._1) == Seq(s1))
    assert(fs.cascadePendingStores.isEmpty)
    // successful publishes sweep their own tmps — none left behind
    val leftover = Files.list(Paths.get(loc)).toArray.map(_.toString)
      .filter(_.contains(".graft_cascade_pending.tmp-"))
    assert(leftover.isEmpty, s"orphan tmps not swept: ${leftover.toSeq}")
  }

  test("shrink is an RMW vs the CURRENT marker: a concurrent merge survives") {
    // r15 ADVICE: runCascadePending's per-store shrink used to rewrite
    // the marker from the snapshot the run STARTED from — a cascaded
    // delete merging new ids concurrently was overwritten and its
    // obligations silently dropped. The locked RMW re-reads the live
    // marker: ids it lists that this run did NOT process keep the
    // obligation owed.
    val (fs, root) = freshFs("rmw")
    val s = s"$root/store"
    buildStore(fs, s)
    val rids = fs.table.orderBy("row_id").select("row_id")
      .collect().map(_.getLong(0))
    val (rA, rB) = (rids(0), rids(1))
    val loc = fs.tableLocation
    val rootP = new org.apache.hadoop.fs.Path(loc)
    val hfs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // live marker owes BOTH ids (rB is the concurrent merge this run's
    // snapshot never saw)
    Files.write(Paths.get(s"$loc/.graft_cascade_pending"),
      (s"""{"ids":{"row_id":[$rA,$rB]},"stores":[""" +
        s"""{"dir":"$s","id_col":"row_id"}]}""").getBytes("UTF-8"))
    // this run only processed rA → the obligation must stay owed
    fs.completeCascadeObligation(hfs, rootP, s, "row_id", Seq(rA))
    assert(fs.cascadePendingStores == Seq(s),
      "obligation with an unprocessed concurrent id was dropped")
    // processing the full current set clears it and deletes the marker
    fs.completeCascadeObligation(hfs, rootP, s, "row_id", Seq(rA, rB))
    assert(fs.cascadePendingStores.isEmpty)
    assert(!Files.exists(Paths.get(s"$loc/.graft_cascade_pending")))
  }

  test("attachStore verifyUnique proves the id column keys rows") {
    // r15 ADVICE: cascade retraction is only sound when idCol uniquely
    // keys rootfs rows — chunk_id (a per-file 0..n index) repeats across
    // files, so a cascaded delete keyed on it would retract ids still
    // owned by SURVIVING rows.
    val (fs, root) = freshFs("uniq")
    val s = s"$root/store"
    buildStore(fs, s)
    fs.attachStore(s, idCol = "row_id", verifyUnique = true) // unique: fine
    val e = intercept[IllegalArgumentException] {
      fs.attachStore(s, idCol = "chunk_id", verifyUnique = true)
    }
    assert(e.getMessage.contains("does not uniquely key"))
    // the failed attach must not have clobbered the registry entry
    assert(fs.attachedStores == Seq(s -> "row_id"))
  }

  test("delete-marker hand-off: the #cascade trailer survives a crash") {
    val (fs, root) = freshFs("handoff")
    val s1 = s"$root/store1"
    buildStore(fs, s1)
    val retired = fs.table.filter(col("parent") === "/purgedir")
      .select("row_id").collect().map(_.getLong(0)).toSeq
    // manufacture a crash AFTER the delete's commit-point marker was
    // written but before finishDelete ran: a marker with no sources
    // left to retire and the cascade trailer (the table swap itself is
    // DeleteSpec's ground; this pins the obligation hand-off)
    val trailer = s"""#cascade {"ids":{"row_id":[${retired.mkString(",")}]},""" +
      s""""stores":[{"dir":"$s1","id_col":"row_id"}]}"""
    Files.write(Paths.get(s"${fs.tableLocation}/.graft_delete_pending"),
      trailer.getBytes("UTF-8"))
    // open sweeps the delete marker FORWARD: the obligation must move to
    // the cascade marker, not vanish with the delete marker
    val reopened = CdlFs.open(spark, DatasetCatalog(),
      GlobalPath.parse(s"$root/ds").toOption.get)
    assert(!Files.exists(Paths.get(s"${fs.tableLocation}/.graft_delete_pending")))
    assert(reopened.cascadePendingStores == Seq(s1))
    val done = reopened.runCascadePending()
    assert(done.map(_._1) == Seq(s1) && done.head._2 == retired.size)
    assert(spark.read.parquet(s1)
      .filter(col("keep_doc_id").isin(retired: _*)).count() == 0)
    assert(reopened.cascadePendingStores.isEmpty)
  }
}
