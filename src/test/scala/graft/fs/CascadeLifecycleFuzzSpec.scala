package graft.fs

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.core.{DatasetCatalog, GlobalPath}
import graft.ops.{IncrementalDedup, StoreFsck}
import org.apache.spark.sql.functions._

/** Seeded CROSS-COMPONENT lifecycle fuzzer (r17 verdict #5): the
  * single-store fuzzer drives one store through its own ops; the
  * highest-risk interleavings are a TABLE with attached stores under
  * mixed sequences of `deleteWhere(cascade)`, ingest appends, store
  * compaction, table compaction, a KILLED cascade arm (a sabotaged
  * store manifest — the arm throws mid-pool exactly like a crashed
  * executor), and `runCascadePending` resume. After every step the
  * model-checked invariant holds:
  *
  *   marker empty  ⇔  all arms done  ⇔  no retired id in ANY store
  *
  * plus: a live arm failure keeps EXACTLY the failed obligation in the
  * marker (healthy arms behind it still ran — takedown availability),
  * table content matches the model, and every healthy store deep-fscks
  * clean. A violation reports the seed and the step history to replay
  * it. File contents are unique per row so each store's live-id set
  * must equal the table's — the dedup-specific keeper semantics are the
  * single-store fuzzer's job; THIS fuzzer targets the cascade
  * obligation machinery. */
class CascadeLifecycleFuzzSpec extends SparkSuite {

  private final case class Step(kind: String, detail: String)

  private def drive(seed: Int, steps: Int): Unit = {
    val root = Files.createTempDirectory(s"cascfz_$seed").toString
    val fs = CdlFs.open(spark, DatasetCatalog(maxChunkSize = 4096),
      GlobalPath.parse(s"$root/ds").toOption.get)
    val exStore = s"$root/store_exact"
    val ngStore = s"$root/store_ngram"
    val stores = Seq(exStore, ngStore)
    val rnd = new scala.util.Random(seed)

    var nextFile = 0
    // model state
    var live = Map.empty[String, (Long, String)] // name -> (row_id, text)
    var retiredEver = Set.empty[Long]
    var owed = Set.empty[Long]                   // ids the sabotaged store owes
    var sabotaged: Option[String] = None         // store dir with broken manifest
    var origManifest = ""
    var hist = List.empty[Step]

    def ingestBatch(n: Int): Unit = {
      val dir = s"$root/fix_${nextFile}"
      Files.createDirectories(Paths.get(dir))
      val names = (0 until n).map { _ =>
        val name = s"d${nextFile}.txt"
        // unique per-row content: store live-ids must equal table's
        Files.write(Paths.get(s"$dir/$name"),
          s"unique content token${nextFile} for file ${nextFile}".getBytes)
        nextFile += 1
        name
      }
      Ingest.run(fs, dir)
      fs.refresh()
      names.foreach { name =>
        val r = fs.table.filter(col("name") === name)
          .select(col("row_id"), col("data").cast("string")).collect().head
        live += name -> (r.getLong(0), r.getString(1))
      }
    }

    def rebatchStores(): Unit = {
      val docs = fs.table.select(col("row_id").as("doc_id"),
        col("data").cast("string").as("text"))
      // full-table rebatch is idempotent per store (novelty anti-joins)
      if (!sabotaged.contains(exStore))
        IncrementalDedup.exactBatch(docs, exStore).collect()
      if (!sabotaged.contains(ngStore))
        IncrementalDedup.ngramBatch(docs, ngStore, n = 3).collect()
    }

    def storeIds(dir: String): Set[Long] = {
      val idCol = if (dir == exStore) "keep_doc_id" else "doc_id"
      val p = new org.apache.hadoop.fs.Path(dir)
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasData = hfs.exists(p) &&
        hfs.listStatus(p).exists(_.getPath.getName.startsWith("bp="))
      if (!hasData) Set.empty
      else spark.read.parquet(dir)
        .select(idCol).distinct().collect().map(_.getLong(0)).toSet
    }

    def sabotage(dir: String): Unit = {
      val mp = Paths.get(s"$dir/_graft_store.json")
      origManifest = new String(Files.readAllBytes(mp), "UTF-8")
      Files.write(mp, origManifest.replaceFirst(
        "\"variant\":\"[a-z]+\"", "\"variant\":\"bogus\"").getBytes("UTF-8"))
      sabotaged = Some(dir)
    }

    def heal(): Unit = sabotaged.foreach { dir =>
      Files.write(Paths.get(s"$dir/_graft_store.json"),
        origManifest.getBytes("UTF-8"))
      sabotaged = None
    }

    def invariant(step: Int): Unit = {
      val ctx = s"seed=$seed step=$step\nhistory=${hist.reverse}"
      // table matches the model
      val names = fs.table.select("name").distinct().collect()
        .map(_.getString(0)).toSet
      assert(names == live.keySet, s"table names $names != model: $ctx")
      // marker holds EXACTLY the sabotaged store's obligation (if owed)
      val pending = fs.cascadePendingStores.toSet
      if (owed.nonEmpty)
        assert(pending == sabotaged.toSet,
          s"marker $pending != owed store ${sabotaged.toSet}: $ctx")
      else
        assert(pending.isEmpty, s"marker nonempty with nothing owed: $ctx")
      stores.foreach { d =>
        val isSab = sabotaged.contains(d)
        val ids = storeIds(d)
        // retired ids absent from every store, EXCEPT the ids a killed
        // arm still owes (those and only those may linger there)
        val allowed = if (isSab) owed else Set.empty[Long]
        val leftovers = ids.intersect(retiredEver) -- allowed
        assert(leftovers.isEmpty,
          s"$d holds retired ids $leftovers: $ctx")
        // live coverage: after a rebatch every live id is present
        // (unique contents: keeper == its own row). A sabotaged store
        // missed rebatches, so only check healthy stores.
        if (!isSab) {
          val missing = live.values.map(_._1).toSet -- ids
          assert(missing.isEmpty, s"$d missing live ids $missing: $ctx")
          val f = StoreFsck.fsck(spark, d, deep = true)
          assert(f.isEmpty, s"$d fsck dirty: $f\n$ctx")
        }
      }
    }

    // bootstrap: table + both stores
    ingestBatch(3)
    rebatchStores()
    fs.attachStore(exStore, idCol = "row_id")
    fs.attachStore(ngStore, idCol = "row_id")
    invariant(0)

    for (step <- 1 to steps) {
      rnd.nextInt(6) match {
        case 0 | 1 => // ingest append + store rebatch
          val n = 1 + rnd.nextInt(2)
          hist ::= Step("append", s"$n files")
          ingestBatch(n)
          rebatchStores()
        case 2 if live.nonEmpty => // cascaded delete of one file
          val name = rnd.shuffle(live.keys.toList).head
          val (rid, _) = live(name)
          hist ::= Step("cascade-delete", s"$name (row $rid)")
          if (sabotaged.isEmpty) {
            assert(fs.deleteWhere(s"name = '$name'", cascade = true) >= 1L)
          } else {
            // killed arm: the sabotaged store's arm throws mid-pool;
            // the table delete still commits and healthy arms still run
            intercept[RuntimeException] {
              fs.deleteWhere(s"name = '$name'", cascade = true)
            }
            owed += rid
          }
          live -= name
          retiredEver += rid
        case 2 => // nothing to delete
          hist ::= Step("append", "1 file (nothing live to delete)")
          ingestBatch(1); rebatchStores()
        case 3 if sabotaged.isEmpty && rnd.nextBoolean() =>
          val victim = stores(rnd.nextInt(stores.size))
          hist ::= Step("sabotage", victim)
          sabotage(victim)
        case 3 if sabotaged.nonEmpty => // heal + resume the killed arm
          hist ::= Step("heal+resume", sabotaged.get)
          heal()
          val done = fs.runCascadePending()
          if (owed.nonEmpty) assert(done.nonEmpty,
            s"resume ran nothing with ${owed.size} ids owed")
          owed = Set.empty
          rebatchStores() // catch the store up on missed appends
        case 3 => hist ::= Step("noop", "")
        case 4 => // store compaction (healthy stores only)
          hist ::= Step("compact-stores", "")
          stores.filterNot(sabotaged.contains)
            .foreach(d => IncrementalDedup.compactStore(spark, d))
        case 5 => // table compaction
          hist ::= Step("compact-table", "")
          fs.compact()
      }
      invariant(step)
    }
    // closing discipline: heal + resume, then the full invariant —
    // "marker empty ⇔ all arms done ⇔ no retired id in any store"
    if (sabotaged.nonEmpty) {
      hist ::= Step("final-heal", sabotaged.get)
      heal()
      fs.runCascadePending()
      owed = Set.empty
      rebatchStores()
    }
    invariant(steps + 1)
    assert(fs.cascadePendingStores.isEmpty)
    assert(fs.runCascadePending().isEmpty) // idempotent when clean
    stores.foreach { d =>
      assert(storeIds(d).intersect(retiredEver).isEmpty, s"$d leftovers")
      val f = StoreFsck.fsck(spark, d, deep = true)
      assert(f.isEmpty, s"final fsck dirty on $d: $f")
    }
  }

  test("cascade lifecycle: seeded table+stores interleavings hold the obligation invariant") {
    for (seed <- Seq(1101, 2202)) drive(seed, 10)
  }
}
