package graft.ops

import graft.SparkSuite

/** Min-label-propagation connected components on planted graphs. */
class ComponentsSpec extends SparkSuite {

  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
    Components.ofPairs(pairs.toDF("doc_a", "doc_b"), maxIter = maxIter)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("component")).toMap

  test("chain, clique, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21};
    // vertex 99 appears in no pair -> absent (singletons need no label)
    val got = labelsOf(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)))
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("cycles converge (no infinite propagation)") {
    val got = labelsOf(Seq((5L, 6L), (6L, 7L), (7L, 5L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("min id in the middle of a chain still labels the whole chain") {
    // 9-7-1-8-6: the min (1) must reach both endpoints
    val got = labelsOf(Seq((9L, 7L), (7L, 1L), (1L, 8L), (8L, 6L)))
    assert(got.values.toSet == Set(1L))
  }

  test("maxIter too small for the diameter throws instead of mislabeling") {
    val chain = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
    intercept[IllegalStateException] { labelsOf(chain, maxIter = 2) }
    // and with room to converge the same chain is fine
    assert(labelsOf(chain).values.toSet == Set(1L))
  }

  test("reliable checkpointing yields the same labels as localCheckpoint") {
    // multi-round graph (chain of diameter 7 + a clique) so several
    // checkpoint rounds actually execute through the reliable path
    val edges = (1L to 8L).sliding(2).map(s => (s.head, s.last)).toSeq ++
      Seq((50L, 51L), (51L, 52L), (50L, 52L))
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    try {
      val default = labelsOf(edges)
      val reliable = Components.ofPairs(
        edges.toDF("doc_a", "doc_b"), checkpointDir = Some(dir))
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("component")).toMap
      assert(reliable == default)
      // the reliable path really wrote checkpoint data to the shared dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "no reliable checkpoint files written")
      // superseded rounds are deleted as the fixpoint advances: after a
      // multi-round run only the FINAL label table remains (the store
      // must not grow by one table per round per job)
      val tables = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("labels-")).map(_.getName).toSeq
      assert(tables.size == 1, s"leftover checkpoint tables: $tables")
      // and the session's global checkpoint dir was never clobbered
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
    }
  }

  test("random graphs match a union-find reference (differential)") {
    // deterministic sparse random graphs: mixed cliques, chains, and
    // isolated edges emerge naturally at low edge density
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nVertices = 300
      val nEdges = 250 + trial * 50
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nVertices).toLong, rnd.nextInt(nVertices).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(v => v -> find(v)).toMap
      val got = labelsOf(edges)
      assert(got == want, s"trial $trial")
    }
  }
}
