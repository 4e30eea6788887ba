package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the chunk closed form against the reference loop
  * semantics (crates/cdl-fs/src/lib.rs:666-697). Seeded manual generator
  * (the scalatest/scalacheck bridge isn't in the offline dep cache). */
class ChunkSpec extends AnyFunSuite {

  test("chunking disabled (max=0) yields one chunk of full size") {
    assert(RootFs.chunkLayout(12345, 0) == Seq((0L, 0L, 12345L)))
  }

  test("empty file yields a single zero-size chunk") {
    assert(RootFs.chunkLayout(0, 1024) == Seq((0L, 0L, 0L)))
  }

  test("exact multiple boundary: size == max -> 1 chunk") {
    assert(RootFs.chunkLayout(1024, 1024) == Seq((0L, 0L, 1024L)))
  }

  test("2.5x max -> 3 chunks with remainder tail") {
    assert(RootFs.chunkLayout(2560, 1024) ==
      Seq((0L, 0L, 1024L), (1L, 1024L, 1024L), (2L, 2048L, 512L)))
  }

  test("invariants: contiguous offsets, sizes sum to size, count = ceil") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val size = rnd.nextLong(1000000L)
      val max = 1L + rnd.nextLong(65536L)
      val layout = RootFs.chunkLayout(size, max)
      assert(layout.map(_._3).sum == size, s"size=$size max=$max")
      assert(layout.head._2 == 0L)
      layout.sliding(2).foreach {
        case Seq((_, o1, s1), (_, o2, _)) => assert(o2 == o1 + s1)
        case _ =>
      }
      val expectedCount = if (size == 0) 1 else (size + max - 1) / max
      assert(layout.size == expectedCount, s"size=$size max=$max")
      assert(layout.zipWithIndex.forall { case ((id, _, _), i) => id == i })
      assert(layout.forall(_._3 <= max), s"chunk exceeds max: size=$size max=$max")
    }
  }
}
