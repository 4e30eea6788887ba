package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Path parsing semantics pinned to the reference
  * (crates/cdl-fs/src/lib.rs:192-240,343-373): s3/s3a aliasing, empty
  * dataset-name rejection, local paths, table URI layout. */
class GlobalPathSpec extends AnyFunSuite {

  test("s3 URI parses with dataset name and relative path") {
    val p = GlobalPath.parse("s3://ds1/a/b").toOption.get
    assert(p.dataset == DatasetPath(Scheme.S3, "ds1"))
    assert(p.relPath == "a/b")
  }

  test("s3a is an alias of s3") {
    val a = GlobalPath.parse("s3a://ds1/x").toOption.get
    val b = GlobalPath.parse("s3://ds1/x").toOption.get
    assert(a == b)
  }

  test("trailing slash is normalized") {
    assert(GlobalPath.parse("s3a://ds1/").toOption.get.relPath == "")
  }

  test("empty dataset name is rejected") {
    assert(GlobalPath.parse("s3://").isLeft)
    assert(GlobalPath.parse("s3:///x").isLeft)
  }

  test("bare local path parses as Local scheme") {
    val p = GlobalPath.parse("/data/dir").toOption.get
    assert(p.dataset.scheme == Scheme.Local)
    assert(p.localPath == "/data/dir")
  }

  test("file:// URI parses as Local") {
    val p = GlobalPath.parse("file:///data/dir").toOption.get
    assert(p.dataset.scheme == Scheme.Local)
    assert(p.dataset.name == "/data/dir")
  }

  test("unsupported scheme errors") {
    assert(GlobalPath.parse("hdfs://x/y").isLeft)
  }

  test("registered Hadoop schemes parse path-style and round-trip the URI") {
    assert(GlobalPath.parse("xfs://h/p").isLeft) // not registered yet
    Scheme.registerHadoopScheme("xfs")
    val p = GlobalPath.parse("xfs://host/data/ds1/").toOption.get
    assert(p.dataset.scheme == Scheme.Hadoop("xfs"))
    assert(p.dataset.name == "host/data/ds1")
    assert(p.dataset.tableUri == "xfs://host/data/ds1/rootfs")
    assert(!p.isLocal)
    assert(GlobalPath.parse("xfs://").isLeft) // empty name still rejected
  }

  test("S3 table lives at <bucket>/rootfs (DIR_ROOTFS)") {
    val p = GlobalPath.parse("s3://ds1/").toOption.get
    assert(p.dataset.tableUri == "s3a://ds1/rootfs")
  }
}
