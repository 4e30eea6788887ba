package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Catalog defaults + merge semantics pinned to the reference
  * (crates/cdl-catalog/src/lib.rs:149-226). */
class CatalogSpec extends AnyFunSuite {

  test("defaults match the reference") {
    val c = DatasetCatalog()
    assert(c.maxBufferSize == (1L << 30))
    assert(c.maxCacheSize == (32L << 30))
    assert(c.maxChunkSize == 0L)
    assert(c.maxWriteThreads == 2)
    assert(c.minCacheObjectSize == (64L << 20))
    assert(c.s3Endpoint == "http://object-storage")
    assert(c.s3Region == "auto")
  }

  test("kwargs merge overrides (the Python Cdl(**catalog) path)") {
    val c = DatasetCatalog.fromMap(Map(
      "max_chunk_size" -> "1024",
      "s3_endpoint" -> "http://localhost:9000",
      "s3_access_key" -> "abcdefgh12345678")).toOption.get
    assert(c.maxChunkSize == 1024L)
    assert(c.s3Endpoint == "http://localhost:9000")
    assert(c.s3AccessKey.contains("abcdefgh12345678"))
    assert(c.maxBufferSize == (1L << 30)) // untouched default
  }

  test("unknown key errors (strict merge)") {
    assert(DatasetCatalog.fromMap(Map("bogus_key" -> "1")).isLeft)
  }

  test("non-numeric value for a numeric key is a Left naming the key, not a throw") {
    val e = DatasetCatalog.fromMap(Map("max_buffer_size" -> "1e9"))
    assert(e.isLeft && e.swap.exists(_.contains("max_buffer_size")), e)
  }

  test("storageOptions exports S3A config") {
    val c = DatasetCatalog(s3AccessKey = Some("k"), s3SecretKey = Some("s"))
    val o = c.storageOptions
    assert(o("fs.s3a.endpoint") == "http://object-storage")
    assert(o("fs.s3a.path.style.access") == "true")
    assert(o("fs.s3a.access.key") == "k")
    assert(o("fs.s3a.secret.key") == "s")
  }
}
