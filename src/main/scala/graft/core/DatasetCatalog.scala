package graft.core

/** Engine configuration, mirroring the reference catalog's fields and
  * defaults (reference: crates/cdl-catalog/src/lib.rs:34-226) and its
  * merge-from-map constructor path (`DatasetCatalog::merge`, :211-226).
  *
  * Scale note: these knobs are per-writer bounds — `maxBufferSize` caps
  * bytes buffered before a flush (reference default 1 GiB), `maxChunkSize`
  * splits large binary payloads into multiple rows so no single Spark row
  * exceeds executor memory / the 2 GiB array ceiling. The default 0 keeps
  * the reference's one-row-per-file semantics, but ingest still applies a
  * 256 MiB safety chunk to oversized files (`Ingest.SafetyChunkSize`) —
  * documented divergence (SURVEY §7.4.1).
  */
final case class DatasetCatalog(
    cacheDir: String = "./cache",
    maxBufferSize: Long = 1L << 30,         // 1 GiB
    maxCacheSize: Long = 32L << 30,         // 32 GiB
    maxChunkSize: Long = 0L,                // 0 = chunking disabled (ref default)
    maxWriteThreads: Int = 2,
    minCacheObjectSize: Long = 64L << 20,   // 64 MiB
    s3Endpoint: String = "http://object-storage",
    s3Region: String = "auto",
    s3AccessKey: Option[String] = None,
    s3SecretKey: Option[String] = None
) {

  /** Merge string kwargs (the Python `Cdl(**catalog)` path). Unknown keys
    * error, matching the reference's strict merge. */
  def merge(kwargs: Map[String, String]): Either[String, DatasetCatalog] =
    kwargs.foldLeft[Either[String, DatasetCatalog]](Right(this)) {
      case (acc, (k, v)) =>
        // numeric parses go through the Either contract too — a raw
        // NumberFormatException would bypass the error path the strict
        // merge promises, and without naming the offending KEY
        def num[T](parse: String => T)(set: T => DatasetCatalog) =
          try Right(set(parse(v)))
          catch {
            case _: NumberFormatException =>
              Left(s"catalog key $k needs an integer value, got: $v")
          }
        acc.flatMap { c =>
          k match {
            case "cache_dir"             => Right(c.copy(cacheDir = v))
            case "max_buffer_size"       => num(_.toLong)(x => c.copy(maxBufferSize = x))
            case "max_cache_size"        => num(_.toLong)(x => c.copy(maxCacheSize = x))
            case "max_chunk_size"        => num(_.toLong)(x => c.copy(maxChunkSize = x))
            case "max_write_threads"     => num(_.toInt)(x => c.copy(maxWriteThreads = x))
            case "min_cache_object_size" => num(_.toLong)(x => c.copy(minCacheObjectSize = x))
            case "s3_endpoint"           => Right(c.copy(s3Endpoint = v))
            case "s3_region"             => Right(c.copy(s3Region = v))
            case "s3_access_key"         => Right(c.copy(s3AccessKey = Some(v)))
            case "s3_secret_key"         => Right(c.copy(s3SecretKey = Some(v)))
            case other                   => Left(s"unknown catalog key: $other")
          }
        }
    }

  /** Hadoop/S3A conf equivalent of the reference's `storage_options`
    * (crates/cdl-catalog/src/lib.rs:257-293): endpoint, region, creds,
    * path-style access, no EC2 metadata lookups. */
  def storageOptions: Map[String, String] = {
    val base = Map(
      "fs.s3a.endpoint" -> s3Endpoint,
      "fs.s3a.endpoint.region" -> s3Region,
      "fs.s3a.path.style.access" -> "true",
      "fs.s3a.readahead.range" -> maxBufferSize.toString,
      // the reference's writer-concurrency knob (its pipelined uploader's
      // thread pool) maps to S3A's upload thread pool per writer task
      "fs.s3a.threads.max" -> maxWriteThreads.toString,
      // the reference's 1 GiB pre-flush buffer maps to the multipart part
      // size: bytes buffered per upload part before a flush to the store
      "fs.s3a.multipart.size" -> maxBufferSize.toString
    )
    base ++
      s3AccessKey.map("fs.s3a.access.key" -> _) ++
      s3SecretKey.map("fs.s3a.secret.key" -> _)
  }
}

object DatasetCatalog {
  def fromMap(kwargs: Map[String, String]): Either[String, DatasetCatalog] =
    DatasetCatalog().merge(kwargs)
}
