package graft.core

/** Dataset addressing: `scheme://dataset-name/relative/path`.
  *
  * Mirrors the reference's `GlobalPath = DatasetPath{scheme,name} + relpath`
  * semantics (reference: crates/cdl-fs/src/lib.rs:192-373): schemes `local`
  * and `s3` (with `s3a` accepted as an alias of `s3`), empty dataset names
  * rejected, and an S3 dataset materializing its table at
  * `<scheme>://<name>/rootfs`.
  */
sealed trait Scheme { def uriScheme: String }
object Scheme {
  case object Local extends Scheme { val uriScheme = "file" }
  case object S3 extends Scheme { val uriScheme = "s3a" }

  /** Beyond-reference: any OTHER Hadoop filesystem scheme (hdfs, abfs,
    * gs, a test scheme…), opt-in via `registerHadoopScheme` — mirroring
    * how Hadoop itself requires `fs.<scheme>.impl` registration. The
    * dataset name is everything after `scheme://` (authority included),
    * so the reconstructed URI is exactly what the connector expects. */
  final case class Hadoop(scheme: String) extends Scheme { def uriScheme: String = scheme }

  private val extraSchemes = scala.collection.concurrent.TrieMap.empty[String, Unit]
  def registerHadoopScheme(s: String): Unit = { extraSchemes.put(s.toLowerCase, ()); () }

  def parse(s: String): Either[String, Scheme] = s.toLowerCase match {
    case "local" | "file" | "" => Right(Local)
    case "s3" | "s3a"          => Right(S3)
    case other if extraSchemes.contains(other) => Right(Hadoop(other))
    case other                 => Left(s"unsupported scheme: $other")
  }
}

final case class DatasetPath(scheme: Scheme, name: String) {
  /** Table root URI; S3 datasets store their table under `<name>/rootfs`
    * (reference: crates/cdl-fs/src/lib.rs:343-352, DIR_ROOTFS at :898). */
  def tableUri: String = scheme match {
    case Scheme.S3        => s"s3a://$name/${GlobalPath.DirRootfs}"
    case Scheme.Hadoop(s) => s"$s://$name/${GlobalPath.DirRootfs}"
    case Scheme.Local     => name // local datasets are plain directories
  }
}

final case class GlobalPath(dataset: DatasetPath, relPath: String) {
  def isLocal: Boolean = dataset.scheme == Scheme.Local
  /** Absolute local path for Local scheme datasets. */
  def localPath: String =
    if (relPath.isEmpty) dataset.name else s"${dataset.name}/$relPath"
  override def toString: String = dataset.scheme match {
    case Scheme.Local => localPath
    case _ =>
      if (relPath.isEmpty) s"${dataset.scheme.uriScheme}://${dataset.name}/"
      else s"${dataset.scheme.uriScheme}://${dataset.name}/$relPath"
  }
}

object GlobalPath {
  val DirRootfs = "rootfs"

  /** Parse `s3://name/rel`, `s3a://name/rel`, `file:///abs`, or a bare local
    * path. Errors on empty dataset name (reference rejects `s3://`,
    * crates/cdl-fs/src/lib.rs:364-373). */
  def parse(s: String): Either[String, GlobalPath] = {
    val uriRe = "([A-Za-z0-9+.-]+)://(.*)".r
    s match {
      case uriRe(scheme, rest) =>
        Scheme.parse(scheme).flatMap {
          case Scheme.Local =>
            val p = rest.dropWhile(_ == '/')
            Right(GlobalPath(DatasetPath(Scheme.Local, "/" + p), ""))
          case Scheme.S3 =>
            val (name, rel) = rest.span(_ != '/')
            if (name.isEmpty) Left(s"empty dataset name in '$s'")
            else
              Right(
                GlobalPath(
                  DatasetPath(Scheme.S3, name),
                  rel.dropWhile(_ == '/').reverse.dropWhile(_ == '/').reverse))
          case h: Scheme.Hadoop =>
            // path-style: the whole remainder (authority + path) is the
            // dataset root, so `<scheme>://<name>` round-trips verbatim
            val name = rest.reverse.dropWhile(_ == '/').reverse
            if (name.isEmpty) Left(s"empty dataset name in '$s'")
            else Right(GlobalPath(DatasetPath(h, name), ""))
        }
      case local if local.nonEmpty =>
        Right(GlobalPath(DatasetPath(Scheme.Local, local), ""))
      case _ => Left("empty path")
    }
  }
}
