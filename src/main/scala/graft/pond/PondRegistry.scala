package graft.pond

import org.apache.spark.sql.SparkSession

import graft.core.DatasetCatalog

/** Control-plane semantics re-expressed as a metadata module + Spark batch
  * jobs (SURVEY §2.6): storage "ponds", dataset→storage binding with a
  * selection policy, and the 3×3 pull/push sync-policy matrix. Names match
  * the reference for test parity (reference:
  * crates/cdl-openapi/src/model_claim.rs:174-179,
  * crates/cdl-openapi/src/model_storage_binding.rs:195-223,
  * crates/cdl-k8s-operator/src/optimizer/model_claim/mod.rs:107-133).
  */
object PondRegistry {

  final case class Pond(name: String, rootUri: String,
      capacityBytes: Long, usedBytes: Long) {
    def availableBytes: Long = capacityBytes - usedBytes
  }

  sealed trait BindingPolicy
  object BindingPolicy {
    case object LowestCopy extends BindingPolicy    // argmax available capacity
    case object Balanced extends BindingPolicy      // declared, unimplemented in ref
    case object LowestLatency extends BindingPolicy // declared, unimplemented in ref
  }

  /** Storage selection (reference quota filter + LowestCopy at
    * optimizer/model_claim/mod.rs:107-133). `Balanced`/`LowestLatency`
    * error exactly like the reference's `bail!`. */
  def selectPond(
      ponds: Seq[Pond],
      requestedBytes: Long,
      policy: BindingPolicy = BindingPolicy.LowestCopy): Either[String, Pond] = {
    val eligible = ponds.filter(_.availableBytes >= requestedBytes)
    policy match {
      case BindingPolicy.LowestCopy =>
        eligible.sortBy(p => (-p.availableBytes, p.name)).headOption
          .toRight(s"no pond with $requestedBytes bytes available")
      case other => Left(s"binding policy $other is not implemented")
    }
  }

  /** ModelStorage kind ADT (reference `ModelStorageObjectSpec`,
    * crates/cdl-openapi/src/model_storage/object.rs:15-44): `Owned`
    * provisions dedicated storage; `Cloned` provisions AND joins the
    * reference store's replication (seeded copy); `Borrowed` binds an
    * external store it does not own. `isUnique` mirrors the reference's
    * `is_unique` (object.rs:37-44): a Borrowed store may back several
    * bindings, an Owned/Cloned store is exclusive. */
  sealed trait StorageKind { def isUnique: Boolean }
  object StorageKind {
    case object Owned extends StorageKind { val isUnique = true }
    final case class Cloned(referenceUri: String) extends StorageKind {
      val isUnique = true
    }
    final case class Borrowed(externalUri: String) extends StorageKind {
      val isUnique = false
    }
  }

  /** Observed pond stats through the Hadoop FileSystem API — the
    * FS-level equivalent of the reference's MinIO admin measurement
    * (crates/cdl-k8s-provider/src/object.rs:1697-1778): with a quota the
    * pond reports (quota, du) — du is `getContentSummary`, the per-bucket
    * usage MinIO cannot answer in O(1) and the reference stubs to None
    * (object.rs:1733-1736); without one it reports the store's global
    * (capacity, capacity − remaining) from `FsStatus`, the reference's
    * `get_capacity_global` pool sum. One RPC either way; no listing
    * rides the driver. */
  def measure(
      conf: org.apache.hadoop.conf.Configuration,
      name: String,
      rootUri: String,
      quotaBytes: Option[Long] = None): Pond = {
    val p = new org.apache.hadoop.fs.Path(rootUri)
    val fs = p.getFileSystem(conf)
    quotaBytes match {
      case Some(quota) =>
        val used =
          if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
        Pond(name, rootUri, quota, used)
      case None =>
        val st = fs.getStatus(p)
        Pond(name, rootUri, st.getCapacity, st.getCapacity - st.getRemaining)
    }
  }

  /** LowestCopy over MEASURED bytes: the selection the reference's
    * optimizer runs against admin-API capacity, not caller-declared
    * numbers — a pond whose declared capacity drifted from its disk
    * contents can no longer win a claim it cannot hold. */
  def selectPondMeasured(
      conf: org.apache.hadoop.conf.Configuration,
      candidates: Seq[(String, String, Option[Long])],
      requestedBytes: Long,
      policy: BindingPolicy = BindingPolicy.LowestCopy): Either[String, Pond] =
    selectPond(
      candidates.map { case (name, uri, quota) => measure(conf, name, uri, quota) },
      requestedBytes, policy)

  /** Provision a pond of the given kind (reference
    * `load_storage_provider_by_*`,
    * crates/cdl-k8s-provider/src/object.rs:170-260):
    *  - `Owned` creates the root;
    *  - `Cloned` creates the root and SEEDS it from the reference store —
    *    the MinIO site-replication join (`add_site_replication`,
    *    object.rs:913-960 semantics) as a one-time FileSystem-level
    *    mirror, so the clone is current before it serves;
    *  - `Borrowed` binds the external URI verbatim: no mkdirs, no copy —
    *    the store belongs to someone else.
    * Returns the measured pond. */
  def provision(
      conf: org.apache.hadoop.conf.Configuration,
      name: String,
      rootUri: String,
      kind: StorageKind,
      quotaBytes: Option[Long] = None): Pond = kind match {
    case StorageKind.Owned =>
      val p = new org.apache.hadoop.fs.Path(rootUri)
      p.getFileSystem(conf).mkdirs(p)
      measure(conf, name, rootUri, quotaBytes)
    case StorageKind.Cloned(refUri) =>
      val dst = new org.apache.hadoop.fs.Path(rootUri)
      val dstFs = dst.getFileSystem(conf)
      dstFs.mkdirs(dst)
      val src = new org.apache.hadoop.fs.Path(refUri)
      val srcFs = src.getFileSystem(conf)
      if (srcFs.exists(src)) {
        // seed = copy the reference's CHILDREN under our root (copying
        // src itself would nest <root>/<refname>/…)
        srcFs.listStatus(src).foreach { s =>
          org.apache.hadoop.fs.FileUtil.copy(
            srcFs, s.getPath, dstFs,
            new org.apache.hadoop.fs.Path(dst, s.getPath.getName),
            false, true, conf)
        }
      }
      measure(conf, name, rootUri, quotaBytes)
    case StorageKind.Borrowed(externalUri) =>
      measure(conf, name, externalUri, quotaBytes)
  }

  sealed trait PullPolicy
  object PullPolicy {
    case object Always extends PullPolicy; case object OnCreate extends PullPolicy
    case object Never extends PullPolicy
  }
  sealed trait PushPolicy
  object PushPolicy {
    case object Always extends PushPolicy; case object OnDelete extends PushPolicy
    case object Never extends PushPolicy
  }

  final case class Binding(dataset: String, source: Pond, target: Pond,
      pull: PullPolicy, push: PushPolicy)

  /** Sync = a Spark batch copy job between pond URIs (the reference's MinIO
    * replication / `mc mirror` Jobs, object.rs:1202-1340, become
    * `spark.read.parquet(src).write.parquet(dst)` — declarative, parallel,
    * resumable). Dispatch honors the policy matrix:
    * pull Always/OnCreate fire on bind; push Always arms a continuous
    * mirror — every subsequent `onWrite` replicates the working (target)
    * copy back to the source, the reference's bucket replication rule
    * (object.rs:1260-1340) as an explicit post-write job; push OnDelete
    * fires on unbind. */
  final class SyncJobs(spark: SparkSession, catalog: DatasetCatalog) {
    private def mirror(fromUri: String, toUri: String): Unit =
      spark.read.parquet(fromUri).write.mode("overwrite").parquet(toUri)

    /** Datasets whose binding armed continuous push replication. */
    private val armed = scala.collection.concurrent.TrieMap.empty[String, Binding]

    def onBind(b: Binding): Seq[String] = {
      val acts = scala.collection.mutable.ListBuffer.empty[String]
      b.pull match {
        case PullPolicy.Always | PullPolicy.OnCreate =>
          mirror(s"${b.source.rootUri}/${b.dataset}", s"${b.target.rootUri}/${b.dataset}")
          acts += s"pull:${b.pull}"
        case PullPolicy.Never => ()
      }
      if (b.push == PushPolicy.Always) {
        armed.put(b.dataset, b)
        acts += "push:replication-rule-armed"
      }
      acts.toList
    }

    /** Post-write hook: call after appending to a bound dataset's working
      * copy. Replicates target→source for push-Always bindings — data, not
      * a marker, arrives at the source. */
    def onWrite(dataset: String): Seq[String] = armed.get(dataset) match {
      case Some(b) =>
        mirror(s"${b.target.rootUri}/${b.dataset}", s"${b.source.rootUri}/${b.dataset}")
        Seq("push:Always")
      case None => Seq.empty
    }

    def onUnbind(b: Binding): Seq[String] = {
      // only the binding that armed continuous replication disarms it —
      // tearing down an unrelated binding of the same dataset (pull-only,
      // or a superseded push binding) must not stop the live mirror
      if (b.push == PushPolicy.Always) armed.remove(b.dataset, b)
      b.push match {
        case PushPolicy.OnDelete =>
          mirror(s"${b.target.rootUri}/${b.dataset}", s"${b.source.rootUri}/${b.dataset}")
          Seq("push:OnDelete")
        case _ => Seq.empty
      }
    }
  }
}
