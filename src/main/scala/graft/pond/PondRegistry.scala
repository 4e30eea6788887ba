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
