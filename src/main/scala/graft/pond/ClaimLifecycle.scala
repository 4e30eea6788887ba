package graft.pond

/** The model-claim lifecycle as a PURE state machine —
  * `(claim, event) → (claim', actions)` — re-expressing the reference
  * operator's reconcile loop (crates/cdl-k8s-operator/src/ctx/
  * model_claim.rs:49-177) without the Kubernetes machinery:
  *
  *  - deletion-timestamped claims move to Deleting from ANY state first;
  *  - a claim without the finalizer gets one before anything else;
  *  - Pending → Ready on successful validation (storage bound);
  *  - Ready → Replacing when the spec's storage changes;
  *  - Replacing → Ready when replacement completes;
  *  - Deleting → removed (finalizer dropped) on successful cleanup;
  *  - every failure path requeues with the reference's 30 s fallback.
  *
  * Pure and driver-side by design: the states/transitions are metadata,
  * the heavy work they gate (storage binding, data migration) runs as
  * Spark jobs dispatched from the emitted actions.
  */
object ClaimLifecycle {

  sealed trait State
  object State {
    case object Pending extends State
    case object Ready extends State
    case object Replacing extends State
    case object Deleting extends State
  }

  final case class Claim(
      name: String,
      state: State = State.Pending,
      hasFinalizer: Boolean = false,
      deletionRequested: Boolean = false,
      storage: Option[String] = None)

  /** What the reconciler's validators reported for this pass. */
  sealed trait Event
  object Event {
    /** Pending: validation bound a storage. */
    final case class ValidationSucceeded(storage: String) extends Event
    /** Pending: validation failed (missing model, no capacity…). */
    final case class ValidationFailed(reason: String) extends Event
    /** Ready: the claim's spec now names a different storage. */
    final case class SpecChangedStorage(newStorage: String) extends Event
    /** Ready: nothing to do. */
    case object NoChange extends Event
    /** Replacing: data migration finished; the claim now lives on
      * `storage`. */
    final case class ReplacementCompleted(storage: String) extends Event
    /** Replacing: migration still running. */
    case object ReplacementInProgress extends Event
    /** Deleting: cleanup finished. */
    case object CleanupSucceeded extends Event
    /** Any validator error in Ready/Replacing/Deleting. */
    final case class Failed(reason: String) extends Event
  }

  sealed trait Action
  object Action {
    case object AddFinalizer extends Action
    case object RemoveFinalizer extends Action
    /** Re-reconcile after the reference's FALLBACK (30 s). */
    final case class Requeue(seconds: Int = 30) extends Action
    /** Block until the resource changes (reference `await_change`). */
    case object AwaitChange extends Action
    final case class BindStorage(storage: String) extends Action
    /** Migrate claim data between storages (a Spark mirror job). */
    final case class MigrateData(from: String, to: String) extends Action
  }

  import Action._
  import Event._
  import State._

  /** One reconcile pass. The pre-checks (deletion, finalizer) mirror the
    * reference's order and short-circuit the state dispatch. */
  def step(c: Claim, e: Event): (Claim, Seq[Action]) = {
    if (c.deletionRequested && c.state != Deleting)
      (c.copy(state = Deleting), Seq(Requeue()))
    else if (!c.hasFinalizer)
      (c.copy(hasFinalizer = true), Seq(AddFinalizer, Requeue()))
    else (c.state, e) match {
      case (Pending, ValidationSucceeded(st)) =>
        (c.copy(state = Ready, storage = Some(st)), Seq(BindStorage(st)))
      case (Pending, ValidationFailed(_)) =>
        (c, Seq(Requeue()))

      case (Ready, SpecChangedStorage(ns)) =>
        (c.copy(state = Replacing),
          Seq(MigrateData(c.storage.getOrElse(""), ns), Requeue()))
      case (Ready, NoChange) =>
        (c, Seq(AwaitChange))

      case (Replacing, ReplacementCompleted(st)) =>
        (c.copy(state = Ready, storage = Some(st)), Seq(BindStorage(st)))
      case (Replacing, ReplacementInProgress) =>
        (c, Seq(Requeue()))

      case (Deleting, CleanupSucceeded) =>
        (c.copy(hasFinalizer = false), Seq(RemoveFinalizer))

      case (_, Failed(_)) =>
        (c, Seq(Requeue()))

      case (s, ev) =>
        throw new IllegalStateException(s"claim ${c.name}: event $ev invalid in state $s")
    }
  }

  /** Replay a sequence of events (driver loop / test harness). */
  def run(c: Claim, events: Seq[Event]): (Claim, Seq[Action]) =
    events.foldLeft((c, Seq.empty[Action])) { case ((cl, acts), e) =>
      val (cl2, a) = step(cl, e)
      (cl2, acts ++ a)
    }
}
