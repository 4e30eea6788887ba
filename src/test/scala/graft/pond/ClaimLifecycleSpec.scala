package graft.pond

import org.scalatest.funsuite.AnyFunSuite

import ClaimLifecycle._
import ClaimLifecycle.Action._
import ClaimLifecycle.Event._
import ClaimLifecycle.State._

/** Pure claim lifecycle vs the reference reconcile loop
  * (crates/cdl-k8s-operator/src/ctx/model_claim.rs:49-177). */
class ClaimLifecycleSpec extends AnyFunSuite {

  test("finalizer is added before any state work") {
    val (c, acts) = step(Claim("m"), ValidationSucceeded("pond-b"))
    assert(c.hasFinalizer && c.state == Pending)
    assert(acts == Seq(AddFinalizer, Requeue(30)))
  }

  test("happy path: Pending -> Ready binds storage") {
    val c0 = Claim("m", hasFinalizer = true)
    val (c1, a1) = step(c0, ValidationSucceeded("pond-b"))
    assert(c1.state == Ready && c1.storage.contains("pond-b"))
    assert(a1 == Seq(BindStorage("pond-b")))
    val (c2, a2) = step(c1, NoChange)
    assert(c2 == c1 && a2 == Seq(AwaitChange))
  }

  test("validation failure requeues and stays Pending (ref FALLBACK 30s)") {
    val c0 = Claim("m", hasFinalizer = true)
    val (c1, a1) = step(c0, ValidationFailed("no capacity"))
    assert(c1.state == Pending && a1 == Seq(Requeue(30)))
  }

  test("storage change: Ready -> Replacing -> Ready with migration") {
    val ready = Claim("m", state = Ready, hasFinalizer = true,
      storage = Some("pond-a"))
    val (rep, a1) = step(ready, SpecChangedStorage("pond-b"))
    assert(rep.state == Replacing)
    assert(a1 == Seq(MigrateData("pond-a", "pond-b"), Requeue(30)))
    val (still, a2) = step(rep, ReplacementInProgress)
    assert(still.state == Replacing && a2 == Seq(Requeue(30)))
    val (back, a3) = step(still, ReplacementCompleted("pond-b"))
    assert(back.state == Ready && back.storage.contains("pond-b"))
    assert(a3 == Seq(BindStorage("pond-b")))
  }

  test("deletion wins from any state, then cleanup drops the finalizer") {
    for (st <- Seq(Pending, Ready, Replacing)) {
      val c = Claim("m", state = st, hasFinalizer = true,
        deletionRequested = true)
      val (d, acts) = step(c, NoChange)
      assert(d.state == Deleting, st)
      assert(acts == Seq(Requeue(30)))
    }
    val deleting = Claim("m", state = Deleting, hasFinalizer = true,
      deletionRequested = true)
    val (done, acts) = step(deleting, CleanupSucceeded)
    assert(!done.hasFinalizer && acts == Seq(RemoveFinalizer))
    val (_, failActs) = step(deleting, Failed("storage unreachable"))
    assert(failActs == Seq(Requeue(30)))
  }

  test("full replay: create -> bind -> replace -> delete") {
    val events = Seq(
      ValidationSucceeded("pond-a"), // pass 1: adds finalizer first
      ValidationSucceeded("pond-a"), // pass 2: binds
      SpecChangedStorage("pond-b"),
      ReplacementCompleted("pond-b"))
    val (c, acts) = ClaimLifecycle.run(Claim("m"), events)
    assert(c.state == Ready && c.storage.contains("pond-b"))
    assert(acts.contains(MigrateData("pond-a", "pond-b")))
    assert(acts.contains(BindStorage("pond-b")))
  }

  test("invalid (state, event) pairs are rejected") {
    val ready = Claim("m", state = Ready, hasFinalizer = true)
    intercept[IllegalStateException] {
      step(ready, ValidationSucceeded("x"))
    }
  }
}
