package graft

import org.scalatest.funsuite.AnyFunSuite

/** GRAFT_SOAK_ONLY vocabulary guard (r15 ADVICE): a typo'd family name
  * must fail the soak loudly — the old `forall` gate silently skipped
  * every family and printed an empty run that read as clean. */
class SoakSpec extends AnyFunSuite {

  test("requireKnownFamily accepts every real family and unset") {
    Soak.requireKnownFamily(None)
    Soak.KnownFamilies.foreach(f => Soak.requireKnownFamily(Some(f)))
  }

  test("requireKnownFamily rejects a typo'd family with the vocabulary") {
    val e = intercept[RuntimeException] {
      Soak.requireKnownFamily(Some("embs"))
    }
    assert(e.getMessage.contains("embs"))
    assert(e.getMessage.contains("emb")) // lists the known names
  }
}
