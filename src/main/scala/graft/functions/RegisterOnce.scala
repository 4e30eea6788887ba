package graft.functions

import org.apache.spark.sql.SparkSession

/** Once-per-session guard for the temp-function registration families
  * (r16 verdict #8): `createOrReplaceTempFunction` logs a "replaced a
  * previously registered function" WARN on every call, and the column
  * builders call their family's `register` per expression — hundreds of
  * WARN lines per bench run.
  *
  * A `functionRegistry.functionExists(sentinel)` probe is NOT a safe
  * guard: Spark 4 ships a BUILTIN `len` (character/byte length, INT),
  * so the probe would skip the engine's BIGINT byte-length `len`; and a
  * CLI session built with GraftExtensions pre-injects part of a family
  * (`vec_dot` but not `vec_code`), so a name probe would skip the rest.
  * Guard by IDENTITY instead: each family registers exactly once per
  * session function registry (weakly held — dropped sessions don't
  * leak), replacing whatever was there, exactly as before — just once. */
private[graft] object RegisterOnce {

  private val done = new java.util.WeakHashMap[AnyRef, java.util.HashSet[String]]()

  /** Run `body` once per (session registry, family) pair. The body runs
    * INSIDE the monitor: a losing thread must not observe the family as
    * registered while the winner is still mid-registration (concurrent
    * cascade arms both ensure() the sketch family — the loser would
    * build a call_function against a name not yet bound). Registration
    * is a handful of registry puts, so the hold is microseconds, and
    * nothing inside body can re-enter this lock. */
  def apply(spark: SparkSession, family: String)(body: => Unit): Unit = {
    val reg: AnyRef = spark.sessionState.functionRegistry
    done.synchronized {
      val set = done.computeIfAbsent(reg, _ => new java.util.HashSet[String]())
      if (set.add(family)) body
    }
  }
}
