package graft

/** The whole-surface plan-shape gate (see graft.PlanLock): every
  * declared query's executed-plan operator histogram must match the
  * committed PLANS.lock. PlanSpec pins the ~50 hand-audited plans in
  * detail; this catches structural drift in the other ~270 — a
  * broadcast decaying to sort-merge, an extra Exchange, a window
  * appearing where a heap was — without executing anything the plans
  * don't already execute at construction.
  *
  * On an INTENDED plan change: regenerate in place
  * (`sbt "runMain graft.PlanLock"`) and commit the lock diff alongside
  * the code — the lock turns plan changes into reviewable diffs. */
class PlanLockSpec extends SparkSpec {

  test("every declared query's physical plan shape matches PLANS.lock") {
    val lock = {
      val src = scala.io.Source.fromFile("PLANS.lock")
      try src.getLines().filter(_.nonEmpty).map { l =>
        val Array(n, fp) = l.split("\t", 2); n -> fp
      }.toMap
      finally src.close()
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val missing = names.filterNot(lock.contains)
    val stale = lock.keySet -- names
    assert(missing.isEmpty && stale.isEmpty,
      s"lock out of date — missing: $missing, stale: $stale " +
        "(regenerate: sbt \"runMain graft.PlanLock\")")
    val drift = names.flatMap { n =>
      val actual =
        try PlanLock.fingerprintOf(spark, sf, n)
        catch { case e: Throwable => s"ERROR ${e.getClass.getSimpleName}" }
      if (actual == lock(n)) None
      else Some(s"$n\n  locked: ${lock(n)}\n  actual: $actual")
    }
    assert(drift.isEmpty,
      s"${drift.size} plan shapes drifted from PLANS.lock " +
        s"(intended? regenerate + commit the diff):\n${drift.mkString("\n")}")
  }
}
