package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan SHAPE lock for the whole declared surface.
  *
  * PlanSpec's targeted guards pin the plans that were HAND-audited;
  * this locks everything else: each query's executed-plan operator
  * histogram (operator name → count, ids/sizes/exprs stripped) is
  * committed to `PLANS.lock`, and PlanLockSpec fails when any query's
  * shape drifts — the silent regressions a 317-query library can't
  * re-audit by hand each round (a broadcast join decaying to
  * sort-merge, an extra Exchange, a lost pushdown collapsing into a
  * post-scan Filter, a window appearing where a heap used to be).
  *
  * The fingerprint is deliberately COARSE: operator class names and
  * counts only, parsed from the plan string's leading tokens
  * (`*(n)` codegen stage markers stripped, argument lists ignored), so
  * it is invariant to expression ids, statistics, partition counts,
  * and file paths — it changes exactly when the plan's OPERATOR
  * structure changes. Plans are built (never executed) at the spec's
  * sf0.001 fixture under the shared test session.
  *
  * Maintenance contract: an INTENDED plan change regenerates the lock
  * (`runMain graft.PlanLock` — writes PLANS.lock in place) in the same
  * commit, which makes plan changes reviewable as diffs. If the driver
  * regenerates the testdata, borderline size-based join strategies may
  * legitimately flip: re-gate and regenerate (the SURVEY §2 re-gate
  * rule).
  */
object PlanLock {

  /** "Name×count" histogram of plan-tree operator names, sorted — the
    * shape fingerprint. */
  def fingerprint(planString: String): String = {
    val op = "^[\\s:+\\-]*(?:\\*\\(\\d+\\) )?([A-Za-z][A-Za-z0-9]*)".r
    val names = planString.linesIterator.flatMap { line =>
      op.findFirstMatchIn(line).map(_.group(1))
    }.toSeq
    names.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (n, v) => s"$n x${v.size}" }.mkString(", ")
  }

  def fingerprintOf(spark: SparkSession, sfDir: String,
      name: String): String =
    fingerprint(SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // mirror the TEST session's confs exactly (SparkSpec) — the lock is
    // compared there, and shuffle-partition or timezone drift would
    // show up as spurious shape changes in conf-sensitive plans
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val fp =
        try fingerprintOf(spark, sfDir, name)
        catch { case e: Throwable => s"ERROR ${e.getClass.getSimpleName}" }
      s"$name\t$fp"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("PLANS.lock"),
      (out.mkString("", "\n", "\n")).getBytes("UTF-8"))
    println(s"""{"plans_locked":${out.size},"file":"PLANS.lock"}""")
    spark.stop()
  }
}
