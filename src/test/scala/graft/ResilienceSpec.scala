package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-reality guard: task failures + retries. A 1000-executor run
  * WILL lose tasks; results must survive re-execution. `local[4, 2]`
  * enables per-task retries in local mode; a fault injector fails every
  * partition's FIRST attempt, so the job can only succeed through retry
  * — and the retried output must equal the failure-free run exactly
  * (which is why the repo bans side-effecting state in query paths: a
  * retried task must be a pure replay).
  *
  * This suite must OWN the SparkContext (retry config is context-level,
  * and getOrCreate ignores a new master while a context is alive), so it
  * stops whatever is active and stops its own on exit; suites run
  * sequentially in the forked test JVM and TestSession.spark rebuilds on
  * next use. */
class ResilienceSpec extends AnyFunSuite {

  test("every partition's first task attempt fails; retries reproduce the exact result") {
    val sf = TestSession.sf
    // ground truth from the shared session — computed BEFORE the takeover
    val shared = TestSession.spark
    val want = shared.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(queries.U.D)).cast("double").as("qty"))
      .orderBy("l_returnflag").collect().toSeq.map(_.toString)
    shared.stop()

    val spark = SparkSession.builder()
      .master("local[4, 2]") // second field: task attempts allowed
      .appName("graft-resilience")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val base = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_returnflag", "l_quantity")
      val flaky = base.rdd.mapPartitionsWithIndex { (pid, it) =>
        val ctx = org.apache.spark.TaskContext.get()
        if (ctx.attemptNumber() == 0)
          throw new RuntimeException(s"injected failure: partition $pid attempt 0")
        it
      }
      val got = spark.createDataFrame(flaky, base.schema)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(queries.U.D)).cast("double").as("qty"))
        .orderBy("l_returnflag").collect().toSeq.map(_.toString)
      assert(got === want, "retried run diverged from the failure-free result")
    } finally spark.stop()
  }
}
