package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the two-level quantizer's geometry (super-cell
  * population balance and stage sizes) — not part of the declared
  * surface. Usage: tools/run.sh graft.Diag2L <sfDir> <cells> <w> */
object Diag2L {
  def main(args: Array[String]): Unit = {
    val (d, cells, w) = (args(0), args(1).toInt, args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m0 = System.nanoTime()
    graft.queries.Learn.twoLevelModel(spark, d, cells)
    println(f"model_build=${(System.nanoTime() - m0) / 1e9}%.1fs")
    val p0 = System.nanoTime()
    val (qs, cand) = graft.queries.Learn.trainedProbeFrames2L(spark, d, cells, 5, w)
    qs.count(); cand.count()
    println(f"probe_frames=${(System.nanoTime() - p0) / 1e9}%.1fs")
    val scored = graft.queries.Learn.twoLevelScored(spark, d, cells, w)
    if (sys.env.contains("SPARK_GRAFT_PLAN"))
      println(scored.queryExecution.executedPlan.toString)
    val t0 = System.nanoTime()
    val n = scored.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"scored_rows=$n dt=$dt%.1fs")
    // super-cell population histogram: how many centroids per super-cell
    val hist = graft.queries.Learn.twoLevelCentHist(spark, d, cells)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    println(s"n_supercells=${hist.length} " +
      s"sizes=${hist.map(_._2).sorted.reverse.take(10).mkString(",")} " +
      s"total=${hist.map(_._2).sum}")
    spark.stop()
  }
}
