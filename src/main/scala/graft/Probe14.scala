package graft

import org.apache.spark.sql.functions._

/** Round-14 scratch probe (deleted before close). */
object Probe14 {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    val out = "/tmp/graft_rt/probe_bpk_x100"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val o = s.read.parquet("/tmp/scale_x100/orders.parquet")
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val n = o.count()
    // 99% of rows in 4 big parts, 1% debris across 8 small parts
    o.where(col("k") % 100 =!= 0).repartition(4)
      .write.format("graft.sources.GraftCommitSink")
      .option("path", out).mode("overwrite").save()
    o.where(col("k") % 100 === 0).repartition(8)
      .write.format("graft.sources.GraftCommitSink")
      .option("path", out).mode("append").save()
    val t0 = System.nanoTime()
    val bp = graft.sources.GraftCommitCompact.binpack(s, out, "k BIGINT, cents BIGINT", n / 8)
    val tBin = (System.nanoTime() - t0) / 1e9
    println(f"PROBE n=$n binpack=$bp binpack_sec=$tBin%.2f")
    val t1 = System.nanoTime()
    val cp = graft.sources.GraftCommitCompact.compact(s, out, "k BIGINT, cents BIGINT", 4)
    val tFull = (System.nanoTime() - t1) / 1e9
    println(f"PROBE full_compact=$cp full_sec=$tFull%.2f ratio=${tFull / tBin}%.1f")
    s.stop()
  }
}
