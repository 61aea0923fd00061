package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Replayed event row (top-level so Catalyst can derive its Encoder). */
case class BenchEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long)

/** Bench-scale RocksDB state-store run (BASELINE.md "Streaming state").
  *
  * StreamingSpec proves transformWithState CORRECT on micro-fixtures; this
  * main produces the SCALE evidence: the full events table of an sf dir
  * (SPARK_GRAFT_SF_DIR, default sf0.1) replayed through the event-time-
  * timer sessionizer (`Streams.sessionTimers` — per-user open-interval
  * state + one timer per key, the heaviest state shape in the repo) with
  * the RocksDB provider, then one JSON line: wall time, rows/sec, and the
  * state operator's reported metrics (rows in state, memory used, and the
  * rocksdb* custom metrics a capacity plan needs).
  *
  * Run: sbt -batch "runMain graft.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "5000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // track sizes so stateMemory/rocksdb metrics are populated
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // replay in event_id order (the generator co-orders event_id and ts,
    // so this is arrival order with bounded disorder — the realistic feed)
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id")
      .orderBy("event_id")
    val rows = events.as[BenchEv].collect()
    val mem = MemoryStream[BenchEv]
    val q = graft.streaming.Streams.sessionTimers(mem.toDF()).toDF()
      .writeStream.format("noop").outputMode("append").start()
    val t0 = System.nanoTime()
    rows.grouped(batchRows).foreach { c =>
      mem.addData(c.toSeq); q.processAllAvailable()
    }
    val dt = (System.nanoTime() - t0) / 1e9
    val prog = q.lastProgress
    val stateJson = Option(prog)
      .flatMap(p => p.stateOperators.headOption)
      .map { so =>
        val custom = so.customMetrics
        val keys = Seq("rocksdbSstFileSize", "rocksdbTotalBytesRead",
          "rocksdbTotalBytesWritten", "rocksdbPinnedBlocksMemoryUsage")
        val customJson = keys.flatMap { k =>
          Option(custom.get(k)).map(v => s""""$k":$v""")
        }.mkString(",")
        s""""state_rows":${so.numRowsTotal},"state_bytes":${so.memoryUsedBytes},$customJson"""
      }.getOrElse("\"state_rows\":-1")
    q.stop()
    val rps = if (dt > 0) rows.length / dt else 0.0
    println(f"""{"metric":"stream_session_rocksdb","rows":${rows.length},"batches":${(rows.length + batchRows - 1) / batchRows},"sec":$dt%.2f,"rows_per_sec":$rps%.0f,$stateJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
