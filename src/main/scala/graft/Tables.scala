package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.storage.StorageLevel

/** Cached base-table loads, one per (session, sfDir, table).
  *
  * Every SURVEY §2 query reads through here so that `Bench`'s 55+
  * sequential query executions scan each parquet file once, not once per
  * query (SURVEY §7.4.6). At 100 TB the same pattern holds: the cache is a
  * per-application `persist`, and Catalyst still prunes columns/predicates
  * beneath it because persist keeps the analyzed plan, with the in-memory
  * columnar batches serving as the scan source.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Caching is a bench-harness optimization (70+ sequential queries over
    * MB-scale tables). At 100 TB you would NOT persist base tables — set
    * SPARK_GRAFT_CACHE=false to read straight from parquet, which restores
    * full predicate pushdown / column pruning at the scan. */
  private val cacheEnabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_CACHE", "true") != "false"

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // keyed by the session OBJECT: a cached DataFrame is bound to the
    // SparkSession that analyzed it, so a second session in the same
    // application must get its own entry, not a foreign session's plan.
    Memo(spark, s"table:$sfDir/$name") {
      val df =
        if (name == "events") {
          // events.ts is parquet TIMESTAMP(NANOS), which Spark 4.1 rejects
          // ([PARQUET_TYPE_ILLEGAL]). Read it as a long (nanos since epoch)
          // and normalize once, centrally, to a µs TimestampType — the same
          // truncation DuckDB applies, so both engines see identical values
          // (SURVEY §7.4.5). nanosAsLong has no per-read DataFrameReader
          // option (ParquetOptions doesn't expose it), so the session conf
          // is the only switch; it is inert for every non-NANOS column.
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$sfDir/$name.parquet")
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        } else {
          spark.read.parquet(s"$sfDir/$name.parquet")
        }
      if (cacheEnabled) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    }
}
