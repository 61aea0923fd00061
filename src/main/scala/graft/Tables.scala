package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.storage.StorageLevel
import scala.collection.concurrent.TrieMap

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

  private val cache = TrieMap.empty[(String, String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = (spark.sparkContext.applicationId, sfDir, name)
    cache.getOrElseUpdate(key, {
      val df =
        if (name == "events") {
          // events.ts is parquet TIMESTAMP(NANOS), which Spark 4.1 rejects
          // ([PARQUET_TYPE_ILLEGAL]). Read it as a long (nanos since epoch)
          // and normalize once, centrally, to a µs TimestampType — the same
          // truncation DuckDB applies, so both engines see identical values
          // (SURVEY §7.4.5).
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$sfDir/$name.parquet")
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        } else {
          spark.read.parquet(s"$sfDir/$name.parquet")
        }
      if (cacheEnabled) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    })
  }
}
