package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-SQL entry point: register every base table as a temp view
  * (through [[Tables]], so the ns-timestamp normalization and the cache
  * apply) plus the graft_* function registry, then run any query in the
  * engine's SQL dialect directly — the surface a SQL-first user of the
  * engine drives.
  */
object Sql {
  def register(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach(n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n))
    functions.GraftFunctions.register(spark)
  }

  def run(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
