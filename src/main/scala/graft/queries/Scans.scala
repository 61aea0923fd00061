package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import U._

/** SURVEY §2.1 scans/sources/sinks + §2.2 projection/filter.
  *
  * Scale notes: scans stay fully declarative so Catalyst pushes predicates
  * and prunes columns down to the parquet reader (visible as PushedFilters
  * / ReadSchema in the formatted plan); at 100 TB that is the difference
  * between reading a few columns of a few row groups and reading the whole
  * table. The roundtrip sinks exercise text-format I/O through the same
  * DataFrameWriter/Reader APIs a cluster job would use.
  */
object Scans {

  private def tmpDir(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_rt/$name"

  val queries: Map[String, Q] = Map(
    // The two scan queries read parquet directly (not through the Tables
    // cache): their purpose is to exhibit the source path — predicate
    // pushdown and column pruning reaching the parquet reader
    // (PushedFilters / narrowed ReadSchema in the formatted plan), which a
    // cached InMemoryRelation would mask.
    "q_scan_parquet" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet").agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey")).as("orders"))),

    "q_scan_pruned" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .where(col("l_shipdate") >= ts("2001-01-01"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        // (l_orderkey, l_linenumber) is NOT unique in this data — the sort
        // must cover every output column so ties are identical rows.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    "q_source_csv_roundtrip" -> ((s, d) => {
      val r = Tables(s, d, "region")
      val out = tmpDir(s"csv_${d.replaceAll("[^0-9.]", "")}")
      r.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(r.schema).option("header", "true").csv(out)
        .orderBy("r_regionkey")
    }),

    "q_source_json_roundtrip" -> ((s, d) => {
      val n = Tables(s, d, "nation")
      val out = tmpDir(s"json_${d.replaceAll("[^0-9.]", "")}")
      n.write.mode("overwrite").json(out)
      s.read.schema(n.schema).json(out).orderBy("n_nationkey")
    }),

    "q_sink_parquet_partitioned" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")))
      val out = tmpDir(s"part_${d.replaceAll("[^0-9.]", "")}")
      o.write.mode("overwrite").partitionBy("yr").parquet(out)
      // Reading back with a partition filter exercises partition pruning:
      // only the yr=1997 directory is listed and scanned.
      s.read.parquet(out).where(col("yr") === 1997)
        .groupBy("yr")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("yr")
    }),

    "q_project_compute" -> ((s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber", "revenue")),

    "q_filter_pred" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
      val p = Tables(s, d, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .where(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31"))
          && col("l_returnflag").isin("A", "R")
          && col("p_type").like("PROMO%")
          && col("p_retailprice").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"), col("p_type"))
        .orderBy("l_orderkey", "l_linenumber", "p_partkey", "p_type")
    }),

    "q_filter_between_dates" -> ((s, d) =>
      Tables(s, d, "orders")
        .where(col("o_orderdate").between(ts("1996-01-01"), ts("1996-12-31 23:59:59")))
        // dates emitted as strings: DATE columns round-trip differently
        // through parquet/pandas/DuckDB result frames; strings are
        // hash-stable in every engine (SURVEY §7.4).
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
        .orderBy("o_orderkey"))
  )

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      "SELECT COUNT(*) AS cnt, COUNT(DISTINCT l_orderkey) AS orders FROM lineitem",

    // The roundtrips write text formats and read them back with the
    // original schema, so the output IS the source table — the oracle
    // reads it directly; any csv/json mangling breaks the hash compare.
    "q_source_csv_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",

    "q_source_json_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "q_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2001-01-01'
         ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "q_sink_parquet_partitioned" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr, COUNT(*) AS cnt,
            ${oDsum("o_totalprice")} AS total
          FROM orders WHERE year(o_orderdate) = 1997
          GROUP BY yr ORDER BY yr""",

    "q_project_compute" ->
      """SELECT l_orderkey, l_linenumber,
           l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS revenue
         FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""",

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_type
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
           AND l_returnflag IN ('A','R') AND p_type LIKE 'PROMO%'
           AND p_retailprice IS NOT NULL
         ORDER BY l_orderkey, l_linenumber, p_partkey, p_type""",

    "q_filter_between_dates" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
         ORDER BY o_orderkey"""
  )
}
