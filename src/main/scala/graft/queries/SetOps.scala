package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import U._

/** SURVEY §2.7 set operations. Spark `intersect`/`except` carry SQL
  * (distinct) semantics, matching DuckDB's INTERSECT/EXCEPT. */
object SetOps {

  private def urgent(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "orders").where(col("o_orderpriority") === "1-URGENT")
  private def high(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "orders").where(col("o_orderpriority") === "2-HIGH")

  val queries: Map[String, Q] = Map(
    "q_set_union_all" -> ((s, d) =>
      urgent(s, d).select(col("o_custkey"), lit("U").as("src"))
        .union(high(s, d).select(col("o_custkey"), lit("H").as("src")))
        .orderBy("o_custkey", "src")),

    "q_set_union_distinct" -> ((s, d) =>
      urgent(s, d).select("o_custkey")
        .union(high(s, d).select("o_custkey"))
        .distinct()
        .orderBy("o_custkey")),

    "q_set_intersect" -> ((s, d) =>
      urgent(s, d).select("o_custkey")
        .intersect(high(s, d).select("o_custkey"))
        .orderBy("o_custkey")),

    "q_set_except" -> ((s, d) =>
      urgent(s, d).select("o_custkey")
        .except(high(s, d).select("o_custkey"))
        .orderBy("o_custkey")),

    // Multiset (bag) semantics — `exceptAll`/`intersectAll` preserve
    // duplicate counts (a customer with 3 urgent and 1 high order keeps
    // 2 rows in EXCEPT ALL, 1 in INTERSECT ALL). Spark plans both as an
    // aggregate of per-side counts + a generator — one shuffle, linear.
    "q_set_except_all" -> ((s, d) =>
      urgent(s, d).select("o_custkey")
        .exceptAll(high(s, d).select("o_custkey"))
        .orderBy("o_custkey")),

    "q_set_intersect_all" -> ((s, d) =>
      urgent(s, d).select("o_custkey")
        .intersectAll(high(s, d).select("o_custkey"))
        .orderBy("o_custkey"))
  )

  private val u = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
  private val h = "SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'"

  val oracle: Map[String, String] = Map(
    "q_set_union_all" ->
      s"""SELECT o_custkey, 'U' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_custkey, 'H' AS src FROM orders WHERE o_orderpriority = '2-HIGH'
          ORDER BY o_custkey, src""",
    "q_set_union_distinct" -> s"SELECT o_custkey FROM ($u UNION $h) ORDER BY o_custkey",
    "q_set_intersect" -> s"SELECT o_custkey FROM ($u INTERSECT $h) ORDER BY o_custkey",
    "q_set_except" -> s"SELECT o_custkey FROM ($u EXCEPT $h) ORDER BY o_custkey",
    "q_set_except_all" ->
      s"SELECT o_custkey FROM ($u EXCEPT ALL $h) ORDER BY o_custkey",
    "q_set_intersect_all" ->
      s"SELECT o_custkey FROM ($u INTERSECT ALL $h) ORDER BY o_custkey"
  )
}
