package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import U._

/** Explicit MapReduce-paradigm surface (the reference's heritage): the
  * same computations the DataFrame inventory expresses declaratively,
  * shown once through the imperative primitives a MapReduce user ports
  * from — RDD map/reduceByKey (map → combine → shuffle → reduce) and
  * explicit partition + sort-within-partition (the MR shuffle-sort
  * phase). Everything else in this library deliberately avoids the RDD
  * API: Catalyst can't optimize through it, which is exactly the
  * trade-off these two queries document.
  */
object MrCore {

  val queries: Map[String, Q] = Map(
    // Canonical word count via RDD map/reduceByKey. reduceByKey is the MR
    // combiner+reduce: partial sums per partition, one shuffle on the key.
    "q_mr_wordcount_rdd" -> ((s, d) => {
      import s.implicits._
      Tables(s, d, "documents")
        .select(col("text")).as[String].rdd
        .flatMap(_.split(" "))
        .map(w => (w, 1L))
        .reduceByKey(_ + _)
        .toDF("word", "cnt")
        .orderBy("word")
    }),

    // Distributed grep (the third canonical MapReduce demo next to word
    // count and sort): match lines, emit (id, match count, first
    // position). Pure map-side — no shuffle at all until the output
    // sort; at 100 TB this runs at scan bandwidth with the predicate
    // pushed to the source.
    "q_mr_distributed_grep" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
          expr("CAST(size(regexp_extract_all(text, 'data', 0)) AS INT)").as("n_matches"),
          instr(col("text"), "data").as("first_pos"))
        .where(col("n_matches") > 0)
        .orderBy("doc_id")),

    // MR partition + shuffle-sort made explicit, with the classic
    // secondary-sort pattern: composite key (user, event) sorted fully,
    // custom partitioner routing on the natural key (user) only — so each
    // partition holds whole users with their events in order, like an MR
    // reducer sees them. Deterministic: partitioning is a pure hash of
    // user_id and the within-partition sort key is unique.
    "q_mr_partition_sort" -> ((s, d) => {
      import s.implicits._
      class UserPartitioner(n: Int) extends org.apache.spark.Partitioner {
        def numPartitions: Int = n
        def getPartition(key: Any): Int = key match {
          case (u: Long, _) => ((u.hashCode % n) + n) % n
        }
      }
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"))
        .as[(Long, Long)].rdd
        .map { case (u, e) => ((u, e), ()) }
        .repartitionAndSortWithinPartitions(new UserPartitioner(8))
        .mapPartitionsWithIndex { (pid, it) =>
          it.zipWithIndex.map { case (((u, e), _), i) => (pid, i.toLong, u, e) }
        }
        .toDF("pid", "seq", "user_id", "event_id")
        .orderBy("pid", "seq")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_mr_distributed_grep" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'data')) AS INT) AS n_matches,
           CAST(strpos(text, 'data') AS INT) AS first_pos
         FROM documents
         WHERE len(regexp_extract_all(text, 'data')) > 0
         ORDER BY doc_id""",

    "q_mr_wordcount_rdd" ->
      """SELECT word, COUNT(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY word ORDER BY word"""
    // q_mr_partition_sort: partition ids are Spark's hash — not
    // SQL-derivable; covered by rows>0 + determinism spec.
  )
}
