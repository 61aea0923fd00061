package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import U._

/** SURVEY §2.5 window functions + §2.6 sorts/limits/top-k.
  *
  * Scale notes: each window partitions by a real key (priority, user,
  * customer, brand), so the plan is one hash shuffle + per-partition sort —
  * no global single-partition window anywhere. q_win_ntile_pct computes
  * EXACT global quartiles/percent ranks via the distributed-rank
  * construction (range buckets + broadcast prefix offsets + per-bucket
  * windows); `quartileApprox` below is the cheaper one-sketch-pass
  * variant when ±1-rank accuracy suffices.
  * Windowed running sums go through DECIMAL so the in-frame accumulation
  * order (Spark streams frames; DuckDB uses segment trees) cannot change
  * the emitted doubles. q_topk_global plans as TakeOrderedAndProject —
  * per-partition heaps, no global sort.
  */
object Windows {

  /** Scale path for q_win_ntile_pct's global quartiles: two passes instead
    * of one single-partition window sort. Pass 1 computes three approx
    * cutpoints (approx_percentile's GK sketch — one partial aggregate, no
    * global sort); pass 2 broadcasts the 1-row cutpoint frame and assigns
    * each row a quartile with three comparisons. The plan is two narrow
    * scans + a BroadcastNestedLoopJoin of one row — every stage parallel,
    * so it survives 100× in one aggregate pass. Boundary rows may land one
    * quartile off versus exact ntile (sketch accuracy 1/10000); the test
    * suite asserts that bound. The declared q_win_ntile_pct is now ALSO
    * fully parallel but exact (distributed rank); this remains the cheaper
    * call when ±1-rank accuracy suffices. */
  def quartileApprox(s: org.apache.spark.sql.SparkSession, d: String)
    : org.apache.spark.sql.DataFrame = {
    val c = Tables(s, d, "customer")
    val cuts = c.select(
      expr("approx_percentile(c_acctbal, array(0.25, 0.5, 0.75), 10000)").as("q"))
    c.crossJoin(broadcast(cuts))
      .select(col("c_custkey"), col("c_acctbal"),
        (lit(1) + (col("c_acctbal") > col("q")(0)).cast("int")
          + (col("c_acctbal") > col("q")(1)).cast("int")
          + (col("c_acctbal") > col("q")(2)).cast("int")).as("quartile"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_win_rank" -> ((s, d) => {
      val byPrice = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      val unique = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, d, "orders").select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"),
        row_number().over(unique).as("rn"))
        .orderBy("o_orderpriority", "rn")
    }),

    "q_win_lag_lead" -> ((s, d) => {
      // event_id is strictly aligned with ts (FIXTURES), so ordering by it
      // sidesteps the parquet-ns vs Spark-µs precision gap entirely.
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables(s, d, "events").select(
        col("user_id"), col("event_id"), col("value"),
        coalesce(lag(col("value"), 1).over(w), lit(-1.0)).as("prev_value"),
        coalesce(unix_millis(lead(col("ts"), 1).over(w)), lit(-1L)).as("next_ts_ms"))
        .orderBy("event_id")
    }),

    "q_win_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(D)).over(w).cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("es")
        .rangeBetween(-604800L, 0L) // trailing 7 days in epoch seconds
      Tables(s, d, "events")
        .withColumn("es", epochS(col("ts")))
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast(D)).over(w).cast("double").as("trailing_7d"))
        .orderBy("event_id")
    }),

    // EXACT rolling median over a BOUNDED frame (last 10 events per
    // user): the frame is collected as a sorted array and the median
    // read by position. The frame is a constant 10 rows, so per-row cost
    // is O(1) and total cost linear in N; the window partitions by
    // user_id (full parallelism — never a global sort). No rounding
    // grid is needed: both median cases are an element pick or one IEEE
    // mean of two parquet-exact doubles, and the sort canonicalizes
    // list order, so the result is partition-count independent.
    "q_win_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(-9, 0)
      val n = size(col("arr"))
      Tables(s, d, "events")
        .withColumn("arr", sort_array(collect_list(col("value")).over(w)))
        .select(col("user_id"), col("event_id"), n.as("n_win"),
          when(n % 2 === 1, element_at(col("arr"), ((n + 1) / 2).cast("int")))
            .otherwise((element_at(col("arr"), (n / 2).cast("int"))
              + element_at(col("arr"), (n / 2).cast("int") + 1)) / 2.0)
            .as("med"))
        .orderBy("event_id")
    }),

    // EXACT global ntile/percent_rank/cume_dist WITHOUT a global window:
    // the classic distributed-rank construction. (1) U.gridBin splits
    // c_acctbal into 32 order-aligned equi-width buckets over broadcast
    // [lo, hi] — DETERMINISTIC (min/max, no sketch: an approx_percentile
    // cut would be recomputed per plan branch and its GK merge order
    // could bucket the offs branch and the join branch differently);
    // bucket balance only affects task skew, never the answer. (2)
    // per-bucket counts → U.prefixOffsets (broadcast triangle join — no
    // single-partition window anywhere, the bench stderr stays free of
    // WindowExec warnings). (3) a PER-BUCKET window computes the local
    // row_number and pos = off + rn. The sort key (c_acctbal, c_custkey)
    // is unique, so ntile/pr/cd are pure arithmetic on pos and the
    // broadcast total N — bit-identical to the window formulation.
    // Bucket count scales with the cluster, not N: this is how a
    // 1000-executor job ranks 100 TB.
    "q_win_ntile_pct" -> ((s, d) => {
      val c = Tables(s, d, "customer").select("c_custkey", "c_acctbal")
      val bounds = c.agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"),
        count(lit(1)).as("ntot"))
      val bucketed = c.crossJoin(broadcast(bounds))
        .withColumn("b", U.gridBin(col("c_acctbal"), col("lo"), col("hi"), 32))
      val bc = bucketed.groupBy("b").agg(count(lit(1)).as("cnt"))
      val offs = U.prefixOffsets(bc, "b", "cnt").select("b", "off")
      val wb = Window.partitionBy("b").orderBy("c_acctbal", "c_custkey")
      bucketed.join(broadcast(offs), "b")
        .withColumn("pos", col("off") + row_number().over(wb))
        .withColumn("qq", expr("ntot div 4"))
        .withColumn("rr", expr("ntot % 4"))
        .select(col("c_custkey"), col("c_acctbal"),
          expr("""CAST(CASE WHEN pos <= rr * (qq + 1) THEN (pos + qq) div (qq + 1)
                       ELSE rr + (pos - rr * (qq + 1) + qq - 1) div qq END AS INT)""")
            .as("quartile"),
          expr("CASE WHEN ntot = 1 THEN 0.0 ELSE (pos - 1) / CAST(ntot - 1 AS DOUBLE) END")
            .as("pr"),
          expr("pos / CAST(ntot AS DOUBLE)").as("cd"))
        .orderBy("c_custkey")
    }),

    // Low-cardinality window parallelism: o_orderpriority has 5 values,
    // so a direct per-priority window is 5 tasks NO MATTER the cluster
    // size. Stage 1 ranks within (priority, salt) — nsalt× the
    // parallelism — and keeps each salt's top-10 (any global-top-10 row
    // is necessarily in its salt's top-10, so no candidate is lost).
    // Stage 2 re-ranks the ≤ 5·nsalt·10 survivors per priority: the
    // heavy sort runs 40-way; the final window touches ≤ 400 rows. At
    // cluster scale nsalt grows with executor count.
    "q_win_rank_salted" -> ((s, d) => {
      val nsalt = 8
      val w1 = Window.partitionBy("o_orderpriority", "salt")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val w2 = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, d, "orders")
        .withColumn("salt", (col("o_orderkey") % nsalt).cast("int"))
        .withColumn("prn", row_number().over(w1))
        .where(col("prn") <= 10)
        .withColumn("rn", row_number().over(w2))
        .where(col("rn") <= 10)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"), col("rn"))
        .orderBy("o_orderpriority", "rn")
    }),

    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("p_brand")
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables(s, d, "part").select(
        col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    }),

    // Same result as q_topk_per_group, computed by graft's own plan node:
    // GroupedTopK keeps a bounded k-heap per group behind one hash shuffle
    // (O(n log k), no partition sort) instead of the window formulation's
    // full per-partition sort. PropertySpec asserts row-for-row equality
    // with the window version; PlanSpec asserts the custom exec + absence
    // of Sort/Window in the physical plan.
    "q_topk_grouped_plan" -> ((s, d) =>
      graft.plans.GraftPlans.groupedTopK(
          Tables(s, d, "part").select("p_brand", "p_partkey", "p_retailprice"),
          "p_brand", "p_retailprice", "p_partkey", 3)
        .orderBy("p_brand", "rn")),

    // The same top-k written the idiomatic way — row_number window +
    // rank filter — with the RowNumberTopKRewrite optimizer rule
    // registered: the user keeps the standard Spark pattern and the
    // engine plans the bounded-heap operator (PlanSpec asserts
    // GroupedTopKExec, no WindowExec, in the executed plan).
    // The rule registers on an ISOLATED child session (shared
    // SparkContext, own SessionState): extraOptimizations is session-wide
    // and lazily applied, so registering on the shared session would
    // silently re-plan every other row_number()<=k query through the heap
    // operator — making the GroupedTopK-vs-window equality specs compare
    // the operator against itself. Reads the dim directly (the Tables
    // cache is per-session; `part` is KB-scale).
    "q_topk_window_rewrite" -> ((s, d) => {
      val s2 = s.newSession()
      graft.plans.GraftRules.register(s2)
      s2.read.parquet(s"$d/part.parquet")
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", row_number().over(Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))))
        .where(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    }),

    "q_sort_multikey" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") >= ts("2001-06-01"))
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))),

    "q_topk_global" -> ((s, d) =>
      Tables(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),

    "q_win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, d, "orders").select(
        col("o_orderpriority"),
        first(col("o_orderkey")).over(whole).as("top_key"),
        last(col("o_orderkey")).over(whole).as("bottom_key"),
        nth_value(col("o_orderkey"), 2).over(whole).as("second_key"),
        row_number().over(w).as("rn"))
        .where(col("rn") === 1)
        .select("o_orderpriority", "top_key", "bottom_key", "second_key")
        .orderBy("o_orderpriority")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INT) AS drnk,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
         FROM orders ORDER BY o_orderpriority, rn""",

    "q_win_lag_lead" ->
      """SELECT user_id, event_id, value,
           COALESCE(LAG(value) OVER w, CAST(-1 AS DOUBLE)) AS prev_value,
           COALESCE(epoch_ms(LEAD(ts) OVER w), -1) AS next_ts_ms
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         ORDER BY event_id""",

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q_win_range_frame" ->
      """SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
             OVER (PARTITION BY user_id ORDER BY (epoch_ms(ts) // 1000)
                   RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_7d
         FROM events ORDER BY event_id""",

    "q_win_rolling_median" ->
      """WITH e AS (
           SELECT user_id, event_id,
             list_sort(list(value) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) AS arr
           FROM events)
         SELECT user_id, event_id, CAST(len(arr) AS INT) AS n_win,
           CASE WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
                ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0 END AS med
         FROM e ORDER BY event_id""",

    "q_win_ntile_pct" ->
      """SELECT c_custkey, c_acctbal,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
         FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",

    "q_win_rank_salted" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
         FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders)
         WHERE rn <= 10 ORDER BY o_orderpriority, rn""",

    "q_topk_per_group" ->
      """SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INT) AS rn
         FROM (SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS rn
               FROM part)
         WHERE rn <= 3 ORDER BY p_brand, rn""",

    "q_topk_grouped_plan" ->
      """SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INT) AS rn
         FROM (SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS rn
               FROM part)
         WHERE rn <= 3 ORDER BY p_brand, rn""",

    "q_topk_window_rewrite" ->
      """SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INT) AS rn
         FROM (SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS rn
               FROM part)
         WHERE rn <= 3 ORDER BY p_brand, rn""",

    "q_sort_multikey" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
         FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01'
         ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber""",

    "q_topk_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q_win_first_last" ->
      """SELECT o_orderpriority, top_key, bottom_key, second_key
         FROM (SELECT o_orderpriority,
                 FIRST_VALUE(o_orderkey) OVER wf AS top_key,
                 LAST_VALUE(o_orderkey) OVER wf AS bottom_key,
                 NTH_VALUE(o_orderkey, 2) OVER wf AS second_key,
                 ROW_NUMBER() OVER w AS rn
               FROM orders
               WINDOW w AS (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey),
                      wf AS (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         WHERE rn = 1 ORDER BY o_orderpriority"""
  )
}
