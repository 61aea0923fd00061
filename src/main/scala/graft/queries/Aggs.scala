package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import U._

/** SURVEY §2.4 aggregations.
  *
  * Scale notes: every aggregate here is a plain `groupBy.agg`, which Spark
  * plans as partial (map-side combine) + final HashAggregate around one
  * shuffle on the group keys — the MapReduce combiner, for free. Group-key
  * cardinalities are all small or key-bounded, so no skew handling is
  * needed; AQE would split a hot key if the data changed. Floating sums go
  * through DECIMAL(18,4) (see U.dsum) for order-independence.
  */
object Aggs {

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Mergeable-quantile construction behind q_agg_quantile_merge,
    * parameterized on the level-1 shard key so the test suite can prove
    * merge associativity: ANY sharding yields identical cutpoints,
    * because the merge (elementwise count sum) is commutative and
    * associative — the property that lets a 1000-executor job emit one
    * tiny partial histogram per task and roll them up in O(bins).
    * Windowless by construction: the ≤256-bin prefix sum is a broadcast
    * triangle join, and bin count grows with desired accuracy, not N. */
  private[graft] def quantileMergeWith(s: org.apache.spark.sql.SparkSession,
      d: String, shard: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val nb = 256
    val c = Tables(s, d, "customer").select(shard.as("shard"), col("c_acctbal"))
    val bounds = c.agg(min("c_acctbal").as("lo"), max("c_acctbal").as("hi"),
      count(lit(1)).as("n"))
    val binned = c.crossJoin(broadcast(bounds))
      .withColumn("bin", U.gridBin(col("c_acctbal"), col("lo"), col("hi"), nb))
    // level 1: per-shard partial histograms; level 2: the merge
    val parts = binned.groupBy("shard", "bin").agg(count(lit(1)).as("cnt"))
    val merged = parts.groupBy("bin").agg(sum("cnt").as("cnt"))
    val cum = U.prefixOffsets(merged, "bin", "cnt")
      .select(col("bin"), (col("off") + col("cnt")).as("cum"))
    // cutpoint per requested rank: first bin whose cumulative count
    // reaches ceil(p·n); the exact quantile lives in that bin, so the
    // bin's upper edge is within one bin width of it (PropertySpec)
    bounds.select(col("lo"), col("hi"), col("n"),
        explode(expr("array(0.25D, 0.5D, 0.75D)")).as("p"))
      .join(broadcast(cum), col("cum") >= expr("CAST(ceil(p * n) AS BIGINT)"))
      .groupBy("p", "lo", "hi")
      .agg(min("bin").as("qbin"))
      .select(col("p"),
        (col("lo") + (col("qbin") + 1) * ((col("hi") - col("lo")) / nb))
          .as("cutpoint"))
      .orderBy("p")
  }

  val queries: Map[String, Q] = Map(
    // Mergeable quantile rollup — the approx-percentile analogue of
    // q_agg_sketch_merge's HLL pair: per-shard fixed-grid histogram
    // partials (256 bins over broadcast [lo, hi]) merge by count sum,
    // then cutpoints come off the merged cumulative histogram. Exact
    // integer counts + same-order IEEE arithmetic → DuckDB-oracled
    // bit-exactly, unlike a GK/KLL sketch whose merge is
    // implementation-defined. Accuracy: |cutpoint − ceil(p·n)-rank order
    // statistic| ≤ (hi−lo)/256 (the rank-stat provably lands in the cut
    // bin), asserted by PropertySpec against the exact order statistics.
    "q_agg_quantile_merge" -> ((s, d) =>
      quantileMergeWith(s, d, col("c_nationkey"))),

    // Flagship — TPC-H Q1 shape (scan → filter → partial/final agg → sort).
    "q_agg_groupby" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(revenue).as("sum_disc_price"),
          dsum(revenue * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct_count" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("uniq_custs"))
        .orderBy("o_orderstatus")),

    // HLL sketch — deterministic (register merge is a commutative max) but
    // not DuckDB-comparable; property-tested against exact ±5% instead.
    "q_agg_approx_distinct" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")),

    // Two-level sketch reaggregation: per-shard partial HLL sketches
    // merged to a global estimate — the rollup shape a 1000-executor
    // distinct count uses (sketch registers are the only distinct-count
    // state that merges associatively; raw sets would shuffle the full
    // key stream). Property-checked: merged estimate is bit-identical to
    // the single-pass sketch and within 5% of exact (register state is a
    // commutative max, so the two-level plan changes nothing).
    "q_agg_sketch_merge" -> ((s, d) =>
      Tables(s, d, "events")
        .withColumn("shard", col("user_id") % 8)
        .groupBy("event_type", "shard")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
        .orderBy("event_type")),

    // Sketch-based audience-overlap estimate: |purchasers ∩ clickers| by
    // inclusion–exclusion over HLL sketches (est_a + est_b − est_union).
    // THE segment-overlap question every audience/report system answers
    // without ever shuffling raw user sets: two KB-scale sketches meet in
    // a broadcast cross join, the union is a register-wise max (so the
    // whole pipeline is order-independent and deterministic — HLL state
    // is a commutative max over deterministic hashes). Self-checked like
    // the other sketch ops (SURVEY Oracle "—"): PropertySpec bounds the
    // estimate against the exact intersection.
    "q_agg_hll_intersect" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val a = ev.where(col("event_type") === "purchase")
        .agg(hll_sketch_agg(col("user_id")).as("sa"))
      val b = ev.where(col("event_type") === "click")
        .agg(hll_sketch_agg(col("user_id")).as("sb"))
      a.crossJoin(broadcast(b))
        .select(hll_sketch_estimate(col("sa")).as("est_a"),
          hll_sketch_estimate(col("sb")).as("est_b"),
          hll_sketch_estimate(hll_union(col("sa"), col("sb"))).as("est_union"))
        .select(col("est_a"), col("est_b"), col("est_union"),
          (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
    }),

    // Numeric binning / histogram over an exact decimal grid: bucket =
    // cents div 3_750_000 (37 500.00-wide bins). The decimal cast makes
    // the boundary arithmetic integer-exact in both engines — a raw
    // double divide would disagree with DuckDB on boundary rows.
    "q_agg_histogram" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 3750000")
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")),

    // Deterministic argmax via lexicographic struct max: the (value,
    // user_id) pair orders by value first, user_id as the tiebreaker, so
    // ties cannot flip the winner run-to-run (max_by alone would be
    // nondeterministic on tied values). One partial+final aggregate.
    "q_agg_argmax" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy("event_type")
        .agg(max(struct(col("value"), col("user_id"))).as("m"))
        .select(col("event_type"), col("m.user_id").as("top_user"),
          col("m.value").as("top_value"))
        .orderBy("event_type")),

    "q_agg_grouping_sets" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(revenue).as("revenue"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("revenue"))
        .orderBy("rf", "ls")),

    "q_agg_rollup" -> ((s, d) =>
      Tables(s, d, "orders")
        .rollup(year(col("o_orderdate")).as("y"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("y"), lit(-1)).as("yr"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("cnt"), col("total"))
        .orderBy("yr", "pri")),

    "q_agg_cube" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy("rf", "ls")),

    "q_agg_conditional" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(
          coalesce(dsum(when(col("event_type") === "purchase", col("value"))),
            lit(0.0)).as("purchase_value"),
          count(when(col("event_type") === "click", lit(1))).as("click_cnt"))
        .orderBy("bucket")),

    "q_agg_collect_sorted" -> ((s, d) => {
      val n = Tables(s, d, "nation")
      val sup = Tables(s, d, "supplier")
      n.join(sup, col("n_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"))
        .orderBy("n_name")
    }),

    "q_agg_having" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 12)
        .orderBy("o_custkey")),

    // listagg (ANSI / Spark 4): ordered string aggregation WITHIN GROUP —
    // the deterministic form; an unordered listagg would hash-drift with
    // partition merge order exactly like a float sum.
    "q_agg_listagg" -> ((s, d) =>
      Tables(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("members"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey")),

    // Statistical aggregates in order-independent form: the built-in
    // stddev/corr use Welford-style merges whose result depends on
    // partition merge order; deriving them from exact decimal sums makes
    // the doubles reproducible in any engine at any parallelism.
    "q_agg_stats" -> ((s, d) => {
      val n = count(lit(1))
      val sx = dsum(col("l_quantity"))
      val sy = dsum(col("l_extendedprice"))
      val sxx = dsum(col("l_quantity") * col("l_quantity"))
      val syy = dsum(col("l_extendedprice") * col("l_extendedprice"))
      val sxy = dsum(col("l_quantity") * col("l_extendedprice"))
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(n.as("n"), sx.as("sx"), sy.as("sy"), sxx.as("sxx"),
          syy.as("syy"), sxy.as("sxy"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("median_price"))
        .select(col("l_returnflag"), col("n"),
          round(col("sx") / col("n"), 6).as("mean_qty"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6)
            .as("stddev_qty"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
              (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"),
          col("median_price"))
        .orderBy("l_returnflag")
    }),

    // Higher-moment statistics (skewness + excess kurtosis) from EXACT
    // raw power sums — Spark's built-in skewness/kurtosis accumulate
    // doubles in partition order (non-deterministic merge), so instead
    // the four power sums run in integer cents through DECIMAL(38,0)
    // (c⁴ ≤ 1e20 per row, totals ≤ ~1e24 — inside 38 digits); the
    // moment formulas then evaluate in doubles in ONE textual order
    // mirrored by the oracle (same-order IEEE ⇒ bit-identical), pinned
    // to the 1e-9 grid. Constant series → NULL explicitly (A = 0 would
    // hit Spark-Inf-vs-DuckDB-NULL division divergence). n enters the
    // formulas as DOUBLE: n·n·n in 64-bit integers wraps silently past
    // n ≈ 2.1M rows/group (the ×100 replica is already at that cliff),
    // while the double product merely rounds — and rounds identically
    // in both engines, preserving the bit-identity contract.
    "q_agg_skew_kurtosis" -> ((s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val c9 = round(col("value") * 100).cast("long")
        .cast(org.apache.spark.sql.types.DecimalType(9, 0))
      val nd = col("n").cast("double")
      val a = nd * col("s2") - col("s1") * col("s1")
      val b = nd * nd * col("s3") -
        lit(3) * nd * col("s1") * col("s2") +
        lit(2) * col("s1") * col("s1") * col("s1")
      val cc = nd * nd * nd * col("s4") -
        lit(4) * nd * nd * col("s1") * col("s3") +
        lit(6) * nd * col("s1") * col("s1") * col("s2") -
        lit(3) * col("s1") * col("s1") * col("s1") * col("s1")
      Tables(s, d, "events")
        .select(col("event_type"), c9.as("c"))
        .withColumn("c2", col("c") * col("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast(dec38)).cast("double").as("s1"),
          sum(col("c2").cast(dec38)).cast("double").as("s2"),
          sum((col("c2") * col("c")).cast(dec38)).cast("double").as("s3"),
          sum((col("c2") * col("c2")).cast(dec38)).cast("double").as("s4"))
        .select(col("event_type"), col("n").as("n_events"),
          when(a > 0, round(sqrt(nd) * b / pow(a, 1.5), 9)).as("skewness"),
          when(a > 0, round(nd * cc / (a * a) - 3, 9)).as("kurtosis"))
        .orderBy("event_type")
    }),

    // Incremental aggregate maintenance — the materialized-view pattern:
    // the per-group PARTIAL state of the history (everything before the
    // split) merges with the current-period delta by partial-sum
    // addition. Correctness is the "incremental ≡ full recompute"
    // identity, and the ORACLE IS the full recompute — the driver's hash
    // compare proves the merge loses nothing. At 100 TB the state table
    // is |groups| rows, the delta scan is the only O(new data) work, and
    // the merge is one tiny shuffle; decimal partials make the re-sum
    // exact in any merge order (same rule as every dsum).
    "q_agg_incremental_merge" -> ((s, d) => {
      val split = ts("2001-01-01")
      def part(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast(D)).as("sp"))
      val o = Tables(s, d, "orders")
      part(o.where(col("o_orderdate") < split))
        .unionByName(part(o.where(col("o_orderdate") >= split)))
        .groupBy("o_orderstatus")
        .agg(sum(col("n")).as("n_orders"),
          sum(col("sp")).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    })
  )

  private val oRev = "l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)"

  val oracle: Map[String, String] = Map(
    // same construction, window allowed on the oracle side (DuckDB has
    // no scale constraint); p must be DOUBLE or DuckDB's decimal
    // literals change the output schema
    "q_agg_quantile_merge" ->
      """WITH b AS (SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi,
                      COUNT(*) AS n FROM customer),
         x AS (SELECT CASE WHEN hi <= lo THEN 255 ELSE
                 LEAST(255, CAST(FLOOR((c_acctbal - lo) / ((hi - lo) / 256))
                   AS INT)) END AS bin FROM customer, b),
         h AS (SELECT bin, COUNT(*) AS cnt FROM x GROUP BY bin),
         c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h),
         p AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                 CAST(0.75 AS DOUBLE)]) AS p)
         SELECT p, lo + (MIN(bin) + 1) * ((hi - lo) / 256) AS cutpoint
         FROM p, b, c WHERE cum >= CAST(ceil(p * n) AS BIGINT)
         GROUP BY p, lo, hi ORDER BY p""",

    "q_agg_listagg" ->
      """SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members,
           COUNT(*) AS n
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "q_agg_histogram" ->
      """SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // 3750000 AS bucket,
            COUNT(*) AS cnt
          FROM orders GROUP BY 1 ORDER BY bucket""",

    "q_agg_argmax" ->
      """SELECT event_type, user_id AS top_user, value AS top_value
         FROM (SELECT event_type, user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY value DESC, user_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY event_type""",

    "q_agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${oDsum("l_quantity")} AS sum_qty,
            ${oDsum("l_extendedprice")} AS sum_base_price,
            ${oDsum(oRev)} AS sum_disc_price,
            ${oDsum(s"$oRev * (CAST(1.0 AS DOUBLE) + l_tax)")} AS sum_charge,
            ${oDavg("l_quantity")} AS avg_qty,
            ${oDavg("l_extendedprice")} AS avg_price,
            ${oDavg("l_discount")} AS avg_disc,
            COUNT(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct_count" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS uniq_custs
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_agg_grouping_sets" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
            COALESCE(l_linestatus, 'ALL') AS ls,
            COUNT(*) AS cnt, ${oDsum(oRev)} AS revenue
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY rf, ls""",

    "q_agg_rollup" ->
      s"""SELECT COALESCE(CAST(year(o_orderdate) AS INT), -1) AS yr,
            COALESCE(o_orderpriority, 'ALL') AS pri,
            COUNT(*) AS cnt, ${oDsum("o_totalprice")} AS total
          FROM orders
          GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
          ORDER BY yr, pri""",

    "q_agg_cube" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
            COALESCE(l_linestatus, 'ALL') AS ls,
            COUNT(*) AS cnt, ${oDsum("l_quantity")} AS sum_qty
          FROM lineitem
          GROUP BY CUBE (l_returnflag, l_linestatus)
          ORDER BY rf, ls""",

    "q_agg_conditional" ->
      s"""SELECT user_id % 10 AS bucket,
            COALESCE(${oDsum("CASE WHEN event_type = 'purchase' THEN value END")},
              CAST(0 AS DOUBLE)) AS purchase_value,
            COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click_cnt
          FROM events GROUP BY bucket ORDER BY bucket""",

    "q_agg_collect_sorted" ->
      """SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
         FROM nation JOIN supplier ON n_nationkey = s_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "q_agg_having" ->
      """SELECT o_custkey, COUNT(*) AS cnt FROM orders
         GROUP BY o_custkey HAVING COUNT(*) > 12 ORDER BY o_custkey""",

    "q_agg_stats" ->
      s"""WITH t AS (SELECT l_returnflag, COUNT(*) AS n,
             ${oDsum("l_quantity")} AS sx,
             ${oDsum("l_extendedprice")} AS sy,
             ${oDsum("l_quantity * l_quantity")} AS sxx,
             ${oDsum("l_extendedprice * l_extendedprice")} AS syy,
             ${oDsum("l_quantity * l_extendedprice")} AS sxy,
             round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
           FROM lineitem GROUP BY l_returnflag)
          SELECT l_returnflag, n,
            round(sx / n, 6) AS mean_qty,
            round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
            round((sxy - sx * sy / n) /
              sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qty_price,
            median_price
          FROM t ORDER BY l_returnflag""",

    "q_agg_skew_kurtosis" ->
      """WITH e AS (SELECT event_type,
             CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c
           FROM events),
         g AS (SELECT event_type, COUNT(*) AS n,
             CAST(COUNT(*) AS DOUBLE) AS nf,
             CAST(SUM(c) AS DOUBLE) AS s1,
             CAST(SUM(c * c) AS DOUBLE) AS s2,
             CAST(SUM(c * c * c) AS DOUBLE) AS s3,
             CAST(SUM(c * c * c * c) AS DOUBLE) AS s4
           FROM e GROUP BY event_type)
         SELECT event_type, n AS n_events,
           CASE WHEN nf * s2 - s1 * s1 > 0 THEN
             round(sqrt(nf) * (nf * nf * s3 - 3 * nf * s1 * s2 + 2 * s1 * s1 * s1)
               / pow(nf * s2 - s1 * s1, 1.5), 9) END AS skewness,
           CASE WHEN nf * s2 - s1 * s1 > 0 THEN
             round(nf * (nf * nf * nf * s4 - 4 * nf * nf * s1 * s3
                 + 6 * nf * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)
               / ((nf * s2 - s1 * s1) * (nf * s2 - s1 * s1)) - 3, 9) END AS kurtosis
         FROM g ORDER BY event_type""",

    // deliberately the FULL recompute — the hash compare against the
    // incremental merge proves state + delta ≡ batch
    "q_agg_incremental_merge" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
           ${oDsum("o_totalprice")} AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
