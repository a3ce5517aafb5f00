package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Relational operator catalog over the TPC-H-ish testdata.
  *
  * Each entry is a declarative DataFrame program (Catalyst handles
  * pushdown/pruning/join strategy) paired with a DuckDB oracle in
  * [[oracles]]. Generalizes the reference's relational surface
  * (reference: clickhouse_migrate/migrate.py:26-41 — scan, project/alias,
  * cast, join, null predicates, counts; tests/test_clickhouse_migration.py:
  * 103-112 — COUNT(*) WHERE verification queries) to the full operator
  * families a migration/ETL engine needs at scale.
  */
object Relational {

  /** TPC-H Q1-style wide aggregation: map-side partial agg + exact
    * integer-cents money math. Shuffles once on the (tiny-cardinality)
    * group key — optimal at any scale. */
  val q1Agg: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(col("l_quantity")).cast("long").as("sum_qty"),
      sum(cents(col("l_extendedprice"))).as("sum_base_c"),
      sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("sum_disc_c4"),
      sum(revenueC4(col("l_extendedprice"), col("l_discount"))
        * (lit(100L) + pct(col("l_tax")))).as("sum_charge_c6"),
      avg(col("l_quantity")).as("avg_qty"),
      count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-style: filter → 3-way join → agg → top-k. Small dims
    * (customer) broadcast; top-k is a sort-limit, not a full sort. */
  val q3Topk: Q = (s, dir) => {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("revenue_c4"))
      .orderBy(col("revenue_c4").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style multiway join with region/nation broadcast and a
    * co-located customer-supplier nation predicate. */
  val q5RegionRevenue: Q = (s, dir) => {
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val supp = t(s, dir, "supplier")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey")
        && cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("revenue_c4"))
  }

  /** Filter + projection — both must reach the parquet scan
    * (PushedFilters / 4-column ReadSchema in .explain). */
  val filterProject: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")
        && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_c"))

  /** Top-k with deterministic tiebreak — sort-limit (TakeOrderedAndProject). */
  val topkOrders: Q = (s, dir) =>
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("price_c"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  val aggDistinct: Q = (s, dir) =>
    t(s, dir, "orders").groupBy("o_orderstatus").agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      count(lit(1)).as("n_orders"))

  /** ROLLUP grouping sets. */
  val rollupAgg: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"))

  /** CUBE grouping sets. */
  val cubeAgg: Q = (s, dir) =>
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))

  /** Ranking window with full deterministic ordering. */
  val windowRank: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price_c"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Running-sum analytic window over exact cents. */
  val windowRunningSum: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running_c", sum(cents(col("o_totalprice"))).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("running_c"))
  }

  /** lead/lag navigation — the inter-row delta analytic the window
    * family was missing: each order sees its customer's previous and
    * next order price (exact cents) and the day gap since the
    * previous order (exact integer — datediff of two DATEs). Fully
    * deterministic ordering (date with key tiebreak); boundary rows
    * carry NULLs, which the oracle hash certifies cross-engine. Same
    * scale posture as every window here: one hash-exchange on the
    * partition key, per-customer state is O(1) for lead/lag. */
  val windowLeadLag: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag(cents(col("o_totalprice")), 1).over(w).as("prev_price_c"),
        lead(cents(col("o_totalprice")), 1).over(w).as("next_price_c"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("gap_days"))
  }

  /** Distribution window functions — ntile/percent_rank/cume_dist over
    * a fully deterministic order (price with key tiebreak). All three
    * are rank arithmetic over exact integers: percent_rank =
    * (rank−1)/(n−1) and cume_dist = rows≤current/n are single IEEE
    * divisions, identical cross-engine. */
  val windowDistribution: Q = (s, dir) => {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      ntile(4).over(w).cast("long").as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank6"),
      round(cume_dist().over(w), 6).as("cume6"))
  }

  /** Frame-based analytic windows — first/last/nth value and a sliding
    * 3-row neighborhood sum, all over EXPLICIT ROWS frames with a
    * unique (date, key) order. ROWS (not the default RANGE) because
    * RANGE frames treat order-by peers as one unit and the default
    * last_value frame stops at CURRENT ROW — both classic silent-skew
    * sources; with explicit frames + a total order every engine agrees
    * row-for-row. One user-keyed exchange, then per-partition sorted
    * evaluation — the same shape at any scale. */
  val windowFrameStats: Q = (s, dir) => {
    val order = Seq(col("o_orderdate"), col("o_orderkey"))
    val base = Window.partitionBy("o_custkey").orderBy(order: _*)
    val all = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val upToHere = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nbhd = base.rowsBetween(-1, 1)
    t(s, dir, "orders")
      .withColumn("price_c", cents(col("o_totalprice")))
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("price_c")).over(upToHere).as("first_c"),
        last(col("price_c")).over(upToHere).as("running_last_c"),
        nth_value(col("price_c"), 2).over(all).as("second_c"),
        sum(col("price_c")).over(nbhd).as("nbhd_c"))
  }

  /** UNPIVOT (melt): wide measure columns → (metric, value) rows — the
    * inverse of `pivot_returnflag`. Plans as a Generate (row
    * replication), no shuffle; the measure set is fixed at plan time so
    * the operator scales by rows, not by schema discovery. */
  val unpivotLineitem: Q = (s, dir) =>
    t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
        cents(col("l_extendedprice")).as("price_c"),
        pct(col("l_discount")).as("disc_pct"),
        pct(col("l_tax")).as("tax_pct"))
      .unpivot(Array(col("l_orderkey"), col("ln")),
        Array(col("price_c"), col("disc_pct"), col("tax_pct")),
        "metric", "value_c")

  /** Left-semi join (EXISTS). */
  val semiJoin: Q = (s, dir) => {
    val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    t(s, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** Left-anti join (NOT EXISTS) — also the idiomatic pending-migration
    * shape (SURVEY §2.3 J1). */
  val antiJoin: Q = (s, dir) => {
    val pOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
    t(s, dir, "customer")
      .join(pOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Set union (distinct). */
  val setUnion: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
    ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .union(ord.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      .distinct()
  }

  /** Set intersection. */
  val setIntersect: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
    ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(ord.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
  }

  /** Set difference. */
  val setExcept: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
    ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(ord.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
  }

  /** Multiset (bag) set operators — `intersectAll`/`exceptAll` keep
    * DUPLICATE multiplicities (INTERSECT ALL / EXCEPT ALL), and plan
    * through a genuinely different physical shape than the DISTINCT
    * forms: Spark rewrites them as a count-aggregate per side plus a
    * `Generate(replicate_rows)` that re-expands the min/difference of
    * the multiplicities — no row-by-row anti/semi join. A customer
    * with 3 'F' orders and 1 'P' order appears min(3,1)=1 time in the
    * intersection and 3−1=2 times in the difference. */
  val setIntersectAll: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
    ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersectAll(ord.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
  }

  val setExceptAll: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
    ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .exceptAll(ord.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
  }

  /** Cross join of two tiny dims. */
  val crossJoinSmall: Q = (s, dir) =>
    t(s, dir, "region").crossJoin(t(s, dir, "nation"))
      .select("r_name", "n_name")

  /** Pivot (groupBy().pivot() → case-when aggregate in the oracle). */
  val pivotReturnflag: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")).cast("long"))
      .withColumnRenamed("A", "qty_a").withColumnRenamed("N", "qty_n")
      .withColumnRenamed("R", "qty_r")

  /** Scalar string functions. */
  val scalarString: Q = (s, dir) =>
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("name_u"),
      substring(col("p_type"), 1, 3).as("type3"),
      length(col("p_name")).cast("long").as("name_len"),
      concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
      replace(col("p_name"), lit(" "), lit("_")).as("name_us"))

  /** Scalar date functions (string-rendered for parity). */
  val scalarDate: Q = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      quarter(col("o_orderdate")).cast("long").as("q"),
      date_format(col("o_orderdate"), "yyyy-MM").as("ym"))

  /** Scalar math functions — single IEEE ops, bit-identical cross-engine. */
  val scalarMath: Q = (s, dir) =>
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
      abs(col("l_quantity") - 25).as("qdev"),
      ceil(col("l_extendedprice") / 1000).cast("long").as("price_k_ceil"),
      floor(col("l_quantity") / 7).cast("long").as("q7"),
      (col("l_partkey") % 13).cast("long").as("pk_mod"),
      sqrt(col("l_quantity")).as("q_sqrt"))

  /** md5 content fingerprint — generalizes the reference's
    * tamper-detection hash (reference: migrate.py:85). */
  val scalarHashMd5: Q = (s, dir) =>
    t(s, dir, "customer").select(
      col("c_custkey"), md5(col("c_name")).as("name_md5"))

  /** JSON extraction + aggregation over events.props. */
  val jsonExtract: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
        max(col("k")).as("max_k"))

  /** CASE WHEN classification + aggregation. */
  val caseWhenBuckets: Q = (s, dir) =>
    t(s, dir, "orders")
      .withColumn("bucket",
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 250000, "mid")
          .otherwise("high"))
      .groupBy("bucket").agg(count(lit(1)).as("n"),
        sum(cents(col("o_totalprice"))).as("sum_c"))

  /** GROUP BY + HAVING. */
  val havingFilter: Q = (s, dir) =>
    t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("bal_c"))
      .filter(col("n_cust") >= 50)

  /** Banded (range-condition) join against an inline dim — the non-equi
    * join shape; small side broadcast so it stays a BroadcastNestedLoop
    * over 4 rows, not a shuffle. */
  val rangeJoinBands: Q = (s, dir) => {
    import s.implicits._
    val bands = Seq(
      (0L, 100000L, "b0"), (100000L, 200000L, "b1"),
      (200000L, 300000L, "b2"), (300000L, 10000000L, "b3"))
      .toDF("lo", "hi", "band")
    t(s, dir, "orders")
      .join(broadcast(bands),
        cents(col("o_totalprice")) / 100 >= col("lo")
          && cents(col("o_totalprice")) / 100 < col("hi"))
      .groupBy("band").agg(count(lit(1)).as("n"))
  }

  /** DISTINCT projection. */
  val distinctPairs: Q = (s, dir) =>
    t(s, dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()

  /** Statistical aggregates (sample variants — identical definitions in
    * both engines; rounded to absorb accumulation-order noise). */
  val statsAgg: Q = (s, dir) =>
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr6"),
      round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar4"),
      round(stddev_samp(col("l_quantity")), 6).as("sd_qty6"),
      count(lit(1)).as("n"))

  /** Null-handling semantics: nullif/coalesce/null-safe-equality and
    * null behavior through aggregation. */
  val nullHandling: Q = (s, dir) =>
    t(s, dir, "orders")
      .withColumn("p_status", nullif(col("o_orderstatus"), lit("P")))
      .groupBy(coalesce(col("p_status"), lit("was_p")).as("status_c"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("p_status")).as("n_nonnull"),
        count(when(col("p_status").isNull, 1)).as("n_null"))

  /** Array/higher-order-function surface over the embedding column. */
  val arrayOps: Q = (s, dir) =>
    t(s, dir, "embeddings").filter(col("vec_id") < 100)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
        round(expr("cast(element_at(embedding, 1) as double)"), 6).as("first6"),
        round(expr("cast(array_max(embedding) as double)"), 6).as("max6"),
        round(expr("cast(aggregate(slice(transform(embedding, x -> cast(x as double)), 1, 8), 0D, (a, x) -> a + x) as double)"), 6).as("head_sum6"))

  /** Correlated scalar subquery — Catalyst decorrelates it into a join
    * (RewriteCorrelatedScalarSubquery), so it scales like an aggregation
    * + join instead of a per-row probe. */
  val scalarSubquery: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_sq")
    t(s, dir, "customer").createOrReplaceTempView("customer_sq")
    s.sql("""SELECT c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
             (SELECT CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
              FROM orders_sq WHERE o_custkey = c_custkey
              AND o_orderstatus = 'F') AS f_total_c
             FROM customer_sq""")
  }

  /** Date arithmetic: per-order shipping delay in days, bucketed. */
  val dateArithmetic: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("delay_days"))
      .withColumn("bucket",
        when(col("delay_days") < 30, "lt30")
          .when(col("delay_days") < 90, "lt90")
          .otherwise("ge90"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("delay_days")).as("min_d"),
        max(col("delay_days")).as("max_d"))
  }

  /** SQL-text entry point — the reference's execute_and_inflate surface
    * (reference: migrate.py:12-15: SQL string in, named-column relation
    * out); names/types come from Catalyst analysis instead of driver
    * metadata. */
  val sqlTextQuery: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql("""SELECT o_orderstatus AS status, count(*) AS n,
             CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
             FROM orders_v GROUP BY o_orderstatus""")
  }

  /** Sketch aggregation (HLL++). No DuckDB oracle — sketch estimates are
    * algorithm-specific; the driver records a rows-only check. The exact
    * twin is agg_distinct. */
  val approxDistinct: Q = (s, dir) =>
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"))

  /** TPC-H Q17-style correlated AGGREGATE-IN-PREDICATE: lineitems whose
    * quantity is below half the average quantity of their part. A naive
    * engine re-runs the subquery per outer row (O(N) scans); Catalyst's
    * subquery decorrelation (RewriteCorrelatedScalarSubquery) turns it
    * into ONE per-part aggregate joined back — the shape that survives
    * 100 TB. Complements `scalar_subquery` (subquery in SELECT): here
    * the subquery gates rows, so it lands in the join condition.
    * Parity: l_quantity values are small integers stored as double, so
    * SUM is exact in any order and AVG is a single IEEE division —
    * the `< 0.5*avg` comparison is deterministic cross-engine. */
  val q17SmallQuantity: Q = (s, dir) => {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q17")
    t(s, dir, "part").createOrReplaceTempView("part_q17")
    s.sql("""SELECT p_brand, COUNT(*) AS n,
             CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS total_c
             FROM lineitem_q17 l JOIN part_q17 p ON l.l_partkey = p.p_partkey
             WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                                   FROM lineitem_q17 l2
                                   WHERE l2.l_partkey = l.l_partkey)
             GROUP BY p_brand""")
  }

  /** TPC-H Q4-style correlated EXISTS: orders in a one-year window that
    * have at least one line shipped more than 60 days after the order
    * date (the testdata carries no commit/receipt dates, so the
    * late-line predicate adapts while keeping Q4's exact shape — a
    * correlated EXISTS whose inner condition references BOTH sides).
    * Catalyst's RewritePredicateSubquery decorrelates it to one LEFT
    * SEMI hash join on l_orderkey — per-order short-circuit, no
    * per-row re-scan, no row widening (the semi join never duplicates
    * an order however many late lines it has). ~49% of joined lines
    * pass the 60-day predicate, so the semi-join's early-out is real
    * work avoided, not a no-op. */
  val q4OrderPriority: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_q4")
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    s.sql("""SELECT o_orderpriority, COUNT(*) AS n_orders
             FROM orders_q4
             WHERE o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1997-01-01'
               AND EXISTS (SELECT 1 FROM lineitem_q4
                           WHERE l_orderkey = o_orderkey
                             AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
             GROUP BY o_orderpriority""")
  }

  /** TPC-H Q21-style waiting-supplier: the hardest decorrelation shape
    * in the TPC-H suite — EXISTS and NOT EXISTS over the SAME relation
    * as the outer, with different correlated predicates ("another
    * supplier contributed to this order" / "no OTHER supplier was
    * late"). Catalyst plans the EXISTS as a left-semi and the NOT
    * EXISTS as a left-anti join, both hash joins on l_orderkey; the
    * fact table is scanned three times but each pass stays a plain
    * equi-join a cluster can shuffle-partition — no nested-loop
    * re-evaluation per outer row. Late = shipped > 60 days after the
    * order date, as in [[q4OrderPriority]]. */
  val q21WaitingSupplier: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_q21")
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q21")
    t(s, dir, "supplier").createOrReplaceTempView("supplier_q21")
    s.sql("""SELECT s_name, COUNT(*) AS numwait
             FROM lineitem_q21 l1
             JOIN orders_q21 ON o_orderkey = l1.l_orderkey
             JOIN supplier_q21 ON s_suppkey = l1.l_suppkey
             WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
               AND EXISTS (SELECT 1 FROM lineitem_q21 l2
                           WHERE l2.l_orderkey = l1.l_orderkey
                             AND l2.l_suppkey <> l1.l_suppkey)
               AND NOT EXISTS (SELECT 1 FROM lineitem_q21 l3
                               JOIN orders_q21 o3 ON o3.o_orderkey = l3.l_orderkey
                               WHERE l3.l_orderkey = l1.l_orderkey
                                 AND l3.l_suppkey <> l1.l_suppkey
                                 AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAYS)
             GROUP BY s_name
             ORDER BY numwait DESC, s_name LIMIT 10""")
  }

  /** TPC-H Q22-style dormant-high-balance: an UNCORRELATED scalar
    * subquery (the global positive-balance average) feeding a filter,
    * plus a NOT EXISTS anti-join ("no orders in the last seven
    * months" — this corpus's customers all have old orders, so Q22's
    * no-orders-ever predicate is adapted to a recency cutoff that
    * keeps ~20% of customers). The average is compared in EXACT
    * integer arithmetic — `bal_c * n_pos > sum_pos_c` instead of
    * `bal > avg` — because a floating avg differs in the last ulp
    * across engines' summation orders and a borderline customer would
    * flip the row set (the NOTES_r1 single-division rule, applied as
    * zero divisions). Catalyst evaluates both scalar aggregates once
    * (one-row broadcast each) and the anti-join is a hash join — the
    * customer table is never rescanned per row. */
  val q22DormantBalance: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders_q22")
    t(s, dir, "customer").createOrReplaceTempView("customer_q22")
    s.sql("""WITH pos AS (SELECT CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
                          FROM customer_q22 WHERE c_acctbal > 0)
             SELECT c_mktsegment, COUNT(*) AS n_cust,
                    SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS total_c
             FROM customer_q22
             WHERE CAST(round(c_acctbal*100) AS BIGINT)
                     * (SELECT COUNT(*) FROM pos) > (SELECT SUM(bal_c) FROM pos)
               AND NOT EXISTS (SELECT 1 FROM orders_q22
                               WHERE o_custkey = c_custkey
                                 AND o_orderdate >= TIMESTAMP '2001-01-01')
             GROUP BY c_mktsegment""")
  }

  /** TPC-H Q7-style bi-national volume: the SAME dimension joined in TWO
    * roles (supplier's nation and customer's nation) with a disjunctive
    * pair predicate. The 2-name member filter is applied to each nation
    * role BEFORE the broadcast (dimension pushdown shrinks the build
    * side and lets the probe drop non-qualifying rows at the hash
    * lookup); only the cross-role disjunction remains post-join. */
  val q7NationVolume: Q = (s, dir) => {
    val pair = Seq("NATION_1", "NATION_2")
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val n1 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(n1), supp("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), cust("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("revenue_c4"))
  }

  /** Explicit GROUPING SETS with per-column grouping indicators — the
    * general form behind rollup/cube (`rollup_agg`/`cube_agg` are its
    * prefix/powerset specializations). Spark plans one Expand over the
    * four set shapes, so the input is read once regardless of how many
    * sets are requested. grouping() disambiguates a real NULL group key
    * from a rolled-up one — rendered as its own BIGINT column because
    * hashed output must not rely on NULL-vs-absent conventions. */
  val groupingSetsAgg: Q = (s, dir) => {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    s.sql("""SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
             CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
             COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
             FROM lineitem_gs
             GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
               (l_returnflag), (l_linestatus), ())""")
  }

  /** Ordered string aggregation (listagg/string_agg). collect_list has
    * no deterministic order under parallel aggregation, so the sort
    * happens explicitly AFTER collection (array_sort) — the only
    * order-stable formulation at scale, mirrored by the oracle's
    * `ORDER BY` inside string_agg. */
  val stringAggNations: Q = (s, dir) => {
    val nation = t(s, dir, "nation")
    val region = t(s, dir, "region")
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q19-style DISJUNCTIVE join predicate: OR of conjunction arms
    * mixing dimension and fact columns. The arms' union on the dim
    * column (`p_brand IN (...)`) is applied to the part scan explicitly
    * — the implied-filter extraction that keeps the broadcast build
    * side small when the optimizer can't derive it from the OR — while
    * the full disjunction evaluates post-join on the surviving rows. */
  val q19DisjunctiveJoin: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_brand").isin("Brand#1", "Brand#2"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10)
          && col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 20)
          && col("l_quantity").between(5, 30)))
      .groupBy("p_brand")
      .agg(sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("revenue_c4"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q13-style customer distribution: LEFT OUTER join with a
    * predicate INSIDE the join condition (not a post-join filter — a
    * WHERE would drop the zero-order customers the query exists to
    * count), then two stacked aggregations: orders per customer
    * (COUNT of a nullable side preserves zeros), then customers per
    * order-count. Both shuffles key on grouping columns whose
    * cardinality shrinks at each level — the histogram agg is over at
    * most a few dozen distinct counts regardless of corpus size. */
  val q13CustomerDistribution: Q = (s, dir) => {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey")
        && ord("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15-style top supplier: an aggregate view (quarterly revenue
    * per supplier) consumed twice — once as the join input, once under
    * an uncorrelated scalar MAX. Catalyst evaluates the CTE's agg once
    * per consumer (twice total), the MAX reduces to a one-row broadcast,
    * and the equality keeps ties (the spec's semantics). Revenue is in
    * exact cents×10⁻⁴ so `= MAX(...)` can't be flipped by float
    * accumulation order — the NOTES_r1 rule that makes top-by-equality
    * deterministic cross-engine. */
  val q15TopSupplier: Q = (s, dir) => {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q15")
    t(s, dir, "supplier").createOrReplaceTempView("supplier_q15")
    s.sql("""WITH rev AS (
               SELECT l_suppkey,
                 CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
                   AS total_c4
               FROM lineitem_q15
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1996-04-01'
               GROUP BY l_suppkey)
             SELECT s_suppkey, s_name, total_c4
             FROM supplier_q15 JOIN rev ON s_suppkey = l_suppkey
             WHERE total_c4 = (SELECT MAX(total_c4) FROM rev)""")
  }

  /** TPC-H Q18-style large-volume orders: IN over a groupBy-HAVING
    * subquery (orders whose total quantity exceeds a threshold).
    * Catalyst plans the IN as a left-semi hash join against the
    * pre-aggregated key set — the aggregate runs once, not per outer
    * row, and the semi join never widens the probe side. The outer
    * block then re-aggregates the surviving orders; quantity sums are
    * small exact integers, and top-k output uses the usual
    * sort-limit with a full deterministic tiebreak. */
  val q18LargeOrders: Q = (s, dir) => {
    t(s, dir, "customer").createOrReplaceTempView("customer_q18")
    t(s, dir, "orders").createOrReplaceTempView("orders_q18")
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q18")
    s.sql("""SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
               CAST(SUM(l_quantity) AS BIGINT) AS total_qty
             FROM customer_q18 JOIN orders_q18 ON c_custkey = o_custkey
             JOIN lineitem_q18 ON o_orderkey = l_orderkey
             WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_q18
                                  GROUP BY l_orderkey
                                  HAVING SUM(l_quantity) > 180)
             GROUP BY 1, 2, 3, 4, 5
             ORDER BY price_c DESC, o_orderkey LIMIT 20""")
  }

  /** TPC-H Q2-style minimum-cost supplier: a correlated scalar MIN
    * subquery whose inner block repeats the outer's dim-filter chain
    * (region-qualified suppliers only, on both sides). Catalyst
    * decorrelates to ONE per-part min aggregate joined back — the same
    * RewriteCorrelatedScalarSubquery shape as [[q17SmallQuantity]] but
    * with the correlated side itself a multi-join. Price compares in
    * exact integer cents so `= MIN(...)` keeps ties deterministically;
    * DISTINCT collapses repeat (part, supplier) line matches. */
  val q2MinCostSupplier: Q = (s, dir) => {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q2")
    t(s, dir, "part").createOrReplaceTempView("part_q2")
    t(s, dir, "supplier").createOrReplaceTempView("supplier_q2")
    t(s, dir, "nation").createOrReplaceTempView("nation_q2")
    t(s, dir, "region").createOrReplaceTempView("region_q2")
    s.sql("""SELECT DISTINCT p_partkey, s_suppkey, s_name, n_name,
               CAST(round(l_extendedprice*100) AS BIGINT) AS price_c
             FROM lineitem_q2 JOIN part_q2 ON l_partkey = p_partkey
             JOIN supplier_q2 ON l_suppkey = s_suppkey
             JOIN nation_q2 ON s_nationkey = n_nationkey
             JOIN region_q2 ON n_regionkey = r_regionkey
             WHERE r_name = 'EUROPE' AND p_size = 10
               AND CAST(round(l_extendedprice*100) AS BIGINT) =
                 (SELECT MIN(CAST(round(l2.l_extendedprice*100) AS BIGINT))
                  FROM lineitem_q2 l2
                  JOIN supplier_q2 s2 ON l2.l_suppkey = s2.s_suppkey
                  JOIN nation_q2 n2 ON s2.s_nationkey = n2.n_nationkey
                  JOIN region_q2 r2 ON n2.n_regionkey = r2.r_regionkey
                  WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')""")
  }

  /** TPC-H Q11-style important values: groupBy + HAVING against a
    * FRACTION OF A GLOBAL aggregate (parts carrying more than 1/500 of
    * one nation's total line value). The global total is an uncorrelated
    * scalar subquery — evaluated once, broadcast as one row — and the
    * comparison is exact-integer cross-multiplication
    * (`value*500 > total`), zero divisions, so no float threshold can
    * flip a borderline part between engines. */
  val q11ImportantValues: Q = (s, dir) => {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q11")
    t(s, dir, "supplier").createOrReplaceTempView("supplier_q11")
    t(s, dir, "nation").createOrReplaceTempView("nation_q11")
    s.sql("""SELECT l_partkey,
               CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_c
             FROM lineitem_q11 JOIN supplier_q11 ON l_suppkey = s_suppkey
             JOIN nation_q11 ON s_nationkey = n_nationkey
             WHERE n_name = 'NATION_1'
             GROUP BY l_partkey
             HAVING SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) * 500 >
               (SELECT SUM(CAST(round(l2.l_extendedprice*100) AS BIGINT)
                   * CAST(l2.l_quantity AS BIGINT))
                FROM lineitem_q11 l2
                JOIN supplier_q11 s2 ON l2.l_suppkey = s2.s_suppkey
                JOIN nation_q11 n2 ON s2.s_nationkey = n2.n_nationkey
                WHERE n2.n_name = 'NATION_1')""")
  }

  /** TPC-H Q14-style promo revenue share: conditional aggregation ratio
    * — CASE inside SUM classifies revenue by a dim attribute, then ONE
    * division of the two exactly-computed integer sums per group (the
    * single-division rule; `100.0 * a / b` is two IEEE ops on exact
    * operands, identical cross-engine). Groups by ship year so the
    * ratio trend is visible instead of Q14's single global row. */
  val q14PromoRevenue: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          revenueC4(col("l_extendedprice"), col("l_discount"))).otherwise(0L))
          .cast("long").as("promo_c4"),
        sum(revenueC4(col("l_extendedprice"), col("l_discount")))
          .cast("long").as("total_c4"))
      .withColumn("promo_pct", lit(100.0) * col("promo_c4") / col("total_c4"))
  }

  /** TPC-H Q20-style dominant suppliers: nested IN whose subquery joins
    * a per-(part,supplier) aggregate against the per-part total — "this
    * supplier shipped more than 3/4 of the part's yearly volume". The
    * decorrelated two-aggregate join IS the scalable form of Q20's
    * correlated HAVING (one pass each over the window slice, equi-join
    * on part), and the outer IN plans as a left-semi hash join. The
    * dominance test is exact-integer cross-multiplication — zero
    * divisions. The volume floor (`qty_p >= 30`) keeps the predicate
    * discriminating on this corpus (28 of 100 suppliers excluded). */
  val q20DominantSuppliers: Q = (s, dir) => {
    t(s, dir, "supplier").createOrReplaceTempView("supplier_q20")
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q20")
    s.sql("""SELECT s_suppkey, s_name FROM supplier_q20
             WHERE s_suppkey IN (
               SELECT ps.l_suppkey FROM
                 (SELECT l_partkey, l_suppkey,
                    CAST(SUM(l_quantity) AS BIGINT) AS qty_ps
                  FROM lineitem_q20
                  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                    AND l_shipdate < TIMESTAMP '1998-01-01'
                  GROUP BY l_partkey, l_suppkey) ps
               JOIN (SELECT l_partkey,
                       CAST(SUM(l_quantity) AS BIGINT) AS qty_p
                     FROM lineitem_q20
                     WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate < TIMESTAMP '1998-01-01'
                     GROUP BY l_partkey) pt
               ON ps.l_partkey = pt.l_partkey
               WHERE 4 * ps.qty_ps > 3 * pt.qty_p AND pt.qty_p >= 30)""")
  }

  /** TPC-H Q8-style market share: the two-role nation join of
    * [[q7NationVolume]] (customer's nation via region gate, supplier's
    * nation as the share subject) feeding a per-year conditional ratio.
    * Share numerator/denominator ship as exact integers PLUS the
    * rounded single-division share — the int columns are the hash
    * anchor, the ratio the human-facing number. Nation/region dims
    * broadcast; the fact chain shuffles on join keys only. */
  val q8MarketShare: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val n1 = t(s, dir, "nation").select(
      col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val n2 = t(s, dir, "nation").select(
      col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(n1), cust("c_nationkey") === col("c_nk"))
      .join(broadcast(region), col("c_rk") === region("r_regionkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(n2), supp("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1",
          revenueC4(col("l_extendedprice"), col("l_discount"))).otherwise(0L))
          .cast("long").as("nation_c4"),
        sum(revenueC4(col("l_extendedprice"), col("l_discount")))
          .cast("long").as("total_c4"))
      .withColumn("share6",
        round(col("nation_c4").cast("double") / col("total_c4"), 6))
  }

  /** TPC-H Q6-style forecasting revenue change: the no-join query — one
    * scan, three pushable predicates, one global sum. Every predicate
    * reaches the parquet reader (PushedFilters), so at 100 TB the query
    * is I/O-bound on row groups whose min/max stats already exclude
    * most of the corpus — the pure predicate-pushdown benchmark. The
    * discount band compares in integer pct (NOTES_r1: never compare
    * floats to float literals across engines). */
  val q6RevenueDelta: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && pct(col("l_discount")).between(4, 6)
        && col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice")) * pct(col("l_discount")))
        .as("disc_revenue_c4"),
        count(lit(1)).as("n"))

  /** TPC-H Q9-style product-type profit: profit per supplier-nation per
    * year over a name-matched part subset. The corpus has no partsupp
    * table, so supply cost adapts to `p_retailprice × quantity` — the
    * shape (LIKE-filtered dim gating a 3-dim fact chain, two-column
    * group) is Q9's. The LIKE filter applies to `part` BEFORE its
    * broadcast (a contains-match can't push to parquet stats, but it
    * runs on the tiny dim, not the fact table); profit is exact c4
    * integers: both terms scale to cents×100 before the subtraction so
    * the mixed-unit difference can't round differently per engine. */
  val q9ProductProfit: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_name").contains("widget"))
    val supp = t(s, dir, "supplier")
    val nation = t(s, dir, "nation")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(sum(revenueC4(col("l_extendedprice"), col("l_discount"))
          - cents(col("p_retailprice")) * col("l_quantity").cast("long") * 100L)
        .as("profit_c4"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q10-style returned-item reporting: which customers returned
    * the most revenue in a quarter. Classic fact-chain → wide group →
    * top-k: the order-date window pushes to the orders scan, the
    * returnflag filter to the lineitem scan, nation broadcasts, and the
    * output is a TakeOrderedAndProject (per-partition top-20 merged on
    * the driver — never a global sort of all customers). */
  val q10ReturnedItems: Q = (s, dir) => {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val nation = t(s, dir, "nation")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_c"), col("n_name"))
      .agg(sum(revenueC4(col("l_extendedprice"), col("l_discount")))
        .as("revenue_c4"))
      .orderBy(col("revenue_c4").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12-style shipping-priority split: a fact join classified by
    * a DERIVED line attribute (shipping delay bucket — the corpus has
    * no l_shipmode, so the class derives from date arithmetic) with
    * CASE-WHEN conditional counts per priority tier. Q12's essential
    * shape — join, derive, two-way conditional aggregation over a
    * 3-value key — survives intact; both engines compute the delay in
    * integer days, so bucket edges can't drift. */
  val q12ShipPriority: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .withColumn("delay", datediff(col("l_shipdate"), col("o_orderdate")))
      .withColumn("delay_class",
        when(col("delay") < 30, "fast")
          .when(col("delay") < 60, "normal")
          .otherwise("late"))
      .groupBy("delay_class")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
  }

  /** TPC-H Q16-style supplier-relationship count: distinct suppliers
    * per (brand, type, size) over an excluded-supplier NOT IN. The
    * corpus has no partsupp, so the part↔supplier association is the
    * DISTINCT (l_partkey, l_suppkey) projection of lineitem — one
    * two-column scan + distinct, the narrowest possible derivation —
    * and the "complaint" exclusion adapts to negative account balance.
    * The NOT IN plans as a broadcast left-anti hash join (both key
    * sides non-null by schema, so no null-semantics hazard); part is
    * pre-filtered then broadcast; COUNT(DISTINCT) is Spark's two-phase
    * expand aggregate — every step shuffle-bounded by the distinct
    * pair set, never by raw lineitem. */
  val q16SupplierCount: Q = (s, dir) => {
    val pairs = t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
        && col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
    val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    pairs
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Exact percentiles (sort-based); DuckDB quantile_cont uses the same
    * linear-interpolation definition. */
  val percentiles: Q = (s, dir) =>
    t(s, dir, "orders").groupBy("o_orderstatus").agg(
      expr("percentile(o_totalprice, 0.5)").as("p50"),
      expr("percentile(o_totalprice, 0.9)").as("p90"),
      count(lit(1)).as("n"))

  val queries: Seq[(String, Q)] = Seq(
    "q1_agg" -> q1Agg,
    "approx_distinct" -> approxDistinct,
    "percentiles" -> percentiles,
    "q3_topk" -> q3Topk,
    "q5_region_revenue" -> q5RegionRevenue,
    "q4_order_priority" -> q4OrderPriority,
    "q21_waiting_supplier" -> q21WaitingSupplier,
    "q22_dormant_balance" -> q22DormantBalance,
    "q7_nation_volume" -> q7NationVolume,
    "q6_revenue_delta" -> q6RevenueDelta,
    "q9_product_profit" -> q9ProductProfit,
    "q10_returned_items" -> q10ReturnedItems,
    "q12_ship_priority" -> q12ShipPriority,
    "q16_supplier_count" -> q16SupplierCount,
    "q17_small_quantity" -> q17SmallQuantity,
    "q19_disjunctive_join" -> q19DisjunctiveJoin,
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q8_market_share" -> q8MarketShare,
    "q11_important_values" -> q11ImportantValues,
    "q13_customer_distribution" -> q13CustomerDistribution,
    "q14_promo_revenue" -> q14PromoRevenue,
    "q15_top_supplier" -> q15TopSupplier,
    "q18_large_orders" -> q18LargeOrders,
    "q20_dominant_suppliers" -> q20DominantSuppliers,
    "grouping_sets_agg" -> groupingSetsAgg,
    "string_agg_nations" -> stringAggNations,
    "filter_project" -> filterProject,
    "topk_orders" -> topkOrders,
    "agg_distinct" -> aggDistinct,
    "rollup_agg" -> rollupAgg,
    "cube_agg" -> cubeAgg,
    "window_rank" -> windowRank,
    "window_lead_lag" -> windowLeadLag,
    "window_running_sum" -> windowRunningSum,
    "window_distribution" -> windowDistribution,
    "window_frame_stats" -> windowFrameStats,
    "unpivot_lineitem" -> unpivotLineitem,
    "semi_join" -> semiJoin,
    "anti_join" -> antiJoin,
    "set_union" -> setUnion,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_intersect_all" -> setIntersectAll,
    "set_except_all" -> setExceptAll,
    "cross_join_small" -> crossJoinSmall,
    "pivot_returnflag" -> pivotReturnflag,
    "scalar_string" -> scalarString,
    "scalar_date" -> scalarDate,
    "scalar_math" -> scalarMath,
    "scalar_hash_md5" -> scalarHashMd5,
    "json_extract" -> jsonExtract,
    "case_when_buckets" -> caseWhenBuckets,
    "having_filter" -> havingFilter,
    "range_join_bands" -> rangeJoinBands,
    "distinct_pairs" -> distinctPairs,
    "sql_text_query" -> sqlTextQuery,
    "scalar_subquery" -> scalarSubquery,
    "date_arithmetic" -> dateArithmetic,
    "null_handling" -> nullHandling,
    "array_ops" -> arrayOps,
    "stats_agg" -> statsAgg)

  // DuckDB oracles. Money math mirrors Tables.cents exactly:
  // CAST(round(x*100) AS BIGINT).
  private val C = "CAST(round(l_extendedprice*100) AS BIGINT)"
  private val D = "(100 - CAST(round(l_discount*100) AS BIGINT))"
  private val X = "(100 + CAST(round(l_tax*100) AS BIGINT))"

  val oracles: Seq[(String, String)] = Seq(
    "percentiles" ->
      """SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS p50,
         quantile_cont(o_totalprice, 0.9) AS p90, COUNT(*) AS n
         FROM orders GROUP BY o_orderstatus""",
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
          CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
          CAST(SUM($C) AS BIGINT) AS sum_base_c,
          CAST(SUM($C*$D) AS BIGINT) AS sum_disc_c4,
          CAST(SUM($C*$D*$X) AS BIGINT) AS sum_charge_c6,
          AVG(l_quantity) AS avg_qty,
          COUNT(*) AS count_order
          FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q3_topk" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
          o_orderpriority, CAST(SUM($C*$D) AS BIGINT) AS revenue_c4
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND l_shipdate > TIMESTAMP '1998-01-01'
          GROUP BY 1, 2, 3
          ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""",
    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(SUM($C*$D) AS BIGINT) AS revenue_c4
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' GROUP BY n_name""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority""",
    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
         FROM lineitem l1
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN supplier ON s_suppkey = l1.l_suppkey
         WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 10""",
    "q22_dormant_balance" ->
      """WITH pos AS (SELECT CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
                      FROM customer WHERE c_acctbal > 0)
         SELECT c_mktsegment, COUNT(*) AS n_cust,
                CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM customer
         WHERE CAST(round(c_acctbal*100) AS BIGINT)
                 * (SELECT COUNT(*) FROM pos) > (SELECT SUM(bal_c) FROM pos)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2001-01-01')
         GROUP BY c_mktsegment""",
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          CAST(SUM($C*$D) AS BIGINT) AS revenue_c4
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE n1.n_name IN ('NATION_1', 'NATION_2')
            AND n2.n_name IN ('NATION_1', 'NATION_2')
            AND n1.n_name <> n2.n_name
          GROUP BY 1, 2, 3""",
    "q6_revenue_delta" ->
      s"""SELECT CAST(SUM($C * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)
            AS disc_revenue_c4,
          COUNT(*) AS n
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
            AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 4 AND 6
            AND l_quantity < 24""",
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
          CAST(SUM($C*$D
            - CAST(round(p_retailprice*100) AS BIGINT)
              * CAST(l_quantity AS BIGINT) * 100) AS BIGINT) AS profit_c4,
          COUNT(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%widget%'
          GROUP BY 1, 2""",
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name,
          CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_c, n_name,
          CAST(SUM($C*$D) AS BIGINT) AS revenue_c4
          FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1996-04-01'
            AND l_returnflag = 'R'
          GROUP BY 1, 2, 3, 4
          ORDER BY revenue_c4 DESC, c_custkey LIMIT 20""",
    "q12_ship_priority" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
                WHEN date_diff('day', o_orderdate, l_shipdate) < 60 THEN 'normal'
                ELSE 'late' END AS delay_class,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY 1""",
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
         COUNT(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3""",
    "q17_small_quantity" ->
      """SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)
         GROUP BY p_brand""",
    "string_agg_nations" ->
      """SELECT r_name,
         string_agg(n_name, ',' ORDER BY n_name) AS nations,
         COUNT(*) AS n
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q19_disjunctive_join" ->
      s"""SELECT p_brand, CAST(SUM($C*$D) AS BIGINT) AS revenue_c4,
          COUNT(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 1 AND 20)
             OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                 AND l_quantity BETWEEN 5 AND 30)
          GROUP BY p_brand""",
    "q2_min_cost_supplier" ->
      """SELECT DISTINCT p_partkey, s_suppkey, s_name, n_name,
         CAST(round(l_extendedprice*100) AS BIGINT) AS price_c
         FROM lineitem JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE' AND p_size = 10
           AND CAST(round(l_extendedprice*100) AS BIGINT) =
             (SELECT MIN(CAST(round(l2.l_extendedprice*100) AS BIGINT))
              FROM lineitem l2
              JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
              JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')""",
    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN $C*$D ELSE 0 END)
            AS BIGINT) AS nation_c4,
          CAST(SUM($C*$D) AS BIGINT) AS total_c4,
          round(CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN $C*$D ELSE 0 END)
              AS DOUBLE)
            / CAST(SUM($C*$D) AS BIGINT), 6) AS share6
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA'
          GROUP BY 1""",
    "q11_important_values" ->
      """SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_c
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_1'
         GROUP BY l_partkey
         HAVING SUM(CAST(round(l_extendedprice*100) AS BIGINT)
             * CAST(l_quantity AS BIGINT)) * 500 >
           (SELECT SUM(CAST(round(l2.l_extendedprice*100) AS BIGINT)
               * CAST(l2.l_quantity AS BIGINT))
            FROM lineitem l2
            JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            WHERE n2.n_name = 'NATION_1')""",
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         GROUP BY c_count""",
    "q14_promo_revenue" ->
      s"""SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
          CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $C*$D ELSE 0 END)
            AS BIGINT) AS promo_c4,
          CAST(SUM($C*$D) AS BIGINT) AS total_c4,
          100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $C*$D ELSE 0 END)
              AS BIGINT)
            / CAST(SUM($C*$D) AS BIGINT) AS promo_pct
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1""",
    "q15_top_supplier" ->
      s"""WITH rev AS (
            SELECT l_suppkey, CAST(SUM($C*$D) AS BIGINT) AS total_c4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, total_c4
          FROM supplier JOIN rev ON s_suppkey = l_suppkey
          WHERE total_c4 = (SELECT MAX(total_c4) FROM rev)""",
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
         CAST(SUM(l_quantity) AS BIGINT) AS total_qty
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING SUM(l_quantity) > 180)
         GROUP BY 1, 2, 3, 4, 5
         ORDER BY price_c DESC, o_orderkey LIMIT 20""",
    "q20_dominant_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
         WHERE s_suppkey IN (
           SELECT ps.l_suppkey FROM
             (SELECT l_partkey, l_suppkey,
                CAST(SUM(l_quantity) AS BIGINT) AS qty_ps
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l_partkey, l_suppkey) ps
           JOIN (SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT) AS qty_p
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                 GROUP BY l_partkey) pt
           ON ps.l_partkey = pt.l_partkey
           WHERE 4 * ps.qty_ps > 3 * pt.qty_p AND pt.qty_p >= 30)""",
    "grouping_sets_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
         COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), (l_linestatus), ())""",
    "filter_project" ->
      s"""SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT) AS qty,
          $C AS price_c FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity > 45""",
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_c,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "agg_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
         COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus""",
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_c, rnk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(rank() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
           FROM orders) WHERE rnk <= 3""",
    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS running_c
         FROM orders""",
    "window_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
         lag(CAST(round(o_totalprice*100) AS BIGINT)) OVER w AS prev_price_c,
         lead(CAST(round(o_totalprice*100) AS BIGINT)) OVER w AS next_price_c,
         CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
           AS gap_days
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "window_distribution" ->
      """SELECT o_orderkey, o_orderstatus,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank6,
         round(cume_dist() OVER w, 6) AS cume6
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
           ORDER BY o_totalprice, o_orderkey)""",
    "window_frame_stats" ->
      """SELECT o_custkey, o_orderkey,
         first_value(price_c) OVER w_run AS first_c,
         last_value(price_c) OVER w_run AS running_last_c,
         nth_value(price_c, 2) OVER w_all AS second_c,
         CAST(sum(price_c) OVER w_nbhd AS BIGINT) AS nbhd_c
         FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(round(o_totalprice*100) AS BIGINT) AS price_c
               FROM orders)
         WINDOW
           w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_all AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           w_nbhd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)""",
    "unpivot_lineitem" ->
      """SELECT l_orderkey, ln, metric, value_c FROM (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
             CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
             CAST(round(l_discount*100) AS BIGINT) AS disc_pct,
             CAST(round(l_tax*100) AS BIGINT) AS tax_pct
           FROM lineitem WHERE l_orderkey < 1000)
         UNPIVOT (value_c FOR metric IN (price_c, disc_pct, tax_pct))""",
    "semi_join" ->
      """SELECT c_custkey, c_name FROM customer WHERE EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
           AND o_orderpriority = '1-URGENT')""",
    "anti_join" ->
      """SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey
           AND o_orderstatus = 'P')""",
    "set_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         UNION
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "set_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""",
    "cross_join_small" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "pivot_returnflag" ->
      """SELECT l_linestatus,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS BIGINT) AS qty_a,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS BIGINT) AS qty_n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS BIGINT) AS qty_r
         FROM lineitem GROUP BY l_linestatus""",
    "scalar_string" ->
      """SELECT p_partkey, upper(p_name) AS name_u,
         substr(p_type, 1, 3) AS type3,
         CAST(length(p_name) AS BIGINT) AS name_len,
         p_brand || '/' || p_type AS brand_type,
         lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad,
         replace(p_name, ' ', '_') AS name_us
         FROM part""",
    "scalar_date" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(dayofmonth(o_orderdate) AS BIGINT) AS d,
         CAST(quarter(o_orderdate) AS BIGINT) AS q,
         strftime(o_orderdate, '%Y-%m') AS ym
         FROM orders""",
    "scalar_math" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
         abs(l_quantity - 25) AS qdev,
         CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
         CAST(floor(l_quantity / 7) AS BIGINT) AS q7,
         l_partkey % 13 AS pk_mod,
         sqrt(l_quantity) AS q_sqrt
         FROM lineitem""",
    "scalar_hash_md5" ->
      "SELECT c_custkey, md5(c_name) AS name_md5 FROM customer",
    "json_extract" ->
      """SELECT event_type,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         COUNT(*) AS n,
         CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type""",
    "case_when_buckets" ->
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 250000 THEN 'mid'
                ELSE 'high' END AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_c
         FROM orders GROUP BY 1""",
    "having_filter" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
         CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_c
         FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 50""",
    "range_join_bands" ->
      """WITH bands(lo, hi, band) AS (VALUES
           (0, 100000, 'b0'), (100000, 200000, 'b1'),
           (200000, 300000, 'b2'), (300000, 10000000, 'b3'))
         SELECT band, COUNT(*) AS n FROM orders JOIN bands
           ON CAST(round(o_totalprice*100) AS BIGINT) / 100 >= lo
          AND CAST(round(o_totalprice*100) AS BIGINT) / 100 < hi
         GROUP BY band""",
    "distinct_pairs" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "sql_text_query" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM orders GROUP BY o_orderstatus""",
    "scalar_subquery" ->
      """SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
         (SELECT CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
          FROM orders WHERE o_custkey = c_custkey
          AND o_orderstatus = 'F') AS f_total_c
         FROM customer""",
    "date_arithmetic" ->
      """SELECT bucket, COUNT(*) AS n,
         CAST(MIN(delay_days) AS BIGINT) AS min_d,
         CAST(MAX(delay_days) AS BIGINT) AS max_d
         FROM (
           SELECT CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS delay_days,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'lt30'
                  WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'lt90'
                  ELSE 'ge90' END AS bucket
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         GROUP BY bucket""",
    "null_handling" ->
      """SELECT COALESCE(NULLIF(o_orderstatus, 'P'), 'was_p') AS status_c,
         COUNT(*) AS n_rows,
         COUNT(NULLIF(o_orderstatus, 'P')) AS n_nonnull,
         COUNT(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 END) AS n_null
         FROM orders GROUP BY 1""",
    "array_ops" ->
      """SELECT vec_id,
         CAST(len(embedding) AS BIGINT) AS dim,
         CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
         round(CAST(embedding[1] AS DOUBLE), 6) AS first6,
         round(CAST(list_max(embedding) AS DOUBLE), 6) AS max6,
         round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head_sum6
         FROM embeddings WHERE vec_id < 100""",
    "stats_agg" ->
      """SELECT l_returnflag,
         round(corr(l_quantity, l_extendedprice), 6) AS corr6,
         round(covar_samp(l_quantity, l_extendedprice), 4) AS covar4,
         round(stddev_samp(l_quantity), 6) AS sd_qty6,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag""")
}
