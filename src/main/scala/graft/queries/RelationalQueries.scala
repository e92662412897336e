package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import CoreQueries.{dsum, dsumSql}
import QueryRegistry.table

/** Relational breadth over the TPC-H-ish testdata — one query per operator
  * family of SURVEY.md §2.3–2.8 (joins, aggregations, windows, sorts/top-k,
  * set ops, scalar functions). The reference delegates all of these to host
  * MapReduce user code (SURVEY.md §2 [HOST]); here they are Catalyst
  * built-ins, each hash-checked against DuckDB.
  *
  * Determinism rules (SURVEY.md §7.4): every query pins an ORDER BY with a
  * unique tie-break, and every floating-point aggregate goes through the
  * exact decimal-sum pattern (CoreQueries.dsum) so Spark's partial-agg order
  * can't drift the result.
  */
object RelationalQueries {

  /** Multiway join + filtered aggregation (TPC-H Q5 skeleton). Catalyst
    * broadcast-joins the small dims automatically; at cluster scale the big
    * fact-fact join (orders ⋈ lineitem) shuffles on the join key only. */
  def multiwayJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val revenue = dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .join(table(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(table(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(table(spark, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .join(table(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA" &&
        $"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        $"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
      .groupBy($"n_name")
      .agg(revenue.as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy($"n_name")
  }

  val multiwayJoinOracle: String =
    s"""SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  count(*) AS n_lines
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Explicit broadcast join: nation is tiny — never let it shuffle. */
  def broadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "supplier")
      .join(broadcast(table(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_suppliers"), dsum($"s_acctbal").as("total_acctbal"))
      .orderBy($"n_name")
  }

  val broadcastJoinOracle: String =
    s"""SELECT n_name, count(*) AS n_suppliers, ${dsumSql("s_acctbal")} AS total_acctbal
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left-semi join (EXISTS): customers that have at least one order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_acctbal"))
      .orderBy($"c_mktsegment")
  }

  val semiJoinOracle: String =
    s"""SELECT c_mktsegment, count(*) AS n_customers, ${dsumSql("c_acctbal")} AS total_acctbal
       |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no URGENT orders. (The
    * natural "customers with no orders at all" is EMPTY on the driver's
    * data at every SF — an empty result hash-matches any broken anti-join
    * trivially, so the predicate is chosen to keep the result non-empty:
    * ~10% of customers lack an urgent order regardless of scale.) */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders").filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  val antiJoinOracle: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer c WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Outer join with null handling: order counts per customer incl. zero. */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .groupBy($"n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"n_orders")
  }

  val outerJoinOracle: String =
    """SELECT n_orders, count(*) AS n_customers FROM (
      |  SELECT c_custkey, count(o_orderkey) AS n_orders
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |) GROUP BY n_orders ORDER BY n_orders""".stripMargin

  /** Non-equi (theta) condition on top of an equi join. */
  def thetaJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .join(table(spark, dir, "part"),
        $"l_partkey" === $"p_partkey" && $"l_quantity" > $"p_size".cast("double"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"p_brand")
  }

  val thetaJoinOracle: String =
    s"""SELECT p_brand, count(*) AS n_lines, ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > cast(p_size AS double)
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Window: top-3 orders per market segment by price (rank + tie-break). */
  def windowTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val joined = table(spark, dir, "orders")
      .join(table(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
    val w = Window.partitionBy($"c_mktsegment").orderBy($"o_totalprice".desc, $"o_orderkey")
    joined.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"c_mktsegment", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_mktsegment", $"rn")
  }

  val windowTopkPerGroupOracle: String =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  /** Window: running sum + lag over a fixed row frame (deterministic order
    * by (custkey, orderdate, orderkey) ⇒ identical IEEE addition order). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    table(spark, dir, "orders")
      .filter($"o_custkey" < 100)
      .withColumn("running_spend", round(sum($"o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
      .withColumn("prev_orderkey", lag($"o_orderkey", 1).over(w))
      .withColumn("order_seq", row_number().over(w))
      .select($"o_custkey", $"order_seq", $"o_orderkey", $"running_spend", $"prev_orderkey")
      .orderBy($"o_custkey", $"order_seq")
  }

  val windowRunningOracle: String =
    """SELECT o_custkey, order_seq, o_orderkey, running_spend, prev_orderkey FROM (
      |  SELECT o_custkey, o_orderkey,
      |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
      |    lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
      |  FROM orders WHERE o_custkey < 100
      |) ORDER BY o_custkey, order_seq""".stripMargin

  /** Global top-k: Spark plans TakeOrderedAndProject — no full sort at scale. */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }

  val topKOracle: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  /** Set ops over the nation-key sets of customers vs suppliers. */
  private def nationSets(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val c = table(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = table(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    (c, s)
  }

  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val (c, s) = nationSets(spark, dir)
    c.union(s).distinct().orderBy("nationkey")
  }
  val setUnionOracle: String =
    """SELECT c_nationkey AS nationkey FROM customer UNION
      |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val (c, s) = nationSets(spark, dir)
    c.intersect(s).orderBy("nationkey")
  }
  val setIntersectOracle: String =
    """SELECT c_nationkey AS nationkey FROM customer INTERSECT
      |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  /** EXCEPT over custkeys: ordering customers minus those with nonnegative
    * balance = negative-balance customers who placed orders. (The q19/q20
    * nation-key pair is EMPTY under EXCEPT on the driver's data — suppliers
    * cover every customer nation — and an empty result hash-matches any
    * broken EXCEPT trivially, so this lane uses a pair that stays non-empty
    * at every SF: ~9% of customers carry a negative balance.) */
  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders").select($"o_custkey".as("custkey"))
      .except(table(spark, dir, "customer")
        .filter($"c_acctbal" >= 0).select($"c_custkey".as("custkey")))
      .orderBy("custkey")
  }
  val setExceptOracle: String =
    """SELECT o_custkey AS custkey FROM orders EXCEPT
      |SELECT c_custkey FROM customer WHERE c_acctbal >= 0
      |ORDER BY custkey""".stripMargin

  /** Multiset set operations (ALL variants — q19–q21 cover the distinct
    * forms): INTERSECT ALL keeps min(multiplicity) per value, EXCEPT ALL
    * subtracts multiplicities. Spark plans both as aggregations over
    * replicated counts (no row-by-row matching), summarized here per key so
    * the multiplicities themselves are what the oracle checks. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (c, s) = nationSets(spark, dir)
    val ia = c.intersectAll(s).groupBy($"nationkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val ea = c.exceptAll(s).groupBy($"nationkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    ia.unionByName(ea).select($"op", $"nationkey", $"n").orderBy($"op", $"nationkey")
  }

  val setOpsAllOracle: String =
    """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
      |s AS (SELECT s_nationkey AS nationkey FROM supplier),
      |ia AS (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s),
      |ea AS (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s)
      |SELECT 'intersect_all' AS op, nationkey, count(*) AS n FROM ia GROUP BY 2
      |UNION ALL
      |SELECT 'except_all' AS op, nationkey, count(*) AS n FROM ea GROUP BY 2
      |ORDER BY op, nationkey""".stripMargin

  /** count(DISTINCT) — expands to two-phase distinct aggregation. */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_suppliers"),
        count(lit(1)).as("n_lines"))
      .orderBy($"l_returnflag")
  }

  val distinctAggOracle: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ROLLUP hierarchy totals (null grouping keys coalesced for stable sort). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_lines"), dsum($"l_quantity").as("sum_qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n_lines", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  val rollupAggOracle: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       |  coalesce(l_linestatus, 'ALL') AS linestatus,
       |  count(*) AS n_lines, ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over order status × priority. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders")
      .orderBy($"status", $"priority")
  }

  val cubeAggOracle: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** GROUPING SETS (SQL surface; Spark parses and plans Expand). */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority, count(1) AS n_orders
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  val groupingSetsOracle: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n_orders
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  /** HAVING + aggregate filter over a high-cardinality key. */
  def havingAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
      .filter($"sum_qty" > 150.0)
      .orderBy($"sum_qty".desc, $"l_partkey")
      .limit(50)
  }

  val havingAggOracle: String =
    s"""SELECT l_partkey, ${dsumSql("l_quantity")} AS sum_qty, count(*) AS n_lines
       |FROM lineitem GROUP BY l_partkey HAVING ${dsumSql("l_quantity")} > 150.0
       |ORDER BY sum_qty DESC, l_partkey LIMIT 50""".stripMargin

  /** Scalar subquery: orders above the (exactly computed) mean price. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "orders").createOrReplaceTempView("sq_orders")
    spark.sql(
      """SELECT o_orderstatus, count(1) AS n_above
        |FROM sq_orders
        |WHERE o_totalprice > (
        |  SELECT cast(sum(cast(o_totalprice AS decimal(30,10))) AS double) / count(1) FROM sq_orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  val scalarSubqueryOracle: String =
    """SELECT o_orderstatus, count(*) AS n_above
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT cast(sum(cast(o_totalprice AS decimal(30,10))) AS double) / count(*) FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** String scalar functions: substring/upper/length/replace/concat/trim. */
  def scalarStrings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "part")
      .filter($"p_partkey" <= 200)
      .select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        substring($"p_type", 1, 6).as("type6"),
        length($"p_name").cast("long").as("name_len"),
        regexp_replace($"p_brand", "#", "_").as("brand_u"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        ltrim(rtrim($"p_name")).as("trimmed"))
      .orderBy($"p_partkey")
  }

  val scalarStringsOracle: String =
    """SELECT p_partkey, upper(p_name) AS uname, substring(p_type, 1, 6) AS type6,
      |  cast(length(p_name) AS bigint) AS name_len,
      |  regexp_replace(p_brand, '#', '_', 'g') AS brand_u,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  ltrim(rtrim(p_name)) AS trimmed
      |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin

  /** Date/time scalar functions: extraction + truncation + counting. */
  def scalarDates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders")
      .groupBy(
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        date_trunc("month", $"o_orderdate").as("month_start"))
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      .orderBy($"y", $"m")
  }

  val scalarDatesOracle: String =
    s"""SELECT cast(extract(year FROM o_orderdate) AS int) AS y,
       |  cast(extract(month FROM o_orderdate) AS int) AS m,
       |  date_trunc('month', o_orderdate) AS month_start,
       |  count(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin

  /** Math scalar functions restricted to IEEE-exact ops (sqrt/abs/floor/
    * ceil/mod) so both engines produce bit-identical doubles. */
  def scalarMath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .filter($"l_orderkey" <= 500)
      .select(
        $"l_orderkey", $"l_linenumber",
        sqrt($"l_extendedprice").as("sqrt_price"),
        abs($"l_discount" - lit(0.05)).as("abs_disc"),
        floor($"l_quantity").cast("long").as("floor_qty"),
        ceil($"l_quantity").cast("long").as("ceil_qty"),
        ($"l_orderkey" % 7).as("mod7"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val scalarMathOracle: String =
    """SELECT l_orderkey, l_linenumber, sqrt(l_extendedprice) AS sqrt_price,
      |  abs(l_discount - 0.05) AS abs_disc,
      |  cast(floor(l_quantity) AS bigint) AS floor_qty,
      |  cast(ceil(l_quantity) AS bigint) AS ceil_qty,
      |  l_orderkey % 7 AS mod7
      |FROM lineitem WHERE l_orderkey <= 500 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** CASE WHEN conditional aggregation. */
  def caseWhenAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .groupBy($"l_linestatus")
      .agg(
        sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(when($"l_quantity" > 25.0, 1L).otherwise(0L)).as("n_bulk"),
        count(lit(1)).as("n_lines"))
      .orderBy($"l_linestatus")
  }

  val caseWhenAggOracle: String =
    """SELECT l_linestatus,
      |  cast(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS bigint) AS n_returned,
      |  cast(sum(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS bigint) AS n_bulk,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** As-of join (SURVEY.md §2.3 range/as-of row): each purchase event gets
    * the user's most recent prior-or-equal view event. DuckDB's native
    * ASOF JOIN is the oracle for our union+window implementation. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = QueryRegistry.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value".as("view_value"))
    graft.operators.AsOfJoin.asOf(purchases, views, "user_id", "ts", Seq("view_value"))
      .select($"event_id", $"user_id", $"ts", $"value", $"asof_view_value")
      .orderBy($"event_id")
  }

  val asofJoinOracle: String =
    """SELECT p.event_id, p.user_id, cast(p.ts AS TIMESTAMP) AS ts, p.value,
      |  v.value AS asof_view_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin

  /** As-of join with a staleness bound (tolerance): each purchase gets the
    * user's latest prior view ONLY if it is at most 1 hour old — the
    * feature-store freshness rule. Views are pre-deduped to one row per
    * (user, ts) (max value) so the match is tie-free in both engines; the
    * oracle states the same thing as a LATERAL latest-within-window
    * lookup. */
  def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = QueryRegistry.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"value").as("view_value"))
    graft.operators.AsOfJoin.asOfWithin(purchases, views, "user_id", "ts",
        Seq("view_value"), expr("INTERVAL 1 HOUR"))
      .select($"event_id", $"user_id", $"ts", $"value", $"asof_view_value")
      .orderBy($"event_id")
  }

  val asofToleranceOracle: String =
    """WITH v AS (
      |  SELECT user_id, ts, max(value) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
      |), p AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.event_id, p.user_id, cast(p.ts AS TIMESTAMP) AS ts, p.value,
      |  l.view_value AS asof_view_value
      |FROM p LEFT JOIN LATERAL (
      |  SELECT view_value FROM v
      |  WHERE v.user_id = p.user_id AND v.ts <= p.ts AND v.ts + INTERVAL 1 HOUR >= p.ts
      |  ORDER BY v.ts DESC LIMIT 1
      |) l ON TRUE
      |ORDER BY p.event_id""".stripMargin

  /** The PHYSICAL as-of join (q32's semantics through the custom operator
    * ladder's last rung): [[graft.operators.AsOfJoin.asOfMerge]] plants
    * `AsOfMergeJoinNode`, `GraftExtensions`' planner strategy turns it into
    * the streaming-merge exec — each side exchanged and sorted at its own
    * width, one buffered right row per partition, no union widening, no
    * WindowExec state (plan shape pinned in `AsOfMergeJoinSpec`). The right
    * side is (user, ts)-deduped like q113 so the match is tie-free in both
    * engines; the oracle is DuckDB's native ASOF LEFT JOIN. */
  def asofMergeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = QueryRegistry.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"value").as("view_value"))
    graft.operators.AsOfJoin.asOfMerge(purchases, views, "user_id", "ts", Seq("view_value"))
      .select($"event_id", $"user_id", $"ts", $"value", $"asof_view_value")
      .orderBy($"event_id")
  }

  val asofMergeJoinOracle: String =
    """WITH v AS (
      |  SELECT user_id, ts, max(value) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
      |)
      |SELECT p.event_id, p.user_id, cast(p.ts AS TIMESTAMP) AS ts, p.value,
      |  v.view_value AS asof_view_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin

  /** Grouped z-score outlier detection (anomaly lane): per event type, how
    * many values sit beyond 3σ, plus the extreme z-scores. Mean/σ come from
    * EXACT decimal moment sums (same order-free pattern as q105) and the
    * z expression is textually identical in both engines, so even the
    * 3σ boundary test and the rounded extremes hash-match. Two passes:
    * a tiny stats agg (broadcast back) + one map-side scored scan. */
  def zscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def ds(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,10)")).cast("double")
    val ev = QueryRegistry.events(spark, dir)
    val stats = ev.groupBy($"event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        ds($"value").as("sx"), ds($"value" * $"value").as("sxx"))
    ev.join(broadcast(stats), "event_type")
      .select($"event_type", $"n",
        (($"value" - $"sx" / $"n") / sqrt(($"sxx" - $"sx" * $"sx" / $"n") / $"n")).as("z"))
      .groupBy($"event_type")
      .agg(max($"n").cast("long").as("n_events"),
        count(when(abs($"z") > 3.0, 1)).as("n_outliers"),
        round(max($"z"), 6).as("max_z"), round(min($"z"), 6).as("min_z"))
      .orderBy($"event_type")
  }

  /** Robust z-score outliers (median/MAD) — the heavy-tail-safe sibling of
    * [[zscoreOutliers]]: mean/stddev move with the outliers they are meant
    * to find; median and MAD (median absolute deviation) don't. Two grouped
    * exact percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, bit
    * parity proven by q38) with the tiny per-group stats broadcast back —
    * the corpus shuffles only for the two skinny aggregations, never for a
    * sort. Outlier rule: |x − med| > 3.5 · 1.4826 · MAD (1.4826 ≈ 1/Φ⁻¹(¾)
    * scales MAD to σ under normality). */
  def robustZscore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = QueryRegistry.events(spark, dir).select($"event_type", $"value")
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select($"event_type", $"value", $"med", abs($"value" - $"med").as("adev"))
    val mad = dev.groupBy($"event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(max($"med"), 6).as("med"), round(max($"mad"), 6).as("mad"),
        count(when(abs($"value" - $"med") > lit(3.5) * lit(1.4826) * $"mad", 1))
          .as("n_outliers"))
      .orderBy($"event_type")
  }

  val robustZscoreOracle: String =
    """WITH m AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
      |), d AS (
      |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      |  FROM events e JOIN m USING (event_type)
      |), md AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY 1
      |)
      |SELECT d.event_type, count(*) AS n_events,
      |  round(max(d.med), 6) AS med, round(max(mad), 6) AS mad,
      |  count(CASE WHEN abs(d.value - d.med) > 3.5 * 1.4826 * mad THEN 1 END)
      |    AS n_outliers
      |FROM d JOIN md USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val zscoreOutliersOracle: String =
    """WITH st AS (
      |  SELECT event_type, count(*)::DOUBLE AS n,
      |    cast(sum(cast(value AS decimal(38,10))) AS DOUBLE) AS sx,
      |    cast(sum(cast(value * value AS decimal(38,10))) AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1
      |), z AS (
      |  SELECT e.event_type, st.n,
      |    (e.value - sx / n) / sqrt((sxx - sx * sx / n) / n) AS z
      |  FROM events e JOIN st USING (event_type)
      |)
      |SELECT event_type, max(n)::BIGINT AS n_events,
      |  count(CASE WHEN abs(z) > 3.0 THEN 1 END) AS n_outliers,
      |  round(max(z), 6) AS max_z, round(min(z), 6) AS min_z
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  /** Secondary-sort imperative scan ([[graft.operators.OrderedScan]]): per
    * user, gap statistics between consecutive events computed by a single
    * mapPartitions fold over repartition(key) + sortWithinPartitions(key,
    * ts) — §2.10's "genuine per-partition imperative logic" escape hatch,
    * done with the same one-shuffle cost as a window. The oracle restates
    * the fold as a lag-window aggregate. */
  def orderedGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = QueryRegistry.events(spark, dir)
      .select($"user_id", unix_timestamp($"ts").as("t"))
    graft.operators.OrderedScan.perKeyGapStats(ev, "user_id", "t")
      .select($"key".as("user_id"), $"n_events", $"max_gap", $"sum_gap")
      .orderBy($"user_id")
  }

  val orderedGapsOracle: String =
    """WITH g AS (
      |  SELECT user_id, epoch(date_trunc('second', ts))::BIGINT AS t,
      |    lag(epoch(date_trunc('second', ts))::BIGINT)
      |      OVER (PARTITION BY user_id ORDER BY ts) AS pt
      |  FROM events
      |)
      |SELECT user_id, count(*) AS n_events,
      |  coalesce(max(t - pt), 0) AS max_gap,
      |  cast(coalesce(sum(t - pt), 0) AS BIGINT) AS sum_gap
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** SCD type-2 interval build (warehouse temporal modeling): each user's
    * event stream becomes validity intervals [ts, next_ts) via a lead
    * window — the reshape that turns an append-only change log into a
    * point-in-time-joinable dimension (the as-of join q32/q113 is its query
    * twin). Open intervals carry NULL valid_to. One shuffle on the key;
    * summarized per user so the checked output stays compact. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    QueryRegistry.events(spark, dir)
      .filter($"user_id" < 50 && $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .withColumn("dur_s",
        when($"valid_to".isNotNull,
          unix_timestamp($"valid_to") - unix_timestamp($"ts")))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_versions"),
        count($"valid_to").as("n_closed"),
        sum($"dur_s").as("total_dur_s"),
        max($"dur_s").as("max_dur_s"))
      .orderBy($"user_id")
  }

  val scd2IntervalsOracle: String =
    """WITH v AS (
      |  SELECT user_id, ts,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM events WHERE user_id < 50 AND event_type = 'purchase'
      |), d AS (
      |  SELECT user_id, valid_to,
      |    CASE WHEN valid_to IS NOT NULL THEN
      |      epoch(date_trunc('second', valid_to))::BIGINT - epoch(date_trunc('second', ts))::BIGINT
      |    END AS dur_s
      |  FROM v
      |)
      |SELECT user_id, count(*) AS n_versions, count(valid_to) AS n_closed,
      |  cast(sum(dur_s) AS BIGINT) AS total_dur_s, max(dur_s) AS max_dur_s
      |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Triangle counting on the nation trade graph (customer-nation →
    * supplier-nation edges, undirected, deduped): the canonical-ordering
    * a < b < c double-join — each triangle counted exactly once, join
    * fan-out bounded by node degree. PageRank (q101) is the iterative
    * lane; this is the motif-counting one. */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .join(table(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(table(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"c_nationkey".as("u"), $"s_nationkey".as("v"))
      .filter($"u" =!= $"v")
    // undirected canonical edges (lo < hi), deduped
    val edges = raw.select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b")).distinct()
    val e1 = edges.select($"a", $"b")
    val e2 = edges.select($"a".as("b"), $"b".as("c"))
    val e3 = edges.select($"a".as("a2"), $"b".as("c2"))
    val tri = e1.join(e2, "b")
      .join(e3, $"a" === $"a2" && $"c" === $"c2")
      .select($"a", $"b", $"c")
    tri.groupBy($"a").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"a")
  }

  val triangleCountOracle: String =
    """WITH raw AS (
      |  SELECT DISTINCT least(c_nationkey, s_nationkey) AS a,
      |    greatest(c_nationkey, s_nationkey) AS b
      |  FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE c_nationkey != s_nationkey
      |)
      |SELECT e1.a, count(*) AS n_triangles
      |FROM raw e1
      |JOIN raw e2 ON e1.b = e2.a
      |JOIN raw e3 ON e3.a = e1.a AND e3.b = e2.b
      |GROUP BY e1.a ORDER BY e1.a""".stripMargin

  /** Percentile winsorization (outlier clipping) per group: values clipped
    * to their group's [p01, p99] band — the data-cleaning twin of q112's
    * outlier DETECTION. Bounds come from the exact `percentile` (bit-equal
    * to quantile_cont, cf. q38) ROUNDED to 4 decimals so the clipped
    * replacement values stay inside the decimal-exact dsum domain (raw
    * interpolated doubles have arbitrary mantissas; 4-dp values round-trip
    * the decimal(30,10) fold exactly, same argument as 2-dp money). Two
    * passes: tiny bounds agg broadcast back over one clipping scan. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, dir, "lineitem")
    val bounds = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.01D, 0.99D))").as("ps"))
      .select($"l_returnflag",
        round(element_at($"ps", 1), 4).as("p01"),
        round(element_at($"ps", 2), 4).as("p99"))
    li.join(broadcast(bounds), "l_returnflag")
      .select($"l_returnflag", $"p01", $"p99", $"l_extendedprice",
        least(greatest($"l_extendedprice", $"p01"), $"p99").as("w"))
      .groupBy($"l_returnflag")
      .agg(count(when($"l_extendedprice" < $"p01" || $"l_extendedprice" > $"p99", 1))
          .as("n_clipped"),
        dsum($"w").as("sum_winsorized"),
        max($"p01").as("p01"), max($"p99").as("p99"))
      .orderBy($"l_returnflag")
  }

  val winsorizeOracle: String =
    s"""WITH st AS (
       |  SELECT l_returnflag,
       |    round(quantile_cont(l_extendedprice, 0.01), 4) AS p01,
       |    round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
       |  FROM lineitem GROUP BY 1
       |)
       |SELECT l.l_returnflag,
       |  count(CASE WHEN l_extendedprice < p01 OR l_extendedprice > p99 THEN 1 END) AS n_clipped,
       |  ${dsumSql("least(greatest(l_extendedprice, p01), p99)")} AS sum_winsorized,
       |  max(p01) AS p01, max(p99) AS p99
       |FROM lineitem l JOIN st USING (l_returnflag)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The exact column profile's RAW SCAN: null count and exact distinct
    * cardinality for EVERY lineitem column in ONE pass — the single wide
    * aggregation row is reshaped to per-column rows with a zero-shuffle
    * stack/unpivot, never one scan per column. Exactness costs Catalyst's
    * Expand (every input row replicated once per profiled column, ×11) —
    * the suite's single most expensive scan, which is why consumers go
    * through the [[exactProfileRows]] memo rather than calling this twice.
    * `ProfileAuditPlanSpec` pins the Expand here and its absence in
    * [[profileAuditApprox]]. */
  def profileAuditExactScan(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val cols = li.columns.toSeq
    // r18 optimization: one agg with 11 countDistinct's planned through
    // Catalyst's Expand — every row replicated ×(ncols+1) and the partial
    // aggregate keyed on the full 12-slot (gid, col…) tuple, 200 MB task
    // peaks at sf0.1. One single-distinct aggregate PER COLUMN instead
    // plans the classic two-phase distinct (partial dedup keyed on the one
    // value column, no Expand, ~12× less key hashing), each branch scans
    // only its own parquet column, and the branches are independent stages
    // inside one union job so they fill the cores concurrently (guide
    // §2.3 aggregate-before-shuffle; §2.6 overlap independent work). Same
    // exact values — this is the UNION-ALL shape the DuckDB oracle runs.
    cols.map { c =>
      li.agg(count(lit(1)).as("_n"), count(col(c)).as("_cnt"),
          countDistinct(col(c)).as("_dst"))
        .select(lit(c).as("col_name"), (col("_n") - col("_cnt")).as("n_nulls"),
          col("_dst").as("n_distinct"))
    }.reduce(_ unionByName _)
  }

  /** Exact profile rows, trained ONCE per scale dir through the
    * ArtifactStore memo: q125 serves them directly and q214's agreement
    * lane reuses the SAME values for its exact side, so a suite run pays
    * the Expand scan once instead of twice (~27-30 s each at sf1 — 12% of
    * the sweep, r13 verdict item 2). Bounded: one (col_name, n_nulls,
    * n_distinct) tuple per lineitem column (11), deterministic given the
    * dir — exactly the ArtifactStore contract. */
  private def exactProfileRows(spark: SparkSession, dir: String): Seq[(String, Long, Long)] =
    graft.operators.ArtifactStore.cached("profile_exact", dir) {
      profileAuditExactScan(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    }

  /** Column-profile audit (data-quality sweep) — q125: the exact profile,
    * served from the train-once [[exactProfileRows]] memo (cold path runs
    * [[profileAuditExactScan]]). */
  def profileAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    exactProfileRows(spark, dir)
      .toDF("col_name", "n_nulls", "n_distinct")
      .orderBy($"col_name")
  }

  /** Registered trainer(s) for this module's memoized artifacts (the Bench
    * train-once accounting: cold cost recorded as its own train_* entry,
    * lanes then measure warm incremental cost in every rep). */
  val artifactTrainers: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "train_profile_exact" ->
      ((s: SparkSession, d: String) => { exactProfileRows(s, d); () }))

  /** The exact profile's UNION-ALL branches, shared by the q125 oracle and
    * the q214 agreement oracle. */
  private val profileAuditBranches: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    cols.map(c =>
      s"SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct FROM lineitem")
      .mkString("\nUNION ALL\n")
  }

  val profileAuditOracle: String = profileAuditBranches + "\nORDER BY col_name"

  /** The 100 TB mode of [[profileAudit]]: identical output shape, but
    * `n_distinct` is HLL++-approximate (`approx_count_distinct`, rsd 2%).
    * The exact variant's multi-`countDistinct` plans through Catalyst's
    * Expand — every input row is replicated once PER PROFILED COLUMN (×11
    * here) and each distinct set is materialized in aggregation hash maps,
    * which is the right exactness tool at test scale but the wrong default
    * at 100 TB. This variant keeps ONE pass with NO row multiplication and
    * carries only a fixed-size HLL++ buffer per column through the partial
    * agg (chosen over reshaping to (col, value) rows + [[graft.operators.Cardinality.hllRegisters]],
    * which would also avoid Expand's hash maps but still multiply rows
    * ×ncols into the shuffle). Plan-pinned: `ProfileAuditPlanSpec` asserts
    * no Expand node and agreement with the exact lane within HLL error. */
  def profileAuditApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, dir, "lineitem")
    val cols = li.columns.toSeq
    val aggs = count(lit(1)).as("_n") +:
      cols.flatMap(c => Seq(count(col(c)).as(s"_cnt_$c"),
        approx_count_distinct(col(c), 0.02).as(s"_dst_$c")))
    val row = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', _n - _cnt_$c, _dst_$c").mkString(", ")
    row.selectExpr(s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct)")
      .orderBy($"col_name")
  }

  /** q214 — [[profileAuditApprox]] under the driver gate. A hash oracle
    * cannot check an HLL++ estimate directly (DuckDB cannot replay Spark's
    * sketch), so the lane's OUTPUT is the deterministic agreement verdict:
    * the exact profile columns plus two booleans — null counts identical
    * (they are exact in both modes) and the approximate distinct within
    * 10% relative of exact (HLL++ rsd 2%, the `ProfileAuditPlanSpec`
    * gate) — which the oracle pins to literal TRUE. approx_count_distinct
    * is deterministic (register max-merge is order-free), so the booleans
    * hash stably; any future drift of the approx mode past tolerance flips
    * a boolean and fails the gate. Cost: both modes' single scans — this
    * lane exists to certify the 100 TB mode a user would actually run. */
  def profileAuditAgreement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = profileAudit(spark, dir)
    val approx = profileAuditApprox(spark, dir)
      .select($"col_name", $"n_nulls".as("a_nulls"), $"n_distinct".as("a_distinct"))
    exact.join(approx, "col_name")
      .select($"col_name", $"n_nulls", $"n_distinct",
        ($"a_nulls" === $"n_nulls").as("nulls_exact"),
        (abs($"a_distinct" - $"n_distinct").cast("double") <=
          greatest($"n_distinct".cast("double") * 0.10, lit(1.0)))
          .as("distinct_within_10pct"))
      .orderBy($"col_name")
  }

  val profileAuditAgreementOracle: String =
    s"""WITH ex AS (
       |$profileAuditBranches
       |)
       |SELECT col_name, n_nulls, n_distinct,
       |  TRUE AS nulls_exact, TRUE AS distinct_within_10pct
       |FROM ex ORDER BY col_name""".stripMargin

  /** Retention cohort analysis: users grouped by first-seen week, activity
    * counted per (cohort, active week), retention = active/cohort-size as an
    * exact integer-ratio double — the product-analytics reshape. Three
    * aggregations, all shuffling skinny (user, week) rows; no window, no
    * per-user state. ISO Monday weeks in both engines. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = QueryRegistry.events(spark, dir)
    val firstWeek = ev.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_week"))
    val activity = ev.select($"user_id", date_trunc("week", $"ts").as("active_week")).distinct()
    val size = firstWeek.groupBy($"cohort_week").agg(count(lit(1)).as("cohort_size"))
    activity.join(firstWeek, "user_id")
      .join(size, "cohort_week")
      .groupBy($"cohort_week", $"active_week")
      .agg(count(lit(1)).as("n_active"), max($"cohort_size").as("cohort_size"))
      .withColumn("retention",
        round($"n_active".cast("double") / $"cohort_size".cast("double"), 6))
      .orderBy($"cohort_week", $"active_week")
  }

  val retentionCohortsOracle: String =
    """WITH fw AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY 1
      |), act AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
      |), sz AS (
      |  SELECT cohort_week, count(*) AS cohort_size FROM fw GROUP BY 1
      |)
      |SELECT f.cohort_week, a.active_week,
      |  count(*) AS n_active, max(s.cohort_size) AS cohort_size,
      |  round(count(*)::DOUBLE / max(s.cohort_size)::DOUBLE, 6) AS retention
      |FROM act a
      |JOIN fw f USING (user_id)
      |JOIN sz s ON s.cohort_week = f.cohort_week
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Share-of-total (ratio_to_report): each nation's fraction of global
    * revenue via an empty-frame window over the aggregated rows. The window
    * sum goes through decimal (order-free) — a bare double window sum's
    * value would depend on Spark's partial order and diverge from DuckDB's
    * fold. The window input is already one row per nation, so the global
    * window is 25 rows — the reshape costs nothing after the real agg. */
  def shareOfTotal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy()
    table(spark, dir, "supplier")
      .join(broadcast(table(spark, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"s_acctbal").as("total_bal"))
      .withColumn("share", round($"total_bal".cast("decimal(30,10)") /
        sum($"total_bal".cast("decimal(30,10)")).over(w), 8).cast("double"))
      .orderBy($"n_name")
  }

  val shareOfTotalOracle: String =
    s"""WITH t AS (
       |  SELECT n_name, ${dsumSql("s_acctbal")} AS total_bal
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  GROUP BY n_name
       |)
       |SELECT n_name, total_bal,
       |  cast(round(cast(total_bal AS decimal(30,10)) /
       |    sum(cast(total_bal AS decimal(30,10))) OVER (), 8) AS DOUBLE) AS share
       |FROM t ORDER BY n_name""".stripMargin

  /** first/last/nth_value window functions over each user's event stream —
    * the value-extraction window family q16/q17/q87 don't cover. last_value
    * needs the FULL frame (the default frame ends at CURRENT ROW, silently
    * returning the current row's value — the classic window gotcha). */
  def valueWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val full = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    QueryRegistry.events(spark, dir)
      .withColumn("first_type", first($"event_type").over(full))
      .withColumn("last_type", last($"event_type").over(full))
      .withColumn("second_value", nth_value($"value", 2).over(full))
      .groupBy($"user_id")
      .agg(max($"first_type").as("first_type"), max($"last_type").as("last_type"),
        max($"second_value").as("second_value"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val valueWindowsOracle: String =
    """WITH v AS (
      |  SELECT user_id,
      |    first_value(event_type) OVER w AS first_type,
      |    last_value(event_type) OVER w AS last_type,
      |    nth_value(value, 2) OVER w AS second_value
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT user_id, max(first_type) AS first_type, max(last_type) AS last_type,
      |  max(second_value) AS second_value, count(*) AS n_events
      |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other instead of vanishing — the semantics corner plain
    * equi-joins silently drop. Keys are deterministically NULLified on both
    * sides; the NULL-key group is the interesting row of the output. Spark
    * plans `<=>` as a hash join (null-safe equality is an equi-key).
    *
    * Plan shape: the key domain is TINY (25 nations + NULL) and both sides
    * are large, so the row-level join's output is |C|·|S|/25-ish — the sf1
    * rehearsal measured the naive form at 22× the data ratio, pure
    * many-to-many pair materialization. Since the lane only needs PAIR
    * COUNTS, the scale-correct plan factorizes: aggregate each side to
    * (key, cnt) first, null-safe-join the two ≤26-row aggregates, and
    * multiply — n_pairs(k) = cnt_c(k)·cnt_s(k) exactly, NULL group
    * included, with the `<=>` semantics exercised on the join itself.
    * Cost is two map-side-partial aggregations; the quadratic row blowup
    * never exists. The oracle keeps the naive row-level join, proving the
    * factorization computes the same distribution. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = table(spark, dir, "customer")
      .select(when($"c_custkey" % 10 === 0, lit(null)).otherwise($"c_nationkey").as("ck"))
      .groupBy($"ck").agg(count(lit(1)).as("n_c"))
    val s = table(spark, dir, "supplier")
      .select(when($"s_suppkey" % 7 === 0, lit(null)).otherwise($"s_nationkey").as("sk"))
      .groupBy($"sk").agg(count(lit(1)).as("n_s"))
    c.join(s, $"ck" <=> $"sk")
      .select(coalesce($"ck".cast("string"), lit("NULLKEY")).as("key"),
        ($"n_c" * $"n_s").as("n_pairs"))
      .orderBy($"key")
  }

  val nullSafeJoinOracle: String =
    """WITH c AS (
      |  SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_nationkey END AS ck FROM customer
      |), s AS (
      |  SELECT CASE WHEN s_suppkey % 7 = 0 THEN NULL ELSE s_nationkey END AS sk FROM supplier
      |)
      |SELECT coalesce(ck::VARCHAR, 'NULLKEY') AS key, count(*) AS n_pairs
      |FROM c JOIN s ON ck IS NOT DISTINCT FROM sk
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Correlated scalar subquery (decorrelation): customers above their OWN
    * nation's exact mean balance — Catalyst rewrites the per-row subquery
    * into an aggregate + join (no per-row re-scan), the optimization that
    * makes correlated SQL survive scale at all. Exact decimal mean, same
    * text both engines. */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "customer").createOrReplaceTempView("cs_customer")
    spark.sql(
      """SELECT c_nationkey, count(1) AS n_above
        |FROM cs_customer c
        |WHERE c_acctbal > (
        |  SELECT cast(sum(cast(c2.c_acctbal AS decimal(30,10))) AS double) / count(1)
        |  FROM cs_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  }

  val correlatedSubqueryOracle: String =
    """SELECT c_nationkey, count(*) AS n_above
      |FROM customer c
      |WHERE c_acctbal > (
      |  SELECT cast(sum(cast(c2.c_acctbal AS decimal(30,10))) AS double) / count(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Range join against a literal bucket table (broadcast nested-loop). */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranges = Seq(
      ("b0_tiny", 0.0, 5.0), ("b1_small", 5.0, 10.0), ("b2_mid", 10.0, 20.0),
      ("b3_large", 20.0, 50.0), ("b4_huge", 50.0, 1e9))
      .toDF("bucket", "lo", "hi")
    QueryRegistry.events(spark, dir)
      .join(broadcast(ranges), $"value" >= $"lo" && $"value" < $"hi")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"bucket")
  }

  val rangeJoinOracle: String =
    s"""WITH ranges(bucket, lo, hi) AS (VALUES
       |  ('b0_tiny', 0.0, 5.0), ('b1_small', 5.0, 10.0), ('b2_mid', 10.0, 20.0),
       |  ('b3_large', 20.0, 50.0), ('b4_huge', 50.0, 1e9))
       |SELECT bucket, count(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM events JOIN ranges ON value >= lo AND value < hi
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Bucketed range join ([[graft.operators.RangeJoin]]) — the SCALE path
    * for q33's shape: events matched to OVERLAPPING value windows via an
    * integer-bucket equi-join (width 10) instead of a broadcast nested-loop.
    * The oracle is the plain containment join, so the check proves bucketing
    * neither loses nor duplicates a single (event, window) pair — including
    * events matching several overlapping windows. At cluster scale the BNLJ
    * form tests |events|·|windows| pairs; this form shuffles each event to
    * one bucket and each window to span/width buckets. */
  def bucketedRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val windows = Seq(
      ("w0_starter", 0.0, 15.0), ("w1_casual", 10.0, 40.0), ("w2_engaged", 25.0, 90.0),
      ("w3_any", 0.0, 100.0), ("w4_big", 80.0, 200.0), ("w5_whale", 150.0, 500.0))
      .toDF("win", "lo", "hi")
    graft.operators.RangeJoin.bucketed(
        QueryRegistry.events(spark, dir), windows, "value", "lo", "hi", width = 10.0)
      .groupBy($"win")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .orderBy($"win")
  }

  val bucketedRangeJoinOracle: String =
    s"""WITH windows(win, lo, hi) AS (VALUES
       |  ('w0_starter', 0.0, 15.0), ('w1_casual', 10.0, 40.0), ('w2_engaged', 25.0, 90.0),
       |  ('w3_any', 0.0, 100.0), ('w4_big', 80.0, 200.0), ('w5_whale', 150.0, 500.0))
       |SELECT win, count(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM events JOIN windows ON value >= lo AND value < hi
       |GROUP BY win ORDER BY win""".stripMargin

  /** Array construction + higher-order functions (§2.8 nested types): per
    * customer, the SORTED distinct set of order priorities (collect_set's
    * nondeterministic order pinned by array_sort), then pure array ops —
    * serialize, size, a `transform`+`aggregate` fold (sum of leading
    * digits) and a `filter` predicate count. Arrays dump as strings so the
    * cross-engine compare stays on hashable scalars. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(array_sort(collect_set($"o_orderpriority")).as("prios"))
      .select($"o_custkey",
        concat_ws(",", $"prios").as("prio_list"),
        size($"prios").cast("long").as("n_prio"),
        aggregate(transform($"prios", p => substring(p, 1, 1).cast("int")),
          lit(0), (acc, x) => acc + x).cast("long").as("digit_sum"),
        size(filter($"prios", p => p < "3")).cast("long").as("n_high"))
      .orderBy($"o_custkey")
  }

  val arrayFuncsOracle: String =
    """WITH a AS (
      |  SELECT o_custkey, list_sort(list(DISTINCT o_orderpriority)) AS prios
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o_custkey,
      |  array_to_string(prios, ',') AS prio_list,
      |  len(prios)::BIGINT AS n_prio,
      |  list_sum(list_transform(prios, p -> substring(p, 1, 1)::INT))::BIGINT AS digit_sum,
      |  len(list_filter(prios, p -> p < '3'))::BIGINT AS n_high
      |FROM a ORDER BY o_custkey""".stripMargin

  /** Salted skew join: lineitem×part on partkey with the key salted by the
    * order key — row-identical to the plain join (which IS the oracle), but
    * a hot partkey's rows spread over 16 reducers instead of one. */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, dir, "lineitem").select($"l_partkey".as("partkey"), $"l_orderkey", $"l_quantity")
    val pt = table(spark, dir, "part").select($"p_partkey".as("partkey"), $"p_brand")
    graft.operators.SkewJoin.saltedInnerJoin(li, pt, "partkey", saltBy = "l_orderkey", salts = 16)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"p_brand")
  }

  val saltedJoinOracle: String =
    s"""SELECT p_brand, count(*) AS n_lines, ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Custom typed Aggregator (SURVEY.md §2.10): exact median per group,
    * checked against DuckDB's median(). */
  def medianAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val median = udaf(graft.functions.ExactMedian)
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(median($"l_quantity").as("median_qty"), count(lit(1)).as("n_lines"))
      .orderBy($"l_returnflag")
  }

  val medianAggOracle: String =
    """SELECT l_returnflag, median(l_quantity) AS median_qty, count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact grouped multi-quantiles: Spark's `percentile` and DuckDB's
    * `quantile_cont` share the (1-f)·a + f·b interpolation on the sorted
    * group, so the doubles hash-match bit-for-bit (verified on the price
    * column, where interpolation actually kicks in). A single pass computes
    * all four quantiles per group — the plan is one partial+final agg pair,
    * no per-quantile re-sort. */
  def quantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ps = "array(0.25D, 0.5D, 0.75D, 0.9D)"
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(expr(s"percentile(l_extendedprice, $ps)").as("qs"),
        count(lit(1)).as("n_lines"))
      .select($"l_returnflag",
        element_at($"qs", 1).as("p25"), element_at($"qs", 2).as("p50"),
        element_at($"qs", 3).as("p75"), element_at($"qs", 4).as("p90"),
        $"n_lines")
      .orderBy($"l_returnflag")
  }

  val quantilesOracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.25) AS p25,
      |  quantile_cont(l_extendedprice, 0.5)  AS p50,
      |  quantile_cont(l_extendedprice, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.9)  AS p90,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Pivot (wide aggregation): order totals per priority, one column per
    * order status. The pivot VALUES are declared explicitly — on a 100 TB
    * table an implicit pivot first runs a distinct scan to discover them;
    * declaring them keeps the plan a single partial+final agg with no
    * discovery pass. The oracle is the portable CASE-WHEN encoding. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum($"o_totalprice"))
      .withColumnsRenamed(Map("F" -> "total_f", "O" -> "total_o", "P" -> "total_p"))
      .orderBy($"o_orderpriority")
  }

  val pivotAggOracle: String =
    s"""SELECT o_orderpriority,
       |  ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS total_f,
       |  ${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS total_o,
       |  ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS total_p
       |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Unpivot (melt): the inverse reshape — per-returnflag (sum_qty,
    * sum_disc) pairs melted into (metric, value) rows. Spark's native
    * `unpivot` is a zero-shuffle Expand over the aggregated rows. */
  def unpivotAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(dsum($"l_quantity").as("sum_qty"), dsum($"l_discount").as("sum_disc"))
      .unpivot(Array($"l_returnflag"), Array($"sum_qty", $"sum_disc"), "metric", "value")
      .orderBy($"l_returnflag", $"metric")
  }

  val unpivotAggOracle: String =
    s"""WITH agg AS (
       |  SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
       |    ${dsumSql("l_discount")} AS sum_disc
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
       |UNION ALL
       |SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM agg
       |ORDER BY l_returnflag, metric""".stripMargin

  /** Z-order (Morton-curve) clustering statistics: events keyed by the
    * interleaved (user_id, minute-of-day) bits, grouped into equal 2^12-wide
    * Z-ranges (69 occupied on the sf0.01 grid). Each Z-range covers a bounded RECTANGLE in (user, time) —
    * min/max on both dimensions stay tight simultaneously, which is why
    * sorting a 100 TB table by `zvalue2` before writing
    * (`repartitionByRange(zvalue2).sortWithinPartitions`) lets min-max
    * file statistics skip IO for predicates on either dimension. The
    * oracle re-derives the interleave bit-by-bit in SQL, so the curve
    * value itself is hash-checked cross-engine. */
  def zorderCluster(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    QueryRegistry.events(spark, dir)
      .select($"user_id",
        (hour($"ts") * 60 + minute($"ts")).cast("long").as("moday"))
      .select($"user_id", $"moday",
        graft.functions.ZOrder.zvalue2($"user_id", $"moday").as("z"))
      .groupBy(shiftright($"z", 12).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min($"user_id").as("min_user"), max($"user_id").as("max_user"),
        min($"moday").as("min_moday"), max($"moday").as("max_moday"))
      .orderBy($"z_bucket")
  }

  val zorderClusterOracle: String =
    """WITH z AS (
      |  SELECT user_id,
      |    (extract(hour FROM ts) * 60 + extract(minute FROM ts))::BIGINT AS moday,
      |    list_sum(list_transform(range(0, 16), b ->
      |      ((user_id >> b) & 1) * (1::BIGINT << (2 * b)) +
      |      (((extract(hour FROM ts) * 60 + extract(minute FROM ts))::BIGINT >> b) & 1)
      |        * (1::BIGINT << (2 * b + 1))))::BIGINT AS zv
      |  FROM events
      |)
      |SELECT zv // 4096 AS z_bucket, count(*) AS n,
      |  min(user_id) AS min_user, max(user_id) AS max_user,
      |  min(moday) AS min_moday, max(moday) AS max_moday
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  /** Time-RANGE window frame: each event's trailing-1-hour count and exact
    * value sum per user — the range frame (peers by VALUE distance, not row
    * count) that q17's rows-frame running sum doesn't cover. The frame is
    * defined on WHOLE epoch seconds in BOTH engines (events carry
    * microsecond timestamps — an INTERVAL-precision oracle frame would
    * disagree with the second-truncated Spark ordering on any pair
    * straddling the 3600 s edge, and on same-second peers). Restricted to
    * user_id < 20 to keep the dumped result compact. */
  def timeRangeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_timestamp($"ts"))
      .rangeBetween(-3600L, Window.currentRow)
    QueryRegistry.events(spark, dir)
      .filter($"user_id" < 20)
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", round(sum($"value".cast("decimal(30,10)")).over(w).cast("double"), 4))
      .select($"event_id", $"user_id", $"n_1h", $"sum_1h")
      .orderBy($"event_id")
  }

  val timeRangeWindowOracle: String =
    """SELECT event_id, user_id,
      |  count(*) OVER w AS n_1h,
      |  round(cast(sum(cast(value AS decimal(30,10))) OVER w AS double), 4) AS sum_1h
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts))::BIGINT
      |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Rank-family window functions (ntile / percent_rank / cume_dist) over a
    * TOTAL order (acctbal, custkey) — unique tie-break makes all three
    * deterministic, and the two fractional ranks are exact integer-ratio
    * doubles that hash-match cross-engine. Folded to quartile stats per
    * market segment so the checked output stays compact. */
  def rankFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    table(spark, dir, "customer")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy($"c_mktsegment", $"quartile")
      .agg(count(lit(1)).as("n"), dsum($"c_acctbal").as("sum_bal"),
        max($"pr").as("max_pr"), max($"cd").as("max_cd"))
      .orderBy($"c_mktsegment", $"quartile")
  }

  val rankFamilyOracle: String =
    s"""SELECT c_mktsegment, quartile, count(*) AS n, ${dsumSql("c_acctbal")} AS sum_bal,
       |  max(pr) AS max_pr, max(cd) AS max_cd
       |FROM (
       |  SELECT c_mktsegment, c_acctbal,
       |    ntile(4) OVER w AS quartile,
       |    percent_rank() OVER w AS pr,
       |    cume_dist() OVER w AS cd
       |  FROM customer
       |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
       |)
       |GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile""".stripMargin

  /** Semi-structured extraction: the events `props` JSON column parsed with
    * a declared schema (`from_json` — schema'd parse, no per-row schema
    * inference) and aggregated. §2.8 breadth: JSON is the one scalar domain
    * the TPC-H columns don't exercise. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    QueryRegistry.events(spark, dir)
      .withColumn("k", from_json($"props", org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"k".cast("long")).as("sum_k"),
        count(when($"k" > 50, 1)).as("n_high"))
      .orderBy($"event_type")
  }

  val jsonExtractOracle: String =
    """SELECT event_type, count(*) AS n_events,
      |  cast(sum((props->>'k')::INT) AS BIGINT) AS sum_k,
      |  count(CASE WHEN (props->>'k')::INT > 50 THEN 1 END) AS n_high
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time-series gap-fill (resample): hourly event counts per user with
    * MISSING hours materialized as zero rows — the dense-grid reshape every
    * downstream time-series model needs. The hour spine is generated from
    * the corpus min/max (one tiny agg), cross-joined with the user dim; the
    * sparse counts LEFT-join onto the grid. Spine and dim are broadcast —
    * the only shuffle is the sparse per-(user, hour) aggregation. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = QueryRegistry.events(spark, dir)
    val hours = ev
      .agg(date_trunc("hour", min($"ts")).as("h0"), date_trunc("hour", max($"ts")).as("h1"))
      .select(explode(sequence($"h0", $"h1", expr("INTERVAL 1 HOUR"))).as("h"))
    val users = ev.filter($"user_id" < 5).select($"user_id").distinct()
    val sparse = ev.filter($"user_id" < 5)
      .groupBy($"user_id", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"))
    users.crossJoin(broadcast(hours))
      .join(sparse, Seq("user_id", "h"), "left")
      .select($"user_id", $"h", coalesce($"n", lit(0L)).as("n_events"))
      .orderBy($"user_id", $"h")
  }

  val gapFillOracle: String =
    """WITH b AS (
      |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM events
      |), hours AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b
      |), u AS (
      |  SELECT DISTINCT user_id FROM events WHERE user_id < 5
      |), sparse AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
      |  FROM events WHERE user_id < 5 GROUP BY 1, 2
      |)
      |SELECT u.user_id, hours.h, coalesce(sparse.n, 0) AS n_events
      |FROM u CROSS JOIN hours
      |LEFT JOIN sparse ON sparse.user_id = u.user_id AND sparse.h = hours.h
      |ORDER BY u.user_id, hours.h""".stripMargin

  /** MERGE/upsert: a deterministic "update batch" (even order keys, price
    * bumped 10%, status 'U') merged into a base snapshot (keys not divisible
    * by 3) — update rows replace, new keys insert, unmatched base survives.
    * Row-wise MERGE semantics via [[graft.operators.Merge.upsert]]; the
    * oracle re-derives the same merge with a FULL JOIN + key-presence CASE. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = table(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val base = orders.filter($"o_orderkey" % 3 =!= 0)
    val updates = orders.filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", lit("U").as("o_orderstatus"),
        ($"o_totalprice" * 1.1).as("o_totalprice"))
    graft.operators.Merge.upsert(base, updates, "o_orderkey")
      .select($"o_orderkey", $"o_orderstatus", round($"o_totalprice", 4).as("price"))
      .orderBy($"o_orderkey")
  }

  val mergeUpsertOracle: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 != 0
      |), upd AS (
      |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1::DOUBLE AS o_totalprice
      |  FROM orders WHERE o_orderkey % 2 = 0
      |)
      |SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
      |  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
      |  round(CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE b.o_totalprice END, 4) AS price
      |FROM base b FULL JOIN upd u ON b.o_orderkey = u.o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** Sequence/funnel detection: users whose purchase directly follows three
    * consecutive clicks (ordered by event time, event_id tie-break) — the
    * lag-window pattern-match shape of behavioral analytics; one shuffle on
    * the user, the pattern test is map-side over the sorted partition. */
  def funnelDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    QueryRegistry.events(spark, dir)
      .withColumn("p1", lag($"event_type", 1).over(w))
      .withColumn("p2", lag($"event_type", 2).over(w))
      .withColumn("p3", lag($"event_type", 3).over(w))
      .filter($"event_type" === "purchase" &&
        $"p1" === "click" && $"p2" === "click" && $"p3" === "click")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_conversions"), min($"ts").as("first_conversion"))
      .orderBy($"user_id")
  }

  val funnelDetectOracle: String =
    """WITH lagged AS (
      |  SELECT user_id, ts, event_type,
      |    lag(event_type, 1) OVER w AS p1,
      |    lag(event_type, 2) OVER w AS p2,
      |    lag(event_type, 3) OVER w AS p3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT user_id, count(*) AS n_conversions, min(ts) AS first_conversion
      |FROM lagged
      |WHERE event_type = 'purchase' AND p1 = 'click' AND p2 = 'click' AND p3 = 'click'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Iterative graph analytics: 5 rounds of weighted PageRank (damping
    * 0.85) over the nation trade graph (edge c_nation → s_nation weighted by
    * lineitem count). Each round is join → per-edge contribution →
    * aggregation — the same one-shuffle-per-iteration shape as the dedup
    * pipeline's connected components, unrolled declaratively. Cross-engine
    * exactness: per-edge contributions are identical IEEE expressions
    * ((pr·w)/outw), the per-node fold goes through the order-free
    * decimal(38,18) sum, and each round's result is pinned at 10 decimals —
    * so five compounding iterations still hash-match. Dangling nodes
    * (no out-edges) leak mass, the standard simplification; deterministic
    * either way. */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .join(table(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(table(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges.groupBy($"src").agg(sum($"w").as("outw"))
    val e = edges.join(outw, "src")
    val nodes = table(spark, dir, "nation").select($"n_nationkey".as("node"))
    var pr = nodes.withColumn("pr", lit(1.0 / 25))
    for (_ <- 1 to 5) {
      val mass = e.join(pr, $"src" === $"node")
        .select($"dst",
          (($"pr" * $"w".cast("double")) / $"outw".cast("double")).as("contrib"))
        .groupBy($"dst")
        .agg(sum($"contrib".cast("decimal(38,18)")).cast("double").as("mass"))
      pr = nodes.join(mass, $"node" === $"dst", "left")
        .select($"node",
          round(lit(0.006) + lit(0.85) * coalesce($"mass", lit(0.0)), 10).as("pr"))
    }
    pr.orderBy($"node")
  }

  val pageRankOracle: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.node, round(0.006::DOUBLE + 0.85::DOUBLE * coalesce(m.mass, 0.0::DOUBLE), 10) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT dst, cast(sum(cast((p.pr * w::DOUBLE) / outw::DOUBLE AS decimal(38,18))) AS DOUBLE) AS mass
         |    FROM e JOIN $prev p ON e.src = p.node GROUP BY dst
         |  ) m ON n.node = m.dst
         |)""".stripMargin
    val iters = (1 to 5).map(i => step(if (i == 1) "pr0" else s"pr${i - 1}", s"pr$i"))
    s"""WITH edges AS (
       |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
       |  FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON o_orderkey = l_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2
       |), outw AS (
       |  SELECT src, sum(w) AS outw FROM edges GROUP BY 1
       |), e AS (
       |  SELECT edges.src, dst, w, outw FROM edges JOIN outw USING (src)
       |), nodes AS (
       |  SELECT n_nationkey AS node FROM nation
       |), pr0 AS (
       |  SELECT node, (1.0::DOUBLE / 25) AS pr FROM nodes
       |), ${iters.mkString(", ")}
       |SELECT node, pr FROM pr5 ORDER BY node""".stripMargin
  }

  /** Weighted label-propagation community detection (Raghavan et al. 2007)
    * over the symmetrized nation trade graph — the fourth graph lane next
    * to iterative PageRank (q101), triangle counting (q122), and the
    * connected-components verdicts inside q55. Three SYNCHRONOUS rounds:
    * each node adopts the label with the largest incident edge-weight sum
    * among its neighbors, ties to the smallest label; isolated nodes keep
    * their own. Self-loop edges are dropped (a self-loop is a vote for
    * your own label and freezes propagation).
    *
    * The dense all-pairs trade graph would collapse to ONE community in a
    * round or two (every node hears every label — correct LPA, useless
    * output), so the graph is first sparsified to the union-symmetrized
    * top-k-neighbors-by-weight kNN graph — the standard preprocessing
    * step that makes community structure detectable, and itself a
    * per-node bounded top-k (the library's recurring shape). k = 2 here:
    * the synthetic trade weights are NEAR-UNIFORM (every nation trades
    * with every nation at similar volume), so only aggressive
    * sparsification leaves any detectable structure — on real power-law
    * graphs k of 3–10 is typical. Honest expectation on this corpus: one
    * dominant community plus a small satellite, and the lane's real
    * claim is the exact cross-engine replay of the iterative argmax
    * trajectory.
    *
    * Scale shape: one round = one equi-join of the edge list with the
    * (node, label) table + one (node, label) aggregate + one argmax over
    * per-node candidate rows — the same per-round shuffle budget as
    * PageRank, nothing driver-side. Every quantity is an integer count,
    * so the replay is exact with no float convention needed at all. */
  def labelPropagation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val edges = table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .join(table(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(table(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
    val full = edges.select($"src".as("a"), $"dst".as("b"), $"w")
      .unionByName(edges.select($"dst".as("a"), $"src".as("b"), $"w"))
      .filter($"a" =!= $"b")
      .groupBy($"a", $"b").agg(sum($"w").as("w"))
    val arcs = full
      .withColumn("rn", row_number().over(
        Window.partitionBy($"a").orderBy($"w".desc, $"b")))
      .filter($"rn" <= 2).select($"a", $"b", $"w")
    // union-symmetrize the kept arcs (weights are already symmetric in
    // `full`, so max == the shared weight)
    // r18 optimization: the sparsified graph and the per-round label table
    // are both nation-bounded (≤ 2·25² edge rows, 25 label rows), but left
    // LAZY each round referenced the previous round's tree twice (lbl and
    // pick) and the edge list once — the final plan measured 5,379 lines /
    // 346 Exchanges, re-running the 4-way customer⋈orders⋈lineitem⋈supplier
    // join ~7× per action. One bounded pull of each (the BoundedPull
    // no-leak idiom) makes every round a small plan over local relations
    // and the corpus-sized join run exactly ONCE (guide §1.2 step 1;
    // §3.3 — materialize to truncate giant plans). Values unchanged:
    // integer counts, pulls happen after each round's exact aggregates.
    // r19: the three voting rounds run in DRIVER Scala over the pulled
    // graph — every quantity is an exact integer (long vote sums, argmax
    // with the (sw desc, lbl asc) tie-break), so the replay is trivially
    // value-identical, and each round stops paying a local-relation plan's
    // analysis+codegen cycle (the q201 profiling receipt: 0.15–0.5 s per
    // local plan for ~zero compute). The corpus-sized 4-way join still
    // runs exactly once, inside the one bounded graph pull.
    val undRows = graft.operators.BoundedPull.rows(
      arcs.unionByName(arcs.select($"b".as("a"), $"a".as("b"), $"w"))
        .groupBy($"a", $"b").agg(max($"w").as("w")),
      maxRows = 1 << 16, what = "label-propagation sparsified kNN graph (≤ 2·|nations|² rows)")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))) // (a, b, w)
    val lblFrame0 = table(spark, dir, "nation")
      .select($"n_nationkey".as("node")).withColumn("lbl", $"node")
    val lblSchema = lblFrame0.schema
    var lbl: Map[Int, Int] = graft.operators.BoundedPull.rows(lblFrame0,
      maxRows = 1 << 16, what = "label-propagation node labels (|nations| rows)")
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    for (_ <- 1 to 3) {
      // votes: (a, lbl(b)) → Σw over edges whose endpoint has a label
      // (the old inner join); long sums are order-free
      val votes = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
      undRows.foreach { case (a, b, w) =>
        lbl.get(b).foreach { l =>
          val k = (a, l); votes(k) = votes.getOrElse(k, 0L) + w
        }
      }
      // pick: per a the (sw desc, lbl asc)-first label — row_number rn=1
      val pick: Map[Int, Int] = votes.toSeq
        .groupBy { case ((a, _), _) => a }
        .map { case (a, vs) =>
          a -> vs.map { case ((_, l), sw) => (l, sw) }
            .minBy { case (l, sw) => (-sw, l) }._1
        }
      lbl = lbl.map { case (n, l) => n -> pick.getOrElse(n, l) } // left join + coalesce
    }
    // re-enter Spark with the exact integer labels, same schema the
    // pulled frame had, in the lane's node order
    spark.createDataFrame(
      java.util.Arrays.asList(lbl.toSeq.sortBy(_._1)
        .map(p => org.apache.spark.sql.Row(p._1, p._2)): _*), lblSchema)
      .orderBy($"node")
  }

  val labelPropagationOracle: String = {
    def step(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT l.node, coalesce(p.new_lbl, l.lbl) AS lbl
         |  FROM $prev l LEFT JOIN (
         |    SELECT a AS node, lbl AS new_lbl FROM (
         |      SELECT v.a, v.lbl,
         |        row_number() OVER (PARTITION BY v.a ORDER BY v.sw DESC, v.lbl) AS rn
         |      FROM (
         |        SELECT e.a, x.lbl, sum(e.w) AS sw
         |        FROM und e JOIN $prev x ON x.node = e.b GROUP BY 1, 2
         |      ) v
         |    ) WHERE rn = 1
         |  ) p USING (node)
         |)""".stripMargin
    val iters = (1 to 3).map(i => step(if (i == 1) "l0" else s"l${i - 1}", s"l$i"))
    s"""WITH edges AS (
       |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
       |  FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON o_orderkey = l_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2
       |), full_g AS (
       |  SELECT a, b, cast(sum(w) AS BIGINT) AS w FROM (
       |    SELECT src AS a, dst AS b, w FROM edges
       |    UNION ALL
       |    SELECT dst AS a, src AS b, w FROM edges
       |  ) WHERE a != b GROUP BY 1, 2
       |), arcs AS (
       |  SELECT a, b, w FROM (
       |    SELECT a, b, w, row_number() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
       |    FROM full_g
       |  ) WHERE rn <= 2
       |), und AS (
       |  SELECT a, b, max(w) AS w FROM (
       |    SELECT a, b, w FROM arcs
       |    UNION ALL
       |    SELECT b AS a, a AS b, w FROM arcs
       |  ) GROUP BY 1, 2
       |), l0 AS (
       |  SELECT n_nationkey AS node, n_nationkey AS lbl FROM nation
       |), ${iters.mkString(", ")}
       |SELECT node, lbl FROM l3 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q196
  /** Single-source shortest paths by 4 unrolled min-plus relaxation rounds
    * (Bellman–Ford — the canonical Pregel/BSP example, expressed as the
    * per-round join+aggregate every distributed graph engine lowers it
    * to) over the same sparsified trade graph as q184: dist ← min(dist,
    * min over in-edges (dist(u) + w)). NULL plays infinity through
    * aggregate-min semantics (candidates UNION current, min ignores
    * nothing — absent = still unreachable), so no float and no sentinel
    * arithmetic: all integer, hash-exact, and the unrolled oracle
    * certifies every round's frontier, not just the fixpoint. Per round:
    * one edge⋈dist join + one node-keyed min — the PageRank shuffle
    * budget. */
  def shortestPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val edges = table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .join(table(spark, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(table(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
    val full = edges.select($"src".as("a"), $"dst".as("b"), $"w")
      .unionByName(edges.select($"dst".as("a"), $"src".as("b"), $"w"))
      .filter($"a" =!= $"b")
      .groupBy($"a", $"b").agg(sum($"w").as("w"))
    val arcs = full
      .withColumn("rn", row_number().over(
        Window.partitionBy($"a").orderBy($"w".desc, $"b")))
      .filter($"rn" <= 2).select($"a", $"b", $"w")
    val und = arcs.unionByName(arcs.select($"b".as("a"), $"a".as("b"), $"w"))
      .groupBy($"a", $"b").agg(max($"w").as("w"))
    val nodes = table(spark, dir, "nation").select($"n_nationkey".as("node"))
    var dist = nodes.select($"node",
      when($"node" === 0, 0L).otherwise(lit(null).cast("long")).as("dist"))
    for (_ <- 1 to 4) {
      val reached = dist.filter($"dist".isNotNull)
      val relaxed = und.join(reached.select($"node".as("a"), $"dist"), "a")
        .select($"b".as("node"), ($"dist" + $"w").as("nd"))
        .unionByName(reached.select($"node", $"dist".as("nd")))
        .groupBy($"node").agg(min($"nd").as("nd"))
      dist = nodes.join(relaxed, Seq("node"), "left")
        .select($"node", $"nd".as("dist"))
    }
    dist.orderBy($"node")
  }

  val shortestPathsOracle: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.node, r.nd AS dist
         |  FROM nodes n LEFT JOIN (
         |    SELECT node, min(nd) AS nd FROM (
         |      SELECT e.b AS node, p.dist + e.w AS nd
         |      FROM und e JOIN $prev p ON p.node = e.a AND p.dist IS NOT NULL
         |      UNION ALL
         |      SELECT node, dist AS nd FROM $prev WHERE dist IS NOT NULL
         |    ) GROUP BY node
         |  ) r ON n.node = r.node
         |)""".stripMargin
    val rounds = (1 to 4).map(i => round(if (i == 1) "d0" else s"d${i - 1}", s"d$i"))
    s"""WITH edges AS (
       |  SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
       |  FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON o_orderkey = l_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2
       |), full_g AS (
       |  SELECT a, b, cast(sum(w) AS BIGINT) AS w FROM (
       |    SELECT src AS a, dst AS b, w FROM edges
       |    UNION ALL
       |    SELECT dst AS a, src AS b, w FROM edges
       |  ) WHERE a != b GROUP BY 1, 2
       |), arcs AS (
       |  SELECT a, b, w FROM (
       |    SELECT a, b, w, row_number() OVER (PARTITION BY a ORDER BY w DESC, b) AS rn
       |    FROM full_g
       |  ) WHERE rn <= 2
       |), und AS (
       |  SELECT a, b, max(w) AS w FROM (
       |    SELECT a, b, w FROM arcs
       |    UNION ALL
       |    SELECT b AS a, a AS b, w FROM arcs
       |  ) GROUP BY 1, 2
       |), nodes AS (
       |  SELECT n_nationkey AS node FROM nation
       |), d0 AS (
       |  SELECT node, CASE WHEN node = 0 THEN 0::BIGINT END AS dist FROM nodes
       |), ${rounds.mkString(", ")}
       |SELECT node, dist FROM d4 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q197
  /** Join-key skew audit — the diagnostic that DECIDES when q35's salted
    * join engages: per-key counts of lineitem.l_suppkey reduced to one
    * summary row of n_keys, total, max, skew ratio (max/mean) and the
    * Gini coefficient of the key distribution, all from exact integer
    * sums (Σ rank·count via one window over the KEY table — dimension-
    * sized; for corpus-scale key spaces the rank sum comes from the q115
    * quantile sketch instead). The doubles are conversions of exact
    * integers through textually identical expressions — hash-exact. */
  def keySkewAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = table(spark, dir, "lineitem")
      .groupBy($"l_suppkey").agg(count(lit(1)).as("c"))
    counts
      .withColumn("i", row_number().over(Window.orderBy($"c", $"l_suppkey")).cast("long"))
      .agg(count(lit(1)).as("n_keys"), sum($"c").cast("long").as("total_rows"),
        max($"c").as("max_cnt"), sum($"i" * $"c").cast("long").as("sic"))
      .select($"n_keys", $"total_rows", $"max_cnt",
        round($"max_cnt".cast("double") * $"n_keys".cast("double") /
          $"total_rows".cast("double"), 6).as("skew_ratio"),
        round((lit(2.0) * $"sic".cast("double") -
            ($"n_keys".cast("double") + 1.0) * $"total_rows".cast("double")) /
          ($"n_keys".cast("double") * $"total_rows".cast("double")), 6).as("gini"))
  }

  val keySkewAuditOracle: String =
    """WITH c AS (
      |  SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY 1
      |), idx AS (
      |  SELECT c, cast(row_number() OVER (ORDER BY c, l_suppkey) AS BIGINT) AS i FROM c
      |), m AS (
      |  SELECT count(*) AS n_keys, cast(sum(c) AS BIGINT) AS total_rows,
      |    max(c) AS max_cnt, cast(sum(i * c) AS BIGINT) AS sic
      |  FROM idx
      |)
      |SELECT n_keys, total_rows, max_cnt,
      |  round(max_cnt::DOUBLE * n_keys::DOUBLE / total_rows::DOUBLE, 6) AS skew_ratio,
      |  round((2.0 * sic::DOUBLE - (n_keys::DOUBLE + 1.0) * total_rows::DOUBLE) /
      |    (n_keys::DOUBLE * total_rows::DOUBLE), 6) AS gini
      |FROM m""".stripMargin

  /** Pearson correlation from EXACT moment sums: built-in `corr` uses
    * Welford-style updates whose float error depends on partial-agg order
    * (and differs from DuckDB's implementation), so instead the five moments
    * (Σx, Σy, Σx², Σy², Σxy) go through the order-free decimal fold — exact,
    * the inputs being int-valued quantities × 2-dp prices — and the closed
    * form runs on exact sums in identical IEEE expressions. Single pass,
    * map-side partials, one tiny shuffle: the scale shape of every
    * two-moment statistic. */
  def corrMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def ds(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,10)")).cast("double")
    table(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        ds($"l_quantity").as("sx"), ds($"l_extendedprice").as("sy"),
        ds($"l_quantity" * $"l_quantity").as("sxx"),
        ds($"l_extendedprice" * $"l_extendedprice").as("syy"),
        ds($"l_quantity" * $"l_extendedprice").as("sxy"))
      .select($"l_returnflag", $"n".cast("long").as("n_lines"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy")), 6)
          .as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  val corrMomentsOracle: String = {
    def ds(e: String) = s"cast(sum(cast($e AS decimal(38,10))) AS DOUBLE)"
    s"""WITH m AS (
       |  SELECT l_returnflag, count(*)::DOUBLE AS n,
       |    ${ds("l_quantity")} AS sx, ${ds("l_extendedprice")} AS sy,
       |    ${ds("l_quantity * l_quantity")} AS sxx,
       |    ${ds("l_extendedprice * l_extendedprice")} AS syy,
       |    ${ds("l_quantity * l_extendedprice")} AS sxy
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT l_returnflag, n::BIGINT AS n_lines,
       |  round((n * sxy - sx * sy) /
       |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
       |FROM m ORDER BY l_returnflag""".stripMargin
  }

  /** Typed cogroup (`KeyValueGroupedDataset.cogroup`): per user, both
    * sides' sorted iterators in ONE function call — the per-key merge shape
    * (reconcile two feeds, interval alignment, custom sessionized joins)
    * that plain joins can't express without exploding intermediate rows.
    * Here: order count, event count, and whether the user's first order
    * predates their first event — exact decimal/ordinal logic so the DuckDB
    * oracle can state the same thing as two aggregates + a full outer join.
    * One co-partitioned shuffle of both sides on the key. */
  def cogroupReconcile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = table(spark, dir, "orders")
      .select($"o_custkey".as("k"),
        // TIMESTAMP_NTZ has no direct long cast under ANSI — epoch seconds
        // via the UTC-pinned session's unix_timestamp on a TIMESTAMP view
        unix_timestamp($"o_orderdate".cast("timestamp")).as("t")).as[(Long, Long)]
    val events = QueryRegistry.events(spark, dir)
      .select($"user_id".as("k"), unix_timestamp($"ts").as("t")).as[(Long, Long)]
    orders.groupByKey(_._1).cogroup(events.groupByKey(_._1)) { (k, os, es) =>
      var nOrders = 0L; var minO = Long.MaxValue
      os.foreach { o => nOrders += 1; if (o._2 < minO) minO = o._2 }
      var nEvents = 0L; var minE = Long.MaxValue
      es.foreach { e => nEvents += 1; if (e._2 < minE) minE = e._2 }
      val flag =
        if (nOrders == 0 || nEvents == 0) 0
        else if (minO < minE) 1 else 0
      Iterator((k, nOrders, nEvents, flag))
    }.toDF("k", "n_orders", "n_events", "first_order_first")
      .orderBy($"k")
  }

  val cogroupReconcileOracle: String =
    """WITH o AS (
      |  SELECT o_custkey AS k, count(*) AS n_orders,
      |    min(epoch(o_orderdate))::BIGINT AS min_o
      |  FROM orders GROUP BY 1
      |), e AS (
      |  SELECT user_id AS k, count(*) AS n_events,
      |    min(epoch(date_trunc('second', ts)))::BIGINT AS min_e
      |  FROM events GROUP BY 1
      |)
      |SELECT coalesce(o.k, e.k) AS k,
      |  coalesce(n_orders, 0) AS n_orders, coalesce(n_events, 0) AS n_events,
      |  CASE WHEN n_orders > 0 AND n_events > 0 AND min_o < min_e THEN 1 ELSE 0 END
      |    AS first_order_first
      |FROM o FULL JOIN e ON o.k = e.k
      |ORDER BY k""".stripMargin

  /** Interval-OVERLAP join (interval×interval — the sibling of q107's
    * point-in-interval join): shipment transit windows [shipdate,
    * shipdate + 2·linenumber days) against urgent-order attention windows
    * [orderdate, orderdate + 7 days), both as epoch-day integers, joined by
    * [[graft.operators.IntervalJoin.overlap]]'s chunk equi-join with the
    * report-once rule (no nested loop, no post-join dedup — each
    * overlapping pair meets in exactly one chunk). The transit span is
    * derived from l_linenumber because this testdata has no second date
    * column; the operator itself is span-agnostic. Oracle replays the plain
    * theta join — value-identical by construction. */
  def intervalOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val epoch = lit("1970-01-01")
    val li = table(spark, dir, "lineitem")
      .filter($"l_quantity" === 50.0)
      .select($"l_orderkey",
        datediff($"l_shipdate", epoch).as("t_lo"),
        (datediff($"l_shipdate", epoch) + lit(2) * $"l_linenumber").as("t_hi"))
    val ord = table(spark, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT" && $"o_custkey" < 500)
      .select($"o_custkey",
        datediff($"o_orderdate", epoch).as("w_lo"),
        (datediff($"o_orderdate", epoch) + 7).as("w_hi"))
    graft.operators.IntervalJoin.overlap(li, ord, "t_lo", "t_hi", "w_lo", "w_hi", width = 7.0)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least($"t_hi", $"w_hi") - greatest($"t_lo", $"w_lo")).cast("long")
          .as("sum_overlap_days"))
      .orderBy($"o_custkey")
  }

  val intervalOverlapJoinOracle: String =
    """WITH li AS (
      |  SELECT l_orderkey,
      |    CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS t_lo,
      |    CAST(l_shipdate AS DATE) - DATE '1970-01-01' + 2 * l_linenumber AS t_hi
      |  FROM lineitem WHERE l_quantity = 50
      |), ord AS (
      |  SELECT o_custkey,
      |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS w_lo,
      |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' + 7 AS w_hi
      |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_custkey < 500
      |)
      |SELECT o_custkey, count(*) AS n_overlaps,
      |  cast(sum(least(t_hi, w_hi) - greatest(t_lo, w_lo)) AS BIGINT) AS sum_overlap_days
      |FROM li JOIN ord ON t_lo < w_hi AND w_lo < t_hi
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q10_multiway_join", multiwayJoin, Some(multiwayJoinOracle)),
    Q("q11_broadcast_join", broadcastJoin, Some(broadcastJoinOracle)),
    Q("q12_semi_join", semiJoin, Some(semiJoinOracle)),
    Q("q13_anti_join", antiJoin, Some(antiJoinOracle)),
    Q("q14_outer_join", outerJoin, Some(outerJoinOracle)),
    Q("q15_theta_join", thetaJoin, Some(thetaJoinOracle)),
    Q("q16_window_topk_per_group", windowTopkPerGroup, Some(windowTopkPerGroupOracle)),
    Q("q17_window_running", windowRunning, Some(windowRunningOracle)),
    Q("q18_topk", topK, Some(topKOracle)),
    Q("q19_set_union", setUnion, Some(setUnionOracle)),
    Q("q20_set_intersect", setIntersect, Some(setIntersectOracle)),
    Q("q21_set_except", setExcept, Some(setExceptOracle)),
    Q("q22_distinct_agg", distinctAgg, Some(distinctAggOracle)),
    Q("q23_rollup", rollupAgg, Some(rollupAggOracle)),
    Q("q24_cube", cubeAgg, Some(cubeAggOracle)),
    Q("q25_grouping_sets", groupingSets, Some(groupingSetsOracle)),
    Q("q26_having", havingAgg, Some(havingAggOracle)),
    Q("q27_scalar_subquery", scalarSubquery, Some(scalarSubqueryOracle)),
    Q("q28_scalar_strings", scalarStrings, Some(scalarStringsOracle)),
    Q("q29_scalar_dates", scalarDates, Some(scalarDatesOracle)),
    Q("q30_scalar_math", scalarMath, Some(scalarMathOracle)),
    Q("q31_case_when_agg", caseWhenAgg, Some(caseWhenAggOracle)),
    Q("q32_asof_join", asofJoin, Some(asofJoinOracle)),
    Q("q33_range_join", rangeJoin, Some(rangeJoinOracle)),
    Q("q34_median_agg", medianAgg, Some(medianAggOracle)),
    Q("q35_salted_skew_join", saltedJoin, Some(saltedJoinOracle)),
    Q("q38_quantiles", quantiles, Some(quantilesOracle)),
    Q("q83_zorder_cluster", zorderCluster, Some(zorderClusterOracle)),
    Q("q84_pivot", pivotAgg, Some(pivotAggOracle)),
    Q("q85_unpivot", unpivotAgg, Some(unpivotAggOracle)),
    Q("q86_time_range_window", timeRangeWindow, Some(timeRangeWindowOracle)),
    Q("q87_rank_family", rankFamily, Some(rankFamilyOracle)),
    Q("q88_json_extract", jsonExtract, Some(jsonExtractOracle)),
    Q("q91_gap_fill", gapFill, Some(gapFillOracle)),
    Q("q92_merge_upsert", mergeUpsert, Some(mergeUpsertOracle)),
    Q("q93_funnel_detect", funnelDetect, Some(funnelDetectOracle)),
    Q("q101_pagerank", pageRank, Some(pageRankOracle)),
    Q("q184_label_propagation", labelPropagation, Some(labelPropagationOracle)),
    Q("q196_shortest_paths", shortestPaths, Some(shortestPathsOracle)),
    Q("q197_key_skew_audit", keySkewAudit, Some(keySkewAuditOracle)),
    Q("q105_corr_moments", corrMoments, Some(corrMomentsOracle)),
    Q("q106_cogroup_reconcile", cogroupReconcile, Some(cogroupReconcileOracle)),
    Q("q107_bucketed_range_join", bucketedRangeJoin, Some(bucketedRangeJoinOracle)),
    Q("q110_array_funcs", arrayFuncs, Some(arrayFuncsOracle)),
    Q("q112_zscore_outliers", zscoreOutliers, Some(zscoreOutliersOracle)),
    Q("q113_asof_tolerance", asofTolerance, Some(asofToleranceOracle)),
    Q("q114_ordered_gaps", orderedGaps, Some(orderedGapsOracle)),
    Q("q116_correlated_subquery", correlatedSubquery, Some(correlatedSubqueryOracle)),
    Q("q118_set_ops_all", setOpsAll, Some(setOpsAllOracle)),
    Q("q120_scd2_intervals", scd2Intervals, Some(scd2IntervalsOracle)),
    Q("q122_triangle_count", triangleCount, Some(triangleCountOracle)),
    Q("q123_winsorize", winsorize, Some(winsorizeOracle)),
    Q("q125_profile_audit", profileAudit, Some(profileAuditOracle)),
    Q("q214_profile_audit_agreement", profileAuditAgreement,
      Some(profileAuditAgreementOracle)),
    Q("q127_retention_cohorts", retentionCohorts, Some(retentionCohortsOracle)),
    Q("q128_share_of_total", shareOfTotal, Some(shareOfTotalOracle)),
    Q("q129_value_windows", valueWindows, Some(valueWindowsOracle)),
    Q("q130_nullsafe_join", nullSafeJoin, Some(nullSafeJoinOracle)),
    Q("q133_interval_overlap_join", intervalOverlapJoin, Some(intervalOverlapJoinOracle)),
    Q("q134_robust_zscore", robustZscore, Some(robustZscoreOracle)),
    Q("q135_asof_merge_join", asofMergeJoin, Some(asofMergeJoinOracle)))
}
