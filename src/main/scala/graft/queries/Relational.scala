package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables.{dmean, dsum, dvarSamp, load, sqlDmean, sqlDsum, sqlDvarSamp}

/** Relational operator inventory (SURVEY.md §2.2–2.8) as driver-gradable
  * queries over the TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Determinism rules applied throughout:
  *  - every query ends in an explicit ORDER BY on a unique key;
  *  - double aggregation uses the exact-decimal `dsum`/`dmean`/`dvarSamp`
  *    helpers (order-independent, bit-identical across engines);
  *  - per-row double arithmetic (+,-,*,/) is IEEE-deterministic in both
  *    engines and used freely; libm-dependent functions (exp, pow) are
  *    floor-rounded to 6 decimals before output;
  *  - rounding is expressed as floor(x*10^k + 0.5)/10^k in BOTH engines
  *    (Spark `round` is HALF_UP, R/DuckDB differ — SURVEY.md §2.8 F4).
  */
object Relational {

  /** floor-based HALF_UP rounding, identical semantics in both engines. */
  def fround(c: Column, k: Int): Column = {
    val m = math.pow(10, k)
    floor(c * m + lit(0.5)) / m
  }
  def sqlFround(e: String, k: Int): String = {
    val m = s"1e$k"
    s"(floor(($e) * $m + 0.5) / $m)"
  }

  val qs: Seq[Q] = Seq(
    // ---- P1 select / column pruning -----------------------------------
    Q("p01_select",
      (s, d) => load(s, d, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment
              FROM customer ORDER BY c_custkey""")),

    // ---- P2 rename (RegDI2.R:45-46 id harmonization) ------------------
    Q("p02_rename",
      (s, d) => load(s, d, "customer")
        .withColumnRenamed("c_custkey", "id")
        .select("id", "c_acctbal")
        .orderBy("id"),
      Some("SELECT c_custkey AS id, c_acctbal FROM customer ORDER BY id")),

    // ---- P3 mutate / derived column -----------------------------------
    Q("p03_mutate",
      (s, d) => load(s, d, "lineitem")
        .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .select("l_orderkey", "l_linenumber", "revenue")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1.0 - l_discount) AS revenue
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- P4 wildcard column transform with computed names (ipynb:2640)
    Q("p04_wildcard_transform",
      (s, d) => {
        val li = load(s, d, "lineitem")
        val dblCols = li.schema.fields
          .filter(_.dataType == org.apache.spark.sql.types.DoubleType)
          .map(_.name).toSeq
        val out = dblCols.foldLeft(li) { (df, c) =>
          df.withColumn(s"bias_$c", col(c) - lit(3.0))
        }
        out.select(col("l_orderkey") +: col("l_linenumber") +:
          dblCols.map(c => col(s"bias_$c")): _*)
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                     l_quantity - 3.0 AS bias_l_quantity,
                     l_extendedprice - 3.0 AS bias_l_extendedprice,
                     l_discount - 3.0 AS bias_l_discount,
                     l_tax - 3.0 AS bias_l_tax
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- P5 ifelse → when/otherwise -----------------------------------
    Q("p05_ifelse",
      (s, d) => load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") > 0.05, lit("HI")).otherwise(lit("LO")).as("disc_band"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- P6 case_when multi-branch (ipynb:631-636) --------------------
    Q("p06_case_when",
      (s, d) => load(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 50000.0, lit("small"))
            .when(col("o_totalprice") < 150000.0, lit("medium"))
            .when(col("o_totalprice") < 300000.0, lit("large"))
            .otherwise(lit("jumbo")).as("size_band"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CASE WHEN o_totalprice < 50000.0 THEN 'small'
                          WHEN o_totalprice < 150000.0 THEN 'medium'
                          WHEN o_totalprice < 300000.0 THEN 'large'
                          ELSE 'jumbo' END AS size_band
              FROM orders ORDER BY o_orderkey""")),

    // ---- P7 nested-ifelse 4-way stratifier (ipynb:580-582) ------------
    Q("p07_stratifier",
      (s, d) => load(s, d, "part")
        .select(col("p_partkey"),
          when(col("p_size") <= 25,
            when(col("p_retailprice") <= 1500.0, lit(1)).otherwise(lit(2)))
          .otherwise(
            when(col("p_retailprice") <= 1500.0, lit(3)).otherwise(lit(4)))
          .as("stratum"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     CASE WHEN p_size <= 25 THEN
                            CASE WHEN p_retailprice <= 1500.0 THEN 1 ELSE 2 END
                          ELSE
                            CASE WHEN p_retailprice <= 1500.0 THEN 3 ELSE 4 END
                     END AS stratum
              FROM part ORDER BY p_partkey""")),

    // ---- P8 is.na / isNull indicators after an outer join -------------
    Q("p08_isnull_indicator",
      (s, d) => {
        val cust = load(s, d, "customer").select("c_custkey")
        val buyers = load(s, d, "orders").select(col("o_custkey")).distinct()
        cust.join(buyers, cust("c_custkey") === buyers("o_custkey"), "left")
          .select(col("c_custkey"),
            col("o_custkey").isNull.cast("int").as("never_ordered"),
            col("o_custkey").isNotNull.cast("int").as("has_order"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
                     CAST(o_custkey IS NULL AS INT) AS never_ordered,
                     CAST(o_custkey IS NOT NULL AS INT) AS has_order
              FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) b
                ON c_custkey = o_custkey
              ORDER BY c_custkey""")),

    // ---- P9 filter with conjunction -----------------------------------
    Q("p09_filter",
      (s, d) => load(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
              FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45.0
              ORDER BY l_orderkey, l_linenumber""")),

    // ---- P10/J3 %in% membership as a LEFT SEMI join (never isin-lists)
    Q("p10_semijoin",
      (s, d) => {
        val urgent = load(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        load(s, d, "lineitem")
          .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
              FROM lineitem WHERE l_orderkey IN
                (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
              ORDER BY l_orderkey, l_linenumber""")),

    // ---- P11 pmin clamp → least (ipynb:645) ---------------------------
    Q("p11_least_clamp",
      (s, d) => load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          least(col("l_quantity"), lit(25.0)).as("q_capped"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     least(l_quantity, 25.0) AS q_capped
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- P12 head / limit ---------------------------------------------
    Q("p12_limit",
      (s, d) => load(s, d, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
              FROM orders ORDER BY o_orderkey LIMIT 10""")),

    // ---- J1 full outer equi-join + suffixes + indicators --------------
    // The RegDI/PC two-sample fusion (RegDI2.R:45-72): A side aggregated
    // per-customer order stats, B side customer master; indicators from
    // null-ness. The small side is broadcast (see StatsQueries for the
    // estimator-grade version over a tiny A sample).
    Q("j01_full_outer_fusion",
      (s, d) => {
        val a = load(s, d, "orders").groupBy(col("o_custkey").as("id"))
          .agg(count(lit(1)).as("cnt_A"), dsum(col("o_totalprice")).as("spend_A"))
        val b = load(s, d, "customer")
          .select(col("c_custkey").as("id"), col("c_acctbal").as("bal_B"))
        a.join(b, Seq("id"), "full_outer")
          .select(col("id"), col("cnt_A"), col("spend_A"), col("bal_B"),
            col("cnt_A").isNotNull.cast("int").as("ind_A"),
            col("bal_B").isNotNull.cast("int").as("ind_B"))
          .orderBy("id")
      },
      Some(s"""SELECT COALESCE(a.id, b.id) AS id, a.cnt_A, a.spend_A, b.bal_B,
                     CAST(a.cnt_A IS NOT NULL AS INT) AS ind_A,
                     CAST(b.bal_B IS NOT NULL AS INT) AS ind_B
              FROM (SELECT o_custkey AS id, count(*) AS cnt_A,
                           ${sqlDsum("o_totalprice")} AS spend_A
                    FROM orders GROUP BY o_custkey) a
              FULL OUTER JOIN
                   (SELECT c_custkey AS id, c_acctbal AS bal_B FROM customer) b
                USING (id)
              ORDER BY id""")),

    // ---- J2 left equi-join, small broadcast side (ipynb:624) ----------
    Q("j02_left_join_broadcast",
      (s, d) => {
        val n = load(s, d, "nation")
        val r = load(s, d, "region")
        load(s, d, "customer")
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
          .select("c_custkey", "n_name", "r_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, n_name, r_name
              FROM customer
              LEFT JOIN nation ON c_nationkey = n_nationkey
              LEFT JOIN region ON n_regionkey = r_regionkey
              ORDER BY c_custkey""")),

    // ---- A1 global sum (na.rm=TRUE ≡ nulls skipped) -------------------
    Q("a01_sum_global",
      (s, d) => load(s, d, "lineitem").agg(dsum(col("l_quantity")).as("sum_qty")),
      Some(s"""SELECT ${sqlDsum("l_quantity")} AS sum_qty FROM lineitem""")),

    // ---- A2 multi-total vector in ONE pass (RegDI2.R:161-165) ---------
    Q("a02_multi_total",
      (s, d) => load(s, d, "lineitem").agg(
        dsum(col("l_quantity")).as("t_qty"),
        dsum(col("l_extendedprice")).as("t_price"),
        dsum(col("l_discount")).as("t_disc"),
        dsum(col("l_tax")).as("t_tax"),
        count(lit(1)).as("t_n")),
      Some(s"""SELECT ${sqlDsum("l_quantity")} AS t_qty,
                      ${sqlDsum("l_extendedprice")} AS t_price,
                      ${sqlDsum("l_discount")} AS t_disc,
                      ${sqlDsum("l_tax")} AS t_tax,
                      count(*) AS t_n
               FROM lineitem""")),

    // ---- A3 global mean ------------------------------------------------
    Q("a03_mean",
      (s, d) => load(s, d, "orders").agg(dmean(col("o_totalprice")).as("avg_price")),
      Some(s"""SELECT ${sqlDmean("o_totalprice")} AS avg_price FROM orders""")),

    // ---- A4 sample variance / sd (n-1) --------------------------------
    Q("a04_var_samp",
      (s, d) => load(s, d, "customer").agg(
        dvarSamp(col("c_acctbal")).as("var_bal"),
        sqrt(dvarSamp(col("c_acctbal"))).as("sd_bal")),
      Some(s"""SELECT ${sqlDvarSamp("c_acctbal")} AS var_bal,
                      sqrt(${sqlDvarSamp("c_acctbal")}) AS sd_bal
               FROM customer""")),

    // ---- A5 max --------------------------------------------------------
    Q("a05_max",
      (s, d) => load(s, d, "lineitem").agg(
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_shipdate")).cast("date").cast("string").as("first_ship")),
      Some("""SELECT max(l_extendedprice) AS max_price,
                     CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR) AS first_ship
              FROM lineitem""")),

    // ---- A6 count ------------------------------------------------------
    Q("a06_count",
      (s, d) => load(s, d, "orders").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_custs")),
      Some("""SELECT count(*) AS n_rows,
                     count(DISTINCT o_custkey) AS n_custs FROM orders""")),

    // ---- A7 grouped aggregation (hash agg, partial+final) -------------
    Q("a07_grouped_agg",
      (s, d) => load(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dmean(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
                      ${sqlDsum("l_quantity")} AS sum_qty,
                      ${sqlDsum("l_extendedprice")} AS sum_base_price,
                      ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
                      ${sqlDmean("l_quantity")} AS avg_qty,
                      count(*) AS count_order
               FROM lineitem GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    // ---- A8 weighted mean (svymean point estimate) --------------------
    Q("a08_weighted_mean",
      (s, d) => load(s, d, "lineitem").agg(
        (dsum(col("l_quantity") * col("l_extendedprice")) /
          dsum(col("l_quantity"))).as("wmean_price")),
      Some(s"""SELECT ${sqlDsum("l_quantity * l_extendedprice")} /
                      ${sqlDsum("l_quantity")} AS wmean_price
               FROM lineitem""")),

    // ---- A9 Horvitz–Thompson weighted totals (PC.R:190-193) -----------
    Q("a09_ht_totals",
      (s, d) => {
        val w = lit(1.0) + col("l_tax")
        load(s, d, "lineitem").agg(
          dsum(w * col("l_quantity")).as("ht_qty"),
          dsum(w * col("l_extendedprice")).as("ht_price"),
          dsum(w).as("ht_n"))
      },
      Some(s"""SELECT ${sqlDsum("(1.0 + l_tax) * l_quantity")} AS ht_qty,
                      ${sqlDsum("(1.0 + l_tax) * l_extendedprice")} AS ht_price,
                      ${sqlDsum("(1.0 + l_tax)")} AS ht_n
               FROM lineitem""")),

    // ---- A10 grouped mean-of-bias with rounding (ipynb:2066-2073) -----
    Q("a10_grouped_round",
      (s, d) => load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(fround(dmean(col("l_quantity") - lit(25.0)), 3).as("avg_bias_qty"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
                      ${sqlFround(sqlDmean("l_quantity - 25.0"), 3)} AS avg_bias_qty
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- A11 RMSE / R² of a fixed linear predictor (RegDI2.R:228-235)
    // (the coefficient-fitting version with a closed-form oracle lives in
    // StatsQueries.m05_ols_fit)
    Q("a11_rmse_r2",
      (s, d) => {
        val pred = lit(1000.0) + lit(35000.0) * col("l_quantity") / lit(25.0)
        val e = col("l_extendedprice") - pred
        val y = col("l_extendedprice")
        load(s, d, "lineitem").agg(
          sqrt(dsum(e * e) / count(lit(1))).as("rmse"),
          (lit(1.0) - dsum(e * e) /
            (dsum(y * y) - dsum(y) * dsum(y) / count(lit(1)))).as("r2"))
      },
      Some {
        val e = "l_extendedprice - (1000.0 + 35000.0 * l_quantity / 25.0)"
        val y = "l_extendedprice"
        s"""SELECT sqrt(${sqlDsum(s"($e) * ($e)")} / count(*)) AS rmse,
                   1.0 - ${sqlDsum(s"($e) * ($e)")} /
                     (${sqlDsum(s"($y) * ($y)")} -
                      ${sqlDsum(y)} * ${sqlDsum(y)} / count(*)) AS r2
            FROM lineitem"""
      }),

    // ---- U1 rbind → unionByName (columns in different order!) ---------
    Q("u01_union_by_name",
      (s, d) => {
        val c = load(s, d, "customer")
        val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        val mach = c.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        auto.unionByName(mach).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
              WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
              ORDER BY c_custkey""")),

    // ---- U2 cbind → one-pass multi-column select (ipynb:2299) ---------
    Q("u02_cbind_columns",
      (s, d) => load(s, d, "part")
        .select(col("p_partkey"),
          (col("p_retailprice") * 0.9).as("price_sd_low"),
          (col("p_retailprice") * 1.0).as("price_sd_mid"),
          (col("p_retailprice") * 1.1).as("price_sd_high"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     p_retailprice * 0.9 AS price_sd_low,
                     p_retailprice * 1.0 AS price_sd_mid,
                     p_retailprice * 1.1 AS price_sd_high
              FROM part ORDER BY p_partkey""")),

    // ---- U3 set operations: INTERSECT / EXCEPT (distinct semantics) ---
    // Completes the union family: customers in BOTH the auto segment
    // and the high-balance set, and high-balance customers NOT in auto.
    // Both engines implement SQL-standard distinct set semantics.
    Q("u03_intersect_except",
      (s, d) => {
        val auto = load(s, d, "customer")
          .filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
        val rich = load(s, d, "customer")
          .filter(col("c_acctbal") > 5000).select("c_custkey")
        auto.intersect(rich)
          .select(col("c_custkey"), lit("both").as("side"))
          .unionByName(rich.except(auto)
            .select(col("c_custkey"), lit("rich_only").as("side")))
          .orderBy("side", "c_custkey")
      },
      Some("""SELECT c_custkey, 'both' AS side FROM (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
                INTERSECT
                SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
              UNION ALL
              SELECT c_custkey, 'rich_only' FROM (
                SELECT c_custkey FROM customer WHERE c_acctbal > 5000
                EXCEPT
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
              ORDER BY side, c_custkey""")),

    // ---- R5 SCD2 interval construction (warehouse dimension history) --
    // Each user's events become validity intervals: valid_from = ts,
    // valid_to = the next event's ts (NULL ⇒ current row) — the lead
    // window that turns a change log into a slowly-changing-dimension
    // table. (ts, event_id) ordering makes ties deterministic.
    Q("r05_scd2_intervals",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        graft.util.Tables.loadEvents(s, d)
          .filter(col("user_id") < 30)
          .select(col("user_id"), col("event_id"), col("value"),
            col("ts").cast("string").as("valid_from"),
            lead(col("ts"), 1).over(w).cast("string").as("valid_to"),
            lead(col("ts"), 1).over(w).isNull.as("is_current"))
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""SELECT user_id, event_id, value,
                     CAST(ts AS VARCHAR) AS valid_from,
                     CAST(lead(ts, 1) OVER w AS VARCHAR) AS valid_to,
                     (lead(ts, 1) OVER w IS NULL) AS is_current
              FROM events WHERE user_id < 30
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY user_id, valid_from, event_id""")),

    // ---- R1 melt / unpivot wide→long (ipynb:2121-2127) ----------------
    Q("r01_melt",
      (s, d) => load(s, d, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size_d"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size_d")),
          "metric", "value")
        .orderBy("p_partkey", "metric"),
      Some("""SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
              FROM part
              UNION ALL
              SELECT p_partkey, 'p_size_d' AS metric, CAST(p_size AS DOUBLE)
              FROM part
              ORDER BY p_partkey, metric""")),

    // ---- R2 pivot_longer with programmatic column selection -----------
    Q("r02_pivot_longer",
      (s, d) => {
        val wide = load(s, d, "lineitem").groupBy("l_returnflag").agg(
          dsum(col("l_quantity")).as("mean_qty"),
          dmean(col("l_discount")).as("mean_disc"))
        val meanCols = wide.columns.filter(_.startsWith("mean_"))
        wide.unpivot(Array(col("l_returnflag")), meanCols.map(col),
          "measure", "value")
          .orderBy("l_returnflag", "measure")
      },
      Some(s"""WITH wide AS (
                 SELECT l_returnflag,
                        ${sqlDsum("l_quantity")} AS mean_qty,
                        ${sqlDmean("l_discount")} AS mean_disc
                 FROM lineitem GROUP BY l_returnflag)
               SELECT l_returnflag, 'mean_qty' AS measure, mean_qty AS value FROM wide
               UNION ALL
               SELECT l_returnflag, 'mean_disc', mean_disc FROM wide
               ORDER BY l_returnflag, measure""")),

    // ---- R3 separate / regex split (ipynb:2745) -----------------------
    Q("r03_separate",
      (s, d) => load(s, d, "orders")
        .select(col("o_orderkey"),
          split(col("o_orderpriority"), "-").getItem(0).as("prio_num"),
          split(col("o_orderpriority"), "-").getItem(1).as("prio_word"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     split_part(o_orderpriority, '-', 1) AS prio_num,
                     split_part(o_orderpriority, '-', 2) AS prio_word
              FROM orders ORDER BY o_orderkey""")),

    // ---- R4 pivot_wider long→wide (ipynb:2788-2790) -------------------
    Q("r04_pivot_wider",
      (s, d) => load(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .withColumnsRenamed(Map("F" -> "total_F", "O" -> "total_O", "P" -> "total_P"))
        .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority,
                      ${sqlDsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS total_F,
                      ${sqlDsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS total_O,
                      ${sqlDsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS total_P
               FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- F1-F5 scalar function surface --------------------------------
    // sqrt is IEEE-correctly-rounded (kept raw); exp/pow are libm-
    // dependent, so floor-rounded to 6 dp for cross-engine hashing.
    Q("f01_scalar_funcs",
      (s, d) => load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / lit(1000.0) + col("l_quantity") * lit(2.0)
            - col("l_tax")).as("arith"),
          sqrt(col("l_quantity")).as("sqrt_qty"),
          fround(exp(-col("l_discount")), 6).as("exp_neg_disc"),
          fround(pow(col("l_quantity"), lit(2.0)), 6).as("qty_sq"),
          (col("l_quantity") <= 25.0).cast("int").as("small_qty"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
                      l_extendedprice / 1000.0 + l_quantity * 2.0 - l_tax AS arith,
                      sqrt(l_quantity) AS sqrt_qty,
                      ${sqlFround("exp(-l_discount)", 6)} AS exp_neg_disc,
                      ${sqlFround("pow(l_quantity, 2.0)", 6)} AS qty_sq,
                      CAST(l_quantity <= 25.0 AS INT) AS small_qty
               FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- P13 per-column data profiling --------------------------------
    // graft.operators.Profile over orders: non-null/null/exact-distinct
    // counts + typed min/max per column, ONE aggregation job for all
    // columns (the distinct counts ride Spark's Expand with map-side
    // partial aggregation). All-integer counts and exact min/max — full
    // hash oracle as a UNION ALL of per-column scalar rows.
    Q("p13_profile",
      (s, d) => graft.operators.Profile.profile(
          load(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
        .toDF().orderBy("col_name"),
      Some {
        def num(c: String) =
          s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
                     count(*) - count($c) AS n_null,
                     count(DISTINCT $c) AS n_distinct,
                     CAST(min($c) AS DOUBLE) AS min_num,
                     CAST(max($c) AS DOUBLE) AS max_num,
                     CAST(NULL AS VARCHAR) AS min_str,
                     CAST(NULL AS VARCHAR) AS max_str
              FROM orders"""
        def str(c: String) =
          s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
                     count(*) - count($c) AS n_null,
                     count(DISTINCT $c) AS n_distinct,
                     CAST(NULL AS DOUBLE) AS min_num,
                     CAST(NULL AS DOUBLE) AS max_num,
                     CAST(min($c) AS VARCHAR) AS min_str,
                     CAST(max($c) AS VARCHAR) AS max_str
              FROM orders"""
        Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
          num("o_totalprice")).mkString(" UNION ALL ") +
          " ORDER BY col_name"
      }),

    // ---- P14 winsorization at exact selection quantiles ---------------
    // Clip l_extendedprice to its [5%, 95%] selection quantiles. The
    // quantile ranks are PURE INTEGER arithmetic ((bp·n+9999) div 1e4 —
    // a float ceil(p·n) diverges between binary and decimal engines on
    // integer landings); the rank pass is the distributed
    // Ranks.globalRowNumber, the clip a two-literal projection.
    Q("p14_winsorize",
      (s, d) => {
        val li = load(s, d, "lineitem").select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
          col("l_extendedprice").as("v"))
        graft.operators.Ranks.winsorize(li, "v", "id", loBp = 500,
            hiBp = 9500)
          .orderBy("id")
      },
      Some("""WITH s AS (SELECT l_orderkey * 10 + l_linenumber AS id,
                                l_extendedprice AS v FROM lineitem),
                   r AS (SELECT v, id, row_number() OVER (ORDER BY v, id)
                           AS rn FROM s),
                   n AS (SELECT count(*) AS n FROM s),
                   q AS (SELECT
                           max(CASE WHEN rn = (500 * n.n + 9999) // 10000
                               THEN v END) AS lo,
                           max(CASE WHEN rn = (9500 * n.n + 9999) // 10000
                               THEN v END) AS hi
                         FROM r, n)
              SELECT s.id, s.v, least(greatest(s.v, q.lo), q.hi) AS v_winsor
              FROM s, q ORDER BY s.id""")),

    // ---- P15 equal-width histogram ------------------------------------
    // One partial-aggregable pass; bin arithmetic is fixed IEEE over
    // literal edges (width 25000 exact), under/overflow bins −1 / 24.
    Q("p15_histogram",
      (s, d) => graft.operators.Profile.histogram(
          load(s, d, "orders"), "o_totalprice", lo = 0.0, hi = 600000.0,
          nBins = 24)
        .orderBy("bin"),
      Some("""WITH b AS (SELECT CASE
                           WHEN o_totalprice IS NULL THEN NULL
                           WHEN o_totalprice < 0.0 THEN -1
                           WHEN o_totalprice >= 600000.0 THEN 24
                           ELSE least(23, CAST(floor((o_totalprice - 0.0)
                                     / 25000.0) AS BIGINT)) END AS bin
                         FROM orders)
              SELECT bin, count(*) AS n,
                     CASE WHEN bin >= 0 AND bin < 24
                          THEN 0.0 + CAST(bin AS DOUBLE) * 25000.0 END
                       AS bin_lo
              FROM b GROUP BY bin ORDER BY bin""")),

    // ---- P17 safe-cast audit (ingestion type probing) -----------------
    // try_cast success/failure counts for a probe battery — the "can
    // this stringly column become typed" first question of ingestion.
    // One aggregation pass; only counts cross engines, so the probes
    // are format-independent. try_cast semantics (NULL on failure)
    // match DuckDB's TRY_CAST.
    Q("p17_cast_audit",
      (s, d) => {
        val o = load(s, d, "orders")
        val probes = Seq(
          "priority_prefix_int" ->
            expr("try_cast(split(o_orderpriority, '-')[0] AS INT)"),
          "status_int" -> expr("try_cast(o_orderstatus AS INT)"),
          "price_roundtrip" ->
            expr("try_cast(cast(o_totalprice AS STRING) AS DOUBLE)"))
        val aggs = count(lit(1)).as("__n") +: probes.map { case (n, c) =>
          count(c).as(s"__ok_$n")
        }
        val row = o.agg(aggs.head, aggs.tail: _*).head()
        val total = row.getAs[Long]("__n")
        import s.implicits._
        probes.map { case (n, _) =>
          val ok = row.getAs[Long](s"__ok_$n")
          (n, total, ok, total - ok)
        }.toDF("probe", "n_rows", "n_ok", "n_fail").orderBy("probe")
      },
      Some("""SELECT 'priority_prefix_int' AS probe, count(*) AS n_rows,
                     count(TRY_CAST(string_split(o_orderpriority, '-')[1]
                       AS INTEGER)) AS n_ok,
                     count(*) - count(TRY_CAST(
                       string_split(o_orderpriority, '-')[1] AS INTEGER))
                       AS n_fail
              FROM orders
              UNION ALL
              SELECT 'status_int', count(*),
                     count(TRY_CAST(o_orderstatus AS INTEGER)),
                     count(*) - count(TRY_CAST(o_orderstatus AS INTEGER))
              FROM orders
              UNION ALL
              SELECT 'price_roundtrip', count(*),
                     count(TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE)),
                     count(*) - count(TRY_CAST(CAST(o_totalprice AS VARCHAR)
                       AS DOUBLE))
              FROM orders
              ORDER BY probe""")),

    // ---- P18 deterministic pseudonymization (PII tokenization) --------
    // Salted SHA-256 tokens replace the identifying columns while
    // PRESERVING join-ability (equal inputs → equal tokens) — the
    // privacy-pipeline sibling of t06's pattern redaction. Pure codegen
    // projection; hex digests are engine-identical.
    Q("p18_pseudonymize",
      (s, d) => load(s, d, "customer").select(
          sha2(concat(lit("graft-salt:"), col("c_custkey").cast("string")),
            256).as("key_token"),
          sha2(concat(lit("graft-salt:"), col("c_name")), 256)
            .as("name_token"),
          col("c_nationkey"), col("c_mktsegment"))
        .orderBy("key_token"),
      Some("""SELECT sha256('graft-salt:' || CAST(c_custkey AS VARCHAR))
                       AS key_token,
                     sha256('graft-salt:' || c_name) AS name_token,
                     c_nationkey, c_mktsegment
              FROM customer ORDER BY key_token""")),

    // ---- P19 referential-integrity check (FK orphans) -----------------
    // The cross-table half of the expectations gate: lineitem→orders
    // must be orphan-free; orders→(1/37 customer subsample) plants a
    // REAL orphan population to prove the detector fires. Anti-join
    // counts, all-integer → full hash oracle.
    Q("p19_referential",
      (s, d) => {
        import graft.operators.Profile.referentialCheck
        val c1 = referentialCheck(load(s, d, "lineitem"),
            load(s, d, "orders"), "l_orderkey", "o_orderkey")
          .withColumn("chk", lit("lineitem_orders"))
        val cSub = load(s, d, "customer").filter(col("c_custkey") % 37 === 1)
        val c2 = referentialCheck(load(s, d, "orders"), cSub,
            "o_custkey", "c_custkey")
          .withColumn("chk", lit("orders_sampled_customers"))
        c1.unionByName(c2)
          .select("chk", "n_child", "n_orphans", "pass")
          .orderBy("chk")
      },
      Some("""WITH o1 AS (SELECT count(*) AS n FROM lineitem),
                   x1 AS (SELECT count(*) AS x FROM lineitem l
                          ANTI JOIN orders o
                            ON o.o_orderkey = l.l_orderkey
                          WHERE l.l_orderkey IS NOT NULL),
                   o2 AS (SELECT count(*) AS n FROM orders),
                   cs AS (SELECT c_custkey FROM customer
                          WHERE c_custkey % 37 = 1),
                   x2 AS (SELECT count(*) AS x FROM orders o
                          ANTI JOIN cs ON cs.c_custkey = o.o_custkey
                          WHERE o.o_custkey IS NOT NULL)
              SELECT 'lineitem_orders' AS chk, o1.n AS n_child,
                     x1.x AS n_orphans, CAST(x1.x = 0 AS INTEGER) AS pass
              FROM o1, x1
              UNION ALL
              SELECT 'orders_sampled_customers', o2.n, x2.x,
                     CAST(x2.x = 0 AS INTEGER)
              FROM o2, x2
              ORDER BY chk""")),

    // ---- P20 Tukey IQR outlier census ----------------------------------
    // Profiling-stack outlier screen over two lineitem measures: exact
    // quartiles (the a14 percentile ↔ quantile_cont parity), 1.5·IQR
    // fences as mirrored IEEE ops, strict outside counts. Two bounded
    // aggregation passes per column, 2-row result → full hash oracle.
    Q("p20_iqr_outliers",
      (s, d) => graft.operators.Profile.iqrOutliers(
        load(s, d, "lineitem"), Seq("l_extendedprice", "l_quantity")),
      Some("""WITH s1 AS (SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
                            quantile_cont(l_extendedprice, 0.75) AS q3
                          FROM lineitem),
                   f1 AS (SELECT q1, q3,
                            q1 - 1.5 * (q3 - q1) AS lo_fence,
                            q3 + 1.5 * (q3 - q1) AS hi_fence FROM s1),
                   n1 AS (SELECT
                            CAST(sum(CASE WHEN l.l_extendedprice < f.lo_fence
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
                            CAST(sum(CASE WHEN l.l_extendedprice > f.hi_fence
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above
                          FROM lineitem l, f1 f),
                   s2 AS (SELECT quantile_cont(l_quantity, 0.25) AS q1,
                            quantile_cont(l_quantity, 0.75) AS q3
                          FROM lineitem),
                   f2 AS (SELECT q1, q3,
                            q1 - 1.5 * (q3 - q1) AS lo_fence,
                            q3 + 1.5 * (q3 - q1) AS hi_fence FROM s2),
                   n2 AS (SELECT
                            CAST(sum(CASE WHEN l.l_quantity < f.lo_fence
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
                            CAST(sum(CASE WHEN l.l_quantity > f.hi_fence
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above
                          FROM lineitem l, f2 f)
              SELECT 'l_extendedprice' AS colname, q1, q3, lo_fence,
                     hi_fence, n_below, n_above
              FROM f1, n1
              UNION ALL
              SELECT 'l_quantity', q1, q3, lo_fence, hi_fence,
                     n_below, n_above
              FROM f2, n2
              ORDER BY colname""")),

    // ---- P16 data-quality expectations (Deequ-style gate) -------------
    // Four rules over orders in ONE aggregation pass: NULL predicates
    // count as violations, uniqueness is n − distinct. All-integer →
    // full hash oracle; `pass` makes the frame a CI gate.
    Q("p16_expectations",
      (s, d) => {
        import graft.operators.Profile.{RowExpectation, UniqueExpectation}
        graft.operators.Profile.expectations(load(s, d, "orders"), Seq(
            RowExpectation("key_not_null", col("o_orderkey").isNotNull),
            UniqueExpectation("key_unique", "o_orderkey"),
            RowExpectation("price_positive", col("o_totalprice") > 0.0),
            RowExpectation("status_domain",
              col("o_orderstatus").isin("F", "O", "P"))))
          .orderBy("rule")
      },
      Some("""SELECT 'key_not_null' AS rule, count(*) AS n_rows,
                     CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_violations,
                     CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                          = 0 AS INTEGER) AS pass
              FROM orders
              UNION ALL
              SELECT 'key_unique', count(*),
                     count(o_orderkey) - count(DISTINCT o_orderkey),
                     CAST(count(o_orderkey) - count(DISTINCT o_orderkey) = 0
                          AS INTEGER)
              FROM orders
              UNION ALL
              SELECT 'price_positive', count(*),
                     CAST(sum(CASE WHEN o_totalprice > 0.0 THEN 0 ELSE 1 END)
                          AS BIGINT),
                     CAST(sum(CASE WHEN o_totalprice > 0.0 THEN 0 ELSE 1 END)
                          = 0 AS INTEGER)
              FROM orders
              UNION ALL
              SELECT 'status_domain', count(*),
                     CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                              THEN 0 ELSE 1 END) AS BIGINT),
                     CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
                              THEN 0 ELSE 1 END) = 0 AS INTEGER)
              FROM orders
              ORDER BY rule"""))
  )
}
