package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational coverage: projections, filters, group-by
  * aggregations, joins (shuffle/broadcast/semi/anti/outer), set ops,
  * global and windowed aggregates. Each maps a reference operator
  * (SURVEY.md §2.2-§2.6) onto declarative Spark so Catalyst gets full
  * pushdown/pruning freedom.
  */
object RelationalQueries extends QueryGroup {

  val all: Seq[QueryDef] = Seq(

    // project + filter (RichPipe.project/filter, RichPipe.scala:126,307)
    // — predicate and column pruning reach the parquet scan.
    q("q_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // groupBy + chained aggregations (GroupBuilder sum/average/size,
    // ReduceOperations.scala:327,83,402). TPC-H Q1 shape.
    q("q_agg_groupby",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // groupAll: single global aggregate (RichPipe.groupAll,
    // RichPipe.scala:178) — Spark plans partial+final, no 1-reducer
    // bottleneck.
    q("q_agg_global",
      """SELECT count(*) AS cnt,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(min(l_quantity), 2) AS min_qty,
        |  round(max(l_quantity), 2) AS max_qty,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("cnt"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(min("l_quantity"), 2).as("min_qty"),
        round(max("l_quantity"), 2).as("max_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    },

    // count(pred) == COUNT_IF (ReduceOperations.scala:135) and
    // forall == BOOL_AND (ReduceOperations.scala:200).
    q("q_agg_countif_forall",
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  bool_and(l_quantity > 0) AS all_positive
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          bool_and(col("l_quantity") > 0).as("all_positive"))
        .orderBy("l_returnflag")
    },

    // sizeAveStdev: one-pass (count, mean, stddev)
    // (ReduceOperations.scala:192, algebird Moments).
    q("q_agg_stats",
      """SELECT o_orderpriority, count(*) AS cnt,
        |  round(avg(o_totalprice), 4) AS mean_price,
        |  round(stddev_pop(o_totalprice), 4) AS std_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          round(avg("o_totalprice"), 4).as("mean_price"),
          round(stddev_pop(col("o_totalprice")), 4).as("std_price"))
        .orderBy("o_orderpriority")
    },

    // head/last under secondary sort (ReduceOperations.scala:207) —
    // expressed as min_by/max_by so it stays a hash aggregate, not a
    // sort: the reference needed a secondary sort for this, Spark does
    // not.
    // (l_orderkey, l_linenumber) is not unique in the synthetic data,
    // so the secondary-sort key is (l_linenumber, l_partkey), encoded
    // into one integer so min/max stay plain hash aggregates.
    q("q_agg_head_last",
      """SELECT l_orderkey,
        |  min(l_linenumber * 100000000 + l_partkey) % 100000000 AS first_part,
        |  max(l_linenumber * 100000000 + l_partkey) % 100000000 AS last_part
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      val key = col("l_linenumber").cast("long") * 100000000L + col("l_partkey")
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
          (min(key) % 100000000L).as("first_part"),
          (max(key) % 100000000L).as("last_part"))
        .orderBy("l_orderkey")
    },

    // mkString: ordered string-join of group values
    // (ReduceOperations.scala:276). Deterministic via sorted collect.
    q("q_agg_mkstring",
      """SELECT o_custkey,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orders_csv
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(array_join(array_sort(collect_list(col("o_orderkey"))), ",")
          .as("orders_csv"))
        .orderBy("o_custkey")
    },

    // dot product per group (ReduceOperations.scala:389).
    q("q_agg_dot",
      """SELECT l_suppkey,
        |  round(sum(l_quantity * l_extendedprice), 2) AS dot
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_quantity") * col("l_extendedprice")), 2).as("dot"))
        .orderBy("l_suppkey")
    },

    // approximateUniqueCount (ReduceOperations.scala:103): HLL
    // estimates differ across engines, so the query validates its own
    // error bound (|approx/exact - 1| <= 5%) and the oracle asserts the
    // bound holds — the hash compare then checks the *guarantee*, which
    // is the portable contract.
    q("q_agg_approx_distinct",
      """SELECT l_returnflag, true AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
          countDistinct(col("l_partkey")).as("exact"))
        .select(
          col("l_returnflag"),
          (abs(col("approx") - col("exact")) <= col("exact") * 0.05)
            .as("within_5pct"))
        .orderBy("l_returnflag")
    },

    // histogram(binWidth) (ReduceOperations.scala:446,
    // mathematics/Histogram.scala): fixed-width value bins + counts.
    q("q_agg_histogram",
      """SELECT floor(o_totalprice / 50000.0) * 50000.0 AS bin, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy((floor(col("o_totalprice") / 50000.0) * 50000.0).as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bin")
    },

    // distinct (RichPipe.unique, RichPipe.scala:160).
    q("q_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // union-all then aggregate (RichPipe.++, RichPipe.scala:170).
    q("q_union_agg",
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k"))
      val b = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k"))
      a.unionAll(b).groupBy("k").agg(count(lit(1)).as("cnt")).orderBy("k")
    },

    // shuffle join + aggregate (joinWithSmaller,
    // JoinAlgorithms.scala:155) — sort-merge/shuffle-hash chosen by
    // Catalyst; at 100 TB both sides are large so a shuffle join is the
    // right physical plan.
    q("q_join_inner_agg",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment")
    },

    // left outer join with null fill (leftJoinWithSmaller,
    // JoinAlgorithms.scala:194): customers keep rows with zero orders.
    q("q_join_left",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS revenue
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0)), 2).as("revenue"))
        .orderBy("c_custkey")
    },

    // full outer join (outerJoinWithSmaller): nations with customers
    // and/or suppliers.
    q("q_join_outer",
      """SELECT n_nationkey, n_cust, n_supp FROM (
        |  SELECT coalesce(c.k, s.k) AS n_nationkey,
        |    coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
        |  FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        |  FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.k = s.k
        |) ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("k"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("k"), "full_outer")
        .select(
          col("k").as("n_nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("n_nationkey")
    },

    // broadcast (map-side) join — joinWithTiny,
    // JoinAlgorithms.scala:221: dimension table replicated to every
    // task, no shuffle of the fact table.
    q("q_join_broadcast",
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"), "inner")
        .groupBy("p_brand")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("p_brand")
    },

    // multiway star join (coGroupBy, CoGroupBuilder.scala:27):
    // customer->nation->region chained joins, dims broadcast.
    q("q_join_multiway",
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 2).as("sum_bal"))
        .orderBy("r_name", "n_name")
    },

    // left-semi / left-anti (matrix keepElementsBy/removeElementsBy,
    // Matrix.scala:632-654): customers without orders.
    q("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    q("q_join_semi",
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity > 49)
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 49),
          col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_brand")
        .orderBy("p_partkey")
    },

    // cross join with tiny side (crossWithTiny,
    // JoinAlgorithms.scala:70): broadcast nested-loop, no shuffle.
    q("q_cross_tiny",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "region").select("r_name")
        .crossJoin(broadcast(t(s, dir, "nation").select("n_name")))
        .orderBy("r_name", "n_name")
    },

    // global total sort + limit (groupAll.sortBy ⇒ range-partitioned
    // parallel sort in Spark, an upgrade over the 1-reducer reference).
    q("q_sort_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // running accumulation scanLeft (GroupBuilder.scanLeft,
    // StreamOperations.scala:69) — running sum per customer in date
    // order, as a window with an explicit ROWS frame.
    q("q_window_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // per-group take(k) after secondary sort (StreamOperations.take +
    // GroupBuilder.sortBy) — top-3 most recent orders per customer.
    q("q_group_take",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    },

    // pivot long→wide with fixed output columns
    // (ReduceOperations.pivot:174; default fill = 0).
    q("q_pivot",
      """SELECT l_linestatus,
        |  round(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 0), 2) AS qty_A,
        |  round(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 0), 2) AS qty_N,
        |  round(coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 0), 2) AS qty_R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(coalesce(sum("l_quantity"), lit(0)), 2))
        .withColumnsRenamed(Map("A" -> "qty_A", "N" -> "qty_N", "R" -> "qty_R"))
        .orderBy("l_linestatus")
    },

    // unpivot wide→long (RichPipe.unpivot, RichPipe.scala:469).
    q("q_unpivot",
      """SELECT p_partkey, metric, round(value, 2) AS value FROM (
        |  SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |) ORDER BY p_partkey, metric""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size_d"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice").as("retail"), col("p_size_d").as("size")),
          "metric", "value")
        .select(col("p_partkey"), col("metric"), round(col("value"), 2).as("value"))
        .orderBy("p_partkey", "metric")
    },

    // normalize: divide by global sum (RichPipe.normalize,
    // RichPipe.scala:528) — scalar aggregate broadcast-crossed, not a
    // single-reducer groupAll.
    q("q_normalize",
      """SELECT l_returnflag,
        |  round(sum(l_quantity) / (SELECT sum(l_quantity) FROM lineitem), 6) AS share
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val total = li.agg(sum("l_quantity").as("total"))
      li.groupBy("l_returnflag")
        .agg(sum("l_quantity").as("flag_qty"))
        .crossJoin(broadcast(total))
        .select(col("l_returnflag"),
          round(col("flag_qty") / col("total"), 6).as("share"))
        .orderBy("l_returnflag")
    }
  )
}
