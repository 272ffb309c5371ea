package graft.queries

import org.apache.spark.sql.functions._
import graft.dsl.FieldsApi._
import graft.matrix.{Matrix => M}
import graft.ml.{TextAnalysis => TA}

/** Superset + remaining-row-op coverage: cube/rollup (absent in the
  * reference, free in Spark — SURVEY §2.4 note), trap routing,
  * limit/sample properties, matrix cosine similarity, winnowing
  * fingerprints.
  */
object SupersetQueries extends QueryGroup {

  val all: Seq[QueryDef] = Seq(

    // the fields-DSL groupBy builder end-to-end (RichPipe.groupBy +
    // GroupBuilder chains compile into ONE agg).
    q("q_fields_groupby",
      """SELECT l_returnflag, count(*) AS cnt,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
        |  max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupByFields("l_returnflag") {
        _.size("cnt")
          .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"))
          .agg(round(avg(col("l_quantity")), 6).as("avg_qty"))
          .countIf(col("l_discount") > 0.05, "n_disc")
          .max("l_quantity", "max_qty")
      }.orderBy("l_returnflag")
    },

    // fields-DSL row ops chained: project/rename/insert/mapTo.
    q("q_fields_rowops",
      """SELECT o_orderkey AS okey, o_totalprice AS price,
        |  round(o_totalprice * 0.5, 3) AS half_price, 1 AS one
        |FROM orders ORDER BY okey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .project("o_orderkey", "o_totalprice")
        .rename("o_orderkey" -> "okey", "o_totalprice" -> "price")
        .insert("half_price", round(col("price") * 0.5, 3))
        .insert("one", lit(1))
        .orderBy("okey")
    },

    // ranking-function superset (SURVEY §2.4 note: the reference
    // expresses ranking only via sortedTake; rank/dense_rank/ntile
    // come free): per-flag price ranking with deterministic
    // tie-breaks.
    q("q_window_rank",
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_quantity)
        |ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber, quartile""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("l_returnflag"), col("rnk"), col("l_orderkey"),
          col("l_linenumber"), col("quartile"))
    },

    // grouping-sets superset: rollup with explicit grouping ids.
    q("q_rollup",
      """SELECT coalesce(l_returnflag, '<all>') AS flag,
        |  coalesce(l_linestatus, '<all>') AS status,
        |  count(*) AS cnt, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("status"),
          col("cnt"), col("qty"))
        .orderBy("flag", "status")
    },

    q("q_cube",
      """SELECT coalesce(l_returnflag, '<all>') AS flag,
        |  coalesce(l_linestatus, '<all>') AS status,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("status"),
          col("cnt"))
        .orderBy("flag", "status")
    },

    // explicit GROUPING SETS (the cube/rollup generalization): a
    // hand-picked lattice of aggregation levels in one pass.
    q("q_grouping_sets",
      """SELECT coalesce(l_returnflag, '<all>') AS flag,
        |  coalesce(l_linestatus, '<all>') AS status,
        |  count(*) AS cnt, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, '<all>') AS flag,
          |  coalesce(l_linestatus, '<all>') AS status,
          |  count(*) AS cnt, round(sum(l_quantity), 2) AS qty
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |  (l_returnflag), (l_linestatus))
          |ORDER BY flag, status""".stripMargin)
    },

    // trailing time-RANGE window: per-user 1-hour trailing event-value
    // sum — the range frame (not a row count) the windowed-aggregate
    // family needs for time-based features.
    q("q_window_trailing",
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
        |  FROM events
        |)
        |SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY sec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4)
        |    AS trailing_1h
        |FROM e ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val raw = t(s, dir, "events")
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec"))
        .rangeBetween(-3600L, Window.currentRow)
      raw.withColumn("sec", graft.core.Ts.seconds(raw))
        .select(col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 4).as("trailing_1h"))
        .orderBy("user_id", "event_id")
    },

    // trap routing (addTrap, RichPipe.scala:515-518): rows whose
    // numeric parse fails go to the trap, the rest flow on — counted
    // on both paths.
    q("q_trap",
      """WITH mixed AS (
        |  SELECT CASE WHEN l_orderkey % 2 = 0
        |    THEN CAST(l_linenumber AS VARCHAR) ELSE l_returnflag END AS v
        |  FROM lineitem
        |)
        |SELECT count(*) FILTER (WHERE try_cast(v AS INTEGER) IS NOT NULL) AS n_good,
        |  count(*) FILTER (WHERE try_cast(v AS INTEGER) IS NULL) AS n_trapped
        |FROM mixed""".stripMargin) { (s, dir) =>
      val mixed = t(s, dir, "lineitem")
        .select(when(col("l_orderkey") % 2 === 0,
          col("l_linenumber").cast("string"))
          .otherwise(col("l_returnflag")).as("v"))
      val (good, trapped) = mixed.trap(col("v").cast("int").isNotNull)
      good.agg(count(lit(1)).as("n_good"))
        .crossJoin(trapped.agg(count(lit(1)).as("n_trapped")))
    },

    // the raw Buffer/`every` escape hatch in its semantic form
    // (GroupBuilder.mapStream, GroupBuilder.scala:215-229): stream
    // each customer's orders in date order through a stateful
    // closure emitting row number + running spend — replayed by the
    // oracle as the equivalent windows.
    q("q_fields_mapstream",
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
      t(s, dir, "orders")
        .mapStreamByKey(Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))(
          Seq("o_orderkey", "o_totalprice"),
          Seq(StructField("o_orderkey", LongType),
            StructField("rn", LongType),
            StructField("running", DoubleType))) { rows =>
          var rn = 0L
          var acc = 0.0
          rows.map { r =>
            rn += 1L
            acc += r(1).asInstanceOf[Double]
            Seq(r(0), rn, acc)
          }
        }
        .select(col("o_custkey"), col("o_orderkey"), col("rn"),
          round(col("running"), 2).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // exception-catching trap — the reference's actual addTrap
    // contract (RichPipe.scala:515-518; CoreTest.scala:1366-1399):
    // a closure that divides by zero on every tenth doc routes those
    // rows to the trap, and the main flow continues without them.
    q("q_trap_throwing",
      """SELECT 'good' AS side, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(100 // (doc_id % 10)) AS BIGINT) AS sv
        |FROM documents WHERE doc_id % 10 != 0
        |UNION ALL
        |SELECT 'trap' AS side, CAST(count(*) AS BIGINT) AS n,
        |  CAST(NULL AS BIGINT) AS sv
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY side""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.{LongType, StructField}
      val d = t(s, dir, "documents").select("doc_id", "lang")
      val (good, trapped) = d.trapThrows(Seq("doc_id"),
        Seq(StructField("v", LongType)))(xs =>
        Seq(100L / (xs.head.asInstanceOf[Long] % 10L)))
      good.agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .select(lit("good").as("side"), col("n"), col("sv"))
        .unionAll(trapped.agg(count(lit(1)).as("n"))
          .select(lit("trap").as("side"), col("n"),
            lit(null).cast("long").as("sv")))
        .orderBy("side")
    },

    // limit (exact here — approximate in the reference,
    // RichPipe.scala:477) and seeded sampling: self-validating
    // properties.
    q("q_limit_sample",
      "SELECT 100 AS n_limit, true AS sample_in_bounds") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val nLimit = li.limitTo(100).count()
      val nSample = li.sampleRows(0.1, 42L).count()
      val total = li.count()
      import s.implicits._
      Seq((nLimit, nSample > total / 20 && nSample < total / 5))
        .toDF("n_limit", "sample_in_bounds")
    },

    // matrix row-cosine similarity (normalized self-product):
    // supplier × supplier cosine over part-quantity vectors.
    q("q_matrix_cosine",
      """WITH A AS (
        |  SELECT l_suppkey AS row, l_partkey AS col, sum(l_quantity) AS val
        |  FROM lineitem GROUP BY 1, 2
        |), N AS (
        |  SELECT row, col, val / sqrt(sum(val * val) OVER (PARTITION BY row)) AS val
        |  FROM A
        |)
        |SELECT a.row AS row, b.row AS col, round(sum(a.val * b.val), 6) AS val
        |FROM N a JOIN N b ON a.col = b.col
        |GROUP BY 1, 2 ORDER BY row, col""".stripMargin) { (s, dir) =>
      val coo = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("row"), col("l_partkey").as("col"))
        .agg(sum("l_quantity").as("val"))
      M.fromCoo(coo, "row", "col", "val").rowCosineSimilarity.df
        .select(col("row"), col("col"), round(col("val"), 6).as("val"))
        .orderBy("row", "col")
    },

    // winnowing fingerprints (rolling-hash document fingerprinting):
    // deterministic property — an exact copy shares its full
    // fingerprint set; the oracle asserts the contract.
    q("q_text_winnow",
      """SELECT doc_id, true AS copy_matches
        |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      docs.map { case (id, text) =>
        val full = TA.winnowingFingerprints(text).toSet
        val copy = TA.winnowingFingerprints(String.valueOf(text)).toSet
        val prefix = TA.winnowingFingerprints(
          text.substring(0, (text.length * 0.9).toInt)).toSet
        // exact copy ⇒ identical set; 90% prefix ⇒ high overlap
        val overlap = (full & prefix).size.toDouble / math.max(full.size, 1)
        (id, copy == full && full.nonEmpty && overlap >= 0.4)
      }.toDF("doc_id", "copy_matches")
        .orderBy("doc_id")
    }
  )
}
