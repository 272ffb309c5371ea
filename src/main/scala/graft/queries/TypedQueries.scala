package graft.queries

import org.apache.spark.sql.functions._
import graft.typed.TypedPipe
import graft.agg.Monoid

/** Queries routed through the typed API (graft.typed.TypedPipe /
  * Grouped / SortedGrouped) so the correctness gate exercises the
  * closure-based surface — the reference's TypedPipe
  * (TypedPipe.scala:80-500) — not just the Column DSL. The oracles
  * stay plain SQL because the semantics are relational.
  */
object TypedQueries extends QueryGroup {

  // precompiled whitespace splitter — String.split("\\s+") recompiles
  // the regex on every row
  private val ws = java.util.regex.Pattern.compile("\\s+")
  private[queries] def wsSplit(s: String): Seq[String] =
    ws.split(s.trim).toSeq.filter(_.nonEmpty)

  val all: Seq[QueryDef] = Seq(

    // WordCount — the reference's flagship example
    // (examples/WordCountJob.scala:5-10) — via typed flatMap + group
    // + monoid sum.
    q("q_typed_wordcount",
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents WHERE trim(text) != ''
        |) WHERE word != '' GROUP BY word ORDER BY word""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents").select("text").as[String]
      TypedPipe.from(docs)
        .flatMap(TypedQueries.wsSplit(_))
        .map(w => (w, 1L))
        .group[String, Long]
        .sum(Monoid.longMonoid)
        .toDF("word", "n")
        .orderBy("word")
    },

    // per-key bounded top-k through the PriorityQueue-style
    // Aggregator (`sortedTake`, ReduceOperations.scala:436-444):
    // top-3 order totals per customer, map-side partial top-k — no
    // full window sort.
    q("q_typed_sortedtake",
      """SELECT o_custkey, o_totalprice FROM (
        |  SELECT o_custkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, rn""".stripMargin) { (s, dir) =>
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
        .as[(Long, Double, Long)]
      // order: totalprice desc, orderkey asc — encoded as ordering on
      // (-price, orderkey)
      implicit val ord: Ordering[(Double, Long)] =
        Ordering.by((t: (Double, Long)) => (-t._1, t._2))(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
      TypedPipe.from(orders)
        .map { case (c, p, k) => (c, (p, k)) }
        .group[Long, (Double, Long)]
        .sortedTake(3)
        .ds.flatMap { case (c, tops) => tops.map(t => (c, t._1)) }
        .toDF("o_custkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc)
    },

    // secondary-sorted running fold (scanLeft,
    // StreamOperations.scala:69-75) through the
    // repartition+sortWithinPartitions+mapPartitions machinery:
    // running order count per customer in date order.
    q("q_typed_scanleft",
      """SELECT o_custkey, running_n FROM (
        |  SELECT o_custkey, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS running_n
        |  FROM orders)
        |ORDER BY o_custkey, running_n""".stripMargin) { (s, dir) =>
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("ts"), col("o_orderkey"))
        .as[(Long, Long, Long)]
      TypedPipe.from(orders)
        .map { case (c, ts, k) => (c, (ts, k)) }
        .group[Long, (Long, Long)]
        .sortBy { case (ts, k) => (ts, k) }
        .scanLeft(0L)((acc, _) => acc + 1L)
        .toDF("o_custkey", "running_n")
        .orderBy("o_custkey", "running_n")
    },

    // ordered non-commutative fold (foldLeft,
    // GroupBuilder.scala:154-161): orderkeys concatenated in date
    // order per customer — order-sensitivity makes any
    // secondary-sort bug visible.
    q("q_typed_foldleft",
      """SELECT o_custkey,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderdate, o_orderkey)
        |    AS orders_in_date_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("ts"), col("o_orderkey"))
        .as[(Long, Long, Long)]
      TypedPipe.from(orders)
        .map { case (c, ts, k) => (c, (ts, k)) }
        .group[Long, (Long, Long)]
        .sortBy { case (ts, k) => (ts, k) }
        .foldLeft("") { (acc, v) =>
          if (acc.isEmpty) v._2.toString else acc + "," + v._2.toString
        }
        .toDF("o_custkey", "orders_in_date_order")
        .orderBy("o_custkey")
    },

    // arbitrary per-group list computation (mapList/mapStream,
    // ReduceOperations.scala:231-241): median order value per
    // customer computed inside the closure, matching DuckDB's
    // median() (mean of middle two for even counts).
    q("q_typed_median",
      """SELECT o_custkey, round(median(o_totalprice), 4) AS median_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)]
      TypedPipe.from(orders)
        .group[Long, Double]
        .mapGroup[Double] { (_, vs) =>
          val sorted = vs.toArray.sorted
          val n = sorted.length
          val m =
            if (n % 2 == 1) sorted(n / 2)
            else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
          Iterator.single(math.floor(m * 1e4 + 0.5) / 1e4)
        }
        .toDF("o_custkey", "median_price")
        .orderBy("o_custkey")
    },

    // typed cogroup with a joiner closure (CoGrouped2.scala:95-175):
    // per nation, customer count × supplier count computed inside the
    // closure.
    q("q_typed_cogroup",
      """SELECT n.n_nationkey AS nationkey,
        |  (SELECT count(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_cust,
        |  (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_supp
        |FROM nation n ORDER BY nationkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val nations = t(s, dir, "nation").select(col("n_nationkey").cast("long"))
        .as[Long].map(k => (k, 1))
      val custs = t(s, dir, "customer").select(col("c_nationkey").cast("long"))
        .as[Long].map(k => (k, 1L))
      val supps = t(s, dir, "supplier").select(col("s_nationkey").cast("long"))
        .as[Long].map(k => (k, 1L))
      val nGrouped = TypedPipe.from(nations).group[Long, Int]
      val cGrouped = TypedPipe.from(custs).group[Long, Long]
      val sGrouped = TypedPipe.from(supps).group[Long, Long]
      val custCounts = nGrouped.cogroup(cGrouped) { (_, ns, cs) =>
        if (ns.isEmpty) Iterator.empty else Iterator.single(cs.size.toLong)
      }
      val suppCounts = nGrouped.cogroup(sGrouped) { (_, ns, ss) =>
        if (ns.isEmpty) Iterator.empty else Iterator.single(ss.size.toLong)
      }
      custCounts.group[Long, Long].join(suppCounts.group[Long, Long])
        .ds.map { case (k, (c, su)) => (k, c, su) }
        .toDF("nationkey", "n_cust", "n_supp")
        .orderBy("nationkey")
    }
  )
}
