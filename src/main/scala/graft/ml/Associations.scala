package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: the co-occurrence statistics
  * (support / confidence / lift) behind "items bought together" and,
  * in corpus work, "tags/domains that co-occur in a document". Pair
  * generation is the classic Apriori first pass — quadratic only
  * within a basket, with an optional per-basket size cap as the skew
  * guard.
  */
object Associations {

  /** Frequent item PAIRS with association statistics. `df` holds one
    * row per (basket, item) incidence (duplicates collapse). For each
    * unordered pair meeting `minSupport` co-occurrences, reports
    * (item_a, item_b, n_a, n_b, n_ab, support, conf_a_b, conf_b_a,
    * lift) with item_a < item_b:
    * support = n_ab/N baskets, conf_a_b = P(b|a) = n_ab/n_a,
    * lift = n_ab·N/(n_a·n_b) (> 1 = positive association).
    * `maxBasketSize` drops baskets larger than the cap BEFORE pairing
    * (0 = no cap) — the standard guard against one degenerate
    * mega-basket contributing |B|² pairs.
    *
    * Scale shape: one distinct (basket, item) aggregate; the pair
    * join is basket-keyed so quadratic work is bounded by the capped
    * basket size; everything downstream runs on the (observed-pair)
    * count table with item-keyed marginal joins and a broadcast 1-row
    * basket total.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 0): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 0, s"maxBasketSize must be >= 0, got $maxBasketSize")
    val incidence0 = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val incidence = graft.core.PipelineCaches.persistTracked(
      if (maxBasketSize == 0) incidence0
      else {
        val sizes = incidence0.groupBy("b")
          .agg(count(lit(1)).as("sz"))
          .filter(col("sz") <= maxBasketSize)
          .select("b")
        incidence0.join(sizes, "b")
      })
    val nBaskets = incidence.agg(countDistinct("b").as("nb"))
    val itemCounts = incidence.groupBy("i").agg(count(lit(1)).as("n"))
    val pairs = incidence.alias("a")
      .join(incidence.alias("c"),
        col("a.b") === col("c.b") && col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("ia"), col("c.i").as("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(itemCounts.select(col("i").as("ia"), col("n").as("n_a")), "ia")
      .join(itemCounts.select(col("i").as("ib"), col("n").as("n_b")), "ib")
      .crossJoin(broadcast(nBaskets))
      .select(col("ia").as("item_a"), col("ib").as("item_b"),
        col("n_a"), col("n_b"), col("n_ab"),
        (col("n_ab").cast("double") / col("nb")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("conf_a_b"),
        (col("n_ab").cast("double") / col("n_b")).as("conf_b_a"),
        (col("n_ab").cast("double") * col("nb") /
          (col("n_a").cast("double") * col("n_b"))).as("lift"))
  }

  /** Item-item cosine neighbors from co-occurrence counts — the
    * classic "related items" model (Sarwar et al. 2001 item-based
    * CF on implicit data): sim(a,b) = n_ab / √(n_a·n_b), top-k
    * neighbors per item by (sim desc, item). Runs ON TOP of
    * [[frequentPairs]]'s bounded pair table, so the same per-basket
    * cap bounds the candidate volume; per-item top-k is a
    * partitioned window over basket-bounded neighbor lists.
    */
  def itemCosineNeighbors(df: DataFrame, basketCol: String,
      itemCol: String, topK: Int, minSupport: Long = 2L,
      maxBasketSize: Int = 0): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pairs = frequentPairs(df, basketCol, itemCol, minSupport,
      maxBasketSize)
    // symmetrize: frequentPairs emits each unordered pair once
    val sym = pairs.select(col("item_a").as("item"),
        col("item_b").as("neighbor"), col("n_a"), col("n_b"),
        col("n_ab"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("n_b").as("n_a"),
        col("n_a").as("n_b"), col("n_ab")))
      .withColumn("cosine", col("n_ab").cast("double") /
        sqrt(col("n_a").cast("double") * col("n_b")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("item").orderBy(col("cosine").desc, col("neighbor"))
    sym.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topK)
      .select("item", "neighbor", "n_ab", "cosine")
  }
}
