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
    * Scale shape: ONE basket-keyed aggregate builds each basket's
    * sorted item array (collapsing duplicates — the old separate
    * distinct), pair enumeration runs inside whole-stage codegen over
    * that array ([[org.apache.spark.sql.graft.PackedPairs]]) straight
    * into the pair count's partial aggregate — no basket self-join,
    * no second shuffle of the incidence list — and the pair aggregate
    * keys on ONE packed long instead of a two-column struct.
    * Everything downstream runs on the (observed-pair) count table
    * with item-keyed marginal joins and a broadcast 1-row basket
    * total. Integral item ids take the packed path (they must fit in
    * 31 bits — PackedPairs fails loudly otherwise); pass
    * `packedIds = false` for integral ids outside that range (hash-
    * derived, negative): the struct-pair path enumerates from the same
    * sorted array with the two-column key, preserving the item type
    * and the old `<`-ordering semantics for any id domain.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Int = 0,
      packedIds: Boolean = true): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 0, s"maxBasketSize must be >= 0, got $maxBasketSize")
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val itemType = df.schema(df.schema.fieldIndex(itemCol)).dataType
    val packed =
      packedIds && (itemType == LongType || itemType == IntegerType)
    val itemExpr =
      if (packed) col(itemCol).cast("long") else col(itemCol)
    val baskets0 = df
      .select(col(basketCol).as("b"), itemExpr.as("i"))
      .groupBy("b")
      .agg(sort_array(collect_set(col("i"))).as("items"))
    val baskets = graft.core.PipelineCaches.persistTracked(
      if (maxBasketSize == 0) baskets0
      else baskets0.filter(size(col("items")) <= maxBasketSize))
    val nBaskets = baskets.agg(count(lit(1)).as("nb"))
    val itemCounts = baskets.select(explode(col("items")).as("i"))
      .groupBy("i").agg(count(lit(1)).as("n"))
    val pairs0 =
      if (packed)
        baskets
          .select(explode(org.apache.spark.sql.graft.PairFunctions
            .packed_pairs(col("items"))).as("pk"))
          .groupBy("pk")
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= minSupport)
          .select(shiftrightunsigned(col("pk"), 32)
              .cast(itemType).as("ia"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL))
              .cast(itemType).as("ib"), col("n_ab"))
      else
        baskets
          .select(explode(flatten(transform(col("items"), (x, i) =>
            transform(
              slice(col("items"), i + lit(2), size(col("items"))),
              y => struct(x.as("ia"), y.as("ib")))))).as("p"))
          .groupBy(col("p.ia").as("ia"), col("p.ib").as("ib"))
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= minSupport)
    val pairs = pairs0
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
      maxBasketSize: Int = 0, packedIds: Boolean = true): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pairs = frequentPairs(df, basketCol, itemCol, minSupport,
      maxBasketSize, packedIds)
    // symmetrize: frequentPairs emits each unordered pair once. A
    // two-branch union would evaluate the whole frequentPairs subtree
    // twice (Spark plans each union child independently — measured as
    // a full duplicate of the pair aggregate in the r11 metrics dump);
    // emitting both orientations from ONE pass via a 2-element
    // explode keeps a single evaluation.
    val sym = pairs.select(explode(array(
        struct(col("item_a").as("item"), col("item_b").as("neighbor"),
          col("n_a"), col("n_b"), col("n_ab")),
        struct(col("item_b").as("item"), col("item_a").as("neighbor"),
          col("n_b").as("n_a"), col("n_a").as("n_b"), col("n_ab"))))
        .as("s"))
      .select(col("s.item").as("item"), col("s.neighbor").as("neighbor"),
        col("s.n_a").as("n_a"), col("s.n_b").as("n_b"),
        col("s.n_ab").as("n_ab"))
      .withColumn("cosine", col("n_ab").cast("double") /
        sqrt(col("n_a").cast("double") * col("n_b")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("item").orderBy(col("cosine").desc, col("neighbor"))
    sym.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topK)
      .select("item", "neighbor", "n_ab", "cosine")
  }
}
