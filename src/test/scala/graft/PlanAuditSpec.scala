package graft

/** Locks in the physical-plan properties docs/PLANS.md documents — the
  * shapes that make these operators viable at 100 TB. A regression
  * here (a filter that stops reaching the scan, a broadcast that
  * becomes a shuffle, a partial agg that disappears) would pass every
  * value-correctness test and still be a scale bug.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("q_filter_project pushes the predicate into the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"filter not pushed:\n$p")
    // column pruning: the scan must read exactly the 4 referenced
    // columns, not the full 16-col lineitem
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .flatMap(_.split("ReadSchema: ").lastOption).getOrElse("")
    val nCols = readSchema.count(_ == ',') + 1
    assert(nCols == 4, s"scan reads $nCols columns: $readSchema")
  }

  test("q_join_broadcast plans a broadcast hash join, never a shuffle of the fact side") {
    val p = plan("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(p.contains("BroadcastExchange"), s"no broadcast exchange:\n$p")
  }

  test("q_typed_sortedtake ships partial top-k before the exchange") {
    val p = plan("q_typed_sortedtake")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l =>
      l.contains("ObjectHashAggregate") && l.contains("partial_"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(partialIdx >= 0, s"no partial object agg:\n$p")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial agg must sit below (after in tree print) the exchange:\n$p")
  }

  test("q_fields_sortedtake ships bounded partial top-k before the exchange") {
    val p = plan("q_fields_sortedtake")
    val lines = p.linesIterator.toSeq
    assert(p.contains("collecttopk") || p.contains("collect_top_k"),
      s"not the bounded-PQ aggregate:\n$p")
    val partialIdx = lines.indexWhere(l =>
      l.contains("ObjectHashAggregate") && l.contains("partial_"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(partialIdx >= 0, s"no partial object agg:\n$p")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial agg must sit below (after in tree print) the exchange:\n$p")
  }

  test("q_fields_mapstream shuffles ONCE by key and sorts within partitions") {
    val p = plan("q_fields_mapstream")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 key exchange, got $exchanges:\n$p")
    assert(p.contains("Sort ") && !p.contains("Window"),
      s"expected an in-partition sort and no window operator:\n$p")
    assert(p.contains("MapPartitions"), s"no streaming buffer kernel:\n$p")
  }

  test("q_trap_throwing stays scan-shaped: no key shuffle, no window, " +
      "one persisted tagged pass feeding both branches") {
    val p = plan("q_trap_throwing")
    assert(!p.contains("Exchange hashpartitioning"),
      s"trap split must not shuffle by key:\n$p")
    assert(!p.contains("Window"), s"no window expected:\n$p")
    // round 11: the split is a SINGLE tagged mapPartitions pass,
    // persisted; both branches read the cache (so a non-deterministic
    // upstream cannot diverge the branches) — the kernel lives inside
    // the cached relation's plan
    assert(p.contains("InMemoryTableScan"),
      s"no persisted tagged union:\n$p")
    val exec = SparkEntry.queries("q_trap_throwing")(spark, sf("sf0.001"))
      .queryExecution.executedPlan
    val cached = graft.tools.PlanLint.nodes(exec).collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        m.relation.cachedPlan.toString
    }
    assert(cached.exists(_.contains("MapPartitions")),
      s"no Try-split kernel inside the cached plan:\n${cached.mkString}")
    graft.core.PipelineCaches.unpersistAll()
  }

  test("q_events_burstiness: both lag windows are user-partitioned " +
      "over ONE key exchange, then a type hash aggregate") {
    val p = plan("q_events_burstiness")
    // every windowspec carries the user_id partition column
    assert(p.contains("Window ") &&
      p.linesIterator.filter(_.contains("windowspecdefinition"))
        .forall(_.contains("user_id")),
      s"window not user-partitioned:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning(user_id")) == 1,
      s"expected exactly one user-key exchange:\n$p")
    assert(p.contains("HashAggregate(keys=[event_type"),
      s"no type hash aggregate:\n$p")
  }

  test("q_profile_hhi is two stacked hash aggregates off a pruned " +
      "2-column scan — no window, no join") {
    val p = plan("q_profile_hhi")
    assert(!p.contains("Window") && !p.contains("Join"), s"extra ops:\n$p")
    assert(p.linesIterator.count(_.contains("partial_")) == 2,
      s"expected two partial (map-side) aggregates:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .flatMap(_.split("ReadSchema: ").lastOption).getOrElse("")
    assert(readSchema.count(_ == ',') + 1 == 2,
      s"scan must read exactly 2 columns: $readSchema")
  }

  test("q_profile_mi reduces to (lang,source) counts before every " +
      "join; totals ride whitelisted 1-row broadcasts") {
    val p = plan("q_profile_mi")
    assert(!p.contains("Window"), s"no window expected:\n$p")
    // every parquet scan is the pruned 2-column projection — the
    // corpus never reaches a join un-aggregated
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(schemas.nonEmpty &&
      schemas.forall(_.contains("struct<lang:string,source:string>")),
      s"un-pruned scan:\n${schemas.mkString("\n")}")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"),
      s"1-row totals must broadcast:\n$p")
  }

  test("q_text_richness is one token explode into hash aggregates — " +
      "no window, no join") {
    val p = plan("q_text_richness")
    assert(p.contains("Generate explode"), s"no token explode:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"), s"extra ops:\n$p")
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
  }

  test("q_text_heaps checkpoint thresholds carry no window at all " +
      "(distributed order statistics, round 11)") {
    val p = plan("q_text_heaps")
    assert(!p.contains("Window"),
      s"heapsFit must not plan any WindowExec:\n$p")
  }

  test("q_profile_sample ships bounded partial top-k and joins back semi") {
    val p = plan("q_profile_sample")
    assert(p.toLowerCase.contains("collecttopk") ||
      p.toLowerCase.contains("collect_top_k"),
      s"not the bounded-PQ aggregate:\n$p")
    assert(p.contains("LeftSemi"), s"no semi join back:\n$p")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l =>
      l.contains("ObjectHashAggregate") && l.contains("partial_"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial bounded top-k must sit below its exchange:\n$p")
  }

  test("q_agg_groupby is a two-phase hash aggregation (map-side combine)") {
    val p = plan("q_agg_groupby")
    val partials = p.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("partial_"))
    val finals = p.linesIterator.count(l =>
      l.contains("HashAggregate") && !l.contains("partial_"))
    assert(partials >= 1 && finals >= 1, s"missing partial/final split:\n$p")
  }

  test("q_ann_bruteforce scans the corpus once and aggregates bounded top-k") {
    val p = plan("q_ann_bruteforce")
    // the probe side is collected + captured (no second distributed
    // scan of embeddings); the corpus is scanned exactly once
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one corpus scan, got $scans:\n$p")
    // the per-query top-k rides the bounded aggregator, so the only
    // exchange after scoring carries at most k rows per query per task
    assert(p.contains("ObjectHashAggregate"), s"no bounded top-k agg:\n$p")
  }

  test("quantized ANN keeps the broadcast-probe shape: one corpus pass, bounded top-k") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val df = graft.ml.Similarity.bruteForceTopKQuantized(
      e.filter(col("id") < 3), graft.ml.Similarity.quantizeInt8(e), 5)
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one corpus scan, got $scans:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"no bounded top-k agg:\n$p")
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l =>
      l.contains("ObjectHashAggregate") && l.contains("partial_"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(partialIdx > exchangeIdx && exchangeIdx >= 0,
      s"partial top-k must ride below the exchange:\n$p")
  }

  test("selective dim filter injects a runtime bloom filter into the fact scan") {
    import org.apache.spark.sql.functions.col
    // production thresholds need a ≥10 GB application side; shrink
    // them so the optimizer's injection logic is exercised at test
    // scale (the conf itself ships enabled in GraftSession)
    val settings = Seq(
      // app side must exceed this (default 10 GB) — drop to 0
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // creation side must stay UNDER this cap — raise it
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      // a broadcast join would filter row-by-row anyway; force the
      // shuffle-join shape the bloom filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = settings.map { case (k, _) => k -> spark.conf.getOption(k) }
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity")
      val dim = spark.read.parquet(sf("sf0.01") + "/part.parquet")
        .filter(col("p_size") === 1)
        .select("p_partkey")
      val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter") ||
        p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("parquet aggregate pushdown answers unfiltered min/max/count from metadata") {
    import org.apache.spark.sql.functions._
    // aggregate pushdown is a DSv2 reader feature; the engine defaults
    // to V1 (bucketed tables need it), so a stats-only job opts into
    // V2 for the metadata-only scan
    val key = "spark.sql.sources.useV1SourceList"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "")
    try {
      val p = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
        .agg(min("o_orderkey"), max("o_orderkey"), count(lit(1)))
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]"),
        s"aggregate not pushed to parquet footers:\n$p")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("q_date_range_filter prunes with pushed timestamp bounds") {
    val p = plan("q_date_range_filter")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(o_orderdate"),
      s"date bound not pushed:\n$p")
  }

  test("heavy hitters verify pass filters to candidates before the exchange") {
    // the returned plan is pass 2 (the sketch pass already ran); the
    // vocabulary shuffle must be gated by the candidate-set filter and
    // the count must split partial/final
    val p = plan("q_text_heavy_hitters")
    val lines = p.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val filterIdx = lines.indexWhere(l =>
      l.contains("Filter") && (l.contains("INSET") || l.contains(" IN (")))
    assert(filterIdx >= 0, s"no candidate-set filter:\n$p")
    assert(exchangeIdx >= 0 && filterIdx > exchangeIdx,
      s"candidate filter must run below the exchange:\n$p")
    assert(lines.exists(l => l.contains("HashAggregate") && l.contains("partial_")),
      s"no partial count:\n$p")
  }

  test("salted collect is two bounded aggregations, not one hot-key reducer") {
    val p = plan("q_agg_salted_collect")
    // phase 1 groups by (key, salt), phase 2 by key — two hash
    // exchanges, each with per-task state bounded by ~1/nSalts of the
    // hottest key (plus the final ORDER BY's range exchange)
    val saltEx = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("__salt"))
    val keyEx = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("l_suppkey") &&
        !l.contains("__salt"))
    assert(saltEx, s"no (key, salt) exchange:\n$p")
    assert(keyEx, s"no final key exchange:\n$p")
  }

  test("sequence packing runs on a single shard exchange, no global sort") {
    // the whole pack is one hashpartitioning(shard) exchange + one
    // in-partition sort for the running sum; the final ORDER BY adds
    // its range exchange. No rangepartitioning before the window and
    // no extra hash exchanges — the property that keeps packing a
    // single-shuffle operator at 100 TB.
    val p = plan("q_text_pack")
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected exactly one hash exchange:\n$p")
    val sortIdx = p.linesIterator.indexWhere(l =>
      l.contains("Sort [") && l.contains("__h"))
    val winIdx = p.linesIterator.indexWhere(_.contains("Window"))
    assert(winIdx >= 0 && sortIdx > winIdx,
      s"window running sum must sort within the shard partition:\n$p")
  }

  test("DIMSUM gram keeps the shuffled-hash self-join on the sampled matrix") {
    import org.apache.spark.sql.functions._
    // audit the operator directly (the gate query also runs the exact
    // gram for its contract, which would make the plan ambiguous)
    val coo = graft.core.GraftSession.table(spark, sf("sf0.001"), "lineitem")
      .groupBy(col("l_suppkey").as("row"), col("l_partkey").as("col"))
      .agg(sum("l_quantity").as("val"))
    val p = graft.matrix.Matrix.fromCoo(coo, "row", "col", "val")
      .rowCosineDimsum(650.0).df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"gram contraction lost its hash join:\n$p")
    // the sampled matrix is materialized once: both self-join sides
    // must read the tracked cache, not recompute sampling + norms
    // (AQE exchange reuse does not reliably dedup the derived subtrees)
    // (the InMemoryRelation print inlines its own defining FileScans —
    // those run once at materialization, so don't count raw scans here)
    val cacheReads = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(cacheReads >= 2, s"self-join sides should read the cache:\n$p")
    graft.core.PipelineCaches.unpersistAll()
  }

  test("repetition metrics are a single corpus scan: no join, no mid-plan shuffle") {
    val p = plan("q_text_repetition")
    assert(!p.contains("Join"), s"repetition scan should not join:\n$p")
    // the only exchange is the final deterministic ORDER BY's range
    // partitioning — the metric computation itself never shuffles
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly the sort exchange:\n$p")
  }

  test("temperature mixing broadcasts the tiny rate table, never shuffles the corpus") {
    val p = plan("q_corpus_mix_temperature")
    assert(p.contains("BroadcastHashJoin"), s"rate join should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle for the join:\n$p")
  }

  test("document chunking is one narrow generate: no join, no mid-plan shuffle") {
    val p = plan("q_text_chunk")
    assert(!p.contains("Join"), s"chunking should not join:\n$p")
    // chunk boundaries are per-row array arithmetic; the only exchange
    // is the deterministic ORDER BY's range partitioning
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not hash-shuffle:\n$p")
  }

  test("duplicate-span merge reuses the window's doc partitioning (no extra exchange)") {
    val lines = plan("q_dedup_spans").linesIterator.toSeq
    val lastWindow = lines.lastIndexWhere(_.trim.startsWith("+- Window"))
    assert(lastWindow > 0, s"no window in plan:\n${lines.mkString("\n")}")
    // everything above the span-merge window (the final agg + sort)
    // must not re-shuffle: hashpartitioning(doc_id) already satisfies
    // the (doc_id, grp) grouping
    val above = lines.take(lastWindow)
    assert(!above.exists(_.contains("Exchange hashpartitioning")),
      s"span merge re-shuffled after the window:\n${lines.mkString("\n")}")
    // whole query: exactly 2 hash exchanges — the min≠max dup-gram
    // aggregation (single shuffle, not distinct + count) and the
    // per-doc window; the only other exchange is the ORDER BY's range
    // partitioning
    val nHash = lines.count(_.contains("Exchange hashpartitioning"))
    assert(nHash == 2, s"expected 2 hash exchanges, got $nHash:\n${lines.mkString("\n")}")
  }

  test("line dedup rebuilds from the first-occurrence aggregate, no line-keyed join") {
    val p = plan("q_text_line_dedup")
    val lines = p.linesIterator.toSeq
    // round 4 joined the exploded corpus back on the raw line text —
    // at 100 TB that ships every surviving line's full text through
    // the exchange twice. The rebuilt shape has NO join keyed on the
    // line: the only join is the narrow id-only restore.
    val joinKeyLines = lines.filter(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("line#"))
    assert(joinKeyLines.isEmpty, s"line-keyed join present:\n${joinKeyLines.mkString("\n")}")
    // the one line-keyed exchange is the first-occurrence groupBy,
    // whose partial min(struct(id,pos)) collapses duplicate mass
    // map-side before the shuffle
    val lineExchanges = lines.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("line#"))
    assert(lineExchanges == 1, s"expected 1 line-keyed exchange, got $lineExchanges:\n$p")
    val partialIdx = lines.indexWhere(l =>
      l.contains("Aggregate") && l.contains("partial_min"))
    assert(partialIdx >= 0, s"no partial min for first-occurrence:\n$p")
  }

  test("dsir builds both models from one token scan with map-side partials") {
    val p = plan("q_text_dsir")
    val lines = p.linesIterator.toSeq
    // the token-count aggregate (raw + conditional target counts in
    // ONE groupBy) must plant a partial below its exchange — the
    // duplicate token mass never ships raw
    val partialIdx = lines.indexWhere(l =>
      l.contains("HashAggregate") && l.contains("partial_count"))
    assert(partialIdx >= 0, s"no partial count for the token model:\n$p")
    val exchangeAbove = lines.take(partialIdx).exists(_.contains("Exchange hashpartitioning"))
    assert(exchangeAbove, s"partial agg not below an exchange:\n$p")
    // the corpus is deliberately re-scanned per consumer (narrow
    // scans beat corpus-sized caches — unigramNll's documented
    // trade): 3 scans = join stream + count aggregate + totals.
    // The point audited here: the TARGET model adds NO extra scan
    // over the single-model unigramNll shape (it rides the same
    // count aggregate as a conditional sum)
    val nScans = lines.count(_.contains("FileScan parquet"))
    assert(nScans <= 3, s"target sample scanned separately ($nScans scans):\n$p")
  }

  test("ngram novelty aggregates distinct docs in two levels, no Expand") {
    val p = plan("q_text_ngram_novelty")
    assert(!p.contains("Expand"), s"count-distinct Expand crept in:\n$p")
    // the (gram, doc) level must combine map-side before its exchange
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l =>
      l.contains("HashAggregate") && l.contains("partial_count"))
    assert(partialIdx >= 0, s"no partial count at the (gram, doc) level:\n$p")
  }

  test("mask spans is a pure scan: zero exchanges") {
    val p = plan("q_text_mask_spans")
    // the corruption itself is per-row Column arithmetic; the only
    // exchange allowed is the gate's final ORDER BY range partitioning
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 0, s"masking shuffled:\n$p")
  }

  test("attribution pre-reduces touches map-side and fills with one as-of window") {
    val p = plan("q_events_attribution")
    val lines = p.linesIterator.toSeq
    assert(p.contains("Window"), s"no as-of fill window:\n$p")
    // the touch (user, sec) dedup must plant a partial aggregate
    // before its exchange — never ship raw touch events
    val partialIdx = lines.indexWhere(l =>
      l.contains("Aggregate") && l.contains("partial"))
    val exchangeAfter = lines.take(partialIdx).exists(_.contains("Exchange hashpartitioning"))
    assert(partialIdx >= 0, s"no partial aggregate for touch dedup:\n$p")
    assert(exchangeAfter, s"partial agg not below an exchange:\n$p")
  }

  test("domain cap broadcasts the winner set back; the doc table never shuffles") {
    val p = plan("q_corpus_domain_cap")
    val lines = p.linesIterator.toSeq
    // join-back is broadcast: the full-width doc side must not move
    assert(p.contains("BroadcastHashJoin"), s"join-back not broadcast:\n$p")
    // the winner selection is an ObjectHashAggregate over the PQ
    // buffer with a partial before its exchange (shuffle carries ≤ k
    // pairs per domain per task, not rows)
    val partialIdx = lines.indexWhere(l =>
      l.contains("Aggregate") && l.contains("partial"))
    assert(partialIdx >= 0, s"no partial top-k aggregate:\n$p")
    assert(lines.take(partialIdx).exists(_.contains("Exchange hashpartitioning")),
      s"partial top-k not below the exchange:\n$p")
    // exactly one hash exchange in the whole plan — the k-bounded
    // winner aggregation; a second would mean the doc table shuffled
    val nHash = lines.count(_.contains("Exchange hashpartitioning"))
    assert(nHash == 1, s"expected 1 hash exchange, got $nHash:\n$p")
  }

  test("triangle counting never sorts or exchanges the wedge stream") {
    import org.apache.spark.sql.functions._
    val items = graft.core.GraftSession.table(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = items.alias("a").join(items.alias("b"), Seq("o"))
      .filter(col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
    val p = graft.graph.Graphs.triangleCounts(edges)
      .queryExecution.executedPlan.toString
    val lines = p.linesIterator.toVector
    // the O(m^1.5) volume lives inside array_intersect, so the
    // adjacency joins must be hash joins (a sort-merge would sort the
    // wedge-bearing stream) and the intersect/explode stage must not
    // feed an exchange before its per-node aggregation's partial
    def isKernel(l: String) =
      l.contains("array_intersect") || l.contains("sortedintersect")
    assert(lines.exists(isKernel),
      s"adjacency-intersection kernel missing:\n$p")
    // (plan text prints root-first: children FOLLOW their parent, so
    // "below the intersect stage" = lines after it; the tiny final
    // deg-per-node join above it may be whatever AQE likes)
    val intersectIdx = lines.indexWhere(isKernel)
    assert(!lines.drop(intersectIdx).exists(_.contains("SortMergeJoin")),
      s"sort-merge join below the intersection stage:\n$p")
    // per-node counting partial-aggregates before its exchange
    val partialIdx = lines.indexWhere(l =>
      l.contains("HashAggregate") && l.contains("partial_count"))
    assert(partialIdx >= 0, s"no partial count aggregate:\n$p")
  }

  test("interval join is a bucketed equi-join: no cartesian, no nested loop") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val l = (1 to 200).map(i => (i % 5, i.toLong, i * 10.0, i * 10.0 + 30))
      .toDF("k", "lid", "ls", "le")
    val r = (1 to 200).map(i => (i % 5, i.toLong, i * 7.0, i * 7.0 + 20))
      .toDF("k", "rid", "rs", "re")
    val p = graft.join.Joins
      .intervalJoin(l, r, "ls", "le", "rs", "re", 25.0, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval join must stay an equi-join:\n$p")
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("bootstrap replicate means pre-aggregate map-side before the exchange") {
    import org.apache.spark.sql.functions._
    val perUser = graft.core.GraftSession.table(spark, sf("sf0.001"), "events")
      .withColumn("variant", (col("user_id") % 3).cast("string"))
      .groupBy("user_id", "variant")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("converted"))
    val p = graft.events.Events
      .bootstrapCI(perUser, "user_id", "variant", "converted", nReps = 50)
      .queryExecution.executedPlan.toString
    // the (variant, r) aggregate must show a partial before its
    // exchange: the users×reps explode never crosses the wire raw
    val lines = p.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l0 =>
      l0.contains("HashAggregate") && l0.contains("partial_"))
    assert(partialIdx >= 0, s"no partial aggregate in:\n$p")
  }

  test("per-session aggregates ride the native sessionize partitioning: one exchange") {
    import org.apache.spark.sql.functions._
    val raw = graft.core.GraftSession.table(spark, sf("sf0.001"), "events")
    val ev = raw.select(col("user_id"),
      graft.core.Ts.seconds(raw).as("sec"), col("event_id"), col("value"))
    val p = org.apache.spark.sql.graft.SessionizeNative
      .sessionize(ev, Seq("user_id"), "sec", gapSec = 1800L)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Sessionize "), s"native exec missing:\n$p")
    // AQE prints a reused subtree twice; count DISTINCT exchanges
    val ids = "\\[plan_id=(\\d+)\\]".r
      .findAllMatchIn(p.linesIterator.filter(_.contains("Exchange "))
        .mkString("\n"))
      .map(_.group(1)).toSet
    assert(ids.size == 1,
      s"per-session agg should add no exchange (got $ids):\n$p")
  }
  test("q_events_psm joins treated rows against the GRID aggregate, not raw controls") {
    val p = plan("q_events_psm")
    // the control side must be reduced to distinct grid values before
    // the candidate join: a (g, score) partial+final hash aggregate
    // feeds the join build side
    val partials = p.linesIterator.count(l =>
      l.contains("HashAggregate") && l.contains("partial_"))
    assert(partials >= 1, s"controls not pre-aggregated:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"PSM must never cartesian treated x controls:\n$p")
  }

  test("q_text_tiling windows are id-partitioned, never global") {
    val p = plan("q_text_tiling")
    val specs = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(specs.nonEmpty, s"no window in plan:\n$p")
    assert(specs.forall(_.contains("id#")),
      s"found a window without the id partition key:\n$p")
  }

  test("q_events_stickiness: the lag window is user-partitioned and the day sweep sits on an aggregate") {
    val p = plan("q_events_stickiness")
    val specs = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(specs.nonEmpty, s"no window in plan:\n$p")
    // exactly one window family may be unpartitioned: the bounded
    // day-grid sweep (keyed by day only); the user-history lag must
    // carry the user partition key
    val unpartitioned = specs.filterNot(_.contains("user#"))
    assert(unpartitioned.forall(_.contains("day#")),
      s"unpartitioned window that is not the day-grid sweep:\n$p")
    assert(specs.exists(_.contains("user#")),
      s"the activity-interval lag lost its user partition:\n$p")
  }
}
