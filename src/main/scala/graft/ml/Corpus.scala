package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: turning a
  * cleaned document set into the thing a trainer actually consumes —
  * fixed-length token sequences with controlled domain mix.
  *
  * The reference stops at per-record transforms (map/filter closures,
  * RichPipe.scala:372-395); these are the post-dedup steps a modern
  * pretraining pipeline adds on top. Everything here is pure Column
  * arithmetic over one hash-partitioned window — exact, deterministic,
  * and one shuffle per operator regardless of corpus size.
  */
object Corpus {

  /** Deterministic pseudo-random placement key: md5 of the id, a
    * cryptographic 128-bit hash, so ordering by it is an
    * indistinguishable-from-random permutation that any engine can
    * replay (same idiom as Profile.hashSampleStrong).
    */
  private def placementKey(id: Column): Column = md5(id.cast("string"))

  /** Length-bucketed "sortish" training order (the padding-efficiency
    * staple for batched variable-length training): each document gets
    * a length bucket from FROZEN token-count `cutoffs` (bucket 1 =
    * shortest; pass quantiles from a profiling run or fixed powers of
    * two) and a deterministic md5 `sort_key` salted by `salt`.
    * Writing ordered by (bucket, sort_key) yields batches of
    * similar-length documents with pseudo-random order INSIDE each
    * bucket — near-sorted padding efficiency without the
    * degenerate strict-sort curriculum, re-shufflable per epoch by
    * changing the salt. Pure Column program, zero shuffle here; the
    * final (bucket, key) orderBy is Spark's range-partitioned sort.
    */
  def lengthBucketedOrder(docs: DataFrame, idCol: String,
      tokCol: String, cutoffs: Seq[Double],
      salt: Long = 0L): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs == cutoffs.sorted,
      "cutoffs must be non-empty and ascending")
    val bucket = cutoffs.foldLeft(lit(1L)) { (acc, c) =>
      acc + when(col(tokCol) > c, 1L).otherwise(0L)
    }
    docs.withColumn("bucket", bucket)
      .withColumn("sort_key",
        md5(concat_ws(":", lit(salt).cast("string"),
          col(idCol).cast("long").cast("string"))))
  }

  /** Per-bucket padding-efficiency stats for a [[lengthBucketedOrder]]
    * assignment: if batches are formed within a bucket and padded to
    * the bucket's longest member, `pad_frac_bound` = (n·max − Σtok) /
    * (n·max) bounds the wasted fraction — the number that justifies
    * (or rejects) a cutoff choice before any training run. One hash
    * aggregate.
    */
  def lengthBucketStats(bucketed: DataFrame, tokCol: String): DataFrame =
    bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col(tokCol)).as("min_tok"),
        max(col(tokCol)).as("max_tok"),
        sum(col(tokCol)).cast("long").as("sum_tok"))
      .withColumn("pad_frac_bound",
        when(col("max_tok") > 0,
          (col("n_docs") * col("max_tok") - col("sum_tok")).cast("double") /
            (col("n_docs") * col("max_tok"))).otherwise(lit(0.0)))
      .orderBy("bucket")

  /** GPT-style sequence packing (concat-and-chunk): documents are
    * deterministically sharded, pseudo-randomly ordered within their
    * shard, logically concatenated, and the token stream is cut every
    * `ctxLen` tokens. Each document is assigned the sequence in which
    * it STARTS (`seq_id`, local to its shard — the global key is
    * `(shard, seq_id)`) and its token offset within that sequence. A downstream writer groups by (shard, seq_id) to emit
    * trainer-ready rows; documents longer than `ctxLen` simply span
    * multiple sequences (`n_seqs`).
    *
    * Plan shape at scale: one hashpartitioning(shard) exchange + one
    * in-partition sort — the cumulative sum is a running window, never
    * a global sort. Shards are the unit of parallelism: pick nShards
    * ≈ cluster cores so each shard's running sum streams.
    *
    * All arithmetic is integer (`div`/`pmod`), so results are exact
    * and engine-independent — no floating-point drift.
    */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
      ctxLen: Int, nShards: Int): DataFrame = {
    val id = col(idCol)
    val shard = pmod(id, lit(nShards)).cast("long")
    val w = Window.partitionBy("shard").orderBy(col("__h"), id)
    docs
      .withColumn("shard", shard)
      .withColumn("__h", placementKey(id))
      .withColumn("__cum", sum(col(tokCol)).over(w))
      .withColumn("__start", col("__cum") - col(tokCol))
      .select(
        id,
        col("shard"),
        expr(s"__start div $ctxLen").as("seq_id"),
        pmod(col("__start"), lit(ctxLen.toLong)).as("seq_offset"),
        // sequences this doc touches: first cut strictly before the
        // doc's last token (empty docs touch exactly one)
        when(col(tokCol) <= 0, lit(1L))
          .otherwise(expr(s"(__cum - 1) div $ctxLen") - expr(s"__start div $ctxLen") + 1L)
          .as("n_seqs"))
  }

  /** Whole-document bin packing (best-fit decreasing) — the NO-SPLIT
    * packing regime (SFT / instruction tuning, where a document must
    * not straddle sequences, unlike [[packSequences]]'s
    * concat-and-chunk): within each deterministic shard, documents
    * are taken in decreasing token order and placed into the open bin
    * with the SMALLEST sufficient remaining capacity (ties to the
    * lowest bin id); no fit opens a new bin. Documents of `ctxLen`+
    * tokens get a bin of their own (flag-and-truncate downstream).
    *
    * Returns (shard, bin_id, id, n_tokens): every doc exactly once,
    * every multi-doc bin ≤ ctxLen. BFD waste is bounded (≤ 11/9·OPT +
    * 2/3 bins, Johnson 1973) and in practice far under the sequential
    * next-fit a naive writer does.
    *
    * Scale shape: one hash exchange on the shard key, then per-shard
    * in-memory packing over (id, tokens) pairs only — 16 bytes a doc;
    * size nShards so a shard's ID LIST (not its text) fits an
    * executor. The capacity search is a TreeSet — O(docs · log bins)
    * per shard.
    */
  def packWholeDocs(docs: DataFrame, idCol: String, tokCol: String,
      ctxLen: Int, nShards: Int): DataFrame = {
    require(ctxLen > 0 && nShards > 0, "ctxLen and nShards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("tok"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val ds = it.map(t => (t._2, math.max(t._3, 0L))).toArray
          .sortBy { case (id, tok) => (-tok, id) }
        // open bins ordered by (remaining asc, binId asc): head of the
        // tail-set from `tok` IS the best fit
        val bins = scala.collection.mutable.TreeSet.empty[(Long, Long)]
        var nextBin = 0L
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)](ds.length)
        ds.foreach { case (id, tok) =>
          if (tok >= ctxLen) {
            out += ((shard, nextBin, id, tok))
            nextBin += 1
          } else {
            val fit = bins.rangeFrom((tok, Long.MinValue)).headOption
            fit match {
              case Some(entry @ (rem, bin)) =>
                bins -= entry
                if (rem - tok > 0) bins += ((rem - tok, bin))
                out += ((shard, bin, id, tok))
              case None =>
                val bin = nextBin
                nextBin += 1
                if (ctxLen - tok > 0) bins += ((ctxLen - tok, bin))
                out += ((shard, bin, id, tok))
            }
          }
        }
        out.iterator
      }
      .toDF("shard", "bin_id", "id", "n_tokens")
  }

  /** Sliding-window document chunking: split each document into
    * overlapping token-window chunks of at most `maxTokens`
    * whitespace tokens, consecutive chunks sharing `overlap` tokens —
    * the long-document splitting step of pretraining / retrieval
    * prep (each chunk stays under a context limit without losing the
    * text that straddles a boundary). Returns
    * (doc_id, chunk_idx, n_tokens, chunk_text); chunk i covers token
    * positions [i·stride + 1, i·stride + maxTokens] with
    * stride = maxTokens − overlap.
    *
    * Scale shape: a single narrow scan — chunk boundaries are pure
    * per-row array arithmetic (sequence + slice) with one explode, no
    * shuffle, no window. Output size is input tokens × (1 +
    * overlap/stride) — the only amplification is the chosen overlap.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got maxTokens=$maxTokens overlap=$overlap")
    val stride = maxTokens - overlap
    docs.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("w"))
      .filter(size(col("w")) > 0)
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("n_chunks", (ceil(
        greatest(col("n") - maxTokens, lit(0L)) / lit(stride.toDouble))
        .cast("long") + 1L))
      .select(col("doc_id"), col("n"), explode(expr(
        s"""transform(sequence(0L, n_chunks - 1),
           |  i -> struct(i AS chunk_idx,
           |    array_join(slice(w, int(i * $stride + 1), $maxTokens), ' ')
           |      AS chunk_text))""".stripMargin)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        least(col("n") - col("c.chunk_idx") * stride.toLong,
          lit(maxTokens.toLong)).as("n_tokens"),
        col("c.chunk_text").as("chunk_text"))
  }

  /** Trainer-ready sequence manifest: one row per (shard, seq_id)
    * listing the documents that START in that sequence in stream
    * order — the writer-side view of [[packSequences]] a downstream
    * job joins with the text to emit fixed-length training rows.
    * Groups are bounded by ctxLen (a sequence can start at most
    * ~ctxLen docs plus one), so the collect is safe at any scale.
    */
  def sequenceManifest(docs: DataFrame, idCol: String, tokCol: String,
      ctxLen: Int, nShards: Int): DataFrame =
    packSequences(docs, idCol, tokCol, ctxLen, nShards)
      .groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("seq_offset"), col(idCol)))),
            p => p.getField(idCol).cast("string"))).as("doc_ids"))

  /** Trainer manifest for the NO-SPLIT regime: one row per
    * (shard, seq_id) bin of [[packWholeDocs]], same schema as
    * [[sequenceManifest]] (`n_docs`, comma-joined `doc_ids` in id
    * order) so a writer consumes either packing mode unchanged. Also
    * carries `fill` (bin token total) — the no-split regime pads the
    * remainder, and the padding fraction is the first thing an SFT
    * run audits.
    */
  def binManifest(docs: DataFrame, idCol: String, tokCol: String,
      ctxLen: Int, nShards: Int): DataFrame =
    packWholeDocs(docs, idCol, tokCol, ctxLen, nShards)
      .groupBy(col("shard"), col("bin_id").as("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("fill"),
        concat_ws(",",
          transform(array_sort(collect_list(col("id"))),
            i => i.cast("string"))).as("doc_ids"))

  /** Deterministic global training order: assigns every row a dense
    * 0-based `global_pos` equal to its rank under the md5 permutation
    * (ORDER BY md5(id), id) — the reproducible corpus-wide shuffle a
    * trainer consumes so that data order is an artifact of the
    * dataset, not of the engine run. Any engine replays it.
    *
    * Scale shape: NO global range sort. Rows are sharded by the first
    * `prefixLen` hex chars of their own sort key, so lexicographic
    * shard order + within-shard (md5, id) order IS the global order;
    * the global rank is the within-shard `row_number` plus the
    * cumulative size of lexicographically-smaller shards — a
    * 16^prefixLen-row aggregate, window-summed in one tiny partition
    * and broadcast back. One hash exchange + per-shard sort total.
    * prefixLen=2 → 256-way parallelism; use 3 (4096 shards) on a
    * 1000-executor cluster.
    */
  def orderForTraining(docs: DataFrame, idCol: String,
      prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      "prefixLen must be in [1, 8]")
    val ranked = docs
      .withColumn("__h", placementKey(col(idCol)))
      .withColumn("__shard", substring(col("__h"), 1, prefixLen))
      .withColumn("__pos", row_number().over(
        Window.partitionBy("__shard")
          .orderBy(col("__h"), col(idCol))).cast("long"))
    // shard offsets via a triangle self-join over the ≤16^prefixLen-row
    // size table (NOT an unpartitioned window — this repo keeps the
    // global-window occurrence count at zero so the lint stays sharp)
    val sizes = ranked.groupBy("__shard").agg(count(lit(1)).as("__n"))
    val offsets = sizes.alias("a")
      .join(sizes.alias("b"), col("b.__shard") < col("a.__shard"),
        "left_outer")
      .groupBy(col("a.__shard").as("__shard"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
    ranked.join(broadcast(offsets), "__shard")
      .withColumn("global_pos", col("__off") + col("__pos") - 1L)
      .drop("__h", "__shard", "__pos", "__off")
  }

  /** Exact-count stratified sampling: exactly `min(n, |stratum|)`
    * pseudo-random docs per stratum — balanced eval/calibration sets
    * where "10k docs per language" is the spec, vs [[mixByBudget]]'s
    * token-capped selection. Deterministic (md5 permutation) and one
    * hashpartitioning(stratum) exchange; `sample_rank` (1-based) is
    * the stable within-stratum order, so `n` can shrink downstream
    * without resampling.
    */
  def stratifiedTake(docs: DataFrame, idCol: String, strataCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(col("__h"), col(idCol))
    docs
      .withColumn("__h", placementKey(col(idCol)))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
      .drop("__h")
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis 2006): each row draws the pseudo-uniform
    * u(id) = (fibScramble(id)+1) / 2^31 ∈ (0,1] and is ranked by
    * ln(u)/w — the max-n rows under that key are exactly a weighted
    * sample without replacement with inclusion odds ∝ `weightCol`.
    * Replayable by any engine (the uniform is integer arithmetic, not
    * an RNG); rows with non-positive weight are excluded. Returns the
    * selected rows + `sample_key`.
    *
    * Scale shape: a codegen'd key column + `orderBy(...).limit(n)`,
    * which Spark plans as TakeOrderedAndProject — per-partition
    * bounded top-n, merge of n-row heaps, never a global sort. n is
    * driver-bounded by contract (it is a sample size).
    */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (Profile.fibScramble(col(idCol)) + 1L).cast("double") /
      2147483648.0
    docs.filter(col(weightCol) > 0)
      .withColumn("sample_key", log(u) / col(weightCol))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(n)
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * each (anchor, positive) row gains `nNeg` pseudo-random negatives
    * drawn from the whole corpus by integer-arithmetic hashing —
    * draw j lands on the document at md5-permutation position
    * (fibScramble(anchor) + (j+1)·104729) mod N. Accidental hits on
    * the anchor or its positive are dropped (not redrawn), so a row
    * can carry fewer than `nNeg` negatives with probability ~nNeg/N —
    * the standard in-corpus uniform-negative regime, replayable by
    * any engine.
    *
    * Returns (anchor, positive, neg_rank, negative). Scale shape:
    * the corpus is ranked once by [[orderForTraining]]'s sort-free
    * construction, draws are a narrow `explode(sequence)`, and the
    * only data-sized exchange is the position join. The corpus count
    * N is read at the submitter (one scalar aggregate — the
    * `readAtSubmitter` idiom; the count is part of the drawing
    * formula, there is nothing distributed to keep).
    */
  def contrastiveTriplets(pairs: DataFrame, corpus: DataFrame,
      idCol: String, nNeg: Int, prefixLen: Int = 2): DataFrame = {
    require(nNeg > 0, "nNeg must be positive")
    val indexed = orderForTraining(corpus.select(col(idCol)), idCol)
      .select(col(idCol).as("negative"), col("global_pos").as("__pos"))
    val n = corpus.select(col(idCol)).count()
    require(n > 0, "corpus must be non-empty")
    pairs
      .select(col("anchor").cast("long").as("anchor"),
        col("positive").cast("long").as("positive"))
      .withColumn("neg_rank",
        explode(sequence(lit(0L), lit(nNeg - 1L))))
      .withColumn("__pos",
        pmod(Profile.fibScramble(col("anchor")) +
          (col("neg_rank") + 1L) * 104729L, lit(2147483647L)) % n)
      .join(indexed, "__pos")
      .filter(col("negative") =!= col("anchor") &&
        col("negative") =!= col("positive"))
      .select("anchor", "positive", "neg_rank", "negative")
  }

  /** Per-stratum weighted sampling without replacement: the
    * [[weightedSample]] rule applied independently inside each
    * stratum — top-`n` rows per stratum under the Efraimidis–Spirakis
    * key ln(u)/w. One hashpartitioning(stratum) exchange with a
    * bounded per-stratum rank (the stratifiedTake shape, weighted);
    * returns the selected rows + `sample_key` + `sample_rank`.
    */
  def weightedSamplePerStratum(docs: DataFrame, idCol: String,
      strataCol: String, weightCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (Profile.fibScramble(col(idCol)) + 1L).cast("double") /
      2147483648.0
    val w = Window.partitionBy(strataCol)
      .orderBy(col("sample_key").desc, col(idCol))
    docs.filter(col(weightCol) > 0)
      .withColumn("sample_key", log(u) / col(weightCol))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  /** Snapshot diff between two corpus versions: every id classified
    * as `added` (new only), `removed` (old only), `changed` (both,
    * content hash differs) or `unchanged`. The audit step of an
    * incremental pipeline — what actually moved between yesterday's
    * corpus and today's, without trusting upstream change logs.
    *
    * Scale shape: both sides project to (id, md5) BEFORE the join, so
    * the one id-keyed shuffle carries 40-byte rows regardless of
    * document size; the text columns never move.
    */
  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__id"), md5(col(textCol)).as("__oh"))
    val n = newDf.select(col(idCol).as("__id"), md5(col(textCol)).as("__nh"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") === col("__nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Deterministic k-fold assignment for cross-validation: adds a
    * `fold` column in [0, k) from the Fibonacci scramble of the id
    * ([[Profile.fibScramble]] — pure integer arithmetic any engine
    * replays), so folds are stable across runs, engines, and appends.
    * Pure projection: no shuffle, no RNG state.
    */
  def kFold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 1, s"need at least 2 folds, got $k")
    df.withColumn("fold",
      pmod(Profile.fibScramble(col(idCol)), lit(k)).cast("int"))
  }

  /** Per-domain cap keeping the BEST k documents by score (the
    * RefinedWeb/C4-style "at most k pages per registered domain" rule,
    * but quality-ranked rather than arbitrary): every domain
    * contributes its top-k by (`scoreCol` desc, `idCol` asc — the
    * deterministic tie-break), annotated with `domain_rank` (1-based).
    *
    * Scale shape — deliberately NOT a window `row_number() <= k`: that
    * form shuffles and sorts EVERY row. Here a bounded-PQ aggregation
    * ([[graft.agg.Aggregators.sortedTake]]) reduces map-side first, so
    * the exchange carries at most k (score, id) pairs per domain per
    * task; the ≤ k·|domains| winner set then broadcast-joins back
    * against the unshuffled input to recover full rows. At 100 TB the
    * fact table never moves — only winner ids do. Caller contract:
    * k·|domains| fits the broadcast threshold (the hint degrades to a
    * shuffled semi-equi-join, still k-bounded, if Spark overrides it).
    *
    * `idCol` must be numeric (cast to long); `scoreCol` numeric.
    */
  def capPerDomain(docs: DataFrame, idCol: String, domainCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    val s = docs.sparkSession
    import s.implicits._
    implicit val bestFirst: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
    val triples = docs.select(
        col(domainCol).cast("string").as("_d"),
        col(scoreCol).cast("double").as("_s"),
        col(idCol).cast("long").as("_i"))
      .as[(String, Double, Long)]
    val winners = triples
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.agg.Aggregators.sortedTake[(Double, Long)](k).toColumn)
      .flatMap { case (_, best) =>
        best.iterator.zipWithIndex.map { case ((_, id), r) => (id, r + 1L) }
      }
      .toDF("__cap_id", "domain_rank")
    docs.join(broadcast(winners),
        col(idCol).cast("long") === col("__cap_id"))
      .drop("__cap_id")
  }

  /** Domain-quota corpus mixing: keep, per domain, a pseudo-random
    * subset whose token total stays within `tokenBudget`. The
    * selection is a running sum over the md5-ordered permutation —
    * the distributed form of "shuffle the domain, take docs until the
    * budget is hit", and deterministic across engines/runs (critical
    * for reproducible training mixes).
    *
    * Greedy prefix semantics: a doc is kept iff the running total
    * INCLUDING it is ≤ budget, so one oversized doc early in the
    * permutation blocks later ones in the same domain — this is the
    * exact prefix rule (simple + replayable), not best-fit knapsack.
    *
    * One hashpartitioning(domain) exchange; domains are the window
    * partitions, so skewed domains stream through a running sum
    * rather than materializing.
    */
  def mixByBudget(docs: DataFrame, idCol: String, domainCol: String,
      tokCol: String, tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(domainCol).orderBy(col("__h"), col(idCol))
    docs
      .withColumn("__h", placementKey(col(idCol)))
      .withColumn("cum_tokens", sum(col(tokCol)).over(w))
      .filter(col("cum_tokens") <= tokenBudget)
      .drop("__h")
  }

  /** Quality-ordered token-budget selection: [[mixByBudget]]'s
    * per-domain running cut, but greedy BEST-FIRST — documents enter
    * in (score desc, id) order until the domain's token budget fills,
    * so the budget buys the best material rather than a random
    * sample ("take the highest-quality N tokens per source", the
    * selection rule quality-scored pipelines actually run). Same one
    * hashpartitioning(domain) window; emits `cum_tokens` for audit.
    */
  def mixByBudgetOrdered(docs: DataFrame, idCol: String,
      domainCol: String, tokCol: String, scoreCol: String,
      tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(domainCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    docs
      .withColumn("cum_tokens", sum(col(tokCol)).over(w))
      .filter(col("cum_tokens") <= tokenBudget)
  }

  /** Per-stratum quantile gate: drop the lowest `fraction` of each
    * stratum by score (e.g. "drop the shortest 20% per language", or
    * the bottom decile by quality score). Exact rank-based semantics —
    * `percent_rank() >= fraction` over (score, id) — so the cut is
    * deterministic under ties and identical across engines (rank
    * arithmetic, not an approximate quantile sketch). One
    * hashpartitioning(stratum) window; skewed strata stream through
    * the rank pass rather than materializing.
    */
  def dropBottomByScore(docs: DataFrame, strataCol: String,
      scoreCol: String, idCol: String, fraction: Double): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(col(scoreCol), col(idCol))
    docs.withColumn("__pr", percent_rank().over(w))
      .filter(col("__pr") >= fraction)
      .drop("__pr")
  }

  /** Temperature-based domain mixing (the multilingual-sampling rule
    * of mBERT/XLM-R, and the domain-weight shape of The Pile): domain
    * d with token mass W_d is sampled toward target share
    * `p_d ∝ W_d^alpha` of `tokenBudget` total tokens. `alpha = 1`
    * keeps natural proportions; `alpha → 0` flattens toward uniform,
    * up-sampling small domains. Each domain gets an independent
    * Bernoulli keep-rate `r_d = min(1, budget·p_d / W_d)` (rates are
    * NOT re-normalized when one clamps at 1 — the usual single-pass
    * convention; run again with a higher budget if exact totals
    * matter).
    *
    * Membership is the deterministic md5-prefix rule of
    * [[graft.ml.Profile.hashSampleStrong]], so the mix is reproducible
    * across engines and appends: a doc's fate depends only on its id
    * and its domain's rate. Rates are rounded to 6 decimals before
    * thresholding to keep the float math engine-portable.
    *
    * Plan shape at scale: one partial/final aggregation over domains
    * (a tiny table), a window total over that table (not the corpus),
    * and a broadcast join of the rates back onto the corpus — the
    * 100 TB scan is a single pass with no corpus-wide shuffle.
    */
  def mixByTemperature(docs: DataFrame, idCol: String, domainCol: String,
      tokCol: String, alpha: Double, tokenBudget: Long): DataFrame = {
    // Normalize the per-domain masses with a broadcast of the 1-row
    // total (same idiom as FieldsApi.normalize) rather than a global
    // window — the per-domain table is tiny either way, but the
    // cross-join keeps every plan window hash-partitioned, which the
    // PlanLint global-window rule can then enforce across all gates.
    val byDomain = docs.groupBy(domainCol)
      .agg(sum(col(tokCol)).cast("double").as("__w"))
      .withColumn("__mass", pow(col("__w"), lit(alpha)))
    val totalMass = byDomain.agg(sum(col("__mass")).as("__total"))
    val rates = byDomain.crossJoin(broadcast(totalMass))
      .withColumn("rate",
        when(col("__w") > 0,
          round(least(lit(1.0),
            lit(tokenBudget.toDouble) * col("__mass")
              / col("__total") / col("__w")), 6))
        .otherwise(lit(0.0)))
      .select(col(domainCol), col("rate"))
    val threshold = format_string("%08x",
      least(round(col("rate") * 4294967296.0), lit(4294967295L)).cast("long"))
    docs.join(broadcast(rates), domainCol)
      .filter(Profile.strongBucket(col(idCol)) < threshold)
  }

  /** Epoch-cap upsampling mix (the LLaMA-recipe shape: high-value
    * domains repeat for several epochs, capped; the bulk domain runs
    * under one epoch): domain d with token mass T_d and target weight
    * w_d gets budget B_d = ⌊budget · w_d⌋ tokens, realized as
    * ⌊B_d / T_d⌋ FULL epochs (capped at `maxEpochs` — the
    * don't-overfit-the-small-source guard) plus one partial epoch
    * filled by the deterministic md5-permutation prefix rule of
    * [[mixByBudget]]. Emits one row per (document, epoch). Domains
    * absent from `weights` are excluded.
    *
    * Scale shape: the per-domain plan (mass, budget, epochs,
    * remainder) is a tiny broadcast; the corpus side is one
    * hashpartitioning(domain) running-sum window plus a row-generating
    * explode — output rows = upsampled corpus size, nothing else
    * materializes. Integer arithmetic end-to-end after the one ⌊B·w⌋.
    */
  def mixByEpochs(docs: DataFrame, idCol: String, domainCol: String,
      tokCol: String, weights: Map[String, Double], tokenBudget: Long,
      maxEpochs: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(domainCol, "__wt")
    val plan = docs.groupBy(domainCol)
      .agg(sum(col(tokCol)).cast("long").as("__T"))
      .join(wdf, domainCol)
      .withColumn("__B", floor(lit(tokenBudget.toDouble) * col("__wt")).cast("long"))
      .withColumn("__full",
        least(expr("__B div __T"), lit(maxEpochs.toLong)))
      .withColumn("__rem",
        when(col("__full") < maxEpochs, col("__B") - col("__full") * col("__T"))
          .otherwise(lit(0L)))
      .select(col(domainCol), col("__full"), col("__rem"))
    val w = Window.partitionBy(domainCol).orderBy(col("__h"), col(idCol))
    docs
      .join(broadcast(plan), domainCol)
      .withColumn("__h", placementKey(col(idCol)))
      .withColumn("__cum", sum(col(tokCol)).over(w))
      .withColumn("n_epochs",
        col("__full") + when(col("__cum") <= col("__rem"), 1L).otherwise(0L))
      .filter(col("n_epochs") >= 1L)
      .withColumn("epoch", explode(sequence(lit(1L), col("n_epochs"))))
      .select(col(idCol), col(domainCol), col(tokCol).as("tok"),
        col("epoch"), col("n_epochs"))
  }

  /** Leakage-free train/val/test split: the split is a deterministic
    * function of the GROUP (e.g. source domain / URL host / dedup
    * cluster), never of the document, so near-duplicates sharing a
    * group can never straddle splits — the standard defense against
    * test-set contamination when documents within a site are
    * correlated.
    *
    * `fractions` are (name, weight) in order; weights need not sum to
    * 1 (they are normalized). Assignment hashes the group with md5
    * and cuts the 16^8 prefix space at the cumulative fractions —
    * engine-independent (any SQL engine replays it) and stable under
    * corpus growth: adding documents never moves an existing group.
    *
    * Pure per-row Column arithmetic: no shuffle, no state. The split
    * fractions are exact only in expectation over groups (a group is
    * atomic by design).
    */
  def splitByGroup(docs: DataFrame, groupCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    val total = fractions.map(_._2).sum
    val cum = fractions.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val h = substring(md5(col(groupCol).cast("string")), 1, 8)
    val assigned = fractions.init.zip(cum.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), c), rest) =>
      when(h < lit(Profile.strongThreshold(c)), lit(name)).otherwise(rest)
    }
    docs.withColumn("split", assigned)
  }

  /** Temporal train/test split with an embargo gap (the time-series /
    * financial-CV purging rule, López de Prado 2018): rows with
    * `secCol` < cutoff − embargo are `train`, rows ≥ cutoff are
    * `test`, and rows inside the embargo window [cutoff − embargo,
    * cutoff) are DROPPED — they are close enough to the boundary that
    * label/feature windows straddling it leak test information into
    * training. Pure Column program (one filter + one conditional), no
    * shuffle; the boundary predicate pushes to the scan on a
    * time-partitioned source.
    */
  def timeSplit(df: DataFrame, secCol: String, cutoffSec: Long,
      embargoSec: Long = 0L): DataFrame = {
    require(embargoSec >= 0L, "embargo must be non-negative")
    df.filter(col(secCol) < cutoffSec - embargoSec ||
        col(secCol) >= cutoffSec)
      .withColumn("split",
        when(col(secCol) >= cutoffSec, lit("test")).otherwise(lit("train")))
  }

  /** Deterministic span corruption for denoising-objective prep
    * (T5/UL2-style): whitespace tokens are grouped into contiguous
    * blocks of `spanLen`; block b of document d is masked iff the
    * md5 prefix of "d:b" falls inside `rate` of the prefix space
    * (the same engine-replayable hash-threshold rule as
    * [[splitByGroup]] / hash sampling), and each masked block
    * collapses to ONE `sentinel` token. Returns (doc_id, n_tokens,
    * n_masked, masked_text); surviving tokens are rejoined with
    * single spaces (the op tokenizes, so original whitespace runs are
    * not preserved). Mask decisions depend only on (doc id, block
    * index, rate), so any engine — and tomorrow's rerun — reproduces
    * the identical corruption.
    *
    * Scale shape: a pure per-row Column program (split + one
    * transform/aggregate over the block sequence) — no shuffle, no
    * state, no UDF; the whole op is one codegen'd scan at any corpus
    * size.
    */
  /** Deterministic word-dropout augmentation: each token position
    * drops independently with probability `rate`, decided by the
    * md5 of (doc id, position) — the same engine-replayable coin as
    * [[maskSpans]], so augmented copies are reproducible artifacts
    * of the dataset rather than of a run. Emits (id, n_tokens,
    * n_dropped, aug_text). Pure per-row Column program: one
    * codegen'd scan, no shuffle, no UDF.
    */
  def dropWords(docs: DataFrame, idCol: String, textCol: String,
      rate: Double, salt: String = "wd"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    require(!salt.contains("'"), "salt must not contain quotes")
    val thr = Profile.strongThreshold(rate)
    val dropped = (i: String) =>
      s"substring(md5(concat('$salt:', cast(__id as string), ':', " +
        s"cast($i as string))), 1, 8) < '$thr'"
    docs
      .withColumn("__id", col(idCol))
      .withColumn("__w",
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+")))
      .withColumn("__keep", expr(
        s"""filter(__w, (w, i) -> NOT ${dropped("i")})"""))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        (size(col("__w")) - size(col("__keep"))).cast("long")
          .as("n_dropped"),
        array_join(col("__keep"), " ").as("aug_text"))
  }

  /** Deterministic adjacent-swap augmentation: each even token
    * boundary 2b/2b+1 swaps with probability `rate`, decided by
    * md5(doc id, block) — light word-order noise with the same
    * replayable-coin contract as [[dropWords]]. Emits (id, n_tokens,
    * n_swapped, aug_text); a trailing odd token never moves.
    */
  def swapAdjacentWords(docs: DataFrame, idCol: String, textCol: String,
      rate: Double, salt: String = "sw"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    require(!salt.contains("'"), "salt must not contain quotes")
    val thr = Profile.strongThreshold(rate)
    val swapped = (b: String) =>
      s"substring(md5(concat('$salt:', cast(__id as string), ':', " +
        s"cast($b as string))), 1, 8) < '$thr'"
    docs
      .withColumn("__id", col(idCol))
      .withColumn("__w",
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+")))
      .withColumn("__n", size(col("__w")).cast("long"))
      .withColumn("__blocks", expr(
        "if (__n < 2, array(), sequence(0L, __n div 2 - 1))"))
      .withColumn("aug_text", expr(
        s"""array_join(concat(flatten(transform(__blocks, b ->
           |  if (${swapped("b")},
           |      array(element_at(__w, cast(b * 2 + 2 as int)),
           |            element_at(__w, cast(b * 2 + 1 as int))),
           |      array(element_at(__w, cast(b * 2 + 1 as int)),
           |            element_at(__w, cast(b * 2 + 2 as int)))))),
           |  if (__n % 2 = 1, slice(__w, cast(__n as int), 1),
           |      array())), ' ')""".stripMargin))
      .withColumn("n_swapped", expr(
        s"aggregate(__blocks, 0L, (acc, b) -> acc + if (${swapped("b")}, 1L, 0L))"))
      .select(col(idCol), col("__n").as("n_tokens"), col("n_swapped"),
        col("aug_text"))
  }

  def maskSpans(docs: DataFrame, idCol: String, textCol: String,
      rate: Double, spanLen: Int = 3, sentinel: String = "<X>"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    require(spanLen > 0, s"spanLen must be positive, got $spanLen")
    require(!sentinel.contains("'"), "sentinel must not contain quotes")
    val thr = Profile.strongThreshold(rate)
    val masked = (b: String) =>
      s"substring(md5(concat(cast(__id as string), ':', cast($b as string))), 1, 8) < '$thr'"
    docs
      .withColumn("__id", col(idCol))
      .withColumn("__w",
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+")))
      .withColumn("__n", size(col("__w")).cast("long"))
      .withColumn("__blocks", expr(
        s"if (__n = 0, array(), sequence(0L, (__n - 1) div $spanLen))"))
      .withColumn("masked_text", expr(
        s"""array_join(flatten(transform(__blocks, b ->
           |  if (${masked("b")},
           |      array('$sentinel'),
           |      slice(__w, cast(b * $spanLen + 1 as int), $spanLen)))), ' ')""".stripMargin))
      .withColumn("n_masked", expr(
        s"""aggregate(__blocks, 0L, (acc, b) ->
           |  acc + if (${masked("b")},
           |            least(cast($spanLen as bigint), __n - b * $spanLen), 0L))""".stripMargin))
      .select(col(idCol), col("__n").as("n_tokens"), col("n_masked"),
        col("masked_text"))
  }

  /** Fill-in-the-middle transform (PSM format, the infilling
    * augmentation behind FIM-trained code/text models): two seeded
    * cut points split the token array into prefix/middle/suffix and
    * the document is re-emitted as
    * `<PRE> prefix <SUF> suffix <MID> middle` so the model learns to
    * generate the middle given both sides. Cut points are
    * deterministic per (seed, id) — a small md5-digit polynomial mod
    * (n+1) that any md5-capable engine replays exactly (no float
    * parsing of hashes). Returns (id, n_tokens, cut1, cut2,
    * fim_text).
    *
    * Scale shape: pure per-row Column program — one narrow map, no
    * shuffle, codegen'd end to end.
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      seed: String = "fim", pre: String = "<PRE>", mid: String = "<MID>",
      suf: String = "<SUF>"): DataFrame = {
    require(Seq(pre, mid, suf).forall(!_.contains("'")),
      "sentinels must not contain quotes")
    def cutAt(off: Int, h: Column, n: Column): Column =
      (ascii(substring(h, off, 1)) * 251 +
        ascii(substring(h, off + 1, 1)) * 31 +
        ascii(substring(h, off + 2, 1))).cast("long") % (n + 1)
    val joined = docs
      .withColumn("__w",
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col(textCol)), "\\s+")))
      .withColumn("__n", size(col("__w")).cast("long"))
      .withColumn("__h",
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .withColumn("__u1", cutAt(1, col("__h"), col("__n")))
      .withColumn("__u2", cutAt(4, col("__h"), col("__n")))
      .withColumn("cut1", least(col("__u1"), col("__u2")))
      .withColumn("cut2", greatest(col("__u1"), col("__u2")))
    joined.select(col(idCol), col("__n").as("n_tokens"),
      col("cut1"), col("cut2"),
      array_join(flatten(array(
        array(lit(pre)),
        slice(col("__w"), lit(1), col("cut1").cast("int")),
        array(lit(suf)),
        slice(col("__w"), (col("cut2") + 1).cast("int"),
          (col("__n") - col("cut2")).cast("int")),
        array(lit(mid)),
        slice(col("__w"), (col("cut1") + 1).cast("int"),
          (col("cut2") - col("cut1")).cast("int")))), " ").as("fim_text"))
  }
}
