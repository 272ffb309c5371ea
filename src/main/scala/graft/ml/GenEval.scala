package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Generation-evaluation metrics — BLEU, ROUGE, and rank agreement
  * over (candidate, reference) text pairs: the standard scorers for
  * model-output evaluation sets, distillation filtering, and
  * reference-based data cleaning. All token work runs on the
  * normalized tokenization ([[TextAnalysis.normalize]]) so every
  * engine scores identically.
  *
  * Scale shapes: BLEU/ROUGE-N are n-gram count aggregates (explode →
  * hash-count → per-pair clip join → corpus sum) — never quadratic;
  * ROUGE-L runs the O(len·len) LCS per PAIR inside a narrow
  * mapPartitions kernel with an explicit token cap (the per-pair DP
  * is the contract, like every bounded-kernel here); Kendall runs
  * per GROUP over collected score pairs (bounded-group contract —
  * judge-agreement groups are panel-sized, not corpus-sized).
  */
object GenEval {

  private def toks(c: Column): Column =
    filter(split(TextAnalysis.normalize(c), " "), t => length(t) > 0)

  /** Corpus BLEU (Papineni et al. 2002): modified n-gram precisions
    * p_1..p_maxN with corpus-level clipping, geometric mean, brevity
    * penalty from corpus lengths. Returns ONE row:
    * (bleu, p1..p{maxN}, bp, cand_tokens, ref_tokens). Zero corpus
    * precision at any order makes bleu 0 (no smoothing at corpus
    * level — the standard definition).
    *
    * Shape: one explode per order n → (pair, gram) counts → clip join
    * (cand counts ⋈ ref counts per pair+gram) → one global aggregate
    * per order. Everything is hash aggregation on (id, gram) keys.
    */
  def bleu(df: DataFrame, idCol: String, candCol: String, refCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8)
    val spark = df.sparkSession
    val base = graft.core.PipelineCaches.persistTracked(
      df.select(col(idCol).as("id"), toks(col(candCol)).as("ct"),
        toks(col(refCol)).as("rt")))

    def grams(tc: Column, n: Int): Column =
      when(size(tc) >= n,
        transform(sequence(lit(0), size(tc) - n),
          i => concat_ws(" ", slice(tc, i + 1, lit(n)))))
        .otherwise(array())

    // per order: Σ_pairs Σ_grams min(candCount, refCount)  /  Σ cand grams
    val perOrder = (1 to maxN).map { n =>
      val cc = base.select(col("id"), explode(grams(col("ct"), n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("cc"))
      val rc = base.select(col("id"), explode(grams(col("rt"), n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("rc"))
      cc.join(rc, Seq("id", "g"), "left")
        .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("num"),
          sum(col("cc")).as("den"))
        .select(lit(n).as("n"), coalesce(col("num"), lit(0L)).as("num"),
          coalesce(col("den"), lit(0L)).as("den"))
    }.reduce(_ unionAll _)

    val lens = base.agg(sum(size(col("ct"))).as("clen"),
      sum(size(col("rt"))).as("rlen"))

    val wide = perOrder
      .groupBy()
      .pivot("n", (1 to maxN).map(n => n: Any))
      .agg(first(when(col("den") > 0,
        col("num").cast("double") / col("den")).otherwise(lit(0.0))))
      .toDF((1 to maxN).map(n => s"p$n"): _*)

    val logSum = (1 to maxN).map(n =>
      when(col(s"p$n") > 0, log(col(s"p$n"))).otherwise(lit(Double.NaN)))
      .reduce(_ + _)
    val bp = when(col("clen") >= col("rlen"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("rlen").cast("double") / col("clen")))
    wide.crossJoin(broadcast(lens))
      .select(
        (coalesce(when(!isnan(logSum), exp(logSum / maxN)), lit(0.0)) * bp)
          .as("bleu") +:
          (1 to maxN).map(n => col(s"p$n")) :+
          bp.as("bp") :+ col("clen").as("cand_tokens") :+
          col("rlen").as("ref_tokens"): _*)
  }

  /** ROUGE-N per pair: clipped n-gram overlap as recall (the ROUGE
    * orientation), precision, and F1. Returns
    * (id, overlap, cand_ngrams, ref_ngrams, precision, recall, f1);
    * pairs where the reference has no n-grams are dropped (metric
    * undefined). Same hash-count shape as [[bleu]].
    */
  def rougeN(df: DataFrame, idCol: String, candCol: String, refCol: String,
      n: Int = 1): DataFrame = {
    require(n >= 1 && n <= 8)
    val base = df.select(col(idCol).as("id"), toks(col(candCol)).as("ct"),
      toks(col(refCol)).as("rt"))
    def grams(tc: Column): Column =
      when(size(tc) >= n,
        transform(sequence(lit(0), size(tc) - n),
          i => concat_ws(" ", slice(tc, i + 1, lit(n)))))
        .otherwise(array())
    val cc = base.select(col("id"), explode(grams(col("ct"))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("cc"))
    val rc = base.select(col("id"), explode(grams(col("rt"))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("rc"))
    val ov = cc.join(rc, Seq("id", "g"))
      .groupBy("id")
      .agg(sum(least(col("cc"), col("rc"))).as("overlap"))
    val tot = base.select(col("id"),
      greatest(size(col("ct")) - n + 1, lit(0)).cast("long").as("cn"),
      greatest(size(col("rt")) - n + 1, lit(0)).cast("long").as("rn"))
    tot.join(ov, Seq("id"), "left")
      .filter(col("rn") > 0)
      .select(col("id"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        col("cn").as("cand_ngrams"), col("rn").as("ref_ngrams"),
        when(col("cn") > 0, coalesce(col("overlap"), lit(0L)).cast("double") /
          col("cn")).otherwise(lit(0.0)).as("precision"),
        (coalesce(col("overlap"), lit(0L)).cast("double") / col("rn"))
          .as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** ROUGE-L per pair: longest-common-subsequence F-measure over the
    * first `maxTokens` tokens of each side (the explicit bound that
    * keeps the O(c·r) DP a per-row kernel — 400² ints is ~0.6 MB of
    * transient state). Returns (id, lcs, cand_tokens, ref_tokens,
    * precision, recall, f1); reference-empty pairs drop.
    */
  def rougeL(df: DataFrame, idCol: String, candCol: String, refCol: String,
      maxTokens: Int = 400): DataFrame = {
    require(maxTokens >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    graft.core.Parallelism.ensure(
      df.select(col(idCol).cast("long"),
        toks(col(candCol)), toks(col(refCol))))
      .as(Encoders.tuple(Encoders.scalaLong,
        implicitly[org.apache.spark.sql.Encoder[Seq[String]]],
        implicitly[org.apache.spark.sql.Encoder[Seq[String]]]))
      .mapPartitions(_.flatMap { case (id, c0, r0) =>
        val c = c0.take(maxTokens).toArray
        val r = r0.take(maxTokens).toArray
        if (r.isEmpty) None
        else {
          // two-row DP
          var prev = new Array[Int](r.length + 1)
          var cur = new Array[Int](r.length + 1)
          var i = 0
          while (i < c.length) {
            var j = 0
            while (j < r.length) {
              cur(j + 1) =
                if (c(i) == r(j)) prev(j) + 1
                else math.max(prev(j + 1), cur(j))
              j += 1
            }
            val t = prev; prev = cur; cur = t
            java.util.Arrays.fill(cur, 0)
            i += 1
          }
          val lcs = prev(r.length)
          val p = if (c.isEmpty) 0.0 else lcs.toDouble / c.length
          val rec = lcs.toDouble / r.length
          val f = if (p + rec > 0) 2 * p * rec / (p + rec) else 0.0
          Some((id, lcs, c.length, r.length, p, rec, f))
        }
      })
      .toDF(idCol, "lcs", "cand_tokens", "ref_tokens", "precision",
        "recall", "f1")
  }

  /** Kendall's τ-b per group — rank agreement with tie correction:
    * τ_b = (C − D) / √((n0 − n1)(n0 − n2)) with n0 = n(n−1)/2, n1/n2
    * the tie-pair counts of each variable. The judge-vs-judge (or
    * metric-vs-human) agreement statistic that, unlike Spearman,
    * stays interpretable under heavy ties. Groups are collected and
    * scored with the O(n²) pair walk — the BOUNDED-GROUP contract
    * (panels, not corpora); `maxGroup` guards it explicitly.
    * Returns (group, n, concordant, discordant, tau); groups with
    * no comparable pairs (all tied on either side) yield NULL tau.
    */
  def kendallTau(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, maxGroup: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(xCol).cast("double"),
        col(yCol).cast("double"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.scalaDouble,
        Encoders.scalaDouble))
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val xs = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
        it.foreach { case (_, x, y) =>
          xs += ((x, y))
          if (xs.length > maxGroup)
            throw new IllegalArgumentException(
              s"kendallTau group '$g' exceeds maxGroup=$maxGroup " +
                "(the O(n^2) kernel needs bounded groups)")
        }
        val n = xs.length
        var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val dx = java.lang.Double.compare(xs(i)._1, xs(j)._1)
            val dy = java.lang.Double.compare(xs(i)._2, xs(j)._2)
            if (dx == 0 && dy == 0) { tx += 1; ty += 1 }
            else if (dx == 0) tx += 1
            else if (dy == 0) ty += 1
            else if (dx == dy) conc += 1
            else disc += 1
            j += 1
          }
          i += 1
        }
        val n0 = n.toLong * (n - 1) / 2
        val denom = math.sqrt((n0 - tx).toDouble * (n0 - ty))
        val tau = if (denom == 0.0) None
          else Some((conc - disc) / denom)
        (g, n.toLong, conc, disc, tau)
      }
      .toDF(groupCol, "n", "concordant", "discordant", "tau")
      .select(col(groupCol), col("n"), col("concordant"), col("discordant"),
        col("tau").cast("double"))
  }

  /** Word error rate per pair (the ASR / generation-fidelity metric):
    * token-level Levenshtein alignment of candidate vs reference with
    * the standard substitution/insertion/deletion decomposition —
    * WER = (S+D+I) / |ref|, which can exceed 1. Same bounded two-row
    * DP kernel as [[rougeL]] (O(|c|·|r|) per pair, `maxTokens` cap,
    * narrow mapPartitions, nothing shuffles); the S/D/I split comes
    * from the identity S+D = max-cost-path bookkeeping, recovered
    * exactly as S = dist − D − I with D/I from the length imbalance
    * against the matched count. Empty reference rows drop (WER
    * undefined). Returns (id, distance, subs, dels, ins, cand_tokens,
    * ref_tokens, wer).
    */
  def wer(df: DataFrame, idCol: String, candCol: String, refCol: String,
      maxTokens: Int = 400): DataFrame = {
    require(maxTokens >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    graft.core.Parallelism.ensure(
      df.select(col(idCol).cast("long"),
        toks(col(candCol)), toks(col(refCol))))
      .as(Encoders.tuple(Encoders.scalaLong,
        implicitly[org.apache.spark.sql.Encoder[Seq[String]]],
        implicitly[org.apache.spark.sql.Encoder[Seq[String]]]))
      .mapPartitions { part =>
        // per-partition token interner: string equality dominated the
        // DP inner loop (round-7 bench breach), so tokens are hashed
        // to dense Int ids once per pair and the DP compares ints
        val interner = new java.util.HashMap[String, Integer](2048)
        part.flatMap { case (id, c0, r0) =>
        interner.clear()
        def enc(ts: Seq[String]): Array[Int] = {
          val out = new Array[Int](math.min(ts.length, maxTokens))
          var i = 0
          val it = ts.iterator
          while (i < out.length) {
            val t = it.next()
            var v = interner.get(t)
            if (v == null) {
              v = Integer.valueOf(interner.size); interner.put(t, v)
            }
            out(i) = v.intValue; i += 1
          }
          out
        }
        val cFull = enc(c0)
        val rFull = enc(r0)
        if (rFull.isEmpty) None
        else {
          // strip the common prefix/suffix before the O(|c|·|r|) DP:
          // those cells are forced matches — distance is unchanged
          // and the optimal-path match count grows by exactly the
          // stripped length, so the S/D/I decomposition is preserved
          val maxStrip = math.min(cFull.length, rFull.length)
          var pre = 0
          while (pre < maxStrip && cFull(pre) == rFull(pre)) pre += 1
          var suf = 0
          while (suf < maxStrip - pre &&
            cFull(cFull.length - 1 - suf) == rFull(rFull.length - 1 - suf))
            suf += 1
          val c = java.util.Arrays.copyOfRange(cFull, pre, cFull.length - suf)
          val r = java.util.Arrays.copyOfRange(rFull, pre, rFull.length - suf)
          // two-row Levenshtein over (ref rows r, cand cols c),
          // tracking the matched-pair count M of the optimal path so
          // the S/D/I decomposition is exact:
          //   S = min(|c|,|r|) adjustments... recovered via M:
          //   matches M, subs S = aligned-but-unequal, then
          //   D = |r| - M - S (unaligned ref), I = |c| - M - S.
          var prevD = new Array[Int](c.length + 1)
          var curD = new Array[Int](c.length + 1)
          var prevM = new Array[Int](c.length + 1)
          var curM = new Array[Int](c.length + 1)
          var j = 0
          while (j <= c.length) { prevD(j) = j; j += 1 }
          var i = 0
          while (i < r.length) {
            curD(0) = i + 1; curM(0) = 0
            var k = 0
            while (k < c.length) {
              val eq = r(i) == c(k)
              val diag = prevD(k) + (if (eq) 0 else 1)
              val del = prevD(k + 1) + 1
              val ins = curD(k) + 1
              // prefer the path with more matches on distance ties
              var d = diag
              var m = prevM(k) + (if (eq) 1 else 0)
              if (del < d || (del == d && prevM(k + 1) > m)) {
                d = del; m = prevM(k + 1)
              }
              if (ins < d || (ins == d && curM(k) > m)) {
                d = ins; m = curM(k)
              }
              curD(k + 1) = d; curM(k + 1) = m
              k += 1
            }
            var t = prevD; prevD = curD; curD = t
            t = prevM; prevM = curM; curM = t
            i += 1
          }
          val dist = prevD(c.length)
          val m = prevM(c.length) + pre + suf // stripped cells are matches
          // exact decomposition from (dist, m): an optimal path has
          // A = m + S aligned pairs, D = |r| − A dels, I = |c| − A
          // ins, and dist = S + D + I = |r| + |c| − 2m − S
          //   ⇒ S = |r| + |c| − 2m − dist
          val cn = cFull.length
          val rn = rFull.length
          val subs = rn + cn - 2 * m - dist
          val a = m + subs
          val dels = rn - a
          val insr = cn - a
          Some((id, dist, subs, dels, insr, cn, rn,
            dist.toDouble / rn))
        }
      }}
      .toDF(idCol, "distance", "subs", "dels", "ins", "cand_tokens",
        "ref_tokens", "wer")
  }

  /** chrF (Popović 2015) per pair: character n-gram F-β over orders
    * 1..maxN on whitespace-stripped normalized text. Per order n the
    * clipped match count m_n = Σ_g min(cand_g, ref_g) gives
    * P_n = m_n / |cand grams|, R_n = m_n / |ref grams| (0 when the
    * denominator is 0); chrP/chrR are the plain means over ALL maxN
    * orders (short texts contribute 0 for missing orders) and
    * chrF = (1+β²)·P·R / (β²·P + R) (0 when both are 0). Returns
    * (id, chr_p, chr_r, chrf).
    *
    * Scale shape: a bounded PER-PAIR kernel (the [[rougeL]]/[[wer]]
    * discipline — narrow mapPartitions, one reusable count map, no
    * gram ever shuffled): char grams are ~|text|·maxN per document,
    * an order of magnitude denser than word n-grams, and the first
    * cut of this metric as a BLEU-style explode + (id, n, gram)
    * clip join benched 19.5 s at sf0.1 where this kernel runs ~1 s.
    * P_n accumulates in fixed n = 1..maxN order so the float sum is
    * engine-independent (the oracle folds the same order).
    */
  def chrF(df: DataFrame, idCol: String, candCol: String, refCol: String,
      maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 10)
    val strip = (c: Column) =>
      regexp_replace(TextAnalysis.normalize(c), " ", "")
    val spark = df.sparkSession
    import spark.implicits._
    val b2 = beta * beta
    graft.core.Parallelism.ensure(
      df.select(col(idCol).cast("long"),
        coalesce(strip(col(candCol)), lit("")),
        coalesce(strip(col(refCol)), lit(""))))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Integer](1024)
        it.map { case (id, c, r) =>
          var sumP = 0.0
          var sumR = 0.0
          var n = 1
          while (n <= maxN) {
            counts.clear()
            val tc = math.max(c.length - n + 1, 0)
            var i = 0
            while (i < tc) {
              val g = c.substring(i, i + n)
              val v = counts.get(g)
              counts.put(g, if (v == null) 1 else v + 1)
              i += 1
            }
            val tr = math.max(r.length - n + 1, 0)
            var m = 0
            var j = 0
            while (j < tr) {
              val g = r.substring(j, j + n)
              val v = counts.get(g)
              if (v != null && v > 0) { counts.put(g, v - 1); m += 1 }
              j += 1
            }
            sumP += (if (tc > 0) m.toDouble / tc else 0.0)
            sumR += (if (tr > 0) m.toDouble / tr else 0.0)
            n += 1
          }
          val p = sumP / maxN
          val rr = sumR / maxN
          val f =
            if (p + rr > 0) (1 + b2) * p * rr / (b2 * p + rr) else 0.0
          (id, p, rr, f)
        }
      }
      .toDF(idCol, "chr_p", "chr_r", "chrf")
  }
  /** Distinct-n generation-diversity report per group: the fraction
    * of n-grams (orders 1..`maxN`) that are DISTINCT within the
    * group — the standard mode-collapse alarm for generators (Li et
    * al. 2016): a sampler that repeats itself scores low long before
    * eyeballing catches it. Returns per (group, n):
    * (group, n, total_ngrams, distinct_ngrams, distinct_ratio);
    * groups with no order-n grams emit no row for that order.
    *
    * Scale shape: one token scan per order (explode → (group, gram)
    * hash aggregate); nothing but hash aggregation, no window.
    */
  def distinctN(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8], got $maxN")
    val base = graft.core.PipelineCaches.persistTracked(
      df.select(col(groupCol).as("grp"), toks(col(textCol)).as("ts")))
    def grams(tc: Column, n: Int): Column =
      when(size(tc) >= n,
        transform(sequence(lit(0), size(tc) - n),
          i => concat_ws(" ", slice(tc, i + 1, lit(n)))))
        .otherwise(array())
    (1 to maxN).map { n =>
      base.select(col("grp"), explode(grams(col("ts"), n)).as("g"))
        .groupBy("grp", "g").agg(count(lit(1)).as("c"))
        .groupBy("grp")
        .agg(sum("c").as("total_ngrams"),
          count(lit(1)).as("distinct_ngrams"))
        .select(col("grp").as("group"), lit(n).as("n"),
          col("total_ngrams"), col("distinct_ngrams"),
          (col("distinct_ngrams").cast("double") / col("total_ngrams"))
            .as("distinct_ratio"))
    }.reduce(_ unionAll _)
  }

  /** Self-BLEU over a bounded deterministic sample (Zhu et al. 2018,
    * texygen): each sampled document is sentence-BLEU-scored against
    * the other K−1 as a MULTI-REFERENCE set — high self-BLEU means
    * the generator's outputs all look alike (the complement of
    * [[distinctN]]: diversity of WHOLE texts, not gram vocabulary).
    * Multi-reference clipping (max reference count per gram,
    * excluding the candidate itself) uses the top-2-counts-per-gram
    * trick, so "max over everyone else" never rescans the sample;
    * brevity penalty uses the CLOSEST other length (ties → shorter —
    * the sentence-BLEU convention); no smoothing (a zero precision
    * at any order zeroes that document's score — documented standard
    * form). Returns per sampled doc (id, p1..p{maxN}, bp, self_bleu).
    *
    * Scale shape: BOUNDED-SAMPLE contract like [[graft.ml.Similarity.mmdRbf]]
    * — the deterministic md5 top-`sampleK` sample caps every
    * downstream table (gram tables K·len, the length grid K²); the
    * corpus is touched once for the sample sort.
    */
  def selfBleu(df: DataFrame, idCol: String, textCol: String,
      sampleK: Int = 200, maxN: Int = 4): DataFrame = {
    require(sampleK >= 2, s"sampleK must be >= 2, got $sampleK")
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8], got $maxN")
    import org.apache.spark.sql.expressions.Window
    val base = graft.core.PipelineCaches.persistTracked(
      df.select(col(idCol).cast("long").as("id"),
          toks(col(textCol)).as("ts"))
        .orderBy(md5(concat(lit("selfbleu:"), col("id"))), col("id"))
        .limit(sampleK)
        .select(col("id"), col("ts"), size(col("ts")).as("len")))
    val lens = base.select(col("id"), col("len"))
    // closest OTHER length per candidate (ties -> shorter reference)
    val wClosest = Window.partitionBy("id")
      .orderBy(abs(col("rlen") - col("len")), col("rlen"))
    val refLen = lens.alias("a")
      .join(lens.select(col("id").as("rid"), col("len").as("rlen")),
        col("id") =!= col("rid"))
      .withColumn("rk", row_number().over(wClosest))
      .filter(col("rk") === 1)
      .select(col("id"), col("rlen"))
    def grams(tc: Column, n: Int): Column =
      when(size(tc) >= n,
        transform(sequence(lit(0), size(tc) - n),
          i => concat_ws(" ", slice(tc, i + 1, lit(n)))))
        .otherwise(array())
    val perOrder = (1 to maxN).map { n =>
      val gc = base
        .select(col("id"), explode(grams(col("ts"), n)).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("c"))
      // top-2 counts per gram across the sample (ties -> lower id),
      // so max over "everyone but me" is a constant-time lookup
      val wTop = Window.partitionBy("g")
        .orderBy(col("c").desc, col("id"))
      val top2 = gc.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 2)
        .groupBy("g")
        .agg(max(when(col("rk") === 1, col("c"))).as("c1"),
          max(when(col("rk") === 1, col("id"))).as("id1"),
          coalesce(max(when(col("rk") === 2, col("c"))), lit(0L))
            .as("c2"))
      gc.join(top2, "g")
        .select(col("id"),
          least(col("c"), when(col("id1") === col("id"), col("c2"))
            .otherwise(col("c1"))).as("m"), col("c"))
        .groupBy("id")
        .agg(sum("m").as("num"), sum("c").as("den"))
        .select(col("id"), lit(n).as("n"),
          (col("num").cast("double") / col("den")).as("p"))
    }.reduce(_ unionAll _)
    val wide = perOrder.groupBy("id")
      .pivot("n", (1 to maxN).map(n => n: Any))
      .agg(first("p"))
      .toDF("id" +: (1 to maxN).map(n => s"p$n"): _*)
    val logSum = (1 to maxN).map(n =>
      when(col(s"p$n") > 0, log(col(s"p$n"))).otherwise(lit(Double.NaN)))
      .reduce(_ + _)
    wide.join(lens, "id").join(refLen, "id")
      .withColumn("bp", when(col("len") >= col("rlen"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("rlen").cast("double") / col("len"))))
      .select(col("id") +: (1 to maxN).map(n =>
          coalesce(col(s"p$n"), lit(0.0)).as(s"p$n")) :+
        col("bp") :+
        (coalesce(when(!isnan(logSum), exp(logSum / maxN)), lit(0.0)) *
          col("bp")).as("self_bleu"): _*)
  }
}
