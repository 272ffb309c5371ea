package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Args, GraftJob}
import graft.ml.{Dedup, Profile, TextAnalysis}

/** End-to-end training-corpus preparation — the pipeline this engine's
  * beyond-reference operators exist for, composed the way a user would
  * run it over 100 TB of raw documents:
  *
  *  1. language ID + quality scoring in ONE scan (both are Column
  *     expressions — no second pass over the text);
  *  2. filter to the target language above a quality floor;
  *  3. exact dedup (fingerprint group-by), keeping canonical ids;
  *  4. MinHash near-dup discovery → connected components → drop every
  *     non-canonical member of each near-dup cluster;
  *  5. token counting for budget accounting;
  *  6. deterministic hash split into train/holdout (stable under
  *     appends and across engines);
  *  7. partitioned parquet write (split first, then language).
  *
  * Every stage is shuffle-bounded: the only all-pairs work happens
  * inside LSH collision buckets, and every aggregation is
  * partial/final.
  *
  * Args: --input <documents parquet> --output <dir>
  *       [--lang en] [--min-quality 0.5] [--jaccard 0.8]
  *       [--holdout 0.01]
  */
class CorpusPrepJob(args: Args) extends GraftJob(args) {

  def run(spark: SparkSession): Unit = {
    val out = CorpusPrepJob.prepare(
      spark.read.parquet(args("input")),
      lang = args.getOrElse("lang", "en"),
      minQuality = args.getOrElse("min-quality", "0.5").toDouble,
      jaccard = args.getOrElse("jaccard", "0.8").toDouble,
      holdout = args.getOrElse("holdout", "0.01").toDouble)
    out.write.partitionBy("split", "lang")
      .mode("overwrite").parquet(args("output"))
    Dedup.unpersistPipelineCaches()
  }
}

object CorpusPrepJob {

  /** The pipeline body, factored for testing: returns the curated
    * corpus with (doc_id, text, lang, quality, n_tokens, split).
    */
  def prepare(docs: DataFrame, lang: String, minQuality: Double,
      jaccard: Double, holdout: Double): DataFrame = {
    // 1-2: single-scan annotate + filter (both predicates push into
    // the same projection pass)
    val scored = docs
      .withColumn("lang_detected", TextAnalysis.langId(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .filter(col("lang_detected") === lang && col("quality") >= minQuality)

    // 3: exact dedup — keep only canonical fingerprints
    val exact = Dedup.exactDuplicates(scored, "doc_id", "text")
      .filter(col("id") === col("canonical_id"))
      .select(col("id").as("doc_id"))
    val exactDeduped = scored.join(exact, "doc_id")

    // 4: near-dup clusters — keep each cluster's canonical member
    val pairs = Dedup.minHashNearDuplicates(
      exactDeduped, "doc_id", "text", threshold = jaccard)
    val dropIds = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    val deduped = exactDeduped.join(dropIds, Seq("doc_id"), "left_anti")

    // 5-6: token accounting + deterministic split
    deduped
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .withColumn("split",
        when(Profile.fibScramble(col("doc_id")) <
          lit((holdout * 2147483647L).toLong), "holdout").otherwise("train"))
      .select("doc_id", "text", "lang", "quality", "n_tokens", "split")
  }
}
