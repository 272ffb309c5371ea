package graft

import org.apache.spark.sql.functions._
import graft.examples.TrainingDataJob

/** Full assembly line: curate → decontaminate vs holdout → mix to
  * budget → pack. Verifies the leakage screen actually fires and the
  * budget/packing invariants hold.
  */
class TrainingDataSpec extends SparkSpec {

  private def scramble(id: Long): Long =
    (id % 2147483647L) * 1327217885L % 2147483647L

  test("assemble drops eval-leaked train docs and respects budget + packing invariants") {
    import spark.implicits._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val holdoutFrac = 0.2

    // first pass to learn which docs land in holdout
    val r0 = TrainingDataJob.assemble(docs, lang = "en", minQuality = 0.3,
      jaccard = 0.7, holdout = holdoutFrac, budget = 100000L,
      ctxLen = 128, nShards = 4)
    val holdoutRow = r0.holdout.orderBy("doc_id").head()
    val holdoutText = holdoutRow.getAs[String]("text")

    // plant a train-landing doc that embeds a long mid-span of a
    // holdout doc (shares many 8-grams) inside unrelated English
    // padding (Jaccard vs the holdout doc stays below 0.7, so it
    // survives near-dup dedup and must be caught by the leakage
    // screen instead)
    val span = holdoutText.split("\\s+").slice(2, 26).mkString(" ")
    val pad = "the committee met on a bright morning and they discussed " +
      "many important matters of policy and the budget for the coming year " +
      "while it was agreed that further study would be needed before any decision"
    val plantedId = Iterator.iterate(9000001L)(_ + 1)
      .find(id => scramble(id) >= (holdoutFrac * 2147483647L).toLong).get
    val planted = Seq((plantedId, s"$pad $span $pad", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")

    val r = TrainingDataJob.assemble(docs.unionByName(planted),
      lang = "en", minQuality = 0.3, jaccard = 0.7,
      holdout = holdoutFrac, budget = 100000L, ctxLen = 128, nShards = 4)

    val trainIds = r.train.select("doc_id").as[Long].collect().toSet
    val holdoutIds = r.holdout.select("doc_id").as[Long].collect().toSet
    assert(!trainIds.contains(plantedId), "leaked doc survived the screen")
    assert(trainIds.intersect(holdoutIds).isEmpty)

    // mixing: per-source running totals within budget
    assert(r.train.filter(col("cum_tokens") > 100000L).count() == 0)
    // packing: every mixed doc appears in exactly one manifest row
    val manifestDocs = r.manifest.select(explode(split(col("doc_ids"), ",")))
      .as[String].collect().map(_.toLong)
    assert(manifestDocs.length == trainIds.size)
    assert(manifestDocs.toSet == trainIds)
    // sequences are capacity-consistent: n_docs matches the id list
    val counts = r.manifest.select(col("n_docs"),
      size(split(col("doc_ids"), ",")).cast("long")).as[(Long, Long)].collect()
    counts.foreach { case (n, listed) => assert(n == listed) }
  }

  test("without planted leakage, decontamination keeps the corpus intact") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val r = TrainingDataJob.assemble(docs, lang = "en", minQuality = 0.3,
      jaccard = 0.7, holdout = 0.2, budget = 100000L,
      ctxLen = 128, nShards = 4)
    // synthetic docs are mutually unrelated: nothing should be
    // screened out, and train + holdout partition the curated set
    assert(r.train.count() > 0 && r.holdout.count() > 0)
    val total = r.train.count() + r.holdout.count()
    val curated = graft.examples.CorpusPrepJob.prepare(docs, "en", 0.3,
      0.7, 0.2).count()
    assert(total == curated)
  }

  test("fluency gate drops the highest-perplexity fraction per source") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val base = TrainingDataJob.assemble(docs, lang = "en", minQuality = 0.3,
      jaccard = 0.7, holdout = 0.2, budget = 100000L,
      ctxLen = 128, nShards = 4)
    val gated = TrainingDataJob.assemble(docs, lang = "en", minQuality = 0.3,
      jaccard = 0.7, holdout = 0.2, budget = 100000L,
      ctxLen = 128, nShards = 4, nllDropFrac = 0.25)
    val nBase = base.train.count()
    val nGated = gated.train.count()
    assert(nGated < nBase, s"gate dropped nothing ($nBase -> $nGated)")
    // survivors are a subset of the ungated train set, and within each
    // source the drop is at most the requested fraction of that
    // stratum (percent_rank cut: >= frac survives)
    assert(gated.train.join(base.train, Seq("doc_id"), "left_anti")
      .count() == 0)
    val perSource = base.train.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    gated.train.groupBy("source").count().collect().foreach { r =>
      val kept = r.getLong(1); val all = perSource(r.getString(0))
      assert(kept >= all - math.ceil(all * 0.25).toLong - 1,
        s"source ${r.getString(0)}: kept $kept of $all")
    }
    graft.ml.Dedup.unpersistPipelineCaches()
  }
}
