package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval: BM25 over the text and cosine
  * over the embedding column, fused by reciprocal-rank fusion
  * (Cormack, Clarke & Buettcher 2009) — score(d) = Σ_lists
  * 1/(kRrf + rank_d(list)). The standard first-stage retriever for
  * RAG / decontamination / dedup-candidate generation when neither
  * signal alone recalls well.
  *
  * Scale shape: each branch produces a BOUNDED candidate list (top
  * nCand by contract) via its own scalable retriever ([[TextAnalysis.bm25]]
  * or the pruned-scan [[TextIndex]] path; [[Similarity.bruteForceTopK]]
  * or an IVF variant), so the fusion itself — a union of ≤ Σ nCand
  * narrow rows, one hash aggregate, one bounded top-k — is driver-cheap
  * no matter the corpus size. Windows here rank only those bounded
  * lists, never the corpus.
  */
object Hybrid {

  /** Fuse ranked lists, each `(doc_id, rank)` with 1-based ranks.
    * Returns `(doc_id, rrf, n_lists)`, the `topK` best by
    * (rrf DESC, doc_id). RRF only reads ranks, so heterogeneous score
    * scales (BM25 vs cosine) need no normalization — that robustness
    * is the reason RRF beats score-interpolation as a default.
    */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kRrf >= 1, "kRrf must be >= 1")
    rankings.map(_.select(col("doc_id").cast("long"),
        col("rank").cast("long")))
      .reduce(_.unionAll(_))
      .groupBy("doc_id")
      .agg(sum(lit(1.0) / (lit(kRrf) + col("rank"))).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** One-query hybrid search: `queryTerms` drive the BM25 branch over
    * `docs(idCol, textCol)`, `queryVec` (a 1-row (id, vec) probe)
    * drives the cosine branch over `embeddings(id, vec)`; both
    * top-`nCand` lists fuse with [[rrfFuse]]. The rank windows run
    * over the already-bounded candidate lists (≤ nCand rows), not the
    * corpus.
    */
  def hybridSearch(docs: DataFrame, idCol: String, textCol: String,
      embeddings: DataFrame, queryTerms: Seq[String],
      queryVec: DataFrame, nCand: Int = 20, kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    // rank the bounded lexical list without an unpartitioned window
    // (the repo-wide zero-global-window invariant): collect the ≤nCand
    // candidates into ONE sorted array aggregate and posexplode —
    // ascending struct sort on (-bm25, doc_id) = (bm25 DESC, doc_id)
    val lex = TextAnalysis.bm25(docs, idCol, textCol, queryTerms,
        topK = nCand)
      .agg(sort_array(collect_list(
        struct((-col("bm25")).as("ns"), col("doc_id")))).as("xs"))
      .select(posexplode(col("xs")).as(Seq("pos", "x")))
      .select(col("x.doc_id").as("doc_id"), (col("pos") + 1).as("rank"))
    val sem = Similarity.bruteForceTopK(queryVec, embeddings, nCand)
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .select(col("cid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, sem), kRrf, topK)
  }
}
