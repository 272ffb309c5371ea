package graft

import org.apache.spark.sql.functions._
import graft.ml.{TextAnalysis, TextIndex}

/** Persisted inverted index: build/query round trip, score equality
  * with the in-memory BM25, and the directory-pruning contract.
  */
class TextIndexSpec extends SparkSpec {

  test("index query equals in-memory BM25 exactly, prunes term buckets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-tix").toString
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 16)
    val terms = Seq("data", "table", "server", "value")

    val viaIndex = TextIndex.query(spark, dir, terms).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val inMemory = TextAnalysis.bm25(docs, "doc_id", "text", terms).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(viaIndex == inMemory, "index path changed a score or the order")
    assert(viaIndex.nonEmpty)

    // the postings scan must carry a bucket partition filter — the
    // layout's whole point is that 4 terms touch <= 4 of 16 dirs
    val plan = TextIndex.query(spark, dir, terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no bucket partition pruning in:\n$plan")
    val prunedOk = plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("bucket") &&
        !l.contains("PartitionFilters: []"))
    assert(prunedOk, s"empty partition filter list:\n$plan")

    // unknown-only query: empty result, no crash
    assert(TextIndex.query(spark, dir, Seq("zzqqxx")).count() == 0)
    intercept[IllegalArgumentException](
      TextIndex.query(spark, dir, Seq.empty))
  }

  test("df recounted on the pruned read stays exact after re-build") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta beta"), (2L, "alpha gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tix2").toString
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4)
    // alpha: df=2; beta: df=1 tf=2 in doc 1
    val got = TextIndex.query(spark, dir, Seq("alpha", "beta"), nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = TextAnalysis.bm25(docs, "doc_id", "text",
        Seq("alpha", "beta")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == exp)
    // overwrite build is idempotent
    TextIndex.build(docs, "doc_id", "text", dir, nBuckets = 4)
    val again = TextIndex.query(spark, dir, Seq("alpha", "beta"), nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == exp)
  }

  test("append: incremental index answers exactly like a full rebuild") {
    import spark.implicits._
    val first = Seq((1L, "alpha beta beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    val delta = Seq((3L, "beta delta alpha"), (4L, "gamma gamma"))
      .toDF("doc_id", "text")
    val incDir = java.nio.file.Files.createTempDirectory("graft-tixa").toString
    val fullDir = java.nio.file.Files.createTempDirectory("graft-tixb").toString
    TextIndex.build(first, "doc_id", "text", incDir, nBuckets = 4)
    TextIndex.append(delta, "doc_id", "text", incDir, nBuckets = 4)
    TextIndex.build(first.unionByName(delta), "doc_id", "text", fullDir,
      nBuckets = 4)
    val terms = Seq("alpha", "beta", "gamma")
    def res(d: String) = TextIndex.query(spark, d, terms, nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(res(incDir) == res(fullDir), "append diverged from rebuild")
    // stats advanced to the union totals
    val st = spark.read.parquet(s"$incDir/stats").head()
    assert(st.getLong(0) == 4L && st.getLong(1) == 3 + 2 + 3 + 2)
  }
}
