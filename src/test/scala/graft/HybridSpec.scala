package graft

import org.apache.spark.sql.functions._
import graft.ml.Hybrid

/** Reciprocal-rank fusion against hand arithmetic, and the hybrid
  * searcher's both-signals-beat-one behavior on a planted corpus.
  */
class HybridSpec extends SparkSpec {

  test("rrfFuse matches hand-computed reciprocal-rank sums") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Hybrid.rrfFuse(Seq(a, b), kRrf = 60, topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(math.abs(got(20L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(got(20L)._2 == 2L)
    assert(math.abs(got(10L)._1 - 1.0 / 61) < 1e-15 && got(10L)._2 == 1L)
    assert(math.abs(got(40L)._1 - 1.0 / 62) < 1e-15)
    // doc in both lists outranks any single-list doc here
    val top = Hybrid.rrfFuse(Seq(a, b), 60, 1).head()
    assert(top.getLong(0) == 20L)
  }

  test("hybridSearch surfaces the doc matching BOTH signals first") {
    import spark.implicits._
    val docs = Seq(
      (0L, "query probe document about spark engines"),
      (1L, "spark engines spark engines spark engines"), // lexical-only hit
      (2L, "completely unrelated text about gardening"), // semantic-only hit
      (3L, "spark engines at scale"), // both signals
      (4L, "nothing in common at all here")).toDF("doc_id", "text")
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextFloat())
    }
    val q = vec(3)
    val emb = Seq(
      (0L, q.clone()), // the probe itself
      (1L, vec(101)),
      (2L, q.map(x => (x * 0.99f + 0.01f))), // near the probe
      (3L, q.map(x => (x * 0.98f + 0.02f))), // near the probe
      (4L, vec(104))).toDF("id", "vec")
    val got = Hybrid.hybridSearch(docs, "doc_id", "text", emb,
      queryTerms = Seq("spark", "engines"),
      queryVec = emb.filter(col("id") === 0), nCand = 2, topK = 5)
      .collect()
    assert(got.head.getLong(0) == 3L,
      s"doc 3 matches lexically AND semantically: ${got.mkString(", ")}")
    val nLists = got.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(nLists(3L) == 2L)
    assert(!nLists.contains(4L), "doc 4 matches neither signal")
  }
}
