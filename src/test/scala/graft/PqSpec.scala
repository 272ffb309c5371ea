package graft

import org.apache.spark.sql.functions._
import graft.ml.{Pq, Similarity}

/** Product quantization: codebook training, encode determinism,
  * reconstruction quality, and ADC/re-rank recall vs brute force.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, dim: Int, nClusters: Int) = {
    // deterministic clustered vectors: cluster center ±0.1 jitter
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    (0L until n).map { i =>
      val c = centers((i % nClusters).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("id", "vec")
  }

  test("train produces m codebooks of k codewords with subDim slices") {
    val df = clustered(200, 32, 8)
    val cb = Pq.train(df, m = 4, k = 8, seed = 1L, iters = 2)
    assert(cb.m == 4 && cb.k == 8 && cb.subDim == 8)
    assert(cb.books.forall(_.forall(_.length == 8)))
  }

  test("encode is deterministic and m bytes per vector") {
    val df = clustered(100, 32, 4)
    val cb = Pq.train(df, m = 4, k = 8, seed = 1L, iters = 2)
    val a = Pq.encode(df, cb).as[(Long, Array[Byte])].collect().sortBy(_._1)
    val b = Pq.encode(df, cb).as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(a.length == 100)
    assert(a.forall(_._2.length == 4))
    assert(a.zip(b).forall { case ((i1, c1), (i2, c2)) =>
      i1 == i2 && java.util.Arrays.equals(c1, c2) })
  }

  test("reconstruction error shrinks with Lloyd iterations") {
    val df = clustered(300, 32, 8).cache()
    def mse(iters: Int): Double = {
      graft.core.PipelineCaches.unpersistAll() // drop the codebook memo
      val cb = Pq.train(df, m = 4, k = 16, seed = 3L, iters = iters)
      val bc = spark.sparkContext.broadcast(cb)
      df.as[(Long, Array[Float])].map { case (_, v) =>
        val codes = bc.value.encodeOne(v)
        var e = 0.0
        var sub = 0
        while (sub < bc.value.m) {
          val cw = bc.value.books(sub)(codes(sub) & 0xff)
          var i = 0
          while (i < bc.value.subDim) {
            val d = v(sub * bc.value.subDim + i) - cw(i)
            e += d * d
            i += 1
          }
          sub += 1
        }
        e
      }.reduce(_ + _)
    }
    val e0 = mse(0)
    val e3 = mse(3)
    assert(e3 < e0, s"expected Lloyd refinement to cut MSE: $e3 vs $e0")
  }

  test("ADC-only top-k returns same-cluster neighbors") {
    // same-cluster points PQ-encode to (near-)identical codes, so ADC
    // scores tie within a cluster and exact-pair recall is undefined;
    // the property ADC-only guarantees is CLUSTER recall — every
    // neighbor it returns lives in the query's cluster (id ≡ qid mod 8)
    val df = clustered(400, 32, 8).cache()
    val queries = df.filter($"id" < 8)
    val pq = Pq.pqTopK(queries, df, k = 5, m = 4, kCodes = 16, iters = 2)
    assert(pq.columns.toSeq == Seq("qid", "cid", "cos"))
    val rows = pq.select($"qid", $"cid").as[(Long, Long)].collect()
    assert(rows.length == 8 * 5)
    val sameCluster = rows.count { case (q, c) => q % 8 == c % 8 }
    assert(sameCluster >= 36, s"cluster recall too low: $sameCluster/40")
  }

  test("re-rank returns the exact top-k when the shortlist covers it") {
    val df = clustered(300, 32, 6).cache()
    val queries = df.filter($"id" < 5)
    val exact = Similarity.bruteForceTopK(queries, df, 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    // shortlist = whole corpus ⇒ re-rank must equal brute force exactly
    val pq = Pq.pqTopK(queries, df, k = 3, m = 4, kCodes = 16,
        rerank = 300)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    assert(pq == exact)
  }

  test("IVF-PQ probes same-cluster lists and re-rank recovers exact top-k") {
    val df = clustered(400, 32, 8).cache()
    val queries = df.filter($"id" < 8)
    // full probe + full shortlist ⇒ must equal brute force exactly
    val exact = Similarity.bruteForceTopK(queries, df, 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val full = Pq.ivfPqTopK(queries, df, k = 3, nCentroids = 8, nProbe = 8,
        m = 4, kCodes = 16, rerank = 400)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    assert(full == exact)
    // narrow probe, no re-rank: every neighbor still same-cluster
    val adc = Pq.ivfPqTopK(queries, df, k = 5, nCentroids = 8, nProbe = 2,
        m = 4, kCodes = 16)
      .select($"qid", $"cid").as[(Long, Long)].collect()
    val sameCluster = adc.count { case (q, c) => q % 8 == c % 8 }
    assert(sameCluster >= (adc.length * 0.9).toInt,
      s"cluster recall too low: $sameCluster/${adc.length}")
  }

  test("IVF-PQ ADC cosine approximates true cosine closely") {
    val df = clustered(300, 32, 6).cache()
    val queries = df.filter($"id" < 4)
    val adc = Pq.ivfPqTopK(queries, df, k = 10, nCentroids = 8, nProbe = 8,
        m = 8, kCodes = 32, iters = 3)
      .as[(Long, Long, Double)].collect()
    val vecs = df.as[(Long, Array[Float])].collect().toMap
    val errs = adc.map { case (qid, cid, approx) =>
      val (q, c) = (vecs(qid), vecs(cid))
      val exact = Similarity.VecUtil.dot(q, c) /
        (Similarity.VecUtil.norm(q) * Similarity.VecUtil.norm(c))
      math.abs(approx - exact)
    }
    assert(errs.max < 0.05, s"ADC cosine error too large: ${errs.max}")
  }

  test("codebooks round-trip through bytes exactly") {
    val df = clustered(100, 32, 4)
    val cb = Pq.train(df, m = 4, k = 8, seed = 9L, iters = 2)
    val back = Pq.codebooksFromBytes(cb.toBytes)
    assert(back.m == cb.m && back.subDim == cb.subDim && back.k == cb.k)
    assert(back.books.flatten.flatten.toSeq == cb.books.flatten.flatten.toSeq)
    intercept[IllegalArgumentException] {
      Pq.codebooksFromBytes(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
  }

  test("appendToIndex in split halves equals one whole-corpus encode") {
    val df = clustered(200, 32, 4).cache()
    val cents = Similarity.kmeansCentroids(df, nCentroids = 4)
    val cb = Pq.train(df, m = 4, k = 8)
    def rows(d: org.apache.spark.sql.DataFrame) =
      Pq.appendToIndex(d, cents, cb)
        .as[(Int, Long, Array[Byte])].collect()
        .map { case (c, id, codes) => (c, id, codes.toSeq) }.toSet
    val whole = rows(df)
    val split = rows(df.filter($"id" < 100)) ++ rows(df.filter($"id" >= 100))
    assert(whole == split)
    assert(whole.size == 200)
    graft.core.PipelineCaches.unpersistAll()
  }

  test("searchIvfPq answers from stored artifacts with exact re-rank") {
    val df = clustered(300, 32, 6).cache()
    val queries = df.filter($"id" < 5)
    val cents = Similarity.kmeansCentroids(df, nCentroids = 6)
    val cbBytes = Pq.train(df, m = 4, k = 16).toBytes
    val cb = Pq.codebooksFromBytes(cbBytes)
    val lists = Pq.appendToIndex(df, cents, cb)
    val got = Pq.searchIvfPq(lists, cents, cb, queries, k = 3,
        nProbe = 6, rerank = 300, rerankWith = Some(df))
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(queries, df, 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    assert(got == exact,
      "full-probe full-shortlist stored-index search must equal brute force")
    graft.core.PipelineCaches.unpersistAll()
  }

  test("train rejects a dim not divisible by m") {
    val df = clustered(50, 30, 4)
    intercept[IllegalArgumentException] {
      Pq.train(df, m = 4, k = 8)
    }
  }
}
