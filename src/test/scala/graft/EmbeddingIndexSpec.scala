package graft

import org.apache.spark.sql.functions._
import graft.examples.EmbeddingIndexJob
import graft.ml.Similarity

/** End-to-end embedding index assembly: planted exact dup, near-dup
  * and off-distribution outlier must be removed, and the emitted
  * IVF-PQ index must be consistent with the survivor set.
  */
class EmbeddingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val base = (0L until 80L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val exactDup = (100L, base(0)._2.clone)
    val nearDup = (101L, base(1)._2.map(x => x * 1.0001f))
    val outlier = (102L, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    (base :+ exactDup :+ nearDup :+ outlier).toDF("id", "vec")
  }

  test("build dedups, prunes and emits a consistent IVF-PQ index") {
    val r = EmbeddingIndexJob.build(corpus, dupCos = 0.999,
      minProto = 0.5, nCentroids = 4, m = 4, kCodes = 8)
    val prunedIds = r.pruned.select("id").as[Long].collect().toSet
    val indexIds = r.index.select("id").as[Long].collect().toSet

    assert(!prunedIds.contains(100L), "exact duplicate must collapse to id 0")
    assert(prunedIds.contains(0L))
    assert(!prunedIds.contains(101L), "near-duplicate must lose to id 1")
    assert(prunedIds.contains(1L))
    assert(indexIds == prunedIds, "index must cover exactly the survivors")

    val codeLens = r.index.select(length(col("codes")).cast("long"))
      .as[Long].collect().toSet
    assert(codeLens == Set(4L), "each code must be m bytes")

    val m = r.manifest.collect()
    assert(m.map(_.getAs[Long]("n_vectors")).sum == indexIds.size)
    assert(m.forall(r0 => r0.getAs[Long]("code_bytes") ==
      r0.getAs[Long]("n_vectors") * 4))
    graft.core.PipelineCaches.unpersistAll()
  }

  test("minProto prunes off-distribution vectors") {
    val strict = EmbeddingIndexJob.build(corpus, dupCos = 0.999,
      minProto = 0.8, nCentroids = 4, m = 4, kCodes = 8)
    val loose = EmbeddingIndexJob.build(corpus, dupCos = 0.999,
      minProto = -1.0, nCentroids = 4, m = 4, kCodes = 8)
    val strictIds = strict.pruned.select("id").as[Long].collect().toSet
    val looseIds = loose.pruned.select("id").as[Long].collect().toSet
    assert(strictIds.subsetOf(looseIds))
    assert(looseIds.contains(102L),
      "with no threshold the outlier survives")
    // the outlier sits far from every tight cluster centroid
    val protoOf102 = loose.pruned.filter($"id" === 102L)
      .select("proto").as[Double].head()
    assert(protoOf102 < 0.8, s"outlier proto unexpectedly high: $protoOf102")
    assert(!strictIds.contains(102L), "strict threshold prunes the outlier")
    graft.core.PipelineCaches.unpersistAll()
  }

  test("PCA stage reduces index dimensionality and keeps dedup semantics") {
    // whiten=false: whitening rescales the cluster-separating axes to
    // unit variance, which (by design) erases cosine separation — the
    // whitening contract itself is covered in PcaSpec
    val r = EmbeddingIndexJob.build(corpus, dupCos = 0.999,
      minProto = -1.0, nCentroids = 4, m = 4, kCodes = 8,
      pcaK = 8)
    // model shape: 8 components over the 16-dim input, descending
    val mdl = r.pca.getOrElse(fail("pca model missing"))
    assert(mdl.components.length == 8 && mdl.components.head.length == 16)
    assert(mdl.eigenvalues.toSeq == mdl.eigenvalues.sorted.reverse.toSeq)
    // exact dup runs upstream of projection: still collapsed to id 0
    val prunedIds = r.pruned.select("id").as[Long].collect().toSet
    assert(!prunedIds.contains(100L) && prunedIds.contains(0L))
    // the index codes cover exactly the survivors, same as un-projected
    val indexIds = r.index.select("id").as[Long].collect().toSet
    assert(indexIds == prunedIds)
    // 4 clusters well-separated in 16-d stay separated after PCA to
    // 8-d: each planted cluster maps mostly to one IVF centroid
    val purity = r.index.filter($"id" < 80)
      .withColumn("planted", col("id") % 4)
      .groupBy("planted")
      .agg(max("centroid").as("mx"), min("centroid").as("mn"))
      .collect()
    assert(purity.count(p => p.getAs[Long]("mx") == p.getAs[Long]("mn")) >= 3,
      "planted clusters must survive the projection")
    graft.core.PipelineCaches.unpersistAll()
  }

  test("kmeansCentroids emits the trained centroid table") {
    val c = Similarity.kmeansCentroids(corpus, nCentroids = 4)
    val rows = c.as[(Long, Array[Float])].collect()
    assert(rows.length == 4)
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.forall(_._2.length == 16))
    graft.core.PipelineCaches.unpersistAll()
  }
}
