package graft

import org.apache.spark.sql.functions._
import graft.ml.Softmax

/** Multiclass softmax trainer: exact GD math on a hand-checkable
  * fixture, learning on the real documents table, scoring contracts.
  */
class SoftmaxSpec extends SparkSpec {

  test("train matches a driver-side replay of full-batch softmax GD") {
    import spark.implicits._
    val rows = Seq(
      (0, 1.0, 2.0), (0, 1.0, 1.5), (1, -1.0, 0.0),
      (1, -2.0, 0.5), (2, 0.0, -2.0))
    val df = rows.toDF("y", "fa", "fb")
    val got = Softmax.train(df, Seq("fa", "fb"), "y", k = 3,
      iters = 2, lr = 0.7)

    // driver replay with identical arithmetic
    var w = Array.fill(3, 2)(0.0)
    for (_ <- 0 until 2) {
      val g = Array.fill(3, 2)(0.0)
      rows.foreach { case (y, fa, fb) =>
        val f = Array(fa, fb)
        val z = w.map(wk => wk(0) * fa + wk(1) * fb)
        val zm = z.max
        val e = z.map(x => math.exp(x - zm))
        val tot = e.sum
        for (k <- 0 until 3; d <- 0 until 2)
          g(k)(d) += (e(k) / tot - (if (y == k) 1.0 else 0.0)) * f(d)
      }
      w = Array.tabulate(3, 2)((k, d) => w(k)(d) - 0.7 * g(k)(d) / rows.size)
    }
    for (k <- 0 until 3; d <- 0 until 2)
      assert(math.abs(got(k)(d) - w(k)(d)) < 1e-12, s"w($k)($d)")
    intercept[IllegalArgumentException](
      Softmax.train(df, Seq("fa"), "y", k = 1))
    intercept[IllegalArgumentException](
      Softmax.train(df, Seq.empty, "y", k = 3))
  }

  test("score: probabilities sum to 1, argmax pred, ties to lowest class") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 0.0), (2L, 0.0, 1.0), (3L, 0.0, 0.0))
      .toDF("id", "fa", "fb")
    // class 0 keys on fa, class 1 on fb, class 2 never wins; row 3 is
    // an exact three-way tie (all z = 0) -> class 0
    val w = Array(Array(2.0, 0.0), Array(0.0, 2.0), Array(0.0, 0.0))
    val got = Softmax.score(df, Seq("fa", "fb"), w).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("pred"), r.getAs[Double]("p_0") +
          r.getAs[Double]("p_1") + r.getAs[Double]("p_2"))).toMap
    assert(got(1L)._1 == 0 && got(2L)._1 == 1 && got(3L)._1 == 0)
    got.values.foreach { case (_, tot) => assert(math.abs(tot - 1.0) < 1e-12) }
  }

  test("language classifier learns planted multilingual text perfectly") {
    import spark.implicits._
    // real per-language character evidence (the synthetic corpus's
    // lang column is uncorrelated with its ASCII text, so the learning
    // check needs a planted fixture); 4 docs per language, de=0 en=1
    // es=2 fr=3 zh=4
    val samples = Seq(
      0 -> "die Bäume wären schön über die Straße hinüber grün",
      0 -> "der Fluß läuft südlich für müde Väter größer",
      0 -> "schöne Grüße für über müde Läufer aßen spät",
      0 -> "können Mädchen fünf Bücher über Vögel prüfen",
      1 -> "the cat sat on the mat and it was happy with the sun",
      1 -> "it is clear that the plan works for the team and the town",
      1 -> "the river runs to the sea and the boats sail with the wind",
      1 -> "that was the day the rain fell and the field is green",
      2 -> "el niño comió mañana según está aquí también así",
      2 -> "la canción suena más allá del corazón y jardín",
      2 -> "¿dónde está el camión que llevó al señor a su rincón?",
      2 -> "la niña soñó con un día más y así creció",
      3 -> "l'été était très chaud près de la forêt où ça brûle",
      3 -> "le garçon rêvait d'une île côtière où naître",
      3 -> "la fenêtre s'ouvrît sur un château très âgé déjà",
      3 -> "être ou paraître voilà la question posée dès l'aurore",
      4 -> "春天的花朵在山谷里开放美丽极了",
      4 -> "学生们在图书馆里安静地读书学习",
      4 -> "这条河流穿过城市流向大海非常长",
      4 -> "今天天气很好我们一起去公园散步")
    val df = samples.zipWithIndex
      .map { case ((y, t), i) => (i.toLong, t, y) }
      .toDF("id", "text", "y")
    val feats = Softmax.langFeaturize(df, "text")
    val w = Softmax.train(feats, Softmax.langFeatureCols, "y",
      k = 5, iters = 30, lr = 8.0)
    val scored = Softmax.score(feats, Softmax.langFeatureCols, w)
    val wrong = scored.filter(col("pred") =!= col("y")).count()
    assert(wrong == 0, s"$wrong misclassified")
  }

  test("quality-tier classifier learns the 3-way tier label on real docs") {
    import spark.implicits._
    // the synthetic corpus only realizes composites {0.88, 1.0}; plant
    // punctuation-soup junk (fails every component) so tier 0 exists
    val junk = (0 until 40).map(i =>
      (900000L + i, "!!! ### $$$ %%"))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select("doc_id", "text").unionByName(junk)
    val feats = Softmax.qualityTierFeaturize(docs, "text").persist()
    try {
      import graft.ml.QualityModel
      // all three tiers must be populated for the test to mean much
      val tiers = feats.groupBy("y").count().collect()
        .map(r => r.getAs[Int]("y") -> r.getAs[Long]("count")).toMap
      assert(tiers.keySet == Set(0, 1, 2), s"tiers: $tiers")
      val w = Softmax.train(feats, QualityModel.featureNames, "y",
        k = 3, iters = 50, lr = 0.5)
      val scored = Softmax.score(feats, QualityModel.featureNames, w)
      val n = scored.count().toDouble
      val correct = scored.filter(col("pred") === col("y")).count().toDouble
      val majority = tiers.values.max.toDouble / n
      // must beat the majority-class baseline: the label is a
      // threshold on a linear-ish function of these very features
      assert(correct / n > math.max(0.65, majority),
        s"accuracy ${correct / n} vs majority $majority")
    } finally feats.unpersist(blocking = false)
  }
}
