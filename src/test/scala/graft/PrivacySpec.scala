package graft

import org.apache.spark.sql.functions._
import graft.ml.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI (zip, age): class sizes 3, 2, 1; sensitive diagnosis
  private def people = Seq(
    ("94107", 30, "flu"), ("94107", 30, "flu"), ("94107", 30, "cold"),
    ("94110", 40, "flu"), ("94110", 40, "cold"),
    ("02139", 50, "flu")
  ).toDF("zip", "age", "diag")

  test("kAnonymityReport counts classes, violations and l-diversity") {
    val r = Privacy.kAnonymityReport(people, Seq("zip", "age"), k = 2,
      sensitive = Some("diag"), l = 2).collect().head
    assert(r.getAs[Long]("n_rows") == 6)
    assert(r.getAs[Long]("n_classes") == 3)
    assert(r.getAs[Long]("min_class_size") == 1)
    assert(r.getAs[Long]("n_violating_rows") == 1) // the singleton class
    assert(r.getAs[Long]("min_l_diversity") == 1)  // 02139 has one diag
    assert(!r.getAs[Boolean]("pass"))
  }

  test("a k-anonymous l-diverse table passes") {
    val ok = people.filter($"zip" =!= "02139")
    val r = Privacy.kAnonymityReport(ok, Seq("zip", "age"), k = 2,
      sensitive = Some("diag"), l = 2).collect().head
    assert(r.getAs[Boolean]("pass"))
  }

  test("suppressSmallClasses leaves a k-anonymous table") {
    val kept = Privacy.suppressSmallClasses(people, Seq("zip", "age"), k = 2)
    assert(kept.count() == 5) // singleton 02139 row suppressed
    val r = Privacy.kAnonymityReport(kept, Seq("zip", "age"), k = 2)
      .collect().head
    assert(r.getAs[Long]("n_violating_rows") == 0)
  }

  test("generalizeNumeric coarsens into fixed-width buckets") {
    val g = people.select(Privacy.generalizeNumeric($"age", 25.0).as("b"))
      .as[Double].collect().sorted
    assert(g.toSeq == Seq(25.0, 25.0, 25.0, 25.0, 25.0, 50.0))
  }

  test("tClosenessReport: hand-computed TVD incl. absent-value mass") {
    // global: P(flu)=2/3, P(cold)=1/3
    // (94107,30): Q=(2/3,1/3) → tvd 0
    // (94110,40): Q=(1/2,1/2) → ½(1/6+1/6) = 1/6
    // (02139,50): Q=(1,·), cold ABSENT → ½(1/3 + 1/3) = 1/3
    val r = Privacy.tClosenessReport(people, Seq("zip", "age"), "diag",
        t = 0.2).collect()
      .map(x => (x.getAs[String]("zip"),
        (x.getAs[Long]("n"), x.getAs[Double]("tvd"),
          x.getAs[Boolean]("pass")))).toMap
    assert(r("94107")._1 == 3L && math.abs(r("94107")._2) < 1e-12)
    assert(r("94107")._3)
    assert(math.abs(r("94110")._2 - 1.0 / 6) < 1e-12 && r("94110")._3)
    assert(r("02139")._1 == 1L)
    assert(math.abs(r("02139")._2 - 1.0 / 3) < 1e-12 && !r("02139")._3)
  }

  test("laplaceNoisedCounts: noise matches the inverse-CDF replica") {
    import java.security.MessageDigest
    val r = Privacy.laplaceNoisedCounts(people, Seq("zip"),
        epsilon = 0.5, seed = "s1").collect()
      .map(x => x.getAs[String]("zip") ->
        ((x.getAs[Long]("n"), x.getAs[Double]("noised_n")))).toMap
    def expectedNoise(zip: String): Double = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"s1:$zip".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val c = u - 0.5
      -(1.0 / 0.5) * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
    }
    Seq("94107", "94110", "02139").foreach { z =>
      assert(math.abs(r(z)._2 - (r(z)._1 + expectedNoise(z))) < 1e-9,
        s"zip $z")
    }
    // true counts preserved alongside
    assert(r("94107")._1 == 3L)
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisedCounts(people, Seq("zip"), epsilon = 0.0,
        seed = "s")
    }
  }

  test("laplaceNoisedSums clips contributions and reuses the count noise shape") {
    import spark.implicits._
    val d = Seq(("a", 10.0), ("a", 200.0), ("a", -5.0), ("b", 3.0))
      .toDF("g", "v")
    val sums = Privacy.laplaceNoisedSums(d, Seq("g"), "v",
        clipLo = 0.0, clipHi = 50.0, epsilon = 1.0, seed = "z")
      .collect().map(x => x.getString(0) ->
        ((x.getAs[Double]("clipped_sum"), x.getAs[Double]("noised_sum"))))
      .toMap
    // clip: 10 + 50 + 0 = 60; 3
    assert(sums("a")._1 == 60.0 && sums("b")._1 == 3.0)
    // noise scale = 50/1: same draw as a count query with
    // sensitivity 50 and the same (seed, key)
    val cnt = Privacy.laplaceNoisedCounts(d, Seq("g"), epsilon = 1.0,
        seed = "z", sensitivity = 50.0)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Double]("noised_n") - x.getAs[Long]("n"))).toMap
    Seq("a", "b").foreach { g =>
      assert(math.abs((sums(g)._2 - sums(g)._1) - cnt(g)) < 1e-9, g)
    }
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisedSums(d, Seq("g"), "v", 5.0, 5.0, 1.0, "z")
    }
  }

  test("report validates arguments") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq.empty, 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq("zip"), 0)
    }
  }
}
