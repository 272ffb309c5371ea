package graft

import org.apache.spark.sql.functions._
import graft.examples.ExperimentAnalysisJob

/** The experiment-analytics flagship: every report materializes from
  * one normalized scan, cross-checked against the standalone
  * operators, and the Tool/Args path writes all outputs.
  */
class ExperimentAnalysisSpec extends SparkSpec {

  test("analyze: reports present, internally consistent on real events") {
    val events = spark.read.parquet(sf() + "/events.parquet")
    val r = ExperimentAnalysisJob.analyze(events, arms = 2,
      convType = "purchase")
    assert(r.keySet == Set("abtest", "bootstrap", "sequential", "power",
      "winsorized", "qte", "cuped", "retention", "survival", "trending",
      "markov", "sessions", "srm", "logrank", "cmh", "delta_ratio",
      "psm", "qini"))

    // round-9 suite: SRM on a deterministic hash split should not
    // scream; logrank emits one row per arm; CMH pools the cohort
    // strata into one row; delta_ratio carries a z only on treatment;
    // PSM reports the overlap diagnostic; qini has 10 deciles max
    val srm = r("srm").collect()
    assert(srm.length == 2 && srm.forall(!_.getAs[Boolean]("undesigned_arm")))
    val lr = r("logrank").collect()
    assert(lr.length == 2 &&
      lr.map(_.getAs[Long]("observed")).sum >= 0)
    assert(math.abs(lr.map(_.getAs[Double]("expected")).sum -
      lr.map(_.getAs[Long]("observed")).sum) < 1e-6)
    assert(r("cmh").count() == 1)
    val dr = r("delta_ratio").collect()
    assert(dr.length == 2)
    assert(dr.count(_.isNullAt(dr.head.fieldIndex("z_vs_control"))) == 1)
    val psm = r("psm").collect()
    assert(psm.nonEmpty &&
      psm.head.getAs[Long]("n_treated") == psm.length)
    assert(r("qini").count() <= 10)

    // winsorized: per-arm means well-formed; qte rows = arms-1 x 4 ps
    r("winsorized").collect().foreach { row =>
      assert(row.getAs[Double]("mean_wins") <= row.getAs[Double]("hi_cut") + 1e-9)
    }
    assert(r("qte").count() == 4)

    // sequential: always-valid p non-increasing per arm; power: MDE
    // positive and finite
    r("sequential").collect().groupBy(_.getAs[String]("variant"))
      .foreach { case (_, rows) =>
        val ps = rows.sortBy(_.getAs[Long]("period"))
          .flatMap(x => Option(x.getAs[java.lang.Double]("p_value")))
          .map(_.doubleValue)
        ps.sliding(2).foreach(p =>
          if (p.length == 2) assert(p(0) >= p(1) - 1e-15))
      }
    r("power").collect().foreach { row =>
      // pooled rate exactly 0 or 1 (everyone/no-one converts, as at
      // sf0.001) legitimately gives MDE 0 — only require well-formed
      assert(row.getAs[Double]("mde_abs") >= 0)
    }

    // bootstrap: CI covers each arm's point estimate, rate agrees with
    // the z-test's rate per arm
    val bs = r("bootstrap").collect()
      .map(row => row.getAs[String]("variant") ->
        (row.getAs[Double]("mean"), row.getAs[Double]("ci_lo"),
          row.getAs[Double]("ci_hi"))).toMap
    assert(bs.size == 2)
    bs.values.foreach { case (m, lo, hi) =>
      assert(lo <= m && m <= hi)
      // every-user-converts (rate exactly 1) collapses every weighted
      // replicate mean to 1 — the CI is legitimately a point there
      if (m > 0 && m < 1) assert(lo < hi)
    }
    r("abtest").collect().foreach { row =>
      val (m, _, _) = bs(row.getAs[String]("variant"))
      assert(math.abs(row.getAs[Double]("rate") - m) < 1e-12,
        "bootstrap mean must equal the z-test arm rate")
    }

    // abtest: one treatment arm vs control, user totals add up
    val ab = r("abtest").collect()
    assert(ab.length == 1)
    val nUsers = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val ctlUsers = ab.head.getAs[Long]("n_users")
    // control + treatment = all users (hash split covers everyone)
    val cuped = r("cuped").collect()
    assert(cuped.map(_.getAs[Long]("n_users")).sum == nUsers)
    // CUPED minimizes POOLED variance (theta is the pooled OLS slope;
    // a single arm can tick up, the population cannot)
    def pooled(meanCol: String, varCol: String): Double = {
      val n = cuped.map(_.getAs[Long]("n_users").toDouble).sum
      val m = cuped.map(r =>
        r.getAs[Long]("n_users") * r.getAs[Double](meanCol)).sum / n
      cuped.map(r => r.getAs[Long]("n_users") *
        (r.getAs[Double](varCol) +
          math.pow(r.getAs[Double](meanCol) - m, 2))).sum / n
    }
    assert(pooled("mean_adj", "var_adj") <=
      pooled("mean_raw", "var_raw") + 1e-6)
    assert(ctlUsers < nUsers)

    // survival: curves monotone non-increasing per cohort
    val surv = r("survival").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(4)))
      .groupBy(_._1)
    surv.values.foreach { g =>
      g.sortBy(_._2).map(_._3).sliding(2).foreach(p =>
        if (p.length == 2) assert(p(0) >= p(1) - 1e-12))
    }

    // sessions: session count matches the standalone window form
    val raw = events
    val ev = raw.withColumn("sec", graft.core.Ts.seconds(raw))
    val expectSessions = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
      ev.withColumn("prev", lag("sec", 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull || col("sec") - col("prev") > 1800, 1)
            .otherwise(0))
        .agg(sum("new_s")).head().getLong(0)
    }
    assert(r("sessions").count() == expectSessions)

    // trending: rank bounded by k
    assert(r("trending").agg(max("rank")).head().getLong(0) <= 3L)
  }

  test("the Tool path writes every report directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    val in = sf() + "/events.parquet"
    graft.core.Tool.run("graft.examples.ExperimentAnalysisJob",
      graft.core.Args(Seq("--input", in, "--output", dir)), spark)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(Set("abtest", "bootstrap", "sequential", "power", "winsorized",
      "qte", "cuped", "retention", "survival", "trending", "markov",
      "sessions").subsetOf(names), names.toString)
    assert(spark.read.parquet(s"$dir/survival").count() > 0)
  }
}
