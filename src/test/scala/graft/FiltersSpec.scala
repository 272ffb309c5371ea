package graft

import org.apache.spark.sql.functions._
import graft.ml.{Filters, QualityModel}

/** C4 line/page cleaning and Gopher document rules over crafted
  * multi-line documents (the synthetic corpus has no newlines or
  * punctuation, so rule-by-rule coverage lives here; the q_text_c4 /
  * q_text_gopher gates pin SQL equivalence on the corpus).
  */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def clean(text: String, minWords: Int = 3): (String, Boolean) = {
    val row = Seq(text).toDF("text")
      .select(
        Filters.c4CleanText(col("text"), minWords).as("cleaned"),
        Filters.c4PageKeep(col("text"),
          Filters.c4CleanText(col("text"), minWords)).as("keep"))
      .head()
    (row.getString(0), row.getBoolean(1))
  }

  test("c4 keeps only terminal-punctuation lines with enough words") {
    val text = Seq(
      "This is a proper sentence.",   // kept
      "Too short.",                   // dropped: 2 words
      "No terminal punctuation here", // dropped: no [.!?"']
      "Is this a question?",          // kept
      "Enable javascript to view.",   // dropped: javascript
      "He said \"stop right there!\"" // kept: quote terminal
    ).mkString("\n")
    val (cleaned, _) = clean(text)
    assert(cleaned.split("\n").toSeq == Seq(
      "This is a proper sentence.",
      "Is this a question?",
      "He said \"stop right there!\""))
  }

  test("c4 page rules: sentence floor, lorem ipsum, curly brace") {
    val five = (1 to 5).map(i => s"This is sentence number $i.")
    assert(clean(five.mkString("\n"))._2)
    assert(!clean(five.take(4).mkString("\n"))._2)
    assert(!clean((five :+ "Lorem Ipsum dolor sit amet.").mkString("\n"))._2)
    assert(!clean((five :+ "if (x) { return. }").mkString("\n"))._2)
    // the brace line itself also dies at line level (no terminal punct
    // needed — page check runs on the ORIGINAL text)
    assert(!clean(five.mkString("\n") + "\nvar x = {};")._2)
  }

  private def flags(text: String, minWords: Int = 50): Map[String, Any] = {
    val row = Seq(text).toDF("text")
      .select(Filters.gopherFlags(col("text"), minWords).as("g"))
      .select("g.*")
      .head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("gopher rules fire individually") {
    val good = (("the data and that model have to ship with " * 6).trim + ".")
    assert(flags(good, minWords = 10)("keep") == true)
    // word count floor
    assert(flags("the of and.", minWords = 50)("word_count_ok") == false)
    // mean word length: single-char words fail the ≥3 band
    assert(flags(Seq.fill(60)("a b").mkString(" "))("mwl_ok") == false)
    // symbol soup: more than 1 ellipsis/hash per 10 words
    val hashy = (("the data and that " + "# # # ") * 15).trim
    assert(flags(hashy, minWords = 10)("symbol_ok") == false)
    // bullet lines > 90%
    val bullets = (1 to 10).map(i => s"- item the of and number $i").mkString("\n")
    assert(flags(bullets, minWords = 10)("bullet_ok") == false)
    // ellipsis endings > 30%
    val dots = Seq("the story continues...", "and then...", "more of that...",
      "a normal closing line here the and of").mkString("\n")
    assert(flags(dots, minWords = 5)("ellipsis_ok") == false)
    // alpha fraction: digit soup fails
    val nums = (("the of " + "12 34 56 78 ") * 10).trim
    assert(flags(nums, minWords = 10)("alpha_ok") == false)
    // stopword presence: needs ≥ 2 of the Gopher list
    assert(flags(Seq.fill(60)("alpha beta").mkString(" "))("stopword_ok") == false)
  }

  test("gopher keep is the conjunction of its flags") {
    val text = ("the data and that model " * 12).trim
    val f = flags(text, minWords = 10)
    val parts = Seq("word_count_ok", "mwl_ok", "symbol_ok", "bullet_ok",
      "ellipsis_ok", "alpha_ok", "stopword_ok").map(f(_) == true)
    assert(f("keep") == parts.forall(identity))
  }

  test("quality model separates rule-labeled classes on the corpus") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val feats = QualityModel.featurize(docs, "text")
    val w = QualityModel.trainOnFeatures(feats, iters = 10, lr = 0.5)
    val scored = QualityModel.scoreOnFeatures(feats, w)
      .groupBy("label").agg(avg("score").as("m"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // distant supervision recovered: positives score above negatives
    assert(scored.keySet == Set(0.0, 1.0))
    assert(scored(1.0) > scored(0.0))
  }

  test("corpus-wide line dedup keeps first occurrences and blank lines") {
    val docs = Seq(
      (1L, "alpha line\ncommon line\n\nunique one"),
      (2L, "common line\nbeta line\n\n"),
      (3L, "common line\nalpha line")).toDF("id", "text")
    val out = graft.ml.Filters.dedupLinesAcrossCorpus(docs, "id", "text")
      .select("id", "n_kept", "cleaned")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 4L, "alpha line\ncommon line\n\nunique one")))
    // doc 2 loses "common line" (first seen in doc 1) but keeps blanks
    assert(out(1) == ((2L, 3L, "beta line\n\n")))
    // doc 3 loses both non-blank lines -> present and empty
    assert(out(2) == ((3L, 0L, "")))
  }

  test("within-doc line dedup keeps first occurrences and blanks, no shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nbeta\n\nalpha\ngamma\nbeta"),
      (2L, "solo"),
      (3L, "\n\n"),
      (4L, "x\nx\nx\nx")).toDF("id", "text")
    val got = graft.ml.Filters.dedupLinesWithinDoc(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((4L, 2L, "alpha\nbeta\n\ngamma")),
      s"first occurrences + blank survive: ${got(1L)}")
    assert(got(2L) == ((1L, 0L, "solo")))
    assert(got(3L) == ((3L, 0L, "\n\n")), s"blanks must all survive: ${got(3L)}")
    assert(got(4L) == ((1L, 3L, "x")))
    // the plan is a pure scan: no exchange anywhere
    val plan = graft.ml.Filters.dedupLinesWithinDoc(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"within-doc dedup must not shuffle:\n$plan")
  }

  test("attritionReport counts per-rule failures in one aggregate") {
    // 6 repetitions -> 6 sentence marks (the page rule needs >= 5)
    val good = ("the words flow nicely here and with that we have " +
      "plenty of sensible content to be read aloud. ") * 6
    val bullets = (1 to 6).map(i => s"- item $i in the list.").mkString("\n")
    val symbols = ("### hash ### marks ### everywhere ### " * 20) + "the end of it to be sure."
    val docs = Seq((1L, good), (2L, bullets), (3L, symbols)).toDF("id", "text")
    val r = graft.ml.Filters.attritionReport(docs, "text").head()
    assert(r.getAs[Long]("n_docs") == 3L)
    // the bullet doc fails the bullet-line ratio; the hash soup fails
    // the symbol ratio; the good doc survives everything
    assert(r.getAs[Long]("fail_bullet") >= 1L)
    assert(r.getAs[Long]("fail_symbol") >= 1L)
    assert(r.getAs[Long]("n_survivors") >= 1L)
  }

  test("keepBest elects the argmax-score member per cluster") {
    val docs = Seq(
      (1L, "aaaa", 10.0), (2L, "bbbbbb", 20.0), (3L, "cc", 30.0),
      (4L, "dddd", 5.0)).toDF("id", "text", "score")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "component")
    val out = graft.ml.Dedup.keepBest(docs, "id", comps, col("score"))
      .select("id", "cluster", "keep").as[(Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, false), (2L, 1L, false), (3L, 1L, true), (4L, 4L, true)))
    // ties break to the lowest id
    val tied = Seq((7L, "x", 1.0), (5L, "y", 1.0)).toDF("id", "text", "score")
    val tiedComps = Seq((5L, 5L), (7L, 5L)).toDF("id", "component")
    val rep = graft.ml.Dedup.keepBest(tied, "id", tiedComps, col("score"))
      .filter(col("keep")).select("id").as[Long].collect().toSeq
    assert(rep == Seq(5L))
  }

  test("keepBest composes end-to-end with minhash clustering and a quality score") {
    import graft.ml.{Dedup, TextAnalysis}
    val base = ("the quick brown fox jumps over the lazy dog near the river " +
      "and then runs far away into the quiet green forest ") * 5
    val near = base + "with one extra trailing clause added"
    val other = ("spark engines read parquet files in parallel across many " +
      "executors and shuffle hash partitioned rows between stages ") * 5
    val docs = Seq((1L, base), (2L, near), (3L, other))
      .toDF("doc_id", "text")
    val comps = Dedup.connectedComponents(
      Dedup.minHashNearDuplicates(docs, "doc_id", "text", threshold = 0.5))
    val out = Dedup.keepBest(docs, "doc_id", comps,
        TextAnalysis.qualityScore(col("text")))
      .select("doc_id", "cluster", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // 1 and 2 are near-dups -> same cluster, exactly one kept (equal
    // discrete quality -> lowest id); 3 is a singleton via the
    // null-component path and keeps itself
    assert(out(0)._2 == out(1)._2, s"1 and 2 should share a cluster: ${out.toSeq}")
    assert(out.map(_._3).toSeq == Seq(true, false, true), s"keep flags: ${out.toSeq}")
    assert(out(2)._2 == 3L, s"singleton cluster should be its own id: ${out.toSeq}")
  }

  test("removeBoilerplate drops frequent lines per source, keeps blanks") {
    import spark.implicits._
    // "footer" appears in 3 docs of source A (boilerplate there) but
    // only 2 docs of source B (kept there); blank lines always survive
    val docs = Seq(
      (1L, "A", "alpha\nfooter\n\nbody one"),
      (2L, "A", "footer\nbody two"),
      (3L, "A", "body three\nfooter"),
      (4L, "B", "footer\nother"),
      (5L, "B", "footer again\nfooter")).toDF("doc_id", "source", "text")
    val out = Filters.removeBoilerplate(docs, "doc_id", "text", "source",
        minDocs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, "alpha\n\nbody one")))
    assert(out(2L) == ((1L, 1L, "body two")))
    assert(out(3L) == ((1L, 1L, "body three")))
    // source B is untouched: "footer" only appears in 2 of its docs
    assert(out(4L) == ((2L, 0L, "footer\nother")))
    assert(out(5L) == ((2L, 0L, "footer again\nfooter")))
    intercept[IllegalArgumentException](
      Filters.removeBoilerplate(docs, "doc_id", "text", "source", 1))
  }

  test("targetEncode: smoothing shrinks to prior, LOO excludes own label") {
    import spark.implicits._
    // cat a: labels 1,1,0 (mean 2/3); cat b: one row label 1; prior 3/4
    val df = Seq((1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 0.0),
      (4L, "b", 1.0)).toDF("id", "cat", "y")
    val plain = QualityModel.targetEncode(df, "cat", "y", smoothing = 2.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cat_te"))
      .toMap
    val prior = 0.75
    assert(math.abs(plain(1L) - (2.0 + prior * 2) / (3 + 2)) < 1e-12)
    assert(math.abs(plain(4L) - (1.0 + prior * 2) / (1 + 2)) < 1e-12)
    // zero smoothing = raw category mean
    val raw = QualityModel.targetEncode(df, "cat", "y", smoothing = 0.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cat_te"))
      .toMap
    assert(math.abs(raw(1L) - 2.0 / 3) < 1e-12 && raw(4L) == 1.0)
    // LOO: own label excluded; singleton category falls back to prior
    val loo = QualityModel.targetEncode(df, "cat", "y", smoothing = 0.0,
        loo = true)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("cat_te"))
      .toMap
    assert(math.abs(loo(1L) - 0.5) < 1e-12) // (2-1)/(3-1)
    assert(math.abs(loo(3L) - 1.0) < 1e-12) // (2-0)/(3-1)
    assert(loo(4L) == prior)                 // singleton -> prior
  }
}
