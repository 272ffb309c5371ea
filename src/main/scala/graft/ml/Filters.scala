package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-cleaning filters from the public C4 (Raffel et al. 2020,
  * §2.2) and Gopher (Rae et al. 2021, §A.1.1) recipes — the standard
  * line- and document-level gates a web-scale training-data pipeline
  * runs before dedup and mixing. Everything is a pure Column
  * expression (no UDFs): one codegen'd scan per corpus, so the full
  * rule set runs at I/O speed over 100 TB and composes with predicate
  * pushdown when used as a filter.
  *
  * Reference corpus ops live in `ml/Corpus.scala`/`ml/TextAnalysis
  * .scala`; this file is the rule-based cleaning layer between raw
  * scrape and those stages.
  */
object Filters {

  // ---------------------------------------------------------------
  // C4-style line-level cleaning
  // ---------------------------------------------------------------

  /** C4 line rule: keep a line iff it ends in terminal punctuation,
    * has at least `minWords` whitespace words, and does not mention
    * javascript (the classic boilerplate tell).
    */
  def c4LineKeep(line: Column, minWords: Int = 3): Column =
    line.rlike("[.!?\"']\\s*$") &&
      size(split(trim(line), "\\s+")) >= minWords &&
      !lower(line).contains("javascript")

  /** Apply [[c4LineKeep]] to every newline-delimited line and rejoin
    * the survivors — the cleaned page text.
    */
  def c4CleanText(text: Column, minWords: Int = 3): Column =
    array_join(
      filter(split(text, "\n"), l => c4LineKeep(l, minWords)), "\n")

  /** C4 page rule over the ORIGINAL text plus its cleaned form: the
    * page survives iff the cleaned text still holds `minSentences`
    * sentence-ending marks and the original page has neither the
    * "lorem ipsum" placeholder nor a curly brace (code/templating
    * tell). Pair with [[Dedup.duplicateSpans]] for C4's three-sentence
    * span dedup.
    */
  def c4PageKeep(text: Column, cleaned: Column,
      minSentences: Int = 5): Column =
    (size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0))) >= minSentences) &&
      !lower(text).contains("lorem ipsum") &&
      !text.contains("{")

  // ---------------------------------------------------------------
  // Gopher-style document-level quality rules
  // ---------------------------------------------------------------

  /** The stopword-presence list Gopher checks (≥ 2 must appear). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher repetition-free quality rule set as a struct of named
    * booleans plus the conjunction `keep` — kept as individual flags
    * so a pipeline can log WHY documents die (the rule mix shifts per
    * corpus and per language; blind conjunctions are undebuggable at
    * scale). Repetition rules (duplicate line/n-gram fractions) are
    * separate single-scan metrics in [[TextAnalysis
    * .duplicateTokenFraction]] / [[TextAnalysis.topBigramFraction]].
    *
    * Every ratio divides by `greatest(count, 1)` so empty documents
    * flow through as rule failures, not NULL/∞ surprises — and so a
    * SQL oracle can reproduce the arithmetic exactly.
    */
  def gopherFlags(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val toks = TextAnalysis.tokens(text)
    val toksLower = TextAnalysis.tokens(lower(text))
    val nWords = when(length(trim(text)) === 0, 0).otherwise(size(toks))
    val nWordsSafe = greatest(nWords, lit(1)).cast("double")
    val mwl = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / nWordsSafe
    // '#' marks and ellipses per word (Gopher: symbol-to-word ≤ 0.1)
    val nSymbols = size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0)))
    val lines = split(text, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val nBullet = size(filter(lines, l => trim(l).rlike("^[-*•‣▶]")))
    val nEllipsis = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-zÀ-ÿ]")))
    val nStops = size(filter(
      array(gopherStopwords.map(lit): _*),
      w => array_contains(toksLower, w)))

    val wordCountOk = nWords.between(minWords, maxWords)
    val mwlOk = mwl.between(3.0, 10.0)
    val symbolOk = nSymbols.cast("double") / nWordsSafe <= 0.1
    val bulletOk = nBullet.cast("double") / nLines <= 0.9
    val ellipsisOk = nEllipsis.cast("double") / nLines <= 0.3
    val alphaOk = nAlpha.cast("double") / nWordsSafe >= 0.8
    val stopwordOk = nStops >= 2

    struct(
      nWords.as("n_words"),
      wordCountOk.as("word_count_ok"),
      mwlOk.as("mwl_ok"),
      symbolOk.as("symbol_ok"),
      bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"),
      alphaOk.as("alpha_ok"),
      stopwordOk.as("stopword_ok"),
      (wordCountOk && mwlOk && symbolOk && bulletOk &&
        ellipsisOk && alphaOk && stopwordOk).as("keep"))
  }

  /** The conjunction alone — for use directly in a `filter`. */
  def gopherKeep(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column =
    gopherFlags(text, minWords, maxWords).getField("keep")

  /** Corpus-wide exact line deduplication — C4's global step: every
    * non-blank line survives only at its FIRST occurrence across the
    * whole corpus (order = (id, line position)); blank lines always
    * survive (they are structure, not content). Returns
    * (id, n_kept, cleaned) with the surviving lines rejoined.
    *
    * Scale shape: explode to (line, id, pos), then ONE
    * hash-partitioned partial-aggregating groupBy(line) computes each
    * line's first occurrence (min of the (id, pos) struct — map-side
    * combine collapses the duplicate mass BEFORE the shuffle, so a
    * line duplicated a billion times ships one row per input
    * partition, never a billion; this is why it is a groupBy, NOT a
    * window over line, which would sort the full duplicate mass per
    * key). There is NO join back on the line: the first-occurrence
    * aggregate already holds every surviving line with its (id, pos),
    * so the output is rebuilt directly from it (plus the blank lines),
    * and the only other exchanges are id-keyed — the groupBy(id)
    * rebuild, whose shuffle carries only SURVIVING lines (round 4
    * shipped every line's text through a line-keyed join twice), and
    * a narrow id-only left join that restores documents whose every
    * line was seen earlier.
    */
  /** WITHIN-document line dedup: rebuild each document keeping only
    * the first occurrence of every non-blank line (blank lines always
    * survive as structure) — the intra-doc repetition CLEANER whose
    * corpus-wide sibling is [[dedupLinesAcrossCorpus]], and the apply
    * step for the Gopher duplicate-line-fraction FLAG. Pure Column
    * program over one scan: no shuffle, no join — per-row array
    * filter on the exploded line list, so a 100 TB corpus pays only
    * its read.
    */
  def dedupLinesWithinDoc(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val lines = split(col(textCol), "\n")
    // keep line i iff blank, or no earlier index holds the same line
    val kept = filter(lines, (line, i) =>
      trim(line) === "" ||
        not(exists(slice(lines, lit(1), i),
          prev => prev === line)))
    docs.select(col(idCol),
      size(kept).cast("long").as("n_kept"),
      (size(lines) - size(kept)).cast("long").as("n_dropped"),
      array_join(kept, "\n").as("cleaned"))
  }

  def dedupLinesAcrossCorpus(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val id = col(idCol)
    val lines = docs
      .select(id, posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    // blank lines always survive (structure, not content) and never
    // enter the first-occurrence aggregate
    val blanks = lines.filter(trim(col("line")) === "")
    val first = lines
      .filter(trim(col("line")) =!= "")
      .groupBy("line")
      .agg(min(struct(id.as("id"), col("pos").as("pos"))).as("__first"))
    val survivors = first.select(
      col("__first").getField("id").as(idCol),
      col("__first").getField("pos").as("pos"),
      col("line"))
    val rebuilt = survivors.unionByName(blanks)
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as("cleaned"))
    // total over its input: a document whose every line was seen
    // earlier has no surviving rows, so re-attach it empty via an
    // id-only join (both sides narrow — no text on the left)
    docs.filter(col(textCol).isNotNull).select(id)
      .join(rebuilt, Seq(idCol), "left")
      .select(id, coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Rule-attrition report — the observability every production
    * cleaning pipeline logs: for the C4 page rule and each named
    * Gopher rule, how many documents fail it, plus the total and the
    * overall survivor count. One single-scan aggregate (every rule is
    * a Column flag over the same projection, so the whole report is a
    * handful of conditional counts in one partial/final agg — a
    * metadata-priced query at 100 TB). Blind conjunctions are
    * undebuggable at scale; this is how a corpus owner learns WHICH
    * rule is eating their data before turning the filter on.
    */
  def attritionReport(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val cleaned = c4CleanText(text)
    def failures(flag: Column, name: String) =
      sum(when(!flag, 1L).otherwise(0L)).as(s"fail_$name")
    docs
      .select(text.as("__t"), cleaned.as("__c"))
      .withColumn("__g", gopherFlags(col("__c")))
      .agg(
        count(lit(1)).as("n_docs"),
        failures(c4PageKeep(col("__t"), col("__c")), "c4_page"),
        failures(col("__g").getField("word_count_ok"), "word_count"),
        failures(col("__g").getField("mwl_ok"), "mwl"),
        failures(col("__g").getField("symbol_ok"), "symbol"),
        failures(col("__g").getField("bullet_ok"), "bullet"),
        failures(col("__g").getField("ellipsis_ok"), "ellipsis"),
        failures(col("__g").getField("alpha_ok"), "alpha"),
        failures(col("__g").getField("stopword_ok"), "stopword"),
        sum(when(c4PageKeep(col("__t"), col("__c")) &&
          col("__g").getField("keep"), 1L).otherwise(0L)).as("n_survivors"))
  }

  /** Per-source boilerplate removal: a non-blank line that appears in
    * at least `minDocs` DISTINCT documents of the SAME source is
    * boilerplate (nav bars, cookie banners, footers — the stuff that
    * repeats across a site but is unique text corpus-wide), and every
    * occurrence is dropped from every document. This is the
    * complement of [[dedupLinesAcrossCorpus]]: that keeps the FIRST
    * occurrence of a duplicated line; this removes ALL occurrences
    * once a line is frequent within its source. Blank lines survive
    * as structure. Returns (id, n_kept, n_dropped, cleaned).
    *
    * Scale shape: one line explode → (source, line) hash count with
    * a distinct-doc aggregate, then the boilerplate set joins back
    * line-keyed — but only FREQUENT lines survive the having-filter,
    * so the join's build side is the (small) boilerplate set per
    * source and the rebuild groupBy(id) shuffles each surviving line
    * once. No window over the raw line stream, nothing quadratic.
    */
  def removeBoilerplate(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, sourceCol: String,
      minDocs: Int = 3): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2")
    val id = col(idCol)
    val lines = docs.select(id, col(sourceCol).as("__src"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = lines.filter(trim(col("line")) =!= "")
      .groupBy("__src", "line")
      .agg(countDistinct(id).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("__src"), col("line"), lit(true).as("__boiler"))
    lines
      .join(boiler, Seq("__src", "line"), "left")
      .withColumn("__keep", col("__boiler").isNull)
      .groupBy(idCol)
      .agg(
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(transform(array_sort(
          collect_list(when(col("__keep"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("cleaned"))
  }
}
