package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Designed scale-first:
  *
  *  - exact dedup is a hash group-by (one shuffle of fingerprints);
  *  - MinHash/SimHash signatures are computed in one scan as Column
  *    expressions over the shingle array (no UDF, no per-row JVM
  *    objects);
  *  - candidate generation is a bucket self-join on (band, hash) —
  *    the only all-pairs work happens inside buckets, never globally;
  *  - verification re-checks true Jaccard on candidates only.
  *
  * At 100 TB the expensive path is the signature scan (linear) and the
  * bucket join (quadratic only within collision groups) — the standard
  * public MinHash-LSH construction (Broder '97).
  */
object Dedup {

  /** Word w-shingles of normalized text, hashed to 64-bit via
    * xxhash64 — the shingle *set* column used by both MinHash and
    * exact-Jaccard verification.
    */
  def shingles(text: Column, w: Int = 2): Column = {
    val words = split(TextAnalysis.normalize(text), " ")
    val n = size(words)
    val grams =
      if (w <= 1) words
      else transform(sequence(lit(0), greatest(n - w, lit(0))),
        i => array_join(slice(words, i + 1, lit(w)), " "))
    array_distinct(transform(grams, g => xxhash64(g)))
  }

  /** MinHash signature of a shingle-hash array: nHashes affine
    * permutations h_i(x) = a_i*x + b_i (64-bit wraparound), min per
    * i. Deterministic for a fixed seed.
    */
  def minHashSignature(shingleHashes: Column, nHashes: Int = 128,
      seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val coeffs = Array.fill(nHashes)((rnd.nextLong() | 1L, rnd.nextLong()))
    array(coeffs.map { case (a, b) =>
      array_min(transform(shingleHashes, x => x * a + b))
    }: _*)
  }

  /** Banded bucket keys for LSH: split the signature into `bands`
    * bands of `rowsPer` values, hash each band. A pair of documents
    * collides in a band iff their signature rows in that band all
    * match; with 32 bands x 4 rows, pairs at Jaccard 0.8 are caught
    * with probability 1 - (1 - 0.8^4)^32 ≈ 1 - 5e-8.
    */
  def lshBandKeys(sig: Column, bands: Int = 32, rowsPer: Int = 4): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(array_join(
          transform(slice(sig, b * rowsPer + 1, rowsPer), _.cast("string")),
          ",")).as("h"))
    }: _*)

  /** Exact duplicate groups: fingerprint group-by keeping the minimum
    * id as the canonical representative. Returns (id, canonical_id,
    * fingerprint). One shuffle at any scale.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
    val canon = fp.groupBy("fingerprint").agg(min("id").as("canonical_id"))
    fp.join(canon, "fingerprint").select("id", "canonical_id", "fingerprint")
  }

  /** Near-duplicate candidate pairs via MinHash LSH, verified with
    * true shingle Jaccard >= `threshold`. Returns (id1, id2, jaccard)
    * with id1 < id2.
    */
  def minHashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, nHashes: Int = 128, bands: Int = 32,
      shingleWidth: Int = 2, seed: Long = 42L): DataFrame = {
    val rowsPer = nHashes / bands
    val sigs = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleWidth).as("sh"))
      .withColumn("sig", minHashSignature(col("sh"), nHashes, seed))
      .withColumn("bk", lshBandKeys(col("sig"), bands, rowsPer))
      .persist()

    val buckets = sigs.select(col("id"), explode(col("bk")).as("b"))
      .select(col("id"), col("b.band"), col("b.h"))

    val candidates = buckets.alias("l")
      .join(buckets.alias("r"), Seq("band", "h"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()

    verifyJaccard(candidates, sigs.select("id", "sh"), threshold)
  }

  /** True Jaccard verification of candidate pairs against shingle
    * sets: join both sides' sets, intersect/union sizes.
    */
  def verifyJaccard(pairs: DataFrame, shingleSets: DataFrame,
      threshold: Double): DataFrame = {
    val s1 = shingleSets.select(col("id").as("id1"), col("sh").as("sh1"))
    val s2 = shingleSets.select(col("id").as("id2"), col("sh").as("sh2"))
    pairs.join(s1, "id1").join(s2, "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Exact all-pairs n-gram Jaccard within blocking groups — the
    * correctness oracle for the probabilistic paths, and usable
    * directly when a good blocking key (language, source, length
    * bucket) bounds group sizes.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], threshold: Double,
      shingleWidth: Int = 2): DataFrame = {
    val base = df.select(
      (col(idCol).as("id") +: col(textCol).as("__text") +: blockCols.map(col)): _*)
      .withColumn("sh", shingles(col("__text"), shingleWidth))
      .drop("__text")
    val l = base.select(
      (col("id").as("id1") +: col("sh").as("sh1") +: blockCols.map(col)): _*)
    val r = base.select(
      (col("id").as("id2") +: col("sh").as("sh2") +: blockCols.map(col)): _*)
    l.join(r, blockCols)
      .filter(col("id1") < col("id2"))
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** 64-bit SimHash of the token multiset: per bit, sum +1/-1 over
    * token hashes (weighted by term frequency via the token list),
    * sign → bit. Near-dups have small Hamming distance.
    */
  def simHash(text: Column): Column = {
    val toks = split(TextAnalysis.normalize(text), " ")
    val hashes = transform(toks, t => xxhash64(t))
    val bitSums = (0 until 64).map { b =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      acc.bitwiseOR(when(s > 0, lit(1L << b)).otherwise(lit(0L)))
    }
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicates: candidates via 16-bit chunk pigeonhole
    * (a pair within Hamming distance 3 of 64 bits must agree on at
    * least one of 4 chunks; we use it as a recall-oriented blocking
    * key), verified by true Jaccard >= threshold.
    */
  def simHashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 16, threshold: Double = 0.6,
      shingleWidth: Int = 2): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"),
      simHash(col(textCol)).as("sim"),
      shingles(col(textCol), shingleWidth).as("sh")).persist()
    val chunks = sigs.select(col("id"), col("sim"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL).as("ck"))
      }: _*)).as("b"))
      .select(col("id"), col("sim"), col("b.chunk"), col("b.ck"))
    val candidates = chunks.alias("l")
      .join(chunks.alias("r"), Seq("chunk", "ck"))
      .filter(col("l.id") < col("r.id"))
      .filter(hammingDistance(col("l.sim"), col("r.sim")) <= maxHamming)
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
    verifyJaccard(candidates, sigs.select("id", "sh"), threshold)
  }
}
