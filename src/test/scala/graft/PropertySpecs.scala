package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.agg.{Aggregators, FreqSketch, Monoid, Semigroup}
import graft.core.Args
import graft.dates._

/** Property-based tests (the reference's ScalaCheck layer:
  * DateProperties.scala, ArgTest.scala) plus algebraic laws for the
  * aggregation monoids — the correctness backbone of every
  * `sum[T: Semigroup]` / `mapReduceMap` aggregation: Spark may split
  * and merge partial buffers in ANY grouping, so associativity +
  * identity are exactly what make the distributed answer well-defined.
  * All pure driver-side — no SparkSession.
  */
object MonoidLawProperties extends Properties("MonoidLaws") {

  private def laws[T](name: String, gen: Gen[T])(implicit m: Monoid[T]): Unit = {
    property(s"$name associative") = forAll(gen, gen, gen) { (a, b, c) =>
      m.plus(m.plus(a, b), c) == m.plus(a, m.plus(b, c))
    }
    property(s"$name identity") = forAll(gen) { a =>
      m.plus(m.zero, a) == a && m.plus(a, m.zero) == a
    }
  }

  private val genLong = Gen.choose(-1000000L, 1000000L)
  private val genStr = Gen.alphaNumStr.map(_.take(8))

  laws("int", Gen.choose(-1000, 1000))
  laws("long", genLong)
  laws("string", genStr)
  laws("boolOr", Gen.oneOf(true, false))
  laws("list", Gen.listOf(genLong))
  laws("vector", Gen.containerOf[Vector, Long](genLong))
  laws("set", Gen.containerOf[Set, Long](genLong))
  laws("map(sum)", Gen.mapOf(Gen.zip(genStr, genLong)))
  laws("option", Gen.option(genLong))
  laws("tuple2", Gen.zip(genLong, genStr))
  laws("tuple3", Gen.zip(genLong, genStr, Gen.listOf(genLong)))
  laws("product", Gen.choose(-7L, 7L))(Monoid.product[Long])

  property("min semigroup associative+commutative") =
    forAll(genLong, genLong, genLong) { (a, b, c) =>
      val s = Semigroup.min[Long]
      s.plus(s.plus(a, b), c) == s.plus(a, s.plus(b, c)) &&
        s.plus(a, b) == s.plus(b, a) && s.plus(a, b) == math.min(a, b)
    }

  // Moments merges in floating point: associative up to rounding, and
  // any merge grouping must reproduce the direct mean/variance.
  private val genXs = Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0))
  property("moments merge = direct mean/variance (any chunking)") =
    forAll(genXs, Gen.choose(1, 5)) { (xs, nChunks) =>
      val m = Aggregators.momentsMonoid
      val merged = xs.grouped(math.max(1, xs.length / nChunks)).toList
        .map(_.foldLeft(m.zero)((b, x) =>
          m.plus(b, Aggregators.Moments(1L, x, 0.0))))
        .reduce(m.plus)
      val mean = xs.sum / xs.length
      val varPop = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      merged.count == xs.length &&
        math.abs(merged.mean - mean) < 1e-8 &&
        math.abs(merged.variance - varPop) < 1e-7
    }
}

/** The bounded top-k buffer must agree with a global sort-and-take for
  * every input and every partial/merge grouping — the property that
  * lets it ship k rows per task instead of the whole group.
  */
object TopKProperties extends Properties("SortedTake") {
  implicit private val intEnc: org.apache.spark.sql.Encoder[Int] =
    org.apache.spark.sql.Encoders.scalaInt

  property("chunked reduce+merge == sorted.take(k)") =
    forAll(Gen.listOf(Gen.choose(-1000, 1000)), Gen.choose(1, 12),
        Gen.choose(1, 6)) { (xs, k, nChunks) =>
      val agg = Aggregators.sortedTake[Int](k)
      val partials = xs.grouped(math.max(1, xs.length / nChunks)).toList
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      agg.finish(merged).toList == xs.sorted.take(k)
    }

  property("descending via ord.reverse == sorted desc take(k)") =
    forAll(Gen.listOf(Gen.choose(-1000, 1000)), Gen.choose(1, 8)) { (xs, k) =>
      val agg = {
        implicit val desc: Ordering[Int] = Ordering.Int.reverse
        Aggregators.sortedTake[Int](k)
      }
      agg.finish(xs.foldLeft(agg.zero)(agg.reduce)).toList ==
        xs.sorted(Ordering.Int.reverse).take(k)
    }
}

/** Misra-Gries guarantee: for any stream, any chunking, and any k, the
  * merged sketch (a) never overestimates, (b) underestimates by at
  * most total/(k+1), and therefore (c) contains every term with true
  * count > total/(k+1) — the property `TextAnalysis.heavyHitters`
  * relies on for its exactness claim.
  */
object FreqSketchProperties extends Properties("FreqSketch") {
  private val genStream = Gen.nonEmptyListOf(Gen.choose('a', 'f').map(_.toString))

  property("merged bounds: true-err <= lowerBound <= true") =
    forAll(genStream, Gen.choose(2, 8), Gen.choose(1, 5)) { (xs, k, nChunks) =>
      val sk = xs.grouped(math.max(1, xs.length / nChunks)).toList
        .map(_.foldLeft(FreqSketch.empty(k))(_.add(_)))
        .reduce(_.merge(_))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong)
      sk.total == xs.length &&
        truth.forall { case (x, t) =>
          val lb = sk.lowerBound(x)
          lb <= t && lb >= t - sk.errorBound
        } &&
        truth.forall { case (x, t) =>
          t <= sk.errorBound || sk.counters.contains(x)
        }
    }
}

/** Date library round-trips and algebra (reference
  * DateProperties.scala:1-123).
  */
object DateProperties extends Properties("Dates") {
  implicit private val utc: java.time.ZoneId = java.time.ZoneId.of("UTC")

  // 1970..2100, keeps LocalDateTime parsing in-range
  private val genTs = Gen.choose(0L, 4102444800000L)
  private val genDate = genTs.map(RichDate(_))

  property("format/parse round-trip at millis precision") =
    forAll(genDate) { d =>
      RichDate.parse(d.format("yyyy-MM-dd HH:mm:ss.SSS")) == d
    }

  property("date-only parse floors to midnight") =
    forAll(genDate) { d =>
      RichDate.parse(d.format("yyyy-MM-dd")) == Days(1).floorOf(d)
    }

  property("add then subtract is identity (fixed-span durations, UTC)") =
    forAll(genDate, Gen.choose(-3000, 3000)) { (d, n) =>
      // Months/Years excluded on purpose: calendar clamping (Jan 31 +
      // 1 month = Feb 28) makes them legitimately non-invertible.
      Seq[Duration](Millisecs(n), Seconds(n), Minutes(n), Hours(n),
        Days(n), Weeks(n)).forall { dur =>
        dur.subtractFrom(dur.addTo(d)) == d
      }
    }

  property("months/years addTo is monotone and lands on the same day-of-month or clamps") =
    forAll(genDate, Gen.choose(1, 36)) { (d, n) =>
      val m = Months(n).addTo(d)
      val y = Years(n).addTo(d)
      m > d && y > d && Months(n).subtractFrom(m) <= d && Years(n).subtractFrom(y) <= d
    }

  property("floorOf is idempotent, <= x, and within one unit") =
    forAll(genDate) { d =>
      Seq[Duration](Seconds(1), Minutes(1), Hours(1), Days(1), Weeks(1),
        Months(1), Years(1)).forall { u =>
        val f = u.floorOf(d)
        f <= d && u.floorOf(f) == f && u.addTo(f) > d
      }
    }

  property("DateRange.each tiles the range exactly") =
    forAll(genDate, Gen.choose(0L, 40L * 86400000L)) { (s, span) =>
      val r = DateRange(s, RichDate(s.timestamp + span))
      val parts = r.each(Days(1)).toList
      parts.nonEmpty &&
        parts.head.start == r.start && parts.last.end == r.end &&
        parts.sliding(2).forall {
          case List(a, b) => b.start.timestamp == a.end.timestamp + 1
          case _ => true
        } &&
        parts.forall(p => r.contains(p))
    }

  property("embiggen contains the original; extend keeps the start") =
    forAll(genDate, Gen.choose(0L, 86400000L), Gen.choose(1, 48)) { (s, span, h) =>
      val r = DateRange(s, RichDate(s.timestamp + span))
      r.embiggen(Hours(h)).contains(r) &&
        r.extend(Hours(h)).start == r.start &&
        r.extend(Hours(h)).contains(r)
    }

  property("difference of dates round-trips through AbsoluteDuration") =
    forAll(genTs, genTs) { (a, b) =>
      val (x, y) = (RichDate(a), RichDate(b))
      (x - y).toMillisecs == a - b
    }
}

/** Args tokenizer laws (reference ArgTest.scala). */
object ArgsProperties extends Properties("Args") {
  import org.scalacheck.Prop.propBoolean

  private val genKey = for {
    h <- Gen.alphaChar
    t <- Gen.alphaNumStr.map(_.take(6))
  } yield s"$h$t"
  private val genVal = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))

  private val genTokens: Gen[List[String]] = for {
    pos <- Gen.listOf(genVal)
    kvs <- Gen.listOf(Gen.zip(genKey, Gen.listOf(genVal)))
  } yield pos ++ kvs.flatMap { case (k, vs) => s"--$k" :: vs }

  property("toString/parse round-trip") = forAll(genTokens) { toks =>
    val a = Args(toks)
    Args(a.toString) == a
  }

  property("values attach to the most recent key") =
    forAll(genKey, genKey, genVal, genVal) { (k1, k2, v1, v2) =>
      (k1 != k2) ==> {
        val a = Args(List(s"--$k1", v1, s"--$k2", v2))
        a.list(k1) == List(v1) && a.list(k2) == List(v2) &&
          a.boolean(k1) && !a.boolean("missing")
      }
    }

  property("single-dash keys parse; negative numbers stay values") =
    forAll(genKey, Gen.choose(-999, -1)) { (k, n) =>
      val a = Args(List(s"-$k", n.toString))
      a.list(k) == List(n.toString) && a.positional.isEmpty
    }
}

/** The driver-local BPE trainer (incremental pair-count maintenance)
  * against a naive recount-everything sequential reference, over
  * randomized skew-heavy corpora on a tiny alphabet — small alphabets
  * force exactly the adversarial structures the incremental updates
  * and tie-breaks must survive: count ties, chained pairs, self-pair
  * runs, convergent merge paths.
  */
object BpeLocalProperties extends Properties("BpeLocal") {

  import graft.ml.Bpe

  private def naive(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var syms: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (Bpe.charSymbols(w).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        // tie-break with the production UTF-8 collation (Bpe.ltUtf8),
        // not Scala tuple ordering (UTF-16 `<`): they disagree on
        // supplementary-plane symbols, which genWord now produces
        val best = counts.toSeq.sortWith { case (((l1, r1), c1), ((l2, r2), c2)) =>
          c1 > c2 || (c1 == c2 && (Bpe.ltUtf8(l1, l2) ||
            (l1 == l2 && Bpe.ltUtf8(r1, r2))))
        }.head._1
        out += best
        syms = syms.map { case (s, c) =>
          (Bpe.applyMerge(s.toArray, best._1, best._2).toVector, c)
        }
      }
    }
    out.toSeq
  }

  private val genWord =
    Gen.choose(1, 7).flatMap(n =>
      // "𝕒" (U+1D552, a surrogate pair) and "�" order differently
      // under UTF-16 code-unit vs UTF-8 byte comparison — together
      // they exercise the ltUtf8 collation on count ties
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "𝕒", "�"))
        .map(_.mkString))
  private val genCorpus = Gen.mapOf(
    Gen.zip(genWord, Gen.choose(1L, 50L))).suchThat(_.nonEmpty)

  property("incremental local trainer == naive sequential reference") =
    forAll(genCorpus, Gen.choose(1, 24)) { (corpus, n) =>
      Bpe.trainLocal(corpus.toArray, n)
        .map(m => (m.left, m.right)) == naive(corpus, n)
    }
}
