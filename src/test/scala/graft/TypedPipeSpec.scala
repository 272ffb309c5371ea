package graft

import graft.typed.TypedPipe
import graft.agg.Monoid

/** Typed API semantics over in-memory data — the JobTest-analog
  * harness (reference TypedPipeTest.scala:28-448, CoreTest scan/fold
  * tests :950-1036 are the secondary-sort oracle).
  */
class TypedPipeSpec extends SparkSpec {

  private def pipe[T: org.apache.spark.sql.Encoder](xs: Seq[T]) =
    TypedPipe.from(spark, xs)

  test("map/filter/flatMap/distinct/union") {
    import spark.implicits._
    val p = pipe(Seq(1, 2, 3, 4))
    assert(p.map(_ * 2).ds.collect().sorted.toSeq == Seq(2, 4, 6, 8))
    assert(p.filter(_ % 2 == 0).ds.collect().sorted.toSeq == Seq(2, 4))
    assert(p.flatMap(x => Seq(x, x)).ds.count() == 8)
    assert((p ++ p).distinct.ds.collect().sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("sortedTake output is a Catalyst array column, not kryo binary") {
    import org.apache.spark.sql.functions.{col, element_at, size}
    import spark.implicits._
    val p = pipe(Seq(("a", 3), ("a", 1), ("a", 2), ("b", 5)))
    val top = p.group[String, Int].sortedTake(2).toDF("k", "top")
    val dt = top.schema("top").dataType
    assert(dt.isInstanceOf[org.apache.spark.sql.types.ArrayType], dt.toString)
    // downstream Column ops run directly — no typed deserialization
    val rows = top.select(col("k"), size(col("top")).as("n"),
      element_at(col("top"), 1).as("first"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    assert(rows.toSeq == Seq(("a", 2, 1), ("b", 1, 5)))
  }

  test("tryMap/tryFlatMap route throwing rows to the trap " +
      "(reference CoreTest ItsATrapTest scenario)") {
    import spark.implicits._
    // CoreTest.scala:1366-1399: map throws on x == 1; output keeps
    // the non-throwing rows, trap gets the original input rows.
    val input = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 1), ("e", 2))
    val (good, trapped) = pipe(input).tryMap { case (letter, x) =>
      if (x == 1) throw new Exception("Erroneous Ones")
      else (letter, x, x)
    }
    assert(good.ds.collect().sorted.toSeq ==
      Seq(("b", 2, 2), ("c", 3, 3), ("e", 2, 2)))
    val t = trapped.ds.collect().sortBy(_._1._1)
    assert(t.map(_._1).toSeq == Seq(("a", 1), ("d", 1)))
    assert(t.forall(_._2 == "Erroneous Ones"))
    // tryFlatMap: a lazily-throwing iterator still traps the row
    val (g2, t2) = pipe(Seq(1, 2, 3)).tryFlatMap { x =>
      Iterator.tabulate(2)(i =>
        if (x == 2 && i == 1) throw new Exception("late") else x + i)
    }
    assert(g2.ds.collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(t2.ds.collect().toSeq == Seq((2, "late")))
  }

  test("group sum with monoid (wordcount shape)") {
    import spark.implicits._
    val words = pipe(Seq("a b", "b c", "c b")).flatMap(_.split(" ").toSeq)
    val counts = words.map((_, 1L)).group[String, Long]
      .sum(Monoid.longMonoid).ds.collect().toMap
    assert(counts == Map("a" -> 1L, "b" -> 3L, "c" -> 2L))
  }

  test("group reduce / max / min / size / toList / toSet") {
    import spark.implicits._
    val kvs = pipe(Seq(("k1", 3), ("k1", 1), ("k2", 5), ("k1", 2)))
      .group[String, Int]
    assert(kvs.reduce(_ + _).ds.collect().toMap == Map("k1" -> 6, "k2" -> 5))
    assert(kvs.max.ds.collect().toMap == Map("k1" -> 3, "k2" -> 5))
    assert(kvs.min.ds.collect().toMap == Map("k1" -> 1, "k2" -> 5))
    assert(kvs.size.ds.collect().toMap == Map("k1" -> 3L, "k2" -> 1L))
    val lists = kvs.toList.ds.collect().toMap
    assert(lists("k1").sorted == List(1, 2, 3))
    val sets = kvs.toSet.ds.collect().toMap
    assert(sets("k2") == Set(5))
  }

  test("sortedTake is a bounded per-key top-k") {
    import spark.implicits._
    val kvs = pipe((1 to 100).map(i => (i % 3, i))).group[Int, Int]
    val smallest = kvs.sortedTake(4).ds.collect().toMap
    assert(smallest(0) == Seq(3, 6, 9, 12))
    assert(smallest(1) == Seq(1, 4, 7, 10))
    val largest = kvs.sortedReverseTake(2).ds.collect().toMap
    assert(largest(0) == Seq(99, 96))
  }

  test("secondary-sorted scanLeft/foldLeft/take preserve value order") {
    import spark.implicits._
    // values arrive shuffled; sortBy must restore per-key order
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle((1 to 50).map(i => ("k" + (i % 4), i)).toList)
    val g = pipe(data).group[String, Int].sortBy(identity)
    val folded = g.foldLeft(List.empty[Int])((acc, v) => v :: acc)
      .ds.collect().toMap
    folded.foreach { case (k, vs) =>
      assert(vs.reverse == vs.reverse.sorted, s"unsorted fold for $k")
    }
    val scans = g.scanLeft(0)((acc, v) => acc + v).ds.collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    // running sums must be strictly increasing (values positive+sorted)
    scans.foreach { case (_, sums) => assert(sums == sums.sorted) }
    val takes = pipe(data).group[String, Int].sortBy(identity).take(2)
      .ds.collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    assert(takes("k1") == List(1, 5))
  }

  test("sortBy.reverse iterates values in descending order") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = rnd.shuffle((1 to 40).map(i => ("k" + (i % 3), i)).toList)
    val folded = pipe(data).group[String, Int].sortBy(identity).reverse
      .foldLeft(List.empty[Int])((acc, v) => v :: acc)
      .ds.collect().toMap
    folded.foreach { case (k, vs) =>
      // fold prepends, so the accumulated list is the reverse of the
      // iteration order: descending iteration ⇒ ascending list
      assert(vs == vs.sorted, s"reverse sort not honored for $k: $vs")
    }
    val heads = pipe(data).group[String, Int].sortBy(identity).reverse.head
      .ds.collect().toMap
    assert(heads("k0") == 39 && heads("k1") == 40 && heads("k2") == 38)
  }

  test("typed joins: inner/left/outer/hash/cogroup") {
    import spark.implicits._
    val l = pipe(Seq((1, "a"), (2, "b"), (3, "c"))).group[Int, String]
    val r = pipe(Seq((2, 20.0), (3, 30.0), (4, 40.0))).group[Int, Double]
    assert(l.join(r).ds.collect().toMap ==
      Map(2 -> ("b", 20.0), 3 -> ("c", 30.0)))
    val left = l.leftJoin(r).ds.collect().toMap
    assert(left(1) == ("a", None) && left(2) == ("b", Some(20.0)))
    val outer = l.outerJoin(r).ds.collect().toMap
    assert(outer(4) == (None, Some(40.0)))
    assert(outer(1) == (Some("a"), None))
    assert(l.hashJoin(r).ds.collect().toMap ==
      Map(2 -> ("b", 20.0), 3 -> ("c", 30.0)))
    val co = l.cogroup(r) { (_, ls, rs) =>
      Iterator.single(ls.size + rs.size)
    }.ds.collect().toMap
    assert(co == Map(1 -> 1, 2 -> 2, 3 -> 2, 4 -> 1))
  }

  test("self-join of the same grouped pipe (SURVEY §7.5 risk 6)") {
    import spark.implicits._
    val g = pipe(Seq((1, "a"), (2, "b"))).group[Int, String]
    val selfed = g.join(g).ds.collect().toMap
    assert(selfed == Map(1 -> ("a", "a"), 2 -> ("b", "b")))
  }

  test("cross with tiny side") {
    import spark.implicits._
    val a = pipe(Seq(1, 2, 3))
    val b = pipe(Seq("x", "y"))
    assert(a.cross(b).ds.count() == 6)
  }
}
