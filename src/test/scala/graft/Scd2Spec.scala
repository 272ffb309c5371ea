package graft

import org.apache.spark.sql.functions._
import graft.sources.Scd2

/** SCD2 history: rebuild, delta merge idempotence, point-in-time. */
class Scd2Spec extends SparkSpec {

  test("fromEvents collapses unchanged runs and intervals abut") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "bronze"), (1L, 30L, "silver"),
      (1L, 40L, "silver"), (1L, 50L, "gold"),
      (2L, 5L, "gold")).toDF("k", "ts", "tier")
    val got = Scd2.fromEvents(ev, Seq("k"), Seq("tier"), "ts")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._3))
    assert(got.toSeq == Seq(
      (1L, "bronze", 10L, Some(30L)),
      (1L, "silver", 30L, Some(50L)),
      (1L, "gold", 50L, None),
      (2L, "gold", 5L, None)))
  }

  test("applyDelta merges out-of-order observations; rebuild is idempotent") {
    import spark.implicits._
    val ev = Seq((1L, 10L, "bronze"), (1L, 50L, "gold"))
      .toDF("k", "ts", "tier")
    val current = Scd2.fromEvents(ev, Seq("k"), Seq("tier"), "ts")
    // a LATE-arriving middle observation splits the first interval
    val delta = Seq((1L, 30L, "silver")).toDF("k", "ts", "tier")
    val merged = Scd2.applyDelta(current, delta, Seq("k"), Seq("tier"), "ts")
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).sortBy(_._2)
    assert(merged.toSeq == Seq(
      ("bronze", 10L, Some(30L)),
      ("silver", 30L, Some(50L)),
      ("gold", 50L, None)))
    // applying an empty delta leaves the table unchanged (idempotent)
    val again = Scd2.applyDelta(
        Scd2.applyDelta(current, delta, Seq("k"), Seq("tier"), "ts"),
        delta.limit(0), Seq("k"), Seq("tier"), "ts")
      .collect().map(r => (r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).sortBy(_._2)
    assert(again.toSeq == merged.toSeq)
  }

  test("asOf returns the version valid at the timestamp") {
    import spark.implicits._
    val ev = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "z"))
      .toDF("k", "ts", "v")
    val hist = Scd2.fromEvents(ev, Seq("k"), Seq("v"), "ts")
    def at(ts: Long) = Scd2.asOf(hist, ts).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at(12L) == Map(1L -> "a"))
    assert(at(20L) == Map(1L -> "b", 2L -> "z"))
    assert(at(5L) == Map.empty[Long, String])
  }

  test("applyCdc: upserts, deletes, base passthrough, replay idempotence") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "attr", "v")
    val changes = Seq(
      (1L, "a2", 1.5, 10L, 1L, "u"),  // update key 1
      (1L, "a3", 1.7, 10L, 2L, "u"),  // same ts: tie-break on id
      (2L, "b", 2.0, 11L, 3L, "d"),   // delete key 2
      (4L, "d", 4.0, 12L, 4L, "u"),   // insert new key 4
      (5L, "e", 5.0, 13L, 5L, "u"),   // insert then delete key 5
      (5L, "e", 5.0, 14L, 6L, "d"))
      .toDF("k", "attr", "v", "ts", "id", "op")
    val got = Scd2.applyCdc(base, changes, Seq("k"), "ts", "op",
        tieCols = Seq("id")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(1L -> (("a3", 1.7)), 3L -> (("c", 3.0)),
      4L -> (("d", 4.0))), s"got $got")
    // replaying the same log over the result is a no-op for the keys
    // it already settled (op rows reassert the same final state)
    val replay = Scd2.applyCdc(
        Scd2.applyCdc(base, changes, Seq("k"), "ts", "op", Seq("id")),
        changes, Seq("k"), "ts", "op", Seq("id")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(replay == got)
    intercept[IllegalArgumentException](
      Scd2.applyCdc(base, changes, Seq.empty, "ts", "op"))
  }

  test("duplicate timestamps resolve last-writer-wins on the tie column") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 100L, "x"), (1L, 10L, 101L, "y"),
      (1L, 20L, 102L, "y")).toDF("k", "ts", "seq", "v")
    val got = Scd2.fromEvents(ev, Seq("k"), Seq("v"), "ts",
        tieCols = Seq("seq"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    // seq 101 ("y") wins at ts 10; the ts-20 "y" is an unchanged run
    assert(got.toSeq == Seq(("y", 10L)))
  }
}
