package graft

/** Bench-isolation invariant: after a headline query executes and
  * [[graft.ml.Dedup.unpersistPipelineCaches]] runs (exactly what
  * Bench.scala does between timed queries), the query must leave NO
  * NEW resident RDD blocks behind. A leftover cache squeezes executor
  * memory for every subsequent query: a resident cache set once
  * inflated a mid-round bench measurement to 59 s (round 2), and the
  * round-5 `q_dedup_minhash` +50% drift raised the same suspicion
  * again. This spec turns the hygiene rule into a gate: any future
  * operator that persists outside PipelineCaches (or forgets its own
  * finally-unpersist) fails here, not in a bench number three rounds
  * later.
  *
  * The check is a per-query DELTA of `sc.getPersistentRDDs`, not
  * global emptiness: the suite shares one SparkSession with every
  * other spec, and earlier suites legitimately leave session-lifetime
  * residents (e.g. `localCheckpoint` blocks) that are not this
  * spec's business. In Bench's own JVM the session starts clean, so
  * delta-clean there IS globally clean.
  */
class BenchHygieneSpec extends SparkSpec {

  test("no headline bench query leaves a new resident cache after the cache drop") {
    val dir = sf("sf0.001")
    // best-effort baseline cleanup of droppable state
    graft.ml.Dedup.unpersistPipelineCaches()
    spark.sharedState.cacheManager.clearCache()
    val leaks = Bench.headline.filter(SparkEntry.queries.contains).flatMap {
      name =>
        val before = spark.sparkContext.getPersistentRDDs.keySet
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        graft.ml.Dedup.unpersistPipelineCaches()
        val after = spark.sparkContext.getPersistentRDDs
        val leaked = after.filterNot { case (id, _) => before.contains(id) }
        if (leaked.nonEmpty) {
          // clean up so one leak doesn't cascade into every later query
          leaked.values.foreach(_.unpersist(blocking = false))
          Some(s"$name: ${leaked.size} new persistent RDDs " +
            leaked.values.map(_.toString).mkString("[", "; ", "]"))
        } else None
    }
    assert(leaks.isEmpty,
      s"resident caches after bench cache-drop:\n  ${leaks.mkString("\n  ")}")
  }
}
