package graft

/** Bench-isolation invariant: after a headline query executes and
  * [[graft.ml.Dedup.unpersistPipelineCaches]] runs (exactly what
  * Bench.scala does between timed queries), NOTHING may stay resident
  * — no persisted RDD blocks and no cached SQL plan. A leftover cache
  * squeezes executor memory for every subsequent query: a resident
  * cache set once inflated a mid-round bench measurement to 59 s
  * (round 2), and the round-5 `q_dedup_minhash` +50% drift raised the
  * same suspicion again. This spec turns the hygiene rule into a gate:
  * any future operator that persists outside PipelineCaches (or
  * forgets its own finally-unpersist) fails here, not in a bench
  * number three rounds later.
  */
class BenchHygieneSpec extends SparkSpec {

  test("no resident cache survives any headline bench query + cache drop") {
    val dir = sf("sf0.001")
    // start from a clean slate — earlier suites share the session
    graft.ml.Dedup.unpersistPipelineCaches()
    spark.sharedState.cacheManager.clearCache()
    val leaks = Bench.headline.filter(SparkEntry.queries.contains).flatMap {
      name =>
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        graft.ml.Dedup.unpersistPipelineCaches()
        val rdds = spark.sparkContext.getPersistentRDDs
        val sqlCached = !spark.sharedState.cacheManager.isEmpty
        if (rdds.nonEmpty || sqlCached) {
          // clean up so one leak doesn't cascade into every later query
          rdds.values.foreach(_.unpersist(blocking = false))
          spark.sharedState.cacheManager.clearCache()
          Some(s"$name: ${rdds.size} persistent RDDs, sqlCache=$sqlCached")
        } else None
    }
    assert(leaks.isEmpty,
      s"resident caches after bench cache-drop:\n  ${leaks.mkString("\n  ")}")
  }
}
