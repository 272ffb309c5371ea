package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}

/** Session-level registry of pipeline-internal persists. Multi-pass
  * operators (self-joins of derived inputs, LSH discover+verify,
  * k-means training loops) cache their shared intermediate so it
  * computes once; Spark evicts blocks LRU under pressure, but
  * long-lived sessions should drop them eagerly once a pipeline's
  * results are consumed.
  */
object PipelineCaches {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()
  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.rdd.RDD[_]]()
  private val clearHooks =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Track a directly-persisted RDD (the lineage-truncation path —
    * [[org.apache.spark.sql.graft.Lineage.truncateTracked]] — persists
    * at the RDD level where Dataset.unpersist can't reach).
    */
  def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    trackedRdds.add(rdd)

  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** Typed variant — multi-pass kernels (IVF training + list build)
    * cache the decoded Dataset so each Lloyd iteration and the list
    * scan read memory, not parquet.
    */
  def persistTrackedDs[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist()
    tracked.add(p)
    p
  }

  /** Register a callback run by [[unpersistAll]] — for operator-local
    * memo tables (e.g. trained centroids) that must not outlive the
    * pipeline's cache scope.
    */
  def onClear(hook: () => Unit): Unit = clearHooks.add(hook)

  /** Unpersist every tracked cache (results already computed stay
    * valid; re-running a returned plan recomputes its scan).
    */
  def unpersistAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      rdd.unpersist(blocking = false)
      rdd = trackedRdds.poll()
    }
    clearHooks.forEach(h => h())
  }
}
