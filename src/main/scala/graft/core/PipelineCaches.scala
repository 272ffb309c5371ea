package graft.core

import org.apache.spark.sql.DataFrame

/** Session-level registry of pipeline-internal persists. Multi-pass
  * operators (self-joins of derived inputs, LSH discover+verify) cache
  * their shared intermediate so it computes once; Spark evicts blocks
  * LRU under pressure, but long-lived sessions should drop them
  * eagerly once a pipeline's results are consumed.
  */
object PipelineCaches {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** Unpersist every tracked cache (results already computed stay
    * valid; re-running a returned plan recomputes its scan).
    */
  def unpersistAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
  }
}
