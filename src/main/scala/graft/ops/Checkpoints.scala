package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative operators: `localCheckpoint()` caps
  * lineage by materializing each round into cached RDD blocks, but the
  * blocks of SUPERSEDED rounds stay in storage memory until the session
  * ends — across a 121-query verify/bench sweep that monotonic growth
  * turns into eviction/GC pressure that inflates every later query.
  * Each loop therefore releases round N−1's blocks as soon as round N
  * is materialized (the final round is kept: the returned plan reads
  * it).
  */
object Checkpoints {

  /** Unpersist the cached blocks behind a `localCheckpoint()`ed
    * DataFrame (non-blocking; no-op for any other plan shape). Callers
    * must only release checkpoints whose successors are already
    * materialized — the blocks are the data. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
