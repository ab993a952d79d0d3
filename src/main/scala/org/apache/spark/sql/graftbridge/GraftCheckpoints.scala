package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the `LogicalRDD` behind an eagerly localCheckpoint'ed
  * Dataset — one method, for one shape: iterative operators (q36
  * pagerank is the canonical case) cut lineage by re-checkpointing a
  * node-sized frame per round, and the PREVIOUS round's storage blocks
  * stay pinned for the application lifetime even though no plan will
  * ever read them again. The r16 memory probe measured exactly that
  * retained-block term as part of q36's completion floor; releasing
  * each round's blocks once the next round is materialized shrinks the
  * concurrent storage demand to two rank vectors regardless of
  * iteration count.
  *
  * CONTRACT: callers must only release a frame that (a) was returned
  * by an EAGER `localCheckpoint(true)` and (b) has no remaining
  * consumer — a local checkpoint truncates lineage, so a released
  * frame cannot be recomputed; a later read would fail loudly with a
  * missing-block error, not silently recompute.
  *
  * Lives under `org.apache.spark.sql` solely to satisfy the
  * `private[sql]` qualifier (the GraftColumns pattern); contains no
  * Spark code.
  */
object GraftCheckpoints {
  /** Free the storage blocks behind an eagerly localCheckpoint'ed
    * Dataset (no-op for any other plan shape). Non-blocking. */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
