package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `private[spark]` scheduler internals — one method, for
  * one consumer: graft.Explain's stage-level shuffle audit registers a
  * SparkListener and reads its counters right after each query's
  * action returns, but the listener bus delivers events
  * ASYNCHRONOUSLY — without a drain the audit races the bus and
  * undercounts nondeterministically. Lives under `org.apache.spark`
  * solely to satisfy the `private[spark]` qualifier (the
  * GraftColumns pattern); contains no Spark code.
  */
object GraftScheduler {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Whether a completed stage was a shuffle-MAP stage (it produced
    * shuffle output for a downstream exchange) — `StageInfo.
    * shuffleDepId` is `private[spark]`, hence bridged here. */
  def isShuffleMapStage(info: org.apache.spark.scheduler.StageInfo): Boolean =
    info.shuffleDepId.isDefined
}
