package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Dataset, SparkSession}

/** Release-on-next-call registry for eagerly localCheckpoint'ed frames
  * that a query RETURNS (and therefore cannot release before its
  * caller materializes the result).
  *
  * The release discipline the iterative operators carry (checkpoint →
  * consume → `GraftCheckpoints.releaseLocalCheckpoint`) does not fit
  * operators whose returned frame reads a checkpoint lazily (t16's tf,
  * d14's shingle frames, c30's flag frame, the linkage candidate
  * cuts): their blocks stayed pinned for the application lifetime, one
  * generation per CALL — a 5-run bench sweep accumulated five
  * generations of every such frame (r17 advice #3). Swapping a lease
  * bounds that to ONE live generation per (session, operator): call
  * N+1 releases call N's blocks before checkpointing its own.
  *
  * CONTRACT (documented at every use site): the frame returned by call
  * N of an operator is readable until call N+1 of the SAME operator on
  * the SAME session; a later read of the stale frame fails loudly with
  * a missing-block error (localCheckpoint truncates lineage), never
  * silently recomputes. The gate/bench/verify harnesses — and any
  * reasonable caller — fully materialize a query before re-invoking
  * it. Keyed by session IDENTITY (not applicationId): sibling sessions
  * of one SparkContext must not release each other's frames (the
  * Tables.scanPartsCache argument).
  */
object CheckpointLease {
  private val live = new ConcurrentHashMap[String, Seq[Dataset[_]]]()

  /** Release the frames leased under (session, tag) by the previous
    * call and lease `frames` until the next swap with the same tag. */
  def swap(s: SparkSession, tag: String, frames: Dataset[_]*): Unit = {
    val k = System.identityHashCode(s).toString + "/" + tag
    val prev =
      if (frames.isEmpty) live.remove(k)
      else live.put(k, frames)
    Option(prev).foreach(_.foreach(
      org.apache.spark.sql.graftbridge.GraftCheckpoints.releaseLocalCheckpoint))
  }
}
