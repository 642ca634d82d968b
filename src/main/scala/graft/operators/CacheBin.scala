package graft.operators

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for operator-persisted frames (round-5 advice: the
  * Dedup/Knn `materialize` persists — MEMORY_AND_DISK, so NOT evicted by
  * block-manager LRU once spilled — were never unpersisted, accumulating
  * for the life of the SparkContext in a long-lived session running many
  * operators).
  *
  * Operators register every persist here at plan-BUILD time; the frame
  * must stay cached until the caller's consuming ACTION finishes (the
  * whole point of the persist is that two join sides read it), so the
  * operator itself can never unpersist. The CALLER owns the release:
  * `CacheBin.drain()` after the action — Verify drains per query,
  * Bench's `clearCache()` is the blunt equivalent, and a production
  * session drains between operator invocations. Draining is always safe:
  * an in-flight plan re-computes the frame instead of crashing.
  */
object CacheBin {

  private val bin = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** register a frame the operator just persisted; returns it. */
  def track(df: DataFrame): DataFrame = { bin.add(df); df }

  /** unpersist (non-blocking) every tracked frame; returns how many. */
  def drain(): Int = {
    var n = 0
    var df = bin.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      n += 1
      df = bin.poll()
    }
    n
  }

  /** tracked-but-not-yet-drained count (spec hook). */
  def pending: Int = bin.size
}
