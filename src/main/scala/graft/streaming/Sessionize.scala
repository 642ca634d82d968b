package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sessionization: gap-based sessions over the events table.
  *
  * Batch flavor: window functions (lag → gap flag → running sum) — one
  * shuffle on user_id; exact, reproducible, DuckDB-oracle-checkable (q26).
  *
  * Streaming flavor: Spark's native `session_window` aggregation — the
  * state-store-backed scale path. Unlike a flatMapGroupsWithState that
  * buffers and sorts each user's events in memory (a hot user OOMs a
  * task), session windows merge incrementally in the state store, spill
  * via the state-store backend, and evict on the event-time watermark.
  *
  * Gap parity: the reference/batch rule SPLITS when `ts - prev > gap`
  * (boundary ties merge). Spark's session merge is boundary-INCLUSIVE
  * (windows merge when next.start ≤ prev.end), so merge ⇔ diff ≤ gap —
  * identical to the reference rule with the plain gap.
  */
object Sessionize {

  val GapUs: Long = 1800L * 1000000 // 30 min

  val WindowGap: String = s"$GapUs microseconds"

  /** batch: (user_id, session_id, n_events, t_start_us, t_end_us). */
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

  /** the shared session_window aggregation: works on a static frame AND on
    * a stream (callers add the watermark first for streaming). Emits
    * (user_id, n_events, t_start_us, t_end_us); the window end is
    * last_event + gap, so t_end_us subtracts the gap back out.
    */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), WindowGap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        unix_micros(col("w.start")).as("t_start_us"),
        (unix_micros(col("w.end")) - GapUs).as("t_end_us"))

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class SessionOut(user_id: Long, n_events: Long, t_start_us: Long, t_end_us: Long)

  /** streaming: session_window over event time with a watermark — sessions
    * finalize (and emit, in append mode) once the watermark passes their
    * close; state is bounded by the watermark, not by user fan-in.
    */
  def streaming(spark: SparkSession, events: Dataset[Ev],
                watermarkDelay: String = "0 seconds"): DataFrame = {
    val ts = events.toDF()
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))
      .withWatermark("ts", watermarkDelay)
    sessionWindowAgg(ts)
  }

  /** bounded-input equivalent of the streaming flavor: the same
    * session_window aggregation run as a batch query (no state, no sort
    * buffers) — used by tests to prove stream/batch parity.
    */
  def batchEquivalentViaStreaming(spark: SparkSession, events: DataFrame): DataFrame =
    sessionWindowAgg(
      events.select(col("user_id").cast("long").as("user_id"), col("ts").cast("timestamp").as("ts")))
}
