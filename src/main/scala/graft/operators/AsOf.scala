package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** As-of (point-in-time) join — for each left row, the LATEST right row
  * with the same key and `time` ≤ the left row's time. The classic
  * Spark-lacking operator (feature-store lookups, price-at-event-time,
  * latest-config-at-ingest).
  *
  * Built as the UNION-WINDOW form, not a join: tag right rows side=0 and
  * left rows side=1, union, and take `last(payload, ignoreNulls)` over
  * the key partition ordered by (time, side, tie) with an
  * unbounded-preceding→current frame. ONE shuffle on the key, no join,
  * no per-row range probe — each partition is a single ordered sweep, so
  * at 10¹² rows the cost is exactly a sort-shuffle of left+right
  * (an equi-join formulation needs the same shuffle PLUS a per-left-row
  * backward scan or a range-join explosion).
  *
  * Tie rules (pinned, oracle-reproducible): a right row AT the left
  * row's exact time matches ("at or before" — side 0 sorts before
  * side 1); among right rows sharing (key, time), the one with the
  * largest `rightTieCol` wins.
  *
  * Contract: `left` and `right` both carry `keyCol` and `timeCol` under
  * those names; every other column name is disjoint across sides. Output
  * = all left columns + right's payload columns (null when no right row
  * precedes the left row — filter `isNotNull` on a payload column for
  * the inner form).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, rightTieCol: String): DataFrame =
    asofCore(left, right, keyCol, timeCol, rightTieCol, horizonMicros = None)

  /** Bounded-lookback as-of join: the latest right row with
    * `left.time − horizon ≤ right.time ≤ left.time` — real feature-store
    * semantics (a feature older than the freshness horizon must read as
    * MISSING, not silently stale). Same tie rules, same SINGLE key
    * shuffle: the sweep carries the matched row's time alongside its
    * payload, and one more window-free predicate nulls matches outside
    * the horizon — the latest-overall match is in-horizon iff ANY match
    * is, so no second lookback is needed.
    *
    * `horizon` is in MICROSECONDS for timestamp time columns (compared
    * via `unix_micros` — exact int64, no float epoch rounding) and in the
    * column's own units for numeric ones. horizon ≥ 0; 0 keeps only
    * exact-time matches.
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame, keyCol: String,
                     timeCol: String, rightTieCol: String,
                     horizon: Long): DataFrame = {
    require(horizon >= 0, s"horizon must be >= 0, got $horizon")
    asofCore(left, right, keyCol, timeCol, rightTieCol, Some(horizon))
  }

  /** time as an exactly-comparable int64/numeric column: timestamps via
    * unix_micros (int64 microseconds — DuckDB's epoch_us is the lockstep
    * twin), numerics as-is.
    */
  private def timeNum(df: DataFrame, timeCol: String): Column =
    df.schema(timeCol).dataType match {
      case TimestampType => unix_micros(col(timeCol))
      // NTZ (how parquet timestamps without UTC adjustment read in Spark 4):
      // do NOT cast through TimestampType — that embeds the session-zone
      // offset AT EACH VALUE, and across a DST transition in a
      // DST-observing session zone the left and matched right rows get
      // DIFFERENT offsets, skewing the horizon subtraction by up to an
      // hour (round-6 advice). Derive the wall-clock epoch micros from
      // zone-free date/time fields instead: datediff/hour/minute are
      // zone-independent on NTZ, and extract(SECOND) is an exact
      // DECIMAL(8,6) carrying the microsecond fraction.
      case TimestampNTZType =>
        val t = col(timeCol)
        datediff(t.cast(org.apache.spark.sql.types.DateType),
            lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") * lit(86400000000L) +
          hour(t).cast("long") * lit(3600000000L) +
          minute(t).cast("long") * lit(60000000L) +
          expr(s"CAST(extract(SECOND FROM `$timeCol`) * 1000000 AS BIGINT)")
      case _ => col(timeCol)
    }

  private def asofCore(left: DataFrame, right: DataFrame, keyCol: String,
                       timeCol: String, rightTieCol: String,
                       horizonMicros: Option[Long]): DataFrame = {
    val lPay = left.columns.filterNot(c => c == keyCol || c == timeCol)
    val rPay = right.columns.filterNot(c => c == keyCol || c == timeCol)
    val shared = lPay.toSet intersect rPay.toSet
    require(shared.isEmpty, s"column names collide across sides: $shared")
    require(rPay.contains(rightTieCol) || rightTieCol == timeCol,
      s"tie column $rightTieCol must be a right-side column")

    val rStruct = struct(rPay.map(col).toIndexedSeq: _*)
    val r = right.select(col(keyCol), col(timeCol), lit(0).as("__side"),
      col(rightTieCol).cast("long").as("__tie"),
      timeNum(right, timeCol).as("__rtime"), rStruct.as("__rpay"))
    val lStruct = struct(lPay.map(col).toIndexedSeq: _*)
    val rPayType = r.schema("__rpay").dataType
    val rtType = r.schema("__rtime").dataType
    val l = left.select(col(keyCol), col(timeCol), lit(1).as("__side"),
      lit(null).cast("long").as("__tie"), lit(null).cast(rtType).as("__rtime"),
      lit(null).cast(rPayType).as("__rpay"), lStruct.as("__lpay"))
    val rAligned = r.withColumn("__lpay",
      lit(null).cast(l.schema("__lpay").dataType))

    // left rows carry a null tie: Spark orders nulls FIRST ascending, but
    // side already separates the sides at equal time, so the tie only
    // disambiguates right-vs-right — exactly where it is non-null
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = rAligned.unionByName(l)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .withColumn("__mtime", last(col("__rtime"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    // horizon: the latest match's time rides the sweep; a stale match
    // reads as no match (all payload columns null, like the outer form)
    val matched = horizonMicros match {
      case None => swept
      case Some(h) =>
        val fresh = col("__mtime").isNotNull &&
          timeNum(left, timeCol) - col("__mtime") <= h
        swept.withColumn("__match",
          when(fresh, col("__match")).otherwise(lit(null).cast(rPayType)))
    }

    val outCols =
      col(keyCol) +: col(timeCol) +:
        (lPay.map(c => col(s"__lpay.$c").as(c)) ++
         rPay.map(c => col(s"__match.$c").as(c)))
    matched.select(outCols.toIndexedSeq: _*)
  }
}
