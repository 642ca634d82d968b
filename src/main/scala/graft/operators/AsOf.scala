package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
               timeCol: String, rightTieCol: String): DataFrame = {
    val lPay = left.columns.filterNot(c => c == keyCol || c == timeCol)
    val rPay = right.columns.filterNot(c => c == keyCol || c == timeCol)
    val shared = lPay.toSet intersect rPay.toSet
    require(shared.isEmpty, s"column names collide across sides: $shared")
    require(rPay.contains(rightTieCol) || rightTieCol == timeCol,
      s"tie column $rightTieCol must be a right-side column")

    val rStruct = struct(rPay.map(col).toIndexedSeq: _*)
    val r = right.select(col(keyCol), col(timeCol), lit(0).as("__side"),
      col(rightTieCol).cast("long").as("__tie"), rStruct.as("__rpay"))
    val lStruct = struct(lPay.map(col).toIndexedSeq: _*)
    val rPayType = r.schema("__rpay").dataType
    val l = left.select(col(keyCol), col(timeCol), lit(1).as("__side"),
      lit(null).cast("long").as("__tie"), lit(null).cast(rPayType).as("__rpay"),
      lStruct.as("__lpay"))
    val rAligned = r.withColumn("__lpay",
      lit(null).cast(l.schema("__lpay").dataType))

    // left rows carry a null tie: Spark orders nulls FIRST ascending, but
    // side already separates the sides at equal time, so the tie only
    // disambiguates right-vs-right — exactly where it is non-null
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rAligned.unionByName(l)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outCols =
      col(keyCol) +: col(timeCol) +:
        (lPay.map(c => col(s"__lpay.$c").as(c)) ++
         rPay.map(c => col(s"__match.$c").as(c)))
    matched.select(outCols.toIndexedSeq: _*)
  }
}
