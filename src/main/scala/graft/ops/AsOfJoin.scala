package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: each left row picks the most recent right row of
  * the same key whose time is <= the left row's time (the point-in-time /
  * "last known value" join every feature-backfill and event-attribution
  * pipeline needs; DuckDB spells it ASOF JOIN).
  *
  * Formulated without a join at all: tag and union the two sides, then one
  * window per key ordered by (time, side, tie-break) carries the latest
  * right payload forward onto each left row via `last(_, ignoreNulls)`.
  * Cost at 100 TB: exactly one hash shuffle of each side on the key plus a
  * per-partition sort — the same lower bound as a sort-merge join — with NO
  * join explosion (a key with L lefts and R rights contributes L+R rows,
  * never L*R) and no per-key state beyond the sort. The window frame is
  * running (unboundedPreceding..currentRow), which Spark's WindowExec
  * streams in one pass without buffering the partition.
  */
object AsOfJoin {

  /** As-of join `left` to `right` on equal `keys` with
    * `right(rightTime) <= left(leftTime)` (both sides' time columns must be
    * mutually comparable: both numeric epoch values or both timestamps).
    *
    * Matching is LEFT OUTER: unmatched left rows keep null right columns
    * (pass `inner = true` to drop them). Among right rows sharing the
    * winning time, the one with the greatest `rightTieBreak` value wins —
    * pass a unique column for deterministic results (retried stages then
    * rebuild identical output; an arbitrary pick would not be stable under
    * partial recompute). `toleranceMatches` optionally bounds the lookback:
    * a match older than `tolerance` (in the time columns' own units) is
    * discarded — the left row survives with nulls, as if never matched.
    *
    * Output: every left column, then every non-key right column (including
    * `rightTime`, the matched row's own time); right column names must not
    * collide with left's (rename before calling — a silent overwrite would
    * mask bugs). Null-time right rows never match anything; null-time left
    * rows match nothing (unknown time = no point-in-time). */
  def asof(left: DataFrame, right: DataFrame, leftTime: String, rightTime: String,
      keys: Seq[String], rightTieBreak: Option[String] = None,
      tolerance: Long = -1L, inner: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val rightPayloadCols = right.columns.filterNot(keys.contains).toIndexedSeq
    require(rightPayloadCols.contains(rightTime), s"rightTime '$rightTime' missing from right side")
    val collisions = left.columns.toSet.intersect(rightPayloadCols.toSet)
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: ${collisions.mkString(", ")} — rename first")
    rightTieBreak.foreach(tb => require(rightPayloadCols.contains(tb),
      s"rightTieBreak '$tb' must be a non-key right column"))

    val leftPayloadCols = left.columns.filterNot(keys.contains).toIndexedSeq
    // one struct carries the whole right payload through the window, so the
    // running `last` is a single expression regardless of payload width
    val rStruct = struct(rightPayloadCols.map(right(_)): _*)

    // union layout: keys, _t, _tag (0 = right sorts before left at equal
    // time => inclusive <=), _r (right payload struct), left payload
    val rightSide = right.select(
      keys.map(right(_)) ++ Seq(right(rightTime).as("_t"), lit(0).as("_tag"),
        rStruct.as("_r")) ++ leftPayloadCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
      .filter(col("_t").isNotNull) // a right row without a time can never be "most recent"
    val leftSide = left.select(
      keys.map(left(_)) ++ Seq(left(leftTime).as("_t"), lit(1).as("_tag"),
        lit(null).cast(rightSide.schema("_r").dataType).as("_r")) ++ leftPayloadCols.map(left(_)): _*)
    val unioned = rightSide.unionByName(leftSide)

    // equal-time right rows: ascending tie-break + running `last` picks the
    // greatest — deterministic, and mirrors "ORDER BY t DESC, tb DESC LIMIT 1"
    val ordering: Seq[Column] = col("_t").asc +: col("_tag").asc +:
      rightTieBreak.map(tb => col("_r").getField(tb).asc_nulls_first).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("_r"), ignoreNulls = true).over(w)
    val matched =
      if (tolerance < 0) matchedRaw
      else when(matchedRaw.getField(rightTime) >= col("_t") - lit(tolerance), matchedRaw)
    val annotated = unioned.withColumn("_m", matched).filter(col("_tag") === 1)
    val out = annotated.select(
      keys.map(col) ++ leftPayloadCols.map(col) ++
        rightPayloadCols.map(c => col("_m").getField(c).as(c)): _*)
    if (inner) out.filter(col(rightTime).isNotNull) else out
  }
}
