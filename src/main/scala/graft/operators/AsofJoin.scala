package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Generic backward as-of join — the tick-data primitive behind query
 * `q08_asof_last_order`, packaged as a reusable operator: for every left row,
 * attach the single latest right row whose time is at-or-before the left
 * row's time, within the same equi-key group.
 *
 * Scalable formulation (the one that survives 100 TB): instead of joining
 * every left row to every earlier right row of its key (quadratic per key)
 * and ranking, both inputs are UNIONED onto a common (key, time) axis and
 * the latest right payload is carried forward with `last(ignoreNulls)` over
 * one key-partitioned window — ONE shuffle on the key, one sort, O(rows)
 * total work. Catalyst plans the union map-side; no join appears in the
 * physical plan at all.
 *
 * Semantics:
 *  - "at-or-before": a right row timed exactly at a left row's instant IS
 *    visible to it (right rows sort before left rows at equal time).
 *  - Ties among right rows at the same instant resolve to the LARGEST
 *    `tieBreak` column values (mirroring `ORDER BY t DESC, tb DESC` rank-1
 *    in the naive spelling); pass the right-side unique id for determinism.
 *  - Left rows with no earlier right row keep a null `asof` struct (left
 *    outer); `dropUnmatched = true` makes it inner.
 *
 * Reference behavior context: svaningelgem/spark_bi5_datasource exposes tick
 * streams where "price as of event time" is the natural query; the reference
 * itself delegates all relational work to stock Spark (README.md:17).
 */
object AsofJoin {

  /**
   * @param left      probe side; every row is preserved (unless dropUnmatched)
   * @param right     the side to look up "latest at-or-before" rows from
   * @param on        equi-key column names, present in BOTH inputs with
   *                  identical types
   * @param leftTime  left event-time column (same type as rightTime)
   * @param rightTime right event-time column
   * @param tieBreak  right-side columns breaking equal-time ties (largest
   *                  wins); pass a unique id for full determinism
   * @param dropUnmatched drop left rows with no matching right row
   * @return left's columns, plus one `asof` struct column holding the
   *         matched right row (null when unmatched and not dropped)
   */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String] = Nil,
      dropUnmatched: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, on, leftTime, rightTime, tieBreak, dropUnmatched,
      forwardDir = false, tolerance)

  /**
   * Forward as-of: for every left row, the single EARLIEST right row whose
   * time is at-or-after the left row's time, within the same equi-key group.
   * Mirror semantics of [[backward]]: a right row timed exactly at the left
   * instant IS visible; ties among right rows at one instant resolve to the
   * SMALLEST `tieBreak` values (mirroring `ORDER BY t ASC, tb ASC` rank-1).
   * Same union + carry shape — one shuffle, no join in the plan.
   */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String] = Nil,
      dropUnmatched: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, on, leftTime, rightTime, tieBreak, dropUnmatched,
      forwardDir = true, tolerance)

  /**
   * Shared union + carry core. `tolerance` bounds the match window (standard
   * tick-data ask: "the quote within N ms, else no match"): a candidate
   * farther than `tolerance` time units from the left row is nulled out —
   * exact, because if the nearest candidate is out of tolerance, every
   * farther one is too. Requires NUMERIC time columns (e.g. epoch ms) since
   * it subtracts; the untolerated variants work on any ordered type.
   */
  private def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String],
      dropUnmatched: Boolean,
      forwardDir: Boolean,
      tolerance: Option[Long]): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key column")
    val lt = left.schema(leftTime).dataType
    val rt = right.schema(rightTime).dataType
    require(lt == rt, s"time columns must share a type; got $lt vs $rt")
    require(tolerance.forall(_ >= 0), "tolerance must be non-negative")
    require(tolerance.isEmpty || lt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tolerance needs numeric time columns (e.g. epoch ms); got $lt")
    // internal/output names must not collide with caller columns (the key
    // columns flow through the window partitioning; `asof` is appended)
    val reserved = Set("__t", "__kind", "__r", "__l", "asof")
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")

    val leftStructT = StructType(left.schema.fields)
    val rightStructT = StructType(right.schema.fields)
    val keyCols: Seq[Column] = on.map(col)

    // Equal-time visibility is encoded in __kind: right rows always sort
    // BEFORE left rows within an instant (the forward direction reverses the
    // whole sort instead, see below), so the running frame anchored at the
    // left row includes same-instant rights in both directions.
    val (rightKind, leftKind) = (0, 1)
    val rSide = right
      // JOIN semantics: a NULL key never matches. Window.partitionBy would
      // group null keys together, so null-keyed right rows must not enter
      // the carry at all; null-keyed LEFT rows then naturally land in a
      // right-free partition and come out unmatched (null asof).
      .filter(on.map(col(_).isNotNull).reduce(_ && _))
      .select(
      keyCols ++ Seq(
        col(rightTime).as("__t"),
        lit(rightKind).as("__kind"),
        struct(right.columns.toIndexedSeq.map(col): _*).as("__r"),
        lit(null).cast(leftStructT).as("__l")): _*)
    val lSide = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__t"),
        lit(leftKind).as("__kind"),
        lit(null).cast(rightStructT).as("__r"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l")): _*)

    // Both directions use last() over the RUNNING frame
    // [unboundedPreceding, currentRow], which Spark evaluates incrementally
    // in O(n) per partition. Forward must NOT use a [currentRow,
    // unboundedFollowing] frame — UnboundedFollowingWindowFunctionFrame
    // re-aggregates from scratch per row, O(n^2) on a million-row ticker-day.
    // Instead forward reverses the whole sort (time desc, tie-break desc):
    // the running last() then picks the right row with the SMALLEST time
    // at-or-after the left row and the smallest tie-break within an instant.
    // Tie-break nulls always sort first (= lose to any non-null value).
    // Left rows (null __r) interleave via __kind alone (rights first).
    val ord =
      if (forwardDir)
        Seq(col("__t").desc, col("__kind").asc) ++
          tieBreak.map(c => col(s"__r.$c").desc_nulls_first)
      else
        Seq(col("__t").asc, col("__kind").asc) ++
          tieBreak.map(c => col(s"__r.$c").asc_nulls_first)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rSide.union(lSide)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__kind") === lit(leftKind))
    val bounded = tolerance match {
      case None => carried
      case Some(tol) =>
        // nearest candidate out of tolerance -> no match at all
        val inTol =
          if (forwardDir) col(s"asof.`$rightTime`") <= col("__t") + lit(tol)
          else col(s"asof.`$rightTime`") >= col("__t") - lit(tol)
        carried.withColumn("asof", when(inTol, col("asof")))
    }
    val filtered = if (dropUnmatched) bounded.filter(col("asof").isNotNull) else bounded
    filtered.select(
      left.columns.toIndexedSeq.map(c => col(s"__l.`$c`").as(c)) :+ col("asof"): _*)
  }
}
