package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pure interval join — point-in-interval matching with NO equality key.
 * Spark has no native plan for this: a plain
 * `points.join(intervals, lo <= p && p <= hi)` has no equi-condition, so
 * Catalyst falls back to BroadcastNestedLoopJoin (or a cartesian product),
 * which is O(points x intervals) — hopeless at scale unless one side is
 * tiny. (The equi+range case — q45's shape — does NOT need this operator:
 * the equality key already makes it a plain shuffle join.)
 *
 * Scale shape (time-bucket blocking, the standard spatial-join recipe in
 * one dimension): pick a bin width; each POINT lands in exactly one bin
 * (floor-div), each INTERVAL is replicated to every bin it overlaps; the
 * join becomes an EQUI-join on the bin key plus the exact range predicate
 * as a residual filter. Each matching pair meets exactly once — in the
 * point's own bin — so no dedup pass is needed. One shuffle on the bin
 * key; uniform bins spread load, and bin-key skew (a hot hour) is
 * AQE-splittable.
 *
 * Choosing `binWidth`: replication per interval is `len/binWidth + 1`
 * rows, while the residual-filter waste per bin grows with `binWidth`
 * (points and intervals sharing a bin but not overlapping). A width near
 * the TYPICAL interval length keeps both ~O(1); err toward wider bins
 * when intervals are few and long, narrower when they are many and short.
 */
object RangeJoin {

  /**
   * Inner join of every point row to every interval row whose CLOSED
   * interval `[loCol, hiCol]` contains `pointCol`. All three columns must
   * be integral (e.g. epoch ms) and in the same unit as `binWidth`;
   * interval rows with `lo > hi` (empty) or a NULL bound never match, like
   * a join predicate on NULL.
   *
   * @return all point columns followed by all interval columns (one output
   *         row per containment pair)
   */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth ($binWidth) must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty,
      s"point and interval column names must be disjoint; both have: $clash")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "input columns collide with reserved name __bin")
    // exact FLOOR division in integer arithmetic (correct for negative
    // coordinates too — `div` alone truncates toward zero, and a double
    // `/` + floor loses exactness past 2^53)
    def floorDiv(c: String): org.apache.spark.sql.Column =
      expr(s"(`$c` - pmod(`$c`, $binWidth)) div $binWidth")
    val pB = points.withColumn("__bin", floorDiv(pointCol))
    val iB = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(floorDiv(loCol), floorDiv(hiCol))))
    pB.join(iB, Seq("__bin"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
      .select(points.columns.map(col) ++ intervals.columns.map(col): _*)
  }
}
