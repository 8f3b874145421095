package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization — the conversation/visit-splitting primitive of a
 * training-data pipeline (query `q40_sessionize` is its library use-site
 * shape): within each key, a new session starts wherever the time since the
 * previous row exceeds `gap`.
 *
 * One shuffle on the key, two stacked window passes (lag → boundary flag,
 * running sum → session number) — O(rows) total, no self-join. Session
 * numbers are 1-based and contiguous per key, deterministic given a total
 * per-key ordering (pass `tieBreak` when times can collide).
 */
object Sessionize {

  /**
   * @param df       input rows
   * @param keyCols  session scope (e.g. user id)
   * @param timeCol  NUMERIC event time (epoch ms/us — same unit as `gap`)
   * @param gap      max idle time within one session, in `timeCol` units
   * @param tieBreak extra ordering columns for rows at equal times
   * @param out      name of the appended session-number column
   * @return df plus `out`: the row's 1-based session number within its key
   */
  def byGap(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      gap: Long,
      tieBreak: Seq[String] = Nil,
      out: String = "session_no"): DataFrame = {
    require(keyCols.nonEmpty, "sessionize needs at least one key column")
    require(!df.columns.contains("__new_session") && !df.columns.contains(out),
      s"input columns collide with reserved names: __new_session / $out")
    val ordering: Seq[Column] = col(timeCol) +: tieBreak.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val prev = lag(col(timeCol), 1).over(w)
    df.withColumn(
        "__new_session",
        when(prev.isNull || col(timeCol) - prev > gap, 1L).otherwise(0L))
      .withColumn(out, sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}
