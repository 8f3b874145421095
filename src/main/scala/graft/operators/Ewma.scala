package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exponentially-weighted moving average per key — the classic smoothing
 * fold (`ewma = alpha*x + (1-alpha)*ewma`, seeded with the first
 * observation) that has no associative/windowed spelling: it is a
 * genuinely SEQUENTIAL recurrence, so the scalable shape is "gather each
 * key's history once, fold it in one pass", not a window function.
 *
 * Execution shape: one shuffle on the key into a collect_list aggregate
 * (map-side partial collects), then a codegen'd `aggregate` lambda folds
 * each key's time-sorted values left-to-right. Task memory is bounded by
 * the longest single key history (the same bound any per-key sequential
 * model — HMM decode, session replay — needs; for unbounded histories,
 * pre-truncate with a time predicate, which pushes to the scan).
 *
 * Determinism: collect_list order is partition-dependent, so the fold
 * sorts first — `array_sort` over (ord..., value) structs, with `ordCols`
 * required unique per key. The fold arithmetic is plain IEEE doubles in a
 * fixed order, bit-identical in any engine that folds left-to-right
 * (DuckDB's `list_reduce` seeds with the first element exactly like the
 * `slice`+`element_at` spelling here — the q80 oracle exploits that).
 */
object Ewma {

  /**
   * One row per key: `n_events` and `ewma` of `valCol` folded in
   * (`ordCols`) order with smoothing factor `alpha`.
   */
  def perKey(
      df: DataFrame,
      keyCol: String,
      ordCols: Seq[String],
      valCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha ($alpha) must be in (0, 1]")
    require(ordCols.nonEmpty, "ordCols must order each key's history")
    // null checks INSIDE the collected struct so pruning can never remove
    // them: a null order key would silently misplace the observation in
    // the fold (nulls sort last) and a null value would poison the ewma —
    // fail loudly instead (GlobalRank's null-contract rule)
    def guarded(c: String): String = {
      val dt = df.schema(c).dataType.sql
      s"""case when $c is null then cast(raise_error(
            'Ewma.perKey: $c is null — the contract requires non-null order and value columns') as $dt)
          else $c end"""
    }
    val sortStruct = (ordCols.zipWithIndex.map { case (c, i) => s"'o$i', ${guarded(c)}" }
      :+ s"'v', ${guarded(valCol)}").mkString("named_struct(", ", ", ")")
    df.groupBy(keyCol)
      .agg(expr(s"transform(array_sort(collect_list($sortStruct)), s -> s.v)").as("vs"))
      .selectExpr(
        keyCol,
        "cast(size(vs) as bigint) as n_events",
        s"""aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1),
            (acc, x) -> cast($alpha as double) * x
                      + cast(${1.0 - alpha} as double) * acc) as ewma""")
  }
}
