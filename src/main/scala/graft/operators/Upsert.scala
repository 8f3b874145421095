package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SCD1 latest-wins merge ("upsert"): rows in `updates` replace same-key
 * rows in `base`; unmatched update keys append. The daily-snapshot
 * maintenance pass of any keyed table pipeline.
 *
 * Execution shape: base anti-joins the update KEYS (broadcastable when the
 * update batch is small — the overwhelmingly common case: a day's changes
 * against years of history), then the updates union on. No window, no
 * sort, and the base table pays a broadcast probe instead of a shuffle
 * when `updates` fits the broadcast threshold. Compare the window
 * spelling (union + row_number per key): it shuffles the WHOLE base every
 * run — the anti-join shape is what stays viable at 100 TB.
 *
 * Contract: `base` and `updates` share a schema; `keyCols` are non-null
 * and unique within `updates` (duplicate update keys would make
 * "latest" ambiguous — validated with a loud failure, not a silent pick).
 */
object Upsert {

  def byKey(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schemas differ: base=${base.columns.mkString(",")} updates=${updates.columns.mkString(",")}")
    // loud uniqueness check on the update side: tiny frame, one aggregate.
    // (An action here is a deliberate control decision, like Dedup.clusters'
    // convergence count — correctness of "latest wins" depends on it.)
    val dups = updates.groupBy(keyCols.map(col): _*).count().filter(col("count") > 1)
    require(dups.isEmpty, s"updates carry duplicate keys on (${keyCols.mkString(", ")})")
    val keep = base.join(broadcast(updates.select(keyCols.map(col): _*)),
      keyCols, "left_anti")
    keep.unionByName(updates)
  }
}
