package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Snapshot diff — the regression tool run after every pipeline change or
 * migration: given two versions of a keyed dataset, label every key
 * `added` / `removed` / `changed` / `unchanged`. Complements the
 * order-independent whole-dataset fingerprint (q82): the fingerprint says
 * WHETHER two snapshots differ, the diff says WHERE.
 *
 * Scale shape: each side projects to (key, fingerprint) FIRST — the md5 of
 * the compare columns' JSON — so the full-outer join shuffles two narrow
 * columns per row, never the payload (a wide document row becomes ~50
 * bytes on the wire). Both sides are corpus-sized, so this is a
 * hash-partitioned sort-merge join by construction; nothing broadcasts.
 *
 * Change detection is fingerprint equality: md5 over `to_json(struct(...))`
 * — full 128-bit (collision-safe for identity, per the library's hashing
 * rule: truncated hashes are for arithmetic, never equality), with JSON
 * field framing so NULL vs "null" vs missing cannot alias and column
 * values cannot bleed into each other (the concat_ws trap). The JSON
 * options are pinned EXPLICITLY (`ignoreNullFields=false`) so fingerprint
 * bytes cannot change under a session-conf flip of
 * `spark.sql.jsonGenerator.ignoreNullFields`. Map-typed compare columns
 * are REJECTED: JSON serializes map entries in storage order, which is not
 * canonical, so equal maps could fingerprint differently — sort the
 * entries into an array (`map_entries` + `array_sort`) before diffing.
 *
 * Contract: `keyCols` must identify at most one row per side. Duplicate
 * keys make a full-outer join multiply rows silently, so callers can opt
 * into `checkUniqueKeys = true` — one extra count-window per side that
 * fails LOUDLY (raise_error, prune-proof: the check rides inside the
 * projected fingerprint) instead of emitting a multiplied diff. Off by
 * default: the window costs a shuffle the happy path does not need when
 * keys come from a primary-key-clean source.
 */
object SnapshotDiff {

  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      checkUniqueKeys: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val reserved = Set("__fp_old", "__fp_new", "__kn", "status")
    val clash = (oldDf.columns ++ newDf.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    // maps have no canonical JSON entry order -> equal values could
    // fingerprint differently; reject loudly (see the class doc for the
    // map_entries + array_sort workaround)
    Seq(oldDf, newDf).foreach { df =>
      val mapCols = compareCols.filter(c =>
        df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      require(mapCols.isEmpty,
        s"SnapshotDiff: map-typed compare columns are not canonical under JSON " +
          s"fingerprinting: ${mapCols.mkString(", ")} — sort entries into an array first")
    }

    def fingerprinted(df: DataFrame, fpName: String): DataFrame = {
      // options pinned so a session-level jsonGenerator conf flip can never
      // change fingerprint bytes between runs
      val fp = md5(to_json(struct(compareCols.map(col): _*),
        Map("ignoreNullFields" -> "false")))
      val guarded =
        if (!checkUniqueKeys) fp
        else {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keyCols.map(col): _*)
          // the raise_error rides INSIDE the fingerprint column so no
          // downstream pruning can drop the check
          when(count(lit(1)).over(w) > 1,
            raise_error(concat(lit("SnapshotDiff: duplicate key in snapshot for "),
              to_json(struct(keyCols.map(col): _*)))).cast("string"))
            .otherwise(fp)
        }
      df.select(keyCols.map(col) :+ guarded.as(fpName): _*)
    }

    fingerprinted(oldDf, "__fp_old")
      .join(fingerprinted(newDf, "__fp_new"), keyCols, "full_outer")
      .withColumn("status",
        when(col("__fp_old").isNull, lit("added"))
          .when(col("__fp_new").isNull, lit("removed"))
          .when(col("__fp_old") === col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
