package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic data-mixture sampling: downsample each source/domain to a
 * target rate by hash threshold, so the surviving corpus matches a desired
 * training mixture. The decision for a row is a pure function of
 * (salt, key) — reproducible across runs, engines, partitionings, and
 * corpus growth (a doc's keep/drop never changes when other docs arrive),
 * which is what makes incremental pipeline re-runs and ablation
 * comparisons possible.
 *
 * Execution shape: the rate table (often thousands of domains) broadcasts
 * and the corpus maps through one codegen'd filter — no shuffle of the
 * data at any scale. Rows keep iff `md5_48(salt|key) mod 1e6 < rate*1e6`,
 * the library's shared hash convention ([[graft.functions.HashConventions]]),
 * so the same decision is spellable in DuckDB for the oracle gate.
 */
object Mixture {

  /**
   * Filter `df` to the target mixture. `rates` maps `sourceCol` values to
   * keep-rates in [0,1]; absent sources use `defaultRate`. `keyCol` must
   * be a unique non-null row key (the hash input); `salt` isolates this
   * sampling decision from every other hash use in the pipeline.
   */
  def sampleByRates(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "keep-rates must be in [0, 1]")
    val reserved = Set("mix_rate", "mix_thresh")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val spark = df.sparkSession
    import spark.implicits._
    // integer thresholds out of 1e6: the comparison below is pure integer
    // arithmetic, immune to cross-engine double rounding at the boundary
    def thresh(r: Double): Long = math.round(r * 1e6)
    val rateRows = rates.toSeq.map { case (s, r) => (s, thresh(r)) }
    val rateDf = rateRows.toDF(sourceCol, "mix_thresh")
    // the null check lives INSIDE the filter expression so pruning can
    // never remove it: a null key would hash to null and the comparison
    // would silently DROP the row (null < t is null) — keep/drop must be a
    // total function of the key, so fail loudly instead (GlobalRank's
    // null-contract rule)
    val hash = graft.functions.HashConventions
      .md5long48(s"concat('$salt|', cast($keyCol as string))")
    val guardedHash =
      s"""case when $keyCol is null then cast(raise_error(
            'Mixture.sampleByRates: $keyCol is null — the contract requires a non-null unique row key') as bigint)
          else $hash end"""
    df.join(broadcast(rateDf), Seq(sourceCol), "left")
      .withColumn("mix_thresh",
        coalesce(col("mix_thresh"), lit(thresh(defaultRate))))
      .filter(expr(s"$guardedHash % 1000000") < col("mix_thresh"))
      .drop("mix_thresh")
  }

  /**
   * Mixture sampling WITH oversampling: rates above 1 replicate rows
   * ("epoch upsampling" of scarce high-quality sources — the other half of
   * hitting a target training mixture). A rate of 2.5 keeps copies 0 and 1
   * of every row and copy 2 with probability 0.5, decided by the same
   * salted-hash convention (hash input includes the copy index, so the
   * fractional copy's keep set is independent of the integer copies).
   * Emits a `mix_copy` column (0-based) so downstream shuffles can spread
   * replicas. Map-only + broadcast, deterministic, growth-stable — same
   * contract as [[sampleByRates]].
   */
  def sampleByRatesWithRepeats(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0),
      "rates must be non-negative")
    val reserved = Set("mix_copies", "mix_full", "mix_thresh", "mix_copy")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val spark = df.sparkSession
    import spark.implicits._
    def parts(r: Double): (Int, Int, Long) = {
      val full = math.floor(r).toInt
      val frac = math.round((r - full) * 1e6)
      val copies = full + (if (frac > 0) 1 else 0)
      (copies, full, frac)
    }
    val rateDf = rates.toSeq
      .map { case (s, r) => val (c, f, t) = parts(r); (s, c, f, t) }
      .toDF(sourceCol, "mix_copies", "mix_full", "mix_thresh")
    val dflt = parts(defaultRate)
    val hash = graft.functions.HashConventions
      .md5long48(s"concat('$salt|', cast($keyCol as string), '|', cast(mix_copy as string))")
    val guardedHash =
      s"""case when $keyCol is null then cast(raise_error(
            'Mixture.sampleByRatesWithRepeats: $keyCol is null — the contract requires a non-null unique row key') as bigint)
          else $hash end"""
    df.join(broadcast(rateDf), Seq(sourceCol), "left")
      .withColumn("mix_copies", coalesce(col("mix_copies"), lit(dflt._1)))
      .withColumn("mix_full", coalesce(col("mix_full"), lit(dflt._2)))
      .withColumn("mix_thresh", coalesce(col("mix_thresh"), lit(dflt._3)))
      .filter(col("mix_copies") > 0)
      .withColumn("mix_copy", explode(expr("sequence(0, mix_copies - 1)")))
      .filter(col("mix_copy") < col("mix_full") ||
        expr(s"$guardedHash % 1000000") < col("mix_thresh"))
      .drop("mix_copies", "mix_full", "mix_thresh")
  }
}
