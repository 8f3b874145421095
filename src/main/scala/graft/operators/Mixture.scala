package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
   * Temperature-balanced mixture: derive each source's keep-rate FROM the
   * data so source sizes flatten toward the smallest source —
   * `rate_s = sqrt(n_min / n_s)`, the alpha = 0.5 point on the
   * temperature-sampling curve `(n_min/n_s)^(1-alpha)` multilingual and
   * multi-domain training mixtures use to keep big sources from drowning
   * small ones (the smallest source keeps everything, a 100x larger
   * source keeps 10%). sqrt and the exact-int->double casts are
   * correctly-rounded IEEE operations, so the derived rates and integer
   * thresholds are bit-identical in any engine — unlike pow(), whose libm
   * implementations can disagree at 1 ulp (which is why the exponent is
   * fixed at 0.5 rather than a parameter; other alphas need a
   * rational-arithmetic threshold derivation).
   *
   * Execution shape at 100 TB: one per-source count aggregate (rows =
   * #sources), its single-row min broadcast back, and then the same
   * broadcast-threshold + salted-hash filter as [[sampleByRates]] — the
   * corpus itself never shuffles; the only wide op is the tiny count agg.
   * Same determinism contract: keep/drop is a pure function of
   * (salt, key) AND the per-source totals (documented: unlike
   * sampleByRates, corpus growth shifts thresholds, so re-derive on a
   * frozen snapshot when ablation comparability matters).
   */
  def sampleBySqrtTemperature(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      salt: String): DataFrame = {
    val reserved = Set("mix_thresh", "__n_src", "__n_min")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    // null sources would silently vanish in the inner rate join below
    // (null never equi-matches); the contract is the loud one
    val guarded = df.filter(expr(
      s"""case when $sourceCol is null then cast(raise_error(
            'Mixture.sampleBySqrtTemperature: $sourceCol is null — the contract requires a non-null source') as boolean)
          else true end"""))
    val counts = guarded.groupBy(sourceCol).agg(count(lit(1)).as("__n_src"))
    val minc = counts.agg(min("__n_src").as("__n_min"))
    // floor(rate * 1e6): integer threshold out of 1e6 (the library's shared
    // hash-sampling convention); sqrt(1.0) == 1.0 exactly, so the smallest
    // source's threshold is exactly 1e6 — it keeps every row
    val rateDf = counts.crossJoin(broadcast(minc))
      .withColumn("mix_thresh", expr(
        "cast(floor(sqrt(cast(__n_min as double) / cast(__n_src as double)) * 1000000.0d) as bigint)"))
      .select(col(sourceCol), col("mix_thresh"))
    val hash = graft.functions.HashConventions
      .md5long48(s"concat('$salt|', cast($keyCol as string))")
    val guardedHash =
      s"""case when $keyCol is null then cast(raise_error(
            'Mixture.sampleBySqrtTemperature: $keyCol is null — the contract requires a non-null unique row key') as bigint)
          else $hash end"""
    guarded.join(broadcast(rateDf), Seq(sourceCol))
      .filter(expr(s"$guardedHash % 1000000") < col("mix_thresh"))
      .drop("mix_thresh")
  }

  /**
   * Weighted sampling WITHOUT replacement — keep `k` rows with probability
   * proportional to `weightCol` (the exponential-race / A-Res spelling):
   * each row draws u in (0, 1] from its salted hash and races with key
   * `-ln(u) / w`; the k smallest keys are a weight-proportional sample,
   * decided per-row with no rng state and no sequential pass. Appends
   * `wkey` (the rounded race key) and returns the k winners.
   *
   * Scale: the key is one map-only expression and the selection plans as
   * TakeOrderedAndProject — per-partition top-k, k-row driver merge,
   * never a global sort. Determinism: u is an exact small-decimal double;
   * ln's 1-ulp cross-engine slack is absorbed by round(,9) BEFORE ranking
   * (the bm25 discipline), and `keyCol` breaks ties totally. Weights must
   * be positive and non-null — zero/negative/null fail loudly (a zero
   * weight would divide to infinity and a null would silently drop).
   */
  /** The A-Res race-key spelling shared by [[weightedSample]],
    * [[weightedSamplePerGroup]] and the STREAMING reservoir
    * ([[graft.streaming.MixtureStreams]]): u from the salted hash,
    * round(-ln(u)/w, 9), loud null/non-positive contracts. One spelling =
    * streaming and batch race with bit-identical keys, which is what makes
    * the streaming reservoir equal the batch sample under ANY ingest
    * order (keys are content-derived, not arrival-derived). */
  private[graft] def raceKeyExpr(
      keyCol: String, weightCol: String, salt: String, opName: String): String = {
    val hash = graft.functions.HashConventions
      .md5long48(s"concat('$salt|', cast($keyCol as string))")
    val guardedHash =
      s"""case when $keyCol is null then cast(raise_error(
            '$opName: $keyCol is null — the contract requires a non-null unique row key') as bigint)
          else $hash end"""
    val u = s"(cast(($guardedHash) % 1000000 as double) + 1.0d) / 1000000.0d"
    s"""case when $weightCol is null or $weightCol <= 0
          then cast(raise_error(
            '$opName: $weightCol must be positive and non-null') as double)
        else round(-ln($u) / cast($weightCol as double), 9) end"""
  }

  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k ($k) must be positive")
    val reserved = Set("wkey")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val wkey = raceKeyExpr(keyCol, weightCol, salt, "Mixture.weightedSample")
    df.withColumn("wkey", expr(wkey))
      .orderBy(col("wkey"), col(keyCol))
      .limit(k)
  }

  /**
   * STRATIFIED weighted sampling without replacement — [[weightedSample]]'s
   * exponential race run independently per `groupCol` stratum: each row
   * races with key `-ln(u) / w` exactly as the global operator does, and
   * the k smallest keys WITHIN EACH GROUP win. Returns
   * `(groupCol, rank, keyCol, wkey)` with `rank` 1..k by (wkey, key).
   *
   * Scale: the global operator's TakeOrderedAndProject cannot express a
   * per-group limit, and the ranking-window spelling would shuffle and
   * sort every row of every group — so the selection runs through
   * [[TopKByValue]]'s k-bounded typed buffer (negated keys: its largest-k
   * order is the race's smallest-k) with map-side combine: shuffle volume
   * is O(groups x k), not O(rows). Determinism is the race's own: exact
   * hash draw, round(,9) before ranking, `keyCol` total tie-break.
   *
   * Contract: `keyCol` must be bigint-castable and unique per row,
   * `groupCol` non-null (it is the stratum identity — a null group has no
   * defined quota, so it fails loudly like the other contracts).
   */
  def weightedSamplePerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k ($k) must be positive")
    val reserved = Set("wkey", "rank")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val wkey = raceKeyExpr(keyCol, weightCol, salt, "Mixture.weightedSamplePerGroup")
    val guardedGroup =
      s"""case when $groupCol is null then cast(raise_error(
            'Mixture.weightedSamplePerGroup: $groupCol is null — a null stratum has no defined quota') as string)
          else cast($groupCol as string) end"""
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr(s"$guardedGroup as __g", s"cast($keyCol as bigint) as __k",
        s"$wkey as wkey")
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      // negate: TopKByValue keeps the LARGEST values, the race wants the
      // smallest keys; ties at equal wkey fall to id ASC on both sides
      .mapValues(t => (t._2, -t._3))
      .agg(new TopKByValue(k).toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.iterator.zipWithIndex.map { case ((id, nw), i) => (g, i + 1, id, -nw) }
      }
      .toDF(groupCol, "rank", keyCol, "wkey")
  }

  /**
   * Exhaustive, disjoint, growth-stable split assignment (train/val/test):
   * appends a `split` column by salted-hash range. `cuts` maps split names
   * to PERCENT widths out of 100 in declaration order — e.g.
   * `Seq("train" -> 90, "val" -> 5, "test" -> 5)`; widths must be positive
   * and sum to exactly 100, so every row lands in exactly one split.
   * The decision is a pure function of (salt, key): a row can NEVER
   * migrate between splits when the corpus grows or is re-run — the
   * leakage-proof property an ML data split needs (test docs cannot drift
   * into train). Map-only, no shuffle, stateless — runs unchanged under
   * Structured Streaming (the [[sampleByRates]] property).
   */
  def assignSplits(
      df: DataFrame,
      keyCol: String,
      salt: String,
      cuts: Seq[(String, Int)]): DataFrame = {
    // >= 2 splits: a single-split "assignment" is degenerate AND would let
    // Catalyst prune the hash column entirely, silently skipping the
    // null-key contract below
    require(cuts.size >= 2 && cuts.forall(_._2 > 0) && cuts.map(_._2).sum == 100,
      s"cuts must be >= 2 positive percent widths summing to 100, got: $cuts")
    require(cuts.map(_._1).distinct.size == cuts.size,
      s"duplicate split names in: $cuts")
    val reserved = Set("split", "__split_h")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val hash = graft.functions.HashConventions
      .md5long48(s"concat('$salt|', cast($keyCol as string))")
    val guardedHash =
      s"""case when $keyCol is null then cast(raise_error(
            'Mixture.assignSplits: $keyCol is null — the contract requires a non-null unique row key') as bigint)
          else $hash end"""
    // cumulative upper bounds -> one codegen'd case chain over hash mod 100
    val bounds = cuts.scanLeft(0)(_ + _._2).tail
    val branches = cuts.zip(bounds).init
      .map { case ((name, _), hi) => s"when __split_h < $hi then '$name'" }
      .mkString(" ")
    df.withColumn("__split_h", expr(s"($guardedHash) % 100"))
      .withColumn("split", expr(s"case $branches else '${cuts.last._1}' end"))
      .drop("__split_h")
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

  /**
   * Budget-constrained mixture WATERFILLING — the allocation step of
   * pretraining-mixture design: distribute `budget` tokens across sources
   * proportionally to `wCol` (the desired mixture weight), but never give
   * a source more than `capCol` (the tokens it actually has — "at most
   * one epoch of wiki, fill the rest from web"). The optimum is
   * a_i = min(cap_i, lambda * w_i) with a common water level lambda; this
   * computes it CLOSED-FORM, no iteration: sort sources by cap/weight
   * ascending (saturation order — the set of capped sources is always a
   * prefix), take prefix sums, and a source saturates iff
   * `cap_i * (W - cumw_{i-1}) <= (B - cumcap_{i-1}) * w_i` — the
   * cross-multiplied comparison keeps the entire decision in EXACT
   * integer arithmetic (weights, caps, budget are bigints); doubles enter
   * only in the final unsaturated allocation division. When the budget
   * exceeds total availability every source caps.
   *
   * Input `perSource(srcCol, wCol: bigint > 0, capCol: bigint >= 0)` —
   * one row per source. The frame is sources-sized (tiny by construction:
   * a mixture has tens of sources, not millions), so the two global
   * windows here are over a broadcast-scale frame; the CORPUS never
   * enters this operator — callers aggregate it to per-source stats
   * first, which is one map-collapsing pass.
   *
   * Returns (srcCol, w, cap, saturated, allocation) with allocation
   * rounded to 6 decimals and Σ allocation = budget (up to that
   * rounding) whenever budget <= Σ cap.
   */
  def waterfillAllocations(
      perSource: DataFrame,
      srcCol: String,
      wCol: String,
      capCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget ($budget) must be non-negative")
    val byRatio = Window.orderBy(
      (col("cap") * lit(1.0) / col("w")).asc, col(srcCol).asc)
    val cum = byRatio.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val guarded = perSource.select(
      col(srcCol),
      expr(s"""case when $wCol is null or $wCol <= 0
                 then cast(raise_error(
                   'Mixture.waterfillAllocations: $wCol must be positive and non-null') as bigint)
               else cast($wCol as bigint) end""").as("w"),
      expr(s"""case when $capCol is null or $capCol < 0
                 then cast(raise_error(
                   'Mixture.waterfillAllocations: $capCol must be non-negative and non-null') as bigint)
               else cast($capCol as bigint) end""").as("cap"))
    guarded
      .withColumn("cumw", sum(col("w")).over(cum))
      .withColumn("cumcap", sum(col("cap")).over(cum))
      .withColumn("totw", sum(col("w")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("totcap", sum(col("cap")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // prefix sums EXCLUDING the current row
      .withColumn("pw", col("cumw") - col("w"))
      .withColumn("pcap", col("cumcap") - col("cap"))
      .withColumn("saturated",
        lit(budget) >= col("totcap") ||
          col("cap") * (col("totw") - col("pw")) <= (lit(budget) - col("pcap")) * col("w"))
      // water level from the saturation boundary (exact-int numerator/denominator)
      .withColumn("satcap", sum(when(col("saturated"), col("cap")).otherwise(0L)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("unsatw", sum(when(col("saturated"), 0L).otherwise(col("w"))).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("allocation",
        when(col("saturated"), col("cap").cast("double"))
          .otherwise(round(
            (lit(budget) - col("satcap")).cast("double") * col("w").cast("double")
              / col("unsatw").cast("double"), 6)))
      .select(col(srcCol), col("w"), col("cap"), col("saturated"), col("allocation"))
  }

  /**
   * Contrastive NEGATIVE sampling at corpus scale — per anchor row, up to
   * `k` deterministic pseudo-random negatives from OTHER groups (other
   * source/label), WITHOUT an anchors x corpus product: every row lands
   * in one of `buckets` salted md5 hash buckets, an anchor meets only its
   * own bucket's rows (one equi-join on the bucket key — per-anchor
   * candidates ~ rows/buckets, tuned by sizing `buckets`), and the
   * winners are the k smallest pair-salted hashes (negative-id
   * tie-break). Same salt → same negatives under any partitioning.
   *
   * Returned: `(idCol, rank 1..k, neg_id, neg_group)`. An anchor whose
   * bucket holds fewer than `k` cross-group rows returns what exists —
   * the realistic edge; callers that need exactly k raise `buckets`
   * density (lower `buckets`) or re-draw with a second salt. Contract:
   * `idCol` values unique and string-castable, `groupCol` non-null
   * (loud — a null group has no defined negatives).
   */
  def hashBucketNegatives(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      buckets: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k ($k) must be positive")
    require(buckets >= 1, s"buckets ($buckets) must be positive")
    val reserved = Set("__nb", "__cb", "__nid", "__ngrp", "__pk", "rank")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    // the salt is arbitrary caller text and the column names may need
    // quoting — escape both before splicing into SQL fragments, so a
    // quote in the salt (or a spaced/reserved column name) can't change
    // the expression or fail to parse
    val saltSql = salt.replace("'", "''")
    val idQ = "`" + idCol.replace("`", "``") + "`"
    val grpQ = "`" + groupCol.replace("`", "``") + "`"
    val md48 = graft.functions.HashConventions.md5long48(
      s"concat('$saltSql', ':bkt:', cast($idQ as string))")
    val guardedGroup =
      s"""case when $grpQ is null then cast(raise_error(
            'Mixture.hashBucketNegatives: ${groupCol.replace("'", "''")} is null — a null group has no defined negatives') as string)
          else cast($grpQ as string) end"""
    val anchors = df.selectExpr(idQ, s"$guardedGroup as __agrp",
      s"$md48 % $buckets as __nb")
    val cands = df.selectExpr(s"$idQ as __nid", s"$guardedGroup as __ngrp",
      s"$md48 % $buckets as __cb")
    anchors.join(cands, expr(s"__nb = __cb and __agrp <> __ngrp"))
      .withColumn("__pk", expr(graft.functions.HashConventions.md5long48(
        s"concat('$saltSql', ':pair:', cast($idQ as string), ':', cast(__nid as string))")))
      .withColumn("rank", expr(
        s"row_number() over (partition by $idQ order by __pk, __nid)"))
      .filter(col("rank") <= k)
      .selectExpr(idQ, "rank",
        "__nid as `neg_" + idCol.replace("`", "``") + "`", "__ngrp as neg_group")
  }
}
