package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM pre-training: concatenate every document's
 * tokens in a deterministic global order and split the stream into
 * fixed-length context windows (the standard "concat-and-chunk" packing
 * GPT-style training uses). The per-document outputs are its global token
 * offset and the span of context windows it lands in — exactly what a
 * tokenizer-sharding job needs to route each document to its training
 * sequences.
 *
 * The core is a GLOBAL running sum over a total order — the textbook
 * spelling (`Window.orderBy(orderCol)` with no partition key) collapses
 * the whole dataset into ONE task at scale. This operator computes the
 * same exclusive running sum in two phases, so no task ever sorts or sums
 * more than ~rows/nBuckets rows (the same shape as [[GlobalRank]]):
 *
 *  1. An `approx_percentile` sketch over `orderCol` yields `nBuckets - 1`
 *     range boundaries (fixed-size, map-side-combinable buffer).
 *  2. Every row maps to a bucket by counting boundaries below its key —
 *     broadcast of an nBuckets-row frame, map-only, monotone in the key.
 *  3. Per-bucket token totals (tiny frame) accumulate into bucket start
 *     offsets; rows window-sum LOCALLY within their bucket only.
 *  4. `tok_offset = bucket_offset + local_exclusive_sum`, broadcast-joined
 *     back. Sketch accuracy affects bucket BALANCE only, never the sum.
 *
 * Contract: `orderCol` must be a non-null numeric UNIQUE total order
 * (ties would make "tokens before me" ambiguous) and `nTokCol` a
 * non-null non-negative count. Violations fail loudly (raise_error /
 * require), mirroring [[GlobalRank]]'s null contract.
 *
 * EXECUTION SEMANTICS: construction runs the bounds sketch EAGERLY — one
 * Spark job fires as a side effect. The pin mode is the `recoverable`
 * knob ([[Pinned]]): default `localCheckpoint(true)` (truncated lineage,
 * executor loss -> downstream failure -> re-invoke; right for short
 * sessions), or lineage-kept persist for multi-hour jobs that must
 * survive executor loss. See [[GlobalRank]] / [[Pinned]] for the full
 * rationale and the CacheManager-entry trade.
 */
object Packer {

  /**
   * Appends to `df`:
   *  - `tok_offset`: tokens strictly before this row in `orderCol` order
   *  - `first_seq` / `last_seq`: first/last ctx-window index this row's
   *    tokens touch (`last_seq = first_seq` for an empty row)
   *  - `n_seqs`: context windows spanned (`last_seq - first_seq + 1`)
   */
  def withSequenceOffsets(
      df: DataFrame,
      orderCol: String,
      nTokCol: String,
      ctxLen: Int,
      nBuckets: Int = 32,
      recoverable: Boolean = false): DataFrame = {
    require(ctxLen >= 1, s"ctxLen ($ctxLen) must be at least 1")
    require(nBuckets >= 2, s"nBuckets ($nBuckets) must be at least 2")
    val reserved =
      Set("bnds", "bucket", "b_tot", "b_off", "loc_off",
        "tok_offset", "first_seq", "last_seq", "n_seqs", "__pk_bucket")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    val qs = (1 until nBuckets).map(i => i.toDouble / nBuckets).mkString(", ")
    // pinned (1-row frame): both downstream branches broadcast it;
    // pinning holds the percentile pass to one corpus scan (GlobalRank's
    // reasoning; `recoverable` trades lineage-kept persist for the
    // default checkpoint — see Pinned)
    val bounds = Pinned.pin(
      df.select(
        expr(s"approx_percentile($orderCol, array($qs), 1000)").as("bnds")),
      recoverable)
    // null checks live INSIDE the bucket expression so pruning can never
    // drop them: a null key or count would otherwise corrupt every offset
    // after it silently. Fail loudly instead (GlobalRank's contract).
    // The boundaries-below count is an UNROLLED comparison chain (not an
    // aggregate() lambda): HOFs evaluate interpreted, and this mapping
    // runs per input row — unrolled it stays in whole-stage codegen
    // (same fix as GlobalRank).
    val below = (1 until nBuckets)
      .map(i => s"(case when $orderCol > element_at(bnds, $i) then 1 else 0 end)")
      .mkString(" + ")
    val bucketed = df
      .crossJoin(broadcast(bounds))
      .withColumn("bucket",
        expr(s"""case
                 when $orderCol is null then cast(raise_error(
                   'Packer.withSequenceOffsets: $orderCol is null — the contract requires a non-null unique order column') as int)
                 when $nTokCol is null or $nTokCol < 0 then cast(raise_error(
                   'Packer.withSequenceOffsets: $nTokCol is null or negative — the contract requires a non-null non-negative token count') as int)
                 else $below end"""))
      .drop("bnds")
    // tiny nBuckets-row frame: the window here is over the AGGREGATE
    val wOff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bucket")
      .agg(sum(col(nTokCol).cast("long")).as("b_tot"))
      .withColumn("b_off", coalesce(sum("b_tot").over(wOff), lit(0L)))
      .select("bucket", "b_off")
    // bounded local sort: each window partition holds ~rows/nBuckets rows
    val wLocal = Window.partitionBy("bucket").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // NULL-SAFE join key: a plain inner join infers isnotnull(bucket),
    // which pushes the whole bucket-chain expression into the (degenerate,
    // interpreted) bounds-attach join condition — GlobalRank's fix, same
    // pathology
    bucketed
      .withColumn("loc_off",
        coalesce(sum(col(nTokCol).cast("long")).over(wLocal), lit(0L)))
      .join(broadcast(offsets.withColumnRenamed("bucket", "__pk_bucket")),
        col("bucket") <=> col("__pk_bucket"))
      .drop("__pk_bucket")
      .withColumn("tok_offset", col("b_off") + col("loc_off"))
      .withColumn("first_seq", expr(s"tok_offset div $ctxLen"))
      .withColumn("last_seq",
        expr(s"(tok_offset + greatest(cast($nTokCol as bigint), 1L) - 1L) div $ctxLen"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
      .drop("bucket", "b_off", "loc_off")
  }

  /**
   * TENSOR-READY sequence materialization — the artifact a trainer
   * actually consumes: every document's token ids concatenate in
   * `orderCol` order with ONE `eosId` separator appended per document
   * (the GPT-2 `<|endoftext|>` convention), and the global id stream
   * slices into `ctxLen`-id context windows. Output: one row per window
   * — `seq` (window index), `n_ids`, `ids` (the window's exact id
   * array). Every window carries exactly `ctxLen` ids except the final
   * partial tail, which is KEPT and detectable by `n_ids < ctxLen` —
   * the caller decides to drop or pad it; nothing truncates silently.
   *
   * Scale shape: offsets come from [[withSequenceOffsets]]'s two-phase
   * bucketed cumsum (no global window, no collect); each document then
   * explodes into ONLY the windows it overlaps (`n/ctxLen + 1` rows),
   * carrying the exact slice of its id array for each window; windows
   * reassemble by an equi-shuffle on `seq` with a bounded per-window
   * fragment sort (a window holds at most `ctxLen + 1` fragments,
   * `ctxLen` ids). Each id crosses the wire once — the minimum any
   * delivery job can move — and no task ever holds more than one
   * window's ids plus its own input split.
   *
   * Contract: `orderCol` non-null unique numeric total order (enforced
   * by [[withSequenceOffsets]]); `idsCol` a non-null `array<int>` of
   * non-null ids (a null array fails loudly via the null-count check);
   * `eosId` is the separator id — by convention the trained model's
   * vocabulary size (one past the last merge id), never a data id.
   */
  def packTokenIds(
      df: DataFrame,
      orderCol: String,
      idsCol: String,
      ctxLen: Int,
      eosId: Int,
      nBuckets: Int = 32,
      recoverable: Boolean = false): DataFrame = {
    val fr = fragments(df, orderCol, idsCol, ctxLen, eosId, nBuckets, recoverable)
    fr.groupBy("seq")
      // fragments reassemble in stream order: tok_offset is unique per
      // doc, so the struct sort is total and the flatten deterministic
      .agg(expr("flatten(transform(array_sort(collect_list(" +
        "struct(tok_offset, frag))), x -> x.frag))").as("ids"))
      .select(col("seq"), size(col("ids")).as("n_ids"), col("ids"))
  }

  /**
   * [[packTokenIds]] plus the DOCUMENT-SPAN metadata a trainer's
   * attention mask needs: packed windows mix documents, and causal
   * attention must not cross document boundaries (block-diagonal
   * masking), so each window also carries `spans` — one
   * `(doc, a, b)` struct per document fragment, `doc` the order-column
   * value, `[a, b)` the 0-based id positions it occupies (its EOS
   * included in the owning doc's span). Spans tile the window exactly:
   * a_0 = 0, b_i = a_{i+1}, b_last = n_ids. Same scale shape as
   * [[packTokenIds]] — the span offsets fold per window over at most
   * ctxLen + 1 fragments, never over data.
   */
  def packTokenIdsWithSpans(
      df: DataFrame,
      orderCol: String,
      idsCol: String,
      ctxLen: Int,
      eosId: Int,
      nBuckets: Int = 32,
      recoverable: Boolean = false): DataFrame = {
    val fr = fragments(df, orderCol, idsCol, ctxLen, eosId, nBuckets, recoverable)
    fr.groupBy("seq")
      .agg(expr("array_sort(collect_list(struct(tok_offset, ord, frag)))").as("fr"))
      .select(
        col("seq"),
        expr("flatten(transform(fr, x -> x.frag))").as("ids"),
        // window-local running offset: bounded fold (<= ctxLen + 1
        // fragments), emitted as (doc, a, b) in stream order
        expr("""aggregate(fr,
                  struct(0 as pos, cast(array() as array<struct<doc: bigint, a: int, b: int>>) as sp),
                  (acc, x) -> struct(
                    acc.pos + size(x.frag) as pos,
                    concat(acc.sp, array(struct(
                      x.ord as doc, acc.pos as a, acc.pos + size(x.frag) as b))) as sp),
                  acc -> acc.sp)""").as("spans"))
      .select(col("seq"), size(col("ids")).as("n_ids"), col("ids"), col("spans"))
  }

  /**
   * [[packTokenIds]] CONTINUED from a committed stream position — the
   * streaming spelling ([[graft.streaming.PackStreams]]): the global id
   * stream already holds `startSeq` full windows plus `carry`
   * (the committed partial tail, `carry.length < ctxLen`), and `df` is
   * the next closed slice of documents in `orderCol` order. Windows
   * emerge with globally-continuous `seq` numbers (`startSeq`,
   * `startSeq + 1`, ...), the carry occupying the head of window
   * `startSeq`. Same distributed shape as [[packTokenIds]] — the batch
   * still flows through the two-phase offsets and the equi-shuffle
   * reassembly; the carry is ONE extra bounded fragment row. The final
   * window is partial unless the stream lands on a boundary; the caller
   * carries it forward. `orderCol` keys must all be NEW (greater than
   * every previously packed key) — that contract is the caller's
   * ([[graft.streaming.PackStreams.PackPosition]] tracks it).
   */
  def packTokenIdsContinued(
      df: DataFrame,
      orderCol: String,
      idsCol: String,
      ctxLen: Int,
      eosId: Int,
      startSeq: Long,
      carry: Seq[Int],
      nBuckets: Int = 32,
      recoverable: Boolean = false): DataFrame = {
    require(startSeq >= 0, s"startSeq ($startSeq) must be non-negative")
    require(carry.length < ctxLen,
      s"carry (${carry.length} ids) must be shorter than ctxLen ($ctxLen) — " +
        "a full carry would already be a committed window")
    val base = startSeq * ctxLen + carry.length
    val fr = fragments(df, orderCol, idsCol, ctxLen, eosId, nBuckets,
      recoverable, base)
    val withCarry =
      if (carry.isEmpty) fr
      else {
        val s = df.sparkSession
        import s.implicits._
        // the committed partial tail heads window `startSeq`; its
        // tok_offset (the window start) sorts it before every batch
        // fragment in that window (whose offsets are >= base > this)
        fr.unionByName(Seq((startSeq, startSeq * ctxLen, -1L, carry))
          .toDF("seq", "tok_offset", "ord", "frag"))
      }
    withCarry.groupBy("seq")
      .agg(expr("flatten(transform(array_sort(collect_list(" +
        "struct(tok_offset, frag))), x -> x.frag))").as("ids"))
      .select(col("seq"), size(col("ids")).as("n_ids"), col("ids"))
  }

  /** Shared core of [[packTokenIds]]/[[packTokenIdsWithSpans]]: append
    * the per-doc EOS, compute two-phase stream offsets, and explode each
    * doc into (seq, tok_offset, ord, frag) — the exact slice of its ids
    * landing in each window it overlaps. `base` shifts every offset
    * (and re-derives the window span) for continuation packing. */
  private def fragments(
      df: DataFrame,
      orderCol: String,
      idsCol: String,
      ctxLen: Int,
      eosId: Int,
      nBuckets: Int,
      recoverable: Boolean,
      base: Long = 0L): DataFrame = {
    require(ctxLen >= 1, s"ctxLen ($ctxLen) must be at least 1")
    require(eosId >= 0, s"eosId ($eosId) must be non-negative")
    // spans attribute fragments to docs through `ord = orderCol cast to
    // long`; a fractional order key (doubles 1.2 and 1.9) would silently
    // truncate and alias two documents under one span doc id, so the
    // packers tighten withSequenceOffsets' "numeric" contract to INTEGRAL
    df.schema(orderCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"packTokenIds/packTokenIdsWithSpans need an INTEGRAL order column " +
          s"(doc ids attribute spans through a lossless cast to long); " +
          s"$orderCol is $other")
    }
    val withEos = df.select(
      col(orderCol),
      expr(s"concat($idsCol, array($eosId))").as("__ids"))
      .withColumn("__n", size(col("__ids")))
    val off0 = withSequenceOffsets(
      withEos, orderCol, "__n", ctxLen, nBuckets, recoverable)
    // continuation shift: offsets move by `base` and the per-doc window
    // span re-derives from the shifted offset (every doc has __n >= 1 —
    // the appended EOS — so last_seq needs no empty-doc guard here)
    val off =
      if (base == 0L) off0
      else off0
        .withColumn("tok_offset", col("tok_offset") + lit(base))
        .withColumn("first_seq", expr(s"tok_offset div ${ctxLen}L"))
        .withColumn("last_seq", expr(s"(tok_offset + __n - 1) div ${ctxLen}L"))
    off
      .withColumn("seq", explode(expr("sequence(first_seq, last_seq)")))
      // the slice of THIS doc's ids that lands in window `seq`:
      // [max(windowStart, docStart), min(windowEnd, docEnd)) in global
      // stream coordinates, rebased to the doc's array (1-based)
      .withColumn("frag", expr(
        s"""slice(__ids,
              cast(greatest(seq * ${ctxLen}L - tok_offset, 0L) + 1L as int),
              cast(least((seq + 1L) * ${ctxLen}L, tok_offset + size(__ids))
                   - greatest(seq * ${ctxLen}L, tok_offset) as int))"""))
      .select(col("seq"), col("tok_offset"),
        col(orderCol).cast("long").as("ord"), col("frag"))
  }
}
