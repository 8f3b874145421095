package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sliding token-window chunking — the document-to-training-sample splitter:
 * each document yields windows of `window` tokens advancing by `stride`
 * (overlapping when stride < window), the shape every context-length-bounded
 * training pipeline needs between curation and tokenization.
 *
 * Execution shape: tokenize once, explode the start offsets, slice per
 * chunk — entirely map-side (Generate + Project, no shuffle at any scale),
 * so chunking composes with any downstream partitioning for free. Output
 * size is rows x (tokens/stride), the unavoidable fan-out; the chunk TEXT
 * column is built lazily per row, so projections that only need counts or
 * hashes never materialize it.
 *
 * Window semantics: starts are 0, stride, 2*stride, ... strictly below the
 * token count, so every token lands in ceil(window/stride) chunks (fewer
 * near the tail) and the final chunks may be shorter than `window` —
 * `n_tok` carries each chunk's actual length for downstream filters.
 */
object Chunker {

  /** Appends one row per (document, chunk): `chunk_no` (0-based), `start_tok`,
    * `n_tok`, and `chunk_text` (space-rejoined token window). Token model is
    * the library's whitespace split; empty text yields one empty chunk. */
  def slidingTokenWindows(
      df: DataFrame,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1, s"window ($window) must be positive")
    require(stride >= 1, s"stride ($stride) must be positive")
    val reserved = Set("toks", "n", "start_tok", "chunk_no", "n_tok", "chunk_text")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    df.withColumn("toks", split(col(textCol), " "))
      .withColumn("n", size(col("toks")))
      // sequence() is inclusive of the upper bound, hence n-1: starts stay
      // strictly below the token count (split never yields an empty array,
      // so n >= 1 and the sequence is never empty/reversed)
      .withColumn("start_tok", explode(expr(s"sequence(0, n - 1, $stride)")))
      .withColumn("chunk_no", expr(s"cast(start_tok div $stride as bigint)"))
      .withColumn("n_tok", least(lit(window), col("n") - col("start_tok")).cast("long"))
      .withColumn("chunk_text", expr(s"array_join(slice(toks, start_tok + 1, $window), ' ')"))
      .drop("toks", "n")
  }

  /** Character-budget chunking — the byte-exact sibling of
    * [[slidingTokenWindows]] for pipelines that budget CONTEXT BYTES rather
    * than whitespace tokens (on single-byte text, characters == bytes;
    * slicing characters rather than raw bytes keeps multi-byte UTF-8 code
    * points whole). One row per (document, chunk): `chunk_no` (0-based),
    * `start_ch`, `chunk_len` (actual characters, shorter at the tail),
    * `chunk_text`. Empty text yields one empty chunk, mirroring the token
    * spelling. Same map-only Generate + substring shape — no shuffle at
    * any scale. */
  def slidingCharWindows(
      df: DataFrame,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1, s"window ($window) must be positive")
    require(stride >= 1, s"stride ($stride) must be positive")
    val reserved = Set("n_ch", "start_ch", "chunk_no", "chunk_len", "chunk_text")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    df.withColumn("n_ch", length(col(textCol)))
      // greatest(n-1, 0): empty text still yields the single start 0
      .withColumn("start_ch", explode(expr(s"sequence(0, greatest(n_ch - 1, 0), $stride)")))
      .withColumn("chunk_no", expr(s"cast(start_ch div $stride as bigint)"))
      .withColumn("chunk_len",
        greatest(least(lit(window), col("n_ch") - col("start_ch")), lit(0)).cast("long"))
      .withColumn("chunk_text", expr(s"substring($textCol, start_ch + 1, $window)"))
      .drop("n_ch")
  }
}
