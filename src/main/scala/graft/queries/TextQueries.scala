package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * LLM-training-pipeline text operators over the `documents` table:
 * exact dedup, MinHash signatures + LSH bucketing, SimHash, n-gram Jaccard,
 * language-ID heuristic, quality scoring, token statistics, and document
 * fingerprinting. All are pure Catalyst expression pipelines (no UDFs), so
 * they stay inside whole-stage codegen and scale linearly with documents.
 *
 * Cross-engine hash convention (identical in Spark and DuckDB, so every
 * operator here is DuckDB-oracle-checkable): h(s) = first 12 hex chars of
 * md5(s) as a bigint (48 bits). MinHash permutations are (a*h + b) mod P
 * over that value with P = 1e9+7; all arithmetic stays below 2^63.
 */
object TextQueries {

  import Tables.table

  // Shared hashing conventions (one definition for the query library AND the
  // operator API, which are spec-locked to agree — see HashConventions).
  private def md5long(e: String) = graft.functions.HashConventions.md5long48(e)
  private def duckMd5long(e: String) = graft.functions.HashConventions.duckMd5long48(e)

  /** Fresh scratch directory for delivery-manifest queries (q284/q287/…):
    * per-invocation (parallel suites run the same lambda concurrently, so
    * an Overwrite race on a shared path would corrupt the read-back), but
    * REGISTERED FOR DELETION at JVM exit — the returned DataFrame is lazy,
    * so the dir cannot be removed before the driver executes it; without
    * the hook every bench rep and correctness run leaked a full sharded
    * parquet dataset in /tmp. */
  private def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      } catch { case _: java.io.IOException => () } // best-effort at exit
    }))
    p.toString
  }

  // Word-3-gram shingles over the whitespace tokenization — the native
  // expression (graft.functions.WordNgrams): one compiled loop per row
  // instead of one interpreted lambda dispatch per shingle (~10x).
  private val sparkShingles = "word_ngrams(toks, 3)"
  private val duckShingles =
    "list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])"

  // MinHash permutation constants; a * (h % P) + b stays < 2^63.
  private val P = graft.functions.HashConventions.MinhashP
  private val perms = graft.functions.HashConventions.MinhashPerms

  // q48 stop-shingle doc-frequency cutoff: a shingle appearing in more docs
  // than this is boilerplate, not a dedup signal, and its df² term would
  // dominate the posting-list self-join (a df-in-the-millions shingle alone
  // would generate ~df²/2 candidate pairs at 100 TB). Low enough to actually
  // engage on the test corpus (max df there ≈ 25), high enough to keep real
  // near-dup pairs: true near-dups share many RARE shingles.
  private val StopShingleDf = 20

  // 16-bit majority-vote SimHash over a precomputed token-hash column `hs`:
  // the native one-pass expression (spec-locked equal to the nBits-filter-
  // passes HOF spelling it replaced — TextExpressionsSpec).
  private val sparkSimhash = "simhash_bits(hs, 16)"

  /** VERIFIED near-dup pairs: LSH candidates (the production sketch path)
    * scored with exact shingle Jaccard and kept at >= 0.5 — the shared
    * front of q121 (provenance matrix) and q122 (dup centrality). */
  private def verifiedNearDupPairs(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.table(s, dir, "documents")
    val cand = graft.operators.Dedup
      .minhashLshCandidates(s, docs, "doc_id", "text")
    val sh = docs
      .withColumn("toks", expr("tokenize_text(text)"))
      .filter(size(col("toks")) >= 3)
      .selectExpr("doc_id", s"$sparkShingles as sh")
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", expr(
        "cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b))"))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
  }

  /** DuckDB twin of [[verifiedNearDupPairs]]: CTEs ending in
    * `ver(id_a, id_b, jaccard)`. */
  private def duckVerifiedPairs: String =
    s"""sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id),
        shv AS (
          SELECT doc_id, $duckShingles AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        ver AS (
          SELECT p.id_a, p.id_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
          FROM pairs p JOIN shv a ON p.id_a = a.doc_id JOIN shv b ON p.id_b = b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5)"""

  /** Documents with tokenized text, shingle hashes, and the 4 MinHash mins +
    * 2x2 LSH bands — the shared front of q24 (signatures) and q25 (buckets). */
  private def minhashSigs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.table(s, dir, "documents")
      .withColumn("toks", expr("tokenize_text(text)"))
      .filter(size(col("toks")) >= 3)
      // fused native expression: shingle + 48-bit md5 in one compiled loop
      // (spec-locked equal to the transform(word_ngrams(...), md5...) HOF)
      .withColumn("hs", expr("word_ngram_hash48(toks, 3)"))
      .selectExpr(Seq("doc_id") ++ sparkMinhashSelect: _*)
      .withColumn("band0", concat_ws("_", col("minh0"), col("minh1")))
      .withColumn("band1", concat_ws("_", col("minh2"), col("minh3")))

  /** (doc_id, 16-bit simhash) signatures — the shared front of q26 and q35. */
  private def simhashSigs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.table(s, dir, "documents")
      .withColumn("toks", expr("tokenize_text(text)"))
      .filter(size(col("toks")) >= 1)
      // hash each token ONCE; the 16 bit-majority votes then scan the
      // precomputed hash array instead of re-hashing per bit
      .withColumn("hs", expr("word_ngram_hash48(toks, 1)"))

  // The md5 hashing dominates cost, so it runs ONCE into an `hs` column;
  // each permutation is then a cheap arithmetic transform over it.
  // (Catalyst does not share subexpressions across lambda bodies — inlining
  // the hash array into all four permutations would hash every shingle 4x.)
  private def sparkMinhashSelect: Seq[String] =
    perms.zipWithIndex.map { case ((a, b), i) =>
      s"array_min(transform(hs, h -> ($a * (h % $P) + $b) % $P)) as minh$i"
    }

  private def duckMinhashSelect: Seq[String] = {
    val hashes = s"list_transform($duckShingles, s -> ${duckMd5long("s")})"
    perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform($hashes, h -> ($a * (h % $P) + $b) % $P)) as minh$i"
    }
  }

  private val langWords: Seq[(String, String)] = Seq(
    "de" -> "'der','die','das','und','ein'",
    "en" -> "'the','a','of','and','to'",
    "es" -> "'el','la','los','de','y'",
    "fr" -> "'le','les','des','et','un'",
    "zh" -> "'de','le','he','shi','zai'")

  /** Top adjacent pair of `wcol` by wcnt-weighted frequency — one round of
    * BPE pair election (1 row, broadcastable). */
  private def bpeTop1(df: org.apache.spark.sql.DataFrame, wcol: String,
      pOut: String, nOut: String) =
    df.filter(length(col(wcol)) >= 2)
      .select(col("wcnt"), explode(expr(
        s"transform(sequence(1, length($wcol) - 1), i -> substring($wcol, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("wcnt").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(1)
      .select(col("pair").as(pOut), col("n").as(nOut))

  /** The 3-round BPE merge chain over the distinct-word table — the shared
    * front of q156 (merge rules) and q162 (compression curve). Returns
    * (m1, m2, m3, wc4) where each m is a 1-row (pair, count) winner and
    * wc4 carries (w, wcnt, w2, w3, w4) with merges applied as chr(1..3). */
  private def bpeChain(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val wc = Tables.table(s, dir, "documents")
      .select(explode(expr("tokenize_text(text)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
    val m1 = bpeTop1(wc, "w", "p1", "n1")
    val wc2 = wc.crossJoin(broadcast(m1))
      .withColumn("w2", expr("replace(w, p1, chr(1))"))
    val m2 = bpeTop1(wc2, "w2", "p2", "n2")
    val wc3 = wc2.crossJoin(broadcast(m2))
      .withColumn("w3", expr("replace(w2, p2, chr(2))"))
    val m3 = bpeTop1(wc3, "w3", "p3", "n3")
    val wc4 = wc3.crossJoin(broadcast(m3))
      .withColumn("w4", expr("replace(w3, p3, chr(3))"))
    (m1, m2, m3, wc4)
  }

  /** DuckDB twin of [[bpeChain]]: CTEs wc, m1, wc2, m2, wc3, m3 (wc2/wc3
    * carry the merged spellings w2/w3 alongside wcnt). */
  private val duckBpeCtes: String = """
        wc AS (
          SELECT w, COUNT(1) AS wcnt
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY w),
        m1 AS (
          SELECT pair AS p1, CAST(n AS BIGINT) AS n1 FROM (
            SELECT pair, SUM(wcnt) AS n
            FROM (SELECT wcnt, unnest(list_transform(range(1, length(w)),
                    i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
                  FROM wc WHERE length(w) >= 2)
            GROUP BY pair ORDER BY n DESC, pair LIMIT 1)),
        wc2 AS (
          SELECT w, wcnt, replace(w, (SELECT p1 FROM m1), chr(1)) AS w2 FROM wc),
        m2 AS (
          SELECT pair AS p2, CAST(n AS BIGINT) AS n2 FROM (
            SELECT pair, SUM(wcnt) AS n
            FROM (SELECT wcnt, unnest(list_transform(range(1, length(w2)),
                    i -> substring(w2, CAST(i AS INTEGER), 2))) AS pair
                  FROM wc2 WHERE length(w2) >= 2)
            GROUP BY pair ORDER BY n DESC, pair LIMIT 1)),
        wc3 AS (
          SELECT w, wcnt, w2, replace(w2, (SELECT p2 FROM m2), chr(2)) AS w3 FROM wc2),
        m3 AS (
          SELECT pair AS p3, CAST(n AS BIGINT) AS n3 FROM (
            SELECT pair, SUM(wcnt) AS n
            FROM (SELECT wcnt, unnest(list_transform(range(1, length(w3)),
                    i -> substring(w3, CAST(i AS INTEGER), 2))) AS pair
                  FROM wc3 WHERE length(w3) >= 2)
            GROUP BY pair ORDER BY n DESC, pair LIMIT 1))"""

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q23
    Q(
      "q23_dedup_exact",
      (s, dir) =>
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            expr("md5(text)").as("content_hash"),
            expr("count(1) over (partition by md5(text))").as("n_copies"),
            expr("min(doc_id) over (partition by md5(text))").as("canonical_id"))
          .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id, md5(text) AS content_hash,
               COUNT(1) OVER (PARTITION BY md5(text)) AS n_copies,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
               doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        FROM documents ORDER BY doc_id"""),
      "Exact dedup: content-hash grouping with canonical-representative election. " +
        "At 100 TB this is one hash-shuffle; the window could be a groupBy+join but stays one pass here."),

    // ---------------------------------------------------------------- q24
    Q(
      "q24_minhash_signatures",
      (s, dir) => minhashSigs(s, dir).transform(d => SortOut.sortedOut(d, "doc_id")),
      Some(s"""
        SELECT doc_id, ${duckMinhashSelect.mkString(", ")},
               minh0::VARCHAR || '_' || minh1::VARCHAR AS band0,
               minh2::VARCHAR || '_' || minh3::VARCHAR AS band1
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 3
        ORDER BY doc_id"""),
      "MinHash: 4 permutation-min signatures over word-3-gram shingles, banded 2x2 for LSH."),

    // ---------------------------------------------------------------- q25
    Q(
      "q25_lsh_buckets",
      (s, dir) => {
        val sigs = minhashSigs(s, dir)
        val b0 = sigs.select(lit(0).as("band_no"), col("band0").as("band_key"), col("doc_id"))
        val b1 = sigs.select(lit(1).as("band_no"), col("band1").as("band_key"), col("doc_id"))
        b0.union(b1)
          .groupBy("band_no", "band_key")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .filter(col("n_docs") >= 2)
          .orderBy("band_no", "band_key")
      },
      Some(s"""
        WITH sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs)
        SELECT band_no, band_key, COUNT(1) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM banded GROUP BY band_no, band_key HAVING COUNT(1) >= 2
        ORDER BY band_no, band_key"""),
      "LSH candidate buckets: near-duplicate groups = bands shared by >=2 docs. " +
        "Bucket-join beats the quadratic all-pairs compare at scale."),

    // ---------------------------------------------------------------- q26
    Q(
      "q26_simhash",
      (s, dir) =>
        simhashSigs(s, dir)
          .selectExpr("doc_id", s"$sparkSimhash as simhash16", "size(toks) as n_tokens")
          .orderBy("doc_id"),
      Some {
        val hs = s"list_transform(toks, s -> ${duckMd5long("s")})"
        s"""
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 16), j ->
                 CASE WHEN 2 * len(list_filter($hs, h -> ((h >> j) & 1) = 1)) >= len(toks)
                      THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS simhash16,
               len(toks) AS n_tokens
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 1
        ORDER BY doc_id"""
      },
      "SimHash: 16-bit majority-vote fingerprint over token hashes (near-dup by Hamming distance)."),

    // ---------------------------------------------------------------- q27
    Q(
      "q27_jaccard_consecutive",
      (s, dir) => {
        val d = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"$sparkShingles as sh")
        val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        a.join(b, col("doc_b") === col("doc_a") + 1)
          .selectExpr(
            "doc_a", "doc_b",
            "size(array_intersect(sh_a, sh_b)) as n_common",
            "size(array_union(sh_a, sh_b)) as n_union",
            "cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b)) as jaccard")
          .transform(d => SortOut.sortedOut(d, "doc_a"))
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, $duckShingles AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.sh, b.sh)) AS n_common,
               len(list_distinct(list_concat(a.sh, b.sh))) AS n_union,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        ORDER BY doc_a"""),
      "Exact n-gram Jaccard similarity on consecutive doc pairs (set semantics on shingles)."),

    // ---------------------------------------------------------------- q28
    Q(
      "q28_langid",
      (s, dir) => {
        val scores = langWords.map { case (l, ws) =>
          s"size(array_intersect(toks, array($ws))) as s_$l"
        }
        val caseChain = langWords.map(_._1).map { l =>
          val geAll = langWords.map(_._1).filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" and ")
          s"when $geAll then '$l'"
        }.mkString(" ")
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .selectExpr(Seq("doc_id", "lang") ++ scores: _*)
          .selectExpr(
            "doc_id", "lang", "s_de", "s_en", "s_es", "s_fr", "s_zh",
            s"case $caseChain end as predicted")
          .withColumn("hit", col("predicted") === col("lang"))
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some {
        val scores = langWords.map { case (l, ws) =>
          s"len(list_intersect(toks, [$ws])) AS s_$l"
        }
        val caseChain = langWords.map(_._1).map { l =>
          val geAll = langWords.map(_._1).filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
          s"WHEN $geAll THEN '$l'"
        }.mkString(" ")
        s"""
        SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
               CASE $caseChain END AS predicted,
               (CASE $caseChain END) = lang AS hit
        FROM (
          SELECT doc_id, lang, ${scores.mkString(", ")}
          FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents))
        ORDER BY doc_id"""
      },
      "Language-ID heuristic: distinct stopword-overlap score per language, deterministic argmax."),

    // ---------------------------------------------------------------- q29
    Q(
      "q29_quality_score",
      (s, dir) =>
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tokens", size(col("toks")))
          // shared signal definition (also drives the Curation operator)
          .withColumn("avg_token_len",
            graft.operators.TextSignals.avgTokenLen(col("text"), col("n_tokens")))
          .selectExpr(
            "doc_id",
            "length(text) as n_chars_actual",
            "n_chars as n_chars_meta",
            "n_tokens",
            "avg_token_len",
            "cast(size(filter(toks, x -> x in ('the', 'a', 'of', 'and', 'to'))) as double) / size(toks) as stop_ratio",
            // empty-doc guard: /0 throws under Spark's default ANSI mode
            "case when length(text) = 0 then cast(0.0 as double) else cast(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '')) as double) / length(text) end as punct_ratio")
          .withColumn(
            "quality",
            expr("case when n_tokens >= 20 and avg_token_len between 2.0 and 8.0 then 'ok' else 'low' end"))
          .transform(d => SortOut.sortedOut(d, "doc_id")),
      Some("""
        SELECT doc_id,
               LENGTH(text) AS n_chars_actual,
               n_chars AS n_chars_meta,
               len(toks) AS n_tokens,
               CAST(LENGTH(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS avg_token_len,
               CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) / len(toks) AS stop_ratio,
               CASE WHEN LENGTH(text) = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / LENGTH(text) END AS punct_ratio,
               CASE WHEN len(toks) >= 20 AND CAST(LENGTH(text) - (len(toks) - 1) AS DOUBLE) / len(toks) BETWEEN 2.0 AND 8.0
                    THEN 'ok' ELSE 'low' END AS quality
        FROM (SELECT doc_id, n_chars, text, string_split(text, ' ') AS toks FROM documents)
        ORDER BY doc_id"""),
      "Document quality scoring: length agreement, token stats, stopword + punctuation ratios."),

    // ---------------------------------------------------------------- q30
    Q(
      "q30_token_stats",
      (s, dir) =>
        table(s, dir, "documents")
          .selectExpr(
            "doc_id",
            "size(tokenize_text(text)) as n_ws_tokens",
            "size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) as n_re_tokens",
            "size(filter(tokenize_text(text), t -> length(t) > 5)) as n_long_tokens",
            "size(array_distinct(tokenize_text(text))) as n_distinct_tokens")
          .transform(d => SortOut.sortedOut(d, "doc_id")),
      Some("""
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens,
               len(list_filter(string_split(text, ' '), t -> LENGTH(t) > 5)) AS n_long_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
        FROM documents ORDER BY doc_id"""),
      "Token counting: whitespace vs regex (BPE-ish pre-tokenizer) vs distinct vocabulary."),

    // ---------------------------------------------------------------- q31
    Q(
      "q31_fingerprint",
      (s, dir) =>
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          // hash shingles once; inlining $hs into all four outputs would
          // re-run the md5 pass per column (no cross-expression sharing)
          .withColumn("hs", expr("word_ngram_hash48(toks, 3)"))
          .selectExpr(
            "doc_id",
            "array_min(hs) as fp_min",
            "array_max(hs) as fp_max",
            "size(array_distinct(hs)) as n_distinct_shingles",
            "size(hs) as n_shingles")
          .transform(d => SortOut.sortedOut(d, "doc_id")),
      Some {
        val hs = s"list_transform($duckShingles, s -> ${duckMd5long("s")})"
        s"""
        SELECT doc_id,
               list_min($hs) AS fp_min,
               list_max($hs) AS fp_max,
               len(list_distinct($hs)) AS n_distinct_shingles,
               len($hs) AS n_shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 3
        ORDER BY doc_id"""
      },
      "Rolling-hash document fingerprint: min/max shingle hash (winnowing-style) + shingle diversity."),

    // ---------------------------------------------------------------- q32
    Q(
      "q32_multimodal_binary",
      (s, dir) =>
        table(s, dir, "documents")
          // The opaque-binary path a media pipeline would use: payload bytes +
          // typed metadata columns; decode/feature-extract happens downstream
          // (see graft.operators.Multimodal for the stubbed decode plumbing).
          .selectExpr(
            "doc_id",
            "cast(text as binary) as payload",
            "source")
          .selectExpr(
            "doc_id",
            "octet_length(payload) as n_bytes",
            "substr(hex(payload), 1, 16) as header_hex",
            "md5(payload) as checksum",
            "source")
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               substr(hex(encode(text)), 1, 16) AS header_hex,
               md5(text) AS checksum,
               source
        FROM documents ORDER BY doc_id"""),
      "Multimodal plumbing: opaque binary payload column with metadata extraction " +
        "(byte length, magic-header hex, checksum) — the schema shape for image/audio blobs."),

    // ---------------------------------------------------------------- q35
    Q(
      "q35_simhash_hamming",
      (s, dir) => {
        val sigs = simhashSigs(s, dir).selectExpr("doc_id", s"$sparkSimhash as sh")
        val a = sigs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        val b = sigs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        a.join(b, col("doc_b") === col("doc_a") + 1)
          .selectExpr(
            "doc_a", "doc_b", "sh_a", "sh_b",
            "cast(bit_count(sh_a ^ sh_b) as integer) as hamming")
          .transform(d => SortOut.sortedOut(d, "doc_a"))
      },
      Some {
        val hs = s"list_transform(toks, s -> ${duckMd5long("s")})"
        val bitsum = s"""CAST(list_sum(list_transform(range(0, 16), j ->
          CASE WHEN 2 * len(list_filter($hs, h -> ((h >> j) & 1) = 1)) >= len(toks)
               THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)"""
        s"""
        WITH sigs AS (
          SELECT doc_id, $bitsum AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 1)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
        FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 1
        ORDER BY doc_a"""
      },
      "SimHash near-dup scoring: Hamming distance between consecutive docs' signatures " +
        "(bit_count of xor — low distance = near-duplicate candidate)."),

    // ---------------------------------------------------------------- q36
    Q(
      "q36_approx_distinct",
      (s, dir) =>
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"))
          // The sketch VALUE is engine-specific, so it can't be hashed
          // against DuckDB — but its accuracy contract can: emit the exact
          // count plus a boolean asserting the HLL++ estimate landed within
          // 3x the default relative standard deviation (0.05). The oracle
          // asserts literal TRUE, so a sketch regression (or an estimate
          // drifting outside tolerance on this fixed corpus) breaks the hash
          // instead of hiding behind a rows-only check.
          .select(
            col("l_returnflag"),
            col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts"))
              <= col("exact_parts") * 0.15).as("approx_within_tol"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS approx_within_tol
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "approx_count_distinct (HyperLogLog++) next to the exact count — the sketch " +
        "path that replaces exact distinct at 100 TB. Oracle-checked via the exact " +
        "count and the sketch's 3-sigma accuracy contract (engine-specific estimate " +
        "values can't hash-match across engines, their error bound can)."),

    // ---------------------------------------------------------------- q48
    Q(
      "q48_shingle_pairs",
      (s, dir) => {
        // Inverted-index candidate generation: explode each doc into its
        // DISTINCT shingles, self-join on the shingle (the "posting list"),
        // and keep pairs sharing >= 2 shingles — then score those candidates
        // with exact Jaccard. This is the all-pairs near-dup search that LSH
        // (q25/q38) approximates: cost is Σ df² over surviving shingles, not
        // n² over docs. The Σ df² bound only holds if no shingle's posting
        // list explodes, so STOP SHINGLES (df > cutoff) are removed before
        // the self-join: the hot set is tiny by Zipf, so it rides a
        // broadcast anti-join rather than shuffling the posting lists again.
        // Set sizes are recomputed over SURVIVING shingles, keeping
        // n_common/n_a/n_b mutually consistent (the standard near-dup
        // representation: stop shingles carry no signal and are excluded
        // from the set, exactly as stopwords are from bag-of-words models).
        val rawPosts = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"array_distinct($sparkShingles) as sh")
          .select(col("doc_id"), explode(col("sh")).as("shingle"))
        val hot = rawPosts.groupBy("shingle")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > StopShingleDf)
          .select("shingle")
        // n_sh is computed in its own windowed projection AFTER the cutoff:
        // Jaccard denominators must describe the same sets the intersection
        // counts, and a window over doc_id costs one shuffle that the
        // downstream orderBy largely reuses.
        val posts = rawPosts.join(broadcast(hot), Seq("shingle"), "left_anti")
          .withColumn("n_sh",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
        val a = posts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"), col("shingle"))
        val b = posts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"), col("shingle"))
        a.join(b, Seq("shingle"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b", "n_a", "n_b")
          .agg(count(lit(1)).as("n_common"))
          .filter(col("n_common") >= 2)
          .withColumn("jaccard",
            col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
          .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, list_distinct($duckShingles) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        rawposts AS (SELECT doc_id, unnest(sh) AS shingle FROM d),
        hot AS (SELECT shingle FROM rawposts GROUP BY shingle HAVING COUNT(1) > $StopShingleDf),
        posts AS (
          SELECT doc_id, shingle,
                 COUNT(1) OVER (PARTITION BY doc_id) AS n_sh
          FROM rawposts WHERE shingle NOT IN (SELECT shingle FROM hot)),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.n_sh AS n_a, b.n_sh AS n_b, COUNT(1) AS n_common
          FROM posts a JOIN posts b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh HAVING COUNT(1) >= 2)
        SELECT doc_a, doc_b, n_common, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jaccard
        FROM pairs
        ORDER BY doc_a, doc_b"""),
      "Inverted-index near-dup candidate pairs (docs sharing >= 2 shingles, stop shingles " +
        s"with df > $StopShingleDf removed via broadcast anti-join) scored with exact " +
        "Jaccard — the exact counterpart LSH approximates; cost bounded by Σ df² over " +
        "surviving posting lists, not doc-pair count."),

    // ---------------------------------------------------------------- q49
    Q(
      "q49_tfidf_top_terms",
      (s, dir) => {
        // TF-IDF top-3 terms per document. Ranking is INTEGER-deterministic
        // (tf desc, df asc, term asc) so the top-k selection can never hinge
        // on a last-bit log() difference between engines; the tfidf score
        // itself is emitted rounded (both engines' log are within 1 ulp).
        val toks = table(s, dir, "documents")
          .select(col("doc_id"), explode(expr("tokenize_text(text)")).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = table(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)
        tf.join(df, "term")
          .crossJoin(broadcast(n))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .withColumn("tfidf",
            round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
          .select("doc_id", "rank", "term", "tf", "df", "tfidf")
          .orderBy("doc_id", "rank")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(1) AS tf FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(1) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(1) AS n_docs FROM documents),
        ranked AS (
          SELECT t.doc_id, t.term, t.tf, d.df,
                 row_number() OVER (PARTITION BY t.doc_id
                                    ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rank
          FROM tf t JOIN df d USING (term))
        SELECT doc_id, rank, term, tf, df,
               ROUND(tf * LN((n.n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
        FROM ranked CROSS JOIN n
        WHERE rank <= 3 ORDER BY doc_id, rank"""),
      "TF-IDF top terms per document: two-level aggregation (term frequency, document " +
        "frequency) + broadcast corpus size + per-doc ranking window. Integer-deterministic " +
        "rank keeps the top-k stable across engines."),

    // ---------------------------------------------------------------- q50
    Q(
      "q50_stratified_sample",
      (s, dir) => {
        // Deterministic hash-based stratified sampling — the reproducible
        // downsampling step of a training-data pipeline: each language gets
        // its own keep-rate, membership is a pure function of doc_id (48-bit
        // md5 bucket), so the sample is stable across runs, engines, and
        // partitionings. Map-only: no shuffle at any scale.
        table(s, dir, "documents")
          .withColumn("bucket", expr(s"${md5long("cast(doc_id as string)")} % 100"))
          .withColumn("keep_rate",
            when(col("lang") === "en", 20).otherwise(50))
          .filter(col("bucket") < col("keep_rate"))
          .select("doc_id", "lang", "bucket", "keep_rate", "n_chars")
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id, lang,
               ${duckMd5long("cast(doc_id as varchar)")} % 100 AS bucket,
               CASE WHEN lang = 'en' THEN 20 ELSE 50 END AS keep_rate,
               n_chars
        FROM documents
        WHERE ${duckMd5long("cast(doc_id as varchar)")} % 100
              < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
        ORDER BY doc_id"""),
      "Stratified deterministic sampling: per-stratum keep-rates with hash-bucket " +
        "membership — reproducible across runs/engines/partitionings, map-only at scale."),

    // ---------------------------------------------------------------- q55
    Q(
      "q55_repetition",
      (s, dir) =>
        // Intra-document repetition — the classic "duplicate n-gram
        // fraction" quality filter (high values flag boilerplate/spam in a
        // training corpus). Map-only: every metric derives from the doc's
        // own 5-gram multiset, no shuffle at any scale; the dup fraction is
        // an exact integer ratio, so it hashes identically cross-engine.
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 5)
          .selectExpr("doc_id", "word_ngrams(toks, 5) as g5")
          .select(
            col("doc_id"),
            size(col("g5")).as("n_grams"),
            size(array_distinct(col("g5"))).as("n_distinct"),
            // shared signal definition (also drives the Curation operator)
            graft.operators.TextSignals.dupFrac5(col("g5")).as("dup_frac"))
          .transform(d => SortOut.sortedOut(d, "doc_id")),
      Some("""
        WITH g AS (
          SELECT doc_id,
                 list_transform(range(1, len(toks) - 3),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                        toks[i+3] || ' ' || toks[i+4]) AS g5
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 5)
        SELECT doc_id, len(g5) AS n_grams, len(list_distinct(g5)) AS n_distinct,
               CAST(len(g5) - len(list_distinct(g5)) AS DOUBLE) / len(g5) AS dup_frac
        FROM g ORDER BY doc_id"""),
      "Duplicate 5-gram fraction per document — the standard intra-doc repetition " +
        "quality filter; map-only, exact integer ratios."),

    // ---------------------------------------------------------------- q56
    Q(
      "q56_decontam",
      (s, dir) => {
        // Benchmark decontamination: fraction of each document's distinct
        // 3-grams that also appear in a held-out eval set (docs 0-9 here).
        // The eval shingle set is tiny and broadcasts; the corpus side is
        // one explode + one broadcast left join + one per-doc aggregation —
        // no corpus-sized shuffle beyond the doc_id agg, the shape that
        // screens a 100 TB training corpus against a fixed benchmark.
        // Shared screen definition (also drives the Curation operator).
        val docs = table(s, dir, "documents")
        graft.operators.TextSignals
          .contamStats(
            docs.filter(col("doc_id") >= 10),
            docs.filter(col("doc_id") < 10),
            "doc_id", "text", n = 3)
          .select("doc_id", "n_sh", "n_overlap", "contam_frac")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, list_distinct($duckShingles) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        posts AS (SELECT doc_id, unnest(sh) AS shingle FROM d),
        eval AS (SELECT DISTINCT shingle FROM posts WHERE doc_id < 10)
        SELECT p.doc_id, COUNT(1) AS n_sh,
               CAST(COUNT(e.shingle) AS BIGINT) AS n_overlap,
               CAST(COUNT(e.shingle) AS DOUBLE) / COUNT(1) AS contam_frac
        FROM posts p LEFT JOIN eval e ON p.shingle = e.shingle
        WHERE p.doc_id >= 10
        GROUP BY p.doc_id ORDER BY p.doc_id"""),
      "Eval-set decontamination: per-doc fraction of distinct 3-grams shared with a " +
        "held-out benchmark set — broadcast the (tiny) eval shingles, screen the corpus " +
        "with one map-side join + per-doc aggregation."),

    // ---------------------------------------------------------------- q57
    Q(
      "q57_dedup_keeplist",
      (s, dir) => {
        // The end-to-end answer to "which document do I keep?": LSH
        // candidate pairs -> connected components -> canonical election.
        // Composes the reusable operators (Dedup.minhashLshCandidates,
        // Dedup.clusters) whose defaults match the q24/q25 signature scheme,
        // so the oracle can re-derive the same pairs in SQL. Docs that never
        // pair (including <3-token docs, which produce no shingles) are
        // their own singleton cluster. At 100 TB: candidate generation is
        // bucket-bounded, CC is O(log diameter) rounds over the (tiny)
        // pair graph, and the final join is one shuffle on doc_id.
        val docs = table(s, dir, "documents")
        val cand = graft.operators.Dedup.minhashLshCandidates(s, docs, "doc_id", "text")
        val cc = graft.operators.Dedup.clusters(cand).withColumnRenamed("id", "doc_id")
        docs.select("doc_id")
          .join(cc, Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
          .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("cluster_id")))
          .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        SELECT d.doc_id,
               COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
               COUNT(1) OVER (PARTITION BY COALESCE(cc.cluster_id, d.doc_id)) AS cluster_size,
               d.doc_id = COALESCE(cc.cluster_id, d.doc_id) AS is_keeper
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
        ORDER BY d.doc_id"""),
      "End-to-end dedup keep-list: MinHash-LSH candidate pairs -> connected-component " +
        "cluster ids (min reachable doc id) -> canonical keeper election, one row per " +
        "document. The full pipeline a training-data dedup pass actually runs."),

    // ---------------------------------------------------------------- q60
    Q(
      "q60_curation_pipeline",
      (s, dir) => {
        // The WHOLE curation pass in one call: quality + repetition +
        // decontamination + exact dedup + near-dup keep-list, composed by
        // the Curation operator from the same stage rules as q29/q55/q56/
        // q23/q57 (so the oracle re-derives each stage from its verified
        // SQL fragment). Corpus = docs >= 10, eval benchmark = docs < 10.
        val docs = table(s, dir, "documents")
        graft.operators.Curation.keepList(
            s,
            corpus = docs.filter(col("doc_id") >= 10),
            eval = docs.filter(col("doc_id") < 10),
            idCol = "doc_id",
            textCol = "text")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE
        $duckCurationCtes
        SELECT s.doc_id, s.n_tokens, s.avg_token_len,
               (s.n_tokens >= 20 AND s.avg_token_len BETWEEN 2.0 AND 8.0) AS quality_ok,
               s.dup_frac, s.dup_frac <= 0.2 AS repetition_ok,
               COALESCE(c.contam_frac, CAST(0.0 AS DOUBLE)) AS contam_frac,
               COALESCE(c.contam_frac, CAST(0.0 AS DOUBLE)) <= 0.5 AS decontam_ok,
               e.is_canonical,
               COALESCE(cc.cluster_id, s.doc_id) = s.doc_id AS neardup_keeper,
               ((s.n_tokens >= 20 AND s.avg_token_len BETWEEN 2.0 AND 8.0)
                 AND s.dup_frac <= 0.2
                 AND COALESCE(c.contam_frac, CAST(0.0 AS DOUBLE)) <= 0.5
                 AND e.is_canonical
                 AND COALESCE(cc.cluster_id, s.doc_id) = s.doc_id) AS kept,
               CASE WHEN NOT (s.n_tokens >= 20 AND s.avg_token_len BETWEEN 2.0 AND 8.0) THEN 'quality'
                    WHEN NOT s.dup_frac <= 0.2 THEN 'repetition'
                    WHEN NOT COALESCE(c.contam_frac, CAST(0.0 AS DOUBLE)) <= 0.5 THEN 'contaminated'
                    WHEN NOT e.is_canonical THEN 'exact_dup'
                    WHEN NOT COALESCE(cc.cluster_id, s.doc_id) = s.doc_id THEN 'near_dup'
                    ELSE '(kept)' END AS drop_reason
        FROM sig2 s
        JOIN exact e ON s.doc_id = e.doc_id
        LEFT JOIN contam c ON s.doc_id = c.doc_id
        LEFT JOIN cc ON s.doc_id = cc.id
        ORDER BY s.doc_id"""),
      "The complete curation pass in one call: quality + repetition + decontamination + " +
        "exact dedup + near-dup keep-list with per-stage verdicts and a first-failing " +
        "drop_reason — the Curation operator's use-site, every stage oracle-re-derived."),

    // ---------------------------------------------------------------- q62
    Q(
      "q62_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        // Misra-Gries heavy hitters per language: k bounded counters find
        // every token with freq > n/(k+1) — the sketch that replaces an
        // exact token-count shuffle (one row per DISTINCT token, billions
        // at 100 TB) when only the frequent ones matter. The sketch's
        // estimates are encounter-order-dependent, so the oracle checks its
        // CONTRACT against exact counts (the q36 pattern): never
        // overcounts, undercounts by at most n/(k+1), and every true heavy
        // hitter is present. Integer arithmetic only — cross-engine exact.
        val k = 20
        val toks = table(s, dir, "documents")
          .select(col("lang"), explode(expr("tokenize_text(text)")).as("tok"))
        val exact = toks.groupBy("lang", "tok").agg(count(lit(1)).as("freq"))
        val totals = exact.groupBy("lang")
          .agg(sum("freq").as("n_tokens"), count(lit(1)).as("n_distinct"))
        val top = exact
          .withColumn("rn", row_number().over(
            Window.partitionBy("lang").orderBy(col("freq").desc, col("tok").asc)))
          .filter(col("rn") === 1)
          .select(col("lang"), col("tok").as("top_token"), col("freq").as("top_freq"))
        val sketch = toks
          .select(col("lang").as("_1"), col("tok").as("_2")).as[(String, String)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(new graft.operators.HeavyHitters(k).toColumn.name("sketch"))
          .toDF("lang", "sketch")
        val entries = sketch
          .select(col("lang"), explode(col("sketch")).as("e"))
          .select(col("lang"), col("e._1").as("tok"), col("e._2").as("est"))
        // contract A: freq - n/(k+1) <= est <= freq, in exact integers
        val estOk = entries
          .join(exact, Seq("lang", "tok"), "left")
          .join(totals.select("lang", "n_tokens"), Seq("lang"))
          .groupBy("lang")
          .agg(expr(s"bool_and(est <= freq and (freq - est) * ${k + 1} <= n_tokens)")
            .as("est_ok"))
        // contract B: every true heavy hitter (freq > n/(k+1)) is present
        val covOk = exact
          .join(totals.select("lang", "n_tokens"), Seq("lang"))
          .filter(col("freq") * (k + 1) > col("n_tokens"))
          .join(entries.select(col("lang"), col("tok"), lit(1).as("hit")),
            Seq("lang", "tok"), "left")
          .groupBy("lang")
          .agg(expr("bool_and(hit is not null)").as("cov_ok"))
        totals
          .join(top, Seq("lang"))
          .join(estOk, Seq("lang"), "left")
          .join(covOk, Seq("lang"), "left")
          .select(
            col("lang"), col("n_tokens"), col("n_distinct"),
            col("top_token"), col("top_freq"),
            (coalesce(col("est_ok"), lit(true)) &&
              coalesce(col("cov_ok"), lit(true))).as("mg_guarantee_ok"))
          .orderBy("lang")
      },
      Some("""
        WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        exact AS (SELECT lang, tok, COUNT(1) AS freq FROM toks GROUP BY lang, tok),
        tot AS (SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_tokens, COUNT(1) AS n_distinct
                FROM exact GROUP BY lang),
        top AS (SELECT lang, tok AS top_token, freq AS top_freq FROM
                  (SELECT lang, tok, freq,
                          row_number() OVER (PARTITION BY lang ORDER BY freq DESC, tok ASC) AS rn
                   FROM exact)
                WHERE rn = 1)
        SELECT t.lang, t.n_tokens, t.n_distinct, p.top_token, p.top_freq,
               TRUE AS mg_guarantee_ok
        FROM tot t JOIN top p ON t.lang = p.lang
        ORDER BY t.lang"""),
      "Misra-Gries heavy hitters per language under a typed Aggregator with mergeable " +
        "k-counter partials — oracle-checked via exact counts plus the sketch's " +
        "never-overcount / n-over-k-undercount / heavy-covered contract booleans."),

    // ---------------------------------------------------------------- q69
    Q(
      "q69_bloom_decontam",
      (s, dir) => {
        import s.implicits._
        // The q56 screen at sketch cost: the eval set's shingle hashes fold
        // into a FIXED-SIZE bloom (mergeable typed Aggregator, map-side
        // combinable), and the corpus probes it through a codegen'd
        // expression — a few KB broadcast REGARDLESS of eval-set size,
        // where q56's exact screen broadcasts one row per eval shingle.
        // Deterministic: the bloom's bits depend only on the key set, so
        // the flags are reproducible across runs and partitionings. The
        // oracle checks the sketch CONTRACT (the q36/q62 pattern): exact
        // containment anchors the hash; no-false-negatives must hold
        // per-doc; the doc-level false-positive count stays under 10%.
        val docs = table(s, dir, "documents")
        def shingleHashes(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            explode(expr("array_distinct(word_ngram_hash48(toks, 3))")).as("h"))
        val eval = shingleHashes(docs.filter(col("doc_id") < 10))
          .select("h").distinct()
        val bloom = eval.as[Long]
          .select(new graft.operators.BloomAgg(131072, 14).toColumn.name("bloom"))
        val perDoc = shingleHashes(docs.filter(col("doc_id") >= 10))
          .crossJoin(broadcast(bloom))
          .join(broadcast(eval.withColumn("em", lit(1))), Seq("h"), "left")
          .withColumn("bhit", expr("bloom_might_contain(bloom, h)"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_sh"),
            max(col("em").isNotNull).as("exact_hit"),
            max(col("bhit")).as("bloom_hit"))
        // corpus-level FP totals as a 1-row aggregate broadcast BACK onto
        // the per-doc frame — an unpartitioned window here would funnel
        // every doc row through ONE task at scale (the hazard this
        // library's no-single-task-stage discipline exists to kill; caught
        // by the all-queries window audit in PlanShapesSpec)
        val totals = perDoc.agg(
          sum((col("bloom_hit") && !col("exact_hit")).cast("long")).as("fp_docs"),
          count(lit(1)).as("n_docs"))
        perDoc
          .crossJoin(broadcast(totals))
          .select(
            col("doc_id"), col("n_sh"), col("exact_hit"),
            (col("bloom_hit") || !col("exact_hit")).as("no_false_negative"),
            (col("fp_docs") <= greatest(lit(1L), col("n_docs") / 10)).as("fp_below_bound"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        dsh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform($duckShingles, s -> ${duckMd5long("s")}))) AS h
          FROM d WHERE len(toks) >= 3),
        eval AS (SELECT DISTINCT h FROM dsh WHERE doc_id < 10)
        SELECT p.doc_id, COUNT(1) AS n_sh,
               COUNT(e.h) > 0 AS exact_hit,
               TRUE AS no_false_negative,
               TRUE AS fp_below_bound
        FROM dsh p LEFT JOIN eval e ON p.h = e.h
        WHERE p.doc_id >= 10
        GROUP BY p.doc_id ORDER BY p.doc_id"""),
      "Bloom-sketch decontamination screen: eval shingles fold into a fixed-size " +
        "mergeable bloom (typed Aggregator) probed by a codegen'd expression — " +
        "KB-scale broadcast independent of eval-set size, contract-oracled " +
        "(exact containment + no-false-negatives + bounded doc-level FP rate)."),

    // ---------------------------------------------------------------- q70
    Q(
      "q70_bottomk_sample",
      (s, dir) => {
        // Deterministic uniform sampling by hash order: the k documents with
        // the smallest salted md5 — a coordination-free distributed sample
        // that is REPRODUCIBLE across runs, engines, partitionings, and
        // (critically for incremental pipelines) stable under corpus
        // growth: a doc leaves the sample only when a smaller-hashed doc
        // arrives, never because partitioning moved. Plans as
        // TakeOrderedAndProject: each partition keeps its k smallest, the
        // driver merges — no global sort, no shuffle of the corpus.
        val k = 100
        table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            expr(md5long("concat('smp1|', cast(doc_id as string))")).as("hkey"))
          .orderBy("hkey", "doc_id")
          .limit(k)
      },
      Some(s"""
        SELECT doc_id, source,
               ${duckMd5long("'smp1|' || cast(doc_id as varchar)")} AS hkey
        FROM documents
        ORDER BY hkey, doc_id
        LIMIT 100"""),
      "Bottom-k-by-salted-hash sampling: a deterministic, engine- and partitioning- " +
        "stable uniform sample via TakeOrderedAndProject — per-partition top-k merge, " +
        "never a global sort."),

    // ---------------------------------------------------------------- q71
    Q(
      "q71_token_chunks",
      (s, dir) => {
        // Context-window chunking via the Chunker operator: 32-token windows
        // at stride 16 (50% overlap) — the curation-to-tokenization splitter.
        // Map-only (tokenize + Generate + slice); the chunk text never
        // leaves the executor, only its hash and length do.
        graft.operators.Chunker
          .slidingTokenWindows(table(s, dir, "documents"), "text", 32, 16)
          .withColumn("chunk_hash", expr(md5long("chunk_text")))
          .select("doc_id", "chunk_no", "start_tok", "n_tok", "chunk_hash")
          .orderBy("doc_id", "chunk_no")
      },
      Some(s"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        st AS (
          SELECT doc_id, toks, len(toks) AS n,
                 unnest(range(0, len(toks), 16)) AS start_tok
          FROM d)
        SELECT doc_id,
               CAST(start_tok // 16 AS BIGINT) AS chunk_no,
               CAST(start_tok AS INTEGER) AS start_tok,
               CAST(least(32, n - start_tok) AS BIGINT) AS n_tok,
               ${duckMd5long("array_to_string(list_slice(toks, start_tok + 1, start_tok + 32), ' ')")} AS chunk_hash
        FROM st
        ORDER BY doc_id, chunk_no"""),
      "Sliding 32-token windows at stride 16 through the Chunker operator — map-only " +
        "Generate + slice, chunk text hashed in place so only fixed-width columns move."),

    // ---------------------------------------------------------------- q72
    Q(
      "q72_pii_extract",
      (s, dir) => {
        // PII extraction + redaction: emails, phone numbers, and IPv4s
        // counted and masked in one codegen'd regexp pass — map-only, the
        // shape of a pre-training privacy scrub at any scale. The corpus
        // text is synthetic word soup, so the PII-bearing text is BUILT
        // deterministically from customer fields (same construction on
        // both engines), making extraction counts and the redacted-text
        // hash exactly oracle-checkable. Patterns stay in the RE2-safe
        // subset (no lookaround/backrefs) so Java and DuckDB agree.
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phone = "555-[0-9]{4}"
        val ip = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
        val k = col("c_custkey")
        def s10(c: org.apache.spark.sql.Column) = c.cast("string")
        val txt = concat(
          col("c_name"), lit(" <user"), s10(k), lit("@mail"), s10(k % 10),
          lit(".example.com>"),
          when(k % 3 === 0,
            concat(lit(" cc backup"), s10(k), lit("@mail.example.org")))
            .otherwise(lit("")),
          when(k % 2 === 0,
            concat(lit(" tel 555-"), lpad(s10(k % 10000), 4, "0")))
            .otherwise(lit("")),
          lit(" ip 10."), s10(k % 256), lit("."), s10(k % 7), lit("."), s10(k % 250))
        table(s, dir, "customer")
          .filter(k < 2000)
          .withColumn("txt", txt)
          .withColumn("n_emails", size(regexp_extract_all(col("txt"), lit(email), lit(0))))
          .withColumn("n_phones", size(regexp_extract_all(col("txt"), lit(phone), lit(0))))
          .withColumn("n_ips", size(regexp_extract_all(col("txt"), lit(ip), lit(0))))
          .withColumn("red",
            regexp_replace(regexp_replace(regexp_replace(col("txt"),
              email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>"))
          .select(col("c_custkey"), col("n_emails"), col("n_phones"), col("n_ips"),
            length(col("red")).as("red_len"),
            expr(md5long("red")).as("red_hash"))
          .orderBy("c_custkey")
      },
      Some(s"""
        WITH t AS (
          SELECT c_custkey,
                 c_name || ' <user' || CAST(c_custkey AS VARCHAR) ||
                 '@mail' || CAST(c_custkey % 10 AS VARCHAR) || '.example.com>' ||
                 CASE WHEN c_custkey % 3 = 0
                      THEN ' cc backup' || CAST(c_custkey AS VARCHAR) || '@mail.example.org'
                      ELSE '' END ||
                 CASE WHEN c_custkey % 2 = 0
                      THEN ' tel 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END ||
                 ' ip 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
                 CAST(c_custkey % 7 AS VARCHAR) || '.' || CAST(c_custkey % 250 AS VARCHAR)
                   AS txt
          FROM customer WHERE c_custkey < 2000),
        r AS (
          SELECT c_custkey, txt,
                 regexp_replace(regexp_replace(regexp_replace(txt,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '555-[0-9]{4}', '<PHONE>', 'g'),
                   '10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g') AS red
          FROM t)
        SELECT c_custkey,
               len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(txt, '555-[0-9]{4}')) AS n_phones,
               len(regexp_extract_all(txt, '10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ips,
               CAST(length(red) AS INTEGER) AS red_len,
               ${duckMd5long("red")} AS red_hash
        FROM r
        ORDER BY c_custkey"""),
      "PII extraction and redaction in one map-only regexp pass over deterministically " +
        "constructed contact text — counts, redacted length, and redacted-text hash all " +
        "exactly oracle-matched (RE2-safe pattern subset)."),

    // ---------------------------------------------------------------- q73
    Q(
      "q73_sequence_pack",
      (s, dir) => {
        // Concat-and-split sequence packing (GPT-style pre-training): every
        // document's whitespace tokens concatenate in doc_id order into one
        // global token stream, split into 64-token context windows. The
        // Packer operator computes each doc's global token offset with a
        // two-phase running sum — range-bucketed partial sums + broadcast
        // bucket offsets — so no task ever window-sorts more than
        // ~rows/nBuckets rows (a bare Window.orderBy would collapse the
        // corpus into ONE task at 100 TB).
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            size(expr("tokenize_text(text)")).cast("long").as("n_tok"))
        graft.operators.Packer
          .withSequenceOffsets(docs, "doc_id", "n_tok", ctxLen = 64)
          .select("doc_id", "n_tok", "tok_offset", "first_seq", "last_seq", "n_seqs")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
        o AS (
          SELECT doc_id, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS tok_offset
          FROM d)
        SELECT doc_id, n_tok, tok_offset,
               tok_offset // 64 AS first_seq,
               (tok_offset + greatest(n_tok, 1) - 1) // 64 AS last_seq,
               (tok_offset + greatest(n_tok, 1) - 1) // 64
                 - tok_offset // 64 + 1 AS n_seqs
        FROM o
        ORDER BY doc_id"""),
      "Sequence packing offsets through the Packer operator: global running token " +
        "sum via range-bucketed two-phase aggregation (never a single-task global " +
        "window), each doc mapped to its 64-token context-window span."),

    // ---------------------------------------------------------------- q74
    Q(
      "q74_mixture_sample",
      (s, dir) => {
        // Training-mixture sampling through the Mixture operator: each
        // source keeps a target fraction of its docs by salted-hash
        // threshold — deterministic per doc (stable under reruns, engine
        // swaps, repartitioning, AND corpus growth), broadcast rate table,
        // map-only over the corpus. src4 drops entirely (rate 0), unlisted
        // sources take the 0.6 default.
        graft.operators.Mixture.sampleByRates(
          table(s, dir, "documents"),
          sourceCol = "source", keyCol = "doc_id",
          rates = Map("src1" -> 0.8, "src2" -> 0.5, "src3" -> 0.25, "src4" -> 0.0),
          defaultRate = 0.6, salt = "mix1")
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id, source FROM documents
        WHERE ${duckMd5long("'mix1|' || cast(doc_id as varchar)")} % 1000000 <
              CASE source WHEN 'src1' THEN 800000 WHEN 'src2' THEN 500000
                          WHEN 'src3' THEN 250000 WHEN 'src4' THEN 0
                          ELSE 600000 END
        ORDER BY doc_id"""),
      "Deterministic mixture sampling via the Mixture operator: broadcast per-source " +
        "rate table + salted-hash threshold filter — map-only, reproducible, and " +
        "stable under corpus growth (no rng, no partition dependence)."),

    // ---------------------------------------------------------------- q75
    Q(
      "q75_editdist_verify",
      (s, dir) => {
        // The verification stage a production dedup pass runs AFTER LSH:
        // exact edit distance scores each candidate pair, confirming or
        // rejecting the sketch's guess. Cost discipline at 100 TB: the
        // O(len²) levenshtein runs ONLY on the LSH-bounded candidate set
        // (Σ bucket², never corpus²), and the two text lookups are plain
        // doc_id equi-joins — sort-merge/bucket-able, one shuffle each.
        // All outputs are integers/booleans: exact cross-engine.
        val docs = table(s, dir, "documents")
        val cand = graft.operators.Dedup.minhashLshCandidates(s, docs, "doc_id", "text")
        val ta = docs.select(col("doc_id").as("id_a"), col("text").as("text_a"))
        val tb = docs.select(col("doc_id").as("id_b"), col("text").as("text_b"))
        cand.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
          .withColumn("lev", levenshtein(col("text_a"), col("text_b")).cast("long"))
          .withColumn("max_len",
            greatest(length(col("text_a")), length(col("text_b"))).cast("long"))
          // integer spelling of lev/max_len <= 0.30: no double rounding risk
          .withColumn("verified", col("lev") * 100 <= col("max_len") * 30)
          .select("id_a", "id_b", "lev", "max_len", "verified")
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id)
        SELECT p.id_a, p.id_b,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
               CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len,
               CAST(levenshtein(da.text, db.text) AS BIGINT) * 100 <=
                 CAST(greatest(length(da.text), length(db.text)) AS BIGINT) * 30 AS verified
        FROM pairs p
        JOIN documents da ON p.id_a = da.doc_id
        JOIN documents db ON p.id_b = db.doc_id
        ORDER BY p.id_a, p.id_b"""),
      "Candidate verification: exact levenshtein over the LSH candidate pairs only " +
        "(never all-pairs) — the sketch-then-verify contract of a production dedup, " +
        "with an integer-arithmetic accept threshold (edit ratio <= 0.30)."),

    // ---------------------------------------------------------------- q79
    Q(
      "q79_incremental_dedup",
      (s, dir) => {
        // Incremental ingest screening: an incoming batch (doc_id >= 400)
        // is admitted only if it is neither an EXACT duplicate (full-md5
        // semi match — full 128-bit hash, never the 48-bit arithmetic
        // prefix, per the birthday-bound rule) nor a NEAR duplicate
        // (shares an LSH band bucket) of the existing corpus. This is the
        // steady-state dedup a training pipeline runs every day: the
        // corpus is never re-clustered — the batch probes it. Scale shape:
        // one shuffle on content hash + one on band key; both sides
        // map-side-distinct first, and the corpus text itself never moves
        // (only its hashes and band keys do).
        val docs = table(s, dir, "documents")
        val sigs = minhashSigs(s, dir)
        val bands =
          sigs.select(lit(0).as("band_no"), col("band0").as("band_key"), col("doc_id"))
            .union(sigs.select(lit(1).as("band_no"), col("band1").as("band_key"), col("doc_id")))
        val corpusBands = bands.filter(col("doc_id") < 400)
          .select("band_no", "band_key").distinct()
        val nearIds = bands.filter(col("doc_id") >= 400)
          .join(corpusBands, Seq("band_no", "band_key"), "left_semi")
          .select("doc_id").distinct()
          .withColumn("near_dup", lit(true))
        val corpusHashes = docs.filter(col("doc_id") < 400)
          .select(md5(col("text")).as("h")).distinct()
          .withColumn("exact_dup", lit(true))
        docs.filter(col("doc_id") >= 400)
          .withColumn("h", md5(col("text")))
          .join(corpusHashes, Seq("h"), "left")
          .join(nearIds, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
            coalesce(col("near_dup"), lit(false)).as("near_dup"),
            (coalesce(col("exact_dup"), lit(false)) ||
              coalesce(col("near_dup"), lit(false))).unary_!.as("admitted"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        cb AS (SELECT DISTINCT band_no, band_key FROM banded WHERE doc_id < 400),
        nb AS (
          SELECT DISTINCT b.doc_id FROM banded b
          JOIN cb ON b.band_no = cb.band_no AND b.band_key = cb.band_key
          WHERE b.doc_id >= 400),
        ch AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 400)
        SELECT d.doc_id,
               EXISTS (SELECT 1 FROM ch WHERE ch.h = md5(d.text)) AS exact_dup,
               EXISTS (SELECT 1 FROM nb WHERE nb.doc_id = d.doc_id) AS near_dup,
               NOT (EXISTS (SELECT 1 FROM ch WHERE ch.h = md5(d.text))
                    OR EXISTS (SELECT 1 FROM nb WHERE nb.doc_id = d.doc_id)) AS admitted
        FROM documents d WHERE d.doc_id >= 400
        ORDER BY d.doc_id"""),
      "Incremental dedup: a new batch probes the existing corpus by full content " +
        "hash (exact) and LSH band bucket (near) — the corpus is never re-clustered, " +
        "only its hashes/bands join, once per key each."),

    // ---------------------------------------------------------------- q82
    Q(
      "q82_dataset_fingerprint",
      (s, dir) => {
        // Order-independent dataset fingerprint per source: XOR and an
        // exact decimal SUM of a canonical per-row hash — the cheap "is
        // this copy/restore/migration content-equivalent?" check a 100 TB
        // pipeline runs after every replication. Map-only hash + one tiny
        // commutative aggregate: partition order, file order, and engine
        // cannot change the answer, by construction. The XOR lane is
        // overflow-free at any row count; the sum lane rides decimal(38,0)
        // (exact to ~10^38 — a bigint sum of 48-bit hashes would overflow,
        // and Spark's ANSI mode would fail it, beyond ~2^15 max-valued
        // rows) and is emitted as a string so both engines agree on type.
        val rowHash = md5long(
          "concat_ws('|', cast(doc_id as string), lang, source, " +
            "cast(n_chars as string), md5(text))")
        table(s, dir, "documents")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(expr(rowHash).cast("decimal(38,0)")).cast("decimal(38,0)")
              .cast("string").as("fp_sum"),
            expr(s"bit_xor($rowHash)").as("fp_xor"))
          .orderBy("source")
      },
      Some(s"""
        WITH h AS (
          SELECT source,
                 ${duckMd5long(
                   "cast(doc_id as varchar) || '|' || lang || '|' || source || '|' || " +
                   "cast(n_chars as varchar) || '|' || md5(text)")} AS rh
          FROM documents)
        SELECT source, COUNT(1) AS n_rows,
               CAST(CAST(SUM(CAST(rh AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS fp_sum,
               BIT_XOR(rh) AS fp_xor
        FROM h GROUP BY source ORDER BY source"""),
      "Per-source dataset fingerprint: SUM + XOR over canonical row hashes — " +
        "order-independent, map-only, one tiny aggregate; the replication/restore " +
        "integrity check that never shuffles the data."),

    // ---------------------------------------------------------------- q83
    Q(
      "q83_token_budget",
      (s, dir) => {
        // Budgeted selection: take documents in priority order (stopword
        // count as the naturalness signal, doc_id tie-break) until a token
        // budget fills — the "best 15k tokens" pass a data-constrained
        // fine-tune runs. The running total routes through Packer's
        // two-phase offsets, so there is NO global single-task sort or
        // window at any corpus size; the budget cut is a map-only filter
        // on the offset.
        val docs = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .withColumn("prio",
            expr("cast(size(filter(toks, x -> x in ('the','a','of','and','to'))) as bigint)"
              + " * 1000000 + doc_id"))
          // Packer folds ascending; priority-DESC order = ascending -prio
          .withColumn("ord", -col("prio"))
          .select("doc_id", "n_tok", "prio", "ord")
        graft.operators.Packer
          .withSequenceOffsets(docs, "ord", "n_tok", ctxLen = 64)
          .filter(col("tok_offset") < 15000)
          .select("doc_id", "prio", "n_tok", "tok_offset")
          .orderBy("tok_offset")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, len(toks) AS n_tok,
                 CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS BIGINT)
                   * 1000000 + doc_id AS prio
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        o AS (
          SELECT doc_id, prio, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (ORDER BY prio DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS tok_offset
          FROM d)
        SELECT doc_id, prio, n_tok, tok_offset
        FROM o WHERE tok_offset < 15000
        ORDER BY tok_offset"""),
      "Priority-ordered token-budget selection: Packer's two-phase running sum " +
        "ranks the corpus by a quality signal and cuts at the budget — no global " +
        "sort, no single-task window, budget filter is map-only."),

    // ---------------------------------------------------------------- q88
    Q(
      "q88_epoch_upsample",
      (s, dir) => {
        // Epoch oversampling — the other half of mixture control: scarce
        // high-value sources REPLICATE (rate 2.5 = two full copies + a
        // half-probability third), abundant ones downsample, in one
        // deterministic map-only pass. The emitted mix_copy index keeps
        // replicas addressable (and lets downstream shuffles spread them);
        // the fractional copy's hash includes the copy index so its keep
        // set is independent of the full copies. Same growth/partition
        // stability contract as q74.
        graft.operators.Mixture.sampleByRatesWithRepeats(
          table(s, dir, "documents"),
          sourceCol = "source", keyCol = "doc_id",
          rates = Map("src1" -> 2.5, "src2" -> 1.0, "src3" -> 0.4, "src4" -> 0.0),
          defaultRate = 1.5, salt = "mixup")
          .select("doc_id", "source", "mix_copy")
          .orderBy("doc_id", "mix_copy")
      },
      Some(s"""
        WITH r AS (
          SELECT doc_id, source,
                 unnest(range(0, CASE source WHEN 'src1' THEN 3 WHEN 'src2' THEN 1
                                             WHEN 'src3' THEN 1 WHEN 'src4' THEN 0
                                             ELSE 2 END)) AS mix_copy
          FROM documents)
        SELECT doc_id, source, CAST(mix_copy AS INTEGER) AS mix_copy
        FROM r
        WHERE mix_copy < CASE source WHEN 'src1' THEN 2 WHEN 'src2' THEN 1
                                     WHEN 'src3' THEN 0 WHEN 'src4' THEN 0
                                     ELSE 1 END
           OR ${duckMd5long(
             "'mixup|' || cast(doc_id as varchar) || '|' || cast(mix_copy as varchar)")}
              % 1000000 <
              CASE source WHEN 'src1' THEN 500000 WHEN 'src2' THEN 0
                          WHEN 'src3' THEN 400000 WHEN 'src4' THEN 0
                          ELSE 500000 END
        ORDER BY doc_id, mix_copy"""),
      "Deterministic epoch oversampling via Mixture.sampleByRatesWithRepeats: " +
        "rates above 1 replicate rows (full copies + one hash-gated fractional " +
        "copy) — map-only, reproducible, replica-addressable via mix_copy."),

    // ---------------------------------------------------------------- q91
    Q(
      "q91_cms_freq",
      (s, dir) => {
        import s.implicits._
        // Count-min point-frequency estimates per language: the grid is a
        // FIXED-SIZE mergeable aggregate (map-side combine, counters add),
        // so frequency lookups cost O(depth x width) memory where an exact
        // count shuffles one row per DISTINCT token — billions at 100 TB.
        // Completes the sketch family: Bloom = "present?", Misra-Gries =
        // "which keys are heavy?", CMS = "how often is THIS key?". Counter
        // addition commutes, so unlike Misra-Gries the estimates are
        // deterministic across runs and partitionings. The oracle checks
        // the CMS contract against exact counts (the q36/q62 pattern):
        // estimates never undercount, and the overshoot (pure collision
        // mass) stays under 8 * N / width — integer arithmetic, exact
        // cross-engine.
        val width = 1024
        val depth = 5
        val md5long = graft.functions.HashConventions.md5long48 _
        val toks = table(s, dir, "documents")
          .select(col("lang"), explode(expr("tokenize_text(text)")).as("tok"))
          .withColumn("h", expr(md5long("tok")))
        val exact = toks.groupBy("lang", "tok", "h").agg(count(lit(1)).as("freq"))
        val totals = toks.groupBy("lang").agg(count(lit(1)).as("n_tokens"))
        val sketch = toks
          .select(col("lang").as("_1"), col("h").as("_2")).as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(new graft.operators.CmsAgg(width, depth).toColumn.name("cms"))
          .toDF("lang", "cms")
        exact.filter(col("freq") >= 10)
          .join(broadcast(sketch), Seq("lang"))
          .join(broadcast(totals), Seq("lang"))
          .withColumn("est", expr("cms_estimate(cms, h)"))
          .select(
            col("lang"), col("tok"), col("freq"),
            (col("est") >= col("freq")).as("never_under"),
            ((col("est") - col("freq")) * width <= col("n_tokens") * 8)
              .as("overshoot_ok"))
          .orderBy("lang", "tok")
      },
      Some("""
        WITH toks AS (
          SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        exact AS (SELECT lang, tok, COUNT(1) AS freq FROM toks GROUP BY lang, tok)
        SELECT lang, tok, freq,
               TRUE AS never_under, TRUE AS overshoot_ok
        FROM exact WHERE freq >= 10
        ORDER BY lang, tok"""),
      "Count-min-sketch per-language token frequencies probed through the " +
        "codegen'd cms_estimate expression: fixed-size mergeable grid instead of " +
        "a per-distinct-token shuffle; oracle asserts the never-undercount and " +
        "bounded-overshoot contract against exact counts.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q92
    Q(
      "q92_dup_spans",
      (s, dir) => {
        // Span-level duplication: WHERE inside each document the repeated
        // text lives — the positional complement of doc-level dedup
        // (q23/q57 say WHICH docs are near-copies; this marks the byte
        // ranges to cut, the substring-dedup pass training pipelines run
        // after doc dedup). Positional 3-gram shingles carry their token
        // offset, the cross-corpus doc-frequency flags boilerplate
        // shingles (df >= 5 DISTINCT docs), and each doc's flagged
        // positions collapse into maximal spans by gaps-and-islands — the
        // GridFill rewrite's shape. Scale: one hash-keyed shuffle for df,
        // one hash equi-join back (the flagged set grows with the corpus,
        // so it is NOT broadcast), one doc-keyed window; no single-task
        // stage, everything integer-exact cross-engine.
        val dupDf = 5
        val posts = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            posexplode(expr("word_ngram_hash48(toks, 3)")).as(Seq("pos0", "h")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
        val hot = posts.select("h", "doc_id").distinct()
          .groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") >= dupDf)
          .select("h")
        val flagged = posts.join(hot, Seq("h")).select("doc_id", "pos")
        val before = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)
        val upto = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, 0)
        flagged
          // a 3-gram at pos covers tokens [pos, pos+2]; a new island starts
          // when this gram no longer overlaps-or-touches the running
          // farthest end of the grams before it
          .withColumn("prev_end", max(col("pos") + 2).over(before))
          .withColumn("new_isl",
            (col("pos") > coalesce(col("prev_end"), lit(-2)) + 1).cast("int"))
          .withColumn("isl", sum("new_isl").over(upto))
          .groupBy("doc_id", "isl")
          .agg(
            min("pos").as("span_start"),
            (max(col("pos")) + lit(2)).as("span_end"))
          .select(col("doc_id"), col("span_start"), col("span_end"),
            (col("span_end") - col("span_start") + 1).as("span_tokens"))
          .orderBy("doc_id", "span_start")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        posts AS (
          SELECT doc_id, unnest(range(1, len(toks) - 1)) AS pos, toks FROM d),
        hashed AS (
          SELECT doc_id, pos,
                 CAST('0x' || substr(md5(toks[pos] || ' ' || toks[pos + 1] || ' ' || toks[pos + 2]), 1, 12) AS BIGINT) AS h
          FROM posts),
        hot AS (
          SELECT h FROM (SELECT DISTINCT h, doc_id FROM hashed)
          GROUP BY h HAVING COUNT(1) >= 5),
        flagged AS (SELECT doc_id, pos FROM hashed JOIN hot USING (h)),
        pe AS (
          SELECT doc_id, pos,
                 MAX(pos + 2) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM flagged),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN pos > COALESCE(prev_end, -2) + 1
                     THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
          FROM pe)
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 2 AS span_end,
               MAX(pos) + 2 - MIN(pos) + 1 AS span_tokens
        FROM isl GROUP BY doc_id, isl
        ORDER BY doc_id, span_start"""),
      "Span-level substring duplication: positional shingle df flags boilerplate " +
        "grams, gaps-and-islands merges them into maximal per-doc spans — the " +
        "cut-list substring dedup emits after doc-level dedup; three key-partitioned " +
        "shuffles, no single-task stage."),

    // ---------------------------------------------------------------- q94
    Q(
      "q94_bm25",
      (s, dir) =>
        // BM25 retrieval scoring — the lexical ranking half of the search
        // story (q33/q54 rank by embedding; this ranks by term statistics).
        // Everything is relational: tf is a (doc, term) count, df/avgdl are
        // tiny aggregates, and the 3-term query side BROADCASTS — the
        // corpus shuffles once for tf, never for the join. Cross-engine
        // determinism: all counts exact; per-term scores share the IDENTICAL
        // expression tree (only ln carries 1-ulp slack); the per-doc sum
        // folds term scores in SORTED term order (the duckDot discipline,
        // so association cannot differ); the final round(,6) absorbs the
        // ln slack, and ranking uses the ROUNDED score.
        bm25Frame(s, dir)
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
          .select("doc_id", "bm25"),
      Some(s"""
        WITH $duckBm25Ctes
        SELECT doc_id, bm25 FROM bm
        ORDER BY bm25 DESC, doc_id LIMIT 20"""),
      "BM25 lexical ranking: broadcast query terms, one corpus shuffle for tf, " +
        "tiny df/length aggregates — per-term scores on an identical expression " +
        "tree, per-doc sum folded in sorted term order, rounded ranking."),

    // ---------------------------------------------------------------- q95
    Q(
      "q95_snapshot_diff",
      (s, dir) => {
        // Snapshot regression diff through the SnapshotDiff operator: v2 is
        // a deterministic mutation of the corpus (drops, edits, additions),
        // and the diff labels every key added/removed/changed/unchanged.
        // The operator projects each side to (key, md5-of-JSON fingerprint)
        // BEFORE the full-outer join, so the corpus-sized join shuffles two
        // narrow columns, never document payloads — the q82 fingerprint
        // says WHETHER snapshots differ; this says WHERE. The oracle
        // re-derives the statuses with direct column comparison
        // (IS DISTINCT FROM), independent of the operator's hashing.
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val v1 = table(s, dir, "documents").select(cols.map(col): _*)
        val v2 = v1.filter(col("doc_id") % 97 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 31 === 0, concat(col("text"), lit(" rev2")))
              .otherwise(col("text")))
          .unionByName(
            v1.filter(col("doc_id") % 53 === 0)
              .select((col("doc_id") + 1000000L).as("doc_id"),
                concat(col("text"), lit(" new")).as("text"),
                col("lang"), col("source"), col("n_chars")))
        graft.operators.SnapshotDiff
          .diff(v1, v2, Seq("doc_id"), cols.tail)
          .orderBy("doc_id")
      },
      Some("""
        WITH v1 AS (
          SELECT doc_id, text, lang, source, n_chars FROM documents),
        v2 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 31 = 0 THEN text || ' rev2' ELSE text END AS text,
                 lang, source, n_chars
          FROM documents WHERE doc_id % 97 <> 0
          UNION ALL
          SELECT doc_id + 1000000, text || ' new', lang, source, n_chars
          FROM documents WHERE doc_id % 53 = 0)
        SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
               CASE WHEN v1.doc_id IS NULL THEN 'added'
                    WHEN v2.doc_id IS NULL THEN 'removed'
                    WHEN (v1.text IS DISTINCT FROM v2.text)
                      OR (v1.lang IS DISTINCT FROM v2.lang)
                      OR (v1.source IS DISTINCT FROM v2.source)
                      OR (v1.n_chars IS DISTINCT FROM v2.n_chars)
                    THEN 'changed' ELSE 'unchanged' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        ORDER BY doc_id"""),
      "Keyed snapshot diff via narrow fingerprint projection + one full-outer " +
        "hash join: payloads never shuffle, statuses re-derived by the oracle " +
        "with direct column comparison — the per-key regression tool next to " +
        "q82's whole-dataset fingerprint."),

    // ---------------------------------------------------------------- q97
    Q(
      "q97_lsh_quality",
      (s, dir) => {
        // Grading the sketch against ground truth — the eval every dedup
        // deployment runs before trusting LSH at 100 TB: candidate pairs
        // from the 2x2 MinHash bands (q25's machinery) scored against
        // EXACT Jaccard >= 0.5 pairs from the full posting-list join
        // (q48's machinery, uncut: truth must not be thresholded). Output
        // is the one-row confusion summary; recall/precision are exact
        // IEEE divisions of exact counts.
        //
        // The truth side is Sigma df^2 — QUADRATIC in posting-list depth —
        // so the audit runs on a deterministic 1000-document sample by
        // default (q70's salted-hash bottom-k: engine-, partitioning-, and
        // growth-stable), bounding the exact join at any corpus size. BOTH
        // sides restrict to the same sample, so recall/precision remain
        // estimates of the full-corpus rates (doc sampling thins PAIRS
        // quadratically — k must keep enough dup pairs to grade, hence
        // 1000 not 100). The unsampled spelling does not exist here: a
        // caller wanting it must raise sampleK past the corpus size
        // explicitly. Zero-denominator guards keep the summary row total
        // even on a pair-free sample.
        val sampleK = 1000
        val sample = table(s, dir, "documents")
          .select(col("doc_id"),
            expr(md5long("concat('q97s|', cast(doc_id as string))")).as("hkey"))
          .orderBy("hkey", "doc_id")
          .limit(sampleK)
          .select("doc_id")
        val sigs = minhashSigs(s, dir)
          .join(broadcast(sample), Seq("doc_id"), "left_semi")
        val banded = sigs
          .select(lit(0).as("band_no"), col("band0").as("bk"), col("doc_id"))
          .union(sigs.select(lit(1).as("band_no"), col("band1").as("bk"), col("doc_id")))
        val cand = banded.as("a")
          .join(banded.as("b"), Seq("band_no", "bk"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct()
        val posts = table(s, dir, "documents")
          .join(broadcast(sample), Seq("doc_id"), "left_semi")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"array_distinct($sparkShingles) as sh")
          .select(col("doc_id"), explode(col("sh")).as("shingle"))
        val sizes = posts.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val truth = posts.as("a")
          .join(posts.as("b"), Seq("shingle"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("nc"))
          .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
          .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
          .filter(col("nc").cast("double") / (col("na") + col("nb") - col("nc")) >= 0.5)
          .select("da", "db")
        val hit = truth.join(cand, Seq("da", "db"))
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(
            col("n_truth"), col("n_cand"), col("n_hit"),
            when(col("n_truth") === 0, lit(0.0d))
              .otherwise(col("n_hit").cast("double") / col("n_truth")).as("recall"),
            when(col("n_cand") === 0, lit(0.0d))
              .otherwise(col("n_hit").cast("double") / col("n_cand")).as("precision"))
      },
      Some(s"""
        WITH smp AS (
          SELECT doc_id FROM (
            SELECT doc_id,
                   ${duckMd5long("'q97s|' || cast(doc_id as varchar)")} AS hkey
            FROM documents ORDER BY hkey, doc_id LIMIT 1000)),
        d AS (
          SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents JOIN smp USING (doc_id)
          WHERE len(string_split(text, ' ')) >= 3),
        sigs AS (SELECT doc_id, ${duckMinhashSelect.mkString(", ")} FROM d),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS bk, doc_id FROM sigs
          UNION ALL
          SELECT 1, minh2::VARCHAR || '_' || minh3::VARCHAR, doc_id FROM sigs),
        cand AS (
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM banded a JOIN banded b USING (band_no, bk)
          WHERE a.doc_id < b.doc_id),
        posts AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh
          FROM d),
        sizes AS (SELECT doc_id, COUNT(1) AS n FROM posts GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS nc
          FROM posts a JOIN posts b USING (sh)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        truth AS (
          SELECT c.da, c.db FROM common c
          JOIN sizes sa ON c.da = sa.doc_id
          JOIN sizes sb ON c.db = sb.doc_id
          WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.5)
        SELECT (SELECT COUNT(1) FROM truth) AS n_truth,
               (SELECT COUNT(1) FROM cand) AS n_cand,
               (SELECT COUNT(1) FROM truth JOIN cand USING (da, db)) AS n_hit,
               CASE WHEN (SELECT COUNT(1) FROM truth) = 0 THEN 0.0
                    ELSE CAST((SELECT COUNT(1) FROM truth JOIN cand USING (da, db)) AS DOUBLE)
                         / (SELECT COUNT(1) FROM truth) END AS recall,
               CASE WHEN (SELECT COUNT(1) FROM cand) = 0 THEN 0.0
                    ELSE CAST((SELECT COUNT(1) FROM truth JOIN cand USING (da, db)) AS DOUBLE)
                         / (SELECT COUNT(1) FROM cand) END AS precision"""),
      "LSH quality audit: MinHash band candidates graded against exact-Jaccard " +
        "ground truth on a deterministic salted-hash bottom-1000 document sample — " +
        "the quadratic truth join stays bounded at any corpus size; the one-row " +
        "recall/precision confusion summary a dedup deployment checks before " +
        "trusting the sketch."),

    // ---------------------------------------------------------------- q99
    Q(
      "q99_hybrid_rrf",
      (s, dir) => {
        // Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
        // ranking (q94's scorer) and the embedding cosine ranking (q33's
        // scorer, probe = doc 0's vector) — the production search stack's
        // standard fusion step, and pure relational algebra: two rankers,
        // a full-outer join on doc, score = sum of 1/(60 + rank). Ranks
        // are exact integers, reciprocals and their one fixed-order
        // addition are IEEE — bit-identical cross-engine with no rounding
        // needed. Both rankings are GLOBAL totals over corpus-sized
        // frames, so they route through GlobalRank's two-phase shape
        // (constant segment) — a bare row_number() over (order by ...)
        // would collapse each ranker into ONE task at scale, the exact
        // hazard q98/GlobalRank exists to kill. Ranks must stay exact
        // (the fused output reports them), so a top-k cap is not an
        // option. Fusion then joins two narrow rank frames on doc.
        graft.functions.VectorExpressions.register(s)
        // GlobalRank orders ascending; negating the score (exact IEEE)
        // gives the DESC ranking with the same doc_id tie-break
        // r12: LAZY bounds for both rank passes (GlobalRank.boundsOf
        // unpinned) — the default eager sketch job re-executed the heavy
        // bm25/cosine chain once per pass; passed lazily, the sketch rides
        // inside the main job's broadcast builds where broadcast-exchange
        // reuse dedups it (measured 7.09 -> 4.17 s isolated). Sketch
        // values only steer bucket balance; ranks are exact either way.
        val lexIn = bm25Frame(s, dir)
          .filter(col("doc_id") =!= 0)
          .withColumn("seg", lit(1))
          .withColumn("neg_bm25", -col("bm25"))
        val lex = graft.operators.GlobalRank.withGlobalRank(
          lexIn, "seg", "neg_bm25", "doc_id",
          precomputedBounds = Some(
            graft.operators.GlobalRank.boundsOf(lexIn, "seg", "neg_bm25")))
          .select(col("doc_id"), col("rn").cast("int").as("rank_lex"))
        val e = table(s, dir, "embeddings")
          .selectExpr("vec_id", "embedding", s"${VectorSql.dot("embedding", "embedding")} as n2")
        val probe = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("pe"), col("n2").as("pn2"))
        val semIn = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(probe))
          .selectExpr("vec_id as doc_id",
            s"${VectorSql.dot("pe", "embedding")} / (sqrt(pn2) * sqrt(n2)) as sim")
          .withColumn("seg", lit(1))
          .withColumn("neg_sim", -col("sim"))
        val sem = graft.operators.GlobalRank.withGlobalRank(
          semIn, "seg", "neg_sim", "doc_id",
          precomputedBounds = Some(
            graft.operators.GlobalRank.boundsOf(semIn, "seg", "neg_sim")))
          .select(col("doc_id"), col("rn").cast("int").as("rank_sem"))
        lex.join(sem, Seq("doc_id"), "full_outer")
          .withColumn("rrf",
            expr("""coalesce(1.0d / (60.0d + cast(rank_lex as double)), 0.0d)
                    + coalesce(1.0d / (60.0d + cast(rank_sem as double)), 0.0d)"""))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(20)
          .select("doc_id", "rank_lex", "rank_sem", "rrf")
      },
      Some(s"""
        WITH $duckBm25Ctes,
        lex AS (
          SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
          FROM bm WHERE doc_id <> 0),
        en AS (
          SELECT vec_id, embedding,
                 ${VectorSql.duckDot("embedding", "embedding")} AS n2
          FROM embeddings),
        probe AS (SELECT embedding AS pe, n2 AS pn2 FROM en WHERE vec_id = 0),
        sem AS (
          SELECT vec_id AS doc_id,
                 row_number() OVER (
                   ORDER BY ${VectorSql.duckDot("pe", "embedding")}
                              / (sqrt(pn2) * sqrt(n2)) DESC, vec_id ASC) AS rank_sem
          FROM en CROSS JOIN probe WHERE vec_id <> 0)
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, rank_lex, rank_sem,
               COALESCE(1.0 / (60.0 + CAST(rank_lex AS DOUBLE)), 0.0)
                 + COALESCE(1.0 / (60.0 + CAST(rank_sem AS DOUBLE)), 0.0) AS rrf
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        ORDER BY rrf DESC, doc_id LIMIT 20"""),
      "Hybrid search: reciprocal-rank fusion of BM25 and embedding-cosine " +
        "rankings — exact integer ranks, IEEE reciprocals in fixed order, " +
        "full-outer fusion join; each ranker keeps its own scale shape."),

    // ---------------------------------------------------------------- q105
    Q(
      "q105_pack_bytes",
      (s, dir) => {
        // q73's sequence packing under the BYTE token model: context
        // windows budget 4096 BYTES (octet_length — exact cross-engine,
        // no tokenizer assumptions at all), the model a byte-level LLM or
        // a storage-page packer uses. Same two-phase Packer machinery: no
        // single-task global window at any corpus size.
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            octet_length(col("text")).cast("long").as("n_b"))
        graft.operators.Packer
          .withSequenceOffsets(docs, "doc_id", "n_b", ctxLen = 4096)
          .select(col("doc_id"), col("n_b").as("n_bytes"),
            col("tok_offset").as("byte_offset"),
            col("first_seq"), col("last_seq"), col("n_seqs"))
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents),
        o AS (
          SELECT doc_id, n_bytes,
                 CAST(COALESCE(SUM(n_bytes) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS byte_offset
          FROM d)
        SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, byte_offset,
               byte_offset // 4096 AS first_seq,
               (byte_offset + greatest(n_bytes, 1) - 1) // 4096 AS last_seq,
               (byte_offset + greatest(n_bytes, 1) - 1) // 4096
                 - byte_offset // 4096 + 1 AS n_seqs
        FROM o
        ORDER BY doc_id"""),
      "Sequence packing under the byte token model: 4096-byte context windows via " +
        "octet_length weights — tokenizer-free exact budgets through the same " +
        "two-phase Packer (no single-task global window)."),

    // ---------------------------------------------------------------- q106
    Q(
      "q106_bpeish_budget",
      (s, dir) => {
        // q83's budgeted selection under the BPE-ish SUBWORD token model:
        // greedy <=4-char letter pieces + digits + punctuation counted in
        // one codegen'd regexp pass (TextSignals.bpeishTokenCount) — the
        // deterministic proxy for real BPE budgets, ~3x the whitespace
        // count on this corpus, so the same 15k-budget cut selects a
        // different (more honest) document prefix. Same scale shape as
        // q83: Packer's two-phase running sum, map-only budget cut.
        // (The regex proxy is kept for its single-pass cost; the TRAINED
        // tokenizer budgets — exact counts under a fitted merge table —
        // are q224/q227 via Bpe.fit/tokenCounts.)
        val docs = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tok",
            graft.operators.TextSignals.bpeishTokenCount(col("text")))
          .withColumn("prio",
            expr("cast(size(filter(toks, x -> x in ('the','a','of','and','to'))) as bigint)"
              + " * 1000000 + doc_id"))
          .withColumn("ord", -col("prio"))
          .select("doc_id", "n_tok", "prio", "ord")
        graft.operators.Packer
          .withSequenceOffsets(docs, "ord", "n_tok", ctxLen = 64)
          .filter(col("tok_offset") < 15000)
          .select("doc_id", "prio", "n_tok", "tok_offset")
          .orderBy("tok_offset")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                   '${graft.operators.TextSignals.BpeishPattern}')) AS BIGINT) AS n_tok,
                 CAST(len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','a','of','and','to'))) AS BIGINT)
                   * 1000000 + doc_id AS prio
          FROM documents),
        o AS (
          SELECT doc_id, prio, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (ORDER BY prio DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS tok_offset
          FROM d)
        SELECT doc_id, prio, n_tok, tok_offset
        FROM o WHERE tok_offset < 15000
        ORDER BY tok_offset"""),
      "Token-budget selection under the BPE-ish subword model: one regexp pass " +
        "counts <=4-char letter pieces + digits + punctuation (cross-engine exact, " +
        "RE2-safe), Packer's two-phase sum cuts the budget — honest context " +
        "accounting without a merge table."),

    // ---------------------------------------------------------------- q107
    Q(
      "q107_char_chunks",
      (s, dir) => {
        // q71's sliding windows under the character/byte budget model:
        // 256-char windows at stride 128 via Chunker.slidingCharWindows —
        // map-only Generate + substring, chunk text hashed in place.
        graft.operators.Chunker
          .slidingCharWindows(table(s, dir, "documents"), "text", 256, 128)
          .withColumn("chunk_hash", expr(md5long("chunk_text")))
          .select("doc_id", "chunk_no", "start_ch", "chunk_len", "chunk_hash")
          .orderBy("doc_id", "chunk_no")
      },
      Some(s"""
        WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        st AS (
          SELECT doc_id, text, n,
                 unnest(range(0, greatest(n, 1), 128)) AS start_ch
          FROM d)
        SELECT doc_id,
               CAST(start_ch // 128 AS BIGINT) AS chunk_no,
               CAST(start_ch AS INTEGER) AS start_ch,
               CAST(greatest(least(256, n - start_ch), 0) AS BIGINT) AS chunk_len,
               ${duckMd5long("substr(text, CAST(start_ch AS INTEGER) + 1, 256)")} AS chunk_hash
        FROM st
        ORDER BY doc_id, chunk_no"""),
      "Sliding 256-char windows at stride 128 through Chunker.slidingCharWindows — " +
        "the byte-budget chunking model, map-only Generate + substring, only " +
        "fixed-width columns leave the stage."),

    // ---------------------------------------------------------------- q109
    Q(
      "q109_unigram_logprob",
      (s, dir) => {
        // Unigram-LM quality scoring (the CCNet/Gopher-style perplexity
        // proxy): train a unigram model on the corpus itself (token ->
        // count / total) and score every document by its mean negative
        // log-probability — boilerplate and natural text score low,
        // rare-token soup scores high, and the filter needs no external
        // model. Scale: token counts are one shuffle on tok (the natural
        // key; map-side combine collapses it), per-doc tfs one shuffle on
        // (doc_id, tok), the scoring join is tok-keyed (hash-partitionable
        // at any vocab size — broadcast is an optimization only when the
        // vocab is small), and the 1-row total broadcasts back. Cross-
        // engine: counts exact; each contribution shares one expression
        // tree (ln carries 1-ulp slack); the per-doc fold runs in SORTED
        // token order (the bm25 discipline) and round(,6) absorbs the ln
        // slack AFTER the exact-order fold and IEEE division.
        val toks = table(s, dir, "documents")
          .select(col("doc_id"), explode(expr("tokenize_text(text)")).as("tok"))
        val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val tot = lens.agg(sum("dl").as("tt"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
          .join(vocab, Seq("tok"))
          .crossJoin(broadcast(tot))
          .withColumn("contrib",
            expr("cast(tf as double) * ln(cast(c as double) / cast(tt as double))"))
          .groupBy("doc_id")
          .agg(expr(
            """aggregate(
                 transform(array_sort(collect_list(struct(tok, contrib))), p -> p.contrib),
                 cast(0 as double), (a, v) -> a + v)""").as("lsum"))
          .join(lens, Seq("doc_id"))
          .selectExpr("doc_id", "dl", "round(-lsum / cast(dl as double), 6) as xent")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        lens AS (SELECT doc_id, COUNT(1) AS dl FROM toks GROUP BY doc_id),
        st AS (SELECT CAST(SUM(dl) AS BIGINT) AS tt FROM lens),
        vocab AS (SELECT tok, COUNT(1) AS c FROM toks GROUP BY tok),
        tft AS (SELECT doc_id, tok, COUNT(1) AS tf FROM toks GROUP BY doc_id, tok),
        sc AS (
          SELECT t.doc_id, t.tok,
                 CAST(t.tf AS DOUBLE) * ln(CAST(v.c AS DOUBLE) / CAST(st.tt AS DOUBLE)) AS contrib
          FROM tft t JOIN vocab v USING (tok), st),
        agg AS (
          SELECT doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE), list(contrib ORDER BY tok)),
                   (a, v) -> a + v) AS lsum
          FROM sc GROUP BY doc_id)
        SELECT a.doc_id, l.dl, round(-a.lsum / CAST(l.dl AS DOUBLE), 6) AS xent
        FROM agg a JOIN lens l USING (doc_id)
        ORDER BY doc_id"""),
      "Unigram-LM quality score (perplexity proxy): self-trained token " +
        "probabilities, per-doc mean negative log-prob folded in sorted token " +
        "order — token-keyed equi-joins throughout, no external model."),

    // ---------------------------------------------------------------- q110
    Q(
      "q110_epoch_shuffle",
      (s, dir) => {
        // Deterministic global training order — the shuffle a dataloader
        // needs BEFORE packing/sharding an epoch: every doc gets a dense
        // 1-based position by salted-hash order, a different independent
        // permutation per epoch (new salt), reproducible across runs,
        // engines, and partitionings. Routed through GlobalRank's
        // two-phase shape (sketch bounds -> bucketed local sorts -> offset
        // arithmetic): a bare row_number() over (order by hash) would
        // single-task the corpus — the exact hazard GlobalRank exists to
        // kill. Positions join on doc_id (one shuffle each side).
        def pos(salt: String, out: String) =
          graft.operators.GlobalRank.withGlobalRank(
            table(s, dir, "documents")
              .select(col("doc_id"))
              .withColumn("seg", lit(1))
              .withColumn("hkey",
                expr(md5long(s"concat('$salt|', cast(doc_id as string))"))),
            "seg", "hkey", "doc_id")
            .select(col("doc_id"), col("rn").cast("long").as(out))
        pos("ep0", "pos_e0").join(pos("ep1", "pos_e1"), Seq("doc_id"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH h0 AS (
          SELECT doc_id, row_number() OVER (ORDER BY
            ${duckMd5long("'ep0|' || cast(doc_id as varchar)")}, doc_id) AS pos_e0
          FROM documents),
        h1 AS (
          SELECT doc_id, row_number() OVER (ORDER BY
            ${duckMd5long("'ep1|' || cast(doc_id as varchar)")}, doc_id) AS pos_e1
          FROM documents)
        SELECT doc_id, pos_e0, pos_e1
        FROM h0 JOIN h1 USING (doc_id)
        ORDER BY doc_id"""),
      "Deterministic epoch shuffle: dense global training positions by salted-hash " +
        "order through GlobalRank's two-phase shape — an independent reproducible " +
        "permutation per epoch, no single-task global sort."),

    // ---------------------------------------------------------------- q111
    Q(
      "q111_temperature_mixture",
      (s, dir) => {
        // Temperature-balanced mixture through Mixture.sampleBySqrtTemperature:
        // keep-rates DERIVED from the data (rate = sqrt(n_min/n_s), the
        // alpha=0.5 temperature curve), so big sources flatten toward the
        // smallest instead of drowning it. Output is the per-source audit
        // row a mixture deployment checks: totals, derived rate/threshold,
        // and the deterministic kept count. sqrt/casts are correctly-
        // rounded IEEE (why the operator fixes alpha=0.5 — pow() isn't),
        // so rates hash cross-engine. Scale: the corpus never shuffles in
        // the operator (broadcast thresholds + hash filter); the summary
        // aggs are source-keyed.
        val docs = table(s, dir, "documents")
        val kept = graft.operators.Mixture
          .sampleBySqrtTemperature(docs, "source", "doc_id", "tmp1")
        val totals = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
        val mn = totals.agg(min("n_total").as("n_min"))
        totals.crossJoin(broadcast(mn))
          .withColumn("rate",
            expr("sqrt(cast(n_min as double) / cast(n_total as double))"))
          .withColumn("mix_thresh",
            expr("cast(floor(rate * 1000000.0d) as bigint)"))
          .join(kept.groupBy("source").agg(count(lit(1)).as("n_kept")),
            Seq("source"), "left")
          .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
          .select("source", "n_total", "rate", "mix_thresh", "n_kept")
          .orderBy("source")
      },
      Some(s"""
        WITH c AS (SELECT source, COUNT(1) AS n_total FROM documents GROUP BY source),
        m AS (SELECT MIN(n_total) AS n_min FROM c),
        r AS (
          SELECT source, n_total,
                 SQRT(CAST(m.n_min AS DOUBLE) / CAST(n_total AS DOUBLE)) AS rate,
                 CAST(FLOOR(SQRT(CAST(m.n_min AS DOUBLE) / CAST(n_total AS DOUBLE))
                   * 1000000.0) AS BIGINT) AS mix_thresh
          FROM c, m),
        k AS (
          SELECT d.source, COUNT(1) AS n_kept
          FROM documents d JOIN r ON d.source = r.source
          WHERE ${duckMd5long("'tmp1|' || cast(doc_id as varchar)")} % 1000000 < r.mix_thresh
          GROUP BY d.source)
        SELECT r.source, r.n_total, r.rate, r.mix_thresh,
               COALESCE(k.n_kept, 0) AS n_kept
        FROM r LEFT JOIN k ON r.source = k.source
        ORDER BY r.source"""),
      "Temperature-balanced mixture audit: data-derived sqrt keep-rates flatten " +
        "source sizes toward the smallest — broadcast thresholds + salted-hash " +
        "filter, the corpus never shuffles; rates bit-exact cross-engine."),

    // ---------------------------------------------------------------- q112
    Q(
      "q112_bpe_pair_counts",
      (s, dir) => {
        // The TRAINING side of the tokenizer story (q106 counts with a
        // fixed token model; this derives the model): the first BPE merge
        // round — adjacent character-pair frequencies over the corpus,
        // weighted by word frequency. The scale trick is classic BPE
        // training: aggregate to DISTINCT words first (one shuffle, the
        // vocab is tiny vs the corpus), then explode pairs over the
        // distinct-word table only — the quadratic-ish pair work never
        // touches corpus-sized data. Top-20 by count is the merge-table
        // head; counts exact integers.
        val words = table(s, dir, "documents")
          .select(explode(expr("tokenize_text(text)")).as("w"))
          .filter(length(col("w")) >= 2)
        words.groupBy("w").agg(count(lit(1)).as("wcnt"))
          .select(col("wcnt"), explode(
            expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
          .groupBy("pair").agg(sum("wcnt").as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(20)
      },
      Some(s"""
        WITH words AS (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        wc AS (
          SELECT w, COUNT(1) AS wcnt FROM words
          WHERE length(w) >= 2 GROUP BY w),
        pairs AS (
          SELECT wcnt,
                 unnest(list_transform(range(1, length(w)),
                   i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
          FROM wc)
        SELECT pair, CAST(SUM(wcnt) AS BIGINT) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair LIMIT 20"""),
      "First BPE merge round: adjacent char-pair frequencies weighted by word " +
        "frequency — pair explosion runs over the distinct-word table only, " +
        "never corpus-sized data; the tokenizer-training half of q106."),

    // ---------------------------------------------------------------- q113
    Q(
      "q113_decontam_spans",
      (s, dir) => {
        // Contamination SURGERY: q56 says WHICH docs overlap the eval set;
        // this says WHERE, and what survives cutting — positional 3-gram
        // shingles flagged against the (tiny, broadcast) eval shingle set,
        // flagged positions merged into maximal spans by the q92
        // gaps-and-islands shape, then per-doc surgery accounting
        // (spans, tokens cut, keep fraction). The production move this
        // enables: excise benchmark-overlapping spans instead of dropping
        // whole documents — at 100 TB the difference is real corpus yield.
        // Scale: the flag join broadcasts the eval side (fixed benchmark,
        // never corpus-sized), islands are one doc-keyed window, and the
        // summary is one doc-keyed aggregate. keep_frac is an IEEE
        // division of exact integer counts.
        val withToks = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
        val posts = withToks
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), size(col("toks")).as("n_tok").cast("long").as("n_tok"),
            posexplode(expr("word_ngram_hash48(toks, 3)")).as(Seq("pos0", "h")))
          .select(col("doc_id"), col("n_tok"), (col("pos0") + 1).as("pos"), col("h"))
        val evalSh = posts.filter(col("doc_id") < 10).select("h").distinct()
        val flagged = posts.filter(col("doc_id") >= 10)
          .join(broadcast(evalSh), Seq("h"))
          .select("doc_id", "n_tok", "pos")
        val before = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)
        val upto = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, 0)
        flagged
          .withColumn("prev_end", max(col("pos") + 2).over(before))
          .withColumn("new_isl",
            (col("pos") > coalesce(col("prev_end"), lit(-2)) + 1).cast("int"))
          .withColumn("isl", sum("new_isl").over(upto))
          .groupBy("doc_id", "n_tok", "isl")
          .agg(
            min("pos").as("span_start"),
            (max(col("pos")) + lit(2)).as("span_end"))
          .groupBy("doc_id", "n_tok")
          .agg(
            count(lit(1)).as("n_spans"),
            sum(col("span_end") - col("span_start") + 1).as("tokens_cut"))
          .selectExpr("doc_id", "n_tok", "n_spans", "tokens_cut",
            "cast(n_tok - tokens_cut as double) / cast(n_tok as double) as keep_frac")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 3),
        posts AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
                 unnest(range(1, len(toks) - 1)) AS pos, toks
          FROM d),
        hashed AS (
          SELECT doc_id, n_tok, pos,
                 CAST('0x' || substr(md5(toks[pos] || ' ' || toks[pos + 1] || ' ' || toks[pos + 2]), 1, 12) AS BIGINT) AS h
          FROM posts),
        ev AS (SELECT DISTINCT h FROM hashed WHERE doc_id < 10),
        flagged AS (
          SELECT doc_id, n_tok, pos FROM hashed JOIN ev USING (h)
          WHERE doc_id >= 10),
        pe AS (
          SELECT doc_id, n_tok, pos,
                 MAX(pos + 2) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM flagged),
        isl AS (
          SELECT doc_id, n_tok, pos,
                 SUM(CASE WHEN pos > COALESCE(prev_end, -2) + 1
                     THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
          FROM pe),
        spans AS (
          SELECT doc_id, n_tok, isl, MIN(pos) AS span_start, MAX(pos) + 2 AS span_end
          FROM isl GROUP BY doc_id, n_tok, isl)
        SELECT doc_id, n_tok, COUNT(1) AS n_spans,
               CAST(SUM(span_end - span_start + 1) AS BIGINT) AS tokens_cut,
               CAST(n_tok - CAST(SUM(span_end - span_start + 1) AS BIGINT) AS DOUBLE)
                 / CAST(n_tok AS DOUBLE) AS keep_frac
        FROM spans GROUP BY doc_id, n_tok
        ORDER BY doc_id"""),
      "Contamination surgery: eval-set shingles flag positions (broadcast screen), " +
        "gaps-and-islands merges them into maximal cut spans, per-doc accounting " +
        "reports what survives — excise benchmark overlap instead of dropping " +
        "documents; doc-keyed windows and aggregates, no corpus-sized broadcast."),

    // ---------------------------------------------------------------- q114
    Q(
      "q114_data_split",
      (s, dir) => {
        // Deterministic train/val/test assignment — the split EVERY
        // training pipeline needs, and the one thing q70 (sampling) and
        // q74 (mixture) deliberately are not: an EXHAUSTIVE, DISJOINT
        // partition of the corpus into 90/5/5 by salted-hash range, so a
        // doc's split never changes when the corpus grows (leakage-proof:
        // a doc can never migrate from test into train on a re-run with
        // more data). Map-only over the corpus; the output is the
        // per-source x split audit counts a pipeline checks for
        // stratification drift before training. Pure integer arithmetic —
        // exact cross-engine.
        graft.operators.Mixture
          .assignSplits(table(s, dir, "documents"), "doc_id", "split1",
            Seq("train" -> 90, "val" -> 5, "test" -> 5))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
          .orderBy("source", "split")
      },
      Some(s"""
        SELECT source, split, COUNT(1) AS n_docs, MIN(doc_id) AS min_doc
        FROM (
          SELECT source, doc_id,
                 CASE WHEN h < 90 THEN 'train'
                      WHEN h < 95 THEN 'val'
                      ELSE 'test' END AS split
          FROM (
            SELECT source, doc_id,
                   ${duckMd5long("'split1|' || cast(doc_id as varchar)")} % 100 AS h
            FROM documents))
        GROUP BY source, split
        ORDER BY source, split"""),
      "Deterministic 90/5/5 train/val/test split by salted-hash range: exhaustive, " +
        "disjoint, growth-stable (no doc ever migrates between splits) — map-only " +
        "assignment plus the per-source stratification audit.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q116
    Q(
      "q116_weighted_sample",
      (s, dir) => {
        // WEIGHTED sampling without replacement — quality-weighted corpus
        // selection (keep 50 docs, longer docs proportionally likelier),
        // the knob between uniform q70 and all-or-nothing q83. The
        // exponential-race spelling (Efraimidis-Spirakis A-Res): each doc
        // draws u from its salted hash and races with key -ln(u)/w; the
        // bottom-k keys ARE a weight-proportional sample without
        // replacement, determined per-row — no sequential pass, no rng
        // state, reproducible across engines and corpus growth. Scale:
        // the key is one map-only expression and the selection is
        // TakeOrderedAndProject (per-partition top-k + driver merge of k
        // rows — the q70 shape), never a global sort. Cross-engine: u is
        // an exact small-decimal double, ln carries 1-ulp slack absorbed
        // by round(,9) BEFORE ranking (the q94 bm25 discipline), doc_id
        // breaks ties totally.
        graft.operators.Mixture.weightedSample(
            table(s, dir, "documents")
              .filter(col("n_chars") > 0)
              .select("doc_id", "n_chars"),
            keyCol = "doc_id", weightCol = "n_chars", k = 50, salt = "ws1")
          .select("doc_id", "n_chars", "wkey")
      },
      Some(s"""
        SELECT doc_id, n_chars,
               ROUND(-ln((CAST(${duckMd5long("'ws1|' || cast(doc_id as varchar)")} % 1000000 AS DOUBLE) + 1.0)
                         / 1000000.0)
                     / CAST(n_chars AS DOUBLE), 9) AS wkey
        FROM documents
        WHERE n_chars > 0
        ORDER BY wkey, doc_id
        LIMIT 50"""),
      "Weighted sampling without replacement via the exponential race " +
        "(A-Res): per-row hash draw, key -ln(u)/weight, bottom-k by " +
        "TakeOrderedAndProject — weight-proportional selection with no rng " +
        "state, no global sort, stable under corpus growth."),

    // ---------------------------------------------------------------- q117
    Q(
      "q117_simhash_bands",
      (s, dir) => {
        // The THIRD banding family: SimHash band bucketing — the classic
        // production near-dup candidate generator for web-scale corpora
        // (MinHash bands q25 catch Jaccard overlap, hyperplane LSH q38
        // catches embedding cosine; simhash bands catch small HAMMING
        // drift in the token distribution). A 48-bit majority-vote
        // fingerprint splits into 4 x 12-bit bands; by pigeonhole, any
        // pair within Hamming distance 3 shares at least one intact band,
        // so the bucket join NEVER misses a <=3-bit pair — recall 1.0 by
        // construction, verification then computes the exact distance on
        // candidates only. Scale: band values spread over 4096 buckets
        // per band (measured: ~1.2 docs/bucket, max 54 at sf0.01), the
        // join is a hash-partitionable equi-join on (band_no, band_val),
        // and the pair explosion is bucket-bounded, never corpus². All
        // arithmetic is integer bit ops — exact cross-engine.
        val sigs = simhashSigs(s, dir)
          .selectExpr("doc_id", "simhash_bits(hs, 48) as sh")
        val banded = sigs.select(col("doc_id"), col("sh"),
          explode(expr(
            """transform(sequence(0, 3), b ->
                 named_struct('band_no', b, 'band_val', shiftright(sh, b * 12) & 4095))"""))
            .as("bv"))
          .select(col("doc_id"), col("sh"),
            col("bv.band_no").as("band_no"), col("bv.band_val").as("band_val"))
        val a = banded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
          col("band_no"), col("band_val"))
        val b = banded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
          col("band_no"), col("band_val"))
        a.join(b, Seq("band_no", "band_val"))
          .filter(col("doc_a") < col("doc_b"))
          // a pair that collides in several bands is still ONE candidate
          .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
          .selectExpr("doc_a", "doc_b",
            "cast(bit_count(sh_a ^ sh_b) as integer) as hamming")
          .withColumn("near_dup", col("hamming") <= 3)
          .orderBy("doc_a", "doc_b")
      },
      Some {
        val hl = s"list_transform(toks, s -> ${duckMd5long("s")})"
        s"""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 1),
        sig AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 48), j ->
                   CASE WHEN 2 * len(list_filter($hl, h -> ((h >> j) & 1) = 1)) >= len(toks)
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS sh
          FROM d),
        bk AS (
          SELECT doc_id, sh, band_no,
                 (sh >> CAST(band_no * 12 AS INTEGER)) & 4095 AS band_val
          FROM sig, (SELECT unnest(range(0, 4)) AS band_no)),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.sh AS sh_a, b.sh AS sh_b
          FROM bk a JOIN bk b
            ON a.band_no = b.band_no AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming,
               CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) <= 3 AS near_dup
        FROM pairs
        ORDER BY doc_a, doc_b"""
      },
      "SimHash band bucketing: 48-bit majority fingerprint split into 4 x 12-bit " +
        "bands — pigeonhole guarantees every Hamming<=3 pair shares a band, so the " +
        "bucket equi-join has recall 1.0 by construction and exact distance runs on " +
        "candidates only; the third banding family after MinHash and hyperplane LSH."),

    // ---------------------------------------------------------------- q119
    Q(
      "q119_stratified_sample",
      (s, dir) => {
        // STRATIFIED weighted sampling — q116's exponential race run per
        // LANGUAGE stratum (10 winners per lang, longer docs
        // proportionally likelier): the per-source quota selection a
        // balanced multilingual training mix needs, where a global race
        // would let one dominant language eat the whole budget. The
        // global operator's TakeOrderedAndProject cannot express a
        // per-group limit and a ranking window would sort every stratum's
        // full row set, so the selection runs through TopKByValue's
        // k-bounded typed buffer (map-side combine, shuffle O(langs x k))
        // — the q39 aggregator shape carrying q116's race key.
        graft.operators.Mixture.weightedSamplePerGroup(
          Tables.table(s, dir, "documents")
            .filter(col("n_chars") > 0)
            .select("lang", "doc_id", "n_chars"),
          groupCol = "lang", keyCol = "doc_id", weightCol = "n_chars",
          k = 10, salt = "ws2")
          .orderBy("lang", "rank")
      },
      Some(s"""
        SELECT lang, rank, doc_id, wkey FROM (
          SELECT lang, doc_id, wkey,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY wkey, doc_id) AS rank
          FROM (
            SELECT lang, doc_id,
                   ROUND(-ln((CAST(${duckMd5long("'ws2|' || cast(doc_id as varchar)")} % 1000000 AS DOUBLE) + 1.0)
                             / 1000000.0)
                         / CAST(n_chars AS DOUBLE), 9) AS wkey
            FROM documents
            WHERE n_chars > 0))
        WHERE rank <= 10
        ORDER BY lang, rank"""),
      "Stratified weighted sampling: the A-Res exponential race per language " +
        "stratum through a k-bounded typed aggregator — per-group quotas with " +
        "shuffle O(groups x k), no ranking window, no global sort; the balanced " +
        "selection a multilingual mix needs."),

    // ---------------------------------------------------------------- q121
    Q(
      "q121_cross_source_dups",
      (s, dir) => {
        // PROVENANCE analytics over the dedup graph: which SOURCES
        // duplicate each other, and how hard? LSH candidates
        // (Dedup.minhashLshCandidates — the production sketch path, never
        // all-pairs) are verified with exact shingle Jaccard >= 0.5, each
        // verified pair is attributed to its (source, source) cell via
        // least/greatest normalization, and the matrix aggregates pair
        // counts with min/max Jaccard (order statistics of IEEE-identical
        // ratios — exact cross-engine, no mean to round). This is the
        // report that decides which feed to drop when two crawls overlap.
        // Scale: candidates are bucket-bounded; the verify join attaches
        // shingle arrays only to candidate rows (equi-join on doc id);
        // source attribution is two more doc-id equi-joins; the final
        // matrix is a tiny sources x sources aggregate.
        val docs = table(s, dir, "documents")
        val ver = verifiedNearDupPairs(s, dir)
        val src = docs.select(col("doc_id"), col("source"))
        ver
          .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), Seq("id_a"))
          .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), Seq("id_b"))
          .selectExpr(
            "least(src_a, src_b) as source_lo",
            "greatest(src_a, src_b) as source_hi",
            "jaccard")
          .groupBy("source_lo", "source_hi")
          .agg(
            count(lit(1)).as("n_pairs"),
            min("jaccard").as("min_jaccard"),
            max("jaccard").as("max_jaccard"))
          .orderBy("source_lo", "source_hi")
      },
      Some(s"""
        WITH $duckVerifiedPairs
        SELECT least(da.source, db.source) AS source_lo,
               greatest(da.source, db.source) AS source_hi,
               COUNT(1) AS n_pairs,
               MIN(jaccard) AS min_jaccard,
               MAX(jaccard) AS max_jaccard
        FROM ver
        JOIN documents da ON ver.id_a = da.doc_id
        JOIN documents db ON ver.id_b = db.doc_id
        GROUP BY 1, 2
        ORDER BY source_lo, source_hi"""),
      "Cross-source duplication matrix: LSH candidates verified with exact " +
        "Jaccard >= 0.5, attributed to least/greatest-normalized source pairs — " +
        "the provenance report that decides which overlapping feed to drop; " +
        "bucket-bounded candidates, tiny sources x sources aggregate.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q122
    Q(
      "q122_dup_centrality",
      (s, dir) => {
        // Duplication CENTRALITY: 3 fixed PageRank rounds over the
        // verified near-dup graph (q121's pairs) — a high rank marks the
        // document at the center of a duplication cluster, the natural
        // canonical to keep where q57's lowest-id election is arbitrary,
        // and the doc whose provenance to audit first. Iterative
        // graph algorithm, scale-shaped like Dedup.clusters: edges
        // materialize once, each round is one node-keyed equi-join + one
        // aggregate; contribution sums are round-then-DECIMAL (exact,
        // order-independent), so ranks are bit-identical cross-engine and
        // the oracle replays all 3 rounds as unrolled CTEs.
        graft.operators.PageRank
          .ranks(verifiedNearDupPairs(s, dir), "id_a", "id_b")
          .withColumnRenamed("id_a", "doc_id")
          .orderBy("doc_id")
      },
      Some {
        val rounds = (1 to 3).map { t =>
          s"""c$t AS (
            SELECT e.dst AS id, SUM(CAST(ROUND(p.r / p.deg, 12) AS DECIMAL(28,12))) AS s
            FROM edges e JOIN r${t - 1} p ON e.src = p.id GROUP BY e.dst),
          r$t AS (
            SELECT d.src AS id, d.deg,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n_nodes
                     + CAST(0.85 AS DOUBLE) * CAST(c$t.s AS DOUBLE) AS r
            FROM c$t JOIN deg d ON d.src = c$t.id, nn)"""
        }.mkString(",\n")
        s"""
        WITH $duckVerifiedPairs,
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM ver
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM ver),
        deg AS (SELECT src, COUNT(1) AS deg FROM edges GROUP BY src),
        nn AS (SELECT COUNT(1) AS n_nodes FROM deg),
        r0 AS (
          SELECT src AS id, deg, CAST(1.0 AS DOUBLE) / nn.n_nodes AS r
          FROM deg, nn),
        $rounds
        SELECT id AS doc_id, CAST(deg AS BIGINT) AS degree,
               ROUND(r, 9) AS pagerank
        FROM r3
        ORDER BY doc_id"""
      },
      "Duplication centrality: fixed-round PageRank over the verified " +
        "near-dup graph — edges materialize once, one equi-join + aggregate " +
        "per round, round-then-decimal contribution sums keep ranks " +
        "bit-identical cross-engine; ranks the canonical doc of each " +
        "duplication cluster.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q125
    Q(
      "q125_bigram_xent",
      (s, dir) => {
        // Bigram-LM quality scoring with add-k smoothing — the step up
        // from q109's unigram proxy: P(w2|w1) = (c(w1 w2) + k) /
        // (c(w1 *) + k*V), k = 0.5, V = unigram vocab size. A doc whose
        // bigrams are common word SEQUENCES (not just common words)
        // scores low; shuffled-word soup that fools the unigram filter
        // scores high. Self-trained on the corpus, no external model.
        // Scale: bigram counts are one shuffle on bg (map-side combine);
        // context counts derive from the bigram table (vocab-sized, one
        // shuffle on w1); scoring joins are bg- and w1-keyed equi-joins —
        // hash-partitionable at any vocab size; V is a 1-row broadcast.
        // Cross-engine: counts exact; one shared expression tree per
        // contribution (ln carries 1-ulp slack); per-doc fold in SORTED
        // bigram order, round(,6) AFTER the fold (the q109 discipline).
        val docs = table(s, dir, "documents")
        val bgs = docs
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 2)
          .selectExpr("doc_id", "word_ngrams(toks, 2) as bga")
          .select(col("doc_id"), explode(col("bga")).as("bg"))
        val bgc = bgs.groupBy("bg").agg(count(lit(1)).as("cbg"))
        val ctx = bgc
          .withColumn("w1", expr("substring_index(bg, ' ', 1)"))
          .groupBy("w1").agg(sum("cbg").as("cw1"))
        val voc = docs
          .select(explode(expr("tokenize_text(text)")).as("tok"))
          .agg(countDistinct("tok").as("v"))
        bgs.groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
          .join(bgc, Seq("bg"))
          .withColumn("w1", expr("substring_index(bg, ' ', 1)"))
          .join(ctx, Seq("w1"))
          .crossJoin(broadcast(voc))
          .withColumn("contrib", expr(
            """cast(tf as double) * ln((cast(cbg as double) + 0.5)
               / (cast(cw1 as double) + 0.5 * cast(v as double)))"""))
          .groupBy("doc_id")
          .agg(
            expr(
              """aggregate(
                   transform(array_sort(collect_list(struct(bg, contrib))), p -> p.contrib),
                   cast(0 as double), (a, v) -> a + v)""").as("lsum"),
            sum("tf").as("nbg"))
          .selectExpr("doc_id", "nbg",
            "round(-lsum / cast(nbg as double), 6) as xent2")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH dt AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        bgs AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bg
          FROM dt WHERE len(toks) >= 2),
        bgc AS (SELECT bg, COUNT(1) AS cbg FROM bgs GROUP BY bg),
        ctx AS (
          SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(cbg) AS BIGINT) AS cw1
          FROM bgc GROUP BY 1),
        voc AS (
          SELECT COUNT(DISTINCT tok) AS v FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
        tft AS (SELECT doc_id, bg, COUNT(1) AS tf FROM bgs GROUP BY doc_id, bg),
        sc AS (
          SELECT t.doc_id, t.bg, t.tf,
                 CAST(t.tf AS DOUBLE) * ln((CAST(b.cbg AS DOUBLE) + 0.5)
                   / (CAST(c.cw1 AS DOUBLE) + 0.5 * CAST(voc.v AS DOUBLE))) AS contrib
          FROM tft t
          JOIN bgc b USING (bg)
          JOIN ctx c ON string_split(t.bg, ' ')[1] = c.w1, voc),
        agg AS (
          SELECT doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE), list(contrib ORDER BY bg)),
                   (a, v) -> a + v) AS lsum,
                 CAST(SUM(tf) AS BIGINT) AS nbg
          FROM sc GROUP BY doc_id)
        SELECT doc_id, nbg, round(-lsum / CAST(nbg AS DOUBLE), 6) AS xent2
        FROM agg ORDER BY doc_id"""),
      "Bigram-LM cross-entropy with add-k smoothing: self-trained sequence " +
        "model catches shuffled-word soup the unigram filter passes — bg/w1-" +
        "keyed equi-joins, sorted per-doc fold, no external model."),

    // ---------------------------------------------------------------- q126
    Q(
      "q126_canonical_dedup",
      (s, dir) => {
        // Canonical-form dedup: exact dedup AFTER text normalization
        // (Unicode NFC, lowercase, strip non-alphanumerics, collapse
        // whitespace) — the CCNet-style screen that catches trivially-
        // mutated copies (case, punctuation, spacing, NFC/NFD spelling)
        // that byte-exact q23 misses and that are too cheap to send
        // through MinHash. The corpus has no natural canonical twins
        // (verified), so the query plants deterministic mutated copies
        // of every 25th doc (uppercased + punctuation + doubled spaces,
        // doc_id + 1000000) — the operator must group each twin with its
        // source and elect the lowest id. Every 40th doc additionally
        // plants an NFC/NFD PAIR (+2000000 composed é, +3000000
        // decomposed e+U+0301): visually identical strings whose bytes
        // differ — they group with each other ONLY because the canonical
        // form runs unicode_normalize first. Scale: one hash shuffle on
        // the canonical md5 + one group-back equi-join, exactly the q23
        // shape; normalization is map-only codegen.
        graft.functions.UnicodeExpressions.register(s)
        val docs = table(s, dir, "documents").select("doc_id", "text")
        val twins = docs
          .filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(upper(col("text")), lit("  !!")).as("text"))
        val nfcTwins = docs
          .filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" caf\u00e9!")).as("text"))
        val nfdTwins = docs
          .filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" cafe\u0301!")).as("text"))
        val canon = docs.unionByName(twins).unionByName(nfcTwins).unionByName(nfdTwins)
          .withColumn("canon", expr(
            "trim(regexp_replace(regexp_replace(lower(unicode_normalize(text, 'NFC')), " +
              "'[^a-z0-9 ]', ' '), ' +', ' '))"))
          .withColumn("ch", expr(md5long("canon")))
        val groups = canon.groupBy("ch")
          .agg(count(lit(1)).as("group_size"), min("doc_id").as("keep_id"))
        canon.join(groups, Seq("ch"))
          .selectExpr("doc_id", "ch as canon_hash", "group_size",
            "doc_id = keep_id as keep")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH uni AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, upper(text) || '  !!' FROM documents
          WHERE doc_id % 25 = 0
          UNION ALL
          SELECT doc_id + 2000000, text || ' caf' || chr(233) || '!' FROM documents
          WHERE doc_id % 40 = 0
          UNION ALL
          SELECT doc_id + 3000000, text || ' cafe' || chr(769) || '!' FROM documents
          WHERE doc_id % 40 = 0),
        canon AS (
          SELECT doc_id,
                 ${duckMd5long("trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))")} AS ch
          FROM uni),
        grp AS (
          SELECT ch, COUNT(1) AS group_size, MIN(doc_id) AS keep_id
          FROM canon GROUP BY ch)
        SELECT c.doc_id, c.ch AS canon_hash, g.group_size,
               c.doc_id = g.keep_id AS keep
        FROM canon c JOIN grp g USING (ch)
        ORDER BY c.doc_id"""),
      "Canonicalization dedup: lowercase / punctuation-strip / whitespace-" +
        "collapse then exact-hash grouping — catches mutated copies byte-" +
        "exact dedup misses; one hash shuffle, planted twins prove grouping."),

    // ---------------------------------------------------------------- q127
    Q(
      "q127_boilerplate_frac",
      (s, dir) => {
        // Corpus-boilerplate fraction per document: a 3-gram shingle
        // appearing in >= 5 DISTINCT docs is boilerplate (headers,
        // licenses, navigation chrome), and a doc dominated by such
        // shingles carries little training signal even when every
        // individual line looks fine — the cross-document complement of
        // q55's intra-doc repetition. Scale: shingle df is one shuffle
        // with map-side combine; the hot set is bounded by occurrences/df
        // (the q48 argument) so it BROADCASTS — per-doc stats then need
        // no second shuffle beyond the doc_id rollup; left join keeps
        // docs with zero boilerplate.
        val sh = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"$sparkShingles as shs")
          .select(col("doc_id"), explode(col("shs")).as("sh"))
        val hot = sh.select("doc_id", "sh").distinct()
          .groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 5)
        sh.join(broadcast(hot.select(col("sh"), lit(1).as("isb"))), Seq("sh"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"),
            sum(coalesce(col("isb"), lit(0))).as("n_boiler"))
          .selectExpr("doc_id", "n_sh", "n_boiler",
            "round(cast(n_boiler as double) / cast(n_sh as double), 6) as boiler_frac")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH dt AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (
          SELECT doc_id, unnest($duckShingles) AS sh
          FROM dt WHERE len(toks) >= 3),
        hot AS (
          SELECT sh FROM (
            SELECT sh, COUNT(1) AS df
            FROM (SELECT DISTINCT doc_id, sh FROM sh) GROUP BY sh)
          WHERE df >= 5),
        st AS (
          SELECT s.doc_id, COUNT(1) AS n_sh,
                 CAST(SUM(CASE WHEN h.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
          FROM sh s LEFT JOIN hot h ON s.sh = h.sh
          GROUP BY s.doc_id)
        SELECT doc_id, n_sh, n_boiler,
               round(CAST(n_boiler AS DOUBLE) / CAST(n_sh AS DOUBLE), 6) AS boiler_frac
        FROM st ORDER BY doc_id"""),
      "Per-doc corpus-boilerplate fraction: high-df 3-gram shingles (>= 5 " +
        "distinct docs) flagged via a broadcast hot set — one df shuffle + " +
        "doc rollup; the cross-document complement of intra-doc repetition."),

    // ---------------------------------------------------------------- q128
    Q(
      "q128_vocab_coverage",
      (s, dir) => {
        // Vocabulary coverage curve: the top-100 tokens by corpus
        // frequency with rank and CUMULATIVE corpus-coverage fraction —
        // the curve that sizes a tokenizer vocab (how much of the corpus
        // do the first V entries cover?) and exposes Zipf fit. Scale:
        // token counts are one shuffle; the top-100 cut is
        // TakeOrderedAndProject (no global sort); rank + running sum are
        // computed by a triangular BROADCAST nested-loop self-join over
        // the 100-row frame — O(100^2) on one executor, deliberately NOT
        // a global window (the library's no-single-task-window audit) and
        // never touching corpus-sized data.
        val toks = table(s, dir, "documents")
          .select(explode(expr("tokenize_text(text)")).as("tok"))
        val tot = toks.agg(sum(lit(1L)).as("tt"))
        val top = toks.groupBy("tok").agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), asc("tok")).limit(100)
        top.as("a")
          .join(broadcast(top.as("b")),
            expr("b.c > a.c or (b.c = a.c and b.tok <= a.tok)"))
          .groupBy(col("a.tok").as("tok"), col("a.c").as("c"))
          .agg(count(lit(1)).as("rnk"), sum("b.c").as("cum"))
          .crossJoin(broadcast(tot))
          .selectExpr("rnk", "tok", "c",
            "round(cast(cum as double) / cast(tt as double), 6) as cum_frac")
          .orderBy("rnk")
      },
      Some("""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS tt FROM toks),
        top AS (
          SELECT tok, COUNT(1) AS c FROM toks GROUP BY tok
          ORDER BY c DESC, tok LIMIT 100),
        ranked AS (
          SELECT a.tok, a.c, COUNT(1) AS rnk, CAST(SUM(b.c) AS BIGINT) AS cum
          FROM top a JOIN top b
            ON b.c > a.c OR (b.c = a.c AND b.tok <= a.tok)
          GROUP BY a.tok, a.c)
        SELECT rnk, tok, c,
               round(CAST(cum AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS cum_frac
        FROM ranked, tot ORDER BY rnk"""),
      "Tokenizer-vocab coverage curve: top-100 tokens with rank and " +
        "cumulative corpus fraction — TakeOrderedAndProject cut, triangular " +
        "broadcast self-join over the 100-row frame instead of a global window.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q131
    Q(
      "q131_zipf_slope",
      (s, dir) => {
        // Zipf fit: least-squares slope/intercept of ln(freq) on ln(rank)
        // over the top-100 vocabulary — natural corpora run slope ~ -1, and
        // a corpus that drifts far off is TEMPLATED (machine-generated
        // boilerplate flattens the head) or PRUNED WRONG. Scale: the only
        // corpus-sized step is the token count (one shuffle); everything
        // after runs on a 100-row frame (TakeOrderedAndProject cut +
        // triangular broadcast self-join for ranks, the q128 shape).
        // Cross-engine: ln terms are rounded then DECIMAL-summed (exact,
        // order-independent); the closed-form slope then evaluates one
        // shared double expression tree over those exact sums.
        val toks = table(s, dir, "documents")
          .select(explode(expr("tokenize_text(text)")).as("tok"))
        val top = toks.groupBy("tok").agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), asc("tok")).limit(100)
        top.as("a")
          .join(broadcast(top.as("b")),
            expr("b.c > a.c or (b.c = a.c and b.tok <= a.tok)"))
          .groupBy(col("a.tok").as("tok"), col("a.c").as("c"))
          .agg(count(lit(1)).as("rnk"))
          .selectExpr(
            "ln(cast(rnk as double)) as x",
            "ln(cast(c as double)) as y")
          .agg(
            count(lit(1)).as("n_terms"),
            sum(expr("cast(round(x, 12) as decimal(28,12))")).as("sx"),
            sum(expr("cast(round(y, 12) as decimal(28,12))")).as("sy"),
            sum(expr("cast(round(x * y, 12) as decimal(28,12))")).as("sxy"),
            sum(expr("cast(round(x * x, 12) as decimal(28,12))")).as("sxx"))
          .selectExpr(
            "n_terms",
            """round((cast(n_terms as double) * cast(sxy as double)
                 - cast(sx as double) * cast(sy as double))
               / (cast(n_terms as double) * cast(sxx as double)
                 - cast(sx as double) * cast(sx as double)), 6) as slope""",
            """round((cast(sy as double)
                 - ((cast(n_terms as double) * cast(sxy as double)
                      - cast(sx as double) * cast(sy as double))
                    / (cast(n_terms as double) * cast(sxx as double)
                      - cast(sx as double) * cast(sx as double)))
                   * cast(sx as double)) / cast(n_terms as double), 6) as intercept""")
      },
      Some("""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        top AS (
          SELECT tok, COUNT(1) AS c FROM toks GROUP BY tok
          ORDER BY c DESC, tok LIMIT 100),
        ranked AS (
          SELECT a.tok, a.c, COUNT(1) AS rnk
          FROM top a JOIN top b
            ON b.c > a.c OR (b.c = a.c AND b.tok <= a.tok)
          GROUP BY a.tok, a.c),
        xy AS (
          SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
          FROM ranked),
        sums AS (
          SELECT COUNT(1) AS n_terms,
                 SUM(CAST(ROUND(x, 12) AS DECIMAL(28,12))) AS sx,
                 SUM(CAST(ROUND(y, 12) AS DECIMAL(28,12))) AS sy,
                 SUM(CAST(ROUND(x * y, 12) AS DECIMAL(28,12))) AS sxy,
                 SUM(CAST(ROUND(x * x, 12) AS DECIMAL(28,12))) AS sxx
          FROM xy)
        SELECT n_terms,
               round((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
               round((CAST(sy AS DOUBLE)
                    - ((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                      * CAST(sx AS DOUBLE)) / CAST(n_terms AS DOUBLE), 6) AS intercept
        FROM sums"""),
      "Zipf least-squares fit over the top-100 vocab: round-then-decimal " +
        "term sums + one shared double closed form — only the token count " +
        "touches corpus-sized data; slope ~ -1 flags a natural corpus."),

    // ---------------------------------------------------------------- q132
    Q(
      "q132_max_token_run",
      (s, dir) => {
        // Longest consecutive repeated-token run per document — the Gopher
        // repetition rule that catches 'buy buy buy buy ...' spam which
        // n-gram df and intra-doc dup-fraction (q55) both under-count
        // (a single long run is ONE repeated shingle). The native
        // max_token_run expression does the whole scan in one compiled
        // loop per row — MAP-ONLY, no shuffle, no windows (the relational
        // spelling costs a corpus shuffle plus three window passes; it
        // survives as the oracle and the spec cross-check). Tie-break
        // (longest run, then binary-smallest token) is identical in both
        // engines' default collation — pure integer arithmetic otherwise.
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .selectExpr("doc_id", "max_token_run(toks) as r")
          .selectExpr("doc_id", "r.run_tok as run_tok",
            "cast(r.max_run as bigint) as max_run")
          .orderBy("doc_id")
      },
      Some("""
        WITH pt AS (
          SELECT doc_id, tok, pos FROM (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
            FROM documents)),
        fl AS (
          SELECT doc_id, pos, tok,
                 CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                        OR lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) <> tok
                      THEN 1 ELSE 0 END AS flag
          FROM pt),
        gr AS (
          SELECT doc_id, pos, tok,
                 SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM fl),
        runs AS (
          SELECT doc_id, grp, tok, COUNT(1) AS runlen
          FROM gr GROUP BY doc_id, grp, tok),
        el AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY runlen DESC, tok ASC, grp ASC) AS rn
          FROM runs)
        SELECT doc_id, tok AS run_tok, runlen AS max_run
        FROM el WHERE rn = 1 ORDER BY doc_id"""),
      "Longest consecutive repeated-token run per doc (the Gopher spam " +
        "rule): doc-partitioned lag + running-sum windows, doc-local run " +
        "rollup and election — one doc_id shuffle, pure integer arithmetic."),

    // ---------------------------------------------------------------- q134
    Q(
      "q134_source_scorecard",
      (s, dir) => {
        // Per-source data scorecard: the one-page report a pipeline owner
        // reads before weighting sources in the training mixture — volume
        // (docs, tokens), quality pass rate (q29's rule), byte-exact dup
        // rate (q23's grouping), and language spread. Scale: the dup-rate
        // join is one hash shuffle on the text md5; quality signals are
        // map-only; the final rollup keys on source (tiny). Integer counts
        // divided once at the end — exact cross-engine.
        val docs = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("avg_token_len",
            graft.operators.TextSignals.avgTokenLen(col("text"), col("n_tokens")))
          .withColumn("okf", expr(
            "case when n_tokens >= 20 and avg_token_len between 2.0 and 8.0 then 1 else 0 end"))
          .withColumn("th", expr(md5long("text")))
        val dup = docs.groupBy("th").agg(count(lit(1)).as("gsz"))
        docs.join(dup, Seq("th"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tokens").as("n_tok"),
            countDistinct("lang").as("n_langs"),
            sum("okf").as("n_ok"),
            sum(expr("case when gsz > 1 then 1 else 0 end")).as("n_dup"))
          .selectExpr("source", "n_docs", "n_tok", "n_langs",
            "round(cast(n_ok as double) / cast(n_docs as double), 6) as ok_frac",
            "round(cast(n_dup as double) / cast(n_docs as double), 6) as dup_frac")
          .orderBy("source")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, source, lang, text,
                 len(string_split(text, ' ')) AS n_tokens,
                 CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS avg_token_len,
                 ${duckMd5long("text")} AS th
          FROM documents),
        dup AS (SELECT th, COUNT(1) AS gsz FROM d GROUP BY th),
        j AS (
          SELECT d.source, d.lang,
                 d.n_tokens,
                 CASE WHEN d.n_tokens >= 20 AND d.avg_token_len BETWEEN 2.0 AND 8.0
                      THEN 1 ELSE 0 END AS okf,
                 CASE WHEN dup.gsz > 1 THEN 1 ELSE 0 END AS dupf
          FROM d JOIN dup USING (th))
        SELECT source,
               COUNT(1) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tok,
               COUNT(DISTINCT lang) AS n_langs,
               round(CAST(SUM(okf) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS ok_frac,
               round(CAST(SUM(dupf) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS dup_frac
        FROM j GROUP BY source ORDER BY source"""),
      "Per-source scorecard: volume, token totals, language spread, q29 " +
        "quality pass rate and byte-exact dup rate — one md5 shuffle plus a " +
        "tiny source rollup; the report that sets mixture weights.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q135
    Q(
      "q135_tfidf_neighbors",
      (s, dir) => {
        // Sparse lexical nearest neighbors: per-doc top-3 by TF-IDF cosine
        // over word-3-gram SHINGLES — the similarity search embeddings
        // can't replace (it explains WHY two docs match: shared rare
        // phrases) and the lexical complement of q33's dense ANN.
        // Shingles, not unigrams: a natural corpus' unigram head is all
        // high-df stopwords (this corpus' vocabulary is ~31 tokens, every
        // one of them corpus-wide), while phrases are where rarity lives.
        // Scale: the pair generator is the POSTING-LIST self-join on the
        // shingle with the q48 df cutoff (df <= 20) — fanout per shingle
        // is bounded by df^2, never corpus^2; weights, norms and pair
        // dots are all equi-keyed aggregations (shingle, then doc, then
        // pair); the final ranking partitions by doc. Cross-engine: idf
        // shares one ln tree; w*w and wa*wb terms are rounded then
        // DECIMAL-summed (exact, order-independent); cosines divide
        // exact-decimal casts in one shared double tree, ties to idb.
        val tf = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"$sparkShingles as shs")
          .select(col("doc_id"), explode(col("shs")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20)
        val nd = table(s, dir, "documents").agg(count(lit(1)).as("nd"))
        // The weight frame feeds FOUR consumers (both self-join sides +
        // both norm joins) and is RECOMPUTED for each — deliberately: the
        // pipeline is one columnar scan + two combinable aggregates, and
        // the four replicas run concurrently across the cores, while a
        // localCheckpoint of this corpus-sized frame was MEASURED SLOWER
        // (4.2 s -> 7.0 s at sf0.1) — block serialization of ~1M
        // (doc, shingle, weight) rows costs more than re-deriving them.
        // Materialize-vs-recompute is frame-size-dependent: tiny fronts
        // (q170's verified pairs) checkpoint, corpus-scale intermediates
        // recompute.
        val w = tf.join(dfc, Seq("tok")).crossJoin(broadcast(nd))
          .withColumn("w", expr(
            "cast(tf as double) * ln(cast(nd as double) / cast(df as double))"))
        val n2 = w.groupBy("doc_id")
          .agg(sum(expr("cast(round(w * w, 12) as decimal(28,12))")).as("n2"))
        val dots = w.select(col("tok"), col("doc_id").as("ida"), col("w").as("wa"))
          .join(w.select(col("tok"), col("doc_id").as("idb"), col("w").as("wb")), Seq("tok"))
          .filter(col("ida") =!= col("idb"))
          .groupBy("ida", "idb")
          .agg(sum(expr("cast(round(wa * wb, 12) as decimal(28,12))")).as("dot"))
        dots
          .join(n2.select(col("doc_id").as("ida"), col("n2").as("n2a")), Seq("ida"))
          .join(n2.select(col("doc_id").as("idb"), col("n2").as("n2b")), Seq("idb"))
          .withColumn("cos", expr(
            "cast(dot as double) / (sqrt(cast(n2a as double)) * sqrt(cast(n2b as double)))"))
          .withColumn("rank",
            expr("row_number() over (partition by ida order by cos desc, idb asc)"))
          .filter(col("rank") <= 3)
          .selectExpr("ida", "rank", "idb", "round(cos, 6) as cos")
          .orderBy("ida", "rank")
      },
      Some(s"""
        WITH tf AS (
          SELECT doc_id, tok, COUNT(1) AS tf FROM (
            SELECT doc_id, unnest($duckShingles) AS tok
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            WHERE len(toks) >= 3)
          GROUP BY doc_id, tok),
        dfc AS (
          SELECT tok, COUNT(1) AS df FROM tf GROUP BY tok HAVING COUNT(1) <= 20),
        nd AS (SELECT COUNT(1) AS nd FROM documents),
        w AS (
          SELECT t.doc_id, t.tok,
                 CAST(t.tf AS DOUBLE) * ln(CAST(nd.nd AS DOUBLE) / CAST(d.df AS DOUBLE)) AS w
          FROM tf t JOIN dfc d USING (tok), nd),
        n2 AS (
          SELECT doc_id, SUM(CAST(ROUND(w * w, 12) AS DECIMAL(28,12))) AS n2
          FROM w GROUP BY doc_id),
        dots AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb,
                 SUM(CAST(ROUND(a.w * b.w, 12) AS DECIMAL(28,12))) AS dot
          FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
        cosd AS (
          SELECT d.ida, d.idb,
                 CAST(d.dot AS DOUBLE)
                   / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) AS cos
          FROM dots d
          JOIN n2 na ON d.ida = na.doc_id
          JOIN n2 nb ON d.idb = nb.doc_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY ida
                      ORDER BY cos DESC, idb ASC) AS rank
          FROM cosd)
        SELECT ida, rank, idb, round(cos, 6) AS cos
        FROM ranked WHERE rank <= 3 ORDER BY ida, rank"""),
      "Sparse lexical top-3 neighbors by TF-IDF cosine over 3-gram " +
        "shingles: posting-list self-join bounded by the df <= 20 cutoff " +
        "(df^2 fanout, never corpus^2), round-then-decimal dot/norm sums, " +
        "doc-partitioned ranking — the explainable complement of dense ANN."),

    // ---------------------------------------------------------------- q136
    Q(
      "q136_source_kl_drift",
      (s, dir) => {
        // Distribution drift per source: smoothed KL(source || corpus)
        // over token frequencies — the report that catches a feed whose
        // language/topic mix silently diverged from the corpus it feeds
        // (high KL = re-weight or investigate before training). Add-0.5
        // smoothing over the CORPUS vocabulary, so a source missing a
        // corpus token pays the full penalty. Scale: the source x vocab
        // grid is |sources| * V rows — LINEAR in vocab with a tiny
        // broadcast source list (the GridFill shape), never vocab^2; all
        // joins key on tok. Cross-engine: counts exact; each KL term
        // shares one expression tree (ln slack absorbed by round-then-
        // DECIMAL summation); one final rounded divide.
        val toks = table(s, dir, "documents")
          .select(col("source"), explode(expr("tokenize_text(text)")).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("ct"))
        val vtot = vocab.agg(sum("ct").as("tt"), count(lit(1)).as("v"))
        val stok = toks.groupBy("source", "tok").agg(count(lit(1)).as("cs"))
        val stot = stok.groupBy("source").agg(sum("cs").as("ns"))
        val grid = vocab.crossJoin(broadcast(stot))
          .join(stok, Seq("source", "tok"), "left")
          .withColumn("csf", coalesce(col("cs"), lit(0L)))
        grid.crossJoin(broadcast(vtot))
          .withColumn("ps", expr(
            "(cast(csf as double) + 0.5) / (cast(ns as double) + 0.5 * cast(v as double))"))
          .withColumn("pc", expr(
            "(cast(ct as double) + 0.5) / (cast(tt as double) + 0.5 * cast(v as double))"))
          .withColumn("term", expr("ps * ln(ps / pc)"))
          .groupBy("source")
          .agg(
            max("ns").as("n_tok"),
            sum(expr("cast(round(term, 12) as decimal(28,12))")).as("kls"))
          .selectExpr("source", "n_tok", "round(cast(kls as double), 6) as kl")
          .orderBy("source")
      },
      Some("""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        vocab AS (SELECT tok, COUNT(1) AS ct FROM toks GROUP BY tok),
        vtot AS (
          SELECT CAST(SUM(ct) AS BIGINT) AS tt, COUNT(1) AS v FROM vocab),
        stok AS (
          SELECT source, tok, COUNT(1) AS cs FROM toks GROUP BY source, tok),
        stot AS (
          SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM stok GROUP BY source),
        grid AS (
          SELECT st.source, vc.tok, vc.ct, st.ns,
                 COALESCE(sk.cs, 0) AS csf
          FROM vocab vc CROSS JOIN stot st
          LEFT JOIN stok sk ON sk.source = st.source AND sk.tok = vc.tok),
        terms AS (
          SELECT source, ns,
                 ((CAST(csf AS DOUBLE) + 0.5) / (CAST(ns AS DOUBLE) + 0.5 * CAST(vt.v AS DOUBLE)))
                   * ln(((CAST(csf AS DOUBLE) + 0.5) / (CAST(ns AS DOUBLE) + 0.5 * CAST(vt.v AS DOUBLE)))
                        / ((CAST(ct AS DOUBLE) + 0.5) / (CAST(vt.tt AS DOUBLE) + 0.5 * CAST(vt.v AS DOUBLE)))) AS term
          FROM grid, vtot vt),
        agg AS (
          SELECT source, MAX(ns) AS n_tok,
                 SUM(CAST(ROUND(term, 12) AS DECIMAL(28,12))) AS kls
          FROM terms GROUP BY source)
        SELECT source, n_tok, round(CAST(kls AS DOUBLE), 6) AS kl
        FROM agg ORDER BY source"""),
      "Smoothed KL(source || corpus) over token distributions: the drift " +
        "report that flags a diverging feed — source x vocab grid (linear " +
        "in vocab, broadcast source list), tok-keyed joins, round-then-" +
        "decimal term sums.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q137
    Q(
      "q137_cluster_histogram",
      (s, dir) => {
        // Duplication GRANULARITY report: the cluster-size histogram of
        // the near-dup graph — 'how much of the corpus is duplicated, in
        // how-big groups?' is the first number a dedup pass reports
        // (mass in size-2 pairs is mirror noise; mass in size-50 clusters
        // is a template factory). Composes the same LSH -> connected-
        // components front as q57, then two tiny keyed aggregations
        // (cluster -> size, size -> counts); unpaired docs count as
        // singleton clusters via the left join, exactly q57's contract.
        val docs = table(s, dir, "documents")
        val cand = graft.operators.Dedup.minhashLshCandidates(s, docs, "doc_id", "text")
        val cc = graft.operators.Dedup.clusters(cand).withColumnRenamed("id", "doc_id")
        docs.select("doc_id")
          .join(cc, Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
          .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"),
            sum("cluster_size").as("n_docs"))
          .orderBy("cluster_size")
      },
      Some(s"""
        WITH RECURSIVE sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
        sized AS (
          SELECT COALESCE(cc.cluster_id, d.doc_id) AS cluster_id, COUNT(1) AS cluster_size
          FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
          GROUP BY 1)
        SELECT cluster_size, COUNT(1) AS n_clusters,
               CAST(SUM(cluster_size) AS BIGINT) AS n_docs
        FROM sized GROUP BY cluster_size ORDER BY cluster_size"""),
      "Near-dup cluster-size histogram: LSH pairs -> connected components " +
        "-> size distribution with singleton mass — two tiny keyed rollups " +
        "after the bucket-bounded q57 front; the dedup pass's headline report."),

    // ---------------------------------------------------------------- q138
    Q(
      "q138_quality_election",
      (s, dir) => {
        // Quality-weighted canonical election: within each near-dup
        // cluster keep the BEST document — q29's quality gate first, then
        // the longest, then the smallest id — instead of q57's arbitrary
        // lowest-id keeper. This is the election real pipelines run: near-
        // dup groups usually contain one full document and several
        // truncated or boilerplate-wrapped mutations, and lowest-id keeps
        // the wrong one half the time. Scale: same bucket-bounded LSH ->
        // CC front; quality signals are map-only; the election is one
        // cluster-partitioned window. Integer/boolean ordering only —
        // exact cross-engine.
        val docs = table(s, dir, "documents")
        val cand = graft.operators.Dedup.minhashLshCandidates(s, docs, "doc_id", "text")
        val cc = graft.operators.Dedup.clusters(cand).withColumnRenamed("id", "doc_id")
        val sig = docs
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("avg_token_len",
            graft.operators.TextSignals.avgTokenLen(col("text"), col("n_tokens")))
          .withColumn("okf", expr(
            "case when n_tokens >= 20 and avg_token_len between 2.0 and 8.0 then 1 else 0 end"))
          .select("doc_id", "n_tokens", "okf")
        val el = Window.partitionBy("cluster_id")
          .orderBy(desc("okf"), desc("n_tokens"), asc("doc_id"))
        sig.join(cc, Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
          .withColumn("rn", row_number().over(el))
          .withColumn("keeper_id", first("doc_id").over(
            Window.partitionBy("cluster_id")
              .orderBy(desc("okf"), desc("n_tokens"), asc("doc_id"))
              .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .selectExpr("doc_id", "cluster_id", "okf", "n_tokens",
            "rn = 1 as keep", "keeper_id")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
        sig2 AS (
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 CASE WHEN len(string_split(text, ' ')) >= 20
                        AND CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                              / len(string_split(text, ' ')) BETWEEN 2.0 AND 8.0
                      THEN 1 ELSE 0 END AS okf
          FROM documents),
        clustered AS (
          SELECT s.doc_id, COALESCE(cc.cluster_id, s.doc_id) AS cluster_id,
                 s.okf, s.n_tokens
          FROM sig2 s LEFT JOIN cc ON s.doc_id = cc.id),
        ranked AS (
          SELECT *,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY okf DESC, n_tokens DESC, doc_id ASC) AS rn,
                 first_value(doc_id) OVER (PARTITION BY cluster_id
                   ORDER BY okf DESC, n_tokens DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keeper_id
          FROM clustered)
        SELECT doc_id, cluster_id, okf, n_tokens, rn = 1 AS keep, keeper_id
        FROM ranked ORDER BY doc_id"""),
      "Quality-weighted canonical election inside near-dup clusters: q29's " +
        "quality gate, then length, then id — the election that keeps the " +
        "full document over its truncated mutations; one cluster-partitioned " +
        "window over the bucket-bounded q57 front.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q141
    Q(
      "q141_vocab_growth",
      (s, dir) => {
        // Vocabulary growth curve (Heaps' law checkpoints): distinct
        // vocabulary after ingesting the first 10% / 25% / 50% / 100% of
        // the corpus in doc_id order — the curve that forecasts tokenizer
        // vocab sizing and flags a feed whose vocabulary saturates (pure
        // templates) or explodes (junk). Scale trick: no distinct-count
        // per prefix — each token's FIRST-SEEN doc (min doc_id, one
        // shuffle with map-side combine) makes vocab-at-cutoff a tiny
        // conditional count over the vocab table; checkpoints are a
        // 4-row broadcast. Pure integer arithmetic.
        val cuts = table(s, dir, "documents").agg(max("doc_id").as("mx"))
          .selectExpr("explode(array(10, 25, 50, 100)) as pct", "mx")
          .withColumn("cut", expr("cast(floor(mx * pct / 100.0) as bigint)"))
        val firstSeen = table(s, dir, "documents")
          .select(col("doc_id"), explode(expr("tokenize_text(text)")).as("tok"))
          .groupBy("tok").agg(min("doc_id").as("fd"))
        firstSeen.crossJoin(broadcast(cuts))
          .groupBy("pct", "cut")
          .agg(sum(expr("case when fd <= cut then 1 else 0 end")).as("vocab"))
          .selectExpr("pct", "cut as max_doc_id", "vocab")
          .orderBy("pct")
      },
      Some("""
        WITH cuts AS (
          SELECT pct, CAST(floor(mx * pct / 100.0) AS BIGINT) AS cut
          FROM (SELECT MAX(doc_id) AS mx FROM documents),
               (SELECT unnest([10, 25, 50, 100]) AS pct)),
        fs AS (
          SELECT tok, MIN(doc_id) AS fd FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          GROUP BY tok)
        SELECT c.pct, c.cut AS max_doc_id,
               CAST(SUM(CASE WHEN fs.fd <= c.cut THEN 1 ELSE 0 END) AS BIGINT) AS vocab
        FROM fs CROSS JOIN cuts c
        GROUP BY c.pct, c.cut
        ORDER BY c.pct"""),
      "Heaps'-law vocabulary growth at 10/25/50/100% corpus prefixes: " +
        "first-seen doc per token (one shuffle) turns every prefix distinct-" +
        "count into a conditional sum over the vocab table — no per-prefix " +
        "scans, checkpoints broadcast."),

    // ---------------------------------------------------------------- q142
    Q(
      "q142_novelty_frac",
      (s, dir) => {
        // Per-doc NOVELTY: the fraction of a document's distinct 3-gram
        // shingles never seen in any EARLIER doc (doc_id order = ingest
        // order) — the marginal-contribution score an incremental ingest
        // uses to drop docs that add nothing (novelty ~ 0 = rehash of
        // already-held content; the stream analogue of q79's incremental
        // screen). Scale: first-seen doc per shingle is one shuffle with
        // map-side combine; the novelty join keys on (shingle) postings
        // and rolls up on doc_id. Pure integer counts, one final divide.
        val sh = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"array_distinct($sparkShingles) as shs")
          .select(col("doc_id"), explode(col("shs")).as("sh"))
        val firstSeen = sh.groupBy("sh").agg(min("doc_id").as("fd"))
        sh.join(firstSeen, Seq("sh"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sh"),
            sum(expr("case when fd = doc_id then 1 else 0 end")).as("n_new"))
          .selectExpr("doc_id", "n_sh", "n_new",
            "round(cast(n_new as double) / cast(n_sh as double), 6) as novelty")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH sh AS (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id, unnest($duckShingles) AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            WHERE len(toks) >= 3)),
        fs AS (SELECT sh, MIN(doc_id) AS fd FROM sh GROUP BY sh)
        SELECT s.doc_id, COUNT(1) AS n_sh,
               CAST(SUM(CASE WHEN fs.fd = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               round(CAST(SUM(CASE WHEN fs.fd = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(1) AS DOUBLE), 6) AS novelty
        FROM sh s JOIN fs USING (sh)
        GROUP BY s.doc_id ORDER BY s.doc_id"""),
      "Per-doc novelty fraction: distinct shingles first seen by THIS doc " +
        "over its total — the marginal-contribution score of incremental " +
        "ingest; first-seen map-side-combined shuffle plus a doc rollup.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q144
    Q(
      "q144_dataset_card",
      (s, dir) => {
        // The DATASET CARD: one row summarizing the corpus the way a
        // datasheet/model-card reports it — volume (docs, tokens, bytes),
        // vocabulary, language and source spread, byte-exact duplication
        // rate, and q29's quality pass rate. Every number is an exact
        // integer aggregate (one final divide each); the dup rate rides
        // the q23 md5 grouping. Scale: two shuffles total (md5 groups,
        // token distinct) + map-only signals folded into ONE corpus-wide
        // aggregation — the cheap 'run it every ingest' report.
        val docs = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("avg_token_len",
            graft.operators.TextSignals.avgTokenLen(col("text"), col("n_tokens")))
          .withColumn("okf", expr(
            "case when n_tokens >= 20 and avg_token_len between 2.0 and 8.0 then 1 else 0 end"))
          .withColumn("th", expr(md5long("text")))
        val dup = docs.groupBy("th").agg(count(lit(1)).as("gsz"))
        val vocab = docs
          .select(explode(col("toks")).as("tok"))
          .agg(countDistinct("tok").as("vocab"))
        docs.join(dup, Seq("th"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tokens").as("n_tokens"),
            sum(length(col("text"))).as("n_bytes"),
            countDistinct("lang").as("n_langs"),
            countDistinct("source").as("n_sources"),
            sum("okf").as("n_ok"),
            sum(expr("case when gsz > 1 then 1 else 0 end")).as("n_dup"))
          .crossJoin(broadcast(vocab))
          .selectExpr("n_docs", "n_tokens", "n_bytes", "vocab",
            "n_langs", "n_sources",
            "round(cast(n_ok as double) / cast(n_docs as double), 6) as ok_frac",
            "round(cast(n_dup as double) / cast(n_docs as double), 6) as dup_frac")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, source, lang, text,
                 len(string_split(text, ' ')) AS n_tokens,
                 CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS avg_token_len,
                 ${duckMd5long("text")} AS th
          FROM documents),
        dup AS (SELECT th, COUNT(1) AS gsz FROM d GROUP BY th),
        voc AS (
          SELECT COUNT(DISTINCT tok) AS vocab FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents))
        SELECT COUNT(1) AS n_docs,
               CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(LENGTH(d.text)) AS BIGINT) AS n_bytes,
               voc.vocab AS vocab,
               COUNT(DISTINCT d.lang) AS n_langs,
               COUNT(DISTINCT d.source) AS n_sources,
               round(CAST(SUM(CASE WHEN d.n_tokens >= 20 AND d.avg_token_len BETWEEN 2.0 AND 8.0
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(1) AS DOUBLE), 6) AS ok_frac,
               round(CAST(SUM(CASE WHEN dup.gsz > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(1) AS DOUBLE), 6) AS dup_frac
        FROM d JOIN dup USING (th), voc
        GROUP BY voc.vocab"""),
      "One-row dataset card: volume, vocabulary, language/source spread, " +
        "byte-exact dup rate, quality pass rate — exact integer aggregates, " +
        "two shuffles total; the datasheet an ingest run publishes.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q145
    Q(
      "q145_retrieval_eval",
      (s, dir) => {
        import s.implicits._
        // RETRIEVAL EVALUATION: MRR, precision/recall@10 and NDCG@10 for the
        // per-term BM25 ranking (q94's scorer), judged against a relevance
        // label independent of the score — "the term occurs within the doc's
        // first 20 tokens" (a title-match proxy). The per-term ranking is
        // produced by the typed TopKByValue aggregator, so shuffle volume is
        // O(terms x k): the 3 busiest posting lists are exactly the
        // corpus-sized frames a per-term ranking window would sort in ONE
        // task at 100 TB. DCG is an ordered reduce (deterministic float sum
        // order); every ratio is one final IEEE divide, rounded.
        val toks = table(s, dir, "documents")
          .select(col("doc_id"), posexplode(expr("tokenize_text(text)")).as(Seq("pos", "tok")))
        val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val stats = lens.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
        val qterms = toks.groupBy("tok").agg(count(lit(1)).as("f"))
          .orderBy(col("f").desc, col("tok")).limit(3).select("tok")
        val tfs = toks.join(broadcast(qterms), Seq("tok"))
          .groupBy("doc_id", "tok")
          .agg(count(lit(1)).as("tf"), min("pos").as("minpos"))
          .withColumn("rel", when(col("minpos") <= 19, 1L).otherwise(0L))
        val dfs = tfs.groupBy("tok").agg(count(lit(1)).as("df"))
        val scored = tfs
          .join(lens, Seq("doc_id"))
          .join(broadcast(dfs), Seq("tok"))
          .crossJoin(broadcast(stats))
          .withColumn("sterm", expr(
            """ln(1.0d + (cast(nd - df as double) + 0.5d) / (cast(df as double) + 0.5d))
               * ((cast(tf as double) * 2.2d)
                  / (cast(tf as double)
                     + 1.2 * (0.25d + 0.75d * (cast(dl as double)
                                               / (cast(tt as double) / cast(nd as double))))))"""))
        val nrel = scored.groupBy("tok").agg(sum("rel").as("n_rel_total"))
        val top = scored.select(col("tok"), col("doc_id"), col("sterm"))
          .as[(String, Long, Double)]
          .groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(new graft.operators.TopKByValue(10).toColumn.name("top"))
          .flatMap { case (tok, hits) =>
            hits.iterator.zipWithIndex.map { case ((id, _), i) => (tok, i + 1, id) }
          }
          .toDF("tok", "rank", "doc_id")
        val metrics = scored.join(broadcast(top), Seq("tok", "doc_id"))
          .withColumn("gain",
            col("rel").cast("double") / log2(col("rank").cast("double") + lit(1.0)))
          .groupBy("tok")
          .agg(
            max(col("rel").cast("double") / col("rank").cast("double")).as("mrr"),
            sum("rel").as("n_rel_top"),
            expr("""aggregate(
                 transform(array_sort(collect_list(struct(rank, gain))), p -> p.gain),
                 cast(0 as double), (a, v) -> a + v)""").as("dcg"))
        metrics.join(broadcast(nrel), Seq("tok"))
          .withColumn("idcg", expr(
            """case when n_rel_total = 0 then cast(0 as double)
               else aggregate(
                 transform(sequence(1, int(least(n_rel_total, 10))),
                           i -> 1.0d / log2(cast(i as double) + 1.0d)),
                 cast(0 as double), (a, v) -> a + v) end"""))
          .selectExpr(
            "tok", "n_rel_total", "n_rel_top",
            "round(mrr, 6) as mrr",
            "round(cast(n_rel_top as double) / 10.0d, 6) as p_at_10",
            """case when n_rel_total = 0 then cast(0 as double)
               else round(cast(n_rel_top as double) / cast(n_rel_total as double), 6)
               end as recall_at_10""",
            """case when n_rel_total = 0 then cast(0 as double)
               else round(dcg / idcg, 6) end as ndcg_at_10""")
          .orderBy("tok")
      },
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        lens AS (SELECT doc_id, COUNT(1) AS dl FROM tk GROUP BY doc_id),
        st AS (SELECT COUNT(1) AS nd, CAST(SUM(dl) AS BIGINT) AS tt FROM lens),
        qt AS (SELECT tok FROM (
          SELECT tok, COUNT(1) AS f FROM tk GROUP BY tok
          ORDER BY f DESC, tok LIMIT 3)),
        tf AS (SELECT t.doc_id, t.tok, COUNT(1) AS tf
               FROM tk t JOIN qt USING (tok) GROUP BY t.doc_id, t.tok),
        rl AS (SELECT t.doc_id, t.tok, t.tf,
                      CASE WHEN list_contains(d.toks[1:20], t.tok) THEN 1 ELSE 0 END AS rel
               FROM tf t JOIN d USING (doc_id)),
        dft AS (SELECT tok, COUNT(1) AS df FROM tf GROUP BY tok),
        sc AS (SELECT r.doc_id, r.tok, r.rel,
                      ln(1.0 + (CAST(st.nd - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
                      * ((CAST(r.tf AS DOUBLE) * 2.2)
                         / (CAST(r.tf AS DOUBLE)
                            + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
                                                    / (CAST(st.tt AS DOUBLE) / CAST(st.nd AS DOUBLE)))))) AS sterm
               FROM rl r JOIN lens l USING (doc_id) JOIN dft f USING (tok), st),
        nrel AS (SELECT tok, CAST(SUM(rel) AS BIGINT) AS n_rel_total FROM sc GROUP BY tok),
        top AS (SELECT * FROM (
                  SELECT tok, doc_id, rel,
                         row_number() OVER (PARTITION BY tok ORDER BY sterm DESC, doc_id ASC) AS rank
                  FROM sc) WHERE rank <= 10),
        m AS (SELECT tok,
                     max(CAST(rel AS DOUBLE) / rank) AS mrr,
                     CAST(SUM(rel) AS BIGINT) AS n_rel_top,
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list(CAST(rel AS DOUBLE) / log2(CAST(rank AS DOUBLE) + 1.0) ORDER BY rank)),
                       (a, v) -> a + v) AS dcg
              FROM top GROUP BY tok)
        SELECT m.tok, n.n_rel_total, m.n_rel_top,
               round(m.mrr, 6) AS mrr,
               round(CAST(m.n_rel_top AS DOUBLE) / 10.0, 6) AS p_at_10,
               CASE WHEN n.n_rel_total = 0 THEN CAST(0 AS DOUBLE)
                    ELSE round(CAST(m.n_rel_top AS DOUBLE) / CAST(n.n_rel_total AS DOUBLE), 6)
                    END AS recall_at_10,
               CASE WHEN n.n_rel_total = 0 THEN CAST(0 AS DOUBLE)
                    ELSE round(m.dcg / list_reduce(list_prepend(CAST(0 AS DOUBLE),
                           list_transform(range(1, CAST(least(n.n_rel_total, 10) AS INTEGER) + 1),
                             i -> 1.0 / log2(CAST(i AS DOUBLE) + 1.0))),
                           (a, v) -> a + v), 6) END AS ndcg_at_10
        FROM m JOIN nrel n USING (tok) ORDER BY m.tok"""),
      "Retrieval evaluation: MRR, precision/recall@10, NDCG@10 of the BM25 " +
        "per-term ranking vs a score-independent relevance label — ranking " +
        "via the k-bounded typed top-k aggregator (O(terms x k) shuffle, " +
        "no per-term global window sort), DCG as an ordered reduce."),

    // ---------------------------------------------------------------- q146
    Q(
      "q146_token_entropy",
      (s, dir) => {
        // Per-doc Shannon token entropy + unique-token fraction — the
        // repetition/templating screen (low entropy = boilerplate, keyword
        // stuffing, generator loops; Gopher-style filters threshold both).
        // The native token_entropy expression makes this MAP-ONLY: one
        // compiled hash-count pass per row inside whole-stage codegen — the
        // SQL spellings need either a corpus-sized explode+group-by shuffle
        // for a per-ROW signal or an O(uniq x n) nested HOF.
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .selectExpr(
            "doc_id",
            "size(toks) as n_tokens",
            "size(array_distinct(toks)) as n_uniq",
            "round(token_entropy(toks), 6) as entropy",
            "round(cast(size(array_distinct(toks)) as double) / size(toks), 6) as uniq_frac")
          .withColumn("low_entropy", col("entropy") < 4.0)
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        cnt AS (SELECT doc_id, tok, COUNT(1) AS c FROM tk GROUP BY doc_id, tok),
        tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(1) AS n_uniq
                FROM cnt GROUP BY doc_id),
        p AS (SELECT c.doc_id, c.tok, CAST(c.c AS DOUBLE) / t.n AS p
              FROM cnt c JOIN tot t USING (doc_id)),
        ent AS (SELECT doc_id,
                       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list(-(p * log2(p)) ORDER BY tok)), (a, v) -> a + v) AS h
                FROM p GROUP BY doc_id)
        SELECT d.doc_id, len(d.toks) AS n_tokens, t.n_uniq,
               round(e.h, 6) AS entropy,
               round(CAST(t.n_uniq AS DOUBLE) / len(d.toks), 6) AS uniq_frac,
               round(e.h, 6) < 4.0 AS low_entropy
        FROM d JOIN ent e USING (doc_id) JOIN tot t USING (doc_id)
        ORDER BY d.doc_id"""),
      "Per-doc token entropy + unique-token fraction (repetition screen) " +
        "via the native token_entropy expression — map-only, zero shuffle, " +
        "whole-stage codegen; entropy terms summed in token-sorted order " +
        "for cross-engine determinism."),

    // ---------------------------------------------------------------- q147
    Q(
      "q147_k_anonymity",
      (s, dir) => {
        // k-ANONYMITY AUDIT: treat (lang, source, 100-char length bucket)
        // as quasi-identifiers and measure equivalence-class sizes — the
        // re-identification risk report a privacy review wants next to the
        // q72 PII scrub. One shuffle (the class group-by, map-side
        // combined) + a scalar rollup; class count is bounded by the QI
        // cardinality product, never corpus size.
        table(s, dir, "documents")
          .groupBy(
            col("lang"), col("source"),
            (floor(col("n_chars") / 100) * 100).cast("long").as("chars_bucket"))
          .agg(count(lit(1)).as("k"))
          .agg(
            count(lit(1)).as("n_classes"),
            min("k").as("min_k"),
            sum(when(col("k") < 5, 1L).otherwise(0L)).as("classes_below_5"),
            sum(when(col("k") < 5, col("k")).otherwise(0L)).as("docs_below_5"),
            sum("k").as("n_docs"))
          .selectExpr(
            "n_classes", "min_k", "classes_below_5", "docs_below_5",
            "round(cast(docs_below_5 as double) / cast(n_docs as double), 6) as risk_frac")
      },
      Some("""
        WITH g AS (
          SELECT lang, source, CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS b,
                 COUNT(1) AS k
          FROM documents GROUP BY 1, 2, 3)
        SELECT COUNT(1) AS n_classes, MIN(k) AS min_k,
               CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_5,
               CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS docs_below_5,
               round(CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(k) AS DOUBLE), 6) AS risk_frac
        FROM g"""),
      "k-anonymity audit over (lang, source, length-bucket) quasi-identifier " +
        "classes: class count, min k, and the fraction of docs in classes " +
        "below k=5 — one map-side-combined shuffle plus a scalar rollup."),

    // ---------------------------------------------------------------- q149
    Q(
      "q149_containment_dedup",
      (s, dir) => {
        // CONTAINMENT (asymmetric Jaccard) over the LSH candidate front:
        // |A∩B| / |A| catches quote-inclusion and excerpt duplicates that
        // symmetric Jaccard under-scores (a 50-shingle doc fully embedded
        // in a 500-shingle doc has jaccard 0.1 but containment 1.0). Same
        // bucketed candidate generation as q24/q25 — never all-pairs; the
        // shingle-set join is df-keyed on candidate ids only.
        val docs = table(s, dir, "documents")
        val cand = graft.operators.Dedup
          .minhashLshCandidates(s, docs, "doc_id", "text")
        val sh = docs
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"array_distinct($sparkShingles) as sh")
        cand
          .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("inter", expr("size(array_intersect(sh_a, sh_b))"))
          .filter(col("inter") > 0)
          .withColumn("jaccard", expr(
            "cast(inter as double) / size(array_union(sh_a, sh_b))"))
          .withColumn("containment", expr(
            """greatest(cast(inter as double) / size(sh_a),
                        cast(inter as double) / size(sh_b))"""))
          .filter(col("containment") >= 0.8)
          .select(
            col("id_a"), col("id_b"),
            round(col("jaccard"), 6).as("jaccard"),
            round(col("containment"), 6).as("containment"),
            (col("jaccard") < 0.5).as("quote_like"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id),
        shv AS (
          SELECT doc_id, list_distinct($duckShingles) AS sh
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 3),
        m AS (
          SELECT p.id_a, p.id_b,
                 len(list_intersect(a.sh, b.sh)) AS inter,
                 len(a.sh) AS la, len(b.sh) AS lb,
                 len(list_distinct(list_concat(a.sh, b.sh))) AS un
          FROM pairs p JOIN shv a ON p.id_a = a.doc_id JOIN shv b ON p.id_b = b.doc_id
          WHERE len(list_intersect(a.sh, b.sh)) > 0)
        SELECT id_a, id_b,
               round(CAST(inter AS DOUBLE) / un, 6) AS jaccard,
               round(greatest(CAST(inter AS DOUBLE) / la,
                              CAST(inter AS DOUBLE) / lb), 6) AS containment,
               CAST(inter AS DOUBLE) / un < 0.5 AS quote_like
        FROM m
        WHERE greatest(CAST(inter AS DOUBLE) / la, CAST(inter AS DOUBLE) / lb) >= 0.8
        ORDER BY id_a, id_b"""),
      "Containment (asymmetric Jaccard) over the LSH candidate front: " +
        "flags quote-inclusion/excerpt duplicates symmetric Jaccard misses " +
        "— same bucketed candidates as q24/q25, never all-pairs.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q151
    Q(
      "q151_dup_triangles",
      (s, dir) => {
        // Triangle census of the verified near-dup graph (q121/q122's
        // shared front): triangles vs wedges give the global clustering
        // coefficient — high clustering means duplication comes in dense
        // CLIQUES (template farms, mirror sites: transitive, safe to
        // collapse to one canonical), low clustering means chains of
        // pairwise-similar-but-drifting docs where collapsing the whole
        // component would over-delete. The standard distributed shape:
        // the id_a < id_b edge orientation counts each triangle exactly
        // once via one neighborhood equi-join on the shared endpoint plus
        // one edge-existence equi-join — never an all-pairs expansion;
        // wedges are one node-keyed degree aggregate. Three 1-row
        // aggregates broadcast back into the single summary row.
        val ver = verifiedNearDupPairs(s, dir).select("id_a", "id_b")
        val und = ver.select(col("id_a").as("id"))
          .unionAll(ver.select(col("id_b").as("id")))
        val nodes = und.groupBy("id").agg(count(lit(1)).as("d"))
          .agg(count(lit(1)).as("n_nodes"),
            sum(expr("d * (d - 1) div 2")).as("n_wedges"))
        val edges = ver.agg(count(lit(1)).as("n_edges"))
        val tri = ver.as("e1")
          .join(ver.as("e2"), col("e1.id_b") === col("e2.id_a"))
          .join(ver.as("e3"),
            col("e3.id_a") === col("e1.id_a") && col("e3.id_b") === col("e2.id_b"))
          .agg(count(lit(1)).as("n_triangles"))
        nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
          .select(
            col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
            round(
              when(col("n_wedges") === 0, lit(0.0d))
                .otherwise(lit(3.0d) * col("n_triangles").cast("double")
                  / col("n_wedges").cast("double")), 6).as("clustering"))
      },
      Some(s"""
        WITH $duckVerifiedPairs,
        und AS (SELECT id_a AS id FROM ver UNION ALL SELECT id_b AS id FROM ver),
        deg AS (SELECT id, COUNT(1) AS d FROM und GROUP BY id),
        nodes AS (
          SELECT COUNT(1) AS n_nodes,
                 CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
          FROM deg),
        edg AS (SELECT COUNT(1) AS n_edges FROM ver),
        tri AS (
          SELECT COUNT(1) AS n_triangles
          FROM ver e1
          JOIN ver e2 ON e1.id_b = e2.id_a
          JOIN ver e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b)
        SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges,
               n_wedges,
               CAST(n_triangles AS BIGINT) AS n_triangles,
               round(CASE WHEN n_wedges = 0 THEN 0.0
                          ELSE 3.0 * n_triangles / n_wedges END, 6) AS clustering
        FROM nodes, edg, tri"""),
      "Triangle census of the verified near-dup graph: ordered-edge " +
        "neighborhood join counts each triangle once, wedges from one " +
        "degree aggregate — clustering coefficient separates clique-like " +
        "template duplication (safe to collapse) from drift chains " +
        "(over-deletion risk).")
  ) ++ Seq(

    // ---------------------------------------------------------------- q155
    Q(
      "q155_source_gini",
      (s, dir) => {
        // Source-concentration audit: Lorenz curve + Gini coefficient of
        // token mass across sources — the imbalance number a mixture
        // designer (q74/q111) reads before setting rates: Gini near 0
        // means sources already contribute evenly, near 1 means one
        // source dominates the token budget. Token counts are one
        // source-keyed shuffle (map-side combine); everything after runs
        // on the SOURCE-sized aggregate (a handful of rows — the q121
        // tiny-aggregate discipline). Rank and Lorenz cumsum come from a
        // broadcast <=-self-join over that aggregate rather than an
        // unpartitioned window, keeping the library-wide no-global-window
        // audit strict. Gini uses the exact rank-weighted integer form
        // 2*Σi*x_i/(k*Σx) - (k+1)/k; cumulative shares divide exact
        // integer cumsums.
        val toks = table(s, dir, "documents")
          .select(col("source"), explode(expr("tokenize_text(text)")).as("tok"))
        val perRaw = toks.groupBy("source").agg(count(lit(1)).as("toks"))
        val other = perRaw
          .select(col("source").as("s2"), col("toks").as("t2"))
        val per = perRaw
          .join(broadcast(other),
            col("t2") < col("toks")
              || (col("t2") === col("toks") && col("s2") <= col("source")))
          .groupBy("source", "toks")
          .agg(count(lit(1)).as("rk"), sum("t2").as("cum"))
        val tot = per.agg(
          sum("toks").as("tt"), count(lit(1)).as("k"),
          sum(expr("rk * toks")).as("w"))
        per.crossJoin(broadcast(tot))
          .selectExpr(
            "source", "toks",
            "round(cast(toks as double) / cast(tt as double), 6) as share",
            "round(cast(cum as double) / cast(tt as double), 6) as cum_share",
            """round(cast(2 * w as double) / cast(k * tt as double)
                     - cast(k + 1 as double) / cast(k as double), 6) as gini""")
          .orderBy("toks", "source")
      },
      Some("""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        per AS (
          SELECT source, COUNT(1) AS toks FROM toks GROUP BY source),
        rk AS (
          SELECT a.source, a.toks, COUNT(1) AS rk,
                 CAST(SUM(b.toks) AS BIGINT) AS cum
          FROM per a JOIN per b
            ON (b.toks < a.toks) OR (b.toks = a.toks AND b.source <= a.source)
          GROUP BY a.source, a.toks),
        tot AS (
          SELECT CAST(SUM(toks) AS BIGINT) AS tt, COUNT(1) AS k,
                 CAST(SUM(rk * toks) AS BIGINT) AS w
          FROM rk)
        SELECT source, toks,
               round(CAST(toks AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share,
               round(CAST(cum AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS cum_share,
               round(CAST(2 * w AS DOUBLE) / CAST(k * tt AS DOUBLE)
                     - CAST(k + 1 AS DOUBLE) / CAST(k AS DOUBLE), 6) AS gini
        FROM rk, tot
        ORDER BY toks, source"""),
      "Source-concentration audit: Lorenz cumulative shares + exact " +
        "rank-weighted Gini over token mass per source — one source-keyed " +
        "shuffle, then source-sized tiny aggregates; the imbalance number " +
        "mixture design reads before setting rates.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q156
    Q(
      "q156_bpe_merge_loop",
      (s, dir) => {
        // The BPE training LOOP (q112 is one round of pair counting; this
        // closes the loop): pick the most frequent adjacent pair, MERGE it
        // into a fresh symbol (chr(1), chr(2) — outside the printable
        // corpus alphabet), recount pairs over the merged text, repeat —
        // 3 unrolled rounds, emitting each round's winning merge rule and
        // its frequency. The classic BPE scale shape: every round runs
        // over the DISTINCT-word table (vocab-sized, one shuffle), never
        // corpus text; the winning pair is a 1-row TakeOrderedAndProject
        // broadcast back into the next round's replace() — no driver
        // collect, no corpus rewrite. replace() merges left-to-right
        // non-overlapping in both engines, which IS greedy BPE apply.
        val (m1, m2, m3, _) = bpeChain(s, dir)
        // readable merge rules: placeholder symbols spelled <1>/<2>
        m1.selectExpr(
            "1 as round", "n1 as n",
            "replace(replace(p1, chr(1), '<1>'), chr(2), '<2>') as merge_rule")
          .unionAll(m2.selectExpr(
            "2 as round", "n2 as n",
            "replace(replace(p2, chr(1), '<1>'), chr(2), '<2>') as merge_rule"))
          .unionAll(m3.selectExpr(
            "3 as round", "n3 as n",
            "replace(replace(p3, chr(1), '<1>'), chr(2), '<2>') as merge_rule"))
          .select("round", "merge_rule", "n")
          .orderBy("round")
      },
      Some(s"""
        WITH $duckBpeCtes
        SELECT round, merge_rule, n FROM (
          SELECT 1 AS round,
                 replace(replace(p1, chr(1), '<1>'), chr(2), '<2>') AS merge_rule,
                 n1 AS n FROM m1
          UNION ALL
          SELECT 2, replace(replace(p2, chr(1), '<1>'), chr(2), '<2>'), n2 FROM m2
          UNION ALL
          SELECT 3, replace(replace(p3, chr(1), '<1>'), chr(2), '<2>'), n3 FROM m3)
        ORDER BY round"""),
      "The BPE training loop closed: 3 unrolled merge rounds — count " +
        "adjacent pairs over the distinct-word table, elect the top pair " +
        "(1-row broadcast back), replace() it into a fresh symbol, recount " +
        "— greedy left-to-right merge semantics identical in both engines; " +
        "vocab-sized work per round, never corpus text.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q160
    Q(
      "q160_pmi_collocations",
      (s, dir) => {
        // PMI collocation extraction — the phrase-mining step embedding
        // pipelines run before tokenizer/vocab decisions (word2vec-style
        // "new_york" units): pointwise mutual information of adjacent
        // token pairs, ln((c_ab/B) / ((c_a/T)(c_b/T))), min support 5,
        // top-20. High PMI = tokens that co-occur far above chance —
        // multiword units; frequency alone (q112's top pairs) surfaces
        // "of the" instead. Scale: bigram and unigram counts are each one
        // shuffle with map-side combine; the scoring joins are token-
        // keyed; both totals broadcast back as 1-row aggregates; top-20
        // is TakeOrderedAndProject. The shared-ln-tree + round(,6)
        // discipline keeps scores engine-identical.
        val docs = table(s, dir, "documents")
        val withToks = docs.withColumn("toks", expr("tokenize_text(text)"))
        val bg = withToks.filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(toks) - 1),
                 i -> struct(element_at(toks, i) as w1, element_at(toks, i + 1) as w2))"""))
            .as("p"))
          .select("p.w1", "p.w2")
          .groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
        val uni = withToks
          .select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        val tU = uni.agg(sum("c").as("tt"))
        val tB = bg.agg(sum("cab").as("bb"))
        bg.filter(col("cab") >= 5)
          .join(uni.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
          .join(uni.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
          .crossJoin(broadcast(tU)).crossJoin(broadcast(tB))
          .withColumn("pmi", expr(
            """round(ln((cast(cab as double) / cast(bb as double))
                        / ((cast(c1 as double) / cast(tt as double))
                           * (cast(c2 as double) / cast(tt as double)))), 6)"""))
          .select("w1", "w2", "cab", "pmi")
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        bg AS (
          SELECT w1, w2, COUNT(1) AS cab FROM (
            SELECT toks[CAST(i AS INTEGER)] AS w1,
                   toks[CAST(i + 1 AS INTEGER)] AS w2
            FROM toks, unnest(range(1, len(toks))) AS u(i)
            WHERE len(toks) >= 2)
          GROUP BY w1, w2),
        uni AS (
          SELECT tok, COUNT(1) AS c
          FROM (SELECT unnest(toks) AS tok FROM toks) GROUP BY tok),
        tu AS (SELECT CAST(SUM(c) AS BIGINT) AS tt FROM uni),
        tb AS (SELECT CAST(SUM(cab) AS BIGINT) AS bb FROM bg)
        SELECT b.w1, b.w2, b.cab,
               round(ln((CAST(b.cab AS DOUBLE) / CAST(bb AS DOUBLE))
                        / ((CAST(u1.c AS DOUBLE) / CAST(tt AS DOUBLE))
                           * (CAST(u2.c AS DOUBLE) / CAST(tt AS DOUBLE)))), 6) AS pmi
        FROM bg b
        JOIN uni u1 ON u1.tok = b.w1
        JOIN uni u2 ON u2.tok = b.w2, tu, tb
        WHERE b.cab >= 5
        ORDER BY pmi DESC, b.w1, b.w2 LIMIT 20"""),
      "PMI collocation mining: adjacent-pair pointwise mutual information " +
        "at min support 5, top-20 — the multiword-unit discovery step " +
        "before vocab decisions; token-keyed joins, broadcast totals, " +
        "TakeOrderedAndProject top-k."),

    // ---------------------------------------------------------------- q161
    Q(
      "q161_langid_confusion",
      (s, dir) => {
        // The audit row for q28's language-ID heuristic — same confusion-
        // summary pattern as the q97/q102/q115 trilogy, now for the text
        // classifier: true-lang x predicted-lang counts plus per-truth
        // recall fractions. The matrix says WHERE the classifier bleeds
        // (which languages alias under the stopword heuristic), which a
        // single accuracy number hides. Scale: one map pass to score (the
        // stopword arrays are literals), one (lang, predicted) shuffle of
        // a languages²-sized aggregate, per-truth totals joined on the
        // tiny aggregate.
        val scores = langWords.map { case (l, ws) =>
          s"size(array_intersect(toks, array($ws))) as s_$l"
        }
        val caseChain = langWords.map(_._1).map { l =>
          val geAll = langWords.map(_._1).filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" and ")
          s"when $geAll then '$l'"
        }.mkString(" ")
        val scored = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .selectExpr(Seq("doc_id", "lang") ++ scores: _*)
          .selectExpr("doc_id", "lang", s"case $caseChain end as predicted")
        val cm = scored.groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        val tot = cm.groupBy("lang").agg(sum("n").as("lang_total"))
        cm.join(tot, Seq("lang"))
          .selectExpr("lang", "predicted", "n", "lang_total",
            "round(cast(n as double) / cast(lang_total as double), 6) as frac")
          .orderBy("lang", "predicted")
      },
      Some {
        val scores = langWords.map { case (l, ws) =>
          s"len(list_intersect(toks, [$ws])) AS s_$l"
        }
        val caseChain = langWords.map(_._1).map { l =>
          val geAll = langWords.map(_._1).filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
          s"WHEN $geAll THEN '$l'"
        }.mkString(" ")
        s"""
        WITH scored AS (
          SELECT doc_id, lang, CASE $caseChain END AS predicted
          FROM (
            SELECT doc_id, lang, ${scores.mkString(", ")}
            FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents))),
        cm AS (
          SELECT lang, predicted, COUNT(1) AS n
          FROM scored GROUP BY lang, predicted),
        tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_total FROM cm GROUP BY lang)
        SELECT cm.lang, cm.predicted, cm.n, tot.lang_total,
               round(CAST(cm.n AS DOUBLE) / CAST(tot.lang_total AS DOUBLE), 6) AS frac
        FROM cm JOIN tot USING (lang)
        ORDER BY lang, predicted"""
      },
      "Language-ID confusion matrix: true x predicted counts and per-truth " +
        "recall for q28's stopword argmax — the audit that shows which " +
        "languages alias (the q97/q102/q115 confusion-summary pattern for " +
        "the text classifier); languages²-sized aggregate, map-only scoring.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q162
    Q(
      "q162_bpe_compression",
      (s, dir) => {
        // The metric BPE training optimizes, measured: APPLY the 3 learned
        // merges (q156's chain) to the corpus and report the symbol-count
        // compression curve — corpus symbols after round r, and the ratio
        // vs the character baseline. Each merge collapses two symbols into
        // one, so units fall monotonically; the curve's slope is the
        // marginal value of the next merge — the stopping signal a real
        // tokenizer-training job watches. All counts are exact integers
        // over the distinct-word table (wcnt-weighted), one aggregate
        // wide, rows unpivoted engine-identically.
        val (_, _, _, wc4) = bpeChain(s, dir)
        wc4
          .agg(
            sum(expr("wcnt * length(w)")).as("u0"),
            sum(expr("wcnt * length(w2)")).as("u1"),
            sum(expr("wcnt * length(w3)")).as("u2"),
            sum(expr("wcnt * length(w4)")).as("u3"))
          .selectExpr(
            "stack(4, 0, u0, 1, u1, 2, u2, 3, u3) as (round, units)",
            "u0")
          .selectExpr("round", "units",
            "round(cast(units as double) / cast(u0 as double), 6) as ratio")
          .orderBy("round")
      },
      Some(s"""
        WITH $duckBpeCtes,
        wc4 AS (
          SELECT w, wcnt, w2, w3,
                 replace(w3, (SELECT p3 FROM m3), chr(3)) AS w4 FROM wc3),
        u AS (
          SELECT CAST(SUM(wcnt * length(w)) AS BIGINT) AS u0,
                 CAST(SUM(wcnt * length(w2)) AS BIGINT) AS u1,
                 CAST(SUM(wcnt * length(w3)) AS BIGINT) AS u2,
                 CAST(SUM(wcnt * length(w4)) AS BIGINT) AS u3
          FROM wc4)
        SELECT round, units,
               round(CAST(units AS DOUBLE) / CAST(u0 AS DOUBLE), 6) AS ratio
        FROM (
          SELECT 0 AS round, u0 AS units, u0 FROM u
          UNION ALL SELECT 1, u1, u0 FROM u
          UNION ALL SELECT 2, u2, u0 FROM u
          UNION ALL SELECT 3, u3, u0 FROM u)
        ORDER BY round"""),
      "BPE compression curve: the 3 learned merges applied back to the " +
        "corpus (wcnt-weighted distinct-word table), symbol counts per " +
        "round and ratio vs the character baseline — the marginal-value-of-" +
        "the-next-merge signal a tokenizer-training job stops on.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q167
    Q(
      "q167_hll_overlap",
      (s, dir) => {
        // Cross-source overlap ESTIMATION via mergeable HLL sketches — the
        // sketch answer to q121's exact provenance matrix: at 100 TB the
        // "how much does source A share with source B" question must come
        // from per-source sketches (one corpus scan, 20 tiny states), not
        // from a content-keyed self-join per pair. Each source keeps one
        // HLL over md5(text) content keys; every pairwise intersection
        // derives by inclusion-exclusion over sketch UNIONS (the only
        // set op HLL supports natively) — the whole pair matrix is then
        // computed on a sources-sized frame with zero further corpus
        // reads. Oracle: the q36/q81 contract pattern — exact anchors
        // (re-derivable set arithmetic) plus a literal-TRUE tolerance
        // boolean; the estimate's VALUE is engine-specific, its error
        // bound is not. Tolerance scales with the UNION size because
        // inclusion-exclusion error is relative to the union cardinality,
        // not the (possibly tiny) intersection.
        val d = table(s, dir, "documents").selectExpr("source", "md5(text) as ck")
        val sk = d.groupBy("source").agg(
          expr("hll_sketch_agg(ck)").as("sk"),
          countDistinct(col("ck")).as("nd"))
        val a = sk.select(col("source").as("src_a"), col("sk").as("sk_a"),
          col("nd").as("nd_a"))
        val b = sk.select(col("source").as("src_b"), col("sk").as("sk_b"),
          col("nd").as("nd_b"))
        val est = a.join(b, col("src_a") < col("src_b"))
          .withColumn("est_inter",
            expr("""hll_sketch_estimate(sk_a) + hll_sketch_estimate(sk_b)
                    - hll_sketch_estimate(hll_union(sk_a, sk_b))"""))
        val dd = d.distinct()
        val ex = dd.select(col("source").as("src_a"), col("ck"))
          .join(dd.select(col("source").as("src_b"), col("ck")), Seq("ck"))
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("exact_inter"))
        est.join(ex, Seq("src_a", "src_b"), "left")
          .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
          .withColumn("exact_union", col("nd_a") + col("nd_b") - col("exact_inter"))
          .select(
            col("src_a"), col("src_b"), col("nd_a"), col("nd_b"), col("exact_inter"),
            (abs(col("est_inter") - col("exact_inter"))
              <= greatest(lit(16L), (col("exact_union") * 0.10).cast("long")))
              .as("sketch_within_tol"))
          .orderBy("src_a", "src_b")
      },
      Some("""
        WITH d AS (SELECT DISTINCT source, md5(text) AS ck FROM documents),
        nd AS (SELECT source, COUNT(1) AS nd FROM d GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(1) AS exact_inter
          FROM d a JOIN d b ON a.ck = b.ck AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT na.source AS src_a, nb.source AS src_b,
               na.nd AS nd_a, nb.nd AS nd_b,
               CAST(COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_inter,
               TRUE AS sketch_within_tol
        FROM nd na JOIN nd nb ON na.source < nb.source
        LEFT JOIN inter i ON i.src_a = na.source AND i.src_b = nb.source
        ORDER BY src_a, src_b"""),
      "Cross-source overlap estimation from per-source HLL sketches: one " +
        "corpus scan builds 20 mergeable states, every pairwise intersection " +
        "derives by inclusion-exclusion over sketch unions on the tiny sketch " +
        "frame — the sketch path that replaces q121's exact content self-join " +
        "at 100 TB; contract-checked against the exact set arithmetic."),

    // ---------------------------------------------------------------- q168
    Q(
      "q168_token_fertility",
      (s, dir) => {
        // Tokenizer fertility by language: subword tokens per whitespace
        // word and chars per subword, per lang — THE number a tokenizer
        // owner watches per language (high fertility = the vocab underfits
        // that language, its documents cost more context budget per word).
        // Uses the same BPE-ish codegen'd counter as q106's budgets, so
        // the fertility reported here is consistent with what the packing
        // queries actually budget. Scale: map-only per-doc counters, one
        // languages-sized aggregate — nothing else.
        table(s, dir, "documents")
          .select(
            col("lang"),
            size(expr("tokenize_text(text)")).cast("long").as("ws"),
            graft.operators.TextSignals.bpeishTokenCount(col("text")).as("bpe"),
            length(col("text")).cast("long").as("ch"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("ws").as("t_words"),
            sum("bpe").as("t_subtoks"),
            sum("ch").as("t_chars"))
          .selectExpr(
            "lang", "n_docs", "t_words", "t_subtoks", "t_chars",
            "round(cast(t_subtoks as double) / cast(t_words as double), 6) as fertility",
            "round(cast(t_chars as double) / cast(t_subtoks as double), 6) as chars_per_subtok")
          .orderBy("lang")
      },
      Some(s"""
        WITH d AS (
          SELECT lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
                 CAST(len(regexp_extract_all(text,
                   '${graft.operators.TextSignals.BpeishPattern}')) AS BIGINT) AS bpe,
                 CAST(length(text) AS BIGINT) AS ch
          FROM documents)
        SELECT lang, COUNT(1) AS n_docs,
               CAST(SUM(ws) AS BIGINT) AS t_words,
               CAST(SUM(bpe) AS BIGINT) AS t_subtoks,
               CAST(SUM(ch) AS BIGINT) AS t_chars,
               round(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 6) AS fertility,
               round(CAST(SUM(ch) AS DOUBLE) / CAST(SUM(bpe) AS DOUBLE), 6) AS chars_per_subtok
        FROM d GROUP BY lang ORDER BY lang"""),
      "Tokenizer fertility by language: BPE-ish subword count per whitespace " +
        "word and chars per subword — the per-language vocab-fit signal, " +
        "consistent with the q106 budget counter; map-only + one tiny aggregate."),

    // ---------------------------------------------------------------- q169
    Q(
      "q169_curriculum_stages",
      (s, dir) => {
        // Curriculum staging: order the corpus by a difficulty signal
        // (type-token ratio — repetitive docs are "easy", rare-token soup
        // is "hard") and cut it into 4 equal global stages, easy-first —
        // the data-ordering step of curriculum training. The global order
        // runs through GlobalRank's two-phase shape (sketch buckets +
        // local ranks + offset reconstruction), NEVER a single-task
        // Window.orderBy: no task sorts more than ~rows/32 even at 100 TB.
        // The stage cut `1 + (rn-1)*4 div n` is exact integer arithmetic,
        // identical under DuckDB's floor division.
        val d = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("dl", size(col("toks")).cast("long"))
          .withColumn("ttr", expr(
            "round(cast(size(array_distinct(toks)) as double) / cast(dl as double), 9)"))
          .select(col("doc_id"), col("dl"), col("ttr"), lit(1).as("seg"))
        // r12: lazy bounds (the q99 pattern) — measured 3.00 -> 1.27 s
        graft.operators.GlobalRank
          .withGlobalRank(d, "seg", "ttr", "doc_id",
            precomputedBounds = Some(
              graft.operators.GlobalRank.boundsOf(d, "seg", "ttr")))
          .withColumn("stage", expr("cast(1 + (rn - 1) * 4 div n_seg as int)"))
          .groupBy("stage")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("dl").as("n_toks"),
            min("ttr").as("min_ttr"),
            max("ttr").as("max_ttr"))
          .orderBy("stage")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                 round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / CAST(len(string_split(text, ' ')) AS DOUBLE), 9) AS ttr
          FROM documents),
        r AS (
          SELECT doc_id, dl, ttr,
                 ROW_NUMBER() OVER (ORDER BY ttr, doc_id) AS rn,
                 COUNT(1) OVER () AS n
          FROM d)
        SELECT CAST(1 + (rn - 1) * 4 // n AS INTEGER) AS stage,
               COUNT(1) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS n_toks,
               MIN(ttr) AS min_ttr, MAX(ttr) AS max_ttr
        FROM r GROUP BY 1 ORDER BY stage"""),
      "Curriculum staging: global difficulty order (type-token ratio, " +
        "easy-first) via GlobalRank's two-phase rank — no single-task global " +
        "sort — cut into 4 equal stages by exact integer arithmetic; the " +
        "data-ordering step of curriculum training."),

    // ---------------------------------------------------------------- q170
    Q(
      "q170_dup_kcore",
      (s, dir) => {
        // 2-core of the verified near-dup graph by iterative peeling: drop
        // degree-<2 nodes, re-derive degrees, repeat (3 unrolled rounds —
        // enough to converge on real dup graphs, and both engines run the
        // IDENTICAL fixed computation regardless). The 2-core separates
        // true duplication CLUSTERS from incidental pairwise matches —
        // pendant edges (one-off near-matches) peel away, dense template
        // families survive; it's the graph-shape complement of q151's
        // triangle census and q122's centrality over the same verified-
        // pairs front. Scale: the DupGraph operator checkpoints the
        // verified front once (every round's degree pass and semi-join
        // probes re-read it; without that the LSH-candidate +
        // Jaccard-verify pipeline re-executes O(rounds²) times — measured
        // 14 s -> 2.2 s at sf0.1), then each round is one degree
        // aggregate + two semi-joins, all edge-keyed shuffles; nothing
        // driver-side.
        graft.operators.DupGraph
          .kcore(verifiedNearDupPairs(s, dir).select("id_a", "id_b"),
            minDeg = 2, rounds = 3)
          .select(col("v").as("doc_id"), col("deg"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $duckVerifiedPairs,
        e0 AS (SELECT id_a, id_b FROM ver),
        d0 AS (SELECT v, COUNT(1) AS deg FROM (
          SELECT id_a AS v FROM e0 UNION ALL SELECT id_b FROM e0) GROUP BY v),
        a0 AS (SELECT v FROM d0 WHERE deg >= 2),
        e1 AS (SELECT id_a, id_b FROM e0
               WHERE id_a IN (SELECT v FROM a0) AND id_b IN (SELECT v FROM a0)),
        d1 AS (SELECT v, COUNT(1) AS deg FROM (
          SELECT id_a AS v FROM e1 UNION ALL SELECT id_b FROM e1) GROUP BY v),
        a1 AS (SELECT v FROM d1 WHERE deg >= 2),
        e2 AS (SELECT id_a, id_b FROM e1
               WHERE id_a IN (SELECT v FROM a1) AND id_b IN (SELECT v FROM a1)),
        d2 AS (SELECT v, COUNT(1) AS deg FROM (
          SELECT id_a AS v FROM e2 UNION ALL SELECT id_b FROM e2) GROUP BY v),
        a2 AS (SELECT v FROM d2 WHERE deg >= 2),
        e3 AS (SELECT id_a, id_b FROM e2
               WHERE id_a IN (SELECT v FROM a2) AND id_b IN (SELECT v FROM a2)),
        d3 AS (SELECT v, COUNT(1) AS deg FROM (
          SELECT id_a AS v FROM e3 UNION ALL SELECT id_b FROM e3) GROUP BY v)
        SELECT v AS doc_id, CAST(deg AS BIGINT) AS deg
        FROM d3 ORDER BY doc_id"""),
      "2-core of the verified near-dup graph via 3 rounds of degree peeling " +
        "— pendant matches peel away, dense template families survive; " +
        "edge-keyed degree aggregates + semi-joins per round, the graph-shape " +
        "complement of the triangle census and dup centrality."),

    // ---------------------------------------------------------------- q171
    Q(
      "q171_join_skew_audit",
      (s, dir) => {
        // Pre-flight join-key skew audit — the measurement that DECIDES
        // whether a key needs the q46 salting treatment before a 100 TB
        // shuffle is launched: per-key row counts (one map-side-combinable
        // aggregate), their max and p99, and the hash-bucket imbalance the
        // key would actually produce at 32 shuffle partitions (bucketed by
        // the library's cross-engine md5 hash, so the oracle re-derives
        // the same buckets). imbalance = max bucket / ideal bucket: 1.0 is
        // perfectly uniform, >> 1 says the biggest task dominates the
        // stage wall-clock and salting/AQE-skew-split is warranted. All
        // downstream frames are keys- or buckets-sized.
        val counts = table(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        val buckets = counts
          .withColumn("bucket", expr(s"${md5long("cast(user_id as string)")} % 32"))
          .groupBy("bucket").agg(sum("cnt").as("rows"))
        val keyStats = counts.agg(
          sum("cnt").as("n_rows"),
          count(lit(1)).as("n_keys"),
          max("cnt").as("max_key_rows"),
          expr("round(percentile(cnt, 0.99), 4)").as("p99_key_rows"))
        val bucketStats = buckets.agg(max("rows").as("max_bucket_rows"))
        keyStats.crossJoin(broadcast(bucketStats))
          .selectExpr(
            "n_rows", "n_keys", "max_key_rows", "p99_key_rows", "max_bucket_rows",
            "round(cast(max_bucket_rows as double) / (cast(n_rows as double) / 32.0d), 6) as imbalance")
      },
      Some(s"""
        WITH c AS (
          SELECT user_id, COUNT(1) AS cnt FROM events GROUP BY user_id),
        b AS (
          SELECT ${duckMd5long("CAST(user_id AS VARCHAR)")} % 32 AS bucket,
                 CAST(SUM(cnt) AS BIGINT) AS rows_
          FROM c GROUP BY 1),
        ks AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(1) AS n_keys,
                 MAX(cnt) AS max_key_rows,
                 ROUND(quantile_cont(cnt, 0.99), 4) AS p99_key_rows
          FROM c),
        bs AS (SELECT MAX(rows_) AS max_bucket_rows FROM b)
        SELECT n_rows, n_keys, max_key_rows, p99_key_rows, max_bucket_rows,
               round(CAST(max_bucket_rows AS DOUBLE)
                     / (CAST(n_rows AS DOUBLE) / 32.0), 6) AS imbalance
        FROM ks, bs"""),
      "Join-key skew audit: per-key counts, p99/max, and the exact hash-bucket " +
        "imbalance the key produces at 32 partitions (cross-engine md5 buckets) " +
        "— the pre-flight measurement that decides whether a shuffle needs " +
        "q46's salting before it launches; keys-sized frames only."),

    // ---------------------------------------------------------------- q173
    Q(
      "q173_dup_calibration",
      (s, dir) => {
        // Cross-signal calibration: does the cheap quality signal (q29's
        // stopword density) PREDICT expensive-to-compute duplication?
        // Binned reliability curve — stop_ratio deciles vs the fraction
        // of each bin's docs that are verified near-dup members. If the
        // curve is flat the cheap gate can't pre-filter for the dedup
        // pass; if it slopes, low-stopword docs (tag soup, boilerplate)
        // are where duplication concentrates and the pipeline can run
        // quality BEFORE dedup and shrink the LSH input. Scale: the
        // member set is pair-front-sized and distinct-aggregated; the
        // corpus side is one map pass + a doc_id-keyed left join + a
        // 10-row bin aggregate.
        val dup = verifiedNearDupPairs(s, dir)
        val members = dup.select(col("id_a").as("doc_id"))
          .union(dup.select(col("id_b").as("doc_id")))
          .distinct().withColumn("isdup", lit(1))
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("stop_ratio", expr(
            "cast(size(filter(toks, x -> x in ('the','a','of','and','to'))) as double) / size(toks)"))
          .withColumn("bin", expr("cast(least(9, floor(stop_ratio * 10)) as int)"))
          .select("doc_id", "bin")
          .join(members, Seq("doc_id"), "left")
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("isdup"), lit(0))).as("n_dup"))
          .selectExpr("bin", "n_docs", "cast(n_dup as bigint) as n_dup",
            "round(cast(n_dup as double) / cast(n_docs as double), 6) as dup_rate")
          .orderBy("bin")
      },
      Some(s"""
        WITH $duckVerifiedPairs,
        members AS (
          SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM ver UNION ALL SELECT id_b FROM ver)),
        d AS (
          SELECT doc_id,
                 CAST(least(9, floor(
                   CAST(len(list_filter(string_split(text, ' '),
                     x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
                   / len(string_split(text, ' ')) * 10)) AS INTEGER) AS bin
          FROM documents)
        SELECT d.bin, COUNT(1) AS n_docs,
               CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               round(CAST(SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(1) AS DOUBLE), 6) AS dup_rate
        FROM d LEFT JOIN members m USING (doc_id)
        GROUP BY d.bin ORDER BY d.bin"""),
      "Calibration of the cheap quality gate against expensive dedup truth: " +
        "stopword-density deciles vs verified near-dup membership rate — " +
        "decides whether quality can pre-filter the LSH input; one map pass, " +
        "doc-keyed left join, 10-row aggregate.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q174
    Q(
      "q174_dedup_cascade",
      (s, dir) => {
        // The dedup PORTFOLIO audit: run the three production families in
        // escalating-cost order — exact content hash, MinHash-LSH verified
        // Jaccard, simhash band Hamming — and report what each stage flags
        // and what it flags that NO cheaper stage already caught
        // (first_flag attribution). n_new is the number that justifies
        // each stage's cost: a stage whose n_new is ~0 on a corpus profile
        // can be dropped from that pipeline. Flag convention is uniform:
        // a doc is flagged when it has a LOWER-id twin under that family
        // (keep-lowest canonical election). Scale: each family is its
        // already-audited shape (one hash shuffle; bucketed LSH + verify;
        // banded fingerprint join); attribution is a flags-sized union +
        // one doc_id aggregate; output is 3 rows.
        val docs = table(s, dir, "documents")
        val exact = docs.selectExpr("doc_id", "md5(text) as h")
          .withColumn("canon", min("doc_id").over(Window.partitionBy("h")))
          .filter(col("doc_id") =!= col("canon"))
          .select("doc_id")
        val mh = verifiedNearDupPairs(s, dir)
          .select(col("id_b").as("doc_id")).distinct()
        val sigs = simhashSigs(s, dir)
          .selectExpr("doc_id", "simhash_bits(hs, 48) as sh")
        val banded = sigs.select(col("doc_id"), col("sh"),
          explode(expr(
            """transform(sequence(0, 3), b ->
                 named_struct('band_no', b, 'band_val', shiftright(sh, b * 12) & 4095))"""))
            .as("bv"))
          .select(col("doc_id"), col("sh"),
            col("bv.band_no").as("band_no"), col("bv.band_val").as("band_val"))
        val sh3 = banded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
            col("band_no"), col("band_val"))
          .join(banded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
            col("band_no"), col("band_val")), Seq("band_no", "band_val"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
          .filter(expr("bit_count(sh_a ^ sh_b) <= 3"))
          .select(col("doc_b").as("doc_id")).distinct()
        val flags =
          exact.withColumn("stage", lit("1_exact"))
            .union(mh.withColumn("stage", lit("2_minhash")))
            .union(sh3.withColumn("stage", lit("3_simhash")))
        val perStage = flags.groupBy("stage").agg(count(lit(1)).as("n_flagged"))
        val firstFlag = flags.groupBy("doc_id").agg(min("stage").as("stage"))
          .groupBy("stage").agg(count(lit(1)).as("n_new"))
        // a stage that flags NOTHING must still report its zero — that
        // absence ("this family catches nothing here") is the result
        val stages = s.range(1)
          .selectExpr("explode(array('1_exact','2_minhash','3_simhash')) as stage")
        stages.join(perStage, Seq("stage"), "left")
          .join(firstFlag, Seq("stage"), "left")
          .selectExpr("stage",
            "cast(coalesce(n_flagged, 0) as bigint) as n_flagged",
            "cast(coalesce(n_new, 0) as bigint) as n_new")
          .orderBy("stage")
      },
      Some {
        val hl = s"list_transform(toks, s -> ${duckMd5long("s")})"
        s"""
        WITH $duckVerifiedPairs,
        ex AS (
          SELECT doc_id FROM (
            SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
            FROM documents)
          WHERE doc_id != canon),
        mh AS (SELECT DISTINCT id_b AS doc_id FROM ver),
        sd AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 1),
        sig AS (
          SELECT doc_id,
                 CAST(list_sum(list_transform(range(0, 48), j ->
                   CASE WHEN 2 * len(list_filter($hl, h -> ((h >> j) & 1) = 1)) >= len(toks)
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS sh
          FROM sd),
        bk AS (
          SELECT doc_id, sh, band_no,
                 (sh >> CAST(band_no * 12 AS INTEGER)) & 4095 AS band_val
          FROM sig, (SELECT unnest(range(0, 4)) AS band_no)),
        sp AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.sh AS sh_a, b.sh AS sh_b
          FROM bk a JOIN bk b
            ON a.band_no = b.band_no AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id),
        s3 AS (
          SELECT DISTINCT doc_b AS doc_id FROM sp
          WHERE bit_count(xor(sh_a, sh_b)) <= 3),
        flags AS (
          SELECT '1_exact' AS stage, doc_id FROM ex
          UNION ALL SELECT '2_minhash', doc_id FROM mh
          UNION ALL SELECT '3_simhash', doc_id FROM s3),
        per AS (SELECT stage, COUNT(1) AS n_flagged FROM flags GROUP BY stage),
        ff AS (SELECT doc_id, MIN(stage) AS stage FROM flags GROUP BY doc_id),
        nw AS (SELECT stage, COUNT(1) AS n_new FROM ff GROUP BY stage),
        st AS (SELECT unnest(['1_exact', '2_minhash', '3_simhash']) AS stage)
        SELECT st.stage,
               CAST(COALESCE(per.n_flagged, 0) AS BIGINT) AS n_flagged,
               CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new
        FROM st LEFT JOIN per USING (stage) LEFT JOIN nw USING (stage)
        ORDER BY st.stage"""
      },
      "Dedup portfolio audit: exact hash, MinHash-LSH verified, simhash band " +
        "stages in escalating-cost order with first-flag attribution — n_new " +
        "is each stage's marginal catch beyond all cheaper stages, the number " +
        "that justifies (or retires) its cost on a corpus profile; three " +
        "already-audited family shapes + one flags-sized attribution aggregate."),

    // ---------------------------------------------------------------- q176
    Q(
      "q176_gopher_rules",
      (s, dir) => {
        // Gopher-style quality RULE PANEL: five named per-doc filters in
        // fixed escalating order — word-count bounds, mean-word-length
        // band, minimum stopword evidence, no 3-token repetition run
        // (native max_token_run, one compiled loop), and lexical
        // diversity — each reported as its own boolean plus a pass_all
        // verdict and FIRST_FAIL attribution (which rule would drop the
        // doc, in rule order). This is the rule-level report a filtering
        // pipeline tunes on: per-rule fail counts tell you which
        // thresholds bite, first_fail tells you which rule does the
        // dropping once cheaper rules already fired (q174's attribution
        // discipline applied to quality filters). Scale: map-only — one
        // projection pass, no shuffle but the final presentation sort;
        // thresholds calibrated non-degenerate on the test corpus (every
        // rule both passes and fails real docs).
        table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("avg_token_len",
            graft.operators.TextSignals.avgTokenLen(col("text"), col("n_tokens")))
          .withColumn("n_stop",
            expr("size(filter(toks, x -> x in ('the', 'a', 'of', 'and', 'to')))"))
          // capped at 3: the rule only needs "a 3-run exists"; the cap is
          // what keeps the DuckDB twin a per-position lookback instead of
          // a window chain (q132 carries the uncapped spelling)
          .withColumn("run_cap3",
            expr("cast(least(max_token_run(toks).max_run, 3) as bigint)"))
          .withColumn("diversity",
            expr("cast(size(array_distinct(toks)) as double) / n_tokens"))
          .withColumn("r1_wordcount", col("n_tokens").between(20, 90))
          .withColumn("r2_meanlen", col("avg_token_len").between(4.0, 4.6))
          .withColumn("r3_stopwords", col("n_stop") >= 3)
          .withColumn("r4_norun", col("run_cap3") <= 2)
          .withColumn("r5_diversity", col("diversity") >= 0.35)
          .withColumn("pass_all",
            col("r1_wordcount") && col("r2_meanlen") && col("r3_stopwords")
              && col("r4_norun") && col("r5_diversity"))
          .withColumn("first_fail", expr(
            """case when not r1_wordcount then 'r1_wordcount'
                    when not r2_meanlen then 'r2_meanlen'
                    when not r3_stopwords then 'r3_stopwords'
                    when not r4_norun then 'r4_norun'
                    when not r5_diversity then 'r5_diversity'
                    else 'none' end"""))
          .select("doc_id", "n_tokens", "avg_token_len", "n_stop", "run_cap3",
            "diversity", "r1_wordcount", "r2_meanlen", "r3_stopwords",
            "r4_norun", "r5_diversity", "pass_all", "first_fail")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        sig AS (
          SELECT doc_id,
                 len(toks) AS n_tokens,
                 CAST(LENGTH(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS avg_token_len,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 CAST(list_max(list_prepend(1, list_transform(range(1, len(toks) + 1), i ->
                   CASE WHEN i >= 3
                          AND toks[CAST(i AS INTEGER)] = toks[CAST(i - 1 AS INTEGER)]
                          AND toks[CAST(i - 1 AS INTEGER)] = toks[CAST(i - 2 AS INTEGER)]
                        THEN 3
                        WHEN i >= 2
                          AND toks[CAST(i AS INTEGER)] = toks[CAST(i - 1 AS INTEGER)]
                        THEN 2 ELSE 1 END))) AS BIGINT) AS run_floor,
                 CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity
          FROM d),
        r AS (
          SELECT doc_id, n_tokens, avg_token_len, n_stop,
                 run_floor AS run_cap3, diversity,
                 n_tokens BETWEEN 20 AND 90 AS r1_wordcount,
                 avg_token_len BETWEEN 4.0 AND 4.6 AS r2_meanlen,
                 n_stop >= 3 AS r3_stopwords,
                 run_floor <= 2 AS r4_norun,
                 diversity >= 0.35 AS r5_diversity
          FROM sig)
        SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, avg_token_len,
               CAST(n_stop AS INTEGER) AS n_stop, run_cap3, diversity,
               r1_wordcount, r2_meanlen, r3_stopwords, r4_norun, r5_diversity,
               r1_wordcount AND r2_meanlen AND r3_stopwords AND r4_norun
                 AND r5_diversity AS pass_all,
               CASE WHEN NOT r1_wordcount THEN 'r1_wordcount'
                    WHEN NOT r2_meanlen THEN 'r2_meanlen'
                    WHEN NOT r3_stopwords THEN 'r3_stopwords'
                    WHEN NOT r4_norun THEN 'r4_norun'
                    WHEN NOT r5_diversity THEN 'r5_diversity'
                    ELSE 'none' END AS first_fail
        FROM r
        ORDER BY doc_id"""),
      "Gopher-style quality rule panel: five named per-doc filters (count " +
        "bounds, mean-word-length band, stopword evidence, no 3-token run " +
        "via the native max_token_run loop, lexical diversity) with a " +
        "pass_all verdict and first-fail attribution in fixed rule order — " +
        "map-only, the tuning report for a filtering pipeline."),

    // ---------------------------------------------------------------- q177
    Q(
      "q177_cdc_chunks",
      (s, dir) => {
        // Content-defined chunking + chunk-level dedup — the storage-dedup
        // trick applied to corpus text: cut each document where the
        // native cdc_cuts rolling Rabin-Karp window hash (w=8, divisor 64,
        // ~64-byte expected chunks) hits a boundary, so cut points depend
        // only on LOCAL content and re-synchronize after an edit — shared
        // substrings between near-dup docs land in byte-identical chunks
        // that fixed-size blocks would misalign. Each doc reports its
        // chunk census and what fraction of its bytes live in chunks that
        // also appear in ANOTHER doc (md5 chunk identity). Scale: the cut
        // scan is one compiled map-only pass (O(n) rolling, not O(n*w));
        // the chunk-store spread count is one hash shuffle on the chunk
        // md5 (the CDC dedup shuffle), the rollup one doc_id shuffle.
        // Pure content-defined cuts (no min/max clamp): every boundary is
        // position-independent, which is also what keeps the per-position
        // recompute oracle-able.
        // spread the single-split scan: the rolling-hash cut pass + chunk
        // explode is per-row CPU that otherwise runs on one core
        val docs = Tables.spreadSmall(s, dir, "documents",
          table(s, dir, "documents"))
        val ch = docs
          .withColumn("n", length(col("text")))
          .withColumn("cuts", expr("cdc_cuts(text, 8, 64)"))
          .withColumn("starts", expr("concat(array(1), transform(cuts, x -> x + 1))"))
          .withColumn("ends", expr("concat(cuts, array(n))"))
          .withColumn("chunks", expr(
            """filter(transform(sequence(1, size(starts)), k ->
                 substring(text, element_at(starts, k),
                   element_at(ends, k) - element_at(starts, k) + 1)),
               c -> length(c) > 0)"""))
          .select(col("doc_id"), explode(col("chunks")).as("ctext"))
          .withColumn("clen", length(col("ctext")))
          .withColumn("h", md5(col("ctext")))
        val spread = ch.groupBy("h")
          .agg(countDistinct("doc_id").as("nd"))
        ch.join(spread, Seq("h"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum("clen").as("chunk_bytes"),
            sum(when(col("nd") >= 2, 1).otherwise(0)).as("n_shared_chunks"),
            sum(when(col("nd") >= 2, col("clen")).otherwise(0)).as("shared_bytes"))
          .withColumn("mean_chunk_len",
            col("chunk_bytes").cast("double") / col("n_chunks"))
          .withColumn("shared_frac",
            col("shared_bytes").cast("double") / col("chunk_bytes"))
          .select("doc_id", "n_chunks", "chunk_bytes", "mean_chunk_len",
            "n_shared_chunks", "shared_bytes", "shared_frac")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text, LENGTH(text) AS n FROM documents),
        c AS (
          SELECT doc_id, text, n,
                 list_filter(range(8, n + 1), i ->
                   (list_sum(list_transform(range(0, 8), j ->
                      unicode(substr(text, CAST(i - j AS INTEGER), 1))
                      * list_value(1, 31, 961, 29791, 923521, 28629151,
                                   887503681, 27512614111)[CAST(j + 1 AS INTEGER)]))
                    % 64) = 0) AS cuts
          FROM d),
        sp AS (
          SELECT doc_id, text, n,
                 list_prepend(1, list_transform(cuts, x -> x + 1)) AS starts,
                 list_append(cuts, CAST(n AS BIGINT)) AS ends
          FROM c),
        ch AS (
          SELECT doc_id, unnest(list_filter(
                   list_transform(range(1, len(starts) + 1), k ->
                     substr(text, CAST(starts[CAST(k AS INTEGER)] AS INTEGER),
                            CAST(ends[CAST(k AS INTEGER)]
                                 - starts[CAST(k AS INTEGER)] + 1 AS INTEGER))),
                   s -> LENGTH(s) > 0)) AS ctext
          FROM sp),
        hh AS (
          SELECT doc_id, LENGTH(ctext) AS clen, md5(ctext) AS h FROM ch),
        spread AS (
          SELECT h, COUNT(DISTINCT doc_id) AS nd FROM hh GROUP BY h)
        SELECT doc_id,
               COUNT(1) AS n_chunks,
               CAST(SUM(clen) AS BIGINT) AS chunk_bytes,
               CAST(SUM(clen) AS DOUBLE) / COUNT(1) AS mean_chunk_len,
               CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
               CAST(SUM(CASE WHEN nd >= 2 THEN clen ELSE 0 END) AS BIGINT) AS shared_bytes,
               CAST(SUM(CASE WHEN nd >= 2 THEN clen ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(clen) AS BIGINT) AS shared_frac
        FROM hh JOIN spread USING (h)
        GROUP BY doc_id
        ORDER BY doc_id"""),
      "Content-defined chunking (native rolling Rabin-Karp cut scan, ~64-byte " +
        "chunks) + chunk-level dedup: per-doc chunk census and the byte " +
        "fraction living in chunks shared with other docs — boundaries " +
        "re-synchronize across edits so near-dup docs share byte-identical " +
        "chunks; one compiled map pass + one chunk-md5 shuffle."),

    // ---------------------------------------------------------------- q181
    Q(
      "q181_pack_efficiency",
      (s, dir) => {
        // Packing-efficiency AUDIT across token models x context lengths —
        // the decision table for "is cross-doc sequence packing worth its
        // shuffle on this corpus": for each model (whitespace, byte,
        // BPE-ish subword) and context length (512/1024/2048), compare the
        // PADDED baseline (each doc alone, ceil(tok/L) contexts — what a
        // naive pipeline pads) against DENSE stream packing (q73's scheme,
        // ceil(total/L) contexts) in exact integers. packing_gain is the
        // context count the packer saves; padded_eff near 1.0 at small L
        // says padding is cheap there, the gap at large L is the packer's
        // case. Scale: one map pass explodes 9 (model, L) combinations
        // per doc, one 9-group aggregate — no joins, no windows.
        val lens = "array(512, 1024, 2048)"
        table(s, dir, "documents")
          .selectExpr("doc_id",
            "cast(size(tokenize_text(text)) as bigint) as ws",
            "cast(length(text) as bigint) as byte",
            s"cast(regexp_count(text, '${graft.operators.TextSignals.BpeishPattern}') as bigint) as bpeish")
          .selectExpr("doc_id",
            "explode(array(struct('1_ws' as model, ws as tok)," +
              " struct('2_byte' as model, byte as tok)," +
              " struct('3_bpeish' as model, bpeish as tok))) as mt")
          .selectExpr("doc_id", "mt.model as model", "mt.tok as tok")
          .selectExpr("doc_id", "model", "tok",
            s"explode($lens) as ctx_len")
          .groupBy(col("model"), col("ctx_len"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum("tok").as("total_tokens"),
            sum(when(col("tok") > col("ctx_len"), 1).otherwise(0)).as("n_over"),
            sum(expr("(tok + ctx_len - 1) div ctx_len")).as("padded_ctxs"))
          .withColumn("packed_ctxs",
            expr("(total_tokens + ctx_len - 1) div ctx_len"))
          .withColumn("padded_eff",
            col("total_tokens").cast("double")
              / (col("padded_ctxs") * col("ctx_len")).cast("double"))
          .withColumn("packed_eff",
            col("total_tokens").cast("double")
              / (col("packed_ctxs") * col("ctx_len")).cast("double"))
          .withColumn("packing_gain", col("padded_ctxs") - col("packed_ctxs"))
          .select("model", "ctx_len", "n_docs", "total_tokens", "n_over",
            "padded_ctxs", "packed_ctxs", "padded_eff", "packed_eff",
            "packing_gain")
          .orderBy("model", "ctx_len")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
                 CAST(LENGTH(text) AS BIGINT) AS byte,
                 CAST(len(regexp_extract_all(text,
                   '${graft.operators.TextSignals.BpeishPattern}')) AS BIGINT) AS bpeish
          FROM documents),
        m AS (
          SELECT doc_id, mt.model, mt.tok
          FROM d, unnest([
            {'model': '1_ws', 'tok': ws},
            {'model': '2_byte', 'tok': byte},
            {'model': '3_bpeish', 'tok': bpeish}]) AS t(mt)),
        x AS (
          SELECT doc_id, model, tok, ctx_len
          FROM m, (SELECT unnest([512, 1024, 2048]) AS ctx_len)),
        g AS (
          SELECT model, ctx_len,
                 COUNT(1) AS n_docs,
                 CAST(SUM(tok) AS BIGINT) AS total_tokens,
                 CAST(SUM(CASE WHEN tok > ctx_len THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
                 CAST(SUM((tok + ctx_len - 1) // ctx_len) AS BIGINT) AS padded_ctxs
          FROM x GROUP BY model, ctx_len)
        SELECT model, CAST(ctx_len AS INTEGER) AS ctx_len, n_docs, total_tokens,
               n_over, padded_ctxs,
               CAST((total_tokens + ctx_len - 1) // ctx_len AS BIGINT) AS packed_ctxs,
               CAST(total_tokens AS DOUBLE)
                 / CAST(padded_ctxs * ctx_len AS DOUBLE) AS padded_eff,
               CAST(total_tokens AS DOUBLE)
                 / CAST(((total_tokens + ctx_len - 1) // ctx_len) * ctx_len AS DOUBLE)
                 AS packed_eff,
               CAST(padded_ctxs - (total_tokens + ctx_len - 1) // ctx_len AS BIGINT)
                 AS packing_gain
        FROM g
        ORDER BY model, ctx_len"""),
      "Packing-efficiency audit: padded per-doc contexts vs dense stream " +
        "packing across three token models and three context lengths, in " +
        "exact integers — the 9-row decision table for whether sequence " +
        "packing's shuffle pays for itself; one map pass + one tiny " +
        "aggregate."),

    // ---------------------------------------------------------------- q182
    Q(
      "q182_nb_langid",
      (s, dir) => {
        // Distributed multinomial Naive Bayes language classifier — the
        // fastText-style "train a cheap supervised model on a labeled
        // split, score the corpus" pipeline stage, end to end in one plan:
        // TRAIN on a deterministic 70% salted-hash split (per-(lang,token)
        // Laplace-smoothed counts = one shuffle; priors + vocab size =
        // tiny frames), then SCORE the held-out 30% and emit the lang
        // confusion matrix. Scale: the model is (lang x token)-keyed and
        // equi-joined on (cls, tok) — never broadcast (vocab can be
        // millions of rows at 100 TB); the 5-row class frame IS broadcast.
        // Cross-engine: each token's log-likelihood is round(ln(..), 6),
        // tf-scaled products round(.., 12)-decimal-summed (exact, order-
        // independent), argmax over exact decimals with lang tie-break.
        val splitHash = md5long("concat('nb|', cast(doc_id as string))")
        val docs = table(s, dir, "documents")
          .withColumn("is_train", expr(s"$splitHash % 10 < 7"))
        val trainToks = docs.filter(col("is_train"))
          .select(col("lang"), explode(expr("tokenize_text(text)")).as("tok"))
        val counts = trainToks.groupBy("lang", "tok")
          .agg(count(lit(1)).as("cnt"))
        val nTok = trainToks.groupBy("lang").agg(count(lit(1)).as("n_tok"))
        val vocab = counts.select("tok").distinct()
          .agg(count(lit(1)).as("v"))
        val priors = docs.filter(col("is_train")).groupBy("lang")
          .agg(count(lit(1)).as("docs_c"))
        val tot = docs.filter(col("is_train"))
          .agg(count(lit(1)).as("docs_tot"))
        val cls = priors.join(nTok, "lang")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(vocab))
          .selectExpr("lang as cls", "n_tok", "v",
            "round(ln(cast(docs_c as double) / cast(docs_tot as double)), 6) as prior")
        val testToks = docs.filter(!col("is_train"))
          .select(col("doc_id"), col("lang").as("actual"),
            explode(expr("tokenize_text(text)")).as("tok"))
          .groupBy("doc_id", "actual", "tok").agg(count(lit(1)).as("tf"))
        val scored = testToks
          .crossJoin(broadcast(cls))
          .join(counts.withColumnRenamed("lang", "cls"),
            Seq("cls", "tok"), "left")
          .withColumn("contrib", expr(
            """cast(tf as double)
               * round(ln(cast(coalesce(cnt, 0) + 1 as double)
                          / cast(n_tok + v as double)), 6)"""))
          .groupBy("doc_id", "actual", "cls", "prior")
          .agg(sum(expr("cast(round(contrib, 12) as decimal(28,12))")).as("ssum"))
          .withColumn("total",
            expr("cast(prior as decimal(28,12)) + ssum"))
        val picked = scored
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(col("total").desc, col("cls").asc)))
          .filter(col("rn") === 1)
        picked.groupBy(col("actual"), col("cls").as("pred"))
          .agg(count(lit(1)).as("n_docs"),
            expr("round(cast(sum(total) as double), 6)").as("sum_score"))
          .orderBy("actual", "pred")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, lang, text,
                 (""" + duckMd5long("'nb|' || cast(doc_id as varchar)") + """ % 10 < 7) AS is_train
          FROM documents),
        tt AS (
          SELECT lang, unnest(string_split(text, ' ')) AS tok
          FROM d WHERE is_train),
        counts AS (SELECT lang, tok, COUNT(1) AS cnt FROM tt GROUP BY 1, 2),
        ntok AS (SELECT lang, COUNT(1) AS n_tok FROM tt GROUP BY 1),
        voc AS (SELECT COUNT(DISTINCT tok) AS v FROM tt),
        pri AS (SELECT lang, COUNT(1) AS docs_c FROM d WHERE is_train GROUP BY 1),
        tot AS (SELECT COUNT(1) AS docs_tot FROM d WHERE is_train),
        cls AS (
          SELECT p.lang AS cls, n.n_tok, voc.v,
                 round(ln(CAST(docs_c AS DOUBLE) / CAST(docs_tot AS DOUBLE)), 6) AS prior
          FROM pri p JOIN ntok n ON p.lang = n.lang, tot, voc),
        te AS (
          SELECT doc_id, actual, tok, COUNT(1) AS tf
          FROM (SELECT doc_id, lang AS actual,
                       unnest(string_split(text, ' ')) AS tok
                FROM d WHERE NOT is_train)
          GROUP BY 1, 2, 3),
        sc AS (
          SELECT te.doc_id, te.actual, c.cls, c.prior,
                 SUM(CAST(ROUND(
                   CAST(te.tf AS DOUBLE)
                   * ROUND(ln(CAST(COALESCE(k.cnt, 0) + 1 AS DOUBLE)
                              / CAST(c.n_tok + c.v AS DOUBLE)), 6), 12)
                   AS DECIMAL(28,12))) AS ssum
          FROM te CROSS JOIN cls c
          LEFT JOIN counts k ON k.lang = c.cls AND k.tok = te.tok
          GROUP BY 1, 2, 3, 4),
        ranked AS (
          SELECT doc_id, actual, cls,
                 CAST(prior AS DECIMAL(28,12)) + ssum AS total,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY (CAST(prior AS DECIMAL(28,12)) + ssum) DESC, cls) AS rn
          FROM sc)
        SELECT actual, cls AS pred, COUNT(1) AS n_docs,
               ROUND(CAST(SUM(total) AS DOUBLE), 6) AS sum_score
        FROM ranked WHERE rn = 1
        GROUP BY 1, 2
        ORDER BY 1, 2"""),
      "Multinomial Naive Bayes language classifier trained on a " +
        "deterministic 70% split and scored on the held-out 30%: " +
        "(lang x token) Laplace model equi-joined on (cls, tok) — never " +
        "broadcast — with round-then-decimal-sum log-likelihoods and an " +
        "exact-decimal argmax; emits the lang confusion matrix."),

    // ---------------------------------------------------------------- q183
    Q(
      "q183_temperature_mix",
      (s, dir) => {
        // Temperature-scaled source mixture — the multilingual-training
        // alpha-sampling table (share_s ∝ p_s^alpha): at alpha=1 sampling
        // follows the natural token distribution, lower alpha flattens it
        // toward uniform, upweighting tail sources. Alphas are chosen so
        // p^alpha is an EXACT IEEE expression in both engines (1 → p,
        // 0.5 → sqrt(p), 0.25 → sqrt(sqrt(p)) — sqrt is correctly rounded
        // by spec; pow() is not and would drift cross-engine). Per-alpha
        // normalizers are round-then-decimal sums (exact, order-
        // independent). Scale: one token-count shuffle over the corpus;
        // everything after runs on a sources-row frame.
        val perSrc = table(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(expr("tokenize_text(text)")).cast("long").as("ntok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_toks"))
        val tot = perSrc.agg(sum("n_toks").as("tok_tot"))
        val withP = perSrc.crossJoin(broadcast(tot))
          .withColumn("p",
            expr("cast(n_toks as double) / cast(tok_tot as double)"))
          .selectExpr("source", "n_docs", "n_toks", "p",
            """explode(array(
                 struct('1.00' as alpha, p as w),
                 struct('0.50' as alpha, sqrt(p) as w),
                 struct('0.25' as alpha, sqrt(sqrt(p)) as w))) as aw""")
          .selectExpr("source", "n_docs", "n_toks", "p",
            "aw.alpha as alpha",
            "cast(cast(round(aw.w, 12) as decimal(28,12)) as double) as w")
        val z = withP.groupBy("alpha")
          .agg(expr("cast(sum(cast(round(w, 12) as decimal(28,12))) as double)").as("z"))
        withP.join(broadcast(z), "alpha")
          .withColumn("share", expr("w / z"))
          .withColumn("upsample", expr("(w / z) / p"))
          .select("alpha", "source", "n_docs", "n_toks", "p", "share",
            "upsample")
          .orderBy("alpha", "source")
      },
      Some("""
        WITH per_src AS (
          SELECT source, COUNT(1) AS n_docs,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
          FROM documents GROUP BY source),
        tot AS (SELECT SUM(n_toks) AS tok_tot FROM per_src),
        withp AS (
          SELECT source, n_docs, n_toks,
                 CAST(n_toks AS DOUBLE) / CAST(tok_tot AS DOUBLE) AS p
          FROM per_src, tot),
        aw AS (
          SELECT source, n_docs, n_toks, p, a.alpha,
                 CAST(CAST(ROUND(a.w, 12) AS DECIMAL(28,12)) AS DOUBLE) AS w
          FROM withp, LATERAL (SELECT unnest([
                 {'alpha': '1.00', 'w': p},
                 {'alpha': '0.50', 'w': sqrt(p)},
                 {'alpha': '0.25', 'w': sqrt(sqrt(p))}],
               recursive := true)) AS a(alpha, w)),
        z AS (
          SELECT alpha,
                 CAST(SUM(CAST(ROUND(w, 12) AS DECIMAL(28,12))) AS DOUBLE) AS z
          FROM aw GROUP BY alpha)
        SELECT aw.alpha, aw.source, aw.n_docs, aw.n_toks, aw.p,
               aw.w / z.z AS share,
               (aw.w / z.z) / aw.p AS upsample
        FROM aw JOIN z ON aw.alpha = z.alpha
        ORDER BY aw.alpha, aw.source"""),
      "Temperature-scaled mixture table (alpha in {1, 0.5, 0.25} via " +
        "exact IEEE sqrt chains): per-source token shares, normalized " +
        "sampling shares, and upsampling factors — one token-count " +
        "shuffle, then sources-row arithmetic."),

    // ---------------------------------------------------------------- q184
    Q(
      "q184_length_buckets",
      (s, dir) => {
        // Length-bucketed batching audit — the "sort by length, batch
        // within buckets" serving/training trick quantified: rank every
        // document by token count (exact global order via GlobalRank's
        // two-phase shape — no single-task window), cut into 8 equal-count
        // buckets, and compare padding efficiency when each batch pads to
        // its BUCKET max versus the naive pad-to-global-max. bucket_eff
        // near 1.0 in every bucket is the case for length bucketing; the
        // naive_eff column is the cost of not doing it. Scale: ranks are
        // bucketed two-phase (nothing sorts more than ~rows/32); the rest
        // is an 8-group aggregate.
        val d = table(s, dir, "documents")
          .select(col("doc_id"),
            size(expr("tokenize_text(text)")).cast("long").as("ntok"))
          .withColumn("seg", lit(0))
        val ranked = graft.operators.GlobalRank
          .withGlobalRank(d, "seg", "ntok", "doc_id")
          .withColumn("bucket", expr("(rn - 1) * 8 div n_seg"))
        val buckets = ranked.groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            min("ntok").as("min_tok"),
            max("ntok").as("max_tok"),
            sum("ntok").as("total_toks"))
        val gmax = buckets.agg(max("max_tok").as("gmax"))
        buckets.crossJoin(broadcast(gmax))
          .selectExpr("cast(bucket as bigint) as bucket", "n_docs",
            "min_tok", "max_tok", "total_toks",
            "cast(total_toks as double) / cast(n_docs * max_tok as double) as bucket_eff",
            "cast(total_toks as double) / cast(n_docs * gmax as double) as naive_eff")
          .orderBy("bucket")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
          FROM documents),
        ranked AS (
          SELECT doc_id, ntok,
                 ROW_NUMBER() OVER (ORDER BY ntok, doc_id) AS rn,
                 COUNT(1) OVER () AS n_seg
          FROM d),
        b AS (
          SELECT (rn - 1) * 8 // n_seg AS bucket, ntok FROM ranked),
        buckets AS (
          SELECT bucket, COUNT(1) AS n_docs, MIN(ntok) AS min_tok,
                 MAX(ntok) AS max_tok,
                 CAST(SUM(ntok) AS BIGINT) AS total_toks
          FROM b GROUP BY bucket),
        g AS (SELECT MAX(max_tok) AS gmax FROM buckets)
        SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, min_tok, max_tok,
               total_toks,
               CAST(total_toks AS DOUBLE)
                 / CAST(n_docs * max_tok AS DOUBLE) AS bucket_eff,
               CAST(total_toks AS DOUBLE)
                 / CAST(n_docs * gmax AS DOUBLE) AS naive_eff
        FROM buckets, g
        ORDER BY bucket"""),
      "Length-bucketed batching audit: exact global length ranks via " +
        "GlobalRank's two-phase shape cut into 8 equal-count buckets; " +
        "per-bucket pad-to-bucket-max vs pad-to-global-max efficiency — " +
        "the quantified case for length bucketing."),

    Q(
      "q187_ppjoin",
      (s, dir) => {
        // The FOURTH near-dup candidate-generation family: PREFIX
        // FILTERING (PPJoin) — exact set-similarity join, no hashing, no
        // recall loss. Order every doc's shingle set by global df (rarest
        // first); for Jaccard >= 0.5 two sets MUST share a token within
        // their first n - ceil(n/2) + 1 tokens, so the candidate join
        // touches only those prefixes — the df ordering makes prefixes
        // the RAREST shingles, collapsing the join's Sum(df^2) to the
        // rare tail exactly where it is cheapest. Size filter
        // (2*min >= max) prunes length-incompatible pairs inside the
        // join. Candidates then verify by EXACT intersection counts.
        // The oracle computes ground truth with NO prefix filter (the
        // full Sum(df^2) token join): equality proves the prefix
        // theorem's completeness — unlike MinHash/SimHash banding, this
        // family guarantees recall 1.0 by construction.
        val base = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .selectExpr("doc_id", s"array_distinct($sparkShingles) as shs")
        // set size comes free from the array (no count-window pass)
        val dt = base
          .select(col("doc_id"), size(col("shs")).cast("long").as("n"),
            explode(col("shs")).as("sh"))
        val dfreq = dt.groupBy("sh").agg(count(lit(1)).as("df"))
        val ranked = dt.join(dfreq, Seq("sh"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
        val pre = ranked.filter(expr("rn <= n - (n + 1) div 2 + 1"))
          .select("doc_id", "sh", "n", "rn")
        // r12: PPJoin POSITIONAL filter (guide §3.3 / the r11 verdict's
        // item 4). A shared prefix token at ranks (rn_a, rn_b) bounds the
        // overlap: tokens are globally (df, sh)-ordered in every prefix,
        // so at the pair's FIRST shared token nothing before it is shared
        // and o <= min(n_a - rn_a, n_b - rn_b) + 1. Jaccard >= 0.5 needs
        // o >= ceil((n_a + n_b) / 3), and with the size filter the first
        // shared token of a qualifying pair is provably inside both
        // prefixes, so pruning per-match and keeping a pair that passes
        // on ANY shared token loses no true pair (the oracle's
        // unfiltered ground truth proves it — recall stays 1.0).
        // Non-qualifying candidates die here instead of flowing into
        // distinct + two array joins + exact intersection.
        val cand = pre.as("a").join(pre.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
              col("b.n") * 2 >= col("a.n") && col("a.n") * 2 >= col("b.n") &&
              expr("least(a.n - a.rn, b.n - b.rn) + 1 >= (a.n + b.n + 2) div 3"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.n").as("n_a"), col("b.n").as("n_b"))
          .distinct()
        // verify by carrying the two per-doc shingle ARRAYS into the
        // candidate frame (two doc-keyed equi-joins) and intersecting
        // per row — bounded by |candidates|, where the exploded
        // posting-join spelling it replaced paid |candidates| x shingles
        // rows into a re-aggregation (measured 9.7 s -> 7.3 s at sf0.1;
        // the residual cost is this synthetic corpus' candidate DENSITY:
        // a 31-token vocabulary yields ~310k prefix-filtered candidates
        // from 5000 docs — real corpora prune far harder here)
        cand
          .join(base.select(col("doc_id").as("doc_a"), col("shs").as("sh_a")), Seq("doc_a"))
          .join(base.select(col("doc_id").as("doc_b"), col("shs").as("sh_b")), Seq("doc_b"))
          .withColumn("n_inter", expr("cast(size(array_intersect(sh_a, sh_b)) as bigint)"))
          .filter(col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")) >= 0.5)
          .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("n_inter"),
            round(col("n_inter").cast("double") /
              (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        sh AS (
          SELECT doc_id, unnest($duckShingles) AS sh
          FROM t WHERE len(toks) >= 3),
        dt AS (SELECT DISTINCT doc_id, sh FROM sh),
        sz AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM dt a JOIN dt b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, n_inter,
               round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
        FROM inter
        JOIN sz sa ON doc_a = sa.doc_id
        JOIN sz sb ON doc_b = sb.doc_id
        WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
        ORDER BY doc_a, doc_b"""),
      "PPJoin prefix-filtered exact similarity join: df-ordered prefixes " +
        "bound the candidate join to the rarest shingles, size filter in " +
        "the join, exact intersection verify; the oracle's unfiltered " +
        "ground-truth join proves the prefix theorem loses no pair — " +
        "recall 1.0 by construction, unlike the three banding families.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q190
    Q(
      "q190_dup_auc",
      (s, dir) => {
        // Threshold-free successor to q173's binned calibration: the
        // EXACT ROC-AUC of the cheap quality signal (stopword density,
        // integer per-mille) as a predictor of verified near-dup
        // membership — Mann-Whitney U with tie half-credit, computed
        // from per-distinct-score positive/negative counts. Scale: the
        // corpus collapses to a <= 1001-row score frame (per-mille
        // buckets) after one map pass + doc-keyed left join; the
        // cumulative-below term is a broadcast theta self-join on that
        // tiny frame (the q155 no-global-window discipline), and the
        // result is one row of exact integers + one IEEE division.
        val dup = verifiedNearDupPairs(s, dir)
        val members = dup.select(col("id_a").as("doc_id"))
          .union(dup.select(col("id_b").as("doc_id")))
          .distinct().withColumn("isdup", lit(1))
        val sc = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("score", expr(
            "size(filter(toks, x -> x in ('the','a','of','and','to'))) * 1000 div size(toks)"))
          .select("doc_id", "score")
          .join(members, Seq("doc_id"), "left")
          .groupBy("score")
          .agg(sum(coalesce(col("isdup"), lit(0))).as("np"),
            sum(when(col("isdup").isNull, 1).otherwise(0)).as("nn"))
        sc.as("a")
          .join(broadcast(sc.as("b")), col("b.score") < col("a.score"), "left")
          .groupBy(col("a.score").as("score"), col("a.np").as("np"),
            col("a.nn").as("nn"))
          .agg(coalesce(sum("b.nn"), lit(0L)).as("cum_nn"))
          .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
            sum(expr("np * (2 * cum_nn + nn)")).as("u2"))
          .selectExpr("cast(n_pos as bigint) as n_pos",
            "cast(n_neg as bigint) as n_neg", "cast(u2 as bigint) as u2",
            "round(cast(u2 as double) / (2.0d * n_pos * n_neg), 6) as auc")
      },
      Some(s"""
        WITH $duckVerifiedPairs,
        members AS (
          SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM ver UNION ALL SELECT id_b FROM ver)),
        d AS (
          SELECT doc_id,
                 len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','a','of','and','to'))) * 1000
                   // len(string_split(text, ' ')) AS score
          FROM documents),
        sc AS (
          SELECT score,
                 SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS np,
                 SUM(CASE WHEN m.doc_id IS NULL THEN 1 ELSE 0 END) AS nn
          FROM d LEFT JOIN members m USING (doc_id)
          GROUP BY score),
        below AS (
          SELECT a.score, a.np, a.nn, COALESCE(SUM(b.nn), 0) AS cum_nn
          FROM sc a LEFT JOIN sc b ON b.score < a.score
          GROUP BY a.score, a.np, a.nn)
        SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
               CAST(SUM(nn) AS BIGINT) AS n_neg,
               CAST(SUM(np * (2 * cum_nn + nn)) AS BIGINT) AS u2,
               round(CAST(SUM(np * (2 * cum_nn + nn)) AS DOUBLE)
                     / (2.0 * SUM(np) * SUM(nn)), 6) AS auc
        FROM below"""),
      "Exact ROC-AUC (Mann-Whitney with tie half-credit) of the cheap " +
        "stopword-density signal against verified near-dup truth — the " +
        "threshold-free version of q173's calibration; corpus collapses " +
        "to a <= 1001-row per-mille score frame, cumulative term via " +
        "broadcast theta self-join on it, one exact-integer output row."),

    // ---------------------------------------------------------------- q191
    Q(
      "q191_winnowing",
      (s, dir) => {
        // Winnowing (MOSS-style) LOCAL fingerprinting — the 5th near-dup
        // candidate family: instead of banding global signatures, select
        // each window's minimum bigram hash as a positional fingerprint.
        // Guarantee: any shared token run spanning >= w + 1 bigrams
        // yields at least one shared fingerprint (a shared window's min
        // is the same hash), so coverage is LOCAL — it catches shared
        // passages, not just whole-doc similarity, at ~1/w the index
        // size of full shingle posting. Candidates = docs sharing >= 2
        // kept fingerprints; the df > 20 stop-fingerprint broadcast
        // anti-join bounds the posting self-join exactly like q48's
        // stop-shingle discipline.
        val W = 4
        val fp = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 5)
          .withColumn("hs", expr("word_ngram_hash48(toks, 2)"))
          // native O(n) monotonic-deque window minimum (spec-locked equal
          // to the transform/slice/array_min HOF spelling, which evaluates
          // interpreted at O(n*w) — ~13x on this hot path)
          .withColumn("fps", expr(s"array_distinct(window_mins(hs, $W))"))
          .select(col("doc_id"), explode(col("fps")).as("fp"))
        val stop = fp.groupBy("fp").agg(count(lit(1)).as("df"))
          .filter(col("df") > StopShingleDf).select("fp")
        val kept = fp.join(broadcast(stop), Seq("fp"), "left_anti")
        kept.as("a")
          .join(kept.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        h AS (
          SELECT doc_id,
                 list_transform(range(1, len(toks)),
                   i -> ${duckMd5long("toks[i] || ' ' || toks[i + 1]")}) AS hs
          FROM t WHERE len(toks) >= 5),
        f AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(0, len(hs) - 3),
                   i -> list_min(list_slice(hs, i + 1, i + 4)))) AS fps
          FROM h),
        fp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
        stop AS (
          SELECT fp FROM fp GROUP BY fp HAVING COUNT(1) > $StopShingleDf),
        kept AS (
          SELECT doc_id, fp FROM fp
          WHERE fp NOT IN (SELECT fp FROM stop)),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(1) AS n_shared
          FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, n_shared FROM pairs
        WHERE n_shared >= 2
        ORDER BY id_a, id_b"""),
      "Winnowing local fingerprints (window-min of bigram hashes, w=4): " +
        "the passage-level candidate family — any shared run past w+1 " +
        "bigrams must share a fingerprint, at ~1/w the posting size; " +
        "stop-fingerprint anti-join bounds the candidate self-join, " +
        "pairs verified by shared-fingerprint counts.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q192
    Q(
      "q192_stupid_backoff",
      (s, dir) => {
        // Stupid-backoff trigram LM scoring (the web-scale LM-quality
        // recipe: no discount renormalization, just a 0.4 backoff
        // factor): train trigram/bigram/unigram counts on the 70%
        // salted-hash split, score held-out docs per trigram position
        //   S(w3|w1w2) = c123/c12          if the trigram was seen
        //              = 0.4 * c23/c(w2)   else if the bigram was seen
        //              = 0.16 * (c3+0.5)/(N+0.5V)  (smoothed floor)
        // and report per-doc cross-entropy plus how many positions
        // resolved at each backoff level — the sequence-fidelity signal
        // one level past q125's bigram model. Scale: the three count
        // tables are vocab-sized and EQUI-JOINED on their n-gram keys
        // (never broadcast); only the 1-row (N, V) frame broadcasts;
        // per-doc fold in sorted trigram order (the q125 discipline:
        // c123 > 0 implies c12 > 0, c23 > 0 implies c(w2) > 0, so no
        // division is ever null-guarded incorrectly).
        val splitHash = md5long("concat('sb|', cast(doc_id as string))")
        val docs = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("is_train", expr(s"$splitHash % 10 < 7"))
        val trainToks = docs.filter(col("is_train"))
          .select(explode(col("toks")).as("tok"))
        val uni = trainToks.groupBy("tok").agg(count(lit(1)).as("c1"))
        val nv = trainToks.agg(count(lit(1)).as("n"),
          countDistinct("tok").as("v"))
        val bi = docs.filter(col("is_train") && size(col("toks")) >= 2)
          .selectExpr("explode(word_ngrams(toks, 2)) as bg")
          .groupBy("bg").agg(count(lit(1)).as("c2"))
        val tri = docs.filter(col("is_train") && size(col("toks")) >= 3)
          .selectExpr("explode(word_ngrams(toks, 3)) as tg")
          .groupBy("tg").agg(count(lit(1)).as("c3g"))
        docs.filter(!col("is_train") && size(col("toks")) >= 3)
          .selectExpr("doc_id", "explode(word_ngrams(toks, 3)) as tg")
          .groupBy("doc_id", "tg").agg(count(lit(1)).as("tf"))
          .join(tri, Seq("tg"), "left")
          .withColumn("w12", expr("substring_index(tg, ' ', 2)"))
          .withColumn("w23", expr("substring_index(tg, ' ', -2)"))
          .withColumn("w2", expr("substring_index(w23, ' ', 1)"))
          .withColumn("w3", expr("substring_index(tg, ' ', -1)"))
          .join(bi.withColumnRenamed("bg", "w12").withColumnRenamed("c2", "c12"),
            Seq("w12"), "left")
          .join(bi.withColumnRenamed("bg", "w23").withColumnRenamed("c2", "c23"),
            Seq("w23"), "left")
          .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c1", "cw2"),
            Seq("w2"), "left")
          .join(uni.withColumnRenamed("tok", "w3").withColumnRenamed("c1", "cw3"),
            Seq("w3"), "left")
          .crossJoin(broadcast(nv))
          .withColumn("lvl", expr(
            "case when c3g is not null then 3 when c23 is not null then 2 else 1 end"))
          .withColumn("contrib", expr(
            """cast(tf as double) * ln(case
                 when c3g is not null then cast(c3g as double) / cast(c12 as double)
                 when c23 is not null then 0.4d * cast(c23 as double) / cast(cw2 as double)
                 else 0.16d * (cast(coalesce(cw3, 0) as double) + 0.5d)
                      / (cast(n as double) + 0.5d * cast(v as double)) end)"""))
          .groupBy("doc_id")
          .agg(
            expr(
              """aggregate(
                   transform(array_sort(collect_list(struct(tg, contrib))), p -> p.contrib),
                   cast(0 as double), (a, v) -> a + v)""").as("lsum"),
            sum("tf").as("ntg"),
            sum(expr("case when lvl = 3 then tf else 0 end")).as("n_tri"),
            sum(expr("case when lvl = 2 then tf else 0 end")).as("n_bi"),
            sum(expr("case when lvl = 1 then tf else 0 end")).as("n_uni"))
          .selectExpr("doc_id", "cast(ntg as bigint) as ntg",
            "cast(n_tri as bigint) as n_tri", "cast(n_bi as bigint) as n_bi",
            "cast(n_uni as bigint) as n_uni",
            "round(-lsum / cast(ntg as double), 6) as xent3")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 (${duckMd5long("'sb|' || cast(doc_id as varchar)")} % 10 < 7) AS is_train
          FROM documents),
        tt AS (SELECT unnest(toks) AS tok FROM d WHERE is_train),
        uni AS (SELECT tok, COUNT(1) AS c1 FROM tt GROUP BY tok),
        nv AS (SELECT COUNT(1) AS n, COUNT(DISTINCT tok) AS v FROM tt),
        bi AS (
          SELECT bg, COUNT(1) AS c2 FROM (
            SELECT unnest(list_transform(range(1, len(toks)),
              i -> toks[i] || ' ' || toks[i + 1])) AS bg
            FROM d WHERE is_train AND len(toks) >= 2)
          GROUP BY bg),
        tri AS (
          SELECT tg, COUNT(1) AS c3g FROM (
            SELECT unnest(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS tg
            FROM d WHERE is_train AND len(toks) >= 3)
          GROUP BY tg),
        te AS (
          SELECT doc_id, tg, COUNT(1) AS tf FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS tg
            FROM d WHERE NOT is_train AND len(toks) >= 3)
          GROUP BY doc_id, tg),
        sc AS (
          SELECT te.doc_id, te.tg, te.tf,
                 CASE WHEN t.c3g IS NOT NULL THEN 3
                      WHEN b23.c2 IS NOT NULL THEN 2 ELSE 1 END AS lvl,
                 CAST(te.tf AS DOUBLE) * ln(CASE
                   WHEN t.c3g IS NOT NULL
                     THEN CAST(t.c3g AS DOUBLE) / CAST(b12.c2 AS DOUBLE)
                   WHEN b23.c2 IS NOT NULL
                     THEN 0.4 * CAST(b23.c2 AS DOUBLE) / CAST(u2.c1 AS DOUBLE)
                   ELSE 0.16 * (CAST(COALESCE(u3.c1, 0) AS DOUBLE) + 0.5)
                        / (CAST(nv.n AS DOUBLE) + 0.5 * CAST(nv.v AS DOUBLE)) END) AS contrib
          FROM te
          LEFT JOIN tri t USING (tg)
          LEFT JOIN bi b12
            ON b12.bg = string_split(te.tg, ' ')[1] || ' ' || string_split(te.tg, ' ')[2]
          LEFT JOIN bi b23
            ON b23.bg = string_split(te.tg, ' ')[2] || ' ' || string_split(te.tg, ' ')[3]
          LEFT JOIN uni u2 ON u2.tok = string_split(te.tg, ' ')[2]
          LEFT JOIN uni u3 ON u3.tok = string_split(te.tg, ' ')[3], nv),
        agg AS (
          SELECT doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE), list(contrib ORDER BY tg)),
                   (a, v) -> a + v) AS lsum,
                 CAST(SUM(tf) AS BIGINT) AS ntg,
                 CAST(SUM(CASE WHEN lvl = 3 THEN tf ELSE 0 END) AS BIGINT) AS n_tri,
                 CAST(SUM(CASE WHEN lvl = 2 THEN tf ELSE 0 END) AS BIGINT) AS n_bi,
                 CAST(SUM(CASE WHEN lvl = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_uni
          FROM sc GROUP BY doc_id)
        SELECT doc_id, ntg, n_tri, n_bi, n_uni,
               round(-lsum / CAST(ntg AS DOUBLE), 6) AS xent3
        FROM agg ORDER BY doc_id"""),
      "Stupid-backoff trigram LM: train on the 70% salted split, score " +
        "held-out docs with 0.4-factor backoff through trigram/bigram/" +
        "smoothed-unigram levels plus per-level resolution counts — " +
        "n-gram-keyed equi-joins only (models never broadcast), sorted " +
        "per-doc fold; the sequence-fidelity signal past q125.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q193
    Q(
      "q193_bootstrap_ci",
      (s, dir) => {
        // Deterministic bootstrap: how stable is a corpus metric (mean
        // tokens per doc) under resampling? 16 half-sample replicas —
        // doc d joins replica b iff md5('bs|b|d') is even — each replica
        // mean computed exactly (bigint token sums / counts), and the
        // replica spread (min/max/range across the 16 means) is the
        // confidence band, reported beside the full-corpus mean. All
        // replicas run in ONE pass: a 16-way map-side explode feeding a
        // 16-group partial aggregate — no per-replica scans, no data
        // movement beyond one tiny shuffle; the spread summary is a
        // 1-row broadcast back onto the 16-row frame. Deterministic by
        // construction (salted hashes), so the oracle replays it bit-
        // for-bit — the statistical-rigor primitive behind error bars
        // on any corpus dashboard.
        val repHash = md5long("concat('bs|', cast(b as string), '|', cast(doc_id as string))")
        val d = table(s, dir, "documents")
          .select(col("doc_id"), size(expr("tokenize_text(text)")).cast("long").as("ntok"))
        val reps = d
          .withColumn("b", explode(expr("sequence(0, 15)")))
          .filter(expr(s"$repHash % 2 = 0"))
          .groupBy("b")
          .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tok_sum"))
          .withColumn("mean_tok", expr(
            "round(cast(tok_sum as double) / cast(n_docs as double), 6)"))
        val band = reps.agg(
          min("mean_tok").as("boot_lo"), max("mean_tok").as("boot_hi"))
        val full = d.agg(expr(
          "round(cast(sum(ntok) as double) / cast(count(1) as double), 6)").as("full_mean"))
        reps.crossJoin(broadcast(band)).crossJoin(broadcast(full))
          .selectExpr("cast(b as int) as b", "n_docs",
            "cast(tok_sum as bigint) as tok_sum", "mean_tok",
            "boot_lo", "boot_hi",
            "round(boot_hi - boot_lo, 6) as boot_range", "full_mean")
          .orderBy("b")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
          FROM documents),
        reps AS (
          SELECT b, COUNT(1) AS n_docs,
                 CAST(SUM(ntok) AS BIGINT) AS tok_sum,
                 round(CAST(SUM(ntok) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS mean_tok
          FROM (SELECT doc_id, ntok, unnest(range(0, 16)) AS b FROM d)
          WHERE ${duckMd5long("'bs|' || cast(b as varchar) || '|' || cast(doc_id as varchar)")} % 2 = 0
          GROUP BY b),
        band AS (
          SELECT MIN(mean_tok) AS boot_lo, MAX(mean_tok) AS boot_hi FROM reps),
        f AS (
          SELECT round(CAST(SUM(ntok) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS full_mean
          FROM d)
        SELECT CAST(b AS INTEGER) AS b, n_docs, tok_sum, mean_tok,
               boot_lo, boot_hi, round(boot_hi - boot_lo, 6) AS boot_range,
               full_mean
        FROM reps, band, f
        ORDER BY b"""),
      "Deterministic half-sample bootstrap of mean tokens/doc: 16 salted-" +
        "hash replicas in ONE pass (16-way map-side explode into a " +
        "16-group partial aggregate — no per-replica scans), exact " +
        "integer sums, replica spread broadcast back as the confidence " +
        "band beside the full-corpus mean."),

    // ---------------------------------------------------------------- q194
    Q(
      "q194_source_quantiles",
      (s, dir) => {
        // Per-source exact quantile table (deciles of doc token count):
        // the per-GROUP order-statistics capability — q98's GlobalRank
        // two-phase shape with source as the segment, so every source
        // ranks independently (nothing sorts more than ~rows/32) and the
        // decile values are EXACT order statistics, not sketch
        // estimates: q_k = value at rank ceil(k * n_src / 10). The
        // k-explode happens AFTER ranking (map-only x9 on the ranked
        // frame, then a rank-equality filter keeps 9 rows per source).
        // This is the cross-source comparability table that decides
        // per-source length cutoffs — sketch-free, reproducible.
        val d = table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(expr("tokenize_text(text)")).cast("long").as("ntok"))
        graft.operators.GlobalRank
          .withGlobalRank(d, "source", "ntok", "doc_id")
          .withColumn("k", explode(expr("sequence(1, 9)")))
          .filter(expr("rn = (n_seg * k + 9) div 10"))
          .selectExpr("source", "cast(k as int) as k",
            "cast(n_seg as bigint) as n_docs", "ntok as q_ntok")
          .orderBy("source", "k")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
          FROM documents),
        ranked AS (
          SELECT source, ntok,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY ntok, doc_id) AS rn,
                 COUNT(1) OVER (PARTITION BY source) AS n_seg
          FROM d),
        e AS (
          SELECT source, unnest(range(1, 10)) AS k, rn, n_seg, ntok FROM ranked)
        SELECT source, CAST(k AS INTEGER) AS k,
               CAST(n_seg AS BIGINT) AS n_docs, ntok AS q_ntok
        FROM e
        WHERE rn = (n_seg * k + 9) // 10
        ORDER BY source, k"""),
      "Per-source exact decile table of doc token counts: segmented " +
        "GlobalRank two-phase ranks (source = segment, no single-task " +
        "sort) + rank-equality selection — exact order statistics, not " +
        "sketches; the cross-source length-cutoff table.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q200
    Q(
      "q200_lsh_design",
      (s, dir) => {
        // LSH index-design audit: for candidate (bands b x rows r)
        // configurations, the S-curve catch probability p = 1-(1-s^r)^b
        // evaluated at every VERIFIED near-dup pair's exact Jaccard s —
        // the table that picks the banding scheme before a 100 TB index
        // build. Catch probabilities use integer-exponent multiplication
        // chains and the s50 threshold (1/b)^(1/r) uses sqrt chains
        // (r, b powers of 2), so every number is an exact IEEE tree both
        // engines share. Scale: the pair front is candidate-bounded; the
        // configs explode is x4 on that tiny frame; output is 4 rows.
        val ver = verifiedNearDupPairs(s, dir)
          .withColumn("cfg", explode(expr(
            """array(named_struct('b', 2, 'r', 2), named_struct('b', 4, 'r', 4),
                     named_struct('b', 2, 'r', 8), named_struct('b', 8, 'r', 2))""")))
          .selectExpr("cfg.b as b", "cfg.r as r", "jaccard as s")
          .withColumn("sr", expr(
            """case when r = 2 then s * s
                    when r = 4 then s * s * s * s
                    else s * s * s * s * s * s * s * s end"""))
          .withColumn("p", expr(
            """case when b = 2 then 1.0d - (1.0d - sr) * (1.0d - sr)
                    when b = 4 then 1.0d - (1.0d - sr) * (1.0d - sr) * (1.0d - sr) * (1.0d - sr)
                    else 1.0d - (1.0d - sr) * (1.0d - sr) * (1.0d - sr) * (1.0d - sr)
                         * (1.0d - sr) * (1.0d - sr) * (1.0d - sr) * (1.0d - sr) end"""))
        ver.groupBy("b", "r")
          .agg(count(lit(1)).as("n_pairs"),
            expr("round(cast(sum(cast(round(p, 12) as decimal(28,12))) as double)"
              + " / count(1), 6)").as("mean_p"),
            sum(expr("case when p >= 0.9d then 1 else 0 end")).as("n_reliable"))
          .withColumn("s50", expr(
            """case when r = 2 then sqrt(1.0d / cast(b as double))
                    when r = 4 then sqrt(sqrt(1.0d / cast(b as double)))
                    else sqrt(sqrt(sqrt(1.0d / cast(b as double)))) end"""))
          .selectExpr("b", "r", "n_pairs", "mean_p",
            "cast(n_reliable as bigint) as n_reliable", "round(s50, 6) as s50")
          .orderBy("b", "r")
      },
      Some(s"""
        WITH $duckVerifiedPairs,
        cfgs AS (
          SELECT unnest([{'b': 2, 'r': 2}, {'b': 4, 'r': 4},
                         {'b': 2, 'r': 8}, {'b': 8, 'r': 2}],
                 recursive := true)),
        e AS (
          SELECT c.b, c.r, v.jaccard AS s,
                 CASE WHEN c.r = 2 THEN v.jaccard * v.jaccard
                      WHEN c.r = 4 THEN v.jaccard * v.jaccard * v.jaccard * v.jaccard
                      ELSE v.jaccard * v.jaccard * v.jaccard * v.jaccard
                           * v.jaccard * v.jaccard * v.jaccard * v.jaccard END AS sr
          FROM ver v, cfgs c),
        pe AS (
          SELECT b, r, s,
                 CASE WHEN b = 2 THEN 1.0 - (1.0 - sr) * (1.0 - sr)
                      WHEN b = 4 THEN 1.0 - (1.0 - sr) * (1.0 - sr) * (1.0 - sr) * (1.0 - sr)
                      ELSE 1.0 - (1.0 - sr) * (1.0 - sr) * (1.0 - sr) * (1.0 - sr)
                           * (1.0 - sr) * (1.0 - sr) * (1.0 - sr) * (1.0 - sr) END AS p
          FROM e)
        SELECT b, r, COUNT(1) AS n_pairs,
               round(CAST(SUM(CAST(round(p, 12) AS DECIMAL(28,12))) AS DOUBLE)
                     / COUNT(1), 6) AS mean_p,
               CAST(SUM(CASE WHEN p >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_reliable,
               round(CASE WHEN r = 2 THEN sqrt(1.0 / CAST(b AS DOUBLE))
                          WHEN r = 4 THEN sqrt(sqrt(1.0 / CAST(b AS DOUBLE)))
                          ELSE sqrt(sqrt(sqrt(1.0 / CAST(b AS DOUBLE)))) END, 6) AS s50
        FROM pe
        GROUP BY b, r
        ORDER BY b, r"""),
      "LSH design table: S-curve catch probability 1-(1-s^r)^b at every " +
        "verified pair's exact Jaccard for 4 (bands x rows) configs, " +
        "plus the (1/b)^(1/r) threshold via sqrt chains — the banding " +
        "scheme chooser run before an index build; 4-row output.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q209
    Q(
      "q209_weighted_median",
      (s, dir) => {
        // Per-source WEIGHTED median of doc length (weight = n_chars):
        // the char-mass midpoint — "half the characters live in docs of
        // <= this many tokens" — which differs from q194's count median
        // whenever long docs carry the mass. Exact weighted order
        // statistic: smallest v with cumweight(v) * 2 >= total. Scale:
        // one (source, value) aggregate collapses the corpus to the
        // value-DOMAIN frame (token counts are bounded, so this is
        // sources x |domain|, corpus-independent); the prefix sum runs
        // as a self-join on that bounded frame (the q155 no-global-
        // window discipline) and the median election is a min over
        // qualifying values. For unbounded domains the same query runs
        // over GlobalRank's bucket machinery instead.
        val d = table(s, dir, "documents")
          .select(col("source"),
            size(expr("tokenize_text(text)")).cast("long").as("v"),
            col("n_chars").as("w"))
          .groupBy("source", "v").agg(sum("w").as("wv"))
        val tot = d.groupBy("source").agg(sum("wv").as("wtot"),
          count(lit(1)).as("n_vals"))
        d.as("a")
          .join(broadcast(d.selectExpr("source", "v as v2", "wv as wv2")),
            Seq("source"))
          .filter(col("v2") <= col("a.v"))
          .groupBy(col("source"), col("a.v").as("v"))
          .agg(sum("wv2").as("cumw"))
          .join(broadcast(tot), Seq("source"))
          .filter(col("cumw") * 2 >= col("wtot"))
          .groupBy("source", "wtot", "n_vals")
          .agg(min("v").as("w_median"))
          .selectExpr("source", "w_median",
            "cast(wtot as bigint) as char_mass",
            "cast(n_vals as bigint) as n_vals")
          .orderBy("source")
      },
      Some("""
        WITH d AS (
          SELECT source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
                 CAST(SUM(n_chars) AS BIGINT) AS wv
          FROM documents GROUP BY 1, 2),
        tot AS (
          SELECT source, CAST(SUM(wv) AS BIGINT) AS wtot,
                 COUNT(1) AS n_vals
          FROM d GROUP BY source),
        cum AS (
          SELECT a.source, a.v, CAST(SUM(b.wv) AS BIGINT) AS cumw
          FROM d a JOIN d b ON a.source = b.source AND b.v <= a.v
          GROUP BY a.source, a.v)
        SELECT c.source, MIN(c.v) AS w_median, t.wtot AS char_mass,
               CAST(t.n_vals AS BIGINT) AS n_vals
        FROM cum c JOIN tot t ON c.source = t.source
        WHERE c.cumw * 2 >= t.wtot
        GROUP BY c.source, t.wtot, t.n_vals
        ORDER BY c.source"""),
      "Per-source weighted median (char-mass midpoint): one (source, " +
        "value) aggregate collapses the corpus to the bounded value-" +
        "domain frame, prefix weights via self-join on it (no global " +
        "window), exact election — weighted order statistics beyond " +
        "q194's count quantiles.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q211
    Q(
      "q211_chi2_features",
      (s, dir) => {
        // Chi-square feature selection — the vocab-pruning signal for
        // the q182 classifier family: for each (token, lang), the 2x2
        // presence/absence chi-square from EXACT document counts
        //   a = docs of lang containing tok,  b = other-lang docs with tok,
        //   c = lang docs without tok,        d = the rest,
        //   chi2 = N (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)),
        // top-20 strongest token-language associations. Scale: one
        // presence distinct (doc-keyed shuffle), one (tok, lang)
        // aggregate, token totals equi-joined (vocab-sized, never
        // broadcast), the 5-row lang totals + 1-row N broadcast;
        // TakeOrdered for the top-20 — no global sort.
        val pres = table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(array_distinct(expr("tokenize_text(text)"))).as("tok"))
        val a = pres.groupBy("tok", "lang").agg(count(lit(1)).as("a"))
        val nt = pres.groupBy("tok").agg(countDistinct("doc_id").as("nt"))
        val nl = table(s, dir, "documents").groupBy("lang")
          .agg(count(lit(1)).as("nl"))
        val nn = table(s, dir, "documents").agg(count(lit(1)).as("nn"))
        a.join(nt, Seq("tok"))
          .join(broadcast(nl), Seq("lang"))
          .crossJoin(broadcast(nn))
          .withColumn("chi2", expr(
            """cast(nn as double)
               * (cast(a as double) * cast(nn - nt - nl + a as double)
                  - cast(nt - a as double) * cast(nl - a as double))
               * (cast(a as double) * cast(nn - nt - nl + a as double)
                  - cast(nt - a as double) * cast(nl - a as double))
               / (cast(nt as double) * cast(nn - nt as double)
                  * cast(nl as double) * cast(nn - nl as double))"""))
          .selectExpr("lang", "tok", "cast(a as bigint) as n_in_lang",
            "cast(nt as bigint) as n_with_tok", "round(chi2, 6) as chi2")
          .orderBy(col("chi2").desc, col("lang"), col("tok"))
          .limit(20)
      },
      Some("""
        WITH pres AS (
          SELECT DISTINCT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS tok
          FROM documents),
        a AS (SELECT tok, lang, COUNT(1) AS a FROM pres GROUP BY 1, 2),
        nt AS (SELECT tok, COUNT(DISTINCT doc_id) AS nt FROM pres GROUP BY tok),
        nl AS (SELECT lang, COUNT(1) AS nl FROM documents GROUP BY lang),
        nn AS (SELECT COUNT(1) AS nn FROM documents)
        SELECT a.lang, a.tok, CAST(a.a AS BIGINT) AS n_in_lang,
               CAST(nt.nt AS BIGINT) AS n_with_tok,
               round(CAST(nn.nn AS DOUBLE)
                 * (CAST(a.a AS DOUBLE) * CAST(nn.nn - nt.nt - nl.nl + a.a AS DOUBLE)
                    - CAST(nt.nt - a.a AS DOUBLE) * CAST(nl.nl - a.a AS DOUBLE))
                 * (CAST(a.a AS DOUBLE) * CAST(nn.nn - nt.nt - nl.nl + a.a AS DOUBLE)
                    - CAST(nt.nt - a.a AS DOUBLE) * CAST(nl.nl - a.a AS DOUBLE))
                 / (CAST(nt.nt AS DOUBLE) * CAST(nn.nn - nt.nt AS DOUBLE)
                    * CAST(nl.nl AS DOUBLE) * CAST(nn.nn - nl.nl AS DOUBLE)), 6) AS chi2
        FROM a JOIN nt USING (tok) JOIN nl ON a.lang = nl.lang, nn
        ORDER BY chi2 DESC, a.lang, a.tok
        LIMIT 20"""),
      "Chi-square (token, lang) feature selection from exact 2x2 " +
        "document counts: presence distinct + (tok, lang) aggregate, " +
        "vocab-sized token totals equi-joined (never broadcast), tiny " +
        "lang/N frames broadcast, TakeOrdered top-20 — the vocab-" +
        "pruning companion to the NB classifier.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q212
    Q(
      "q212_nb_crossval",
      (s, dir) => {
        // 3-fold cross-validation of the q182 NB classifier ENTIRELY
        // in-plan — the model-selection step: instead of three training
        // passes, per-fold counts are derived by SUBTRACTION from the
        // global counts (train_f = all - fold_f), so the corpus is
        // token-scanned ONCE; each fold's model stays (fold, lang, tok)-
        // keyed and equi-joined (never broadcast — only the 15-row
        // class frame broadcasts), test docs score against their own
        // fold's model, and the readout is per-fold accuracy plus the
        // mean and spread across folds. Same exact-decimal argmax and
        // round-ln conventions as q182, fold-parameterized.
        val foldHash = md5long("concat('cv|', cast(doc_id as string))")
        val docs = table(s, dir, "documents")
          .withColumn("fold", expr(s"$foldHash % 3"))
        val docToks = docs.select(col("doc_id"), col("lang"), col("fold"),
          explode(expr("tokenize_text(text)")).as("tok"))
        val cAll = docToks.groupBy("lang", "tok").agg(count(lit(1)).as("c_all"))
        val cFold = docToks.groupBy("fold", "lang", "tok")
          .agg(count(lit(1)).as("c_f"))
        val folds = cAll
          .withColumn("fold", explode(expr("sequence(cast(0 as bigint), cast(2 as bigint))")))
          .join(cFold, Seq("fold", "lang", "tok"), "left")
          .withColumn("cnt", expr("c_all - coalesce(c_f, cast(0 as bigint))"))
          .filter(col("cnt") > 0)
        val nTok = folds.groupBy("fold", "lang").agg(sum("cnt").as("n_tok"))
        val vocab = folds.select("fold", "tok").distinct()
          .groupBy("fold").agg(count(lit(1)).as("v"))
        val dAll = docs.groupBy("lang").agg(count(lit(1)).as("d_all"))
        val dFold = docs.groupBy("fold", "lang").agg(count(lit(1)).as("d_f"))
        val pri = dAll
          .withColumn("fold", explode(expr("sequence(cast(0 as bigint), cast(2 as bigint))")))
          .join(dFold, Seq("fold", "lang"), "left")
          .withColumn("docs_c", expr("d_all - coalesce(d_f, cast(0 as bigint))"))
        val tot = pri.groupBy("fold").agg(sum("docs_c").as("docs_tot"))
        val cls = pri.join(nTok, Seq("fold", "lang"))
          .join(vocab, Seq("fold")).join(tot, Seq("fold"))
          .selectExpr("fold", "lang as cls", "n_tok", "v",
            "round(ln(cast(docs_c as double) / cast(docs_tot as double)), 6) as prior")
        val testToks = docToks.selectExpr("fold", "doc_id", "lang as actual", "tok")
          .groupBy("fold", "doc_id", "actual", "tok").agg(count(lit(1)).as("tf"))
        val picked = testToks
          .join(broadcast(cls), Seq("fold"))
          .join(folds.selectExpr("fold", "lang as cls", "tok", "cnt"),
            Seq("fold", "cls", "tok"), "left")
          .withColumn("contrib", expr(
            """cast(tf as double)
               * round(ln(cast(coalesce(cnt, cast(0 as bigint)) + 1 as double)
                          / cast(n_tok + v as double)), 6)"""))
          .groupBy("fold", "doc_id", "actual", "cls", "prior")
          .agg(sum(expr("cast(round(contrib, 12) as decimal(28,12))")).as("ssum"))
          .withColumn("total", expr("cast(prior as decimal(28,12)) + ssum"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("fold", "doc_id")
              .orderBy(col("total").desc, col("cls").asc)))
          .filter(col("rn") === 1)
        val perFold = picked.groupBy("fold")
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("cls") === col("actual"), 1).otherwise(0)).as("n_correct"))
          .withColumn("accuracy", expr(
            "round(cast(n_correct as double) / cast(n_test as double), 6)"))
        val summary = perFold.agg(
          expr("round(cast(sum(cast(round(accuracy, 6) as decimal(28,12))) as double) / count(1), 6)").as("mean_acc"),
          expr("round(max(accuracy) - min(accuracy), 6)").as("acc_range"))
        perFold.crossJoin(broadcast(summary))
          .selectExpr("cast(fold as bigint) as fold", "n_test",
            "cast(n_correct as bigint) as n_correct", "accuracy",
            "mean_acc", "acc_range")
          .orderBy("fold")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id, lang, text,
                 ${duckMd5long("'cv|' || cast(doc_id as varchar)")} % 3 AS fold
          FROM documents),
        dt AS (
          SELECT doc_id, lang, fold, unnest(string_split(text, ' ')) AS tok
          FROM d),
        call AS (SELECT lang, tok, COUNT(1) AS c_all FROM dt GROUP BY 1, 2),
        cfold AS (SELECT fold, lang, tok, COUNT(1) AS c_f FROM dt GROUP BY 1, 2, 3),
        grid AS (
          SELECT c.lang, c.tok, c.c_all, f.f AS fold
          FROM call c CROSS JOIN (SELECT unnest(range(0, 3)) AS f) f),
        folds AS (
          SELECT g.fold, g.lang, g.tok,
                 g.c_all - COALESCE(k.c_f, 0) AS cnt
          FROM grid g
          LEFT JOIN cfold k ON k.fold = g.fold AND k.lang = g.lang AND k.tok = g.tok
          WHERE g.c_all - COALESCE(k.c_f, 0) > 0),
        ntok AS (SELECT fold, lang, CAST(SUM(cnt) AS BIGINT) AS n_tok
                 FROM folds GROUP BY 1, 2),
        voc AS (SELECT fold, COUNT(DISTINCT tok) AS v FROM folds GROUP BY fold),
        dall AS (SELECT lang, COUNT(1) AS d_all FROM d GROUP BY lang),
        dfold AS (SELECT fold, lang, COUNT(1) AS d_f FROM d GROUP BY 1, 2),
        dgrid AS (
          SELECT a.lang, a.d_all, f.f AS fold
          FROM dall a CROSS JOIN (SELECT unnest(range(0, 3)) AS f) f),
        pri AS (
          SELECT g.fold, g.lang,
                 g.d_all - COALESCE(k.d_f, 0) AS docs_c
          FROM dgrid g
          LEFT JOIN dfold k ON k.fold = g.fold AND k.lang = g.lang),
        tot AS (SELECT fold, CAST(SUM(docs_c) AS BIGINT) AS docs_tot
                FROM pri GROUP BY fold),
        cls AS (
          SELECT p.fold, p.lang AS cls, n.n_tok, voc.v,
                 round(ln(CAST(p.docs_c AS DOUBLE) / CAST(t.docs_tot AS DOUBLE)), 6) AS prior
          FROM pri p
          JOIN ntok n ON n.fold = p.fold AND n.lang = p.lang
          JOIN voc ON voc.fold = p.fold
          JOIN tot t ON t.fold = p.fold),
        te AS (
          SELECT fold, doc_id, lang AS actual, tok, COUNT(1) AS tf
          FROM dt GROUP BY 1, 2, 3, 4),
        sc AS (
          SELECT te.fold, te.doc_id, te.actual, c.cls, c.prior,
                 SUM(CAST(ROUND(
                   CAST(te.tf AS DOUBLE)
                   * ROUND(ln(CAST(COALESCE(k.cnt, 0) + 1 AS DOUBLE)
                              / CAST(c.n_tok + c.v AS DOUBLE)), 6), 12)
                   AS DECIMAL(28,12))) AS ssum
          FROM te
          JOIN cls c ON c.fold = te.fold
          LEFT JOIN folds k ON k.fold = te.fold AND k.lang = c.cls AND k.tok = te.tok
          GROUP BY 1, 2, 3, 4, 5),
        ranked AS (
          SELECT fold, doc_id, actual, cls,
                 ROW_NUMBER() OVER (PARTITION BY fold, doc_id
                   ORDER BY (CAST(prior AS DECIMAL(28,12)) + ssum) DESC, cls) AS rn
          FROM sc),
        pf AS (
          SELECT fold, COUNT(1) AS n_test,
                 CAST(SUM(CASE WHEN cls = actual THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
          FROM ranked WHERE rn = 1
          GROUP BY fold),
        acc AS (
          SELECT fold, n_test, n_correct,
                 round(CAST(n_correct AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS accuracy
          FROM pf),
        summ AS (
          SELECT round(CAST(SUM(CAST(round(accuracy, 6) AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(1), 6) AS mean_acc,
                 round(MAX(accuracy) - MIN(accuracy), 6) AS acc_range
          FROM acc)
        SELECT CAST(a.fold AS BIGINT) AS fold, a.n_test, a.n_correct,
               a.accuracy, s.mean_acc, s.acc_range
        FROM acc a, summ s
        ORDER BY a.fold"""),
      "3-fold NB cross-validation in one plan: per-fold models derived " +
        "by count SUBTRACTION from global counts (corpus token-scanned " +
        "once), (fold, lang, tok)-keyed equi-joins, 15-row class frame " +
        "broadcast, q182's exact-decimal argmax — per-fold accuracy " +
        "plus mean/spread; the model-selection step.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q218
    Q(
      "q218_isotonic_calibration",
      (s, dir) => {
        // Isotonic (PAV) calibration of the cheap quality signal against
        // dup truth — the monotone successor to q173's binned curve and
        // the standard probability-calibration step for any cheap
        // classifier: fit the best NON-DECREASING rate curve over the
        // score axis. Exact fit via the minimax characterization
        //   iso[i] = max_{j<=i} min_{k>=i} mean(pos_j..pos_k)
        // evaluated over prefix sums — mathematically identical to the
        // pool-adjacent-violators stack algorithm, but expressible as
        // one shared nested-HOF tree in BOTH engines (no iteration).
        // Scale: the corpus collapses to the <= 101-row per-cent score
        // frame (bounded DOMAIN, corpus-independent) in one map pass +
        // doc-keyed join; the O(m^3) minimax runs on ONE row of arrays
        // where m <= 101 — constant work, documented as such.
        val dup = verifiedNearDupPairs(s, dir)
        val members = dup.select(col("id_a").as("doc_id"))
          .union(dup.select(col("id_b").as("doc_id")))
          .distinct().withColumn("isdup", lit(1))
        val sc = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("score", expr(
            "size(filter(toks, x -> x in ('the','a','of','and','to'))) * 100 div size(toks)"))
          .select("doc_id", "score")
          .join(members, Seq("doc_id"), "left")
          .groupBy("score")
          .agg(sum(coalesce(col("isdup"), lit(0))).as("np"),
            count(lit(1)).as("n"))
        sc.agg(expr("array_sort(collect_list(struct(score, np, n)))").as("a"))
          .selectExpr("a",
            "transform(a, p -> p.score) as ss",
            // prefix sums with a leading 0: cp[k+1] = sum of np[1..k]
            """transform(sequence(0, size(a)), i ->
                 aggregate(slice(a, 1, i), cast(0 as bigint), (acc, p) -> acc + p.np)) as cp""",
            """transform(sequence(0, size(a)), i ->
                 aggregate(slice(a, 1, i), cast(0 as bigint), (acc, p) -> acc + p.n)) as cn""")
          .selectExpr("a", "ss", "cp", "cn",
            """transform(sequence(1, size(a)), i ->
                 array_max(transform(sequence(1, i), j ->
                   array_min(transform(sequence(i, size(a)), k ->
                     cast(element_at(cp, k + 1) - element_at(cp, j) as double)
                     / cast(element_at(cn, k + 1) - element_at(cn, j) as double))))))
               as iso""")
          .selectExpr(
            "posexplode(a) as (i, p)", "iso")
          .selectExpr("p.score as score", "cast(p.n as bigint) as n_docs",
            "cast(p.np as bigint) as n_dup",
            "round(cast(p.np as double) / cast(p.n as double), 6) as rate_raw",
            "round(element_at(iso, i + 1), 6) as rate_iso")
          .orderBy("score")
      },
      Some(s"""
        WITH $duckVerifiedPairs,
        members AS (
          SELECT DISTINCT doc_id FROM (
            SELECT id_a AS doc_id FROM ver UNION ALL SELECT id_b FROM ver)),
        d AS (
          SELECT doc_id,
                 len(list_filter(string_split(text, ' '),
                   x -> x IN ('the','a','of','and','to'))) * 100
                   // len(string_split(text, ' ')) AS score
          FROM documents),
        sc AS (
          SELECT score,
                 SUM(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS np,
                 COUNT(1) AS n
          FROM d LEFT JOIN members m USING (doc_id)
          GROUP BY score),
        arr AS (
          SELECT list(score ORDER BY score) AS ss,
                 list(np ORDER BY score) AS nps,
                 list(n ORDER BY score) AS ns
          FROM sc),
        pre AS (
          SELECT ss, nps, ns, len(ss) AS m,
                 list_transform(range(0, len(ss) + 1), i ->
                   list_sum(list_concat([CAST(0 AS BIGINT)],
                     list_slice(nps, 1, CAST(i AS INTEGER))))) AS cp,
                 list_transform(range(0, len(ss) + 1), i ->
                   list_sum(list_concat([CAST(0 AS BIGINT)],
                     list_slice(ns, 1, CAST(i AS INTEGER))))) AS cn
          FROM arr),
        iso AS (
          SELECT ss, nps, ns, m, cp, cn,
                 list_transform(range(1, m + 1), i ->
                   list_max(list_transform(range(1, i + 1), j ->
                     list_min(list_transform(range(i, m + 1), k ->
                       CAST(cp[CAST(k + 1 AS INTEGER)] - cp[CAST(j AS INTEGER)] AS DOUBLE)
                       / CAST(cn[CAST(k + 1 AS INTEGER)] - cn[CAST(j AS INTEGER)] AS DOUBLE)))))) AS iso
          FROM pre),
        rows_out AS (
          SELECT unnest(range(1, m + 1)) AS i, ss, nps, ns, iso
          FROM iso)
        SELECT ss[CAST(i AS INTEGER)] AS score,
               CAST(ns[CAST(i AS INTEGER)] AS BIGINT) AS n_docs,
               CAST(nps[CAST(i AS INTEGER)] AS BIGINT) AS n_dup,
               round(CAST(nps[CAST(i AS INTEGER)] AS DOUBLE)
                     / CAST(ns[CAST(i AS INTEGER)] AS DOUBLE), 6) AS rate_raw,
               round(iso[CAST(i AS INTEGER)], 6) AS rate_iso
        FROM rows_out
        ORDER BY score"""),
      "Isotonic (PAV) calibration of the quality signal vs dup truth " +
        "via the exact minimax characterization over prefix sums — the " +
        "best monotone rate curve, one shared nested-HOF tree in both " +
        "engines; corpus collapses to the bounded <= 101-row per-cent " +
        "score domain, O(m^3) on one row is constant work.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q222
    Q(
      "q222_corpus_diversity",
      (s, dir) => {
        // Corpus diversity (self-similarity) audit — the generation-
        // quality metric: mean pairwise bigram Jaccard over a
        // deterministic 30-doc sample (salted-hash bottom-k, the q70
        // machinery). High mean = mode collapse / templated corpus; low
        // = diverse. Scale: the sample is CONSTANT-size regardless of
        // corpus (one TakeOrdered by hash), so the C(30,2) = 435 exact
        // pair comparisons are constant work — the audit never touches
        // corpus^2; the full-corpus estimate tightens by re-running
        // with a different salt, not a bigger k.
        val k = 30
        val sample = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 2)
          .selectExpr("doc_id",
            "array_distinct(word_ngrams(toks, 2)) as bgs",
            md5long("concat('dv|', cast(doc_id as string))") + " as h")
          .orderBy("h", "doc_id").limit(k)
          .select("doc_id", "bgs")
        val pairs = sample.as("a")
          .join(broadcast(sample.as("b")),
            col("a.doc_id") < col("b.doc_id"))
          .withColumn("jac", expr(
            """cast(size(array_intersect(a.bgs, b.bgs)) as double)
               / size(array_union(a.bgs, b.bgs))"""))
        pairs.agg(
          count(lit(1)).as("n_pairs"),
          expr("round(cast(sum(cast(round(jac, 12) as decimal(28,12))) as double)"
            + " / count(1), 6)").as("mean_jaccard"),
          expr("round(min(jac), 6)").as("min_jaccard"),
          expr("round(max(jac), 6)").as("max_jaccard"))
          .selectExpr("cast(n_pairs as bigint) as n_pairs",
            "mean_jaccard", "min_jaccard", "max_jaccard")
      },
      Some(s"""
        WITH d AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i + 1])) AS bgs,
                 ${duckMd5long("'dv|' || cast(doc_id as varchar)")} AS h
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
          WHERE len(toks) >= 2),
        sample AS (
          SELECT doc_id, bgs FROM d ORDER BY h, doc_id LIMIT 30),
        pairs AS (
          SELECT CAST(len(list_intersect(a.bgs, b.bgs)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.bgs, b.bgs))) AS jac
          FROM sample a JOIN sample b ON a.doc_id < b.doc_id)
        SELECT CAST(COUNT(1) AS BIGINT) AS n_pairs,
               round(CAST(SUM(CAST(round(jac, 12) AS DECIMAL(28,12))) AS DOUBLE)
                     / COUNT(1), 6) AS mean_jaccard,
               round(MIN(jac), 6) AS min_jaccard,
               round(MAX(jac), 6) AS max_jaccard
        FROM pairs"""),
      "Corpus diversity audit: mean pairwise bigram Jaccard over a " +
        "deterministic salted-hash bottom-30 sample — constant-size " +
        "sample, constant 435-pair work at any corpus size; the mode-" +
        "collapse / templating screen for generated corpora.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q223
    Q(
      "q223_bpe_fit",
      (s, dir) => {
        // The TRAINED tokenizer at production merge count — Bpe.fit
        // generalizes q156's 3 unrolled rounds into a driver-loop trainer
        // (the Ann.kmeansFit pattern: per-round 1-row elections stay
        // checkpointed DataFrames, never driver data). 16 merge rounds
        // over the distinct-word table; the oracle replays every round as
        // a generated CTE chain, so each round's winner AND its exact
        // wcnt-weighted frequency are locked cross-engine — one wrong
        // tie-break or a stale pair count anywhere in 16 rounds fails the
        // row. Scale: one corpus scan builds the word table; every round
        // after is vocab-sized with a 1-row TakeOrderedAndProject winner
        // broadcast back into replace().
        val docs = table(s, dir, "documents").select("text")
        val merges = graft.operators.Bpe.fitOnText(s, docs, "text", bpeFitMerges)
        merges.select(col("round"),
            bpeSpell(col("pair")).as("merge_rule"),
            concat(lit("<"), col("round").cast("string"), lit(">")).as("sym"),
            col("n"))
          .orderBy("round")
      },
      Some(s"""
        WITH ${duckBpeFitCtes(bpeFitMerges)}
        SELECT round, merge_rule, sym, n FROM (
          ${(1 to bpeFitMerges).map(r =>
            s"""SELECT CAST($r AS INTEGER) AS round,
                ${duckBpeSpell("pair")} AS merge_rule,
                '<$r>' AS sym, n FROM m$r""").mkString("\n          UNION ALL ")})
        ORDER BY round"""),
      "Trained BPE at 16 merges: the q156 loop as a real driver-loop " +
        "trainer (Bpe.fit, kmeansFit pattern) — every round's merge rule " +
        "and exact frequency oracle-replayed through a generated 16-round " +
        "CTE chain; vocab-sized rounds, 1-row broadcast winners."),

    // ---------------------------------------------------------------- q224
    Q(
      "q224_bpe_pack",
      (s, dir) => {
        // The trained model APPLIED where it matters: token counting and
        // context-window packing under the 16-merge tokenizer (q106/q107
        // budgeted on whitespace counts — this is the real-tokenizer
        // version the verdict asked for). Bpe.tokenCounts folds the merge
        // table per word (1-row model broadcast, aggregate HOF) and
        // Packer.withSequenceOffsets turns the counts into exact global
        // sequence offsets (two-phase bucketed — no single-task window).
        // The oracle replays all 16 merges per word AND the offset
        // arithmetic, so a single mis-merged word shifts every later
        // offset and fails the row — byte-identical token counts, as
        // specified.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        val merges = graft.operators.Bpe.fitOnText(s, docs, "text", bpeFitMerges)
        val counted = graft.operators.Bpe
          .tokenCounts(docs, "text", merges, "n_bpe_tok")
          .select("doc_id", "n_bpe_tok")
        graft.operators.Packer
          .withSequenceOffsets(counted, "doc_id", "n_bpe_tok", ctxLen = 128)
          .select("doc_id", "n_bpe_tok", "tok_offset",
            "first_seq", "last_seq", "n_seqs")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ${duckBpeFitCtes(bpeFitMerges)},
        toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w0 FROM documents),
        merged AS (
          SELECT doc_id, ${duckBpeMergedWord("w0", bpeFitMerges)} AS mw FROM toks),
        cnt AS (
          SELECT doc_id, CAST(SUM(length(mw)) AS BIGINT) AS n_bpe_tok
          FROM merged GROUP BY doc_id),
        off AS (
          SELECT doc_id, n_bpe_tok,
                 CAST(COALESCE(SUM(n_bpe_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
          FROM cnt)
        SELECT doc_id, n_bpe_tok, tok_offset,
               tok_offset // 128 AS first_seq,
               (tok_offset + greatest(n_bpe_tok, 1) - 1) // 128 AS last_seq,
               (tok_offset + greatest(n_bpe_tok, 1) - 1) // 128
                 - tok_offset // 128 + 1 AS n_seqs
        FROM off ORDER BY doc_id"""),
      "Trained-BPE packing: 16-merge token counts (Bpe.tokenCounts, 1-row " +
        "model broadcast + per-word merge fold) fed to Packer's two-phase " +
        "global offsets — context-window budgeting under the REAL trained " +
        "tokenizer; the oracle replays every merge and every offset."),

    // ---------------------------------------------------------------- q227
    Q(
      "q227_bpe_chunk_budget",
      (s, dir) => {
        // Chunker under the trained tokenizer — the other half of the
        // "Chunker/Packer accept the trained model" contract (q224 is
        // Packer's): slidingTokenWindows cuts 32-word chunks, then
        // Bpe.tokenCounts prices each CHUNK in trained-BPE symbols — the
        // budget-audit a context-window pipeline runs to know whether its
        // word-count chunking stays under the model's real token budget.
        // Per-doc summary: chunk count, total/max/min chunk cost, and the
        // count of chunks over a 96-symbol budget. The oracle replays the
        // word slicing AND all 16 merges per word per chunk. Scale:
        // chunking is map-only Generate; pricing is the 1-row model
        // broadcast + per-word fold; the summary is one doc-keyed
        // aggregate.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        val merges = graft.operators.Bpe.fitOnText(s, docs, "text", bpeFitMerges)
        val chunks = graft.operators.Chunker
          .slidingTokenWindows(docs, "text", window = 32, stride = 32)
          .select("doc_id", "chunk_no", "chunk_text")
        graft.operators.Bpe
          .tokenCounts(chunks, "chunk_text", merges, "chunk_bpe")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            sum("chunk_bpe").as("total_bpe"),
            max("chunk_bpe").as("max_chunk_bpe"),
            min("chunk_bpe").as("min_chunk_bpe"),
            sum(when(col("chunk_bpe") > 96, 1L).otherwise(0L)).as("n_over_budget"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ${duckBpeFitCtes(bpeFitMerges)},
        toks AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        chunks AS (
          SELECT doc_id, CAST(st // 32 AS BIGINT) AS chunk_no,
                 list_slice(ws, CAST(st + 1 AS INTEGER), CAST(st + 32 AS INTEGER)) AS cw
          FROM toks, unnest(range(0, len(ws), 32)) AS u(st)),
        priced AS (
          -- merges apply at ROW level (unnest first): DuckDB rejects the
          -- (SELECT pair FROM m_r) scalar subqueries inside a lambda
          SELECT doc_id, chunk_no,
                 CAST(COALESCE(SUM(length(${duckBpeMergedWord("w0", bpeFitMerges)})), 0) AS BIGINT) AS chunk_bpe
          FROM (SELECT doc_id, chunk_no, unnest(cw) AS w0 FROM chunks)
          GROUP BY doc_id, chunk_no)
        SELECT doc_id,
               CAST(COUNT(1) AS BIGINT) AS n_chunks,
               CAST(SUM(chunk_bpe) AS BIGINT) AS total_bpe,
               CAST(MAX(chunk_bpe) AS BIGINT) AS max_chunk_bpe,
               CAST(MIN(chunk_bpe) AS BIGINT) AS min_chunk_bpe,
               CAST(SUM(CASE WHEN chunk_bpe > 96 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_budget
        FROM priced GROUP BY doc_id
        ORDER BY doc_id"""),
      "Trained-BPE chunk budgeting: 32-word sliding chunks priced in " +
        "16-merge BPE symbols with an over-budget census — the audit that " +
        "tells a pipeline whether word-count chunking respects the real " +
        "tokenizer's context budget; map-only chunking, 1-row model " +
        "broadcast, doc-keyed summary."),

    // ---------------------------------------------------------------- q229
    Q(
      "q229_bpe_vocab",
      (s, dir) => {
        // The shipped tokenizer VOCABULARY: q223 emits merge rules in the
        // placeholder alphabet (<1><2>…); this decodes each trained
        // symbol back to its SURFACE spelling by replaying the merge list
        // in reverse training order (round r's pair may contain earlier
        // placeholders, so last-to-first replacement fully grounds every
        // symbol) — the vocab.txt a tokenizer job hands to humans and to
        // other runtimes, with each token's corpus frequency and decoded
        // length. The oracle replays the reverse expansion chain, so one
        // wrong expansion order anywhere scrambles the spellings.
        // Scale: the merge table is nMerges rows — this query is
        // model-sized, not corpus-sized.
        val docs = table(s, dir, "documents").select("text")
        val merges = graft.operators.Bpe.fitOnText(s, docs, "text", bpeFitMerges)
        graft.operators.Bpe
          .decodeSpellings(merges, "pair", merges, "token")
          .selectExpr("round", "token", "n",
            "cast(length(token) as integer) as token_len")
          .orderBy("round")
      },
      Some {
        def rev(e: String) = (bpeFitMerges to 1 by -1).foldLeft(e) { (acc, k) =>
          s"replace($acc, chr(${bpeCp(k)}), (SELECT pair FROM m$k))"
        }
        s"""
        WITH ${duckBpeFitCtes(bpeFitMerges)}
        SELECT round, token, n, CAST(length(token) AS INTEGER) AS token_len FROM (
          ${(1 to bpeFitMerges).map(r =>
            s"""SELECT CAST($r AS INTEGER) AS round, ${rev("pair")} AS token, n
                FROM m$r""").mkString("\n          UNION ALL ")})
        ORDER BY round"""
      },
      "The shipped BPE vocabulary: every trained symbol decoded to its " +
        "surface spelling (reverse-order merge expansion) with corpus " +
        "frequency and decoded length — vocab.txt for humans and other " +
        "tokenizer runtimes; model-sized, not corpus-sized.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q226
    Q(
      "q226_pipeline_e2e",
      (s, dir) => {
        // The WHOLE pretraining-data pipeline in one oracle row — the
        // composition the r5 verdict asked for: Curation keep-list (q60)
        // -> contamination span SURGERY on survivors (q113) ->
        // Mixture.sampleByRates (q74's hash thresholds) -> assignSplits
        // (q110) -> Packer context-window offsets (q105), with per-stage
        // row/token accounting AND first-drop attribution rows. Stage
        // contracts compose end to end: one column-name or hash-salt
        // mismatch anywhere shifts every later stage's counts and fails
        // the row. Output: (ord, stage, n_rows, n_tokens) — stages 0-5
        // are the surviving corpus after each stage (tokens post-surgery
        // from stage 2 on), rows 10+ attribute every dropped doc to its
        // FIRST failing stage with the token count it held when dropped.
        // Scale: each stage is its standalone query's verified shape;
        // the verdict and post-surgery frames are pinned once
        // (localCheckpoint, rows x 4 narrow columns) because SIX
        // accounting branches read them — recomputing LSH + connected
        // components per branch would sextuple the dominant cost.
        val docs = table(s, dir, "documents")
        val corpus = docs.filter(col("doc_id") >= 10)
        val evalDocs = docs.filter(col("doc_id") < 10)
        val keep = graft.operators.Curation
          .keepList(s, corpus, evalDocs, "doc_id", "text")
          .select("doc_id", "n_tokens", "kept", "drop_reason")
          .localCheckpoint(true)
        // -- stage 2: span surgery on survivors (q113's machinery) -------
        val withToks = corpus
          .join(keep.filter(col("kept")).select("doc_id"), Seq("doc_id"), "left_semi")
          .withColumn("toks", expr("tokenize_text(text)"))
        val posts = withToks.filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            posexplode(expr("word_ngram_hash48(toks, 3)")).as(Seq("pos0", "h")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
        val evalSh = evalDocs.withColumn("toks", expr("tokenize_text(text)"))
          .filter(size(col("toks")) >= 3)
          .select(explode(expr("array_distinct(word_ngram_hash48(toks, 3))")).as("h"))
          .distinct()
        val before = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)
        val upto = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cuts = posts.join(broadcast(evalSh), Seq("h"))
          .select("doc_id", "pos")
          .withColumn("prev_end", max(col("pos") + 2).over(before))
          .withColumn("new_isl",
            (col("pos") > coalesce(col("prev_end"), lit(-2)) + 1).cast("int"))
          .withColumn("isl", sum("new_isl").over(upto))
          .groupBy("doc_id", "isl")
          .agg(min("pos").as("s0"), (max(col("pos")) + lit(2)).as("e0"))
          .groupBy("doc_id")
          .agg(sum(col("e0") - col("s0") + 1).as("cut"))
        val surg = keep.filter(col("kept"))
          .join(corpus.select("doc_id", "lang"), Seq("doc_id"))
          .join(cuts, Seq("doc_id"), "left")
          .withColumn("tokens_kept",
            col("n_tokens").cast("long") - coalesce(col("cut"), lit(0L)))
          .select("doc_id", "lang", "n_tokens", "tokens_kept")
          .localCheckpoint(true)
        // -- stages 3-4: mixture + splits (hash-threshold, replayable) ---
        val mixed = graft.operators.Mixture.sampleByRates(
          surg, "lang", "doc_id",
          rates = Map("en" -> 0.85, "zh" -> 1.0), defaultRate = 0.7, salt = "e2e_mix")
        val spl = graft.operators.Mixture.assignSplits(
            mixed, "doc_id", "e2e_split",
            Seq(("train", 80), ("val", 10), ("test", 10)))
          .localCheckpoint(true)
        val train = spl.filter(col("split") === "train")
          .select("doc_id", "tokens_kept")
        // -- stage 5: context-window packing over the train split --------
        val nCtx = graft.operators.Packer
          .withSequenceOffsets(train, "doc_id", "tokens_kept", ctxLen = 128)
          .agg(coalesce(max(col("last_seq")) + 1, lit(0L)).as("n_ctx"))
        def stageRow(ord: Int, name: String,
            df: org.apache.spark.sql.DataFrame, tokCol: String) =
          df.agg(count(lit(1)).as("n_rows"),
              coalesce(sum(col(tokCol).cast("long")), lit(0L)).as("n_tokens"))
            .select(lit(ord).as("ord"), lit(name).as("stage"),
              col("n_rows"), col("n_tokens"))
        val packedRow = train
          .agg(coalesce(sum(col("tokens_kept")), lit(0L)).as("n_tokens"))
          .crossJoin(broadcast(nCtx))
          .select(lit(5).as("ord"), lit("packed_ctx128").as("stage"),
            col("n_ctx").as("n_rows"), col("n_tokens"))
        val dropCuration = keep.filter(!col("kept"))
          .groupBy("drop_reason")
          .agg(count(lit(1)).as("n_rows"),
            coalesce(sum(col("n_tokens").cast("long")), lit(0L)).as("n_tokens"))
          .select(
            expr("""case drop_reason when 'quality' then 10
                    when 'repetition' then 11 when 'contaminated' then 12
                    when 'exact_dup' then 13 else 14 end""").as("ord"),
            concat(lit("drop:"), col("drop_reason")).as("stage"),
            col("n_rows"), col("n_tokens"))
        stageRow(0, "corpus", keep, "n_tokens")
          .unionAll(stageRow(1, "curation", keep.filter(col("kept")), "n_tokens"))
          .unionAll(stageRow(2, "surgery", surg, "tokens_kept"))
          .unionAll(stageRow(3, "mixture", mixed, "tokens_kept"))
          .unionAll(stageRow(4, "split_train", train, "tokens_kept"))
          .unionAll(packedRow)
          .unionAll(dropCuration)
          .unionAll(stageRow(15, "drop:mixture",
            surg.join(mixed.select("doc_id"), Seq("doc_id"), "left_anti"), "tokens_kept"))
          .unionAll(stageRow(16, "drop:split_val",
            spl.filter(col("split") === "val"), "tokens_kept"))
          .unionAll(stageRow(17, "drop:split_test",
            spl.filter(col("split") === "test"), "tokens_kept"))
          .orderBy("ord", "stage")
      },
      Some(s"""
        WITH RECURSIVE
        $duckCurationCtes,
        verdicts AS (
          SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens,
                 ((s.n_tokens >= 20 AND s.avg_token_len BETWEEN 2.0 AND 8.0)
                   AND s.dup_frac <= 0.2
                   AND COALESCE(c.contam_frac, CAST(0.0 AS DOUBLE)) <= 0.5
                   AND e.is_canonical
                   AND COALESCE(cc.cluster_id, s.doc_id) = s.doc_id) AS kept,
                 CASE WHEN NOT (s.n_tokens >= 20 AND s.avg_token_len BETWEEN 2.0 AND 8.0) THEN 'quality'
                      WHEN NOT s.dup_frac <= 0.2 THEN 'repetition'
                      WHEN NOT COALESCE(c.contam_frac, CAST(0.0 AS DOUBLE)) <= 0.5 THEN 'contaminated'
                      WHEN NOT e.is_canonical THEN 'exact_dup'
                      WHEN NOT COALESCE(cc.cluster_id, s.doc_id) = s.doc_id THEN 'near_dup'
                      ELSE '(kept)' END AS drop_reason
          FROM sig2 s
          JOIN exact e ON s.doc_id = e.doc_id
          LEFT JOIN contam c ON s.doc_id = c.doc_id
          LEFT JOIN cc ON s.doc_id = cc.id),
        kpos AS (
          SELECT b.doc_id, unnest(range(1, len(b.toks) - 1)) AS pos, b.toks
          FROM base b JOIN verdicts v ON b.doc_id = v.doc_id AND v.kept
          WHERE len(b.toks) >= 3),
        khash AS (
          SELECT doc_id, pos,
                 ${duckMd5long("toks[pos] || ' ' || toks[pos + 1] || ' ' || toks[pos + 2]")} AS h
          FROM kpos),
        epos AS (
          SELECT unnest(range(1, len(toks) - 1)) AS pos, toks
          FROM (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id < 10)
          WHERE len(toks) >= 3),
        evh AS (
          SELECT DISTINCT ${duckMd5long("toks[pos] || ' ' || toks[pos + 1] || ' ' || toks[pos + 2]")} AS h
          FROM epos),
        fl AS (SELECT doc_id, pos FROM khash JOIN evh USING (h)),
        pe AS (
          SELECT doc_id, pos,
                 MAX(pos + 2) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM fl),
        isl AS (
          SELECT doc_id, pos,
                 SUM(CASE WHEN pos > COALESCE(prev_end, -2) + 1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
          FROM pe),
        spans AS (
          SELECT doc_id, isl, MIN(pos) AS s0, MAX(pos) + 2 AS e0
          FROM isl GROUP BY doc_id, isl),
        cuts AS (
          SELECT doc_id, CAST(SUM(e0 - s0 + 1) AS BIGINT) AS cut
          FROM spans GROUP BY doc_id),
        surg AS (
          SELECT v.doc_id, d.lang, v.n_tokens,
                 CAST(v.n_tokens - COALESCE(c.cut, 0) AS BIGINT) AS tokens_kept
          FROM verdicts v
          JOIN documents d ON v.doc_id = d.doc_id
          LEFT JOIN cuts c ON v.doc_id = c.doc_id
          WHERE v.kept),
        mixd AS (
          SELECT * FROM surg
          WHERE ${duckMd5long("'e2e_mix|' || CAST(doc_id AS VARCHAR)")} % 1000000
                < CASE lang WHEN 'en' THEN 850000 WHEN 'zh' THEN 1000000 ELSE 700000 END),
        mixdrop AS (
          SELECT * FROM surg
          WHERE ${duckMd5long("'e2e_mix|' || CAST(doc_id AS VARCHAR)")} % 1000000
                >= CASE lang WHEN 'en' THEN 850000 WHEN 'zh' THEN 1000000 ELSE 700000 END),
        spl AS (
          SELECT *, CASE WHEN sh < 80 THEN 'train' WHEN sh < 90 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT *, ${duckMd5long("'e2e_split|' || CAST(doc_id AS VARCHAR)")} % 100 AS sh
                FROM mixd)),
        train AS (SELECT doc_id, tokens_kept FROM spl WHERE split = 'train'),
        packt AS (
          SELECT doc_id, tokens_kept,
                 COALESCE(SUM(tokens_kept) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
          FROM train),
        nctx AS (
          SELECT CAST(COALESCE(MAX((tok_offset + greatest(tokens_kept, 1) - 1) // 128) + 1, 0) AS BIGINT) AS n
          FROM packt)
        SELECT ord, stage, n_rows, n_tokens FROM (
          SELECT CAST(0 AS INTEGER) AS ord, 'corpus' AS stage,
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM verdicts) AS n_rows,
                 (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM verdicts) AS n_tokens
          UNION ALL SELECT CAST(1 AS INTEGER), 'curation',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM verdicts WHERE kept),
                 (SELECT CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM verdicts WHERE kept)
          UNION ALL SELECT CAST(2 AS INTEGER), 'surgery',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM surg),
                 (SELECT CAST(COALESCE(SUM(tokens_kept), 0) AS BIGINT) FROM surg)
          UNION ALL SELECT CAST(3 AS INTEGER), 'mixture',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM mixd),
                 (SELECT CAST(COALESCE(SUM(tokens_kept), 0) AS BIGINT) FROM mixd)
          UNION ALL SELECT CAST(4 AS INTEGER), 'split_train',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM train),
                 (SELECT CAST(COALESCE(SUM(tokens_kept), 0) AS BIGINT) FROM train)
          UNION ALL SELECT CAST(5 AS INTEGER), 'packed_ctx128',
                 (SELECT n FROM nctx),
                 (SELECT CAST(COALESCE(SUM(tokens_kept), 0) AS BIGINT) FROM train)
          UNION ALL SELECT CAST(CASE drop_reason WHEN 'quality' THEN 10 WHEN 'repetition' THEN 11
                        WHEN 'contaminated' THEN 12 WHEN 'exact_dup' THEN 13 ELSE 14 END AS INTEGER),
                 'drop:' || drop_reason,
                 CAST(COUNT(1) AS BIGINT),
                 CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
            FROM verdicts WHERE NOT kept GROUP BY drop_reason
          UNION ALL SELECT CAST(15 AS INTEGER), 'drop:mixture',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM mixdrop),
                 (SELECT CAST(COALESCE(SUM(tokens_kept), 0) AS BIGINT) FROM mixdrop)
          UNION ALL SELECT CAST(16 AS INTEGER), 'drop:split_val',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM spl WHERE split = 'val'),
                 (SELECT CAST(COALESCE(SUM(tokens_kept), 0) AS BIGINT) FROM spl WHERE split = 'val')
          UNION ALL SELECT CAST(17 AS INTEGER), 'drop:split_test',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM spl WHERE split = 'test'),
                 (SELECT CAST(COALESCE(SUM(tokens_kept), 0) AS BIGINT) FROM spl WHERE split = 'test'))
        ORDER BY ord, stage"""),
      "The end-to-end pretraining pipeline as one oracle row: Curation " +
        "keep-list -> contamination span surgery -> mixture sampling -> " +
        "train/val/test splits -> context-window packing, with per-stage " +
        "row/token accounting and first-drop attribution — every stage its " +
        "standalone query's verified shape, composed; one salt or column " +
        "mismatch anywhere fails the row.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q231
    Q(
      "q231_dup_spans",
      (s, dir) => {
        // SUBSTRING-level dedup — the published train-data recipe "drop
        // any k-token span that repeats anywhere in the corpus" needs
        // exact duplicated-span extents, not just doc-level verdicts.
        // Dedup.dupSpans marks every 8-gram occurring more than once
        // (cross-doc or within-doc), then merges overlapping marks per
        // doc (gaps-and-islands on start positions) into MAXIMAL spans.
        // Scale: gram-keyed count agg (map-side combinable, never
        // position lists) + left-semi fan of occurrences, doc-keyed
        // window, doc-keyed final agg — a hot gram costs its occurrence
        // count, never count².
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Dedup.dupSpans(docs, "doc_id", "text", k = 8)
          .selectExpr(
            "doc_id",
            "cast(n_tok as int) as n_tok",
            "cast(n_dup_spans as bigint) as n_dup_spans",
            "cast(dup_tokens as bigint) as dup_tokens",
            "cast(max_span as int) as max_span",
            "dup_ratio")
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        occ AS (
          SELECT doc_id, CAST(u.i AS INTEGER) AS p,
                 array_to_string(list_slice(ts, u.i + 1, u.i + 8), ' ') AS gram
          FROM toks, unnest(range(0, len(ts) - 8 + 1)) AS u(i)
          WHERE len(ts) >= 8),
        dup AS (
          SELECT gram FROM occ GROUP BY gram HAVING COUNT(1) > 1),
        docc AS (
          SELECT doc_id, p FROM occ JOIN dup USING (gram)),
        isl AS (
          SELECT doc_id, p,
                 CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > 8
                      OR lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                      THEN 1 ELSE 0 END AS new_island
          FROM docc),
        isl2 AS (
          SELECT doc_id, p,
                 SUM(new_island) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM isl),
        spans AS (
          SELECT doc_id, island, max(p) - min(p) + 8 AS span_len
          FROM isl2 GROUP BY doc_id, island),
        per_doc AS (
          SELECT doc_id, COUNT(1) AS n_dup_spans,
                 SUM(span_len) AS dup_tokens, MAX(span_len) AS max_span
          FROM spans GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(ts) AS INTEGER) AS n_tok,
               CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(COALESCE(max_span, 0) AS INTEGER) AS max_span,
               CAST(COALESCE(dup_tokens, 0) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE) AS dup_ratio
        FROM toks t LEFT JOIN per_doc USING (doc_id)
        ORDER BY doc_id"""),
      "Exact duplicated-span detection (the substring-dedup recipe): every " +
        "8-gram repeating anywhere in the corpus marks its position; " +
        "per-doc gaps-and-islands merges marks into maximal spans with " +
        "exact covered-token counts — gram-keyed count agg + semi-join " +
        "fan, no position lists, no all-pairs.",
    ),

    // ---------------------------------------------------------------- q232
    Q(
      "q232_dup_span_surgery",
      (s, dir) => {
        // q231's spans actually APPLIED: every token covered by a
        // duplicated 8-gram span is removed from the text (aggressive
        // all-occurrences variant — deterministic, no global occurrence
        // election), docs preserved as rows even when fully erased.
        // Scale: dupIslands' gram-agg + semi-join + doc window, then the
        // per-doc span set (≤ n_tok/8 entries) collects into ONE array
        // column and a codegen'd filter HOF drops covered tokens — never
        // an exploded token-level join. The oracle rebuilds the clean
        // text from an independent covered-position set (distinct
        // exploded positions), cross-checking the island arithmetic.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Dedup.removeDupSpans(docs, "doc_id", "text", k = 8)
          .selectExpr(
            "doc_id",
            "clean_text",
            "cast(n_tok as int) as n_tok",
            "cast(n_removed as bigint) as n_removed")
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        occ AS (
          SELECT doc_id, CAST(u.i AS INTEGER) AS p,
                 array_to_string(list_slice(ts, u.i + 1, u.i + 8), ' ') AS gram
          FROM toks, unnest(range(0, len(ts) - 8 + 1)) AS u(i)
          WHERE len(ts) >= 8),
        dup AS (
          SELECT gram FROM occ GROUP BY gram HAVING COUNT(1) > 1),
        docc AS (
          SELECT doc_id, p FROM occ JOIN dup USING (gram)),
        cov AS (
          SELECT DISTINCT doc_id, CAST(p + u.i AS INTEGER) AS j
          FROM docc, unnest(range(0, 8)) AS u(i)),
        tok AS (
          SELECT doc_id, CAST(u.i AS INTEGER) AS j,
                 ts[CAST(u.i + 1 AS INTEGER)] AS t
          FROM toks, unnest(range(0, len(ts))) AS u(i)),
        kept AS (
          SELECT tok.doc_id, tok.j, tok.t
          FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.j = cov.j
          WHERE cov.j IS NULL),
        clean AS (
          SELECT doc_id, string_agg(t, ' ' ORDER BY j) AS clean_text
          FROM kept GROUP BY doc_id),
        rem AS (
          SELECT doc_id, COUNT(1) AS n_removed FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               COALESCE(clean_text, '') AS clean_text,
               CAST(len(ts) AS INTEGER) AS n_tok,
               CAST(COALESCE(n_removed, 0) AS BIGINT) AS n_removed
        FROM toks t LEFT JOIN clean USING (doc_id) LEFT JOIN rem USING (doc_id)
        ORDER BY doc_id"""),
      "Substring-dedup surgery: q231's duplicated-span extents applied — " +
        "covered tokens removed everywhere (aggressive variant), rows " +
        "preserved even when fully erased; per-doc span sets collect into " +
        "one array and a codegen'd filter HOF cuts tokens, while the " +
        "oracle rebuilds clean text from an independently-derived " +
        "covered-position set.")
    ,

    // ---------------------------------------------------------------- q233
    Q(
      "q233_keep_first_segments",
      (s, dir) => {
        // C4-style global segment dedup, keep-first variant: text splits
        // into non-overlapping 10-token segments; each distinct segment
        // keeps exactly its globally-first occurrence (min (doc_id,
        // seg_no)) and later occurrences are deleted. Needs a GLOBAL
        // election — contrast q232, which removes all occurrences via a
        // local predicate. Scale: segment-keyed min-struct agg (map-side
        // combinable) + one segment-keyed join + doc-keyed reassembly.
        val docs = table(s, dir, "documents").select("doc_id", "text")
        graft.operators.Dedup.keepFirstSegments(docs, "doc_id", "text", w = 10)
          .selectExpr(
            "doc_id",
            "clean_text",
            "cast(n_seg as int) as n_seg",
            "cast(n_seg_removed as bigint) as n_seg_removed")
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        segs AS (
          SELECT doc_id, CAST(u.i AS INTEGER) AS seg_no,
                 array_to_string(list_slice(ts, u.i * 10 + 1, u.i * 10 + 10), ' ') AS seg
          FROM toks, unnest(range(0, CAST(ceil(len(ts) / 10.0) AS INTEGER))) AS u(i)),
        ranked AS (
          SELECT doc_id, seg_no, seg,
                 row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
          FROM segs),
        clean AS (
          SELECT doc_id,
                 string_agg(seg, ' ' ORDER BY seg_no) FILTER (WHERE rn = 1) AS clean_text,
                 CAST(COUNT(1) AS INTEGER) AS n_seg,
                 CAST(COUNT(1) FILTER (WHERE rn > 1) AS BIGINT) AS n_seg_removed
          FROM ranked GROUP BY doc_id)
        SELECT doc_id, COALESCE(clean_text, '') AS clean_text, n_seg, n_seg_removed
        FROM clean ORDER BY doc_id"""),
      "C4-style global segment dedup (keep-first): non-overlapping " +
        "10-token segments, each distinct segment keeps only its " +
        "corpus-wide first occurrence by (doc_id, seg_no) — a global " +
        "min-struct election + segment-keyed join, versus q232's " +
        "all-occurrences surgery; oracle re-elects with a row_number " +
        "window.")
    ,

    // ---------------------------------------------------------------- q234
    Q(
      "q234_logit_quality_fit",
      (s, dir) => {
        // Distributed batch-GD classifier (Logit.fit, the kmeansFit
        // driver-loop pattern): Elliott fast-sigmoid link (exp-free —
        // every op exactly-rounded IEEE, so weights are bit-identical
        // across engines), gradients via the exact-DECIMAL sum spelling.
        // Features: min-max-scaled token count, distinct-token ratio and
        // 'spark'-token rate; label = rate above corpus mean. Each of
        // the 8 iterations is ONE corpus scan collapsing map-side to 5
        // scalar sums; weights travel as plan literals. The oracle
        // replays all 8 unrolled iterations in materialized CTEs.
        val raw = table(s, dir, "documents").select(
          col("doc_id"),
          expr("cast(size(tokenize_text(text)) as double)").as("ntok"),
          expr("cast(size(array_distinct(tokenize_text(text))) as double) " +
            "/ cast(size(tokenize_text(text)) as double)").as("uniq"),
          expr("cast(size(filter(tokenize_text(text), t -> t = 'spark')) as double) " +
            "/ cast(size(tokenize_text(text)) as double)").as("rate"))
        val stats = raw.agg(
          min("ntok").as("ntok_min"), max("ntok").as("ntok_max"),
          min("uniq").as("uniq_min"), max("uniq").as("uniq_max"),
          min("rate").as("rate_min"), max("rate").as("rate_max"),
          expr("cast(sum(cast(round(rate, 9) as decimal(28,12))) as double) " +
            "/ cast(count(1) as double)").as("rate_mean"))
        val feats = raw.crossJoin(broadcast(stats))
          .select(
            col("doc_id"),
            ((col("ntok") - col("ntok_min")) / (col("ntok_max") - col("ntok_min"))).as("x1"),
            ((col("uniq") - col("uniq_min")) / (col("uniq_max") - col("uniq_min"))).as("x2"),
            ((col("rate") - col("rate_min")) / (col("rate_max") - col("rate_min"))).as("x3"),
            when(col("rate") > col("rate_mean"), 1.0).otherwise(0.0).as("y"))
          .localCheckpoint(true) // scanned iters+1 times below
        val xs = Seq("x1", "x2", "x3")
        val w = graft.operators.Logit.fit(feats, xs, "y", logitIters, logitLr)
        val p = graft.operators.Logit.prob(w, xs)
        feats
          .agg(
            sum(when((p >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L)).as("n_correct"),
            count(lit(1)).as("n"),
            sum(col("y")).cast("bigint").as("n_pos"))
          .select(
            round(lit(w(0)), 6).as("b"),
            round(lit(w(1)), 6).as("w_ntok"),
            round(lit(w(2)), 6).as("w_uniq"),
            round(lit(w(3)), 6).as("w_rate"),
            round(col("n_correct").cast("double") / col("n").cast("double"), 6)
              .as("accuracy"),
            col("n_pos"))
      },
      Some(duckLogitSql),
      "Distributed gradient-descent quality classifier: Elliott-link " +
        "logistic-style fit over three scaled doc features, 8 driver-loop " +
        "iterations of one map-collapsing corpus scan each, exact-DECIMAL " +
        "gradient sums making every weight bit-identical across engines; " +
        "oracle replays the full unrolled descent in materialized CTEs.")
    ,

    // ---------------------------------------------------------------- q236
    Q(
      "q236_url_dedup",
      (s, dir) => {
        // URL-level dedup — the FIRST dedup pass of a crawl pipeline,
        // before any content hashing: tracking-tagged shares, www/port/
        // trailing-slash variants and re-crawls of one page collapse to
        // one canonical key via the codegen'd canonical_url expression
        // (fragment strip, case, www, default ports, trailing slashes,
        // utm_/fbclid removal, byte-order param sort). URLs are
        // synthesized deterministically from doc fields so every rule is
        // exercised; the oracle replays both the construction and each
        // canonicalization rule in portable string SQL. Scale: map-only
        // canonicalization inside WholeStageCodegen + ONE hash aggregate
        // on the canonical key.
        graft.functions.UrlExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id", "source")
          .withColumn("url", expr(
            """concat(
                 case when doc_id % 2 = 0 then 'HTTP://WWW.' else 'https://' end,
                 source, '.Example.com',
                 case when doc_id % 2 = 0 then ':80' else ':443' end,
                 '/',
                 case when doc_id % 3 = 0 then 'Arch/'
                      when doc_id % 3 = 1 then 'Arch'
                      else 'b/c/' end,
                 '?utm_source=feed&z=', cast(doc_id % 5 as string),
                 '&A=1&fbclid=xyz',
                 '#frag-', cast(doc_id as string))"""))
          .withColumn("canonical_url", expr("canonical_url(url)"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"))
          .orderBy("canonical_url")
      },
      Some("""
        WITH raw AS (
          SELECT doc_id,
                 concat(
                   CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.' ELSE 'https://' END,
                   source, '.Example.com',
                   CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END,
                   '/',
                   CASE WHEN doc_id % 3 = 0 THEN 'Arch/'
                        WHEN doc_id % 3 = 1 THEN 'Arch'
                        ELSE 'b/c/' END,
                   '?utm_source=feed&z=', CAST(doc_id % 5 AS VARCHAR),
                   '&A=1&fbclid=xyz',
                   '#frag-', CAST(doc_id AS VARCHAR)) AS url
          FROM documents),
        nofrag AS (SELECT doc_id, split_part(url, '#', 1) AS u FROM raw),
        parts AS (
          SELECT doc_id,
                 lower(split_part(u, '://', 1)) AS scheme,
                 split_part(u, '://', 2) AS rest
          FROM nofrag),
        seg AS (
          SELECT doc_id, scheme,
                 lower(split_part(split_part(rest, '/', 1), '?', 1)) AS auth,
                 CASE WHEN position('/' IN rest) > 0
                      THEN substr(rest, position('/' IN rest)) ELSE '' END AS pq
          FROM parts),
        dewww AS (
          SELECT doc_id, scheme,
                 CASE WHEN starts_with(auth, 'www.') THEN substr(auth, 5)
                      ELSE auth END AS a, pq
          FROM seg),
        hp AS (
          SELECT doc_id, scheme,
                 CASE WHEN position(':' IN a) > 0 THEN split_part(a, ':', 1)
                      ELSE a END AS host,
                 CASE WHEN position(':' IN a) > 0 THEN split_part(a, ':', 2)
                      ELSE '' END AS port, pq
          FROM dewww),
        hp2 AS (
          SELECT doc_id, scheme, host,
                 CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                        OR (scheme = 'https' AND port = '443')
                      THEN '' ELSE ':' || port END AS portseg, pq
          FROM hp),
        pathq AS (
          SELECT doc_id, scheme, host, portseg,
                 rtrim(split_part(pq, '?', 1), '/') AS path,
                 CASE WHEN position('?' IN pq) > 0 THEN split_part(pq, '?', 2)
                      ELSE '' END AS query
          FROM hp2),
        canon AS (
          SELECT doc_id,
                 concat(scheme, '://', host, portseg, path,
                   CASE WHEN len(kept) > 0
                        THEN concat('?', array_to_string(kept, '&'))
                        ELSE '' END) AS canonical_url
          FROM (
            SELECT *, list_sort(list_filter(string_split(query, '&'), p ->
                     p <> ''
                     AND NOT starts_with(lower(split_part(p, '=', 1)), 'utm_')
                     AND NOT lower(split_part(p, '=', 1))
                         IN ('fbclid', 'gclid', 'msclkid', 'ref'))) AS kept
            FROM pathq))
        SELECT canonical_url, COUNT(1) AS n_docs, MIN(doc_id) AS keeper
        FROM canon GROUP BY canonical_url ORDER BY canonical_url"""),
      "URL-level dedup, the first pass of crawl curation: the codegen'd " +
        "canonical_url expression collapses tracking params, www/port/" +
        "slash variants and fragments to one canonical key (byte-order " +
        "param sort), then one hash aggregate elects the keeper; the " +
        "oracle replays every canonicalization rule in portable SQL.")
    ,

    // ---------------------------------------------------------------- q237
    Q(
      "q237_mixture_waterfill",
      (s, dir) => {
        // Pretraining-mixture ALLOCATION: distribute a 60%-of-corpus token
        // budget across sources proportionally to doc count, capped by
        // each source's actual tokens ("at most one epoch of wiki") —
        // closed-form waterfilling: sort by cap/weight, prefix sums, and
        // the cross-multiplied saturation test keeps the whole decision
        // in EXACT bigint arithmetic (doubles only in the final
        // unsaturated division). The corpus collapses to one sources-
        // sized frame in a single map-combining pass; the operator's
        // global windows run over that tiny frame only. The 1-row total
        // collect is documented driver control (the kmeansFit pattern).
        val per = table(s, dir, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("w"),
            sum(expr("size(tokenize_text(text))").cast("long")).as("cap"))
        val tot = per.agg(sum("cap")).head().getLong(0)
        graft.operators.Mixture
          .waterfillAllocations(per, "source", "w", "cap", 6L * tot / 10L)
          .orderBy("source")
      },
      Some("""
        WITH per AS (
          SELECT source, CAST(COUNT(1) AS BIGINT) AS w,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS cap
          FROM documents GROUP BY source),
        tot AS (SELECT (6 * SUM(cap)) // 10 AS b FROM per),
        s AS (
          SELECT source, w, cap,
                 SUM(w) OVER (ORDER BY cap * 1.0 / w, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS pw,
                 SUM(cap) OVER (ORDER BY cap * 1.0 / w, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cap AS pcap,
                 SUM(w) OVER () AS totw, SUM(cap) OVER () AS totcap
          FROM per),
        sat AS (
          SELECT *, (b >= totcap OR cap * (totw - pw) <= (b - pcap) * w) AS saturated
          FROM s CROSS JOIN tot),
        lvl AS (
          SELECT *,
                 SUM(CASE WHEN saturated THEN cap ELSE 0 END) OVER () AS satcap,
                 SUM(CASE WHEN saturated THEN 0 ELSE w END) OVER () AS unsatw
          FROM sat)
        SELECT source, w, cap, saturated,
               CASE WHEN saturated THEN CAST(cap AS DOUBLE)
                    ELSE round(CAST(b - satcap AS DOUBLE) * CAST(w AS DOUBLE)
                           / CAST(unsatw AS DOUBLE), 6) END AS allocation
        FROM lvl ORDER BY source"""),
      "Mixture waterfilling: budget split proportional to weight under " +
        "per-source availability caps, closed-form via saturation-ordered " +
        "prefix sums with cross-multiplied EXACT bigint comparisons — no " +
        "iteration, corpus collapses to a sources-sized frame first; the " +
        "oracle replays the identical window algebra.")
    ,

    // ---------------------------------------------------------------- q238
    Q(
      "q238_budget_fill",
      (s, dir) => {
        // q237's allocations REALIZED: per source, keep documents in
        // salted-hash order while the cumulative token count stays within
        // the waterfilled allocation (greedy prefix — deterministic,
        // growth-stable, never exceeds budget). The per-source cumsum is
        // the Packer two-phase shape SEGMENTED by source: hash-mod
        // buckets, per-(source,bucket) totals, a (sources x 16)-row
        // broadcast offset frame, and within-bucket windows bounded by
        // rows/16 per source — no source-sized sort partition anywhere.
        val hash = graft.functions.HashConventions
          .md5long48("concat('fill|', cast(doc_id as string))")
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            expr("size(tokenize_text(text))").cast("long").as("n_tok"))
        val per = docs.groupBy("source")
          .agg(count(lit(1)).as("w"), sum("n_tok").as("cap"))
        val tot = per.agg(sum("cap")).head().getLong(0)
        val alloc = graft.operators.Mixture
          .waterfillAllocations(per, "source", "w", "cap", 6L * tot / 10L)
          .select(col("source"), col("allocation"))
        val w = org.apache.spark.sql.expressions.Window
        val bucketed = docs
          .withColumn("h", expr(hash))
          .withColumn("bucket", expr("cast(h % 16 as int)"))
        val offsets = bucketed.groupBy("source", "bucket")
          .agg(sum("n_tok").as("b_tot"))
          .withColumn("b_off", coalesce(
            sum("b_tot").over(w.partitionBy("source").orderBy("bucket")
              .rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
          .select("source", "bucket", "b_off")
        val wLocal = w.partitionBy("source", "bucket").orderBy("h", "doc_id")
          .rowsBetween(w.unboundedPreceding, -1)
        bucketed
          .withColumn("loc_off", coalesce(sum("n_tok").over(wLocal), lit(0L)))
          .join(broadcast(offsets), Seq("source", "bucket"))
          .withColumn("tok_offset", col("b_off") + col("loc_off"))
          .join(broadcast(alloc), Seq("source"))
          .withColumn("kept",
            (col("tok_offset") + col("n_tok")).cast("double") <= col("allocation"))
          .groupBy("source")
          .agg(
            first("allocation").as("allocation"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tok_kept"))
          .withColumn("fill_ratio",
            round(col("tok_kept").cast("double") / col("allocation"), 6))
          .orderBy("source")
      },
      Some(s"""
        WITH docs AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 ${graft.functions.HashConventions
                   .duckMd5long48("'fill|' || cast(doc_id as varchar)")} AS h
          FROM documents),
        per AS (
          SELECT source, CAST(COUNT(1) AS BIGINT) AS w,
                 CAST(SUM(n_tok) AS BIGINT) AS cap
          FROM docs GROUP BY source),
        tot AS (SELECT (6 * SUM(cap)) // 10 AS b FROM per),
        s AS (
          SELECT source, w, cap,
                 SUM(w) OVER (ORDER BY cap * 1.0 / w, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS pw,
                 SUM(cap) OVER (ORDER BY cap * 1.0 / w, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cap AS pcap,
                 SUM(w) OVER () AS totw, SUM(cap) OVER () AS totcap
          FROM per),
        sat AS (
          SELECT *, (b >= totcap OR cap * (totw - pw) <= (b - pcap) * w) AS saturated
          FROM s CROSS JOIN tot),
        lvl AS (
          SELECT *,
                 SUM(CASE WHEN saturated THEN cap ELSE 0 END) OVER () AS satcap,
                 SUM(CASE WHEN saturated THEN 0 ELSE w END) OVER () AS unsatw
          FROM sat),
        alloc AS (
          SELECT source,
                 CASE WHEN saturated THEN CAST(cap AS DOUBLE)
                      ELSE round(CAST(b - satcap AS DOUBLE) * CAST(w AS DOUBLE)
                             / CAST(unsatw AS DOUBLE), 6) END AS allocation
          FROM lvl),
        cum AS (
          SELECT d.*, a.allocation,
                 COALESCE(SUM(n_tok) OVER (PARTITION BY d.source
                   ORDER BY h % 16, h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
          FROM docs d JOIN alloc a ON a.source = d.source),
        verdicts AS (
          SELECT *, CAST(tok_offset + n_tok AS DOUBLE) <= allocation AS kept
          FROM cum)
        SELECT source, any_value(allocation) AS allocation,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS tok_kept,
               round(CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS DOUBLE)
                 / any_value(allocation), 6) AS fill_ratio
        FROM verdicts GROUP BY source ORDER BY source"""),
      "Budget realization: q237's waterfilled allocations applied as a " +
        "deterministic greedy hash-order prefix per source — two-phase " +
        "bucketed cumsum segmented by source (no source-sized sort " +
        "partition), broadcast offset/allocation frames; the oracle " +
        "replays waterfill AND selection in one chain.")
    ,

    // ---------------------------------------------------------------- q239
    Q(
      "q239_html_extract",
      (s, dir) => {
        // Text extraction from markup — the stage between crawl payloads
        // and text curation: each doc is wrapped in a full HTML shell
        // (head/title/style to drop, comment, h1, &nbsp;-separated body,
        // trailing script) and the codegen'd strip_html expression must
        // recover EXACTLY `source + ' ' + text`. The oracle replays the
        // CONSTRUCTION, not the parser — an independent ground truth the
        // stripper has to land on byte-for-byte, 500x per SF. Map-only,
        // one WholeStageCodegen span.
        graft.functions.HtmlExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id", "source", "text")
          .withColumn("html", expr(
            """concat('<html><!-- crawl ', cast(doc_id as string),
                 ' --><head><title>t</title><style>p{margin:0}</style></head><body><h1>',
                 source, '</h1><p>', replace(text, ' ', '&nbsp;'),
                 '</p><script>var j = 1;</script></body></html>')"""))
          .selectExpr(
            "doc_id",
            "strip_html(html) as clean_text",
            "cast(length(strip_html(html)) as int) as n_clean_chars")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               source || ' ' || text AS clean_text,
               CAST(len(source || ' ' || text) AS INTEGER) AS n_clean_chars
        FROM documents ORDER BY doc_id"""),
      "HTML text extraction: the strip_html native expression (comment/" +
        "script/style/head removal with contents, tags as block " +
        "boundaries, entity decode, whitespace collapse) recovers the " +
        "exact pre-markup text from a fully-dressed HTML shell — the " +
        "oracle replays the construction, not the parser.")
    ,

    // ---------------------------------------------------------------- q240
    Q(
      "q240_kneser_ney",
      (s, dir) => {
        // Interpolated Kneser-Ney bigram smoothing (d = 0.75) — the
        // standard LM smoothing, beside q141's add-k bigram and q146's
        // backoff: discounted ML head + continuation tail weighted by the
        // context's type fan-out. Everything derives from four EXACT
        // count frames (bigram counts, context totals, forward/backward
        // type counts, distinct-bigram total) built by map-combinable
        // aggregates; doubles enter only in the final scoring arithmetic
        // (exactly-rounded ops, bit-identical cross-engine). Scored on
        // the 20 most frequent bigrams (count desc, lexicographic ties)
        // — a TakeOrderedAndProject, never a global sort.
        val bg = table(s, dir, "documents")
          .select(expr("tokenize_text(text)").as("toks"))
          .select(posexplode(expr(
            "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] as w1, toks[i + 1] as w2))")))
          .select(col("col.w1").as("w1"), col("col.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val ctx = bg.groupBy("w1")
          .agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
        val bwd = bg.groupBy("w2").agg(count(lit(1)).as("n1b"))
        val tot = bg.agg(count(lit(1)).as("tot"))
        bg
          .join(broadcast(ctx), Seq("w1"))
          .join(broadcast(bwd), Seq("w2"))
          .crossJoin(broadcast(tot))
          .selectExpr("w1", "w2", "c12",
            """round((greatest(cast(c12 as double) - 0.75d, 0d) / cast(c1 as double))
                 + ((0.75d * cast(n1f as double) / cast(c1 as double))
                    * (cast(n1b as double) / cast(tot as double))), 6) as p_kn""")
          .orderBy(col("c12").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""
        WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
        occ AS (
          SELECT toks[CAST(u.i + 1 AS INTEGER)] AS w1,
                 toks[CAST(u.i + 2 AS INTEGER)] AS w2
          FROM d, unnest(range(0, len(toks) - 1)) AS u(i)),
        bg AS (SELECT w1, w2, CAST(COUNT(1) AS BIGINT) AS c12
               FROM occ GROUP BY w1, w2),
        ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                       CAST(COUNT(1) AS BIGINT) AS n1f
                FROM bg GROUP BY w1),
        bwd AS (SELECT w2, CAST(COUNT(1) AS BIGINT) AS n1b FROM bg GROUP BY w2),
        tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS tot FROM bg)
        SELECT w1, w2, c12,
               round((greatest(CAST(c12 AS DOUBLE) - 0.75, 0) / CAST(c1 AS DOUBLE))
                 + ((0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE))
                    * (CAST(n1b AS DOUBLE) / CAST(tot AS DOUBLE))), 6) AS p_kn
        FROM bg JOIN ctx USING (w1) JOIN bwd USING (w2) CROSS JOIN tot
        ORDER BY c12 DESC, w1, w2 LIMIT 20"""),
      "Interpolated Kneser-Ney bigram smoothing: discounted ML head plus " +
        "type-fan-out-weighted continuation tail, built entirely from " +
        "four exact map-combinable count frames — doubles only in the " +
        "final exactly-rounded scoring; top-20 via TakeOrderedAndProject.")
    ,

    // ---------------------------------------------------------------- q242
    Q(
      "q242_filter_agreement",
      (s, dir) => {
        // Cohen's kappa between two INDEPENDENT quality filters — the
        // audit that tells a curation team whether two rules measure the
        // same thing or genuinely complement (kappa ~ 1: redundant,
        // drop one; kappa ~ 0: orthogonal signals). Rule A = the q29
        // length/shape gate; rule B = the q146 entropy gate, thresholded
        // on round(entropy, 6) — the rounded value is the one PROVEN
        // bit-equal cross-engine by q146, so the label can never flip on
        // a last-ulp log2 difference. One map-only labeling pass + one
        // 4-cell contingency aggregate; kappa is pure 1-row arithmetic.
        graft.functions.TextExpressions.register(s)
        val labeled = table(s, dir, "documents")
          .withColumn("toks", expr("tokenize_text(text)"))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("alen", graft.operators.TextSignals
            .avgTokenLen(col("text"), col("n_tokens")))
          .withColumn("a",
            col("n_tokens") >= 20 && col("alen") >= 2.0 && col("alen") <= 8.0)
          .withColumn("b", expr("round(token_entropy(toks), 6) >= 4.0d"))
        labeled
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
            sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
            sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
            sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
          .selectExpr("n", "n11", "n10", "n01", "n00",
            "cast(n11 + n00 as double) / cast(n as double) as po_raw",
            """cast((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) as double)
                 / (cast(n as double) * cast(n as double)) as pe_raw""")
          .selectExpr("n", "n11", "n10", "n01", "n00",
            "round(po_raw, 6) as po", "round(pe_raw, 6) as pe",
            "round((po_raw - pe_raw) / (1.0d - pe_raw), 6) as kappa")
      },
      Some("""
        WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        tk AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        cnt AS (SELECT doc_id, tok, COUNT(1) AS c FROM tk GROUP BY doc_id, tok),
        tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY doc_id),
        p AS (SELECT c.doc_id, c.tok, CAST(c.c AS DOUBLE) / t.n AS p
              FROM cnt c JOIN tot t USING (doc_id)),
        ent AS (SELECT doc_id,
                       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list(-(p * log2(p)) ORDER BY tok)), (a, v) -> a + v) AS h
                FROM p GROUP BY doc_id),
        lab AS (
          SELECT d.doc_id,
                 (len(d.toks) >= 20
                  AND (CAST(len(d.text) - (len(d.toks) - 1) AS DOUBLE) / len(d.toks)) >= 2.0
                  AND (CAST(len(d.text) - (len(d.toks) - 1) AS DOUBLE) / len(d.toks)) <= 8.0) AS a,
                 round(e.h, 6) >= 4.0 AS b
          FROM d JOIN ent e USING (doc_id)),
        cells AS (
          SELECT CAST(COUNT(1) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                 CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                 CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                 CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
          FROM lab),
        raw AS (
          SELECT *, CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po_raw,
                 CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe_raw
          FROM cells)
        SELECT n, n11, n10, n01, n00,
               round(po_raw, 6) AS po, round(pe_raw, 6) AS pe,
               round((po_raw - pe_raw) / (1.0 - pe_raw), 6) AS kappa
        FROM raw"""),
      "Cohen's kappa between two independent curation filters (q29 " +
        "length/shape gate vs q146 entropy gate): one map-only labeling " +
        "pass, one 4-cell contingency aggregate, kappa as 1-row exact " +
        "arithmetic; the entropy label thresholds on the round-6 value " +
        "q146 proves bit-equal cross-engine.")
    ,

    // ---------------------------------------------------------------- q243
    Q(
      "q243_quantile_normalize",
      (s, dir) => {
        // Cross-source quantile normalization — the batch-effect remover:
        // each doc's length score maps onto the POOLED distribution at
        // its within-source percentile, so a systematically-short source
        // stops dragging every downstream length filter. Two EXACT
        // GlobalRank passes (per-source ranks, then pooled ranks — both
        // two-phase bucketed, no source- or corpus-sized sort task); the
        // 100-point pooled grid picks rows at integer-ceil target ranks
        // (pure bigint arithmetic) and broadcasts into the final map-side
        // lookup join.
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            expr("size(tokenize_text(text))").cast("long").as("score"))
        val bySrc = graft.operators.GlobalRank
          .withGlobalRank(docs, "source", "score", "doc_id")
          .withColumn("p",
            (col("rn").cast("double") - lit(0.5)) / col("n_seg").cast("double"))
          .withColumn("bin", expr("cast(ceil(p * 100) as int)"))
          .select("doc_id", "source", "score", "p", "bin")
        val pooled = graft.operators.GlobalRank
          .withGlobalRank(docs.withColumn("all", lit("all")), "all", "score", "doc_id")
          .select(col("rn").as("prn"), col("score").as("pooled_score"),
            col("n_seg").as("n_all"))
        val grid = pooled
          .crossJoin(broadcast(
            s.range(1, 101).toDF("g")))
          .filter(col("prn") === expr("cast((g * n_all + 99) div 100 as bigint)"))
          .select(col("g").cast("int").as("bin"), col("pooled_score"))
        bySrc
          .join(broadcast(grid), Seq("bin"))
          .selectExpr("doc_id", "source", "score",
            "round(p, 6) as pct_in_source",
            "pooled_score as norm_score")
          .orderBy("doc_id")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS score
          FROM documents),
        by_src AS (
          SELECT doc_id, source, score,
                 row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
                 COUNT(1) OVER (PARTITION BY source) AS n_seg
          FROM docs),
        p AS (
          SELECT doc_id, source, score,
                 (CAST(rn AS DOUBLE) - 0.5) / CAST(n_seg AS DOUBLE) AS p
          FROM by_src),
        pooled AS (
          SELECT score AS pooled_score,
                 row_number() OVER (ORDER BY score, doc_id) AS prn,
                 COUNT(1) OVER () AS n_all
          FROM docs),
        grid AS (
          SELECT CAST(g.g AS INTEGER) AS bin, pooled_score
          FROM pooled, (SELECT unnest(range(1, 101)) AS g) g
          WHERE prn = (g.g * n_all + 99) // 100)
        SELECT doc_id, source, score,
               round(p, 6) AS pct_in_source,
               pooled_score AS norm_score
        FROM p JOIN grid ON grid.bin = CAST(ceil(p.p * 100) AS INTEGER)
        ORDER BY doc_id"""),
      "Cross-source quantile normalization: within-source percentile " +
        "(exact two-phase GlobalRank, no per-source sort task) mapped " +
        "onto the pooled distribution through a 100-point broadcast grid " +
        "picked at integer-ceil target ranks — the batch-effect remover " +
        "for systematically-biased sources.")
    ,

    // ---------------------------------------------------------------- q244
    Q(
      "q244_spearman",
      (s, dir) => {
        // Exact tie-aware Spearman rank correlation between two doc
        // signals (token count vs distinct-token count) — the monotone-
        // association complement of q44's Pearson: Pearson over AVERAGE
        // ranks, the standard tie treatment. Ranks come from two exact
        // two-phase GlobalRank passes (never a corpus-sized sort task);
        // average ranks per tied value are one map-combinable aggregate
        // (sum(rn)/cnt — consecutive-integer sums, so the average is an
        // exact .0/.5 double) joined back value-keyed; the five moment
        // sums ride the library's round-then-DECIMAL spelling, making
        // rho bit-identical across engines and partitionings.
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            expr("size(tokenize_text(text))").cast("long").as("x"),
            expr("size(array_distinct(tokenize_text(text)))").cast("long").as("y"))
        def avgRanks(valCol: String) = {
          val ranked = graft.operators.GlobalRank
            .withGlobalRank(
              docs.withColumn("all", lit("all")), "all", valCol, "doc_id")
          ranked.groupBy(valCol)
            .agg((sum("rn").cast("double") / count(lit(1)).cast("double"))
              .as(s"r_$valCol"))
        }
        val withRanks = docs
          .join(avgRanks("x"), Seq("x"))
          .join(avgRanks("y"), Seq("y"))
        withRanks
          .agg(
            count(lit(1)).as("n"),
            sum(expr("cast(round(r_x, 9) as decimal(28,12))")).as("sx"),
            sum(expr("cast(round(r_y, 9) as decimal(28,12))")).as("sy"),
            sum(expr("cast(round(r_x * r_x, 9) as decimal(28,12))")).as("sxx"),
            sum(expr("cast(round(r_y * r_y, 9) as decimal(28,12))")).as("syy"),
            sum(expr("cast(round(r_x * r_y, 9) as decimal(28,12))")).as("sxy"))
          .selectExpr("cast(n as bigint) as n",
            """round((cast(n as double) * cast(sxy as double)
                      - cast(sx as double) * cast(sy as double))
                 / (sqrt(cast(n as double) * cast(sxx as double)
                         - cast(sx as double) * cast(sx as double))
                    * sqrt(cast(n as double) * cast(syy as double)
                           - cast(sy as double) * cast(sy as double))), 6)
               as rho_spearman""")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
          FROM documents),
        rkx AS (
          SELECT x, CAST(SUM(rn) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE) AS r_x
          FROM (SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rn FROM docs)
          GROUP BY x),
        rky AS (
          SELECT y, CAST(SUM(rn) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE) AS r_y
          FROM (SELECT y, row_number() OVER (ORDER BY y, doc_id) AS rn FROM docs)
          GROUP BY y),
        j AS (
          SELECT d.doc_id, r_x, r_y
          FROM docs d JOIN rkx USING (x) JOIN rky USING (y)),
        m AS (
          SELECT CAST(COUNT(1) AS BIGINT) AS n,
                 SUM(CAST(round(r_x, 9) AS DECIMAL(28,12))) AS sx,
                 SUM(CAST(round(r_y, 9) AS DECIMAL(28,12))) AS sy,
                 SUM(CAST(round(r_x * r_x, 9) AS DECIMAL(28,12))) AS sxx,
                 SUM(CAST(round(r_y * r_y, 9) AS DECIMAL(28,12))) AS syy,
                 SUM(CAST(round(r_x * r_y, 9) AS DECIMAL(28,12))) AS sxy
          FROM j)
        SELECT n,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS rho_spearman
        FROM m"""),
      "Exact tie-aware Spearman: Pearson over average ranks — two " +
        "two-phase GlobalRank passes, tied-value average ranks as one " +
        "map-combinable aggregate joined back value-keyed, moment sums " +
        "in round-then-DECIMAL; the monotone-association complement of " +
        "q44's Pearson.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q245
    Q(
      "q245_http_peel",
      (s, dir) => {
        // HTTP response peeling as first-class expressions — the stage
        // between a WARC payload and strip_html, previously ad-hoc
        // regexp/locate surgery at the crawl-spec use-sites. Each doc is
        // wrapped per its kind class: a full response with an obs-FOLDED
        // header (the fold must not fake a blank line), a headers-only
        // message (no blank line => empty body), or a bare non-HTTP body
        // (passthrough). http_status/http_body (native, codegen'd — the
        // strip_html discipline) must recover exactly the constructed
        // status and body; the oracle replays the CONSTRUCTION, never the
        // parser. Map-only, one WholeStageCodegen span.
        graft.functions.HttpExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id", "text",
            "cast(doc_id % 5 as int) as kind",
            "cast(200 + (doc_id % 3) * 100 as int) as code")
          .withColumn("msg", expr(
            """case
                 when kind = 0 then concat('HTTP/1.1 ', cast(code as string),
                   ' OK\r\nContent-Type: text/html\r\n')
                 when kind = 1 then text
                 else concat('HTTP/1.1 ', cast(code as string),
                   ' OK\r\nContent-Type: text/html\r\nX-Trace: a\r\n b\r\n\r\n',
                   text)
               end"""))
          .selectExpr(
            "doc_id",
            "http_status(msg) as status",
            "http_body(msg) as body",
            "cast(length(http_body(msg)) as int) as n_body_chars")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 1 THEN NULL
                    ELSE CAST(200 + (doc_id % 3) * 100 AS INTEGER) END AS status,
               CASE WHEN doc_id % 5 = 0 THEN '' ELSE text END AS body,
               CASE WHEN doc_id % 5 = 0 THEN 0
                    ELSE CAST(len(text) AS INTEGER) END AS n_body_chars
        FROM documents ORDER BY doc_id"""),
      "HTTP response peeling: native http_status/http_body expressions " +
        "(status-line grammar, first-blank-line body split, obs-fold and " +
        "headers-only edges, bare-body passthrough) recover the exact " +
        "constructed message parts — the oracle replays the construction, " +
        "not the parser; single codegen'd pass."),

    // ---------------------------------------------------------------- q246
    Q(
      "q246_decode_payload",
      (s, dir) => {
        // Charset-aware crawl payload decode — decode_payload(payload,
        // content_type) replaces `cast(payload as string)` (a silent
        // UTF-8 assumption that feeds mojibake into every downstream text
        // operator on real ISO-8859-1/GBK/Shift-JIS responses). Four
        // resolution paths, one kind class each: the payload's OWN
        // Content-Type header (inside an HTTP envelope), an in-body
        // <meta charset> sniff, a UTF-16LE byte-order mark, and a caller-
        // supplied content_type argument. Bodies are accented (a/e/o ->
        // á/é/ø, all Latin-1) and ENCODED in the declared charset with
        // Spark's own encode(), so the expected decode is known by
        // construction; the oracle replays the construction. Map-only.
        graft.functions.HttpExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id",
            "replace(replace(replace(text, 'a', 'á'), 'e', 'é'), 'o', 'ø') as acc",
            "cast(doc_id % 4 as int) as kind")
          .withColumn("payload", expr(
            """case
                 when kind = 0 then concat(
                   encode('HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n', 'UTF-8'),
                   encode(acc, 'ISO-8859-1'))
                 when kind = 1 then encode(
                   concat('<meta charset="iso-8859-1"><p>', acc, '</p>'), 'ISO-8859-1')
                 when kind = 2 then concat(unhex('FFFE'), encode(acc, 'UTF-16LE'))
                 else encode(acc, 'ISO-8859-1')
               end"""))
          .withColumn("ct", expr(
            "case when kind = 3 then 'text/plain; charset=ISO-8859-1' " +
              "else cast(null as string) end"))
          .withColumn("decoded", expr("http_body(decode_payload(payload, ct))"))
          .withColumn("expected", expr(
            """case when kind = 1
                 then concat('<meta charset="iso-8859-1"><p>', acc, '</p>')
                 else acc end"""))
          .selectExpr(
            "doc_id",
            "decoded = expected as decode_ok",
            "cast(length(decoded) as int) as n_chars",
            "http_status(decode_payload(payload, ct)) as status")
          .orderBy("doc_id")
      },
      Some("""
        WITH accd AS (
          SELECT doc_id,
                 replace(replace(replace(text, 'a', 'á'), 'e', 'é'), 'o', 'ø') AS acc
          FROM documents)
        SELECT doc_id,
               TRUE AS decode_ok,
               CAST(len(CASE WHEN doc_id % 4 = 1
                             THEN '<meta charset="iso-8859-1"><p>' || acc || '</p>'
                             ELSE acc END) AS INTEGER) AS n_chars,
               CASE WHEN doc_id % 4 = 0 THEN 200 ELSE NULL END AS status
        FROM accd ORDER BY doc_id"""),
      "Charset-aware payload decode: decode_payload resolves the body " +
        "charset from the message's own Content-Type header, an in-body " +
        "meta sniff, a BOM, or the caller-supplied content type (UTF-8-" +
        "replacement fallback, never throws) — accented bodies encoded " +
        "with Spark's own encode() round-trip exactly; the oracle " +
        "replays the construction.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q247
    Q(
      "q247_bpe_blocked_fit",
      (s, dir) => {
        // PRODUCTION-SCALE BPE: 512 merges via the batched trainer
        // (Bpe.fitBlocked) over word-BIGRAM units — merges cross word
        // boundaries GPT-2-style, and the greedy L/R-rule batch
        // election (accept ab iff a is no accepted RIGHT and b is no
        // accepted LEFT — batch occurrences never overlap) trains 512
        // merges in ~8 driver rounds instead of 512 (each round: one
        // vocab-sized aggregate, one bounded model-row collect, a
        // literal replace fold back into the plan).
        // The oracle replays EVERY round as a generated CTE chain whose
        // greedy walk is a linear recursive CTE — one wrong tie-break,
        // one stale count, or one mis-ordered batch application anywhere
        // in 512 merges scrambles every later round and fails the row.
        val docs = table(s, dir, "documents").select("text")
        val units = graft.operators.Bpe.bigramCounts(docs, "text")
        val m = graft.operators.Bpe.fitBlocked(s, units, "w", "wcnt",
          bpeBlkMerges, bpeBlkRounds, bpeBlkCandCap, bpeBlkAcceptCap)
        m.selectExpr(
            "round",
            s"${bpeBlkSpell("substring(pair, 1, 1)")} as left_sym",
            s"${bpeBlkSpell("substring(pair, 2, 1)")} as right_sym",
            "n")
          .orderBy("round")
      },
      Some(s"""
        WITH $duckBpeBlockedCtes,
        merges AS (
          $duckBpeBlockedMerges)
        SELECT CAST(midx AS INTEGER) AS round,
               ${duckBpeBlkSpell("substring(pair, 1, 1)")} AS left_sym,
               ${duckBpeBlkSpell("substring(pair, 2, 1)")} AS right_sym,
               n
        FROM merges ORDER BY round"""),
      "512-merge batched BPE over word-bigram units: greedy left/right-" +
        "rule batch election (accepted occurrences never overlap, so " +
        "batch apply == sequential apply), ~8 rounds, " +
        "PUA placeholder alphabet; the oracle replays all 24 generated " +
        "rounds with a recursive-CTE greedy walk."),

    // ---------------------------------------------------------------- q248
    Q(
      "q248_bpe_blocked_compression",
      (s, dir) => {
        // The trained 512-merge model APPLIED: fold the full merge list
        // over the original unit table (1-row model broadcast, the
        // shared applyMerges path — proving the batched trainer's output
        // drives the standard appliers unchanged) and audit the
        // wcnt-weighted symbol compression. The oracle recomputes both
        // totals from its own replayed chain's first and last round
        // tables, so trainer AND applier must agree cross-engine.
        val docs = table(s, dir, "documents").select("text")
        val units = graft.operators.Bpe.bigramCounts(docs, "text")
        val m = graft.operators.Bpe.fitBlocked(s, units, "w", "wcnt",
          bpeBlkMerges, bpeBlkRounds, bpeBlkCandCap, bpeBlkAcceptCap)
        val applied = graft.operators.Bpe.applyMerges(units, "w", m, "mw")
        val stats = applied.agg(
          count(lit(1)).cast("long").as("units"),
          sum(expr("wcnt * length(w)")).cast("long").as("syms_before"),
          sum(expr("wcnt * length(mw)")).cast("long").as("syms_after"))
        m.agg(count(lit(1)).cast("long").as("n_merges"))
          .crossJoin(broadcast(stats))
          .selectExpr("n_merges", "units", "syms_before", "syms_after",
            "round(cast(syms_after as double) / cast(syms_before as double), 6) as compression")
      },
      Some(s"""
        WITH $duckBpeBlockedCtes,
        merges AS (
          $duckBpeBlockedMerges)
        SELECT (SELECT CAST(COUNT(1) AS BIGINT) FROM merges) AS n_merges,
               (SELECT CAST(COUNT(1) AS BIGINT) FROM bw0) AS units,
               (SELECT CAST(SUM(wcnt * length(w)) AS BIGINT) FROM bw0) AS syms_before,
               (SELECT CAST(SUM(wcnt * length(w)) AS BIGINT) FROM bw$bpeBlkRounds) AS syms_after,
               round(CAST((SELECT SUM(wcnt * length(w)) FROM bw$bpeBlkRounds) AS DOUBLE)
                     / CAST((SELECT SUM(wcnt * length(w)) FROM bw0) AS DOUBLE), 6) AS compression"""),
      "512-merge model applied back through the shared applyMerges fold " +
        "(1-row broadcast, batch order == training order): wcnt-weighted " +
        "symbol compression audit, oracle-recomputed from the replayed " +
        "chain's first and last round tables.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q249
    Q(
      "q249_http_header",
      (s, dir) => {
        // Generic header extraction — http_header(msg, name) completes
        // the peel trio (q245 status/body): each doc's message carries
        // headers built FROM its own columns (Content-Language = lang,
        // X-Source = source folded across two lines for doc_id % 3 = 0),
        // plus a probe for a header that is never present. The oracle
        // replays the construction: lang/source come straight off the
        // table, fold or not. Map-only, one codegen'd pass per column.
        graft.functions.HttpExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id", "lang", "source")
          .withColumn("msg", expr(
            """concat('HTTP/1.1 200 OK\r\nContent-Language: ', lang,
                 case when doc_id % 3 = 0
                      then concat('\r\nX-Source: ', substring(source, 1, 3),
                                  '\r\n ', substring(source, 4))
                      else concat('\r\nX-Source: ', source) end,
                 '\r\nServer: graft\r\n\r\nbody Content-Language: xx')"""))
          .selectExpr(
            "doc_id",
            "http_header(msg, 'content-language') as content_language",
            "http_header(msg, 'X-Source') as x_source",
            "http_header(msg, 'X-Absent') as x_absent")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               lang AS content_language,
               CASE WHEN doc_id % 3 = 0
                    THEN (substring(source, 1, 3) || ' ' || substring(source, 4))
                    ELSE source END AS x_source,
               CAST(NULL AS VARCHAR) AS x_absent
        FROM documents ORDER BY doc_id"""),
      "Generic HTTP header extraction: http_header resolves names case-" +
        "insensitively from the message head only (body text never " +
        "scanned), joins obs-folded continuations as one SP, and returns " +
        "null for absent headers — the oracle replays the construction."),

    // ---------------------------------------------------------------- q250
    Q(
      "q250_crawl_domain_census",
      (s, dir) => {
        // The crawl dashboard's first query: docs keyed to URLs in four
        // authority shapes (www + .com, subdomain + cc second-level
        // .co.uk + default port, deep subdomain + .org + query, userinfo
        // + .net), then a REGISTERED-DOMAIN census — url_domain collapses
        // host variants to the registration key, url_host counts the
        // distinct crawl hosts inside each. The oracle computes both keys
        // straight from the construction branches (it never parses), so
        // every normalization rule (www/userinfo/port strip, cc
        // second-level keep-three) is locked. One hash aggregate.
        graft.functions.UrlExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id", "source", "cast(doc_id % 4 as int) as kind")
          .withColumn("url", expr(
            """case kind
                 when 0 then concat('https://WWW.', source, '.com/p/', doc_id)
                 when 1 then concat('http://news.', source, '.co.uk:80/a/', doc_id)
                 when 2 then concat('https://cdn.img.', source, '.org/x?id=', doc_id)
                 else concat('http://user:pw@', source, '.net/home')
               end"""))
          .selectExpr("url_domain(url) as domain", "url_host(url) as host")
          .groupBy("domain")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"))
          .orderBy("domain")
      },
      Some("""
        WITH keyed AS (
          SELECT doc_id,
                 CASE doc_id % 4
                   WHEN 0 THEN (source || '.com')
                   WHEN 1 THEN (source || '.co.uk')
                   WHEN 2 THEN (source || '.org')
                   ELSE (source || '.net') END AS domain,
                 CASE doc_id % 4
                   WHEN 0 THEN (source || '.com')
                   WHEN 1 THEN ('news.' || source || '.co.uk')
                   WHEN 2 THEN ('cdn.img.' || source || '.org')
                   ELSE (source || '.net') END AS host
          FROM documents)
        SELECT domain, CAST(COUNT(1) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
        FROM keyed GROUP BY domain ORDER BY domain"""),
      "Registered-domain crawl census: url_domain (registered-domain-" +
        "lite with the cc second-level keep-three rule) and url_host " +
        "(www/userinfo/port strip) collapse four authority shapes to " +
        "their registration keys — the oracle computes the keys from the " +
        "construction branches, locking every normalization rule.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q251
    Q(
      "q251_robots_rules",
      (s, dir) => {
        // robots.txt parsing (RFC 9309) — the crawl-politeness contract:
        // each doc carries a constructed robots file (comment line, a '*'
        // group, a two-agent group with crawl-delay/sitemap, the empty-
        // disallow allow-all idiom, a wildcard+anchor rule). Robots.rules
        // must explode it into one row per (agent, rule): group
        // assembly via per-FILE windows (robots files are tiny — no task
        // ever holds more than one file's lines), multi-agent groups
        // emit per agent, empty disallow vanishes. The oracle replays
        // the construction as UNION ALL row templates.
        val docs = table(s, dir, "documents")
          .selectExpr("doc_id", "source", "cast(doc_id % 7 + 1 as string) as cd")
        val txt = docs.withColumn("txt", expr(
          """concat(
               '# robots for ', source, '\n',
               'User-agent: *\n',
               'Disallow: /private/\n',
               'Allow: /private/', source, '/\n',
               '\n',
               'User-agent: GraftBot\n',
               'User-agent: fetchbot\n',
               'Crawl-delay: ', cd, '\n',
               'Disallow: /tmp/', source, '\n',
               'Allow: /tmp/', source, '/ok\n',
               'Disallow: /*.zip', chr(36), '\n',
               'Disallow:\n',
               'Sitemap: https://', source, '.com/map.xml\n')"""))
        graft.operators.Robots.rules(txt, "doc_id", "txt")
          .orderBy("doc_id", "agent", "rule", "value")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, source, CAST(doc_id % 7 + 1 AS VARCHAR) AS cd FROM documents),
        bots AS (SELECT * FROM (VALUES ('graftbot'), ('fetchbot')) t(agent)),
        rows AS (
          SELECT doc_id, '*' AS agent, 'allow' AS rule,
                 ('/private/' || source || '/') AS value FROM base
          UNION ALL
          SELECT doc_id, '*', 'disallow', '/private/' FROM base
          UNION ALL
          SELECT doc_id, agent, 'allow', ('/tmp/' || source || '/ok') FROM base, bots
          UNION ALL
          SELECT doc_id, agent, 'crawl-delay', cd FROM base, bots
          UNION ALL
          SELECT doc_id, agent, 'disallow', ('/tmp/' || source) FROM base, bots
          UNION ALL
          SELECT doc_id, agent, 'disallow', ('/*.zip' || chr(36)) FROM base, bots
          UNION ALL
          SELECT doc_id, agent, 'sitemap',
                 ('https://' || source || '.com/map.xml') FROM base, bots)
        SELECT doc_id, agent, rule, value,
               CASE WHEN rule IN ('allow', 'disallow')
                    THEN CAST(length(value) AS INTEGER) ELSE 0 END AS pattern_len
        FROM rows ORDER BY doc_id, agent, rule, value"""),
      "robots.txt parsing: RFC 9309 group assembly (consecutive user-" +
        "agent lines share a group, rules emit once per agent), comment " +
        "strip, empty-disallow allow-all idiom, case-insensitive keys — " +
        "per-file windows only; the oracle replays the construction."),

    // ---------------------------------------------------------------- q252
    Q(
      "q252_robots_verdicts",
      (s, dir) => {
        // Crawl-permission verdicts for one bot over six path shapes per
        // host: specific-group precedence (GraftBot has its own group, so
        // the '*' group's /private/ rules must NOT apply), longest-match
        // election (the /tmp allow outranks the shorter disallow),
        // wildcard+anchor matching (*.zip$), and the default-allow. The
        // oracle computes every verdict from the construction branches.
        // Scale: rules join paths host-keyed (equi); election is one
        // max-by-struct aggregate.
        val docs = table(s, dir, "documents")
          .selectExpr("doc_id", "source", "cast(doc_id % 7 + 1 as string) as cd")
        val txt = docs.withColumn("txt", expr(
          """concat(
               'User-agent: *\n',
               'Disallow: /private/\n',
               'Allow: /private/', source, '/\n',
               'User-agent: GraftBot\n',
               'User-agent: fetchbot\n',
               'Crawl-delay: ', cd, '\n',
               'Disallow: /tmp/', source, '\n',
               'Allow: /tmp/', source, '/ok\n',
               'Disallow: /*.zip', chr(36), '\n',
               'Sitemap: https://', source, '.com/map.xml\n')"""))
        val rules = graft.operators.Robots.rules(txt, "doc_id", "txt")
        val paths = docs.select(col("doc_id"),
          explode(expr(
            """array('/private/x',
                     concat('/private/', source, '/page'),
                     concat('/tmp/', source, '/f'),
                     '/open/y',
                     '/files/a.zip',
                     concat('/tmp/', source, '/ok-data'))""")).as("path"))
        graft.operators.Robots
          .verdicts(s, rules, "doc_id", paths, "path", "GraftBot")
          .orderBy("doc_id", "path")
      },
      Some("""
        WITH p AS (
          SELECT doc_id, source, unnest([
            '/private/x',
            '/private/' || source || '/page',
            '/tmp/' || source || '/f',
            '/open/y',
            '/files/a.zip',
            '/tmp/' || source || '/ok-data']) AS path
          FROM documents)
        SELECT doc_id, path,
               (path <> '/files/a.zip' AND path <> ('/tmp/' || source || '/f')) AS allowed,
               CASE WHEN path = '/files/a.zip' THEN ('/*.zip' || chr(36))
                    WHEN path = ('/tmp/' || source || '/f') THEN ('/tmp/' || source)
                    WHEN path = ('/tmp/' || source || '/ok-data')
                      THEN ('/tmp/' || source || '/ok')
                    ELSE NULL END AS matched_pattern
        FROM p ORDER BY doc_id, path"""),
      "robots.txt verdicts: RFC 9309 group selection (bot-specific group " +
        "suppresses '*'), longest-match with allow-on-tie election via " +
        "one max-by-struct aggregate, robots_match '*'/anchor matching, " +
        "default allow — every verdict oracle-computed by construction.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q256
    Q(
      "q256_pii_scrub",
      (s, dir) => {
        // PII redaction — the scrub pass every published pretraining
        // pipeline runs before tokenization: each doc's text gets a
        // constructed contact block (email, E.164-grouped phone, IPv4,
        // a Luhn-VALID card) plus a 16-digit Luhn-INVALID decoy that
        // must survive untouched (it is neither a card nor inside the
        // phone envelope). scrub_pii (native, codegen'd, precompiled
        // patterns, documented rule order EMAIL>IP>CARD>PHONE) must land
        // exactly on the constructed redaction; the oracle replays the
        // construction. Map-only, one pass per row.
        graft.functions.PiiExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id", "text")
          .withColumn("dirty", expr(
            """concat(text, ' contact user', cast(doc_id as string), '@mail',
                 cast(doc_id % 5 as string), '.org or +1 555-01',
                 lpad(cast(doc_id % 100 as string), 2, '0'), '-',
                 lpad(cast(doc_id % 10000 as string), 4, '0'), ' ip 10.',
                 cast(doc_id % 200 as string), '.0.', cast(doc_id % 250 as string),
                 ' card 4242 4242 4242 4242 ref 1234567890123456')"""))
          .withColumn("expected", expr(
            "concat(text, ' contact <EMAIL> or <PHONE> ip <IP> " +
              "card <CARD> ref 1234567890123456')"))
          .selectExpr(
            "doc_id",
            "scrub_pii(dirty) = expected as scrub_ok",
            "cast(length(scrub_pii(dirty)) as int) as n_chars")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        SELECT doc_id,
               TRUE AS scrub_ok,
               CAST(len(text || ' contact <EMAIL> or <PHONE> ip <IP> ' ||
                        'card <CARD> ref 1234567890123456') AS INTEGER) AS n_chars
        FROM documents ORDER BY doc_id"""),
      "PII redaction: scrub_pii replaces emails, valid-octet IPv4s, " +
        "Luhn-verified card numbers and E.164-envelope phones with typed " +
        "placeholders in a documented rule order — the Luhn-invalid " +
        "16-digit decoy survives; the oracle replays the construction."),

    // ---------------------------------------------------------------- q258
    Q(
      "q258_crawl_politeness_budget",
      (s, dir) => {
        // The crawl scheduler's capacity question: given each host's
        // robots crawl-delay for our bot, how many pages/day may the
        // fleet fetch per delay class? Robots.rules parses the per-host
        // files (q251's construction — delay = doc_id % 7 + 1 for the
        // graftbot group), then one aggregate: hosts per delay and the
        // integer pages-per-day budget n_hosts * (86400 div delay). The
        // oracle computes delays straight from the construction. Scale:
        // parse is per-file-windowed; the census is one hash aggregate
        // over host-sized rows.
        val docs = table(s, dir, "documents")
          .selectExpr("doc_id", "source", "cast(doc_id % 7 + 1 as string) as cd")
        val txt = docs.withColumn("txt", expr(
          """concat(
               'User-agent: GraftBot\n',
               'User-agent: fetchbot\n',
               'Crawl-delay: ', cd, '\n',
               'Disallow: /tmp/', source, '\n')"""))
        graft.operators.Robots.rules(txt, "doc_id", "txt")
          .filter(col("agent") === "graftbot" && col("rule") === "crawl-delay")
          .selectExpr("cast(value as int) as crawl_delay")
          .groupBy("crawl_delay")
          .agg(count(lit(1)).as("n_hosts"))
          .selectExpr("crawl_delay", "n_hosts",
            "cast(n_hosts * (86400 div crawl_delay) as bigint) as pages_per_day")
          .orderBy("crawl_delay")
      },
      Some("""
        WITH d AS (SELECT CAST(doc_id % 7 + 1 AS INTEGER) AS crawl_delay FROM documents)
        SELECT crawl_delay, CAST(COUNT(1) AS BIGINT) AS n_hosts,
               CAST(COUNT(1) * (86400 // crawl_delay) AS BIGINT) AS pages_per_day
        FROM d GROUP BY crawl_delay ORDER BY crawl_delay"""),
      "Crawl politeness budget: per-delay host census and integer " +
        "pages-per-day capacity from parsed robots crawl-delay rules — " +
        "the scheduler feed; per-file parse windows, one host-sized " +
        "aggregate, oracle-computed from the construction."),

    // ---------------------------------------------------------------- q259
    Q(
      "q259_blocklist_census",
      (s, dir) => {
        // Multi-phrase blocklist screening — the curation stage that dies
        // on naive spellings: N contains-probes re-scan every doc once
        // per phrase, while blocklist_hits walks an Aho-Corasick
        // automaton built ONCE from the constant list and scans each doc
        // once regardless of blocklist size. The oracle is the NAIVE
        // algorithm (DuckDB list_filter + contains), so this row is a
        // true cross-ALGORITHM check, not a construction replay: the
        // automaton's fail-chain outputs must agree with brute force on
        // every doc. Phrases deliberately overlap ('table' inside
        // 'table value'), cross word boundaries, and include an
        // absent probe. Map-only, one codegen'd pass.
        graft.functions.BlocklistExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id",
            """blocklist_hits(text, array(
                 'table value', 'table', 'spark', 'window', 'merge batch',
                 'key agg', 'zzz-absent')) as n_hits""")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(list_filter(
                 ['table value', 'table', 'spark', 'window', 'merge batch',
                  'key agg', 'zzz-absent'],
                 p -> contains(text, p))) AS INTEGER) AS n_hits
        FROM documents ORDER BY doc_id"""),
      "Blocklist screening: Aho-Corasick distinct-phrase census (one " +
        "text pass at ANY blocklist size, automaton built once from the " +
        "foldable constant) cross-checked against DuckDB's brute-force " +
        "contains filter — a cross-algorithm oracle, phrases overlapping " +
        "and word-boundary-crossing."),

    // ---------------------------------------------------------------- q260
    Q(
      "q260_source_homogeneity",
      (s, dir) => {
        // Chi-square homogeneity between sources over the global top-12
        // words — the "did my corpus mix drift" monitor: are sources
        // drawing from the same word distribution? Counts are exact
        // integers end to end (top-word election by total count with
        // lexicographic ties, per-(source, word) cells, row/column
        // margins); floats enter only in the expected-count division and
        // the final chi-square terms (IEEE-identical). Scale: one corpus
        // explode+count, a 12-row broadcast top-word semi-join, then
        // margin joins on source-sized frames.
        val words = table(s, dir, "documents")
          .select(col("source"), explode(expr("tokenize_text(text)")).as("w"))
        val cells = words.groupBy("source", "w").agg(count(lit(1)).as("n"))
        val top = cells.groupBy("w").agg(sum("n").as("wtot"))
          .orderBy(col("wtot").desc, col("w")).limit(12)
        val kept = cells.join(broadcast(top), Seq("w"))
        val rowTot = kept.groupBy("source").agg(sum("n").as("stot"))
        val grand = kept.agg(sum("n").as("gtot"))
        kept
          .join(rowTot, Seq("source"))
          .crossJoin(broadcast(grand))
          .selectExpr("source", "w", "n",
            """pow(cast(n as double)
                   - cast(stot as double) * cast(wtot as double) / cast(gtot as double), 2)
               / (cast(stot as double) * cast(wtot as double) / cast(gtot as double))
               as term""")
          .groupBy("source")
          .agg(count(lit(1)).as("n_cells"),
            sum(expr("cast(round(term, 9) as decimal(28,12))")).as("terms"))
          .selectExpr("source", "n_cells",
            "round(cast(terms as double), 6) as chi2_part")
          .orderBy("source")
      },
      Some("""
        WITH cells AS (
          SELECT source, w, CAST(COUNT(1) AS BIGINT) AS n
          FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY source, w),
        top AS (
          SELECT w, SUM(n) AS wtot FROM cells GROUP BY w
          ORDER BY wtot DESC, w LIMIT 12),
        kept AS (SELECT c.source, c.w, c.n, t.wtot FROM cells c JOIN top t USING (w)),
        rowtot AS (SELECT source, SUM(n) AS stot FROM kept GROUP BY source),
        grand AS (SELECT SUM(n) AS gtot FROM kept)
        SELECT k.source,
               CAST(COUNT(1) AS BIGINT) AS n_cells,
               round(CAST(SUM(CAST(round(
                 pow(CAST(k.n AS DOUBLE)
                     - CAST(r.stot AS DOUBLE) * CAST(k.wtot AS DOUBLE) / CAST(g.gtot AS DOUBLE), 2)
                 / (CAST(r.stot AS DOUBLE) * CAST(k.wtot AS DOUBLE) / CAST(g.gtot AS DOUBLE)), 9)
                 AS DECIMAL(28,12))) AS DOUBLE), 6) AS chi2_part
        FROM kept k JOIN rowtot r USING (source) CROSS JOIN grand g
        GROUP BY k.source ORDER BY k.source"""),
      "Source-homogeneity chi-square over the global top-12 words: exact " +
        "integer cells and margins, IEEE expected-count terms summed " +
        "through round-then-DECIMAL — the corpus-mix drift monitor " +
        "beside q219's PSI and q241's Mann-Kendall.")
  ) ++ Seq(

    // ---------------------------------------------------------------- q262
    Q(
      "q262_contrastive_negatives",
      (s, dir) => {
        // Contrastive negative sampling — per anchor doc, 4 deterministic
        // pseudo-random negatives from OTHER sources, WITHOUT an anchors
        // x corpus product: salted md5 buckets bound each anchor's
        // candidate set to ~rows/32 (one equi-join on the bucket key),
        // pair-salted hashes elect the winners. Same salt → same sample
        // under any partitioning (spec-locked); the oracle replays the
        // identical hash arithmetic. The training-pair generator every
        // contrastive/embedding pipeline needs.
        val docs = table(s, dir, "documents").select("doc_id", "source")
        graft.operators.Mixture
          .hashBucketNegatives(docs, "doc_id", "source",
            k = 4, buckets = 32, salt = "q262")
          .orderBy("doc_id", "rank")
      },
      Some("""
        WITH b AS (
          SELECT doc_id, source,
                 CAST('0x' || substr(md5('q262:bkt:' || CAST(doc_id AS VARCHAR)), 1, 12)
                   AS BIGINT) % 32 AS bk
          FROM documents)
        SELECT doc_id, rank, neg_doc_id, neg_group FROM (
          SELECT a.doc_id,
                 CAST(row_number() OVER (PARTITION BY a.doc_id ORDER BY
                   CAST('0x' || substr(md5(concat('q262:pair:',
                     CAST(a.doc_id AS VARCHAR), ':',
                     CAST(c.doc_id AS VARCHAR))), 1, 12) AS BIGINT),
                   c.doc_id) AS INTEGER) AS rank,
                 c.doc_id AS neg_doc_id,
                 c.source AS neg_group
          FROM b a JOIN b c ON a.bk = c.bk AND a.source <> c.source) t
        WHERE rank <= 4 ORDER BY doc_id, rank"""),
      "Contrastive negative sampling: salted-hash buckets bound each " +
        "anchor's candidates (never all-pairs), pair-salted hash election " +
        "with id tie-break — deterministic under any partitioning; the " +
        "oracle replays the exact hash arithmetic."),

    // ---------------------------------------------------------------- q263
    Q(
      "q263_unicode_normalize",
      (s, dir) => {
        // Unicode normalization over a constructed multilingual corpus:
        // every doc gets a deterministic suffix by doc_id % 4 — an NFD
        // spelling ("cafe" + U+0301), NFKC-foldable compatibility chars
        // (U+FB01 ligature fi, U+FF21 fullwidth A), a CJK fixed point, or
        // nothing — then unicode_normalize produces NFC and NFKC forms.
        // The oracle checks NFC against DuckDB's own nfc_normalize and
        // NFKC against the construction-replayed expected literals (md5
        // of the full string, not just lengths). Map-only codegen'd pass;
        // the capability every visually-identical-spelling dedup bug at
        // crawl scale traces back to.
        graft.functions.UnicodeExpressions.register(s)
        val sfx = when(col("doc_id") % 4 === 0, lit(" cafe\u0301"))
          .when(col("doc_id") % 4 === 1, lit(" \ufb01le \uff21"))
          .when(col("doc_id") % 4 === 2, lit(" \u6f22\u5b57"))
          .otherwise(lit(""))
        table(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), sfx).as("t"))
          .withColumn("nfc", expr("unicode_normalize(t, 'NFC')"))
          .withColumn("nfkc", expr("unicode_normalize(t, 'NFKC')"))
          .selectExpr("doc_id", "length(t) as len_raw", "length(nfc) as len_nfc",
            "length(nfkc) as len_nfkc", "md5(nfkc) as nfkc_hash",
            "nfc <> t as changed_nfc")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        WITH raw AS (
          SELECT doc_id,
                 text || CASE CAST(doc_id % 4 AS INTEGER)
                   WHEN 0 THEN ' cafe' || chr(769)
                   WHEN 1 THEN ' ' || chr(64257) || 'le ' || chr(65313)
                   WHEN 2 THEN ' ' || chr(28450) || chr(23383)
                   ELSE '' END AS t,
                 text || CASE CAST(doc_id % 4 AS INTEGER)
                   WHEN 0 THEN ' caf' || chr(233)
                   WHEN 1 THEN ' file A'
                   WHEN 2 THEN ' ' || chr(28450) || chr(23383)
                   ELSE '' END AS nfkc_expected
          FROM documents)
        SELECT doc_id,
               CAST(length(t) AS INTEGER) AS len_raw,
               CAST(length(nfc_normalize(t)) AS INTEGER) AS len_nfc,
               CAST(length(nfkc_expected) AS INTEGER) AS len_nfkc,
               md5(nfkc_expected) AS nfkc_hash,
               nfc_normalize(t) <> t AS changed_nfc
        FROM raw ORDER BY doc_id"""),
      "unicode_normalize NFC/NFKC over a constructed NFD + compatibility-" +
        "char + CJK corpus: NFC cross-checked against DuckDB's " +
        "nfc_normalize, NFKC against construction-replayed expected " +
        "strings (full md5) — codegen'd map-only pass."),

    // ---------------------------------------------------------------- q264
    Q(
      "q264_tokenize_text",
      (s, dir) => {
        // Script-aware tokenization over a constructed mixed-script
        // corpus: by doc_id % 3 each doc gains an unspaced CJK tail
        // (5 codepoints -> 4 character bigrams), a mixed Latin-CJK run
        // ("abc"+CJK+"def" -> 3 tokens), or nothing. tokenize_text's
        // documented grammar (whitespace runs for spaced scripts, char
        // bigrams for CJK segments) is locked by an md5 over the ENTIRE
        // joined token stream per doc — the oracle replays whitespace
        // tokens with string_split and the CJK expansion with explicit
        // expected bigram lists. Map-only codegen'd pass; this grammar
        // is what wordCounts/shingles now route through.
        graft.functions.UnicodeExpressions.register(s)
        val sfx = when(col("doc_id") % 3 === 0,
            lit(" \u6f22\u5b57\u30c6\u30b9\u30c8"))
          .when(col("doc_id") % 3 === 1, lit(" abc\u6f22\u5b57def"))
          .otherwise(lit(""))
        table(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), sfx).as("t"))
          .withColumn("toks", expr("tokenize_text(t)"))
          .selectExpr("doc_id", "size(toks) as n_toks",
            "element_at(toks, -1) as last_tok",
            "md5(array_join(toks, chr(30))) as tok_hash")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        WITH dt AS (
          SELECT doc_id, string_split(text, ' ') AS ws,
                 CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN [chr(28450) || chr(23383), chr(23383) || chr(12486),
                                chr(12486) || chr(12473), chr(12473) || chr(12488)]
                   WHEN 1 THEN ['abc', chr(28450) || chr(23383), 'def']
                   ELSE [] END AS extra
          FROM documents),
        toks AS (SELECT doc_id, list_concat(ws, extra) AS tk FROM dt)
        SELECT doc_id,
               CAST(len(tk) AS INTEGER) AS n_toks,
               tk[len(tk)] AS last_tok,
               md5(array_to_string(tk, chr(30))) AS tok_hash
        FROM toks ORDER BY doc_id"""),
      "tokenize_text grammar locked end-to-end: whitespace tokens + CJK " +
        "character bigrams on a constructed mixed-script corpus, md5 over " +
        "the full token stream; oracle replays the documented expansion " +
        "explicitly."),

    // ---------------------------------------------------------------- q265
    Q(
      "q265_bpe_int_fit",
      (s, dir) => {
        // GPT-CLASS VOCABULARY: 8192 BPE merges via the INT-SYMBOL
        // batched trainer (BpeInt.fitBlocked) over word-4-gram units of
        // a fixed 500-doc sample (tokenizer training is sample-based in
        // production — the sample is identical at every SF, so the
        // model cost is SF-invariant). Int symbols (merge k = 0x110000
        // + k - 1) remove the single-character-placeholder ceiling the
        // PUA trainer had, and the whole model rides ONE bpe_encode
        // spec literal — plan size O(1) in merge count instead of an
        // 8192-deep replace fold. ~16 L/R-rule election rounds (accept
        // (a,b) iff a is no accepted RIGHT and b is no accepted LEFT —
        // batch occurrences then never overlap, so batch == sequential;
        // the rnd column logs them); the oracle replays EVERY round:
        // candidate ranking, the greedy L/R walk (a list_reduce fold
        // carrying used-left and used-right sets), and the batch
        // application as a window-parity pass over unnested positions.
        // One wrong tie-break anywhere in 8192 merges scrambles every
        // later round and fails the row.
        val docs = table(s, dir, "documents")
          .filter(col("doc_id") < 500).select("text")
        val units = graft.operators.BpeInt.fourgramCounts(docs, "text")
        graft.operators.BpeInt.fitBlocked(s, units, "w", "wcnt",
          bpeIntMerges, bpeIntRounds, bpeIntCandCap, bpeIntAcceptCap)
          .orderBy("midx")
      },
      Some(s"""
        WITH $duckBpeIntCtes
        SELECT midx, rnd, a, b, id, n FROM (
          $duckBpeIntMerges
        ) ORDER BY midx"""),
      "8192-merge int-symbol batched BPE over word-4-gram units: " +
        "unbounded-id representation (no placeholder alphabet), one-" +
        "expression model application, greedy left/right-rule batches; " +
        "the oracle replays all generated rounds — fold-walk election " +
        "and window-parity batch apply — exactly."),

    // ---------------------------------------------------------------- q266
    Q(
      "q266_bpe_int_compression",
      (s, dir) => {
        // The trained 8192-merge model APPLIED: re-encode the unit
        // table under the final spec (one bpe_encode expression — the
        // map-only application path) and report corpus compression:
        // weighted symbol counts before/after, merges used, rounds
        // used. The oracle recomputes the same stats from its replayed
        // final table state — agreement proves the single-expression
        // apply equals the round-by-round table mutation end to end.
        graft.functions.BpeIntExpressions.register(s)
        val docs = table(s, dir, "documents")
          .filter(col("doc_id") < 500).select("text")
        val units = graft.operators.BpeInt.fourgramCounts(docs, "text")
          .localCheckpoint(true)
        val m = graft.operators.BpeInt.fitBlocked(s, units, "w", "wcnt",
          bpeIntMerges, bpeIntRounds, bpeIntCandCap, bpeIntAcceptCap)
        val spec = graft.operators.BpeInt.specOf(m)
        val stats = m.agg(count(lit(1)).cast("int").as("merges"),
          max("rnd").as("rounds"))
        units
          .withColumn("syms", expr(s"bpe_encode(w, '$spec')"))
          .agg(
            count(lit(1)).as("n_units"),
            sum(expr("wcnt * length(w)")).as("base_syms"),
            sum(expr("wcnt * size(syms)")).as("enc_syms"))
          .crossJoin(broadcast(stats))
          .selectExpr("n_units", "base_syms", "enc_syms",
            "round(cast(enc_syms as double) / cast(base_syms as double), 6) as ratio",
            "merges", "rounds")
      },
      Some(s"""
        WITH $duckBpeIntCtes,
        stats AS (
          SELECT CAST(COUNT(*) AS INTEGER) AS merges,
                 CAST(MAX(rnd) AS INTEGER) AS rounds
          FROM ($duckBpeIntMerges)),
        base AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                 CAST(SUM(wcnt * length(g)) AS BIGINT) AS base_syms
          FROM bw0),
        enc AS (
          SELECT CAST(SUM(wcnt * len(syms)) AS BIGINT) AS enc_syms
          FROM bw$bpeIntRounds)
        SELECT n_units, base_syms, enc_syms,
               round(CAST(enc_syms AS DOUBLE) / CAST(base_syms AS DOUBLE), 6) AS ratio,
               merges, rounds
        FROM base, enc, stats"""),
      "The 8192-merge int-symbol model applied as one bpe_encode " +
        "expression: corpus compression stats vs the oracle's replayed " +
        "final table state — single-expression apply == round-by-round " +
        "mutation."),

    // ---------------------------------------------------------------- q267
    Q(
      "q267_url_domain_psl",
      (s, dir) => {
        // q250's registered-domain census with the PUBLIC-SUFFIX TABLE
        // active: five constructed authority shapes exercise the three
        // PSL rule kinds — a PRIVATE suffix (github.io: the user label
        // is the registration key, which the LITE last-two-labels rule
        // gets wrong), classic cc second-levels (co.uk, com.au), a
        // wildcard rule (*.ck: every label under .ck is itself a public
        // suffix), and an exception rule (!city.ck carved back out of
        // the wildcard). The rules ride the expression as one foldable
        // literal (parsed once, addReferenceObj — never per row). The
        // oracle computes the expected keys straight from the
        // construction branches, locking the published PSL algorithm:
        // exception beats wildcard beats longest-plain beats default.
        graft.functions.UrlExpressions.register(s)
        val rules = "uk;co.uk;au;com.au;io;github.io;com;net;org;ck;*.ck;!city.ck"
        table(s, dir, "documents")
          .selectExpr("doc_id", "source", "cast(doc_id % 5 as int) as kind")
          .withColumn("url", expr(
            """case kind
                 when 0 then concat('https://WWW.', source, '.github.io/blog/', doc_id)
                 when 1 then concat('http://news.', source, '.co.uk:80/a/', doc_id)
                 when 2 then concat('https://a.b.', source, '.com.au/x?id=', doc_id)
                 when 3 then concat('http://shop.', source, '.ck/x')
                 else concat('http://sub', cast(doc_id % 3 as string), '.city.ck/p')
               end"""))
          .selectExpr(s"url_domain(url, '$rules') as domain", "url_host(url) as host")
          .groupBy("domain")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"))
          .orderBy("domain")
      },
      Some("""
        WITH keyed AS (
          SELECT doc_id,
                 CASE doc_id % 5
                   WHEN 0 THEN (source || '.github.io')
                   WHEN 1 THEN (source || '.co.uk')
                   WHEN 2 THEN (source || '.com.au')
                   WHEN 3 THEN ('shop.' || source || '.ck')
                   ELSE 'city.ck' END AS domain,
                 CASE doc_id % 5
                   WHEN 0 THEN (source || '.github.io')
                   WHEN 1 THEN ('news.' || source || '.co.uk')
                   WHEN 2 THEN ('a.b.' || source || '.com.au')
                   WHEN 3 THEN ('shop.' || source || '.ck')
                   ELSE ('sub' || CAST(doc_id % 3 AS VARCHAR) || '.city.ck') END AS host
          FROM documents)
        SELECT domain, CAST(COUNT(1) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
        FROM keyed GROUP BY domain ORDER BY domain"""),
      "PSL-driven registered-domain census: private suffix (github.io), " +
        "cc second-levels, wildcard (*.ck) and exception (!city.ck) " +
        "rules over five constructed authority shapes — the oracle " +
        "replays the construction, locking the published PSL precedence."),

    // ---------------------------------------------------------------- q268
    Q(
      "q268_pii_precision_audit",
      (s, dir) => {
        // MEASURED scrubber precision/recall (the q97 audit discipline
        // applied to scrub_pii): six positive plants (email, IP, Luhn-
        // valid card, mod-97-valid IBAN, issuable SSN, issuable NINO,
        // diverse secret) paired with checksum/shape-invalid DECOYS
        // (Luhn-invalid card, mod-97-invalid IBAN, never-issued SSN and
        // NINO shapes, low-diversity filler token) — every doc gets one
        // plant by doc_id % 12, the scrubbed output is compared byte-
        // for-byte to the constructed expectation, and the audit emits
        // exact caught/deviation counts plus an md5 over the full
        // scrubbed byte stream per kind. The oracle constructs the
        // expected outputs itself, so ANY false positive (a decoy
        // touched) or false negative (a plant missed) breaks a count
        // and the hash. Map-only + one hash aggregate.
        graft.functions.PiiExpressions.register(s)
        val plant = expr(
          """case cast(doc_id % 12 as int)
               when 0  then concat('u', cast(doc_id as string), '@ex.org')
               when 1  then concat('10.', cast(doc_id % 200 as string), '.3.4')
               when 2  then '4111 1111 1111 1111'
               when 3  then '4111 1111 1111 1112'
               when 4  then 'GB82 WEST 1234 5698 7654 32'
               when 5  then 'GB82 WEST A234 5698 WXYZ 33'
               when 6  then '123-45-6789'
               when 7  then '666-45-6789'
               when 8  then 'AB123456C'
               when 9  then 'DA123456C'
               when 10 then 'sk4live8Xp2Qz7Rb1Nm6Vc3Jd9'
               else         'aaaaaaaaaaaaaaaaaaaaa1Ab'
             end""")
        val expected = expr(
          """case cast(doc_id % 12 as int)
               when 0  then '<EMAIL>'
               when 1  then '<IP>'
               when 2  then '<CARD>'
               when 3  then '4111 1111 1111 1112'
               when 4  then '<IBAN>'
               when 5  then 'GB82 WEST A234 5698 WXYZ 33'
               when 6  then '<SSN>'
               when 7  then '666-45-6789'
               when 8  then '<NINO>'
               when 9  then 'DA123456C'
               when 10 then '<SECRET>'
               else         'aaaaaaaaaaaaaaaaaaaaa1Ab'
             end""")
        table(s, dir, "documents")
          .selectExpr("doc_id", "text", "cast(doc_id % 12 as int) as kind")
          .withColumn("dirty", concat(col("text"), lit(" "), plant))
          .withColumn("want", concat(col("text"), lit(" "), expected))
          .withColumn("got", expr("scrub_pii(dirty)"))
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("got") === col("want"), 1L).otherwise(0L)).as("n_exact"),
            expr("md5(concat_ws(chr(30), sort_array(collect_list(got))))").as("out_hash"))
          .withColumn("expectation",
            when(col("kind").isin(3, 5, 7, 9, 11), lit("keep")).otherwise(lit("scrub")))
          .select("kind", "expectation", "n_docs", "n_exact", "out_hash")
          .orderBy("kind")
      },
      Some("""
        WITH plants AS (
          SELECT doc_id, CAST(doc_id % 12 AS INTEGER) AS kind,
                 text || ' ' ||
                 CASE doc_id % 12
                   WHEN 0  THEN '<EMAIL>'
                   WHEN 1  THEN '<IP>'
                   WHEN 2  THEN '<CARD>'
                   WHEN 3  THEN '4111 1111 1111 1112'
                   WHEN 4  THEN '<IBAN>'
                   WHEN 5  THEN 'GB82 WEST A234 5698 WXYZ 33'
                   WHEN 6  THEN '<SSN>'
                   WHEN 7  THEN '666-45-6789'
                   WHEN 8  THEN '<NINO>'
                   WHEN 9  THEN 'DA123456C'
                   WHEN 10 THEN '<SECRET>'
                   ELSE         'aaaaaaaaaaaaaaaaaaaaa1Ab'
                 END AS want
          FROM documents)
        SELECT kind,
               CASE WHEN kind IN (3, 5, 7, 9, 11) THEN 'keep' ELSE 'scrub' END AS expectation,
               CAST(COUNT(1) AS BIGINT) AS n_docs,
               CAST(COUNT(1) AS BIGINT) AS n_exact,
               md5(string_agg(want, chr(30) ORDER BY want)) AS out_hash
        FROM plants GROUP BY kind ORDER BY kind"""),
      "Planted-corpus scrubber audit with checksum-invalid decoys: exact " +
        "caught/kept counts and a full-output md5 per plant kind — the " +
        "oracle constructs every expected output, so any false positive " +
        "or miss breaks the row; measured precision, not construction " +
        "replay of positives alone."),

    // ---------------------------------------------------------------- q269
    Q(
      "q269_crawl_frontier",
      (s, dir) => {
        // THE CRAWL SCHEDULER'S FEED — the composed per-host fetch
        // schedule a frontier actually consumes, replaying three
        // independently-verified stages in one query: registered-domain
        // keys (q250's url_host/url_domain), RFC 9309 permission
        // verdicts for our bot over the six probe paths (q252's
        // construction: specific-group precedence, longest-match,
        // wildcard+anchor), and the politeness capacity from the parsed
        // crawl-delay (q258). One row per host: its domain rollup key,
        // delay, allowed-path census, integer pages/day capacity, and
        // the integer days-to-drain for its backlog. Scale: per-FILE
        // robots windows, host-keyed equi-joins, one aggregate — no
        // stage differs from its standalone plan-locked shape.
        graft.functions.UrlExpressions.register(s)
        val docs = table(s, dir, "documents")
          .selectExpr("doc_id", "source", "cast(doc_id % 7 + 1 as string) as cd")
        val txt = docs.withColumn("txt", expr(
          """concat(
               'User-agent: *\n',
               'Disallow: /private/\n',
               'Allow: /private/', source, '/\n',
               'User-agent: GraftBot\n',
               'User-agent: fetchbot\n',
               'Crawl-delay: ', cd, '\n',
               'Disallow: /tmp/', source, '\n',
               'Allow: /tmp/', source, '/ok\n',
               'Disallow: /*.zip', chr(36), '\n',
               'Sitemap: https://', source, '.com/map.xml\n')"""))
        val rules = graft.operators.Robots.rules(txt, "doc_id", "txt")
          .localCheckpoint(true)
        val delays = rules
          .filter(col("agent") === "graftbot" && col("rule") === "crawl-delay")
          .selectExpr("doc_id", "cast(value as int) as crawl_delay")
        val paths = docs.select(col("doc_id"),
          explode(expr(
            """array('/private/x',
                     concat('/private/', source, '/page'),
                     concat('/tmp/', source, '/f'),
                     '/open/y',
                     '/files/a.zip',
                     concat('/tmp/', source, '/ok-data'))""")).as("path"))
        val allowed = graft.operators.Robots
          .verdicts(s, rules, "doc_id", paths, "path", "GraftBot")
          .groupBy("doc_id")
          .agg(sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"))
        docs
          .withColumn("url", expr(
            "concat('https://www.h', cast(doc_id as string), '.', source, '.co.uk/x')"))
          .selectExpr("doc_id", "url_host(url) as host", "url_domain(url) as domain")
          .join(delays, Seq("doc_id"))
          .join(allowed, Seq("doc_id"))
          .withColumn("pages_per_day", expr("cast(86400 div crawl_delay as bigint)"))
          .withColumn("backlog_pages", expr("cast((doc_id % 100 + 1) * 100 as int)"))
          .withColumn("fetch_days", expr(
            "cast((backlog_pages * crawl_delay + 86399) div 86400 as bigint)"))
          .select("doc_id", "host", "domain", "crawl_delay", "n_allowed",
            "pages_per_day", "backlog_pages", "fetch_days")
          .orderBy("doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(doc_id % 7 + 1 AS INTEGER) AS crawl_delay,
                 'h' || CAST(doc_id AS VARCHAR) || '.' || source || '.co.uk' AS host,
                 source || '.co.uk' AS domain
          FROM documents)
        SELECT doc_id, host, domain, crawl_delay,
               CAST(4 AS BIGINT) AS n_allowed,
               CAST(86400 // crawl_delay AS BIGINT) AS pages_per_day,
               CAST((doc_id % 100 + 1) * 100 AS INTEGER) AS backlog_pages,
               CAST(((doc_id % 100 + 1) * 100 * crawl_delay + 86399) // 86400 AS BIGINT) AS fetch_days
        FROM d ORDER BY doc_id"""),
      "Composed crawl-frontier feed: url_host/url_domain keys + RFC 9309 " +
        "verdicts (4 of the 6 probes allowed for GraftBot by the " +
        "construction) + crawl-delay capacity and integer days-to-drain " +
        "— the operational artifact a scheduler consumes, every stage " +
        "replaying its standalone-verified shape."),

    // ---------------------------------------------------------------- q270
    Q(
      "q270_multilingual_neardup",
      (s, dir) => {
        // The round's motivating failure, fixed end-to-end: every 20th
        // doc gains a TWIN whose text is VISUALLY IDENTICAL but spelled
        // NFD (combining acute) where the original is NFC, both carrying
        // an unspaced CJK sentence. The dedup path — unicode_normalize
        // NFC, then MinHash-LSH candidates over tokenize_text's grammar
        // (CJK character bigrams) — must (a) produce IDENTICAL shingle
        // streams for the pair under normalization, (b) DIFFERING
        // streams without it (proving normalization is load-bearing,
        // not decorative), and (c) surface the pair as an LSH candidate
        // (identical tokens => identical signatures => same buckets).
        // The oracle states all three from the construction.
        graft.functions.UnicodeExpressions.register(s)
        val docs = table(s, dir, "documents").select("doc_id", "text")
        val sfxNfc = " caf\u00e9 \u6f22\u5b57\u30c6\u30b9\u30c8 end"
        val sfxNfd = " cafe\u0301 \u6f22\u5b57\u30c6\u30b9\u30c8 end"
        val base = docs.select(col("doc_id"), concat(col("text"), lit(sfxNfc)).as("t"))
        val twins = docs.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 5000000L).as("doc_id"),
            concat(col("text"), lit(sfxNfd)).as("t"))
        val corpus = base.unionByName(twins)
          .withColumn("norm", expr("unicode_normalize(t, 'NFC')"))
          .localCheckpoint(true)
        val paired = graft.operators.Dedup
          .minhashLshCandidates(s, corpus, "doc_id", "norm")
          .filter(col("id_b") - col("id_a") === 5000000L)
          .select(col("id_a").as("doc_id"), lit(true).as("lsh_paired"))
        val sh = corpus.selectExpr("doc_id",
          "array_sort(transform(sequence(1, size(tokenize_text(norm)) - 2), " +
            "i -> concat_ws(' ', slice(tokenize_text(norm), i, 3)))) as shn",
          "array_sort(transform(sequence(1, size(tokenize_text(t)) - 2), " +
            "i -> concat_ws(' ', slice(tokenize_text(t), i, 3)))) as shr")
        sh.filter(col("doc_id") < 5000000L && col("doc_id") % 20 === 0)
          .join(sh.selectExpr("doc_id - 5000000 as doc_id",
            "shn as shn2", "shr as shr2"), Seq("doc_id"))
          .join(paired, Seq("doc_id"))
          .selectExpr("doc_id",
            "shn = shn2 as identical_normalized",
            "shr = shr2 as identical_raw",
            "lsh_paired")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, TRUE AS identical_normalized, FALSE AS identical_raw,
               TRUE AS lsh_paired
        FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id"""),
      "Multilingual near-dup end to end: NFC/NFD twins with unspaced CJK " +
        "— identical shingle streams under unicode_normalize + " +
        "tokenize_text (and provably NOT without normalization), and the " +
        "pair surfaces through the production MinHash-LSH path; the " +
        "oracle states the construction."),

    // ---------------------------------------------------------------- q271
    Q(
      "q271_script_census",
      (s, dir) => {
        // Per-document SCRIPT composition — the routing signal a
        // multilingual pipeline computes before choosing tokenizer,
        // quality model and dedup grammar: codepoint counts by class
        // (CJK ranges = tokenize_text's documented set, digits, Latin
        // letters) over a constructed mixed-script corpus, with an
        // integer-arithmetic routing label (20*n_cjk >= n_cp, i.e. the
        // 5% gate — no float threshold to drift cross-engine). The
        // Spark side counts through real Unicode regex classes; the
        // oracle recomputes every count ARITHMETICALLY from the
        // construction (the fixture text is pure lowercase ASCII —
        // verified — so each suffix's contribution is a constant).
        // Map-only codegen'd pass.
        val sfx = when(col("doc_id") % 4 === 0,
            lit(" \u6f22\u5b57\u30c6\u30b9\u30c8\u65e5\u672c\u8a9e\u306e\u6587"))
          .when(col("doc_id") % 4 === 1, lit(" abc\u6f22\u5b57123"))
          .when(col("doc_id") % 4 === 2, lit(" 4111 code 99"))
          .otherwise(lit(""))
        val cjkClass = "[\\u3040-\\u30ff\\u3400-\\u4dbf\\u4e00-\\u9fff" +
          "\\uac00-\\ud7af\\uf900-\\ufaff]"
        table(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), sfx).as("t"))
          .withColumn("n_cp", expr("cast(length(t) as int)"))
          .withColumn("n_cjk", expr(
            s"cast(length(t) - length(regexp_replace(t, '$cjkClass', '')) as int)"))
          .withColumn("n_digit", expr(
            "cast(length(t) - length(regexp_replace(t, '[0-9]', '')) as int)"))
          .withColumn("n_latin", expr(
            "cast(length(regexp_replace(t, '[^a-zA-Z]', '')) as int)"))
          .selectExpr("doc_id", "n_cp", "n_cjk", "n_digit", "n_latin",
            "round(cast(n_cjk as double) / cast(n_cp as double), 6) as cjk_frac",
            "case when 20 * n_cjk >= n_cp then 'mixed-cjk' else 'latin' end as route")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CAST(length(text) +
                   CASE doc_id % 4 WHEN 0 THEN 11 WHEN 1 THEN 9 WHEN 2 THEN 13
                     ELSE 0 END AS INTEGER) AS n_cp,
                 CAST(CASE doc_id % 4 WHEN 0 THEN 10 WHEN 1 THEN 2
                   ELSE 0 END AS INTEGER) AS n_cjk,
                 CAST(CASE doc_id % 4 WHEN 1 THEN 3 WHEN 2 THEN 6
                   ELSE 0 END AS INTEGER) AS n_digit,
                 CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) +
                   CASE doc_id % 4 WHEN 1 THEN 3 WHEN 2 THEN 4
                     ELSE 0 END AS INTEGER) AS n_latin
          FROM documents)
        SELECT doc_id, n_cp, n_cjk, n_digit, n_latin,
               round(CAST(n_cjk AS DOUBLE) / CAST(n_cp AS DOUBLE), 6) AS cjk_frac,
               CASE WHEN 20 * n_cjk >= n_cp THEN 'mixed-cjk' ELSE 'latin' END AS route
        FROM d ORDER BY doc_id"""),
      "Script census for multilingual routing: per-doc codepoint counts " +
        "by class over a constructed mixed-script corpus — Spark counts " +
        "through real Unicode regex classes, the oracle recomputes " +
        "arithmetically from the construction; integer 5% routing gate.",
    ),

    // ---------------------------------------------------------------- q272
    Q(
      "q272_sentence_census",
      (s, dir) => {
        // SENTENCE SEGMENTATION — the unit every boilerplate /
        // sentence-dedup pipeline stage works on. split_sentences is a
        // native codegen'd expression under a documented two-pass
        // grammar chosen to be EXACTLY replayable by two RE2
        // regexp_replace passes (ASCII terminators need trailing
        // whitespace — decimals/domains never split; CJK terminators
        // split unconditionally; closers attach left; empties drop).
        // Constructed corpus: four tail variants exercise terminator
        // runs, closers, missing-terminator tails and unspaced CJK.
        // Locked per doc by an md5 over the ENTIRE sentence stream —
        // one boundary off anywhere fails the row. Map-only pass.
        graft.functions.UnicodeExpressions.register(s)
        table(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), sentenceTail).as("t"))
          .withColumn("sents", expr("split_sentences(t)"))
          .selectExpr("doc_id",
            "cast(size(sents) as int) as n_sent",
            "cast(length(element_at(sents, 1)) as int) as first_len",
            "element_at(sents, -1) as last_sent",
            "md5(array_join(sents, chr(30))) as sent_hash")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some(s"""
        WITH d AS (
          $duckSentenceCorpus),
        sx AS (SELECT doc_id, ${duckSplitSentences("t")} AS sents FROM d)
        SELECT doc_id,
               CAST(len(sents) AS INTEGER) AS n_sent,
               CAST(length(sents[1]) AS INTEGER) AS first_len,
               sents[len(sents)] AS last_sent,
               md5(array_to_string(sents, chr(30))) AS sent_hash
        FROM sx ORDER BY doc_id"""),
      "split_sentences grammar locked end-to-end: native two-pass " +
        "segmentation (ASCII terminators need whitespace, CJK split " +
        "unconditionally, closers attach) vs the oracle's literal two-" +
        "regexp_replace replay; md5 over the full per-doc stream."),

    // ---------------------------------------------------------------- q273
    Q(
      "q273_sentence_boilerplate",
      (s, dir) => {
        // C4-STYLE SENTENCE BOILERPLATE REMOVAL: a sentence appearing in
        // >= 5 distinct docs is boilerplate (nav chrome, license lines —
        // here the constructed shared tails); per doc report kept/
        // removed counts, the retained-character fraction and an md5
        // over the KEPT stream in original order — the artifact a
        // curation stage actually emits. Scale: sentence-df is one
        // shuffle with map-side combine; the boilerplate set is bounded
        // by corpus_size/df so it BROADCASTS back (no second wide
        // shuffle); per-doc order is restored from carried positions,
        // never from collect order.
        graft.functions.UnicodeExpressions.register(s)
        val sent = table(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), sentenceTail).as("t"))
          .select(col("doc_id"),
            posexplode(expr("split_sentences(t)")).as(Seq("pos", "sent")))
        val boiler = sent.groupBy("sent")
          .agg(countDistinct(col("doc_id")).as("sdf"))
          .filter(col("sdf") >= 5)
        sent.join(broadcast(boiler), Seq("sent"), "left")
          .withColumn("boiler", col("sdf").isNotNull)
          .groupBy("doc_id")
          .agg(
            count(lit(1)).cast("int").as("n_sent"),
            sum(when(col("boiler"), 1L).otherwise(0L)).cast("int").as("n_boiler"),
            sum(when(col("boiler"), 0L)
              .otherwise(length(col("sent")).cast("long"))).as("kept_chars"),
            sum(length(col("sent")).cast("long")).as("all_chars"),
            collect_list(struct(col("pos"), col("sent"), col("boiler"))).as("xs"))
          .selectExpr("doc_id", "n_sent", "n_boiler",
            "round(cast(kept_chars as double) / cast(all_chars as double), 6) as kept_frac",
            "md5(array_join(transform(filter(sort_array(xs), x -> not x.boiler), " +
              "x -> x.sent), chr(30))) as kept_hash")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (
          $duckSentenceCorpus),
        sx AS (SELECT doc_id, ${duckSplitSentences("t")} AS sents FROM d),
        se AS (SELECT doc_id, unnest(sents) AS sent,
                      generate_subscripts(sents, 1) AS pos
               FROM sx),
        bl AS (SELECT sent FROM se GROUP BY sent
               HAVING COUNT(DISTINCT doc_id) >= 5),
        fl AS (SELECT se.doc_id, se.pos, se.sent,
                      (bl.sent IS NOT NULL) AS boiler
               FROM se LEFT JOIN bl ON bl.sent = se.sent)
        SELECT doc_id,
               CAST(COUNT(*) AS INTEGER) AS n_sent,
               CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS INTEGER) AS n_boiler,
               round(CAST(SUM(CASE WHEN boiler THEN 0 ELSE length(sent) END) AS DOUBLE)
                     / CAST(SUM(length(sent)) AS DOUBLE), 6) AS kept_frac,
               md5(COALESCE(array_to_string(
                 list(sent ORDER BY pos) FILTER (WHERE NOT boiler),
                 chr(30)), '')) AS kept_hash
        FROM fl GROUP BY doc_id ORDER BY doc_id"""),
      "C4-style boilerplate removal at sentence granularity: df >= 5 " +
        "sentences drop, per-doc kept fraction + md5 of the kept stream " +
        "in original order; the boilerplate set broadcasts (bounded by " +
        "corpus/df), order restored from positions."),

    // ---------------------------------------------------------------- q275
    Q(
      "q275_dsir_importance",
      (s, dir) => {
        // DSIR-STYLE DATA SELECTION (importance resampling toward a
        // target domain, Xie et al. 2023's deployment shape): train a
        // Laplace-smoothed unigram LM on the TARGET slice (lang='en')
        // and one on the RAW corpus over the JOINT vocabulary, weight
        // every doc by sum tf * ln(p_tgt/p_raw), and keep the top-100.
        // Cross-engine float discipline is q109's: one shared ln
        // expression tree per token, the per-doc fold in SORTED token
        // order, round(,6) AFTER the fold — and the cut ranks on the
        // ROUNDED weight with doc_id ties, so 1-ulp ln slack can never
        // flip the selection. Scale: vocab counts are tok-keyed
        // shuffles with map-side combine (the target count rides the
        // same aggregate as a conditional sum — one pass, not two
        // scans); scoring joins tok-keyed; the global top-100 is
        // TakeOrderedAndProject, never a data-sized window.
        val toks = table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(expr("tokenize_text(text)")).as("tok"))
        val vocab = toks.groupBy("tok").agg(
          count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
        val totals = vocab.agg(
          sum("cr").as("rawtot"), sum("ct").as("tgttot"),
          count(lit(1)).as("v"))
        val scored = toks.groupBy("doc_id", "lang", "tok")
          .agg(count(lit(1)).as("tf"))
          .join(vocab, Seq("tok"))
          .crossJoin(broadcast(totals))
          .withColumn("contrib", expr(
            """cast(tf as double) * ln(
                 (cast(ct + 1 as double) / cast(tgttot + v as double)) /
                 (cast(cr + 1 as double) / cast(rawtot + v as double)))"""))
          .groupBy("doc_id", "lang")
          .agg(
            sum("tf").as("dl"),
            expr("""aggregate(
                 transform(array_sort(collect_list(struct(tok, contrib))), p -> p.contrib),
                 cast(0 as double), (a, v) -> a + v)""").as("wsum"))
          .selectExpr("doc_id", "lang", "cast(dl as bigint) as dl",
            "round(wsum, 6) as w")
        scored.orderBy(col("w").desc, col("doc_id")).limit(100)
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        vocab AS (
          SELECT tok, COUNT(1) AS cr,
                 SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
          FROM toks GROUP BY tok),
        tot AS (
          SELECT CAST(SUM(cr) AS BIGINT) AS rawtot,
                 CAST(SUM(ct) AS BIGINT) AS tgttot,
                 CAST(COUNT(1) AS BIGINT) AS v
          FROM vocab),
        tft AS (
          SELECT doc_id, lang, tok, COUNT(1) AS tf
          FROM toks GROUP BY doc_id, lang, tok),
        sc AS (
          SELECT t.doc_id, t.lang, t.tok, t.tf,
                 CAST(t.tf AS DOUBLE) * ln(
                   (CAST(vb.ct + 1 AS DOUBLE) / CAST(tt.tgttot + tt.v AS DOUBLE)) /
                   (CAST(vb.cr + 1 AS DOUBLE) / CAST(tt.rawtot + tt.v AS DOUBLE))) AS contrib
          FROM tft t JOIN vocab vb USING (tok), tot tt),
        agg AS (
          SELECT doc_id, lang, CAST(SUM(tf) AS BIGINT) AS dl,
                 round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(contrib ORDER BY tok)), (a, v) -> a + v), 6) AS w
          FROM sc GROUP BY doc_id, lang)
        SELECT doc_id, lang, dl, w
        FROM agg ORDER BY w DESC, doc_id LIMIT 100"""),
      "DSIR-style importance resampling: Laplace-smoothed target (en) " +
        "vs raw unigram LMs over the joint vocab, per-doc log-ratio " +
        "weights folded in sorted token order and rounded before the " +
        "top-100 cut — selection can never flip on ln ulp slack; " +
        "top-100 via TakeOrderedAndProject, not a global window."),

    // ---------------------------------------------------------------- q276
    Q(
      "q276_multilingual_pipeline",
      (s, dir) => {
        // THE ROUND-8 TEXT STACK COMPOSED (the q226/q269 operational-
        // artifact discipline): one curation run over a constructed
        // multilingual corpus — NFC normalization, sentence-level
        // boilerplate scrub (df >= 5), script routing on the scrubbed
        // text, canonical dedup on its md5 — emitting the per-stage
        // accounting row a pipeline owner actually reads (docs in/out,
        // docs affected, stage metric). Variants: NFD damage +
        // boilerplate (v0), boilerplate-only (v1), a 40-codepoint CJK
        // tail (v2 — routes mixed under the 5% integer gate), clean
        // (v3), and a constant page (v4 — all its sentences are shared,
        // so the scrub empties it and dedup collapses the class to one
        // keeper; empty text routes mixed degenerately under 20*0 >= 0,
        // the shared rule both engines apply). Scale: each stage is the
        // already-locked shape (map-only passes, one sentence-df
        // shuffle + bounded broadcast, hash-group dedup); at 100 TB the
        // normalized frame would be pinned once across stages.
        graft.functions.UnicodeExpressions.register(s)
        val cjkTail = " " + ("\u6f22\u5b57\u3067\u3059" * 10) +
          "\u3002\u6b21\u306e\u6587\uff01"
        val raw = table(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 5 === 4,
            lit("duplicate filler page. All rights reserved."))
            .otherwise(concat(col("text"),
              when(col("doc_id") % 5 === 0,
                lit(" cafe\u0301. All rights reserved. Done."))
                .when(col("doc_id") % 5 === 1,
                  lit(". All rights reserved. Visit the index."))
                .when(col("doc_id") % 5 === 2, lit(cjkTail))
                .otherwise(lit("")))).as("t0"))
        val norm = raw.withColumn("u", expr("unicode_normalize(t0, 'NFC')"))
        val sent = norm.select(col("doc_id"),
          posexplode(expr("split_sentences(u)")).as(Seq("pos", "sent")))
        val bl = sent.groupBy("sent")
          .agg(countDistinct(col("doc_id")).as("sdf")).filter(col("sdf") >= 5)
        val scrub = sent.join(broadcast(bl), Seq("sent"), "left")
          .withColumn("boiler", col("sdf").isNotNull)
          .groupBy("doc_id")
          .agg(
            sum(when(col("boiler"), 1L).otherwise(0L)).as("nb"),
            sum(when(col("boiler"), 0L)
              .otherwise(length(col("sent")).cast("long"))).as("kept_chars"),
            sum(length(col("sent")).cast("long")).as("all_chars"),
            collect_list(struct(col("pos"), col("sent"), col("boiler"))).as("xs"))
          .selectExpr("doc_id", "nb", "kept_chars", "all_chars",
            "array_join(transform(filter(sort_array(xs), x -> not x.boiler), " +
              "x -> x.sent), ' ') as kept")
        val cjkClass = "[\\u3040-\\u30ff\\u3400-\\u4dbf\\u4e00-\\u9fff" +
          "\\uac00-\\ud7af\\uf900-\\ufaff]"
        val routed = scrub
          .withColumn("n_cp", expr("cast(length(kept) as int)"))
          .withColumn("n_cjk", expr(
            s"cast(length(kept) - length(regexp_replace(kept, '$cjkClass', '')) as int)"))
          .withColumn("mixed", expr("20 * n_cjk >= n_cp"))
        val s1 = norm.agg(count(lit(1)).as("din"),
            sum(when(col("u") =!= col("t0"), 1L).otherwise(0L)).as("aff"))
          .selectExpr("1 as stage", "'normalize_nfc' as name",
            "cast(din as bigint) as docs_in", "cast(din as bigint) as docs_out",
            "cast(aff as bigint) as n_affected",
            "round(cast(aff as double) / cast(din as double), 6) as metric")
        val s2 = scrub.agg(count(lit(1)).as("din"),
            sum(when(col("nb") > 0, 1L).otherwise(0L)).as("aff"),
            sum("kept_chars").as("kc"), sum("all_chars").as("ac"))
          .selectExpr("2 as stage", "'sentence_scrub' as name",
            "cast(din as bigint) as docs_in", "cast(din as bigint) as docs_out",
            "cast(aff as bigint) as n_affected",
            "round(cast(kc as double) / cast(ac as double), 6) as metric")
        val s3 = routed.agg(count(lit(1)).as("din"),
            sum(when(col("mixed"), 1L).otherwise(0L)).as("aff"))
          .selectExpr("3 as stage", "'script_route' as name",
            "cast(din as bigint) as docs_in", "cast(din as bigint) as docs_out",
            "cast(aff as bigint) as n_affected",
            "round(cast(aff as double) / cast(din as double), 6) as metric")
        val s4 = routed.agg(count(lit(1)).as("din"),
            countDistinct(md5(col("kept"))).as("dout"))
          .selectExpr("4 as stage", "'canonical_dedup' as name",
            "cast(din as bigint) as docs_in", "cast(dout as bigint) as docs_out",
            "cast(din - dout as bigint) as n_affected",
            "round(cast(dout as double) / cast(din as double), 6) as metric")
        s1.union(s2).union(s3).union(s4).orderBy("stage")
      },
      Some(s"""
        WITH raw AS (
          SELECT doc_id, CASE WHEN doc_id % 5 = 4
            THEN 'duplicate filler page. All rights reserved.'
            ELSE text || CASE CAST(doc_id % 5 AS INTEGER)
              WHEN 0 THEN ' cafe' || chr(769) || '. All rights reserved. Done.'
              WHEN 1 THEN '. All rights reserved. Visit the index.'
              WHEN 2 THEN ' ' ||
                repeat(chr(28450) || chr(23383) || chr(12391) || chr(12377), 10) ||
                chr(12290) || chr(27425) || chr(12398) || chr(25991) || chr(65281)
              ELSE '' END END AS t0
          FROM documents),
        norm AS (SELECT doc_id, t0, nfc_normalize(t0) AS u FROM raw),
        sx AS (SELECT doc_id, ${duckSplitSentences("u")} AS sents FROM norm),
        se AS (SELECT doc_id, unnest(sents) AS sent,
                      generate_subscripts(sents, 1) AS pos FROM sx),
        bl AS (SELECT sent FROM se GROUP BY sent
               HAVING COUNT(DISTINCT doc_id) >= 5),
        scrub AS (
          SELECT f.doc_id,
                 SUM(CASE WHEN f.boiler THEN 1 ELSE 0 END) AS nb,
                 SUM(CASE WHEN f.boiler THEN 0 ELSE length(f.sent) END) AS kept_chars,
                 SUM(length(f.sent)) AS all_chars,
                 COALESCE(array_to_string(
                   list(f.sent ORDER BY f.pos) FILTER (WHERE NOT f.boiler),
                   ' '), '') AS kept
          FROM (SELECT se.doc_id, se.pos, se.sent,
                       (bl.sent IS NOT NULL) AS boiler
                FROM se LEFT JOIN bl ON bl.sent = se.sent) f
          GROUP BY f.doc_id),
        routed AS (
          SELECT doc_id, nb, kept_chars, all_chars, kept,
                 length(kept) AS n_cp,
                 length(kept) - length(regexp_replace(kept,
                   '[' || chr(12352) || '-' || chr(12543) ||
                          chr(13312) || '-' || chr(19903) ||
                          chr(19968) || '-' || chr(40959) ||
                          chr(44032) || '-' || chr(55215) ||
                          chr(63744) || '-' || chr(64255) || ']',
                   '', 'g')) AS n_cjk
          FROM scrub)
        SELECT * FROM (
          SELECT 1 AS stage, 'normalize_nfc' AS name,
                 CAST(COUNT(1) AS BIGINT) AS docs_in,
                 CAST(COUNT(1) AS BIGINT) AS docs_out,
                 CAST(SUM(CASE WHEN u <> t0 THEN 1 ELSE 0 END) AS BIGINT) AS n_affected,
                 round(CAST(SUM(CASE WHEN u <> t0 THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(1) AS DOUBLE), 6) AS metric
          FROM norm
          UNION ALL
          SELECT 2, 'sentence_scrub', CAST(COUNT(1) AS BIGINT),
                 CAST(COUNT(1) AS BIGINT),
                 CAST(SUM(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT),
                 round(CAST(SUM(kept_chars) AS DOUBLE)
                       / CAST(SUM(all_chars) AS DOUBLE), 6)
          FROM scrub
          UNION ALL
          SELECT 3, 'script_route', CAST(COUNT(1) AS BIGINT),
                 CAST(COUNT(1) AS BIGINT),
                 CAST(SUM(CASE WHEN 20 * n_cjk >= n_cp THEN 1 ELSE 0 END) AS BIGINT),
                 round(CAST(SUM(CASE WHEN 20 * n_cjk >= n_cp THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(1) AS DOUBLE), 6)
          FROM routed
          UNION ALL
          SELECT 4, 'canonical_dedup', CAST(COUNT(1) AS BIGINT),
                 CAST(COUNT(DISTINCT md5(kept)) AS BIGINT),
                 CAST(COUNT(1) - COUNT(DISTINCT md5(kept)) AS BIGINT),
                 round(CAST(COUNT(DISTINCT md5(kept)) AS DOUBLE)
                       / CAST(COUNT(1) AS DOUBLE), 6)
          FROM routed)
        ORDER BY stage"""),
      "The round-8 text stack composed into one curation run: NFC " +
        "normalize, df>=5 sentence scrub, script routing on the " +
        "scrubbed text, canonical md5 dedup — four per-stage accounting " +
        "rows (in/out/affected/metric), every stage the already-locked " +
        "shape; the oracle replays the whole chain."),

    // ---------------------------------------------------------------- q277
    Q(
      "q277_sentence_chunks",
      (s, dir) => {
        // SENTENCE-ALIGNED CHUNKING — the packing rule RAG and pretrain
        // chunkers actually use (never split a sentence; q71/q107 cut
        // at token/char offsets): walk each doc's sentences in order,
        // greedily filling chunks under a 200-char budget (+1 joiner
        // char between sentences inside a chunk); a sentence longer
        // than the budget gets its own chunk, never split. The fold is
        // one aggregate HOF per doc over the sorted sentence array —
        // map-only, no shuffle beyond the scan — and the oracle replays
        // it as a list_reduce with a delimited VARCHAR state. Locked by
        // the FULL chunk-assignment vector (md5 over the per-sentence
        // chunk ids): one wrong boundary anywhere fails the row.
        graft.functions.UnicodeExpressions.register(s)
        table(s, dir, "documents")
          .select(col("doc_id"), concat(col("text"), sentenceTail).as("t"))
          .withColumn("sents", expr("split_sentences(t)"))
          .withColumn("st", expr("""
            aggregate(sents,
              named_struct('idx', 0, 'used', 0, 'mx', 0,
                           'ids', cast(array() as array<int>)),
              (st, x) -> CASE
                WHEN st.idx = 0 THEN named_struct(
                  'idx', 1, 'used', cast(length(x) as int),
                  'mx', cast(length(x) as int), 'ids', array(1))
                WHEN st.used + 1 + length(x) <= 200 THEN named_struct(
                  'idx', st.idx,
                  'used', cast(st.used + 1 + length(x) as int),
                  'mx', cast(greatest(st.mx, st.used + 1 + length(x)) as int),
                  'ids', array_append(st.ids, st.idx))
                ELSE named_struct(
                  'idx', cast(st.idx + 1 as int),
                  'used', cast(length(x) as int),
                  'mx', cast(greatest(st.mx, length(x)) as int),
                  'ids', array_append(st.ids, cast(st.idx + 1 as int)))
              END)"""))
          .selectExpr("doc_id",
            "cast(size(sents) as int) as n_sent",
            "st.idx as n_chunks",
            "st.mx as max_chunk_chars",
            "md5(array_join(transform(st.ids, i -> cast(i as string)), ',')) as ids_hash")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH d AS (
          $duckSentenceCorpus),
        sx AS (SELECT doc_id, ${duckSplitSentences("t")} AS sents FROM d),
        folded AS (
          SELECT doc_id, CAST(len(sents) AS INTEGER) AS n_sent,
                 list_reduce(list_prepend('0|0|0|', sents), (st, x) -> CASE
                   WHEN CAST(string_split(st, '|')[1] AS INT) = 0
                     THEN '1|' || CAST(length(x) AS VARCHAR) || '|' ||
                          CAST(length(x) AS VARCHAR) || '|1'
                   WHEN CAST(string_split(st, '|')[2] AS INT) + 1 + length(x) <= 200
                     THEN string_split(st, '|')[1] || '|' ||
                          CAST(CAST(string_split(st, '|')[2] AS INT) + 1 + length(x) AS VARCHAR) || '|' ||
                          CAST(GREATEST(CAST(string_split(st, '|')[3] AS INT),
                            CAST(string_split(st, '|')[2] AS INT) + 1 + length(x)) AS VARCHAR) || '|' ||
                          string_split(st, '|')[4] || ',' || string_split(st, '|')[1]
                   ELSE CAST(CAST(string_split(st, '|')[1] AS INT) + 1 AS VARCHAR) || '|' ||
                        CAST(length(x) AS VARCHAR) || '|' ||
                        CAST(GREATEST(CAST(string_split(st, '|')[3] AS INT),
                          length(x)) AS VARCHAR) || '|' ||
                        string_split(st, '|')[4] || ',' ||
                        CAST(CAST(string_split(st, '|')[1] AS INT) + 1 AS VARCHAR)
                 END) AS st
          FROM sx)
        SELECT doc_id, n_sent,
               CAST(string_split(st, '|')[1] AS INTEGER) AS n_chunks,
               CAST(string_split(st, '|')[3] AS INTEGER) AS max_chunk_chars,
               md5(string_split(st, '|')[4]) AS ids_hash
        FROM folded ORDER BY doc_id"""),
      "Sentence-aligned greedy chunking under a 200-char budget (+1 " +
        "joiner; over-budget sentences chunk alone, never split): one " +
        "aggregate-HOF fold per doc, the oracle replays it as a " +
        "VARCHAR-state list_reduce; locked by an md5 over the full " +
        "per-sentence chunk-id vector."),

    // ---------------------------------------------------------------- q278
    Q(
      "q278_bpe_byte_fit",
      (s, dir) => {
        // BYTE-LEVEL BPE at GPT-class scale: 8192 merges via the shared
        // election core over the UTF-8 BYTE alphabet (base symbols
        // 0-255, merge k = 256 + k - 1 — the GPT-2 id layout production
        // runtimes consume), trained on word-4-gram units of the
        // q264-style mixed-script 500-doc sample: the CJK tails make
        // multibyte characters REAL here — merges cross UTF-8
        // continuation-byte boundaries, which the code-point trainer
        // (q265) cannot express. The oracle replays EVERY round of the
        // same generated chain as q265 (candidate ranking, greedy L/R
        // fold-walk, window-parity batch apply) with bw0 expanding each
        // 4-gram to its UTF-8 bytes by the standard encoding arithmetic
        // — one wrong byte boundary anywhere scrambles every later
        // round and fails the row.
        val units = graft.operators.BpeInt.fourgramCounts(bpeByteCorpus(s, dir), "t")
        graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          bpeByteMerges, bpeByteRounds, bpeByteCandCap, bpeByteAcceptCap)
          .orderBy("midx")
      },
      Some(s"""
        WITH $duckBpeByteCtes
        SELECT midx, rnd, a, b, id, n FROM (
          $duckBpeByteMerges
        ) ORDER BY midx"""),
      "8192-merge BYTE-LEVEL batched BPE over the mixed-script 4-gram " +
        "units: UTF-8 bytes as base symbols (GPT-2 id layout), merges " +
        "crossing character boundaries, same L/R election as q265; the " +
        "oracle expands bytes arithmetically and replays every round."),

    // ---------------------------------------------------------------- q279
    Q(
      "q279_bpe_byte_artifact",
      (s, dir) => {
        // The PORTABLE ARTIFACT round-trip on the trained byte model:
        // export merges.txt (#version header + spelling pairs in the
        // published GPT-2 printable remap space) and vocab.json
        // (spelling -> the exact emitted id; export is loud on
        // duplicate spellings, so its success PROVES the vocab is a
        // bijection), re-import the merge list by spelling resolution
        // (the mechanism external runtimes use), and apply the IMPORTED
        // spec: corpus compression stats, the weighted decode
        // round-trip (bpe_decode_bytes(encode(w)) = w must hold for
        // EVERY unit — the byte-level partition law), artifact line
        // count, vocab size (jackson-parsed from the emitted JSON), and
        // the spec==reimport bit. The oracle recomputes the stats from
        // its replayed final table state and asserts the construction
        // laws (all units round-trip, lines = merges + 1, vocab =
        // 256 + merges).
        graft.functions.BpeByteExpressions.register(s)
        val units = graft.operators.BpeInt.fourgramCounts(bpeByteCorpus(s, dir), "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          bpeByteMerges, bpeByteRounds, bpeByteCandCap, bpeByteAcceptCap)
          .localCheckpoint(true)
        val mergesTxt = graft.operators.BpeArtifact.exportMerges(m)
        val vocabJson = graft.operators.BpeArtifact.exportVocab(m)
        val vocabSize = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(vocabJson).size()
        val spec = graft.operators.BpeArtifact.importMerges(mergesTxt)
        val specRoundtrip = spec == graft.operators.BpeByte.specOf(m)
        val artifactLines = mergesTxt.split("\n").length
        val stats = m.agg(count(lit(1)).cast("int").as("merges"),
          max("rnd").as("rounds"))
        units
          .withColumn("syms", expr(s"bpe_encode_bytes(w, '$spec')"))
          .agg(
            count(lit(1)).as("n_units"),
            sum(expr("wcnt * octet_length(w)")).as("base_bytes"),
            sum(expr("wcnt * size(syms)")).as("enc_syms"),
            sum(expr(s"case when bpe_decode_bytes(syms, '$spec') = w then 1 else 0 end"))
              .as("decode_ok_units"))
          .crossJoin(broadcast(stats))
          .selectExpr("n_units", "base_bytes", "enc_syms",
            "round(cast(enc_syms as double) / cast(base_bytes as double), 6) as ratio",
            "merges", "rounds",
            s"$artifactLines as artifact_lines",
            s"$specRoundtrip as spec_roundtrip",
            "decode_ok_units",
            s"$vocabSize as vocab_size")
      },
      Some(s"""
        WITH $duckBpeByteCtes,
        stats AS (
          SELECT CAST(COUNT(*) AS INTEGER) AS merges,
                 CAST(MAX(rnd) AS INTEGER) AS rounds
          FROM ($duckBpeByteMerges)),
        base AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                 CAST(SUM(wcnt * strlen(g)) AS BIGINT) AS base_bytes
          FROM bw0),
        enc AS (
          SELECT CAST(SUM(wcnt * len(syms)) AS BIGINT) AS enc_syms
          FROM bw$bpeByteRounds)
        SELECT n_units, base_bytes, enc_syms,
               round(CAST(enc_syms AS DOUBLE) / CAST(base_bytes AS DOUBLE), 6) AS ratio,
               merges, rounds,
               CAST(merges + 1 AS INTEGER) AS artifact_lines,
               TRUE AS spec_roundtrip,
               n_units AS decode_ok_units,
               CAST(256 + merges AS INTEGER) AS vocab_size
        FROM base, enc, stats"""),
      "The trained byte-level model through the merges.txt/vocab.json " +
        "artifact: export -> spelling-resolved import -> single-" +
        "expression apply; compression stats vs the replayed table, " +
        "weighted decode round-trip law, artifact shape (lines, vocab " +
        "bijection size), spec==reimport — the portability contract " +
        "external tokenizer runtimes rely on."),

    // ---------------------------------------------------------------- q280
    Q(
      "q280_extract_main",
      (s, dir) => {
        // MAIN-CONTENT extraction (the boilerpipe/jusText algorithm
        // class): each doc is dressed as a full page whose shell would
        // SURVIVE strip_html — the nav/header/aside/footer all carry
        // long unlinked text that passes the content rules, so only the
        // container-pruning stage can remove them — plus two in-article
        // traps for the block rules: a short paragraph (length rule)
        // and a link-heavy paragraph (integer link-density rule). Half
        // the docs (kind = 1) carry a second article paragraph, locking
        // the block-join. extract_main must recover EXACTLY the article
        // paragraphs; the oracle replays the CONSTRUCTION (q239's
        // discipline), not the parser. Map-only codegen'd pass.
        graft.functions.HtmlExpressions.register(s)
        table(s, dir, "documents")
          .selectExpr("doc_id", "source", "text", "cast(doc_id % 2 as int) as kind")
          .withColumn("html", expr(
            """concat('<html><head><title>t</title></head><body>',
                 '<nav>Primary navigation sections listing every archive category</nav>',
                 '<header><h1>', source,
                 ' site banner headline wording for the page</h1></header>',
                 '<div id="main"><p>', text, '</p>',
                 '<p>Too short to keep.</p>',
                 '<p><a href="/l1">click here now</a> <a href="/l2">and also here</a> ok</p>',
                 case when kind = 1 then concat('<p>', text, '</p>') else '' end,
                 '</div><aside>Related reading selections curated for subscribers</aside>',
                 '<footer>All rights reserved worldwide legal information text</footer>',
                 '</body></html>')"""))
          .selectExpr(
            "doc_id",
            "extract_main(html) as main_text",
            "cast(length(extract_main(html)) as int) as n_chars")
          .transform(d => SortOut.sortedOut(d, "doc_id"))
      },
      Some("""
        WITH k AS (
          SELECT doc_id, text, CAST(doc_id % 2 AS INTEGER) AS kind,
                 length(replace(text, ' ', '')) >= 25 AS keep1
          FROM documents),
        e AS (
          SELECT doc_id,
                 CASE WHEN keep1 AND kind = 1 THEN text || chr(10) || text
                      WHEN keep1 THEN text
                      ELSE '' END AS main_text
          FROM k)
        SELECT doc_id, main_text,
               CAST(length(main_text) AS INTEGER) AS n_chars
        FROM e ORDER BY doc_id"""),
      "Block-level main-content extraction: semantic containers pruned " +
        "with contents (their text passes the content rules — only " +
        "pruning removes it), 25-non-space length rule, integer 3x " +
        "link-density rule, blocks joined by newline — the oracle " +
        "replays the page construction byte-for-byte."),

    // ---------------------------------------------------------------- q281
    Q(
      "q281_crawl_capstone",
      (s, dir) => {
        // CRAWL-TO-CONTEXTS CAPSTONE: one accounted query rooted at REAL
        // WARC bytes — format("warc") scan (record_type pushdown) ->
        // charset-aware decode_payload + http_body peel (ISO-8859-1
        // accented bodies: a cast-as-string pipeline would mojibake) ->
        // extract_main (nav/footer shells whose text passes the content
        // rules — only container pruning removes it) -> split_sentences
        // df>=5 boilerplate scrub (a shared subscribe-line on every
        // page) -> canonical-URL exact screen (planted utm_source
        // re-crawls) -> MinHash-LSH + exact-Jaccard near-dup screen
        // (planted one-token variants) -> hash-threshold mixture ->
        // Packer ctx-128 contexts. Output: (ord, stage, n_rows, metric)
        // per stage. The fixture is BUILT from the documents table
        // (bounded, deterministic, content-addressed temp dir) and the
        // oracle replays EVERY stage from the same construction — one
        // wrong byte in decode, one wrong block in extraction, one wrong
        // sentence boundary, election key, hash threshold or packing
        // offset anywhere shifts a later stage's counts and fails the
        // row.
        val st = capstoneStages(s, dir)
        val all = st.all
        val extracted = st.extracted
        val scrubbed = st.scrubbed
        val urlKept = st.urlKept
        val nearKept = st.nearKept
        val mixed = st.mixed
        val nCtx = graft.operators.Packer
          .withSequenceOffsets(mixed, "rid", "n_tok", ctxLen = 128)
          .agg(coalesce(max(col("last_seq")) + 1, lit(0L)).as("n_rows"),
            coalesce(sum(col("n_tok")), lit(0L)).as("metric"))
        def row(ord: Int, name: String, df: org.apache.spark.sql.DataFrame,
            metric: org.apache.spark.sql.Column) =
          df.agg(count(lit(1)).as("n_rows"),
              coalesce(metric.cast("long"), lit(0L)).as("metric"))
            .select(lit(ord).as("ord"), lit(name).as("stage"),
              col("n_rows"), col("metric"))
        row(0, "warc_records", all, sum(col("content_length")))
          .unionAll(row(1, "responses", extracted, sum(col("content_length"))))
          .unionAll(row(2, "decoded_html", extracted, sum(length(col("html")))))
          .unionAll(row(3, "extracted", extracted, sum(length(col("article")))))
          .unionAll(row(4, "scrubbed", scrubbed, sum(col("n_tok"))))
          .unionAll(row(5, "url_dedup", urlKept, sum(col("n_tok"))))
          .unionAll(row(6, "near_dedup", nearKept, sum(col("n_tok"))))
          .unionAll(row(7, "mixture", mixed, sum(col("n_tok"))))
          .unionAll(nCtx.select(lit(8).as("ord"), lit("packed_ctx128").as("stage"),
            col("n_rows"), col("metric")))
          .orderBy("ord")
      },
      Some(s"""
        WITH $duckCapstoneCtes,
        packt AS (
          SELECT rid, n_tok,
                 COALESCE(SUM(n_tok) OVER (ORDER BY rid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
          FROM mixd),
        nctx AS (
          SELECT CAST(COALESCE(MAX((tok_offset + greatest(n_tok, 1) - 1) // 128) + 1, 0) AS BIGINT) AS n
          FROM packt)
        SELECT ord, stage, n_rows, metric FROM (
          SELECT CAST(0 AS INTEGER) AS ord, 'warc_records' AS stage,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM recs)
                   + (SELECT CAST(COUNT(*) AS BIGINT) FROM reqlens) AS n_rows,
                 (SELECT CAST(COALESCE(SUM(clen), 0) AS BIGINT) FROM lens)
                   + (SELECT CAST(COALESCE(SUM(clen), 0) AS BIGINT) FROM reqlens) AS metric
          UNION ALL SELECT 1, 'responses',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM recs),
                 (SELECT CAST(COALESCE(SUM(clen), 0) AS BIGINT) FROM lens)
          UNION ALL SELECT 2, 'decoded_html',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM recs),
                 (SELECT CAST(COALESCE(SUM(hlen), 0) AS BIGINT) FROM lens)
          UNION ALL SELECT 3, 'extracted',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM recs),
                 (SELECT CAST(COALESCE(SUM(alen), 0) AS BIGINT) FROM lens)
          UNION ALL SELECT 4, 'scrubbed',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM scrt),
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM scrt)
          UNION ALL SELECT 5, 'url_dedup',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM uk),
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM uk)
          UNION ALL SELECT 6, 'near_dedup',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM nk),
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM nk)
          UNION ALL SELECT 7, 'mixture',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM mixd),
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM mixd)
          UNION ALL SELECT 8, 'packed_ctx128',
                 (SELECT n FROM nctx),
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM mixd)
        ) ORDER BY ord"""),
      "Crawl-to-contexts end to end from REAL WARC bytes: scan (type " +
        "pushdown) -> charset-aware peel -> main-content extraction -> " +
        "sentence boilerplate scrub -> canonical-URL exact screen -> " +
        "MinHash+Jaccard near-dup screen -> hash mixture -> ctx-128 " +
        "packing, each stage's rows and metric replayed by the oracle " +
        "from the fixture construction."),

    // ---------------------------------------------------------------- q283
    Q(
      "q283_quality_model",
      (s, dir) => {
        // MODEL-BASED QUALITY FILTER — the CCNet/fastText pattern
        // composed from verified parts: HASHED CHAR-3-GRAM bucket rates
        // as features (32 md5%32 buckets, the word_ngram_hash48 hashing
        // discipline at character granularity — no vocabulary file to
        // ship), min-max scaled against corpus bounds (the q234
        // discipline); label = keyword-stuffing proxy ('spark'-token
        // rate above the exact corpus mean — the spam-vs-reference
        // signal quality classifiers are trained on; the model sees
        // only hashed buckets and must FIND the keyword's ngrams);
        // salted 80/20 train/held-out split (the Mixture hash-threshold
        // spelling); Logit.fit on the TRAIN split only (Elliott link +
        // exact-DECIMAL gradient sums: weights bit-identical across
        // engines AND partitionings). Audit row: held-out confusion at
        // the TRAIN-MEDIAN score threshold (per-million-quantized; the
        // operating point a pipeline would tune, not a blind 0.5),
        // accuracy/precision/recall, and exact Mann-Whitney AUC over
        // the quantized score frame (the q190 shape — frames are
        // split-sized, no data-sized global window). The oracle replays
        // the full unrolled descent over its own train split plus the
        // threshold election and audit.
        // hash each 3-gram ONCE into bucket RATES via the fused native
        // expression (r11; formerly an interpreted transform(md5) pass +
        // 32 interpreted filter lambdas — measured 3.5 s of the query's
        // 11.4 s at sf0.1; the original 32x-md5 spelling was 163 s).
        // char3_bucket_rates == the HOF spelling exactly (spec-locked,
        // Char3BucketRatesSpec), including the short-text all-zero-rate
        // guard mirrored in the oracle; the outer coalesce keeps the
        // HOF's null-text -> zero-rates behavior
        val raw = table(s, dir, "documents").select(
          col("doc_id"),
          expr("coalesce(cast(size(filter(tokenize_text(text), t -> t = 'spark')) as double) " +
            "/ cast(nullif(size(tokenize_text(text)), 0) as double), 0.0d)").as("rate"),
          expr("coalesce(char3_bucket_rates(text, 32), array_repeat(0.0d, 32))").as("rs"))
          .selectExpr(Seq("doc_id", "rate") ++ (0 until 32).map(j =>
            s"element_at(rs, ${j + 1}) as r${j + 1}"): _*)
          // pinned: the interpreted-HOF md5 pass is the dominant cost and
          // BOTH stats and feats read this frame (one materialization,
          // not two — measured ~2x)
          .localCheckpoint(true)
        val mnmx = (1 to 32).flatMap(j =>
          Seq(min(s"r$j").as(s"mn$j"), max(s"r$j").as(s"mx$j"))) ++ Seq(
          expr("cast(sum(cast(round(rate, 9) as decimal(28,12))) as double) " +
            "/ cast(count(1) as double)").as("rate_mean"))
        val stats = raw.agg(mnmx.head, mnmx.tail: _*)
        val split = graft.functions.HashConventions
          .md5long48("concat('q283_split|', cast(doc_id as string))")
        val feats = raw.crossJoin(broadcast(stats))
          .selectExpr(Seq("doc_id") ++ (1 to 32).map(j =>
            s"coalesce((r$j - mn$j) / nullif(mx$j - mn$j, 0.0d), 0.0d) as x$j") ++ Seq(
            "case when rate > rate_mean then 1.0d else 0.0d end as y",
            s"$split % 100 < 80 as train"): _*)
          .localCheckpoint(true) // scanned iters+1 times by the fit + audits
        val xs = (1 to 32).map(j => s"x$j")
        val w = graft.operators.Logit.fit(
          feats.filter(col("train")), xs, "y", logitIters, logitLr)
        val scored = feats
          .withColumn("p", graft.operators.Logit.prob(w, xs))
          .select(col("train"), col("y"),
            expr("cast(floor(p * 1000000) as int)").as("spm"))
          .localCheckpoint(true) // median + confusion + AUC branches
        // train-median threshold: smallest train spm whose inclusive
        // cumulative count reaches half the split. Prefix sum over the
        // AGGREGATED distinct-score frame (<= 10^6 rows by quantization,
        // bounded regardless of corpus size) — the r9-flagged broadcast
        // theta self-join was O(frame^2), ~10^12 comparisons at frame
        // saturation; the ordered window is O(frame log frame) and the
        // single task carries a few MB at most
        val tsc = scored.filter(col("train")).groupBy("spm")
          .agg(count(lit(1)).as("c"))
        val nTrain = scored.filter(col("train")).agg(count(lit(1)).as("n_train"))
        val wInc = Window.orderBy("spm")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val med = tsc
          .withColumn("cum_tr", sum("c").over(wInc))
          .crossJoin(broadcast(nTrain))
          .filter(col("cum_tr") * 2 >= col("n_train"))
          .agg(min("spm").as("med"), max(col("n_train")).as("n_train"))
        val held = scored.filter(!col("train"))
          .crossJoin(broadcast(med))
          .withColumn("pred", (col("spm") > col("med")).cast("int"))
        val conf = held.agg(
          count(lit(1)).as("n_held"),
          max(col("med")).as("med"),
          max(col("n_train")).as("n_train"),
          sum(expr("case when pred = 1 and y = 1.0d then 1 else 0 end")).as("tp"),
          sum(expr("case when pred = 1 and y = 0.0d then 1 else 0 end")).as("fp"),
          sum(expr("case when pred = 0 and y = 0.0d then 1 else 0 end")).as("tn"),
          sum(expr("case when pred = 0 and y = 1.0d then 1 else 0 end")).as("fn"))
        val sc = scored.filter(!col("train")).groupBy("spm").agg(
          sum(expr("case when y = 1.0d then 1 else 0 end")).as("np"),
          sum(expr("case when y = 0.0d then 1 else 0 end")).as("nn"))
        // exclusive prefix sum of negatives below each score — same
        // bounded-frame window spelling as the median (was a theta join)
        val wExc = Window.orderBy("spm")
          .rowsBetween(Window.unboundedPreceding, -1)
        val auc = sc
          .withColumn("cum_nn", sum("nn").over(wExc))
          .agg(sum("np").as("apos"), sum("nn").as("aneg"),
            sum(expr("np * (2 * coalesce(cum_nn, 0L) + nn)")).as("u2"))
        conf.crossJoin(broadcast(auc))
          .selectExpr(
            Seq("round(" + w(0) + "d, 6) as b") ++
              (1 to 32).map(j => s"round(${w(j)}d, 6) as w$j") ++ Seq(
              "cast(n_train as bigint) as n_train",
              "cast(n_held as bigint) as n_held",
              "cast(med as int) as med_spm",
              "cast(tp as bigint) as tp", "cast(fp as bigint) as fp",
              "cast(tn as bigint) as tn", "cast(fn as bigint) as fn",
              "round(cast(tp + tn as double) / cast(n_held as double), 6) as acc",
              "round(cast(tp as double) / nullif(cast(tp + fp as double), 0.0d), 6) as prec",
              "round(cast(tp as double) / nullif(cast(tp + fn as double), 0.0d), 6) as rec",
              "round(cast(u2 as double) / nullif(2.0d * apos * aneg, 0.0d), 6) as auc"): _*)
      },
      Some(duckQualityModelSql),
      "Model-based quality filter, CCNet-style: hashed char-3-gram " +
        "bucket features, salted train/held-out split, train-only " +
        "Elliott-link gradient descent (bit-identical weights), held-out " +
        "confusion + precision/recall + exact per-mille Mann-Whitney " +
        "AUC; the oracle replays the unrolled descent and the audit."),

    // ---------------------------------------------------------------- q284
    Q(
      "q284_packed_manifest",
      (s, dir) => {
        // PACKED-OUTPUT DELIVERY MANIFEST — the training-data handoff
        // artifact: Packer ctx-256 offsets over the tokenized corpus,
        // sharded deterministically (first_seq % 8), written as hive
        // parquet with a per-shard manifest (row count, token sum, and
        // an order-free exact-DECIMAL content hash of every row's
        // order:ntok:first:last tuple), then READ BACK and re-manifested
        // — readback_ok is the per-shard three-way equality, so a
        // dropped row or corrupted file fails the delivery loudly. The
        // oracle replays the packing cumsum, the shard assignment, and
        // the content hash from the documents table; readback_ok must
        // be TRUE on every shard (the write/read round trip is the part
        // only Spark can execute — its failure shows up as a false).
        val docs = table(s, dir, "documents")
          .selectExpr("doc_id", "cast(size(tokenize_text(text)) as long) as n_tok")
        val packed = graft.operators.Packer
          .withSequenceOffsets(docs, "doc_id", "n_tok", ctxLen = 256)
        // fresh dir per invocation, deleted at JVM exit (scratchDir)
        val out = scratchDir("graft_packed_")
        graft.sources.Sinks
          .writePackedManifest(packed, "doc_id", "n_tok", out, 8)
          .orderBy("shard")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents),
        pk AS (
          SELECT doc_id, n_tok,
                 COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
          FROM t),
        sq AS (
          SELECT doc_id, n_tok,
                 tok_offset // 256 AS first_seq,
                 (tok_offset + greatest(n_tok, 1) - 1) // 256 AS last_seq
          FROM pk)
        SELECT CAST(first_seq % 8 AS INTEGER) AS shard,
               CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(CAST(SUM(CAST(${duckMd5long(
                 "CAST(doc_id AS VARCHAR) || ':' || CAST(n_tok AS VARCHAR) || ':' || " +
                   "CAST(first_seq AS VARCHAR) || ':' || CAST(last_seq AS VARCHAR)")}
                 AS DECIMAL(38,0))) % 1000000007 AS DECIMAL(38,0)) AS BIGINT) AS content_hash,
               TRUE AS readback_ok
        FROM sq GROUP BY 1 ORDER BY shard"""),
      "Delivery manifest for packed contexts: deterministic first_seq%8 " +
        "sharded hive write + per-shard manifest (rows, tokens, exact " +
        "order-free DECIMAL content hash mod 1e9+7) + read-back " +
        "verification; the oracle replays packing, sharding and hashes " +
        "from the corpus, and readback_ok certifies the round trip."),

    // ---------------------------------------------------------------- q285
    Q(
      "q285_gpt2_tokenizer",
      (s, dir) => {
        // THE FULL PRODUCTION TOKENIZER CHAIN, id-exact: train byte-level
        // BPE on GPT-2 PRE-TOKEN units (BpeByte.pretokenCounts — the
        // trainer front production tokenizers use, so merges respect the
        // exact boundaries bpe_encode_gpt2 enforces at apply time; the
        // 4-gram front of q278 lets merges glue across spaces, and such
        // a model silently forfeits those merges under the GPT-2
        // encoder), then run every corpus doc through
        // pretokenize_gpt2 -> per-piece byte-BPE -> token ids. Output is
        // PER-DOC and CONTENT-CHECKED: pre-token/token/byte counts, the
        // first 12 ids verbatim, an md5 over the full id sequence, and
        // the byte-level decode round-trip bit. The oracle replays the
        // pre-tokenizer (RE2 has no lookahead, so the published
        // pattern's `\s+(?!\S)` trailing-space detach is reproduced by
        // splitting each whitespace run before its last character with
        // a chr(30) sentinel, then tiling each segment with the
        // lookahead-free alternatives — equivalent by the run-splitting
        // law; `\s` is spelled [\t-\r ] to pin Java's ASCII whitespace),
        // replays EVERY training round over the pre-token unit table,
        // and rebuilds each doc's id sequence by joining its pieces (in
        // order) against the final replayed unit state — one wrong merge,
        // boundary, or id anywhere breaks the md5 of some doc.
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir).localCheckpoint(true)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        corpus
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .selectExpr(
            "doc_id",
            "cast(size(pretokenize_gpt2(t)) as int) as n_pretok",
            "cast(size(ids) as int) as n_tok",
            "cast(octet_length(t) as int) as n_bytes",
            // joined string, not a raw array: every query output column
            // must be scalar (driver comparator contract — QueriesSpec
            // locks the law library-wide)
            "array_join(transform(slice(ids, 1, 12), i -> cast(i as string)), ',') as ids_head",
            "md5(array_join(transform(ids, i -> cast(i as string)), ',')) as ids_md5",
            s"case when bpe_decode_bytes(ids, '$spec') = t then 1 else 0 end as rt_ok")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id)
        SELECT d.doc_id,
               CAST(len(p.ps) AS INTEGER) AS n_pretok,
               CAST(len(e.ids) AS INTEGER) AS n_tok,
               CAST(strlen(d.t) AS INTEGER) AS n_bytes,
               array_to_string(e.ids[1:12], ',') AS ids_head,
               md5(array_to_string(e.ids, ',')) AS ids_md5,
               1 AS rt_ok
        FROM docs d
        JOIN pieces p ON p.doc_id = d.doc_id
        JOIN enc e ON e.doc_id = d.doc_id
        ORDER BY d.doc_id"""),
      "The production tokenizer path end to end: byte-BPE trained on " +
        "GPT-2 pre-token units (merges can never cross an encode " +
        "boundary), applied as pretokenize_gpt2 -> per-piece byte-BPE; " +
        "per-doc id sequences content-checked (head ids + full-sequence " +
        "md5 + decode round trip) against an oracle that replays the " +
        "pre-tokenizer, all training rounds, and per-piece encode."),

    // ---------------------------------------------------------------- q286
    Q(
      "q286_token_contexts",
      (s, dir) => {
        // TENSOR-READY CONTEXTS — the last mile the r9 verdict flagged:
        // not token COUNTS packed into offsets (q105/q281) but the
        // actual id arrays a trainer consumes. The q285 chain produces
        // per-doc ids; Packer.packTokenIds concatenates them in doc_id
        // order with ONE eos separator per doc (eos = the trained
        // model's vocab size, one past the last merge id — the GPT-2
        // <|endoftext|> convention) and slices the global stream into
        // ctx-128 windows by two-phase offsets + overlap explode +
        // equi-shuffle reassembly (each id crosses the wire once; the
        // partial tail window is kept, flagged by is_full = 0). Output
        // is PER-WINDOW and id-exact: head ids verbatim plus a full-
        // window md5. The oracle rebuilds the whole id stream from its
        // replayed chain and re-slices it arithmetically — any boundary
        // or separator error shifts every later window's hash.
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir).localCheckpoint(true)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        val eos = graft.functions.BpeByteKit.IdBase +
          (if (spec.isEmpty) 0 else spec.split(";", -1).length)
        val docs = corpus
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .select("doc_id", "ids")
        graft.operators.Packer.packTokenIds(docs, "doc_id", "ids",
          ctxLen = 128, eosId = eos)
          .selectExpr(
            "seq", "n_ids",
            "array_join(transform(slice(ids, 1, 8), i -> cast(i as string)), ',') as ids_head",
            "md5(array_join(transform(ids, i -> cast(i as string)), ',')) as ids_md5",
            "case when n_ids = 128 then 1 else 0 end as is_full")
          .orderBy("seq")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id),
        vocab AS (SELECT CAST(256 + COUNT(*) AS INTEGER) AS eos FROM (
          ${duckSymBpeMerges(gpt2ChainRounds)})),
        stream AS MATERIALIZED (
          SELECT flatten(list(list_append(ids, eos) ORDER BY doc_id)) AS st
          FROM enc, vocab GROUP BY ALL),
        ctx AS (
          SELECT CAST(i AS BIGINT) AS seq,
                 st[CAST(i * 128 + 1 AS BIGINT):CAST(LEAST((i + 1) * 128, len(st)) AS BIGINT)] AS ids
          FROM stream, unnest(range(0, CAST(ceil(len(st) / 128.0) AS BIGINT))) t(i))
        SELECT seq, CAST(len(ids) AS INTEGER) AS n_ids,
               array_to_string(ids[1:8], ',') AS ids_head,
               md5(array_to_string(ids, ',')) AS ids_md5,
               CASE WHEN len(ids) = 128 THEN 1 ELSE 0 END AS is_full
        FROM ctx ORDER BY seq"""),
      "Tensor-ready ctx-128 windows of the trained tokenizer's id " +
        "stream (one EOS per doc, vocab-size id): two-phase offsets + " +
        "overlap explode + equi-shuffle reassembly, partial tail kept " +
        "and flagged; per-window head ids and full-window md5 against " +
        "an oracle that rebuilds and re-slices the whole stream."),

    // ---------------------------------------------------------------- q287
    Q(
      "q287_token_delivery",
      (s, dir) => {
        // THE VERIFIED TENSOR HANDOFF: q286's windows through
        // Sinks.writeTokenContexts — seq%8-sharded hive write whose
        // per-shard manifest hashes the actual ID CONTENT of every
        // window (q284's manifest hashed packing accounting tuples; a
        // flipped id was invisible there, here it fails the shard), then
        // a read-back re-manifest; readback_ok certifies the round trip.
        // The oracle replays windows, shards, counts, and content hashes
        // from its own replayed id stream.
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir).localCheckpoint(true)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        val eos = graft.functions.BpeByteKit.IdBase +
          (if (spec.isEmpty) 0 else spec.split(";", -1).length)
        val docs = corpus
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .select("doc_id", "ids")
        val ctxs = graft.operators.Packer.packTokenIds(docs, "doc_id", "ids",
          ctxLen = 128, eosId = eos)
        // fresh dir per invocation, deleted at JVM exit (scratchDir)
        val out = scratchDir("graft_tokctx_")
        graft.sources.Sinks.writeTokenContexts(ctxs, out, 8)
          .orderBy("shard")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id),
        vocab AS (SELECT CAST(256 + COUNT(*) AS INTEGER) AS eos FROM (
          ${duckSymBpeMerges(gpt2ChainRounds)})),
        stream AS MATERIALIZED (
          SELECT flatten(list(list_append(ids, eos) ORDER BY doc_id)) AS st
          FROM enc, vocab GROUP BY ALL),
        ctx AS (
          SELECT CAST(i AS BIGINT) AS seq,
                 st[CAST(i * 128 + 1 AS BIGINT):CAST(LEAST((i + 1) * 128, len(st)) AS BIGINT)] AS ids
          FROM stream, unnest(range(0, CAST(ceil(len(st) / 128.0) AS BIGINT))) t(i))
        SELECT CAST(seq % 8 AS INTEGER) AS shard,
               CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(len(ids)) AS BIGINT) AS n_ids,
               CAST(CAST(SUM(CAST(${graft.functions.HashConventions.duckMd5long48(
                 "CAST(seq AS VARCHAR) || ':' || array_to_string(ids, ',')")}
                 AS DECIMAL(38,0))) % 1000000007 AS DECIMAL(38,0)) AS BIGINT) AS content_hash,
               TRUE AS readback_ok
        FROM ctx GROUP BY 1 ORDER BY shard"""),
      "Verified tensor delivery: seq%8-sharded write of the ctx-128 id " +
        "windows with a per-shard manifest hashing every window's FULL " +
        "id content (48-bit md5 summed in exact DECIMAL, mod 1e9+7) and " +
        "a read-back re-manifest; the oracle replays windows, shards, " +
        "and content hashes, and readback_ok certifies the round trip."),

    // ---------------------------------------------------------------- q289
    Q(
      "q289_attention_spans",
      (s, dir) => {
        // DOCUMENT-SPAN METADATA for packed windows — what a trainer's
        // attention mask actually consumes: concat-and-chunk packing
        // mixes documents inside one window, and causal attention must
        // not cross document boundaries (block-diagonal masking), so
        // each ctx-128 window carries (doc, a, b) spans: doc = the
        // owning doc_id, [a, b) its 0-based id positions (EOS owned by
        // its doc). Output is span-exact: the full span list as a
        // string, the span count, the window EOS count, and the TILING
        // law bit (min a = 0 AND span lengths sum to n_ids — no gaps,
        // no overlaps). The oracle re-derives every span arithmetically
        // from per-doc offsets: a = max(0, off - w*128),
        // b = min(128, off + n - w*128).
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir).localCheckpoint(true)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        val eos = graft.functions.BpeByteKit.IdBase +
          (if (spec.isEmpty) 0 else spec.split(";", -1).length)
        val docs = corpus
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .select("doc_id", "ids")
        graft.operators.Packer.packTokenIdsWithSpans(docs, "doc_id", "ids",
          ctxLen = 128, eosId = eos)
          .selectExpr(
            "seq", "n_ids",
            "cast(size(spans) as int) as n_spans",
            "array_join(transform(spans, x -> concat(cast(x.doc as string), ':', " +
              "cast(x.a as string), ':', cast(x.b as string))), ';') as spans_str",
            s"cast(size(filter(ids, i -> i = $eos)) as int) as eos_cnt",
            "case when element_at(spans, 1).a = 0 " +
              "and aggregate(spans, 0, (acc, x) -> acc + (x.b - x.a)) = n_ids " +
              "then 1 else 0 end as tiled")
          .orderBy("seq")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id),
        offs AS MATERIALIZED (
          SELECT doc_id, CAST(len(ids) + 1 AS BIGINT) AS n,
                 CAST(COALESCE(SUM(len(ids) + 1) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
          FROM enc),
        sp AS (
          SELECT w AS seq, doc_id,
                 CAST(GREATEST(0, o - w * 128) AS INTEGER) AS a,
                 CAST(LEAST(128, o + n - w * 128) AS INTEGER) AS b,
                 ((o + n - 1) // 128 = w) AS eos_here
          FROM offs, unnest(range(o // 128, (o + n - 1) // 128 + 1)) t(w))
        SELECT seq, CAST(MAX(b) AS INTEGER) AS n_ids,
               CAST(COUNT(1) AS INTEGER) AS n_spans,
               string_agg(concat(CAST(doc_id AS VARCHAR), ':', CAST(a AS VARCHAR),
                 ':', CAST(b AS VARCHAR)), ';' ORDER BY a) AS spans_str,
               CAST(SUM(CASE WHEN eos_here THEN 1 ELSE 0 END) AS INTEGER) AS eos_cnt,
               CASE WHEN MIN(a) = 0 AND SUM(b - a) = MAX(b) THEN 1 ELSE 0 END AS tiled
        FROM sp GROUP BY seq ORDER BY seq"""),
      "Block-diagonal attention metadata: every packed ctx-128 window " +
        "carries its (doc, a, b) spans (EOS owned by its doc), the " +
        "window EOS count, and the tiling-law bit; the oracle re-derives " +
        "every span from per-doc stream offsets."),

    // ---------------------------------------------------------------- q290
    Q(
      "q290_epoch_plan",
      (s, dir) => {
        // RANK-SHARDED EPOCH PLAN — deterministic, resumable data order
        // for multi-epoch data-parallel training: per epoch a SEEDED
        // permutation of the packed windows (48-bit md5 of
        // 'q290_perm|epoch|seq' — a different order every epoch, the
        // same order every run), dealt round-robin to 4 ranks by
        // two-phase GlobalRank position (exact balance, no global
        // window, no collect). Output per (epoch, rank): window count,
        // token sum, an order-free exact-DECIMAL multiset hash of the
        // assigned window ids (coverage: each epoch's 4 hashes account
        // for every window exactly once), and the first 3 windows in
        // training order (locks the ORDER, not just the set). The
        // oracle replays the permutation keys, the rank deal, and every
        // aggregate.
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir).localCheckpoint(true)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        val eos = graft.functions.BpeByteKit.IdBase +
          (if (spec.isEmpty) 0 else spec.split(";", -1).length)
        val docs = corpus
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .select("doc_id", "ids")
        val ctxs = graft.operators.Packer
          .packTokenIds(docs, "doc_id", "ids", ctxLen = 128, eosId = eos)
          .select("seq", "n_ids")
          .localCheckpoint(true) // 3 epochs scan the same window frame
        val permKey = graft.functions.HashConventions.md5long48(
          "concat('q290_perm|', cast(epoch as string), '|', cast(seq as string))")
        val keyed = ctxs
          .withColumn("epoch", explode(expr("sequence(0, 2)")))
          .withColumn("k", expr(permKey))
        val winHash = graft.functions.HashConventions.md5long48(
          "concat('q290_w|', cast(seq as string))")
        // r12: lazy bounds (the q99 pattern) — measured 7.69 -> 5.29 s
        graft.operators.GlobalRank.withGlobalRank(keyed, "epoch", "k", "seq",
          precomputedBounds = Some(
            graft.operators.GlobalRank.boundsOf(keyed, "epoch", "k")))
          .withColumn("rk", expr("cast((rn - 1) % 4 as int)"))
          .groupBy(col("epoch").cast("int").as("epoch"), col("rk"))
          .agg(
            count(lit(1)).as("n_windows"),
            sum("n_ids").cast("long").as("n_tok"),
            expr(s"cast(sum(cast($winHash as decimal(38,0))) % 1000000007 as bigint)")
              .as("set_hash"),
            // BOUNDED head collect: the round-robin deal puts rank rk's
            // first 3 windows at rn in {rk+1, rk+5, rk+9}, so filtering
            // rn <= 12 (= 3 * nRanks) BEFORE the collect caps the
            // aggregation buffer at 3 structs per group — collect_list
            // skips the nulls the CASE emits for every other row. The
            // unconditional spelling collected the whole corpus-sized
            // group to slice 3 (the r10 verdict's OOM-at-scale flag).
            expr("array_join(transform(slice(array_sort(collect_list(" +
              "case when rn <= 12 then struct(rn, seq) end)), " +
              "1, 3), x -> cast(x.seq as string)), ',')").as("head3"))
          .orderBy("epoch", "rk")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id),
        vocab AS (SELECT CAST(256 + COUNT(*) AS INTEGER) AS eos FROM (
          ${duckSymBpeMerges(gpt2ChainRounds)})),
        stream AS MATERIALIZED (
          SELECT flatten(list(list_append(ids, eos) ORDER BY doc_id)) AS st
          FROM enc, vocab GROUP BY ALL),
        ctx AS (
          SELECT CAST(i AS BIGINT) AS seq,
                 CAST(LEAST((i + 1) * 128, len(st)) - i * 128 AS INTEGER) AS n_ids
          FROM stream, unnest(range(0, CAST(ceil(len(st) / 128.0) AS BIGINT))) t(i)),
        keyed AS (
          SELECT seq, n_ids, CAST(e AS INTEGER) AS epoch,
                 ${graft.functions.HashConventions.duckMd5long48(
                   "'q290_perm|' || CAST(e AS VARCHAR) || '|' || CAST(seq AS VARCHAR)")} AS k
          FROM ctx, unnest(range(0, 3)) t(e)),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY epoch ORDER BY k, seq) AS rn
          FROM keyed)
        SELECT epoch, CAST((rn - 1) % 4 AS INTEGER) AS rk,
               CAST(COUNT(1) AS BIGINT) AS n_windows,
               CAST(SUM(n_ids) AS BIGINT) AS n_tok,
               CAST(CAST(SUM(CAST(${graft.functions.HashConventions.duckMd5long48(
                 "'q290_w|' || CAST(seq AS VARCHAR)")} AS DECIMAL(38,0)))
                 % 1000000007 AS DECIMAL(38,0)) AS BIGINT) AS set_hash,
               string_agg(CASE WHEN prn <= 3 THEN CAST(seq AS VARCHAR) END, ','
                 ORDER BY prn) AS head3
        FROM (SELECT *, row_number() OVER (PARTITION BY epoch, (rn - 1) % 4
                ORDER BY rn) AS prn FROM ranked)
        GROUP BY 1, 2 ORDER BY epoch, rk"""),
      "Deterministic rank-sharded epoch plan: per epoch a seeded md5 " +
        "permutation of the packed windows dealt round-robin to 4 ranks " +
        "via two-phase GlobalRank; per (epoch, rank) counts, token sums, " +
        "an exact multiset hash (coverage law), and the first 3 windows " +
        "in training order; the oracle replays keys, deal, and hashes."),

    // ---------------------------------------------------------------- q291
    Q(
      "q291_causal_labels",
      (s, dir) => {
        // CAUSAL-LM LABELS with cross-document loss masking — the third
        // tensor a trainer consumes beside input ids (q286) and the
        // attention spans (q289): label(p) = ids(p+1) (next-token
        // prediction), with -100 (the ignore index convention) at the
        // window's last position and at every position whose TARGET is
        // the first token of a DIFFERENT document (predicting an
        // unrelated doc's opening token from EOS is pure noise; the EOS
        // itself stays predicted — it belongs to its doc). Per window:
        // the label md5 (content-exact), the masked count, and the
        // first 8 labels verbatim. The oracle rebuilds labels from its
        // replayed id stream and span starts.
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir).localCheckpoint(true)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        val eos = graft.functions.BpeByteKit.IdBase +
          (if (spec.isEmpty) 0 else spec.split(";", -1).length)
        val docs = corpus
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .select("doc_id", "ids")
        graft.operators.Packer.packTokenIdsWithSpans(docs, "doc_id", "ids",
          ctxLen = 128, eosId = eos)
          .withColumn("labels", expr(
            """transform(sequence(0, n_ids - 1), p -> case
                 when p = n_ids - 1 then -100
                 when array_contains(transform(spans, x -> x.a), p + 1) then -100
                 else element_at(ids, p + 2) end)"""))
          .selectExpr(
            "seq", "n_ids",
            "md5(array_join(transform(labels, l -> cast(l as string)), ',')) as labels_md5",
            "cast(size(filter(labels, l -> l = -100)) as int) as n_masked",
            "array_join(transform(slice(labels, 1, 8), l -> cast(l as string)), ',') as labels_head")
          .orderBy("seq")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id),
        vocab AS (SELECT CAST(256 + COUNT(*) AS INTEGER) AS eos FROM (
          ${duckSymBpeMerges(gpt2ChainRounds)})),
        stream AS MATERIALIZED (
          SELECT flatten(list(list_append(ids, eos) ORDER BY doc_id)) AS st
          FROM enc, vocab GROUP BY ALL),
        ctx AS (
          SELECT CAST(i AS BIGINT) AS seq,
                 st[CAST(i * 128 + 1 AS BIGINT):CAST(LEAST((i + 1) * 128, len(st)) AS BIGINT)] AS ids
          FROM stream, unnest(range(0, CAST(ceil(len(st) / 128.0) AS BIGINT))) t(i)),
        offs AS MATERIALIZED (
          SELECT doc_id, CAST(len(ids) + 1 AS BIGINT) AS n,
                 CAST(COALESCE(SUM(len(ids) + 1) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
          FROM enc),
        starts AS (
          SELECT seq, COALESCE(list(a ORDER BY a) FILTER (WHERE a > 0),
                   CAST([] AS INTEGER[])) AS sts
          FROM (
            SELECT w AS seq, CAST(GREATEST(0, o - w * 128) AS INTEGER) AS a
            FROM offs, unnest(range(o // 128, (o + n - 1) // 128 + 1)) t(w))
          GROUP BY seq),
        lbl AS (
          SELECT c.seq, len(c.ids) AS n,
                 list_transform(range(0, CAST(len(c.ids) AS BIGINT)), p -> CASE
                   WHEN p = len(c.ids) - 1 THEN -100
                   WHEN list_contains(s.sts, CAST(p + 1 AS INTEGER)) THEN -100
                   ELSE c.ids[CAST(p + 2 AS BIGINT)] END) AS labels
          FROM ctx c JOIN starts s ON s.seq = c.seq)
        SELECT seq, CAST(n AS INTEGER) AS n_ids,
               md5(array_to_string(labels, ',')) AS labels_md5,
               CAST(len(list_filter(labels, l -> l = -100)) AS INTEGER) AS n_masked,
               array_to_string(labels[1:8], ',') AS labels_head
        FROM lbl ORDER BY seq"""),
      "Causal-LM label tensors with cross-document loss masking: " +
        "next-token shift, -100 at window tails and wherever the target " +
        "opens a different document (EOS itself stays predicted); " +
        "per-window label md5, masked count, and head labels against an " +
        "oracle that rebuilds labels from the replayed stream and spans.")

    // ---------------------------------------------------------------- q292
    , Q(
      "q292_production_artifact",
      (s, dir) => {
        // THE PRODUCTION-FRONT PORTABLE ARTIFACT: q279 proved the
        // merges.txt/vocab.json round trip on the 4-gram-front model;
        // this closes the loop on the model the PIPELINE actually ships
        // — trained on GPT-2 pre-tokens (q285) — and pins the
        // SPECIAL-TOKEN contract: vocab.json carries <|endoftext|> at
        // the next free id (the GPT-2 convention: the LAST vocab id),
        // and that id is EXACTLY the eosId the packer writes between
        // documents (q286/q287's separator) — artifact and delivery can
        // never disagree about EOS. Stats run under the RE-IMPORTED
        // spec: unit compression, the weighted byte-level decode
        // round-trip law, artifact shape, spec==reimport.
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
          .localCheckpoint(true)
        val spec = graft.operators.BpeByte.specOf(m)
        val nMerges = if (spec.isEmpty) 0 else spec.split(";", -1).length
        val packerEos = graft.functions.BpeByteKit.IdBase + nMerges
        val mergesTxt = graft.operators.BpeArtifact.exportMerges(m)
        val vocabJson = graft.operators.BpeArtifact
          .exportVocabWithSpecials(m, Seq("<|endoftext|>"))
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(vocabJson)
        val eosFromVocab = node.get("<|endoftext|>").asInt()
        val vocabSize = node.size()
        val imported = graft.operators.BpeArtifact.importMerges(mergesTxt)
        val specRoundtrip = imported == spec
        val artifactLines = mergesTxt.split("\n").length
        units
          .withColumn("syms", expr(s"bpe_encode_bytes(w, '$imported')"))
          .agg(
            count(lit(1)).as("n_units"),
            sum(expr("wcnt * octet_length(w)")).as("base_bytes"),
            sum(expr("wcnt * size(syms)")).as("enc_syms"),
            sum(expr(s"case when bpe_decode_bytes(syms, '$imported') = w then 1 else 0 end"))
              .as("decode_ok_units"))
          .selectExpr("n_units", "base_bytes", "enc_syms",
            "round(cast(enc_syms as double) / cast(base_bytes as double), 6) as ratio",
            s"$nMerges as merges",
            s"$artifactLines as artifact_lines",
            s"$vocabSize as vocab_size",
            s"$eosFromVocab as eos_id",
            s"${eosFromVocab == packerEos} as eos_matches_packer",
            s"$specRoundtrip as spec_roundtrip",
            "decode_ok_units")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        stats AS (
          SELECT CAST(COUNT(*) AS INTEGER) AS merges FROM (
            ${duckSymBpeMerges(gpt2ChainRounds)})),
        base AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                 CAST(SUM(wcnt * strlen(g)) AS BIGINT) AS base_bytes
          FROM bw0),
        enc AS (
          SELECT CAST(SUM(wcnt * len(syms)) AS BIGINT) AS enc_syms
          FROM bw$gpt2ChainRounds)
        SELECT n_units, base_bytes, enc_syms,
               round(CAST(enc_syms AS DOUBLE) / CAST(base_bytes AS DOUBLE), 6) AS ratio,
               merges,
               CAST(merges + 1 AS INTEGER) AS artifact_lines,
               CAST(256 + merges + 1 AS INTEGER) AS vocab_size,
               CAST(256 + merges AS INTEGER) AS eos_id,
               TRUE AS eos_matches_packer,
               TRUE AS spec_roundtrip,
               n_units AS decode_ok_units
        FROM base, enc, stats"""),
      "The shipped model's portable artifact: merges.txt + vocab.json " +
        "WITH <|endoftext|> at the next free id on the GPT-2 pre-token-" +
        "front model, re-imported and applied; pins the EOS contract " +
        "(vocab special id == the packer's separator id), compression, " +
        "the decode round-trip law, and spec==reimport; the oracle " +
        "replays training and recomputes every stat."),

    // ---------------------------------------------------------------- q293
    Q(
      "q293_capstone_tensors",
      (s, dir) => {
        // CRAWL BYTES TO DELIVERED TENSORS — capstone v3, closing the
        // id-level last mile q281 stopped short of (its final stage
        // counted ctx windows from token COUNTS): the same WARC fixture
        // flows through the shared crawl front (decode -> extract ->
        // scrub -> URL screen -> near-dup screen -> mixture), then a
        // GPT-2-pre-token-front byte-BPE trains ON THE SURVIVORS'
        // scrubbed text (the tokenizer-training sample: survivors of
        // the first 500 crawl docs — production trains the tokenizer on
        // a sample of the cleaned corpus, and the oracle's encode
        // replay joins pieces against the trained unit table, so train
        // corpus == encode corpus by construction), every sample doc
        // encodes to ids, Packer.packTokenIds slices the EOS-separated
        // stream into ctx-128 windows, and writeTokenContexts delivers
        // them seq%8-sharded with id-content manifests. Output: one
        // accounting row per stage (survivors / sample / trained /
        // encoded / packed) plus one row per delivered shard carrying
        // its CONTENT HASH and read-back bit. The oracle replays the
        // crawl front, the full training, the per-doc encode, the
        // packing arithmetic, and every shard hash from the parquet
        // corpus — one wrong byte anywhere in the chain shifts a hash.
        graft.functions.BpeByteExpressions.register(s)
        val st = capstoneStages(s, dir)
        val mixed = st.mixed
        val sample = mixed.filter(col("rid") < 1500)
          .select(col("rid"), col("n_tok"), col("scrubbed").as("t"))
          .localCheckpoint(true) // read by training, encode, and accounting
        val units = graft.operators.BpeByte.pretokenCounts(sample, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        val nMerges = if (spec.isEmpty) 0 else spec.split(";", -1).length
        val eos = graft.functions.BpeByteKit.IdBase + nMerges
        val encoded = sample
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .select("rid", "ids")
          .localCheckpoint(true)
        val ctxs = graft.operators.Packer.packTokenIds(encoded, "rid", "ids",
          ctxLen = 128, eosId = eos)
          .localCheckpoint(true) // delivered AND accounted
        // fresh dir per invocation, deleted at JVM exit (scratchDir)
        val out = scratchDir("graft_cap_tensors_")
        val man = graft.sources.Sinks.writeTokenContexts(ctxs, out, 8)
        def acct(ord: Int, name: String, df: org.apache.spark.sql.DataFrame,
            metric: org.apache.spark.sql.Column) =
          df.agg(count(lit(1)).as("n_rows"),
              coalesce(metric.cast("long"), lit(0L)).as("metric"))
            .select(lit(ord).as("ord"), lit(name).as("stage"),
              col("n_rows"), col("metric"), lit(1).as("ok"))
        acct(0, "survivors", mixed, sum(col("n_tok")))
          .unionAll(acct(1, "sample", sample, sum(col("n_tok"))))
          .unionAll(s.range(1).select(lit(2).as("ord"), lit("trained").as("stage"),
            lit(nMerges.toLong).as("n_rows"), lit(eos.toLong).as("metric"),
            lit(1).as("ok")))
          .unionAll(acct(3, "encoded", encoded, sum(expr("cast(size(ids) as long)"))))
          .unionAll(acct(4, "packed", ctxs, sum(col("n_ids"))))
          .unionAll(man.select((lit(5) + col("shard")).cast("int").as("ord"),
            concat(lit("shard_"), col("shard").cast("string")).as("stage"),
            col("n_rows"), col("content_hash").as("metric"),
            col("readback_ok").cast("int").as("ok")))
          .orderBy("ord")
      },
      Some(s"""
        WITH ${duckCapstoneChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id),
        nmg AS (SELECT CAST(COUNT(*) AS BIGINT) AS merges FROM (
          ${duckSymBpeMerges(gpt2ChainRounds)})),
        vocab AS (SELECT CAST(256 + merges AS INTEGER) AS eos FROM nmg),
        stream AS MATERIALIZED (
          SELECT flatten(list(list_append(ids, eos) ORDER BY doc_id)) AS st
          FROM enc, vocab GROUP BY ALL),
        ctx AS MATERIALIZED (
          SELECT CAST(i AS BIGINT) AS seq,
                 st[CAST(i * 128 + 1 AS BIGINT):CAST(LEAST((i + 1) * 128, len(st)) AS BIGINT)] AS ids
          FROM stream, unnest(range(0, CAST(ceil(len(st) / 128.0) AS BIGINT))) t(i)),
        shards AS (
          SELECT CAST(seq % 8 AS INTEGER) AS shard,
                 CAST(COUNT(1) AS BIGINT) AS n_rows,
                 CAST(CAST(SUM(CAST(${duckMd5long(
                   "CAST(seq AS VARCHAR) || ':' || array_to_string(ids, ',')")}
                   AS DECIMAL(38,0))) % 1000000007 AS DECIMAL(38,0)) AS BIGINT) AS ch
          FROM ctx GROUP BY 1)
        SELECT ord, stage, n_rows, metric, ok FROM (
          SELECT CAST(0 AS INTEGER) AS ord, 'survivors' AS stage,
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM mixd) AS n_rows,
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM mixd) AS metric,
                 CAST(1 AS INTEGER) AS ok
          UNION ALL SELECT 1, 'sample',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM docs),
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM mixd
                  WHERE rid < 1500), 1
          UNION ALL SELECT 2, 'trained',
                 (SELECT merges FROM nmg),
                 (SELECT CAST(eos AS BIGINT) FROM vocab), 1
          UNION ALL SELECT 3, 'encoded',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM enc),
                 (SELECT CAST(COALESCE(SUM(len(ids)), 0) AS BIGINT) FROM enc), 1
          UNION ALL SELECT 4, 'packed',
                 (SELECT CAST(COUNT(1) AS BIGINT) FROM ctx),
                 (SELECT CAST(COALESCE(SUM(len(ids)), 0) AS BIGINT) FROM ctx), 1
          UNION ALL SELECT CAST(5 + shard AS INTEGER),
                 'shard_' || CAST(shard AS VARCHAR), n_rows, ch, 1 FROM shards
        ) ORDER BY ord"""),
      "Capstone v3, crawl bytes to delivered tensors: the shared WARC " +
        "front feeds a GPT-2-front byte-BPE trained on the survivors' " +
        "scrubbed text, every sample doc encodes to ids, the " +
        "EOS-separated stream packs into ctx-128 windows and ships " +
        "seq%8-sharded with id-content manifests; the oracle replays " +
        "crawl, training, encode, packing, and every shard hash."),

    // ---------------------------------------------------------------- q294
    Q(
      "q294_tensor_triplet_delivery",
      (s, dir) => {
        // THE FULL TRAINER HANDOFF IN ONE DELIVERY: q287 shipped input
        // ids alone; a trainer step consumes THREE tensors per window —
        // ids (q286), attention spans (q289), causal labels (q291) —
        // and a delivery that verifies only one family would pass a
        // corrupted attention mask or label tensor silently.
        // Sinks.writeTokenTensors shards all three together (seq%8) with
        // a PER-FAMILY per-shard content hash (exact DECIMAL multiset
        // sum of each row's canonical serialization), read back and
        // re-manifested; readback_ok certifies rows, id count, and all
        // three hashes. The oracle replays windows, spans, and labels
        // from its own replayed id stream and recomputes every family
        // hash — a flipped id, a shifted span bound, or one wrong label
        // anywhere fails exactly its family's column on its shard.
        graft.functions.BpeByteExpressions.register(s)
        val corpus = bpeGpt2Corpus(s, dir).localCheckpoint(true)
        val units = graft.operators.BpeByte.pretokenCounts(corpus, "t")
          .localCheckpoint(true)
        val m = graft.operators.BpeByte.fitBlocked(s, units, "w", "wcnt",
          gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)
        val spec = graft.operators.BpeByte.specOf(m)
        val eos = graft.functions.BpeByteKit.IdBase +
          (if (spec.isEmpty) 0 else spec.split(";", -1).length)
        val docs = corpus
          .withColumn("ids", expr(s"bpe_encode_gpt2(t, '$spec')"))
          .select("doc_id", "ids")
        val tensors = graft.operators.Packer
          .packTokenIdsWithSpans(docs, "doc_id", "ids", ctxLen = 128, eosId = eos)
          .withColumn("labels", expr(
            """transform(sequence(0, n_ids - 1), p -> case
                 when p = n_ids - 1 then -100
                 when array_contains(transform(spans, x -> x.a), p + 1) then -100
                 else element_at(ids, p + 2) end)"""))
        // fresh dir per invocation, deleted at JVM exit (scratchDir)
        val out = scratchDir("graft_tensors_")
        graft.sources.Sinks.writeTokenTensors(tensors, out, 8)
          .orderBy("shard")
      },
      Some(s"""
        WITH ${duckGpt2ChainCtes},
        enc AS MATERIALIZED (
          SELECT p.doc_id, flatten(list(b.syms ORDER BY p.i)) AS ids
          FROM (SELECT doc_id, unnest(ps) AS g, generate_subscripts(ps, 1) AS i
                FROM pieces) p
          JOIN bw$gpt2ChainRounds b ON b.g = p.g
          GROUP BY p.doc_id),
        vocab AS (SELECT CAST(256 + COUNT(*) AS INTEGER) AS eos FROM (
          ${duckSymBpeMerges(gpt2ChainRounds)})),
        stream AS MATERIALIZED (
          SELECT flatten(list(list_append(ids, eos) ORDER BY doc_id)) AS st
          FROM enc, vocab GROUP BY ALL),
        ctx AS MATERIALIZED (
          SELECT CAST(i AS BIGINT) AS seq,
                 st[CAST(i * 128 + 1 AS BIGINT):CAST(LEAST((i + 1) * 128, len(st)) AS BIGINT)] AS ids
          FROM stream, unnest(range(0, CAST(ceil(len(st) / 128.0) AS BIGINT))) t(i)),
        offs AS MATERIALIZED (
          SELECT doc_id, CAST(len(ids) + 1 AS BIGINT) AS n,
                 CAST(COALESCE(SUM(len(ids) + 1) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
          FROM enc),
        sp AS MATERIALIZED (
          SELECT w AS seq, doc_id,
                 CAST(GREATEST(0, o - w * 128) AS INTEGER) AS a,
                 CAST(LEAST(128, o + n - w * 128) AS INTEGER) AS b
          FROM offs, unnest(range(o // 128, (o + n - 1) // 128 + 1)) t(w)),
        spstr AS (
          SELECT seq, string_agg(concat(CAST(doc_id AS VARCHAR), ':',
                   CAST(a AS VARCHAR), ':', CAST(b AS VARCHAR)), ';' ORDER BY a) AS ss
          FROM sp GROUP BY seq),
        starts AS (
          SELECT seq, COALESCE(list(a ORDER BY a) FILTER (WHERE a > 0),
                   CAST([] AS INTEGER[])) AS sts
          FROM sp GROUP BY seq),
        lbl AS (
          SELECT c.seq,
                 list_transform(range(0, CAST(len(c.ids) AS BIGINT)), p -> CASE
                   WHEN p = len(c.ids) - 1 THEN -100
                   WHEN list_contains(s.sts, CAST(p + 1 AS INTEGER)) THEN -100
                   ELSE c.ids[CAST(p + 2 AS BIGINT)] END) AS labels
          FROM ctx c JOIN starts s ON s.seq = c.seq),
        fam AS (
          SELECT c.seq, CAST(len(c.ids) AS BIGINT) AS n_ids,
                 ${graft.functions.HashConventions.duckMd5long48(
                   "CAST(c.seq AS VARCHAR) || ':' || array_to_string(c.ids, ',')")} AS ih,
                 ${graft.functions.HashConventions.duckMd5long48(
                   "CAST(c.seq AS VARCHAR) || ':' || s.ss")} AS sh2,
                 ${graft.functions.HashConventions.duckMd5long48(
                   "CAST(c.seq AS VARCHAR) || ':' || array_to_string(l.labels, ',')")} AS lh
          FROM ctx c JOIN spstr s ON s.seq = c.seq JOIN lbl l ON l.seq = c.seq)
        SELECT CAST(seq % 8 AS INTEGER) AS shard,
               CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(SUM(n_ids) AS BIGINT) AS n_ids,
               CAST(CAST(SUM(CAST(ih AS DECIMAL(38,0))) % 1000000007
                 AS DECIMAL(38,0)) AS BIGINT) AS ids_hash,
               CAST(CAST(SUM(CAST(sh2 AS DECIMAL(38,0))) % 1000000007
                 AS DECIMAL(38,0)) AS BIGINT) AS spans_hash,
               CAST(CAST(SUM(CAST(lh AS DECIMAL(38,0))) % 1000000007
                 AS DECIMAL(38,0)) AS BIGINT) AS labels_hash,
               TRUE AS readback_ok
        FROM fam GROUP BY 1 ORDER BY shard"""),
      "The complete trainer handoff: ids + attention spans + causal " +
        "labels sharded together with a per-family per-shard content " +
        "hash (exact DECIMAL multiset sums) and read-back verification; " +
        "the oracle replays all three tensor families from the id " +
        "stream and recomputes every hash — corruption localizes to " +
        "its family and shard.")
  )

  /** q272/q273 per-variant appended sentence tails (doc_id % 4):
    * terminator runs + closers (v0/v1), shared boilerplate sentences
    * (v0/v1/v2 tails repeat across their variant's docs), a
    * missing-terminator tail (v1), and unspaced CJK (v3 — escapes, the
    * file-layer normalization gotcha). The DuckDB side is
    * [[duckSentenceCorpus]]. */
  private def sentenceTail =
    when(col("doc_id") % 4 === 0,
      lit(". Second sentence! Third one? Done."))
      .when(col("doc_id") % 4 === 1,
        lit("... Ellipsis run. Then \"quoted end.\" Tail without terminator"))
      .when(col("doc_id") % 4 === 2,
        lit(". All rights reserved. All rights reserved. Visit the archive index."))
      .otherwise(lit(" \u6f22\u5b57\u3067\u3059\u3002\u6b21\u306e\u6587\uff01"))

  /** DuckDB twin of `split_sentences(c)` — the EXACT two RE2
    * `regexp_replace` passes of [[graft.functions.SplitSentences]]'s
    * documented grammar (pass 1: terminators+closers+whitespace, ws
    * consumed; pass 2: CJK terminators+closers unconditionally), then a
    * chr(30)-marker split with empty segments filtered. The character
    * classes are built with chr() so the oracle SQL stays pure ASCII
    * (terminators U+2026 U+3002 U+FF01 U+FF1F; closers U+00BB U+201D
    * U+2019). */
  private def duckSplitSentences(c: String): String = {
    val cjk = "chr(8230) || chr(12290) || chr(65281) || chr(65311)"
    val clo = "chr(187) || chr(8221) || chr(8217)"
    raw"""list_filter(string_split(regexp_replace(regexp_replace($c,
          '([.!?' || $cjk || ']+["'')\]' || $clo || ']*)[\t\n\f\r ]+',
          '\1' || chr(30), 'g'),
          '([' || $cjk || ']+["'')\]' || $clo || ']*)',
          '\1' || chr(30), 'g'),
        chr(30)), x -> x <> '')"""
  }

  /** q272/q273 constructed sentence corpus: the DuckDB side of the
    * per-variant appended tails (the Spark side spells the same strings;
    * variant 3 is CJK via chr() — the pure-ASCII-SQL discipline). */
  private def duckSentenceCorpus: String =
    """SELECT doc_id, text || CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN '. Second sentence! Third one? Done.'
         WHEN 1 THEN '... Ellipsis run. Then "quoted end." Tail without terminator'
         WHEN 2 THEN '. All rights reserved. All rights reserved. Visit the archive index.'
         ELSE ' ' || chr(28450) || chr(23383) || chr(12391) || chr(12377) ||
              chr(12290) || chr(27425) || chr(12398) || chr(25991) || chr(65281)
         END AS t
       FROM documents"""

  /** q234 gradient-descent hyperparameters — `def`s, not `val`s (the
    * init-order gotcha: `all`'s oracle strings are built during object
    * init and a below-`all` val reads 0 there). */
  private def logitIters = 8
  private def logitLr = 2.0

  /** Generated DuckDB twin of [[graft.operators.Logit.fit]] for q234:
    * feature CTEs (raw → stats → feats, same min-max + exact-DECIMAL
    * mean-rate spelling as the Spark side), then per iteration K a probs
    * CTE p_K (Elliott link under w_{K-1}) and a weights CTE w_K (exact
    * DECIMAL gradient sums, lr step) — MATERIALIZED because each w_K is
    * referenced twice and DuckDB inlines plain CTEs exponentially. */
  private def duckLogitSql: String = {
    val probs = (k: Int) =>
      s"""p_$k AS MATERIALIZED (
         |  SELECT f.y, f.x1, f.x2, f.x3,
         |         0.5 * (1.0 + z / (1.0 + abs(z))) AS p
         |  FROM (SELECT f.y, f.x1, f.x2, f.x3,
         |               w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
         |        FROM feats f CROSS JOIN w_${k - 1} w) f)""".stripMargin
    val step = (k: Int) =>
      s"""w_$k AS MATERIALIZED (
         |  SELECT w.b - $logitLr * (g.g0 / g.n) AS b,
         |         w.w1 - $logitLr * (g.g1 / g.n) AS w1,
         |         w.w2 - $logitLr * (g.g2 / g.n) AS w2,
         |         w.w3 - $logitLr * (g.g3 / g.n) AS w3
         |  FROM w_${k - 1} w CROSS JOIN (
         |    SELECT CAST(COUNT(1) AS DOUBLE) AS n,
         |           CAST(SUM(CAST(round(p - y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS g0,
         |           CAST(SUM(CAST(round((p - y) * x1, 9) AS DECIMAL(28,12))) AS DOUBLE) AS g1,
         |           CAST(SUM(CAST(round((p - y) * x2, 9) AS DECIMAL(28,12))) AS DOUBLE) AS g2,
         |           CAST(SUM(CAST(round((p - y) * x3, 9) AS DECIMAL(28,12))) AS DOUBLE) AS g3
         |    FROM p_$k) g)""".stripMargin
    val rounds = (1 to logitIters).map(k => probs(k) + ",\n" + step(k)).mkString(",\n")
    s"""
       |WITH raw AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(len(ts) AS DOUBLE) AS ntok,
       |         CAST(len(list_distinct(ts)) AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS uniq,
       |         CAST(len(list_filter(ts, t -> t = 'spark')) AS DOUBLE)
       |           / CAST(len(ts) AS DOUBLE) AS rate
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
       |stats AS MATERIALIZED (
       |  SELECT min(ntok) AS ntok_min, max(ntok) AS ntok_max,
       |         min(uniq) AS uniq_min, max(uniq) AS uniq_max,
       |         min(rate) AS rate_min, max(rate) AS rate_max,
       |         CAST(SUM(CAST(round(rate, 9) AS DECIMAL(28,12))) AS DOUBLE)
       |           / CAST(COUNT(1) AS DOUBLE) AS rate_mean
       |  FROM raw),
       |feats AS MATERIALIZED (
       |  SELECT doc_id,
       |         (ntok - ntok_min) / (ntok_max - ntok_min) AS x1,
       |         (uniq - uniq_min) / (uniq_max - uniq_min) AS x2,
       |         (rate - rate_min) / (rate_max - rate_min) AS x3,
       |         CASE WHEN rate > rate_mean THEN 1.0 ELSE 0.0 END AS y
       |  FROM raw CROSS JOIN stats),
       |w_0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |$rounds,
       |p_f AS (
       |  SELECT f.y,
       |         0.5 * (1.0 + z / (1.0 + abs(z))) AS p
       |  FROM (SELECT f.y,
       |               w.b + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 AS z
       |        FROM feats f CROSS JOIN w_$logitIters w) f),
       |acc AS (
       |  SELECT round(CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END) AS DOUBLE)
       |           / CAST(COUNT(1) AS DOUBLE), 6) AS accuracy,
       |         CAST(SUM(y) AS BIGINT) AS n_pos
       |  FROM p_f)
       |SELECT round(w.b, 6) AS b, round(w.w1, 6) AS w_ntok,
       |       round(w.w2, 6) AS w_uniq, round(w.w3, 6) AS w_rate,
       |       acc.accuracy, acc.n_pos
       |FROM w_$logitIters w CROSS JOIN acc""".stripMargin
  }

  /** q283 oracle: the duckLogitSql discipline generalized to the 32
    * hashed char-3-gram bucket features (min-max scaled), the keyword-
    * rate label, a TRAIN-split-only fit, the train-median threshold
    * election, and the held-out confusion + per-million Mann-Whitney
    * AUC audit. */
  private def duckQualityModelSql: String = {
    val n = 32
    val xs = (1 to n).map(j => s"x$j")
    val zExpr = "w.b " + xs.zipWithIndex.map { case (x, i) => s"+ w.w${i + 1} * f.$x" }.mkString(" ")
    val probs = (k: Int) =>
      s"""p_$k AS MATERIALIZED (
         |  SELECT f.y, ${xs.map(x => s"f.$x").mkString(", ")},
         |         0.5 * (1.0 + z / (1.0 + abs(z))) AS p
         |  FROM (SELECT f.y, ${xs.map(x => s"f.$x").mkString(", ")}, $zExpr AS z
         |        FROM tr f CROSS JOIN w_${k - 1} w) f)""".stripMargin
    val step = (k: Int) =>
      s"""w_$k AS MATERIALIZED (
         |  SELECT w.b - $logitLr * (g.g0 / g.n) AS b,
         |         ${xs.zipWithIndex.map { case (_, i) =>
               s"w.w${i + 1} - $logitLr * (g.g${i + 1} / g.n) AS w${i + 1}" }.mkString(",\n         ")}
         |  FROM w_${k - 1} w CROSS JOIN (
         |    SELECT CAST(COUNT(1) AS DOUBLE) AS n,
         |           CAST(SUM(CAST(round(p - y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS g0,
         |           ${xs.zipWithIndex.map { case (x, i) =>
               s"CAST(SUM(CAST(round((p - y) * $x, 9) AS DECIMAL(28,12))) AS DOUBLE) AS g${i + 1}" }
                 .mkString(",\n           ")}
         |    FROM p_$k) g)""".stripMargin
    val rounds = (1 to logitIters).map(k => probs(k) + ",\n" + step(k)).mkString(",\n")
    val h32 = graft.functions.HashConventions.duckMd5long48("g")
    s"""
       |WITH raw AS MATERIALIZED (
       |  SELECT doc_id, rate,
       |         ${(0 until n).map(j =>
             s"COALESCE(CAST(len(list_filter(hs, h -> h = $j)) AS DOUBLE) " +
               s"/ CAST(NULLIF(len(hs), 0) AS DOUBLE), 0.0) AS r${j + 1}")
               .mkString(",\n         ")}
       |  FROM (SELECT doc_id,
       |               COALESCE(CAST(len(list_filter(string_split(text, ' '), t -> t = 'spark')) AS DOUBLE)
       |                 / CAST(NULLIF(len(string_split(text, ' ')), 0) AS DOUBLE), 0.0) AS rate,
       |               list_transform(list_transform(range(1, length(text) - 1),
       |                 i -> substr(text, i, 3)), g -> $h32 % 32) AS hs
       |        FROM documents)),
       |stats AS MATERIALIZED (
       |  SELECT ${(1 to n).map(j => s"min(r$j) AS mn$j, max(r$j) AS mx$j").mkString(",\n         ")},
       |         CAST(SUM(CAST(round(rate, 9) AS DECIMAL(28,12))) AS DOUBLE)
       |           / CAST(COUNT(1) AS DOUBLE) AS rate_mean
       |  FROM raw),
       |feats AS MATERIALIZED (
       |  SELECT doc_id,
       |         ${(1 to n).map(j =>
             s"COALESCE((r$j - mn$j) / nullif(mx$j - mn$j, 0.0), 0.0) AS x$j").mkString(",\n         ")},
       |         CASE WHEN rate > rate_mean THEN 1.0 ELSE 0.0 END AS y,
       |         ${graft.functions.HashConventions
             .duckMd5long48("'q283_split|' || CAST(doc_id AS VARCHAR)")} % 100 < 80 AS train
       |  FROM raw CROSS JOIN stats),
       |tr AS MATERIALIZED (SELECT * FROM feats WHERE train),
       |w_0 AS (SELECT 0.0 AS b, ${xs.zipWithIndex.map { case (_, i) => s"0.0 AS w${i + 1}" }.mkString(", ")}),
       |$rounds,
       |scored AS MATERIALIZED (
       |  SELECT f.train, f.y,
       |         CAST(floor(0.5 * (1.0 + z / (1.0 + abs(z))) * 1000000) AS INTEGER) AS spm
       |  FROM (SELECT f.train, f.y, $zExpr AS z
       |        FROM feats f CROSS JOIN w_$logitIters w) f),
       |tsc AS (SELECT spm, COUNT(1) AS c FROM scored WHERE train GROUP BY spm),
       |trc AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_train FROM scored WHERE train),
       |medt AS (
       |  SELECT MIN(mspm) AS med FROM (
       |    SELECT spm AS mspm,
       |           SUM(c) OVER (ORDER BY spm ROWS BETWEEN UNBOUNDED PRECEDING
       |                        AND CURRENT ROW) AS cum
       |    FROM tsc) CROSS JOIN trc
       |  WHERE cum * 2 >= n_train),
       |held AS MATERIALIZED (
       |  SELECT y, spm, CASE WHEN spm > med THEN 1 ELSE 0 END AS pred
       |  FROM scored CROSS JOIN medt WHERE NOT train),
       |conf AS (
       |  SELECT CAST(COUNT(1) AS BIGINT) AS n_held,
       |         CAST(SUM(CASE WHEN pred = 1 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(SUM(CASE WHEN pred = 1 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |         CAST(SUM(CASE WHEN pred = 0 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       |         CAST(SUM(CASE WHEN pred = 0 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM held),
       |sc AS (
       |  SELECT spm,
       |         SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
       |         SUM(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS nn
       |  FROM held GROUP BY spm),
       |below AS (
       |  SELECT spm, np, nn,
       |         COALESCE(SUM(nn) OVER (ORDER BY spm ROWS BETWEEN UNBOUNDED
       |                                PRECEDING AND 1 PRECEDING), 0) AS cum_nn
       |  FROM sc),
       |aucr AS (
       |  SELECT SUM(np) AS apos, SUM(nn) AS aneg,
       |         SUM(np * (2 * cum_nn + nn)) AS u2
       |  FROM below)
       |SELECT round(w.b, 6) AS b,
       |       ${xs.zipWithIndex.map { case (_, i) => s"round(w.w${i + 1}, 6) AS w${i + 1}" }.mkString(", ")},
       |       trc.n_train, conf.n_held,
       |       CAST(medt.med AS INTEGER) AS med_spm,
       |       conf.tp, conf.fp, conf.tn, conf.fn,
       |       round(CAST(tp + tn AS DOUBLE) / CAST(n_held AS DOUBLE), 6) AS acc,
       |       round(CAST(tp AS DOUBLE) / nullif(CAST(tp + fp AS DOUBLE), 0.0), 6) AS prec,
       |       round(CAST(tp AS DOUBLE) / nullif(CAST(tp + fn AS DOUBLE), 0.0), 6) AS rec,
       |       round(CAST(u2 AS DOUBLE) / nullif(2.0 * apos * aneg, 0.0), 6) AS auc
       |FROM w_$logitIters w CROSS JOIN conf CROSS JOIN aucr CROSS JOIN trc CROSS JOIN medt""".stripMargin
  }

  /** Merge count for the trained-BPE rows (q223/q224) — 16 per the r5
    * verdict's "oracle-green at 16+ merges" bar. A `def`, NOT a `val`:
    * the oracle strings in `all` are built during object init, and a val
    * declared below `all` would still read 0 there (init order), silently
    * generating a 0-round oracle. */
  private def bpeFitMerges = 16

  /** Placeholder code point of merge k — [[graft.operators.Bpe]]'s
    * default private-use-area base (a `def`: init-order gotcha). */
  private def bpeCp(k: Int) = graft.operators.Bpe.DefaultBaseCp + k - 1

  /** Readable spelling of a merge pair: placeholder chars (PUA
    * U+E000+k-1) decoded to <1>..<n> (Column-API fold keeps non-text
    * characters out of parsed SQL text). */
  private def bpeSpell(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to bpeFitMerges).foldLeft(c) { (acc, k) =>
      org.apache.spark.sql.functions.replace(
        acc, lit(bpeCp(k).toChar.toString), lit(s"<$k>"))
    }

  /** DuckDB twin of [[bpeSpell]]. */
  private def duckBpeSpell(e: String): String =
    (1 to bpeFitMerges).foldLeft(e) { (acc, k) => s"replace($acc, chr(${bpeCp(k)}), '<$k>')" }

  /** Generated DuckDB twin of [[graft.operators.Bpe.fit]] at `n` merges:
    * CTEs wc0 (word counts) and, per round r, m_r (1-row winner:
    * pair, n — count-desc pair-asc tie-break) + wc_r (merged spellings).
    * The exact q156 chain shape, generated instead of hand-unrolled. */
  private def duckBpeFitCtes(n: Int): String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and wc_r
    // referencing wc_{r-1} both directly and through m_r would expand the
    // base scan 2^n times (16 rounds = 65536 parquet opens — observed as
    // "Too many open files"); materializing pins each round to one pass
    val sb = new StringBuilder
    sb.append("""wc0 AS MATERIALIZED (
          SELECT w, COUNT(1) AS wcnt
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
          GROUP BY w)""")
    for (r <- 1 to n) {
      sb.append(s""",
        m$r AS MATERIALIZED (
          SELECT pair, CAST(n AS BIGINT) AS n FROM (
            SELECT pair, SUM(wcnt) AS n
            FROM (SELECT wcnt, unnest(list_transform(range(1, length(w)),
                    i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
                  FROM wc${r - 1} WHERE length(w) >= 2)
            GROUP BY pair ORDER BY n DESC, pair LIMIT 1)),
        wc$r AS MATERIALIZED (
          SELECT replace(w, (SELECT pair FROM m$r), chr(${bpeCp(r)})) AS w, wcnt
          FROM wc${r - 1})""")
    }
    sb.toString
  }

  /** Nested-replace application of all `n` trained merges to word `e` —
    * the DuckDB twin of [[graft.operators.Bpe.applyMerges]]'s fold. */
  private def duckBpeMergedWord(e: String, n: Int): String =
    (1 to n).foldLeft(e) { (acc, r) =>
      s"replace($acc, (SELECT pair FROM m$r), chr(${bpeCp(r)}))"
    }

  /** q265/q266 hyperparameters (defs — init-order gotcha): 8192 merges,
    * 64 generated rounds (all three SFs converge in ~16 under the
    * L/R acceptance rule on the fixed 500-doc 4-gram sample; the slack
    * is the exhaustion safety margin), candidate window 16384, up to
    * 1024 accepts per round. */
  private def bpeIntMerges = 8192
  private def bpeIntRounds = 64
  private def bpeIntCandCap = 16384
  private def bpeIntAcceptCap = 1024

  /** Generated DuckDB twin of [[graft.operators.BpeInt.fitCore]] over an
    * arbitrary symbol base — shared by the code-point (q265/q266) and
    * byte-level (q278/q279) chains. `bw0Sql` must define
    * `bw0(g, wcnt, syms)` (the unit table with its base-symbol int
    * lists); per round r the chain generates — `cand_r` (top-candCap
    * int-pair counts, count-desc (a,b)-asc rank), `walk_r` (the greedy
    * LEFT/RIGHT-rule walk as a single `list_reduce` fold over the
    * rank-ordered candidate list — accept (a,b) iff a is no accepted
    * pair's RIGHT and b is no accepted pair's LEFT; state = fixed-width
    * taken counter || '.'-wrapped used-LEFT set plus ','-wrapped
    * used-RIGHT set || chr(2)-separated accepted list — a linear
    * recursive CTE at candCap 16384 measured ~280x slower), `sel_r`
    * (parse the accepted list; midx/id from the running offset),
    * `off_r`, and `bw_r` (batch application as a WINDOW-PARITY pass:
    * unnest positions, left-join the accepted map, gaps-and-islands run
    * ids, odd positions of each match run start a merge — under the L/R
    * rule consecutive matches still only occur for (a,a) runs, since
    * any other adjacency puts a symbol on both sides of the accepted
    * set, and there odd-parity IS greedy left-to-right). Merge ids are
    * `idBase0 + midx` (idBase0 = IdBase - 1: 1114111 for the int chain,
    * 255 for the byte chain). */
  private def duckSymBpeCtes(bw0Sql: String, idBase0: Int, merges: Int,
      rounds: Int, candCap: Int, acceptCap: Int): String = {
    val sb = new StringBuilder
    sb.append(bw0Sql)
    sb.append(""",
        off0 AS (SELECT 0 AS m)""")
    for (r <- 1 to rounds) {
      sb.append(s""",
        cand$r AS MATERIALIZED (
          SELECT a, b, CAST(n AS BIGINT) AS n,
                 CAST(row_number() OVER (ORDER BY n DESC, a, b) AS INTEGER) AS rk
          FROM (
            SELECT syms[i] AS a, syms[i+1] AS b, SUM(wcnt) AS n
            FROM bw${r - 1}, unnest(range(1, len(syms))) t(i)
            GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT $candCap)),
        walk$r AS MATERIALIZED (
          SELECT string_split(st, chr(2))[3] AS accs FROM (
            SELECT list_reduce(
              list_prepend('000000' || chr(2) || chr(2),
                (SELECT COALESCE(list(CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)
                                      ORDER BY rk), CAST([] AS VARCHAR[])) FROM cand$r)),
              (st, c) -> CASE
                WHEN CAST(substring(st, 1, 6) AS INT) >= cap
                  OR strpos(st, ',' || string_split(c, '|')[1] || ',') > 0
                  OR strpos(st, '.' || string_split(c, '|')[2] || '.') > 0
                THEN st
                ELSE concat(
                  lpad(CAST(CAST(substring(st, 1, 6) AS INT) + 1 AS VARCHAR), 6, '0'),
                  '.', string_split(c, '|')[1], '.,', string_split(c, '|')[2], ',',
                  substring(st, 7), ';', c)
              END) AS st
            FROM (SELECT GREATEST(0, LEAST($acceptCap,
                    $merges - (SELECT m FROM off${r - 1}))) AS cap))),
        sel$r AS MATERIALIZED (
          SELECT CAST((SELECT m FROM off${r - 1}) + ark AS INTEGER) AS midx,
                 $r AS rnd,
                 CAST(string_split(e, '|')[1] AS INTEGER) AS a,
                 CAST(string_split(e, '|')[2] AS INTEGER) AS b,
                 CAST($idBase0 + (SELECT m FROM off${r - 1}) + ark AS INTEGER) AS id
          FROM (SELECT unnest(string_split(accs, ';')) AS e,
                       generate_subscripts(string_split(accs, ';'), 1) - 1 AS ark
                FROM walk$r) WHERE e <> ''),
        off$r AS MATERIALIZED (
          SELECT (SELECT m FROM off${r - 1}) + COALESCE(CAST(COUNT(*) AS INTEGER), 0) AS m
          FROM sel$r),
        bw$r AS MATERIALIZED (
          SELECT g, wcnt, list(v ORDER BY i) AS syms FROM (
            SELECT g, wcnt, i,
                   CASE WHEN strt THEN mid
                        WHEN COALESCE(lag(strt) OVER (PARTITION BY g ORDER BY i), FALSE) THEN NULL
                        ELSE s END AS v
            FROM (
              SELECT g, wcnt, i, s, mid,
                     (mid IS NOT NULL AND
                      row_number() OVER (PARTITION BY g, f, isl ORDER BY i) % 2 = 1) AS strt
              FROM (
                SELECT p.g, p.wcnt, p.i, p.s, m.id AS mid,
                       (m.id IS NOT NULL) AS f,
                       p.i - row_number() OVER (PARTITION BY p.g, (m.id IS NOT NULL) ORDER BY p.i) AS isl
                FROM (SELECT g, wcnt, i, syms[i] AS s,
                             CASE WHEN i < len(syms) THEN syms[i+1] END AS s2
                      FROM bw${r - 1}, unnest(range(1, len(syms)+1)) t(i)) p
                LEFT JOIN sel$r m ON m.a = p.s AND m.b = p.s2)))
          WHERE v IS NOT NULL
          GROUP BY g, wcnt)""")
    }
    sb.toString
  }

  /** All accepted merges of a generated symbol-BPE chain, with counts. */
  private def duckSymBpeMerges(rounds: Int): String =
    (1 to rounds).map(r =>
      s"SELECT s.midx, s.rnd, s.a, s.b, s.id, c.n FROM sel$r s JOIN cand$r c ON c.a = s.a AND c.b = s.b")
      .mkString("\n          UNION ALL ")

  /** The q265/q266 chain: code-point base symbols over the word-4-gram
    * unit table of the 500-doc sample (merge ids from 1114112 =
    * [[graft.operators.BpeInt.IdBase]]). */
  private def duckBpeIntCtes: String = duckSymBpeCtes(
    s"""bw0 AS MATERIALIZED (
          SELECT g, CAST(COUNT(1) AS BIGINT) AS wcnt,
                 list_transform(range(1, length(g) + 1),
                   i -> CAST(unicode(substring(g, i, 1)) AS INTEGER)) AS syms
          FROM (
            SELECT array_to_string(tk[i:i+3], ' ') AS g
            FROM (SELECT string_split(text, ' ') AS tk FROM documents WHERE doc_id < 500),
                 unnest(range(1, len(tk) - 2)) u(i))
          GROUP BY g)""",
    1114111, bpeIntMerges, bpeIntRounds, bpeIntCandCap, bpeIntAcceptCap)

  /** All accepted merges of the generated int-BPE chain, with counts. */
  private def duckBpeIntMerges: String = duckSymBpeMerges(bpeIntRounds)

  /** q281 fixture strings (defs — init-order gotcha). The nav and
    * footer text must PASS extract_main's content rules (long, unlinked)
    * so only container pruning can remove them; the boilerplate sentence
    * appears on every page so the df >= 5 scrub drops it. All pure
    * ASCII except the article body (accented via the q246 replace). */
  private def capBoiler = "Subscribe to our newsletter for updates and announcements today."
  private def capHtmlPre = "<html><head><title>t</title></head><body>" +
    "<nav>Primary navigation listing every site section and archive</nav><div><p>"
  private def capHtmlMid = "</p><p>" + capBoiler + "</p></div>" +
    "<footer>All rights reserved worldwide by the operator company</footer></body></html>"
  private def capEnvelope =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n"

  /** Build (once per sf dir, content-addressed temp path) the q281 WARC
    * crawl fixture from the documents table: per doc a gzip WARC
    * response whose payload is an ISO-8859-1 HTTP response wrapping the
    * dressed page (article = accented text, kind suffix, terminator);
    * planted utm_source re-crawls (doc_id % 7 = 3, identical payload),
    * one-token near-dup variants (doc_id % 11 = 5, /v/ path), and
    * request records (doc_id % 5 = 0). Four gzip segments by
    * doc_id % 4. The collect is FIXTURE GENERATION over the bounded
    * test corpus (500-5000 rows), not a data-path collect — the
    * pipeline itself reads the bytes back through format("warc"). */
  /** DuckDB replay of the shared crawl front ([[capstoneStages]]): the
    * fixture construction (base/recs/pg/doc2 + envelope lengths), the
    * sentence scrub (se/bl/scr/scrt), the canonical-URL screen (uk —
    * kind 1 is the planted utm re-crawl, always the losing side), the
    * MinHash near-dup screen (sigs/banded/pairs/shv/dropb -> nk), and
    * the hash mixture (mixd). q281 accounts these stages; q293 trains
    * and encodes over mixd's scrubbed text. */
  private def duckCapstoneCtes: String = s"""base AS (
          SELECT doc_id, source,
                 replace(replace(replace(text, 'a', 'á'), 'e', 'é'), 'o', 'ø') AS acc
          FROM documents),
        recs AS (
          SELECT doc_id, source, acc, 3 * doc_id AS rid, 0 AS kind FROM base
          UNION ALL
          SELECT doc_id, source, acc, 3 * doc_id + 1, 1 FROM base WHERE doc_id % 7 = 3
          UNION ALL
          SELECT doc_id, source, acc, 3 * doc_id + 2, 2 FROM base WHERE doc_id % 11 = 5),
        pg AS (
          SELECT rid, doc_id, kind,
                 acc || CASE WHEN kind = 2 THEN ' zx' || CAST(doc_id AS VARCHAR)
                             ELSE '' END || '.' AS p1
          FROM recs),
        doc2 AS (
          SELECT rid, kind, p1,
                 '$capHtmlPre' || p1 || '$capHtmlMid' AS html,
                 CASE WHEN length(replace(p1, ' ', '')) >= 25
                      THEN p1 || chr(10) || '$capBoiler'
                      ELSE '$capBoiler' END AS article
          FROM pg),
        lens AS (
          SELECT rid,
                 CAST(length('HTTP/1.1 200 OK' || chr(13) || chr(10) ||
                     'Content-Type: text/html; charset=iso-8859-1' ||
                     chr(13) || chr(10) || chr(13) || chr(10))
                   + length(html) AS BIGINT) AS clen,
                 CAST(length(html) AS BIGINT) AS hlen,
                 CAST(length(article) AS BIGINT) AS alen
          FROM doc2),
        reqlens AS (
          SELECT CAST(length('GET /p/' || CAST(doc_id AS VARCHAR) || ' HTTP/1.1' ||
                     chr(13) || chr(10) || chr(13) || chr(10)) AS BIGINT) AS clen
          FROM base WHERE doc_id % 5 = 0),
        se AS (
          SELECT rid, kind, unnest(sents) AS sent, generate_subscripts(sents, 1) AS pos
          FROM (SELECT rid, kind, ${duckSplitSentences("article")} AS sents FROM doc2)),
        bl AS (
          SELECT sent FROM se GROUP BY sent HAVING COUNT(DISTINCT rid) >= 5),
        scr AS (
          SELECT rid, kind,
                 array_to_string(list(s.sent ORDER BY s.pos), ' ') AS scrubbed
          FROM se s LEFT JOIN bl ON bl.sent = s.sent
          WHERE bl.sent IS NULL
          GROUP BY rid, kind),
        scrt AS (
          SELECT rid, kind, scrubbed, string_split(scrubbed, ' ') AS toks,
                 CAST(len(string_split(scrubbed, ' ')) AS BIGINT) AS n_tok
          FROM scr),
        uk AS (SELECT * FROM scrt WHERE kind <> 1),
        sigs AS (
          SELECT rid, ${duckMinhashSelect.mkString(", ")}
          FROM uk WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, rid FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, rid FROM sigs),
        pairs AS (
          SELECT DISTINCT a.rid AS id_a, b.rid AS id_b
          FROM banded a JOIN banded b
            ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.rid < b.rid),
        shv AS (SELECT rid, $duckShingles AS sh FROM uk WHERE len(toks) >= 3),
        dropb AS (
          SELECT DISTINCT p.id_b AS rid
          FROM pairs p JOIN shv a ON p.id_a = a.rid JOIN shv b ON p.id_b = b.rid
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        nk AS (SELECT * FROM uk WHERE rid NOT IN (SELECT rid FROM dropb)),
        mixd AS (
          SELECT * FROM nk
          WHERE ${duckMd5long("'cap_mix|' || CAST(rid AS VARCHAR)")} % 1000000 < 800000)"""

  /** The crawl front shared by q281 (stage accounting) and q293 (tensor
    * delivery): WARC scan (record_type pushdown) -> charset-aware
    * decode_payload + http_body peel -> extract_main -> sentence
    * boilerplate scrub -> canonical-URL exact screen -> MinHash-LSH +
    * exact-Jaccard near-dup screen -> hash-threshold mixture. Every
    * stage frame is returned so q281 can account each; `nearKept` and
    * `mixed` RETAIN the scrubbed text so q293 can tokenize the
    * survivors. */
  private case class CapstoneStages(
      all: org.apache.spark.sql.DataFrame,
      extracted: org.apache.spark.sql.DataFrame,
      scrubbed: org.apache.spark.sql.DataFrame,
      urlKept: org.apache.spark.sql.DataFrame,
      nearKept: org.apache.spark.sql.DataFrame,
      mixed: org.apache.spark.sql.DataFrame)

  private def capstoneStages(
      s: org.apache.spark.sql.SparkSession, dir: String): CapstoneStages = {
    graft.functions.HttpExpressions.register(s)
    graft.functions.HtmlExpressions.register(s)
    graft.functions.UnicodeExpressions.register(s)
    graft.functions.UrlExpressions.register(s)
    val warcDir = capstoneWarcFixture(s, dir)
    val all = s.read.format("warc").load(warcDir)
    val resp = all.filter(col("record_type") === "response")
      .selectExpr("record_id", "target_uri", "payload", "content_length")
      .withColumn("d", expr(
        "cast(regexp_extract(record_id, 'cap-([0-9]+)-', 1) as bigint)"))
      .withColumn("kind", expr(
        "cast(regexp_extract(record_id, '-([0-9]+)>', 1) as int)"))
      .withColumn("rid", expr("d * 3 + kind"))
    val extracted = resp
      .withColumn("html", expr(
        "http_body(decode_payload(payload, cast(null as string)))"))
      .withColumn("article", expr("extract_main(html)"))
      .select("rid", "target_uri", "content_length", "html", "article")
      .localCheckpoint(true) // read by 3 accounting branches + the scrub
    val sent = extracted
      .select(col("rid"), col("target_uri"),
        posexplode(expr("split_sentences(article)")).as(Seq("pos", "sent")))
    val boiler = sent.groupBy("sent")
      .agg(countDistinct(col("rid")).as("sdf")).filter(col("sdf") >= 5)
    val scrubbed = sent.join(broadcast(boiler), Seq("sent"), "left")
      .filter(col("sdf").isNull)
      .groupBy("rid", "target_uri")
      .agg(expr("array_join(transform(sort_array(collect_list(struct(pos, sent))), " +
        "x -> x.sent), ' ')").as("scrubbed"))
      .withColumn("toks", split(col("scrubbed"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .localCheckpoint(true)
    // exact screen: canonical-URL election (min rid per canonical key)
    val urlKept = scrubbed
      .withColumn("curl", expr("canonical_url(target_uri)"))
      .withColumn("rk", expr(
        "row_number() over (partition by curl order by rid)"))
      .filter(col("rk") === 1).drop("rk")
      .localCheckpoint(true)
    // near-dup screen: LSH candidates, exact-Jaccard verify >= 0.5,
    // min-id election (drop the larger side of every verified pair)
    val cand = graft.operators.Dedup
      .minhashLshCandidates(s, urlKept, "rid", "scrubbed")
    val sh = urlKept.filter(size(col("toks")) >= 3)
      .selectExpr("rid", "word_ngrams(toks, 3) as sh")
    val dropB = cand
      .join(sh.select(col("rid").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("rid").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .filter(expr("cast(size(array_intersect(sh_a, sh_b)) as double) " +
        "/ size(array_union(sh_a, sh_b)) >= 0.5"))
      .select(col("id_b").as("rid")).distinct()
    val nearKept = urlKept.join(dropB, Seq("rid"), "left_anti")
      .withColumn("src", expr("url_host(target_uri)"))
      .select("src", "rid", "n_tok", "scrubbed")
      .localCheckpoint(true)
    val mixed = graft.operators.Mixture.sampleByRates(
      nearKept, "src", "rid", Map.empty, defaultRate = 0.8, salt = "cap_mix")
      .localCheckpoint(true)
    CapstoneStages(all, extracted, scrubbed, urlKept, nearKept, mixed)
  }

  /** Fixture-build lock: parallel test suites may hit the same qNNN
    * lambda concurrently (sbt runs suites in parallel in one JVM) — the
    * build must be once-and-atomic per path. */
  private val capstoneLock = new Object

  private def capstoneWarcFixture(
      s: org.apache.spark.sql.SparkSession, dir: String): String = capstoneLock.synchronized {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val base = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_capstone_" + Integer.toHexString(dir.hashCode))
    val marker = new java.io.File(base, "_COMPLETE")
    if (!marker.exists()) {
      if (base.exists()) {
        base.listFiles().foreach(_.delete())
      } else {
        require(base.mkdirs(), s"cannot create fixture dir $base")
      }
      val rows = table(s, dir, "documents")
        .selectExpr("doc_id", "source", "text").orderBy("doc_id").collect()
      def acc(t: String): String =
        t.replace('a', '\u00e1').replace('e', '\u00e9').replace('o', '\u00f8')
      def respPayload(p1: String): Array[Byte] = {
        val html = capHtmlPre + p1 + capHtmlMid
        (capEnvelope + html).getBytes(iso)
      }
      val outs = (0 until 4).map { k =>
        new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(new java.io.File(base, f"cap-seg-$k.warc.gz")))
      }
      rows.foreach { r =>
        val d = r.getLong(0)
        val src = r.getString(1)
        val a = acc(r.getString(2))
        val o = outs((d % 4).toInt)
        def wr(typ: String, uri: String, payload: Array[Byte], k: Int): Unit =
          o.write(graft.sources.warc.WarcCodec.encode(Seq(
            "WARC-Type" -> typ,
            "WARC-Record-ID" -> s"<urn:uuid:cap-$d-$k>",
            "WARC-Target-URI" -> uri,
            "WARC-Date" -> "2024-07-01T00:00:00Z"), payload))
        val uriMain = s"https://WWW.$src.example/p/$d"
        wr("response", uriMain, respPayload(a + "."), 0)
        if (d % 7 == 3) wr("response", uriMain + "?utm_source=feed", respPayload(a + "."), 1)
        if (d % 11 == 5)
          wr("response", s"https://WWW.$src.example/v/$d", respPayload(a + " zx" + d + "."), 2)
        if (d % 5 == 0) wr("request", uriMain, s"GET /p/$d HTTP/1.1\r\n\r\n".getBytes(iso), 3)
      }
      outs.foreach(_.close())
      require(marker.createNewFile(), s"cannot write fixture marker $marker")
    }
    base.getAbsolutePath
  }

  /** q278/q279 hyperparameters (defs — init-order gotcha): 8192 merges
    * over the byte alphabet, 48 generated rounds (the L/R rule converges
    * in ~16-20 on the mixed-script 4-gram sample; the slack is the
    * exhaustion margin), candidate window 16384, up to 1024 accepts per
    * round. */
  private def bpeByteMerges = 8192
  private def bpeByteRounds = 48
  private def bpeByteCandCap = 16384
  private def bpeByteAcceptCap = 1024

  /** The q278/q279 training corpus: the q264 mixed-script construction
    * (per doc_id % 3 an unspaced CJK tail or a mixed Latin-CJK run) over
    * the fixed 500-doc sample — multibyte UTF-8 must be REAL for a
    * byte-level trainer to mean anything. tokenize_text's locked grammar
    * (q264) turns the tails into the explicit token lists the oracle
    * replays. */
  private def bpeByteCorpus(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    table(s, dir, "documents").filter(col("doc_id") < 500)
      .select(concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" \u6f22\u5b57\u30c6\u30b9\u30c8"))
          .when(col("doc_id") % 3 === 1, lit(" abc\u6f22\u5b57def"))
          .otherwise(lit(""))).as("t"))

  /** The q278/q279 chain: UTF-8 BYTE base symbols (standard encoding
    * arithmetic per code point) over the word-4-gram units of the
    * mixed-script corpus (merge ids from 256 =
    * [[graft.operators.BpeByte.IdBase]]). */
  private def duckBpeByteCtes: String = duckSymBpeCtes(
    s"""bw0 AS MATERIALIZED (
          SELECT g, CAST(COUNT(1) AS BIGINT) AS wcnt,
                 flatten(list_transform(
                   list_transform(range(1, length(g) + 1), i -> unicode(substring(g, i, 1))),
                   cp -> CASE WHEN cp < 128 THEN [CAST(cp AS INTEGER)]
                     WHEN cp < 2048 THEN [CAST(192 + cp // 64 AS INTEGER),
                                          CAST(128 + cp % 64 AS INTEGER)]
                     WHEN cp < 65536 THEN [CAST(224 + cp // 4096 AS INTEGER),
                                           CAST(128 + (cp // 64) % 64 AS INTEGER),
                                           CAST(128 + cp % 64 AS INTEGER)]
                     ELSE [CAST(240 + cp // 262144 AS INTEGER),
                           CAST(128 + (cp // 4096) % 64 AS INTEGER),
                           CAST(128 + (cp // 64) % 64 AS INTEGER),
                           CAST(128 + cp % 64 AS INTEGER)] END)) AS syms
          FROM (
            SELECT array_to_string(tk[i:i+3], ' ') AS g
            FROM (SELECT list_concat(string_split(text, ' '),
                         CASE CAST(doc_id % 3 AS INTEGER)
                           WHEN 0 THEN [chr(28450) || chr(23383), chr(23383) || chr(12486),
                                        chr(12486) || chr(12473), chr(12473) || chr(12488)]
                           WHEN 1 THEN ['abc', chr(28450) || chr(23383), 'def']
                           ELSE [] END) AS tk
                  FROM documents WHERE doc_id < 500),
                 unnest(range(1, len(tk) - 2)) u(i))
          GROUP BY g)""",
    255, bpeByteMerges, bpeByteRounds, bpeByteCandCap, bpeByteAcceptCap)

  /** All accepted merges of the generated byte-BPE chain, with counts. */
  private def duckBpeByteMerges: String = duckSymBpeMerges(bpeByteRounds)

  /** q285 hyperparameters (defs — init-order gotcha): 256 merges over
    * ~55 distinct pre-token units (total merge demand is ~280, so the
    * budget leaves a multi-token tail — the sub-word regime), 16 rounds
    * (the L/R rule exhausts the budget in ~5 on this unit table; the
    * slack is the exhaustion margin). */
  private def gpt2ChainMerges = 256
  private def gpt2ChainRounds = 16
  private def gpt2ChainCandCap = 512
  private def gpt2ChainAcceptCap = 64

  /** The q285 corpus: the q278 mixed-script construction WITH doc_id
    * (per-doc output rows) — multibyte UTF-8 keeps byte-level merges
    * honest, and `pretokenize_gpt2` sees the raw text. */
  private def bpeGpt2Corpus(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    table(s, dir, "documents").filter(col("doc_id") < 500)
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" \u6f22\u5b57\u30c6\u30b9\u30c8"))
          .when(col("doc_id") % 3 === 1, lit(" abc\u6f22\u5b57def"))
          .otherwise(lit(""))).as("t"))

  /** DuckDB replay of `pretokenize_gpt2` over column `c` -> ordered
    * piece list. RE2 (DuckDB's engine) has no lookahead, so the
    * published pattern's `\\s+(?!\\S)` (a whitespace run followed by
    * non-space surrenders its LAST char to the next piece's ` ?` prefix)
    * is reproduced by first splitting every such run before its last
    * character with a chr(30) sentinel (one regexp_replace — runs are
    * disjoint, one insertion each), then tiling each sentinel-delimited
    * segment with the lookahead-free alternatives. `\\s` is spelled
    * `[\\t-\\r ]` (tab..CR + space) to pin Java's whitespace set over
    * the fixture's ASCII text; the contraction/letter/number/symbol
    * alternatives and their order are verbatim from the published
    * pattern. chr(30) itself never occurs in the corpus (letters,
    * spaces, and the CJK tails only). */
  private def duckGpt2PretokExpr(c: String): String =
    s"""flatten(list_transform(
          string_split(regexp_replace($c,
            '([\\t-\\r ])([\\t-\\r ])([^\\t-\\r ])', '\\1' || chr(30) || '\\2\\3', 'g'),
            chr(30)),
          seg -> regexp_extract_all(seg,
            '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|[\\t-\\r ]+')))"""

  /** The byte-level unit table twin of
    * [[graft.operators.BpeByte.pretokenCounts]]: pre-token strings from
    * a `pieces` CTE expanded to UTF-8 byte symbol lists with counts —
    * shared by the q285 chain and the q293 capstone chain. */
  private def duckByteBw0: String =
    """bw0 AS MATERIALIZED (
          SELECT g, CAST(COUNT(1) AS BIGINT) AS wcnt,
                 flatten(list_transform(
                   list_transform(range(1, length(g) + 1), i -> unicode(substring(g, i, 1))),
                   cp -> CASE WHEN cp < 128 THEN [CAST(cp AS INTEGER)]
                     WHEN cp < 2048 THEN [CAST(192 + cp // 64 AS INTEGER),
                                          CAST(128 + cp % 64 AS INTEGER)]
                     WHEN cp < 65536 THEN [CAST(224 + cp // 4096 AS INTEGER),
                                           CAST(128 + (cp // 64) % 64 AS INTEGER),
                                           CAST(128 + cp % 64 AS INTEGER)]
                     ELSE [CAST(240 + cp // 262144 AS INTEGER),
                           CAST(128 + (cp // 4096) % 64 AS INTEGER),
                           CAST(128 + (cp // 64) % 64 AS INTEGER),
                           CAST(128 + cp % 64 AS INTEGER)] END)) AS syms
          FROM (SELECT unnest(ps) AS g FROM pieces)
          GROUP BY g)"""

  /** The q285 chain: docs (corpus with doc_id), pieces (the replayed
    * pre-tokenization), bw0 (pre-token unit counts in UTF-8 byte
    * symbols — the [[graft.operators.BpeByte.pretokenCounts]] twin),
    * then the shared per-round election replay. */
  private def duckGpt2ChainCtes: String = duckSymBpeCtes(
    s"""docs AS MATERIALIZED (
          SELECT doc_id, text || CASE CAST(doc_id % 3 AS INTEGER)
            WHEN 0 THEN ' ' || chr(28450) || chr(23383) || chr(12486) || chr(12473) || chr(12488)
            WHEN 1 THEN ' abc' || chr(28450) || chr(23383) || 'def'
            ELSE '' END AS t
          FROM documents WHERE doc_id < 500),
        pieces AS MATERIALIZED (
          SELECT doc_id, ${duckGpt2PretokExpr("t")} AS ps FROM docs),
        $duckByteBw0""",
    255, gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)

  /** The q293 capstone chain: the crawl front ([[duckCapstoneCtes]]),
    * the tokenizer-training sample (survivors from the first 500 crawl
    * docs — production trains the tokenizer on a sample of the cleaned
    * corpus), the replayed GPT-2 pre-tokenization of the SCRUBBED text,
    * and the shared election replay over its byte unit table. */
  private def duckCapstoneChainCtes: String = duckSymBpeCtes(
    s"""$duckCapstoneCtes,
        docs AS MATERIALIZED (
          SELECT rid AS doc_id, scrubbed AS t FROM mixd WHERE rid < 1500),
        pieces AS MATERIALIZED (
          SELECT doc_id, ${duckGpt2PretokExpr("t")} AS ps FROM docs),
        $duckByteBw0""",
    255, gpt2ChainMerges, gpt2ChainRounds, gpt2ChainCandCap, gpt2ChainAcceptCap)

  /** q247/q248 hyperparameters (defs — init-order gotcha): 512 merges,
    * 24 generated rounds (all three SFs converge in ~8 under the L/R
    * acceptance rule; the slack is the exhaustion margin), candidate
    * list 512, 64 accepted per round. */
  private def bpeBlkMerges = 512
  private def bpeBlkRounds = 24
  private def bpeBlkCandCap = 512
  private def bpeBlkAcceptCap = 64

  /** Generated DuckDB twin of [[graft.operators.Bpe.fitBlocked]] over the
    * word-BIGRAM unit table (`Bpe.bigramCounts`): per round r —
    * `cand_r` (top-candCap pair counts, count-desc pair-asc rank),
    * `sel_r` (the greedy LEFT/RIGHT-rule walk as a LINEAR RECURSIVE CTE
    * over rank order, carrying used-left and used-right char sets;
    * `taken` is the accept index, truncated by the remaining-merges
    * budget — greedy acceptance has the prefix property, so truncation
    * equals running with the smaller cap), `off_r` (cumulative merge
    * count) and `bw_r`
    * (the batch applied in accept order via `list_reduce` over an
    * ark-ordered pair||chr(1)||sym merge list prepended with the word —
    * DuckDB 1.0 has no 3-arg list_reduce). Placeholders are the PUA
    * chars `chr(57343 + midx)` — [[graft.operators.Bpe.DefaultBaseCp]]. */
  private def duckBpeBlockedCtes: String = {
    val sb = new StringBuilder
    sb.append("""bw0 AS MATERIALIZED (
          SELECT w, CAST(COUNT(1) AS BIGINT) AS wcnt FROM (
            SELECT toks[i] || ' ' || toks[i + 1] AS w
            FROM (SELECT string_split(text, ' ') AS toks FROM documents),
                 unnest(range(1, len(toks))) u(i))
          GROUP BY w),
        off0 AS (SELECT 0 AS m)""")
    for (r <- 1 to bpeBlkRounds) {
      // L/R rule: reject pair ab iff a is an accepted pair's RIGHT char or
      // b is an accepted pair's LEFT char (self-pairs land in both sets)
      val ok = s"""(w.taken < $bpeBlkAcceptCap
                     AND strpos(w.usedr, substring(c.pair, 1, 1)) = 0
                     AND strpos(w.usedl, substring(c.pair, 2, 1)) = 0)"""
      sb.append(s""",
        cand$r AS MATERIALIZED (
          SELECT pair, CAST(n AS BIGINT) AS n,
                 CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER) AS rk
          FROM (
            SELECT pair, SUM(wcnt) AS n
            FROM (SELECT wcnt, unnest(list_transform(range(1, length(w)),
                    i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
                  FROM bw${r - 1} WHERE length(w) >= 2)
            GROUP BY pair ORDER BY n DESC, pair LIMIT $bpeBlkCandCap)),
        sel$r AS MATERIALIZED (
          WITH RECURSIVE walk(rk, taken, usedl, usedr, pair, n) AS (
            SELECT 0, 0, '', '', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
            UNION ALL
            SELECT c.rk,
                   CASE WHEN $ok THEN w.taken + 1 ELSE w.taken END,
                   CASE WHEN $ok THEN w.usedl || substring(c.pair, 1, 1) ELSE w.usedl END,
                   CASE WHEN $ok THEN w.usedr || substring(c.pair, 2, 1) ELSE w.usedr END,
                   CASE WHEN $ok THEN c.pair ELSE CAST(NULL AS VARCHAR) END,
                   CASE WHEN $ok THEN c.n ELSE CAST(NULL AS BIGINT) END
            FROM walk w JOIN cand$r c ON c.rk = w.rk + 1)
          SELECT pair, n, CAST(taken AS INTEGER) AS ark,
                 CAST((SELECT m FROM off${r - 1}) + taken AS INTEGER) AS midx
          FROM walk
          WHERE pair IS NOT NULL
            AND taken <= GREATEST(0, $bpeBlkMerges - (SELECT m FROM off${r - 1}))),
        off$r AS MATERIALIZED (
          SELECT COALESCE(CAST(MAX(midx) AS INTEGER), (SELECT m FROM off${r - 1})) AS m
          FROM sel$r),
        bw$r AS MATERIALIZED (
          SELECT list_reduce(
                   list_prepend(w, (SELECT COALESCE(
                     list(pair || chr(1) || chr(57343 + midx) ORDER BY ark),
                     CAST([] AS VARCHAR[])) FROM sel$r)),
                   (acc, mm) -> replace(acc, string_split(mm, chr(1))[1],
                                        string_split(mm, chr(1))[2])) AS w,
                 wcnt
          FROM bw${r - 1})""")
    }
    sb.toString
  }

  /** All accepted merges of the generated chain, in global order. */
  private def duckBpeBlockedMerges: String =
    (1 to bpeBlkRounds).map(r => s"SELECT midx, pair, n FROM sel$r")
      .mkString("\n          UNION ALL ")

  /** Spell ONE symbol char: PUA placeholder -> <k>, else the char. */
  private def duckBpeBlkSpell(c: String): String =
    s"CASE WHEN unicode($c) >= 57344 THEN ('<' || CAST(unicode($c) - 57343 AS VARCHAR) || '>') ELSE $c END"

  /** Spark twin of [[duckBpeBlkSpell]] (ascii() returns the code point). */
  private def bpeBlkSpell(c: String): String =
    s"case when ascii($c) >= 57344 then concat('<', cast(ascii($c) - 57343 as string), '>') else $c end"

  /** The verified curation CTE chain (corpus = docs >= 10, eval = docs
    * < 10) shared by q60 (per-doc verdicts) and q226 (the end-to-end
    * pipeline composition): quality/repetition signals, contamination,
    * exact dedup, MinHash-LSH pairs, recursive-CTE connected components —
    * each stage the SAME SQL fragment its standalone query verified
    * (q29/q55/q56/q23/q57). Ends at `cc(id, cluster_id)`; callers join
    * sig2/exact/contam/cc into verdicts. Requires WITH RECURSIVE. */
  private def duckCurationCtes: String = s"""corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 10),
        base AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM corpus),
        sig AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 CAST(LENGTH(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS avg_token_len,
                 list_transform(range(1, len(toks) - 3), i ->
                   toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                   toks[i+3] || ' ' || toks[i+4]) AS g5
          FROM base),
        sig2 AS (
          SELECT doc_id, n_tokens, avg_token_len,
                 CASE WHEN len(g5) > 0
                      THEN CAST(len(g5) - len(list_distinct(g5)) AS DOUBLE) / len(g5)
                      ELSE CAST(0.0 AS DOUBLE) END AS dup_frac
          FROM sig),
        posts AS (
          SELECT doc_id, unnest(list_distinct($duckShingles)) AS shingle
          FROM base WHERE len(toks) >= 3),
        evalset AS (
          SELECT DISTINCT unnest($duckShingles) AS shingle
          FROM (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id < 10)
          WHERE len(toks) >= 3),
        contam AS (
          SELECT p.doc_id, CAST(COUNT(e.shingle) AS DOUBLE) / COUNT(1) AS contam_frac
          FROM posts p LEFT JOIN evalset e ON p.shingle = e.shingle
          GROUP BY p.doc_id),
        exact AS (
          SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
          FROM corpus),
        sigs AS (
          SELECT doc_id, ${duckMinhashSelect.mkString(", ")}
          FROM base WHERE len(toks) >= 3),
        banded AS (
          SELECT 0 AS band_no, minh0::VARCHAR || '_' || minh1::VARCHAR AS band_key, doc_id FROM sigs
          UNION ALL
          SELECT 1 AS band_no, minh2::VARCHAR || '_' || minh3::VARCHAR AS band_key, doc_id FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b ON a.band_no = b.band_no AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        cc AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)"""

  /** (doc_id, bm25) for every document matching >= 1 query term — q94's
    * scorer, shared with the q99 fusion. The "query" is the 3 globally
    * most frequent tokens (deterministic, worst-case posting lists). */
  private def bm25Frame(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val toks = table(s, dir, "documents")
      .select(col("doc_id"), explode(expr("tokenize_text(text)")).as("tok"))
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = lens.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
    val qterms = toks.groupBy("tok").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(3).select("tok")
    val dfs = toks.join(broadcast(qterms), Seq("tok"))
      .select("tok", "doc_id").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val tfs = toks.join(broadcast(qterms), Seq("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    tfs
      .join(lens, Seq("doc_id"))
      .join(broadcast(dfs), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("sterm", expr(
        """ln(1.0d + (cast(nd - df as double) + 0.5d) / (cast(df as double) + 0.5d))
           * ((cast(tf as double) * 2.2d)
              / (cast(tf as double)
                 + 1.2 * (0.25d + 0.75d * (cast(dl as double)
                                           / (cast(tt as double) / cast(nd as double))))))"""))
      .groupBy("doc_id")
      .agg(expr(
        """round(aggregate(
             transform(array_sort(collect_list(struct(tok, sterm))), p -> p.sterm),
             cast(0 as double), (a, v) -> a + v), 6)""").as("bm25"))
  }

  /** DuckDB twin of [[bm25Frame]]: CTE chain ending in `bm(doc_id, bm25)`. */
  private lazy val duckBm25Ctes: String = """
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    lens AS (SELECT doc_id, COUNT(1) AS dl FROM toks GROUP BY doc_id),
    st AS (SELECT COUNT(1) AS nd, CAST(SUM(dl) AS BIGINT) AS tt FROM lens),
    qt AS (
      SELECT tok FROM (
        SELECT tok, COUNT(1) AS f FROM toks GROUP BY tok
        ORDER BY f DESC, tok LIMIT 3)),
    dft AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df
      FROM toks JOIN qt USING (tok) GROUP BY tok),
    tft AS (
      SELECT doc_id, tok, COUNT(1) AS tf
      FROM toks JOIN qt USING (tok) GROUP BY doc_id, tok),
    sc AS (
      SELECT t.doc_id, t.tok,
             ln(1.0 + (CAST(st.nd - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(t.tf AS DOUBLE) * 2.2)
                / (CAST(t.tf AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE)
                                           / (CAST(st.tt AS DOUBLE) / CAST(st.nd AS DOUBLE)))))) AS sterm
      FROM tft t JOIN lens l USING (doc_id) JOIN dft d USING (tok), st),
    bm AS (
      SELECT doc_id,
             round(list_reduce(
               list_prepend(CAST(0 AS DOUBLE), list(sterm ORDER BY tok)),
               (a, v) -> a + v), 6) AS bm25
      FROM sc GROUP BY doc_id)"""
}
