package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for document corpora — the library forms of
 * queries q23 (exact) and q24/q25 (MinHash+LSH). Both are shapes that
 * survive 100 TB: exact dedup is one hash shuffle; LSH candidate generation
 * buckets the corpus so the pair join is per-bucket, never all-pairs.
 */
object Dedup {

  /** Spark SQL fragment: 48-bit md5-prefix hash of a string expression
    * (shared convention with the query library / DuckDB oracles). */
  private def md5long(e: String) = s"cast(conv(substr(md5($e), 1, 12), 16, 10) as bigint)"

  // MinHash permutation constants; a * (h % P) + b stays < 2^63.
  private val P = 1000000007L
  private val DefaultPerms = Seq((131L, 7L), (191L, 411L), (397L, 1229L), (557L, 3571L))

  /**
   * Exact deduplication by content: rows with identical `contentCol` values
   * form one group; the row with the smallest `idCol` is elected canonical.
   * Appends `content_hash`, `group_size`, and `is_canonical`. One
   * map-side-combinable shuffle on the hash — the 100 TB shape.
   */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val hashed = df.withColumn("content_hash", expr(md5long(contentCol)))
    val w = Window.partitionBy("content_hash")
    hashed
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }

  /**
   * MinHash + banded LSH near-duplicate CANDIDATE pairs: shingle each text
   * into word n-grams, hash once, take `perms.size` permutation minima,
   * band them `rowsPerBand` at a time, and emit each pair of distinct docs
   * sharing at least one band bucket exactly once.
   *
   * Cost is per-bucket (Σ bucket²), not corpus² — the candidate set an
   * exact verifier (e.g. n-gram Jaccard) then scores. Docs with fewer than
   * `shingleN` tokens produce no shingles and never pair.
   */
  def minhashLshCandidates(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      rowsPerBand: Int = 2,
      perms: Seq[(Long, Long)] = DefaultPerms): DataFrame = {
    require(perms.nonEmpty && perms.size % rowsPerBand == 0,
      s"perms (${perms.size}) must split evenly into bands of $rowsPerBand")
    graft.functions.TextExpressions.register(spark)
    val minhashes = perms.zipWithIndex.map { case ((a, b), i) =>
      s"array_min(transform(hs, h -> ($a * (h % $P) + $b) % $P)) as minh$i"
    }
    val nBands = perms.size / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"minh${b * rowsPerBand + r}"))
      concat_ws("_", lit(b.toString) +: cols: _*).as(s"band$b")
    }
    // hash each shingle ONCE into hs; each permutation is then cheap
    // arithmetic (Catalyst does not share subexpressions across lambdas)
    val sigs = df
      .withColumn("toks", split(col(textCol), " "))
      .filter(size(col("toks")) >= shingleN)
      .withColumn("hs", expr(s"transform(word_ngrams(toks, $shingleN), s -> ${md5long("s")})"))
      .selectExpr(idCol +: minhashes: _*)
      .select(col(idCol) +: bands: _*)
    val posts = sigs.select(
      col(idCol),
      explode(array((0 until nBands).map(b => col(s"band$b")): _*)).as("bucket"))
    val a = posts.select(col(idCol).as("id_a"), col("bucket"))
    val b = posts.select(col(idCol).as("id_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // a pair may collide in several bands; emit once
  }
}
