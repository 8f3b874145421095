package graft.functions

/**
 * The library's shared hashing conventions — single source of truth for the
 * query library (TextQueries, with its DuckDB-oracle twin spellings) and the
 * operator API (Dedup), which are spec-locked to agree with each other.
 */
object HashConventions {

  /** Spark SQL fragment: 48-bit md5-prefix hash of a string expression.
    * 48 bits is for VALUES carried into arithmetic (MinHash permutations
    * must stay < 2^63 after a*h+b) — NOT for identity/equality grouping,
    * where birthday collisions at ~2^24 values forbid truncation. */
  def md5long48(e: String): String = s"cast(conv(substr(md5($e), 1, 12), 16, 10) as bigint)"

  /** DuckDB fragment of the same 48-bit hash. */
  def duckMd5long48(e: String): String = s"cast('0x' || substr(md5($e), 1, 12) as bigint)"

  /** MinHash permutation modulus; a * (h % P) + b stays < 2^63. */
  final val MinhashP = 1000000007L

  /** MinHash permutation constants (a, b). */
  final val MinhashPerms: Seq[(Long, Long)] =
    Seq((131L, 7L), (191L, 411L), (397L, 1229L), (557L, 3571L))
}
