package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Manual skew mitigation for equi-joins — the salting pattern behind query
 * `q46_salted_join`, packaged for any fact/dimension pair: a single hot key
 * otherwise lands every one of its rows in ONE reducer, capping the join at
 * single-task speed no matter how many executors exist.
 *
 * AQE's skew-join handles most cases automatically (and should be the first
 * resort); explicit salting still matters when the skewed side feeds a
 * further same-key operation AQE cannot split (e.g. a window), when stats
 * are missing, or when the engine must behave deterministically across
 * runs regardless of runtime stats.
 */
object Skew {

  /**
   * Inner equi-join of `fact` to `dim` on `on`, with the fact side salted
   * `nSalts` ways and the dimension side replicated once per salt — a hot
   * join key spreads across `nSalts` reducers. Result is provably the
   * plain inner join: every fact row matches exactly the dim rows of its
   * key, at exactly one salt value.
   *
   * `saltBy` must VARY WITHIN a join key (a line number, an event id — any
   * per-row value of any type; it is hashed, and NULLs hash like a value,
   * so no row can ever be dropped by its salt); a hash of the join key
   * itself would be constant per key and spread nothing. Defaults to a
   * per-row id, which distributes evenly and costs nothing.
   *
   * The dim side is replicated `nSalts` x — keep it the smaller input.
   *
   * @return fact columns followed by dim's non-key columns, exactly like
   *         `fact.join(dim, on)`
   */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      on: Seq[String],
      nSalts: Int = 8,
      saltBy: Option[Column] = None): DataFrame = {
    require(on.nonEmpty, "salted join needs at least one equi-key column")
    require(nSalts >= 2, s"nSalts ($nSalts) must be at least 2")
    val reserved = Set("__salt")
    val clash = (fact.columns ++ dim.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    // hash() accepts ANY type and maps NULL to a plain value — a raw cast
    // would make the salt NULL (or throw under ANSI for strings) and an
    // equi-join on a NULL salt silently DROPS the row from the result
    val salt = hash(saltBy.getOrElse(monotonically_increasing_id()))
    val f = fact.withColumn("__salt", pmod(salt.cast("long"), lit(nSalts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    f.join(d, on :+ "__salt")
      .drop("__salt")
  }
}
