package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Recursive-hierarchy closure — the `WITH RECURSIVE` capability (org
 * charts, BOM explosions, category trees, thread ancestry) expressed in
 * Spark's execution model. Input is a forest as (id, parent, weight) rows
 * with `parent` NULL at roots; output resolves every node to its root with
 * the exact path length and the inclusive path weight sum:
 *
 *   (idCol, root_id, depth, path_weight)
 *
 * where depth(root) = 0 and path_weight = Σ weight over the node→root path
 * INCLUDING both endpoints (exact BIGINT arithmetic, oracle-comparable to
 * a recursive CTE).
 *
 * Scale shape — pointer doubling, not per-level iteration: a naive
 * recursive walk needs `max_depth` sequential joins (a 20-deep tree = 20
 * shuffles), and a driver-side loop over levels collects data it should
 * never see. Here each round composes the walk with itself, so after r
 * rounds every node has jumped up to 2^r parent steps: `rounds = 6`
 * resolves any hierarchy of depth ≤ 64 — i.e. every BALANCED tree to 2^64
 * nodes — in 6 id-keyed equi-joins (shuffle O(n) each, hash-partitioned,
 * AQE-splittable). Composition state is (jump endpoint, steps walked,
 * path weight EXCLUDING the endpoint): roots are fixed points carrying
 * (self, 0, 0), so over-jumping past the root is idempotent — no
 * double-count, no conditional logic in the hot join.
 *
 * Each round `localCheckpoint`s the state (the [[Dedup.clusters]] /
 * [[PageRank]] discipline): without it the self-referencing lineage
 * DOUBLES per round — 2^rounds plan blowup. Construction therefore runs
 * Spark jobs eagerly and pins round results executor-local; on executor
 * loss the query must be re-invoked.
 *
 * Loud contracts (raise, never silent): null id or null weight; a parent
 * id that is not itself a node (the join would otherwise silently drop
 * the subtree); a node still unresolved after `rounds` doublings (a chain
 * deeper than 2^rounds — raise, don't return a wrong partial walk).
 * Cycles in the input never terminate at a root and surface through the
 * same unresolved raise rather than looping forever.
 */
object Hierarchy {

  def closure(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      weightCol: String,
      rounds: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds ($rounds) must be in [1, 16]")
    val base = nodes.select(
        col(idCol).cast("bigint").as("__h_id"),
        col(parentCol).cast("bigint").as("__h_par"),
        col(weightCol).cast("bigint").as("__h_w"))
      .select(
        when(col("__h_id").isNull,
          raise_error(lit("Hierarchy.closure: null id"))).otherwise(col("__h_id")).as("__h_id"),
        col("__h_par"),
        when(col("__h_w").isNull,
          raise_error(concat(lit("Hierarchy.closure: null weight for id "),
            col("__h_id").cast("string")))).otherwise(col("__h_w")).as("__h_w"))
      .localCheckpoint(true) // scanned by every round's lookup side + the root join
    // walk state: following parent pointers `steps` times from id lands on
    // `jump`, accumulating `acc` = Σ weight over [id, jump) — endpoint
    // excluded so the root fixed point (jump=self, steps=0, acc=0) composes
    // idempotently
    var st = base.select(
      col("__h_id"),
      coalesce(col("__h_par"), col("__h_id")).as("__h_jump"),
      when(col("__h_par").isNull, lit(0L)).otherwise(lit(1L)).as("__h_steps"),
      when(col("__h_par").isNull, lit(0L)).otherwise(col("__h_w")).as("__h_acc"))
    var i = 0
    while (i < rounds) {
      val lookup = st.select(
        col("__h_id").as("__h_j2"), col("__h_jump").as("__h_jump2"),
        col("__h_steps").as("__h_steps2"), col("__h_acc").as("__h_acc2"))
      // left join + raise: a parent id absent from the node set must fail
      // loudly, not silently drop the whole subtree hanging off it
      st = st.join(lookup, col("__h_jump") === col("__h_j2"), "left")
        .select(
          col("__h_id"),
          when(col("__h_j2").isNull,
            raise_error(concat(lit("Hierarchy.closure: parent id absent from node set: "),
              col("__h_jump").cast("string")))).otherwise(col("__h_jump2")).as("__h_jump"),
          (col("__h_steps") + col("__h_steps2")).as("__h_steps"),
          (col("__h_acc") + col("__h_acc2")).as("__h_acc"))
        .localCheckpoint(true)
      i += 1
    }
    // resolve against the root set; path_weight turns inclusive by adding
    // the root's own weight. NOT broadcast: the root count is unbounded
    // (a forest of chains is mostly roots) — let AQE pick the strategy.
    val roots = base.filter(col("__h_par").isNull)
      .select(col("__h_id").as("__h_rid"), col("__h_w").as("__h_rw"))
    st.join(roots, col("__h_jump") === col("__h_rid"), "left")
      .select(
        col("__h_id").as(idCol),
        when(col("__h_rid").isNull,
          raise_error(concat(
            lit(s"Hierarchy.closure: unresolved after $rounds doublings (depth > ${1L << rounds}"),
            lit(" or cycle) at id "), col("__h_id").cast("string"))))
          .otherwise(col("__h_jump")).as("root_id"),
        col("__h_steps").as("depth"),
        (col("__h_acc") + col("__h_rw")).as("path_weight"))
  }
}
