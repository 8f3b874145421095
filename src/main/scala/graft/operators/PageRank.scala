package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fixed-iteration PageRank over an UNDIRECTED pair graph — the
 * "duplication centrality" ranker: on a near-dup pair graph (q48/q121
 * verification output) a high rank marks the document at the center of a
 * duplication cluster, the natural canonical to keep (or the feed to
 * audit). Works on any distinct pair list.
 *
 * Per iteration: every node's rank spreads equally over its edges and
 * each node regains `(1-damping)/n + damping * sum(incoming)`. Nodes are
 * exactly the pair members, so every node has degree >= 1 and there are
 * no dangling-mass corrections to apply.
 *
 * Scale shape: the edge list materializes ONCE (localCheckpoint, the
 * [[Dedup.clusters]] discipline — without it every iteration would
 * re-execute the full upstream candidate pipeline); each iteration is one
 * node-keyed equi-join plus one aggregate, both hash-partitioned on the
 * id — shuffle O(edges) per round, never all-pairs, AQE-splittable under
 * hub skew. `iters` is fixed (default 3): centrality stabilizes in a few
 * rounds and a fixed count keeps the result reproducible.
 *
 * Determinism (cross-engine exact): contributions are `round(r/deg, 12)`
 * — both engines round the identical IEEE division identically — then
 * summed as DECIMAL(28,12) (exact, order-independent) and cast back to
 * double; the per-round affine step is the same expression tree on both
 * sides, so ranks are bit-identical at any partitioning.
 */
object PageRank {

  def ranks(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      damping: Double = 0.85,
      iters: Int = 3): DataFrame = {
    require(damping > 0.0 && damping < 1.0, s"damping ($damping) must be in (0, 1)")
    require(iters >= 1, s"iters ($iters) must be positive")
    // undirected edge list, both directions; distinct() makes the operator
    // safe under repeated input pairs (degree = neighbor count); self-loops
    // are degenerate "pairs" and are dropped loudly-documented rather than
    // double-counted
    val edges = pairs
      .select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("__pr_id"), col("deg"))
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(n))
      .selectExpr("__pr_id", "deg", "n_nodes",
        "cast(1.0 as double) / n_nodes as r")
    var i = 0
    while (i < iters) {
      val contribs = edges
        .join(ranks.selectExpr("__pr_id as src", "deg as __sdeg", "r as __sr"), Seq("src"))
        .selectExpr("dst as __pr_id",
          "cast(round(__sr / __sdeg, 12) as decimal(28,12)) as c")
        .groupBy("__pr_id")
        .agg(sum(col("c")).as("s"))
      // inner join: every node has an undirected edge, so every node
      // receives at least one contribution — no row loss
      // (1 - damping) is computed IN SQL from the literal, not interpolated
      // pre-subtracted: both engines then subtract the same parsed double
      // (0.85's repr round-trips; 1.0 - 0.85 in Scala would print the
      // non-round 0.15000000000000002)
      ranks = nodes.crossJoin(broadcast(n))
        .join(contribs, Seq("__pr_id"))
        .selectExpr("__pr_id", "deg", "n_nodes",
          s"(cast(1.0 as double) - cast($damping as double)) / n_nodes" +
            s" + cast($damping as double) * cast(s as double) as r")
      i += 1
    }
    ranks.selectExpr(s"__pr_id as $idA", "cast(deg as bigint) as degree",
      "round(r, 9) as pagerank")
  }
}
