package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search operators — the reusable library form
 * of queries q34 (IVF assignment) and q54 (IVF-routed search), so any vector
 * source (the `embeddings` table, [[Multimodal.extractFeatures]] output, …)
 * gets the sub-linear search path.
 *
 * Scale shape (the one that survives 100 TB): the centroid table broadcasts
 * (tiny), assignment is one map-side pass over the corpus, and the search is
 * a hash-partitionable equi-join on `cluster_id` — no corpus-sized
 * broadcast, no all-pairs product. Cluster skew is AQE-splittable because
 * the join-key cardinality grows with the centroid count.
 *
 * Cosine arithmetic uses the native codegen'd `vec_dot` expression
 * ([[graft.functions.FloatVecDot]]), so similarity stays inside whole-stage
 * codegen.
 */
object Ann {

  /**
   * Assign every row's vector to its maximum-dot-product centroid (ties to
   * the lowest centroid id). `centroids` must have (`centroid_id`, `ce`)
   * columns and be small enough to broadcast — it is the IVF coarse
   * codebook. Appends `cluster_id` and `n2` (the vector's squared norm,
   * reused by [[ivfSearch]]) to `df`'s columns.
   */
  def ivfAssign(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    require(centroids.columns.toSet == Set("centroid_id", "ce"),
      s"centroids needs exactly (centroid_id, ce); got ${centroids.columns.mkString(", ")}")
    // fail fast: internal/appended names must not collide with df's columns
    // (withColumn would silently clobber; the final select would duplicate)
    val reserved = Set("centroid_id", "ce", "cluster_id", "n2", "__cdot", "__rn")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input columns collide with reserved names: $clash")
    df.crossJoin(broadcast(centroids))
      .withColumn("__cdot", expr(s"vec_dot($vecCol, ce)"))
      .withColumn("__rn",
        expr(s"row_number() over (partition by $idCol order by __cdot desc, centroid_id asc)"))
      .filter(col("__rn") === 1)
      .select(df.columns.map(col) :+
        col("centroid_id").as("cluster_id") :+
        expr(s"vec_dot($vecCol, $vecCol)").as("n2"): _*)
  }

  /**
   * IVF-routed cosine top-k: every probe searches its `nProbe` nearest
   * coarse clusters (1 = fastest, recall limited to the home cluster;
   * raising it trades linearly more candidate work for recall, and
   * `nProbe` = centroid count degrades gracefully to exact brute force).
   * `probeIds` is a one-column frame of `idCol` values (kept bounded by
   * the caller — the broadcast side must not grow with the corpus).
   * Returns (pid, rank, cluster_id, cid, sim) with rank 1..k by
   * (sim desc, cid asc) — deterministic given a unique id column;
   * `cluster_id` is the CANDIDATE's home cluster.
   */
  def ivfSearch(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      probeIds: DataFrame,
      k: Int,
      nProbe: Int = 1): DataFrame = {
    require(k >= 1, s"k ($k) must be positive")
    require(nProbe >= 1, s"nProbe ($nProbe) must be positive")
    require(probeIds.columns.length == 1,
      s"probeIds must be a single-column frame of $idCol values")
    val searchReserved = Set("pid", "cid", "sim", "rank", "__pe", "__ce2", "__pn2", "__cn2")
    val searchClash = df.columns.toSet.intersect(searchReserved)
    require(searchClash.isEmpty,
      s"input columns collide with reserved names: $searchClash")
    val assigned = ivfAssign(spark, df, idCol, vecCol, centroids)
    // probes rank ALL centroids and keep their nProbe nearest — the same
    // broadcast codebook pass as assignment, restricted to the (bounded)
    // probe set; a candidate lives in exactly one cluster, so a pair can
    // never meet through two different probed clusters
    val probes = df
      .join(broadcast(probeIds.toDF(idCol)), Seq(idCol), "left_semi")
      .crossJoin(broadcast(centroids))
      .withColumn("__cdot", expr(s"vec_dot($vecCol, ce)"))
      .withColumn("__rn",
        expr(s"row_number() over (partition by $idCol order by __cdot desc, centroid_id asc)"))
      .filter(col("__rn") <= nProbe)
      .select(col(idCol).as("pid"), col(vecCol).as("__pe"),
        col("centroid_id").as("cluster_id"),
        expr(s"vec_dot($vecCol, $vecCol)").as("__pn2"))
    val cands = assigned
      .select(col(idCol).as("cid"), col(vecCol).as("__ce2"),
        col("cluster_id"), col("n2").as("__cn2"))
    cands.join(probes, Seq("cluster_id"))
      .filter(col("cid") =!= col("pid"))
      .withColumn("sim", expr("vec_dot(__pe, __ce2)") / (sqrt(col("__pn2")) * sqrt(col("__cn2"))))
      .withColumn("rank",
        expr("row_number() over (partition by pid order by sim desc, cid asc)"))
      .filter(col("rank") <= k)
      .select("pid", "rank", "cluster_id", "cid", "sim")
  }
}
