package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/**
 * Distributed batch-gradient-descent classifier trainer — the logistic-
 * regression-shaped quality-classifier stage of a curation pipeline
 * (reference scope: the bi5 connector has no model training; this is
 * beyond-reference pipeline tooling, cited like the rest of the query
 * library at spark-2.4/src/main/scala/.../BI5DataSource.scala:1 only for
 * the data-source surface it composes with).
 *
 * Link function: the ELLIOTT fast sigmoid p = 0.5 * (1 + z / (1 + |z|))
 * instead of the exp-based logistic. Chosen deliberately for
 * ENGINE-REPRODUCIBILITY: +, *, /, abs are all exactly-rounded IEEE-754
 * ops producing bit-identical doubles in any engine, while exp() is
 * libm-dependent (Java Math.exp vs C libm may differ in the last ulp,
 * which iteration would amplify). The Elliott link is a published
 * sigmoid approximation with the same shape, range (0,1) and midpoint
 * p(0)=0.5, so decision behavior at threshold 0.5 is logistic-like.
 *
 * Gradient of the squared-error-free "logistic-style" update used here:
 * g_j = sum((p - y) * x_j) / n, w_j <- w_j - lr * g_j (per-feature;
 * the intercept rides x_0 = 1). Sums go through the library's exact
 * DECIMAL spelling — round(e, 9) then sum(DECIMAL(28,12)) — so the sum
 * is ORDER-INDEPENDENT across partitions and engines; every weight in
 * every iteration is therefore bit-identical however the corpus is
 * partitioned, and a DuckDB oracle replaying the same spelling lands on
 * the same doubles.
 *
 * Scale shape: each iteration is ONE corpus scan collapsing map-side to
 * (features + 2) decimal partial sums — no shuffle beyond the final
 * single-row aggregate, no per-row state, weights broadcast as plan
 * literals. The per-iteration `.head()` collects one row of scalars
 * (documented driver control-plane, the kmeansFit pattern). Callers
 * should persist/checkpoint the feature frame they pass in — it is
 * scanned `iters` times.
 *
 * EXECUTION SEMANTICS: training runs EAGERLY — each round fires a Spark
 * job during this call. Returns the weight vector (intercept first,
 * then one weight per xCols element, in order).
 */
object Logit {
  def fit(
      feats: DataFrame,
      xCols: Seq[String],
      yCol: String,
      iters: Int,
      lr: Double): Array[Double] = {
    require(xCols.nonEmpty, "need at least one feature column")
    require(iters >= 0, s"iters ($iters) must be non-negative")
    val w = Array.fill(xCols.length + 1)(0.0)
    var it = 0
    while (it < iters) {
      val p = prob(w, xCols)
      val gradCols =
        exactSum(p - col(yCol)).as("__g0") +:
          xCols.zipWithIndex.map { case (c, j) =>
            exactSum((p - col(yCol)) * col(c)).as(s"__g${j + 1}")
          }
      val sums = feats.agg(count(lit(1)).as("__n"), gradCols: _*).head()
      val n = sums.getAs[Long]("__n").toDouble
      var j = 0
      while (j < w.length) {
        w(j) = w(j) - lr * (sums.getAs[java.math.BigDecimal](s"__g$j")
          .doubleValue() / n)
        j += 1
      }
      it += 1
    }
    w
  }

  /** Elliott-link probability column for weights `w` over `xCols`:
    * p = 0.5 * (1 + z / (1 + |z|)), z = w0 + sum(w_j * x_j) accumulated
    * left-to-right (the spelling an oracle must replay verbatim). */
  def prob(w: Array[Double], xCols: Seq[String]): org.apache.spark.sql.Column = {
    val z = xCols.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (c, j)) =>
      acc + lit(w(j + 1)) * col(c)
    }
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + F.abs(z)))
  }

  /** Order-independent exact sum: round to 9 digits, sum in DECIMAL. */
  private def exactSum(e: org.apache.spark.sql.Column) =
    sum(F.round(e, 9).cast("decimal(28,12)"))
}
