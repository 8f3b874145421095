package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Optimizer rule: guard `levenshtein(a, b) <= k` filters with the free
 * length-gap bound `abs(length(a) - length(b)) <= k`.
 *
 * Edit distance is bounded below by the length difference (every length
 * change costs at least one edit), so the guard is SOUND: it never drops a
 * row the original predicate would keep. It pays because levenshtein is
 * O(len(a)·len(b)) per row while the guard is O(1) on two already-decoded
 * lengths, and conjuncts short-circuit left-to-right in codegen — at a
 * 100 TB similarity-verification pass (the q75 shape with a threshold
 * pushed into a filter), rows with a hopeless length gap skip the
 * quadratic loop entirely.
 *
 * This is deliberately the ONLY place the library reaches for a custom
 * logical rule: everything else is expressible declaratively, but no
 * DataFrame spelling can retrofit a derived cheap guard under a
 * user-written predicate — plan rewriting is what `Rule[LogicalPlan]` is
 * for. Injected by [[graft.GraftExtensions]]
 * (`spark.sql.extensions=graft.GraftExtensions`).
 */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** Marker to keep the rewrite idempotent across optimizer batches. */
  private val Tag = org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.levGuarded")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if f.getTagValue(Tag).isEmpty && hasRewrite(cond) =>
      val out = Filter(addGuards(cond), child)
      out.setTagValue(Tag, true)
      out
  }

  private def hasRewrite(e: Expression): Boolean = e.exists {
    case LessThanOrEqual(_: Levenshtein, Literal(_, IntegerType)) => true
    case LessThan(_: Levenshtein, Literal(_, IntegerType)) => true
    case _ => false
  }

  private def lengthGap(lev: Levenshtein): Expression =
    Abs(Subtract(Length(lev.left), Length(lev.right)))

  private def addGuards(e: Expression): Expression = e match {
    // rewrite only the comparison leaves; recurse through AND/OR (NOT is
    // left alone — a guard under negation would flip soundness)
    case And(l, r) => And(addGuards(l), addGuards(r))
    case Or(l, r) => Or(addGuards(l), addGuards(r))
    case cmp @ LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType)) =>
      And(LessThanOrEqual(lengthGap(lev), k), cmp)
    case cmp @ LessThan(lev: Levenshtein, k @ Literal(_, IntegerType)) =>
      And(LessThan(lengthGap(lev), k), cmp)
    case other => other
  }
}
