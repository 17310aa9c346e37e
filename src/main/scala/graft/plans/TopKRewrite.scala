package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule completing the Catalyst tier (Expression → Strategy →
  * Rule): users write the STANDARD top-k-per-group idiom —
  *
  *   `row_number() OVER (PARTITION BY g ORDER BY s) <= k`
  *
  * — and the rule swaps in [[GroupTopKNode]], the bounded-heap operator,
  * whenever the rank column itself is not needed downstream. Stock
  * Spark's own InferWindowGroupLimit (3.5+) inserts WindowGroupLimit,
  * which prunes rows EARLY but still shuffles every surviving row and
  * fully sorts each partition; GroupTopK's partial pass shuffles only
  * per-partition winners (≤ k·groups·partitions rows) and never sorts —
  * at 100 TB the exchange shrinks from the table to kilobytes per
  * group. The rewrite runs in the operator-optimization batch, BEFORE
  * Spark's window-group-limit batch, so the better plan wins when it
  * applies and Spark's fallback still catches what this rule declines.
  *
  * Matches conservatively — ALL of:
  *  - the Window computes exactly ONE window function: `row_number()`
  *    (default ROWS frame) → [[RowNumberMode]], `rank()` →
  *    [[RankMode]], or `dense_rank()` → [[DenseRankMode]] (default
  *    RANGE frame) — each mapped to the matching retention semantics,
  *    so rank's boundary-tie class is KEPT and dense_rank keeps the k
  *    best distinct order-values (tie-aware buckets, not a blind
  *    k-heap);
  *  - the Filter directly above it is `rn <= k` / `rn < k` / `rn = 1`
  *    (the "latest per key" idiom) with a foldable positive limit;
  *  - a Project above the Filter drops the rank column (if the rank is
  *    still referenced, the rewrite declines — GroupTopK returns rows,
  *    not ranks).
  *
  * Tie contract: rank() and dense_rank() rewrites are EXACT on any
  * data (the emitted row set is tie-invariant by definition).
  * row_number()'s is its own: among full order-ties the returned SET
  * is arbitrary either way; with a total order (unique tie-break, as
  * every oracle query here uses) both forms are deterministic and
  * identical.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** rn-attribute → k, for the filter shapes we accept. */
  private def limitOf(cond: Expression): Option[(Attribute, Int)] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if k > 0 =>
        Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k)) if k > 1 =>
        Some((a, k - 1))
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if k > 0 =>
        Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute) if k > 1 =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, IntegerLiteral(1)) => Some((a, 1))
      case EqualTo(IntegerLiteral(1), a: Attribute) => Some((a, 1))
      case _ => None
    }

  /** The retention mode for the window function, when it is a rank
    * family member on its DEFAULT frame (row_number runs on ROWS
    * UNBOUNDED..CURRENT, rank/dense_rank on the RANGE equivalent — a
    * user-specified frame means something else is going on; decline). */
  private def modeOf(e: NamedExpression): Option[TopKMode] = e match {
    case Alias(WindowExpression(f,
      WindowSpecDefinition(_, _,
        SpecifiedWindowFrame(frame, UnboundedPreceding, CurrentRow))), _) =>
      f match {
        case _: RowNumber if frame == RowFrame => Some(RowNumberMode)
        // rank-like functions IGNORE their frame (and Spark rejects a
        // user-specified one at analysis), so any resolved default —
        // Spark 4 resolves to the ROWS shape — is the pattern
        case _: Rank => Some(RankMode)
        case _: DenseRank => Some(DenseRankMode)
        case _ => None
      }
    case _ => None
  }

  /** Spark's InferWindowGroupLimit batch runs before user-injected
    * rules, so by the time we see the pattern a logical
    * WindowGroupLimit may already sit under the Window. It exists only
    * to prune rows for the Window we are about to DELETE — strip it
    * when it belongs to this window (same keys/order, limit ≥ k). */
  private def stripGroupLimit(child: LogicalPlan, partitionSpec: Seq[Expression],
                              orderSpec: Seq[SortOrder], k: Int): LogicalPlan =
    child match {
      case wgl: WindowGroupLimit
          if wgl.partitionSpec == partitionSpec &&
            wgl.orderSpec == orderSpec && wgl.limit >= k =>
        wgl.child
      case c => c
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(winExpr), partitionSpec, orderSpec, child0, _)))
        if modeOf(winExpr).isDefined && orderSpec.nonEmpty =>
      limitOf(cond) match {
        case Some((rnAttr, k)) =>
          val child = stripGroupLimit(child0, partitionSpec, orderSpec, k)
          if (rnAttr.exprId == winExpr.exprId &&
              // rank must not escape: project references child output only
              projectList.forall(_.references.subsetOf(child.outputSet)) &&
              // partition keys must be plain attributes of the child
              partitionSpec.forall(_.references.subsetOf(child.outputSet)) &&
              orderSpec.forall(_.references.subsetOf(child.outputSet)))
            Project(projectList, GroupTopKNode(partitionSpec, orderSpec, k,
              child, modeOf(winExpr).get))
          else p
        case _ => p
      }
  }
}
