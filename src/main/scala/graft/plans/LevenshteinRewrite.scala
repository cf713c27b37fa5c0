package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite bounded edit-distance predicates to the
  * banded thresholded form.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) DP and then
  * compares; `levenshtein(a, b, k)` runs the O(k·min(|a|,|b|)) banded
  * DP and early-aborts to -1 past the bound. The two predicates are
  * value-identical (including null-in → null-out), so users writing the
  * natural form get the banded plan automatically — the optimization
  * q62 (`FuzzyJoin`) applies by hand, generalized to any query in the
  * session. A fuzzy-join candidate stream is dominated by non-matches,
  * which is exactly where the early abort pays.
  *
  * Guards: the bound must be a non-negative integer literal (a negative
  * bound never matches and is left for constant folding to deal with;
  * non-literal bounds keep the exact form). The rewritten pattern no
  * longer matches the rule, so the optimizer's fixed point terminates.
  */
object LevenshteinRewrite extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(l, r, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 => banded(l, r, k)
      // lev(a,b) < k  /  k > lev(a,b)   (k >= 1 so k-1 stays valid)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(l, r, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 1 => banded(l, r, k - 1)
      // lev(a,b) = k: thresholded-at-k returns the distance iff <= k
      case EqualTo(Levenshtein(l, r, None), lit @ Literal(k: Int, IntegerType))
          if k >= 0 => EqualTo(Levenshtein(l, r, Some(lit)), lit)
      case EqualTo(lit @ Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 => EqualTo(Levenshtein(l, r, Some(lit)), lit)
    }
}
