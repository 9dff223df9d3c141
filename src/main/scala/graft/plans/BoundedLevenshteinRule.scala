package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite comparisons of UNBOUNDED `levenshtein(a, b)`
  * against an integer literal into the BOUNDED 3-arg form
  * `levenshtein(a, b, k)`, which runs Spark's banded O(k·len) algorithm
  * with early bail-out (returning -1 past k) instead of filling the full
  * O(len²) edit matrix per row pair.
  *
  * This is the (c)-tier extension point one level above a native
  * function: users — including pure-SQL users — write the NATURAL
  * predicate (`WHERE levenshtein(a, b) <= 2`), and the plan they get is
  * the one an expert would have hand-written. On a blocked similarity
  * join (FuzzyJoin) the predicate runs once per CANDIDATE pair, so at
  * 100 TB the banded evaluation is the difference between ~5·len and
  * len² cells on every candidate the blocking admits.
  *
  * Soundness (d = true distance, L = levenshtein(a,b,k), k ≥ 0):
  *   L = d        if d ≤ k
  *   L = -1       otherwise
  * therefore
  *   d ≤ k        ⟺  L ≥ 0
  *   j ≤ d ≤ k    ⟺  L ≥ max(j, 0)
  *   d = k        ⟺  L = k
  * The rewrites below are pure expression-level equivalences, so the
  * rule may fire anywhere an expression appears (Filter, Join
  * condition, projection); `threshold = None` in every pattern makes it
  * idempotent. NULL semantics carry over: levenshtein is null-intolerant
  * in both forms, and each rewritten comparison is null exactly when
  * the original is.
  *
  * Matched shapes (either operand order, an optional int/long up-cast
  * around the call):
  *   - `lev <= k`, `lev < k+1`          → `lev3(k) >= 0`
  *   - `j <= lev AND lev <= k` (adjacent conjuncts, e.g. BETWEEN)
  *                                      → `lev3(k) >= max(j, 0)`
  *   - `lev = k`                        → `lev3(k) = k`
  * A lone lower bound (`lev >= j`) has no finite band and is left
  * untouched; non-adjacent conjunct pairs fall back to the single-sided
  * rewrite of their upper bound, which is still banded.
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  /** A non-negative-safe int literal (int or exact long). */
  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case _ => None
    }
  }

  /** An unbounded levenshtein call, optionally under a widening cast
    * (alias substitution can leave `cast(levenshtein(a,b) as bigint)`).
    * The cast is discarded in the rewrite — the rebuilt comparison is
    * re-typed from scratch against an int literal. */
  private object Lev {
    def unapply(e: Expression): Option[Levenshtein] = e match {
      case l @ Levenshtein(_, _, None) => Some(l)
      case Cast(l @ Levenshtein(_, _, None), t, _, _)
          if t == IntegerType || t == LongType => Some(l)
      case _ => None
    }
  }

  private def lev3(l: Levenshtein, k: Int): Expression =
    Levenshtein(l.left, l.right, Some(Literal(k)))

  /** Canonicalize one comparison node to (lev, bound-kind). */
  private sealed trait Cmp
  private case class Le(l: Levenshtein, k: Int) extends Cmp
  private case class Ge(l: Levenshtein, j: Int) extends Cmp
  private object Cmp {
    def unapply(e: Expression): Option[Cmp] = e match {
      case LessThanOrEqual(Lev(l), IntLit(k)) => Some(Le(l, k))
      case GreaterThanOrEqual(IntLit(k), Lev(l)) => Some(Le(l, k))
      // the strict forms shift the bound by one: skip the match at the
      // int extremes, where ±1 would wrap and flip an always-false
      // predicate to always-true (leaving the node untouched is sound)
      case LessThan(Lev(l), IntLit(k)) if k != Int.MinValue => Some(Le(l, k - 1))
      case GreaterThan(IntLit(k), Lev(l)) if k != Int.MinValue => Some(Le(l, k - 1))
      case GreaterThanOrEqual(Lev(l), IntLit(j)) => Some(Ge(l, j))
      case LessThanOrEqual(IntLit(j), Lev(l)) => Some(Ge(l, j))
      case GreaterThan(Lev(l), IntLit(j)) if j != Int.MaxValue => Some(Ge(l, j + 1))
      case LessThan(IntLit(j), Lev(l)) if j != Int.MaxValue => Some(Ge(l, j + 1))
      case _ => None
    }
  }

  private def rewrite(e: Expression): Expression = e.transformDown {
    // two-sided band first (BETWEEN expands to adjacent conjuncts):
    // one bounded evaluation serves both bounds
    case And(Cmp(a), Cmp(b)) =>
      (a, b) match {
        case (Ge(l1, j), Le(l2, k)) if l1.semanticEquals(l2) && k >= 0 =>
          GreaterThanOrEqual(lev3(l1, k), Literal(math.max(j, 0)))
        case (Le(l1, k), Ge(l2, j)) if l1.semanticEquals(l2) && k >= 0 =>
          GreaterThanOrEqual(lev3(l1, k), Literal(math.max(j, 0)))
        case _ =>
          And(rewriteOne(a).getOrElse(cmpBack(a)),
            rewriteOne(b).getOrElse(cmpBack(b)))
      }
    case Cmp(c) => rewriteOne(c).getOrElse(cmpBack(c))
    case EqualTo(Lev(l), IntLit(k)) if k >= 0 =>
      EqualTo(lev3(l, k), Literal(k))
    case EqualTo(IntLit(k), Lev(l)) if k >= 0 =>
      EqualTo(lev3(l, k), Literal(k))
  }

  private def rewriteOne(c: Cmp): Option[Expression] = c match {
    case Le(l, k) if k >= 0 => Some(GreaterThanOrEqual(lev3(l, k), Literal(0)))
    case _ => None // lone lower bound, or a vacuously-false upper bound
  }

  /** Rebuild the canonical comparison when no rewrite applies (the
    * canonical form is equivalent to whatever orientation matched). */
  private def cmpBack(c: Cmp): Expression = c match {
    case Le(l, k) => LessThanOrEqual(l, Literal(k))
    case Ge(l, j) => GreaterThanOrEqual(l, Literal(j))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e if hasUnboundedLev(e) => rewrite(e) }

  private def hasUnboundedLev(e: Expression): Boolean =
    e.exists { case Levenshtein(_, _, None) => true; case _ => false }
}
