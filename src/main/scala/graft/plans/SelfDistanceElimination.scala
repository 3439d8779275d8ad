package graft.plans

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.VectorD2

/** Algebraic constant-fold for the library's own kernel: `vector_d2(x, x)`
  * is identically 0.0 for any non-null x (equal lengths trivially hold, and
  * Σ(xᵢ−xᵢ)² = 0 exactly in IEEE — no rounding enters a zero sum), so the
  * whole per-row loop folds away to a null-check. Self-distance shows up in
  * generated query shapes — a recall eval joined back to itself on vec_id,
  * a distance matrix whose diagonal isn't special-cased — and Catalyst
  * cannot know this identity for a foreign expression, which is exactly
  * what `injectOptimizerRule` is for ([[graft.GraftExtensions]] wires it).
  * The guard requires a deterministic operand (a rand()-bearing x evaluates
  * twice in `vector_d2(x, x)` under Spark's semantics — two DIFFERENT
  * draws — so folding it would change results) and preserves the
  * expression's null contract (null in → null out). */
object SelfDistanceElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorD2(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal(null, DoubleType), Literal(0.0))
    }
}
