package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs, ArrayExists, Coalesce, EqualTo, If, IsNaN, IsNull, LambdaFunction,
  Literal, NamedLambdaVariable, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.functions.VectorD2

/** Algebraic rewrite for the library's own kernel: `vector_d2(x, x)` needs
  * no arithmetic — for finite elements every (xᵢ−xᵢ)² term is exactly 0.0,
  * and the ONLY other reachable outcomes are the null contract (null in →
  * null out) and NaN when any element is non-finite (Inf−Inf and NaN−NaN
  * are both NaN, and one NaN term poisons the sum). So the per-row
  * multiply-accumulate loop folds to a null check plus a non-finiteness
  * `exists` scan — comparisons only, no FMA chain — which is bit-exact on
  * ALL inputs including ±Inf/NaN (a plain fold-to-0.0 would silently turn
  * NaN rows into 0.0: plan-dependent results). Self-distance shows up in
  * generated query shapes — a recall eval joined back to itself on vec_id,
  * a distance matrix whose diagonal isn't special-cased — and Catalyst
  * cannot know this identity for a foreign expression, which is exactly
  * what `injectOptimizerRule` is for ([[graft.GraftExtensions]] wires it).
  * The guard requires a deterministic operand (a rand()-bearing x
  * evaluates twice in `vector_d2(x, x)` under Spark's semantics — two
  * DIFFERENT draws — so folding would change results). Null ELEMENTS sit
  * in unsafe array slots the kernel reads as 0.0f (a zero term), so the
  * exists probe's null verdict coalesces to false — same 0.0 result. */
object SelfDistanceElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorD2(a, b) if a.deterministic && a.semanticEquals(b) =>
        val x = NamedLambdaVariable("x", FloatType, nullable = true)
        val nonFinite = Or(IsNaN(x),
          EqualTo(Abs(x), Literal(Float.PositiveInfinity)))
        val anyNonFinite = Coalesce(Seq(
          ArrayExists(a, LambdaFunction(nonFinite, Seq(x))),
          Literal(false)))
        If(IsNull(a), Literal(null, DoubleType),
          If(anyNonFinite, Literal(Double.NaN), Literal(0.0)))
    }
}
