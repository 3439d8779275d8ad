package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{TopKByCount, VectorD2, VectorDot}

/** The library's pure-SQL surface: registers graft's native Catalyst
  * expressions as SQL functions through the sanctioned
  * `SparkSessionExtensions` seam, so a SQL-only consumer (spark.sql,
  * Thrift server, SQL files in a scheduler) reaches the same codegen'd
  * kernels the DataFrame API uses:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT vector_dot(q.embedding, n.embedding) FROM ...")
  *   spark.sql("SELECT store_id, topk_by_count(sku, 32) FROM sales GROUP BY 1")
  * }}}
  *
  * Every whole-operator SEMANTIC lowers to stock logical operators
  * (SURVEY §4 — no custom plan is needed for correctness); the two
  * plan-level injections below are PERFORMANCE rewrites of shapes the
  * library itself emits: [[graft.plans.SelfDistanceElimination]] folds
  * `vector_d2(x, x)` algebraically, and the §7.5 north-star
  * [[graft.plans.GroupTopKRewrite]]/[[graft.plans.GroupTopKStrategy]]
  * pair replaces the sort-based WindowGroupLimit plan for
  * `row_number() <= k` ranking with one-pass bounded per-group heaps
  * (no local sorts on either side of the exchange). Both are opt-in by
  * session and bit-parity spec-gated; the driver surfaces
  * ([[graft.Verify]] and [[graft.Bench]]) install these extensions, so
  * the DuckDB oracle sweep re-certifies every key under the injected
  * rules each round.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: String): ExpressionInfo =
    new ExpressionInfo(clazz, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the one algebraic identity Catalyst can't know for a foreign
    // expression: vector_d2(x, x) == 0.0 (see the rule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.SelfDistanceElimination)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    // top-k-per-group: heap operator replacing sort-based group limits
    ext.injectOptimizerRule(_ => graft.plans.GroupTopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    ext.injectFunction((FunctionIdentifier("vector_dot"),
      info("vector_dot", classOf[VectorDot].getName),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vector_dot(array<float>, array<float>)")
        VectorDot(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("vector_d2"),
      info("vector_d2", classOf[VectorD2].getName),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vector_d2(array<float>, array<float>)")
        VectorD2(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("floor_log2"),
      info("floor_log2", classOf[graft.functions.FloorLog2].getName),
      (args: Seq[Expression]) => {
        require(args.length == 1, "floor_log2(bigint)")
        graft.functions.FloorLog2(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("bit_interleave"),
      info("bit_interleave", classOf[graft.functions.BitInterleave].getName),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bit_interleave(bigint, bigint)")
        graft.functions.BitInterleave(args.head, args(1))
      }))
    // aggregate: the analyzer wraps a bare AggregateFunction returned from
    // a registry builder in its AggregateExpression
    ext.injectFunction((FunctionIdentifier("topk_by_count"),
      info("topk_by_count", classOf[TopKByCount].getName),
      (args: Seq[Expression]) => {
        require(args.length == 2, "topk_by_count(key, summarySize)")
        val size = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_by_count: summarySize must be an INT literal, got $other")
        }
        TopKByCount(args.head, size)
      }))
  }
}
