package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col

/** COLUMN-LEVEL LINEAGE extraction from a Catalyst analyzed plan — the
  * OpenLineage/Unity-Catalog facet: for every output column of a query,
  * which (source_table, source_column) pairs it transitively derives
  * from. The reference records dataset-level provenance in its manifest
  * sidecars (write-metrics:104); column grain is what an impact-analysis
  * or PII-propagation audit actually needs ("which outputs move if
  * l_extendedprice is re-stated?", "which exports can see o_orderpriority?").
  *
  * Pure driver-side plan traversal — zero data read, O(plan size):
  * every NamedExpression's reference set resolves through its child
  * scope down to the parquet scan leaves (file-relation basename =
  * table). Aggregates/windows/generators contribute their expression
  * references; literal-only outputs (count(1)) report the sentinel
  * `(literal)` so "no upstream column" is an explicit, joinable fact
  * rather than a missing row. Memoized silver leaves (LogicalRDD)
  * intentionally terminate lineage at the silver boundary — production
  * lineage stitches per-job facets the same way (each job reports to
  * its own table boundary, the graph composes across jobs). */
object ColumnLineage {

  /** Sentinel for outputs derived from no source column. */
  val LiteralSrc = "(literal)"

  private def tableOf(lr: LogicalRelation): String = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption
        .map(_.getName.stripSuffix(".parquet")).getOrElse("(relation)")
    case _ => "(relation)"
  }

  /** exprId → transitive set of (table, column) scan-leaf sources.
    * Memoized by plan-node IDENTITY: a plan that references the same
    * subtree twice (self-union, self-join built from one DataFrame)
    * shares ONE walk of it — without the cache the recursion is
    * O(2^k) on k nested self-unions (LineagePropertiesSpec generates
    * exactly that shape). The walk stays driver-side and linear in
    * DISTINCT plan nodes. */
  private def attrSources(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
    val memo = new java.util.IdentityHashMap[LogicalPlan, Map[ExprId, Set[(String, String)]]]()
    def attrSourcesMemo(p: LogicalPlan): Map[ExprId, Set[(String, String)]] = {
      val hit = memo.get(p)
      if (hit != null) hit
      else { val r = walk(p); memo.put(p, r); r }
    }
    def refsOf(e: Expression,
               scope: Map[ExprId, Set[(String, String)]]): Set[(String, String)] =
      e.references.iterator
        .flatMap(a => scope.getOrElse(a.exprId, Set.empty[(String, String)]))
        .toSet

    def named(nes: Seq[NamedExpression],
              scope: Map[ExprId, Set[(String, String)]]): Map[ExprId, Set[(String, String)]] =
      nes.map {
        case a: Attribute => a.exprId -> scope.getOrElse(a.exprId, Set.empty[(String, String)])
        case al: Alias => al.exprId -> refsOf(al.child, scope)
        case o => o.exprId -> refsOf(o, scope)
      }.toMap

    def walk(plan: LogicalPlan): Map[ExprId, Set[(String, String)]] = plan match {
      case lr: LogicalRelation =>
        val t = tableOf(lr)
        lr.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case p: Project =>
        val scope = attrSourcesMemo(p.child)
        scope ++ named(p.projectList, scope)
      case a: Aggregate =>
        val scope = attrSourcesMemo(a.child)
        scope ++ named(a.aggregateExpressions, scope)
      case w: Window =>
        val scope = attrSourcesMemo(w.child)
        scope ++ named(w.windowExpressions, scope)
      case g: Generate =>
        val scope = attrSourcesMemo(g.child)
        val genSrcs = refsOf(g.generator, scope)
        scope ++ g.generatorOutput.map(a => a.exprId -> genSrcs).toMap
      case e: Expand =>
        val scope = attrSourcesMemo(e.child)
        // each output position unions the sources of every projection's
        // expression at that position (grouping-set semantics)
        scope ++ e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.iterator
            .map(row => refsOf(row(i), scope)).foldLeft(Set.empty[(String, String)])(_ ++ _)
        }.toMap
      case j: Join =>
        attrSourcesMemo(j.left) ++ attrSourcesMemo(j.right)
      case u: Union =>
        val childMaps = u.children.map(attrSourcesMemo)
        val merged = childMaps.reduce(_ ++ _)
        // a union output draws from the same ordinal of every branch
        merged ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.zip(childMaps).iterator.map { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[(String, String)])
          }.foldLeft(Set.empty[(String, String)])(_ ++ _)
        }.toMap
      case u: UnaryNode => attrSourcesMemo(u.child) // Filter/Sort/Limit/Alias/...
      case l: LeafNode => // LogicalRDD / LocalRelation: the silver boundary
        l.output.map(a => a.exprId -> Set("(silver)" -> a.name)).toMap
      case o =>
        o.children.map(attrSourcesMemo)
          .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
    }
    attrSourcesMemo(plan)
  }

  /** The lineage relation of `df`: one row per (output column, source),
    * `(literal)` sentinel when an output has no source column. */
  def lineageOf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val plan = df.queryExecution.analyzed
    val srcs = attrSources(plan)
    plan.output.flatMap { a =>
      val s = srcs.getOrElse(a.exprId, Set.empty[(String, String)])
      if (s.isEmpty) Seq((a.name, LiteralSrc, LiteralSrc))
      else s.toSeq.map { case (t, c) => (a.name, t, c) }
    }.toDF("out_column", "source_table", "source_column")
      .orderBy(col("out_column"), col("source_table"), col("source_column"))
  }

  /** k28: the lineage facet of a representative two-table analytics
    * query (scan → project → join → filter → aggregate), hash-checked
    * against the independently-declared truth: the payment rollup's
    * money columns must trace to l_extendedprice (and the discount
    * additionally to l_discount), payment_method to o_orderpriority,
    * and count(1) to no column at all. */
  def columnLineage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val q = graft.model.Tables.salesWithPayment(spark, dir)
      .filter(col("sale_date") >= "1998-06-01")
      .groupBy(col("store_id"), col("payment_method"))
      .agg(sum(col("line_total")).as("gross"),
        sum(col("discount_amount")).as("discount"),
        sum(col("quantity")).as("items"),
        count(lit(1)).as("n_lines"))
    lineageOf(q)
  }

  /** The declared lineage contract (the oracle is the spec of record:
    * if the projection ever reroutes a column, the hash gate fails). */
  def columnLineageSql(): String =
    """SELECT * FROM (VALUES
      |  ('discount', 'lineitem', 'l_discount'),
      |  ('discount', 'lineitem', 'l_extendedprice'),
      |  ('gross', 'lineitem', 'l_extendedprice'),
      |  ('items', 'lineitem', 'l_quantity'),
      |  ('n_lines', '(literal)', '(literal)'),
      |  ('payment_method', 'orders', 'o_orderpriority'),
      |  ('store_id', 'lineitem', 'l_suppkey'))
      |  t(out_column, source_table, source_column)
      |ORDER BY out_column, source_table, source_column""".stripMargin
}
