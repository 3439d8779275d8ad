package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print hash-exchange counts for keys with PlanShapeSpec's
  * exact tree-traversal counting, so new gate bounds are measured, not
  * guessed. `sbt "Test/runMain graft.ExchangeCountTool k1 k2 ..."` */
object ExchangeCountTool {
  def countHash(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    p match {
      case a: AdaptiveSparkPlanExec => countHash(a.executedPlan)
      case s: ShuffleExchangeExec
        if s.outputPartitioning.isInstanceOf[HashPartitioning] =>
        1 + s.children.map(countHash).sum
      case other => other.children.map(countHash).sum
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSpec.session
    val sfDir = "/root/testdata/sf0.001"
    args.foreach { key =>
      try {
        val plan = SparkEntry.queries(key)(spark, sfDir).queryExecution.executedPlan
        println(s"COUNT $key ${countHash(plan)}")
      } catch { case e: Throwable => println(s"COUNT $key ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
