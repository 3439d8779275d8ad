package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a list of keys (twice each — cold then warm) at an
  * arbitrary SF dir in ONE session, for probing keys the Bench sf1.0
  * top-40 sampling rule doesn't reach.
  * `sbt "Test/runMain graft.ScaleProbeTool <sfDir> k1 k2 ..."` */
object ScaleProbeTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { key =>
      try {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(key)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $key cold=${times.head}%.2f warm=${times.last}%.2f")
      } catch {
        case e: Throwable => println(s"PROBE $key ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
