package graft
import org.apache.spark.sql.SparkSession

/** Dev tool for the SURVEY §4 plan audits: print the formatted physical
  * plan of registered query keys without executing them.
  *
  *   sbt "runMain graft.Explain /root/testdata/sf0.01 t9_pii_scrub d12_contamination"
  *
  * No args after the dir → explain every key. This is how the
  * "plan you'd want at 100×" claims in SURVEY/scaladoc are re-checked:
  * look for PushedFilters/ReadSchema on scans, BroadcastHashJoin on
  * dimension sides, WholeStageCodegen span width, partial aggregation. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = args.drop(1).toSet
    // same extensions as Bench: plans must reflect the bench surface
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain] $name failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
