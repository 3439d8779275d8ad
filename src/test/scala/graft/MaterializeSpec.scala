package graft

import graft.etl.{CompanyDaily, Materialize}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MaterializeSpec extends GraftSpec {

  test("silver tables round-trip; company rollup from silver = from facts") {
    val root = Files.createTempDirectory("medallion")
    root.toFile.deleteOnExit()
    val paths = Materialize.writeSummaries(spark, sfDir, root.toString)
    assert(paths.size === 3)

    val silver = Materialize.storeDaily(spark, root.toString)
    // partition column recovered, full content preserved
    assert(silver.columns.contains("sale_date"))
    val fromFacts = graft.etl.StoreDaily.rollupDec(spark, sfDir)
    assert(silver.count() === fromFacts.count())

    val viaSilver = Materialize.companyDailyFromSilver(spark, root.toString)
      .select(col("sale_date"), col("total_sales"), col("total_transactions"))
    val direct = CompanyDaily.rollup(spark, sfDir)
      .select(col("sale_date"), col("total_sales"), col("total_transactions"))
    assert(viaSilver.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(viaSilver).count() === 0)
  }

  test("silver date-range read prunes partitions (plan contains PartitionFilters)") {
    val root = Files.createTempDirectory("medallion2")
    root.toFile.deleteOnExit()
    Materialize.writeSummaries(spark, sfDir, root.toString)
    val pruned = Materialize.storeDaily(spark, root.toString)
      .filter(col("sale_date").between("1998-06-01", "1998-06-30"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("partitionFilters"),
      s"expected partition filters in plan:\n$plan")
    assert(pruned.count() > 0)
  }
}
