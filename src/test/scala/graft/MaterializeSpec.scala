package graft

import graft.etl.{CompanyDaily, Materialize}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MaterializeSpec extends GraftSpec {

  test("silver tables round-trip; company rollup from silver = from facts") {
    val root = Files.createTempDirectory("medallion")
    root.toFile.deleteOnExit()
    val paths = Materialize.writeSummaries(spark, sfDir, root.toString)
    assert(paths.size === 4)
    assert(paths.contains("payment_daily"))

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

  test("bucketed tables join without a shuffle on the bucketed side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Materialize.writeBucketed(spark, sfDir)
      val joined = Materialize.bucketedJoin(spark)
      val plan = joined.queryExecution.executedPlan.toString
      // the scan side feeding the join must not re-shuffle on store_id;
      // only the final orderBy may exchange (range partitioning)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 0, s"expected no hash exchanges, plan:\n$plan")
      assert(joined.count() > 0)
      // values correct vs unbucketed computation
      val direct = graft.etl.StoreDaily.rollupDec(spark, sfDir)
        .groupBy("store_id").agg(sum("gross_dec").cast("double").as("total_sales"))
      val cmp = joined.select("store_id", "total_sales")
        .exceptAll(direct.select("store_id", "total_sales"))
      assert(cmp.count() === 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
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
