package graft

import graft.plans.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank's contract: bit-parity with the single-partition window
  * forms it replaces (`row_number().over(Window.orderBy)` and
  * `ntile(b)`), while the data-sized relation only ever crosses the
  * cluster through `rangepartitioning` — the distributed global-sort
  * shape. The one SinglePartition stage in its plan carries one row
  * per PARTITION (the offsets prefix-sum), not one per datum. */
class GlobalRankSpec extends GraftSpec {

  // deterministic synthetic relation with an adversarial shape: heavy
  // value ties (only 97 distinct weights) broken by the unique id —
  // exactly the "total order via unique tail key" contract
  private lazy val rel = {
    import spark.implicits._
    (1L to 10007L).map { i =>
      val w = (i * 2654435761L) % 97
      (i, w)
    }.toDF("id", "w")
  }

  test("withRowNumber equals the single-partition window row_number") {
    val order = Seq(col("w").desc, col("id").asc)
    val want = rel.withColumn("rk",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    val got = GlobalRank.withRowNumber(rel, "rk", order: _*)
    assert(got.columns.sorted.sameElements(want.columns.sorted))
    val diff = got.select("id", "rk")
      .join(want.select(col("id"), col("rk").as("rk_want")), "id")
      .filter(col("rk") =!= col("rk_want"))
    assert(diff.count() === 0)
    // ranks are a permutation of 1..n
    assert(got.agg(min("rk"), max("rk"), countDistinct("rk")).head ===
      org.apache.spark.sql.Row(1L, 10007L, 10007L))
  }

  test("ntileOf equals the builtin ntile for every bucket count regime") {
    val order = Seq(col("w").asc, col("id").desc)
    val n = rel.count()
    val ranked = GlobalRank.withRowNumber(rel, "rk", order: _*)
    // buckets < n, buckets dividing n-ish, buckets > n (every bucket
    // size 0/1 regime the integer form must reproduce)
    for (b <- Seq(2, 10, 96, 10007, 20000)) {
      val viaFormula = ranked
        .withColumn("bucket", GlobalRank.ntileOf(col("rk"), lit(n), b))
      val viaBuiltin = rel.withColumn("bucket",
        ntile(b).over(Window.orderBy(order: _*)).cast("long"))
      val diff = viaFormula.select("id", "bucket")
        .join(viaBuiltin.select(col("id"), col("bucket").as("want")), "id")
        .filter(col("bucket") =!= col("want"))
      assert(diff.count() === 0, s"ntile($b) diverged")
    }
  }

  test("work stays spread across partitions; ids are stable across evaluations") {
    val got = GlobalRank.withRowNumber(rel, "rk", col("w").asc, col("id").asc)
    // the ranked relation keeps the range partitioning — no data-sized
    // single-partition stage anywhere in its production
    val spread = got.withColumn("pid", spark_partition_id())
      .groupBy("pid").count().collect()
    assert(spread.length > 1, "expected ranked output across many partitions")
    assert(spread.map(_.getAs[Long]("count")).max < 10007L,
      "no partition may hold the whole relation")
    // SEPARATE ACTIONS must agree id-for-id: each evaluation samples its
    // own range boundaries, and the d21 regression proved a formulation
    // whose offsets can misalign under non-reused exchanges returns
    // garbage — zipWithIndex over one RDD instance cannot. Consumers
    // (wordDict/shingleDict) rely on exactly this cross-action stability.
    val a = got.select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GlobalRank.withRowNumber(rel, "rk", col("w").asc, col("id").asc)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("a46 decile summary invariants: sizes differ by at most one, ordered floors") {
    val df = graft.analytics.Kpis.valueDeciles(spark, sfDir).collect()
    assert(df.length === 10)
    val sizes = df.map(_.getAs[Long]("n_custs"))
    assert(sizes.max - sizes.min <= 1L)
    // wide buckets come first (SQL ntile rule)
    assert(sizes.sameElements(sizes.sortBy(-_)))
    // decile 1 holds the richest customers: floors are non-increasing
    val floors = df.sortBy(_.getAs[Long]("decile")).map(_.getAs[Long]("floor_cents"))
    assert(floors.zip(floors.tail).forall { case (a, b) => a >= b })
  }
}
