package graft

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.text.Sampling

/** Certifies smp1/smp2's sampling invariants beyond the oracle hash:
  * exact-budget apportionment, the top-k merge identity that makes the
  * hash-rank draw distributed-safe, and weight monotonicity of the
  * ticket scheme. */
class SamplingSpec extends GraftSpec {

  test("smp1: quotas sum to exactly the budget and respect strata sizes") {
    val budget = 37 // deliberately awkward: forces nonzero remainders
    val sample = Sampling.stratifiedSample(spark, sfDir, budget).collect()
    assert(sample.length == budget)
    val byStratum = sample.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .view.mapValues(_.length.toLong).toMap
    val strataSizes = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r.getAs[Long]("count"))
      .toMap
    val total = strataSizes.values.sum
    byStratum.foreach { case (k, n) =>
      val share = budget.toLong * strataSizes(k)
      val base = share / total
      // largest-remainder: each stratum gets floor(share) or floor(share)+1
      assert(n == base || n == base + 1,
        s"stratum $k drew $n, Hamilton allows only $base or ${base + 1}")
      assert(n <= strataSizes(k), s"stratum $k oversampled")
    }
  }

  test("smp1: draw is a pure function of doc_id — stable under repartitioning") {
    val a = Sampling.stratifiedSample(spark, sfDir, 50)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val b = Sampling.stratifiedSample(
      spark.newSession(), sfDir, 50) // fresh session, default partitioning
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b)
  }

  test("smp1: top-k merge identity — the k hash-smallest of a union are found among the k smallest of each part") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def rank(id: Long): Long = ((id % 1000000007L) * 2654435761L) % 999999937L
    val k = 20
    val (partA, partB) = docs.partition(_ % 2 == 0) // arbitrary split
    val merged = (partA.sortBy(rank).take(k) ++ partB.sortBy(rank).take(k))
      .sortBy(rank).take(k).toSet
    val global = docs.sortBy(rank).take(k).toSet
    assert(merged == global)
  }

  test("smp2: heavier docs win more often — empirical inclusion rises with weight") {
    val sample = Sampling.weightedSample(spark, sfDir, 100)
      .collect()
    val weights = sample.map(_.getAs[Long]("weight"))
    val corpus = Tables.documents(spark, sfDir)
      .withColumn("weight", expr("GREATEST(1L, LEAST(16L, n_chars DIV 64))"))
      .groupBy(col("weight")).count().collect()
      .map(r => r.getAs[Long]("weight") -> r.getAs[Long]("count")).toMap
    val sampleMean = weights.sum.toDouble / weights.length
    val corpusMean = corpus.map { case (w, n) => w * n }.sum.toDouble /
      corpus.values.sum
    assert(sampleMean > corpusMean,
      s"weighted draw mean $sampleMean must exceed corpus mean $corpusMean")
  }

  test("smp2: draw keys are the global minimum — no doc outside the sample beats one inside") {
    val sample = Sampling.weightedSample(spark, sfDir, 50).collect()
    val maxIn = sample.map(_.getAs[Long]("draw_key")).max
    val sampleIds = sample.map(_.getAs[Long]("doc_id")).toSet
    val beaten = Sampling.weightedSample(spark, sfDir, Int.MaxValue)
      .filter(col("draw_key") < maxIn)
      .collect().map(_.getAs[Long]("doc_id"))
      .filterNot(sampleIds)
    assert(beaten.isEmpty, s"${beaten.length} docs with smaller keys were excluded")
  }
}
