package graft

import org.apache.spark.sql.functions._

/** Round-13 operator contracts: er8 (the ER loop closed — er5's sweep
  * re-run under er7's leave-block-out weights). */
class R13OpsSpec extends GraftSpec {

  private val dir = sfDir

  test("er8: decision diffs vs er1 are exactly the pairs whose scores " +
      "straddle a threshold under the old/new weights") {
    val upper = 2000L
    val lower = 0L
    val old = graft.analytics.Linkage.scoredPairs(spark, dir, upper, lower)
      .select(col("key_c"), col("key_d"),
        col("score_milli").as("s_old"), col("decision").as("d_old"))
    val neu = graft.analytics.Linkage
      .unbiasedScoredPairs(spark, dir, upper, lower)
      .select(col("key_c"), col("key_d"),
        col("score_milli").as("s_new"), col("decision").as("d_new"))
    val j = old.join(neu, Seq("key_c", "key_d")).collect()
    // same candidate universe: er8 rescans er1's pairs, never re-blocks
    assert(j.length === old.count())
    assert(j.length === neu.count())
    def side(s: Long): String =
      if (s >= upper) "link" else if (s <= lower) "non_link" else "possible"
    j.foreach { r =>
      val (sOld, dOld) = (r.getAs[Long]("s_old"), r.getAs[String]("d_old"))
      val (sNew, dNew) = (r.getAs[Long]("s_new"), r.getAs[String]("d_new"))
      // decisions are pure functions of the scores...
      assert(side(sOld) === dOld)
      assert(side(sNew) === dNew)
      // ...so a decision diff exists iff the two scores straddle a
      // threshold boundary, and agreement means both sit on one side
      assert((dOld != dNew) === (side(sOld) != side(sNew)))
    }
  }

  test("er8 sweep: cumulative counts are monotone and anchored at the " +
      "unbiased scored relation") {
    val sweep = graft.analytics.Linkage.unbiasedSweep(spark, dir)
      .orderBy(col("tau_milli").desc).collect()
    assert(sweep.nonEmpty)
    val scored = graft.analytics.Linkage.unbiasedScoredPairs(spark, dir)
    // one sweep row per distinct unbiased score
    assert(sweep.length === scored.select("score_milli").distinct().count())
    // n_link cumulative in descending tau; the last row covers all pairs
    val nLinks = sweep.map(_.getAs[Long]("n_link"))
    assert(nLinks.zip(nLinks.tail).forall { case (a, b) => a <= b })
    assert(nLinks.last === scored.count())
    // recall at the loosest threshold counts every true pair exactly once
    val nTrue = scored.agg(sum(col("is_true"))).head.getLong(0)
    assert(sweep.last.getAs[Long]("n_true_link") === nTrue)
  }
}
