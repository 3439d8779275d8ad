package graft

import graft.streaming.{ArrivingVec, StreamingVector}
import graft.vector.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The stateless ANN-freshness twin of batch v38: arrival-time scores,
  * merged with the static snapshot main leg at read, must be
  * bit-identical to the batch merged ranking under any micro-batch
  * split and under re-delivery. */
class StreamingVectorSpec extends GraftSpec {

  test("streamed arrival scores + static main leg compose bit-identical " +
      "to batch v38 across uneven micro-batch splits with re-delivery") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Similarity.deltaIndexAnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4))).toSeq
    val delta = graft.model.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 >= 8)
      .collect()
      .map(r => ArrivingVec(r.getLong(0),
        r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id)
    assert(delta.nonEmpty)
    val queries = Similarity.deltaIndexQueries(spark, sfDir)
      .localCheckpoint() // static side frozen once, like a served index
    val input = MemoryStream[ArrivingVec]
    val q = StreamingVector.scoreArrivals(input.toDS(), queries)
      .writeStream.outputMode("append").format("memory")
      .queryName("vec_scores").start()
    try {
      val (b1, rest) = delta.splitAt(3)
      val (b2, b3) = rest.splitAt(math.max(rest.length / 2, 1))
      input.addData(b1.toIndexedSeq); q.processAllAvailable()
      input.addData(b2.toIndexedSeq); q.processAllAvailable()
      // re-deliver two batch-1 vectors with the final batch
      input.addData((b3 ++ b1.take(2)).toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("vec_scores")
      // idempotent: re-delivered vectors re-emit identical rows
      assert(streamed.count() > streamed.distinct().count())
      val merged = Similarity
        .deltaIndexMainLeg(spark, sfDir)
        .unionByName(streamed.distinct())
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc, col("neighbor_id").asc)))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("from_delta"), col("cosine"))
        .orderBy(col("query_id"), col("rank"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3),
          r.getDouble(4))).toSeq
      assert(merged === batch)
    } finally q.stop()
  }
}
