package graft

import graft.vector.{Lloyd, Similarity}
import org.apache.spark.sql.functions._

/** The trained-codebook path: deterministic Lloyd must (a) be a pure
  * function of the data — bit-identical across runs — and (b) improve
  * the quantizer objectives it optimizes, relative to the donor init:
  * PQ total reconstruction error (Lloyd's monotone-distortion
  * guarantee) and IVF cell tightness (mean best-cell cosine).
  *
  * End-to-end cosine recall@k is NOT asserted: the synthetic embeddings
  * are unstructured noise, so nearest-neighbor sets are chance-level and
  * quantizer quality cannot move them (measured: pq recall ~0.2 both
  * paths at sf0.01). On clustered real embeddings the recall gain
  * follows the distortion gain; the distortion/tightness asserts below
  * are the trainable objectives themselves. */
class TrainedCodebookSpec extends GraftSpec {

  test("pqTrain is bit-deterministic across runs") {
    val a = Lloyd.pqTrain(spark, sfDir)
    val b = Lloyd.pqTrain(spark, sfDir)
    assert(a.flatten.flatten.toSeq === b.flatten.flatten.toSeq,
      "two fits of the same corpus must be bitwise identical")
  }

  test("ivfTrain is bit-deterministic across runs") {
    val a = Lloyd.ivfTrain(spark, sfDir)
    val b = Lloyd.ivfTrain(spark, sfDir)
    assert(a.flatten.toSeq === b.flatten.toSeq)
  }

  test("trained PQ codebook strictly reduces total reconstruction error") {
    val donor = Similarity.pqCodes(spark, sfDir)
      .agg(sum("recon_d2")).head.getDouble(0)
    val trained = Similarity.pqCodesTrained(spark, sfDir)
      .agg(sum("recon_d2")).head.getDouble(0)
    assert(trained < donor,
      s"Lloyd must not worsen distortion (donor=$donor trained=$trained)")
    // measured ~33% cut on the fixture; assert a conservative floor so
    // a silently broken trainer (e.g. ignoring updates) fails loudly
    assert(trained < donor * 0.9,
      s"trained distortion barely moved: donor=$donor trained=$trained")
  }

  test("trained IVF centroids tighten cells (mean best-cell cosine up)") {
    val embs = graft.model.Tables.embeddings(spark, sfDir).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def avgBestCos(cents: Array[Array[Double]]): Double =
      embs.map { e =>
        val en = math.sqrt(dot(e, e))
        cents.map(c => dot(e, c) / (en * math.sqrt(dot(c, c)))).max
      }.sum / embs.length
    val donor = avgBestCos(embs.take(8))
    val trained = avgBestCos(Lloyd.ivfTrain(spark, sfDir))
    assert(trained > donor,
      s"training must tighten cells (donor=$donor trained=$trained)")
  }

  test("trained paths flow end-to-end: pqRecall and ivfAnn run trained") {
    val r = Similarity.pqRecall(spark, sfDir, trainedIters = 2)
    assert(r.count() > 0)
    assert(r.filter(col("recall") < 0 || col("recall") > 1).count() === 0)
    val a = Similarity.ivfAnn(spark, sfDir, trainedIters = 2)
    assert(a.count() > 0)
    assert(a.filter(col("cosine") < -1 || col("cosine") > 1).count() === 0)
  }
}
