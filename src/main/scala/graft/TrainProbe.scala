package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe for the trained-codebook path (tooling like Explain/Profile,
  * not part of the driver contract). */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    import graft.vector.{Similarity, Lloyd}
    val donorD2 = Similarity.pqCodes(spark, dir).agg(sum("recon_d2")).head.getDouble(0)
    val trainedD2 = Similarity.pqCodesTrained(spark, dir).agg(sum("recon_d2")).head.getDouble(0)
    println(s"PROBE pq recon_d2 donor=$donorD2 trained=$trainedD2")
    // IVF objective: mean best-cell cosine, donor vs trained centroids
    val embs = graft.model.Tables.embeddings(spark, dir).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    def avgBestCos(cents: Array[Array[Double]]): Double = {
      def dot(a: Array[Double], b: Array[Double]) = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      embs.map { e =>
        val en = math.sqrt(dot(e, e))
        cents.map(c => dot(e, c) / (en * math.sqrt(dot(c, c)))).max
      }.sum / embs.length
    }
    val donorCents = embs.take(8)
    val trainedCents = Lloyd.ivfTrain(spark, dir)
    println(s"PROBE ivf avgBestCos donor=${avgBestCos(donorCents)} trained=${avgBestCos(trainedCents)}")
    val t1 = Lloyd.pqTrain(spark, dir); val t2 = Lloyd.pqTrain(spark, dir)
    println(s"PROBE pq deterministic=${t1.flatten.flatten.toSeq == t2.flatten.flatten.toSeq}")
    val c1 = Lloyd.ivfTrain(spark, dir); val c2 = Lloyd.ivfTrain(spark, dir)
    println(s"PROBE ivf deterministic=${c1.flatten.toSeq == c2.flatten.toSeq}")
    spark.stop()
  }
}
