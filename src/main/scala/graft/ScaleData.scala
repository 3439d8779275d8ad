package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N replication of a testdata SF directory, for the
  * sf1.0 scale-slope bench section. The driver ships sf0.001/0.01/0.1;
  * constants that only bite at the next decade (an accidentally
  * quadratic candidate join, a driver-side collect that grows with the
  * corpus) can hide inside the sf0.01→sf0.1 slope, so Bench builds a
  * 10× replica of sf0.1 under the build directory and re-times the
  * heaviest keys there.
  *
  * Replication model: "more traffic over the same dimensions" — fact
  * tables (lineitem/orders/events/documents/embeddings) are unioned
  * `factor` times with replica-shifted PRIMARY keys (orderkey, event
  * id, doc id, vec id) while dimension keys (suppkey=store, partkey,
  * custkey) and timestamps stay fixed, so per-store/per-day/per-token
  * densities scale the way a larger corpus actually would; dimension
  * tables are byte-copied. Text and vectors repeat verbatim across
  * replicas — exact-dup groups grow by `factor` (bounded), shingle dfs
  * scale ×`factor`, vocabulary stays fixed; fine for the throughput
  * question this section asks, and stated here so nobody reads the
  * replica as a statistical corpus. */
object ScaleData {
  private val FactTables = Seq("lineitem", "orders", "events",
    "documents", "embeddings")
  private val DimTables = Seq("region", "nation", "customer",
    "supplier", "part")

  /** Per-table (key column → replica shift) so replicated keys never
    * collide with the originals (maxima at sf1.0 stay far below). */
  private val KeyShifts: Map[String, Seq[(String, Long)]] = Map(
    "lineitem" -> Seq("l_orderkey" -> 100000000000L),
    "orders" -> Seq("o_orderkey" -> 100000000000L),
    "events" -> Seq("event_id" -> 1000000000000L, "user_id" -> 1000000000L),
    "documents" -> Seq("doc_id" -> 1000000000L),
    "embeddings" -> Seq("vec_id" -> 1000000000L))

  /** Build `outDir` as a `factor`× replica of `srcDir` once; subsequent
    * calls are a no-op (sentinel file). Returns outDir. */
  def ensure(spark: SparkSession, srcDir: String, outDir: String,
             factor: Int = 10): String = {
    val out = new java.io.File(outDir)
    val sentinel = new java.io.File(out, "_SCALE_DONE")
    if (sentinel.exists()) return outDir
    out.mkdirs()
    DimTables.foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$srcDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    FactTables.foreach { t =>
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      val shifted: DataFrame = KeyShifts(t).foldLeft(
        base.crossJoin(broadcast(
          spark.range(factor.toLong).select(col("id").as("__replica"))))) {
        case (df, (key, shift)) =>
          df.withColumn(key, col(key) + col("__replica") * shift)
      }
      shifted.drop("__replica")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    sentinel.createNewFile()
    outDir
  }
}
