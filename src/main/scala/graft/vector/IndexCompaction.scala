package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.{cosine, dotCol, dotSql, withNorm, withNormSql, defaultNQueries}

/** v39/v40: the vector PLAN → ACTION loop — v38's missing half.
  *
  * v38 serves freshness by merging an IVF snapshot index with a
  * brute-force delta side-table at rank time; its own contract says a
  * compaction job later folds the delta into the main index. These keys
  * EXECUTE that fold on a physical index and put both halves of the
  * k24 plan==action contract under the oracle hash gate:
  *
  *  - the index is MATERIALIZED: snapshot cells written hive-partitioned
  *    by cell with exact one-file-per-cell placement
  *    ([[graft.etl.LakeApply.writeExactFiles]], the OPTIMIZE-grade file
  *    grain), centroids persisted beside them — the reference analogue
  *    is the lake rewrite on every upload (process_upload.py:196-206);
  *  - the FOLD is a real append: delta vectors are assigned to the
  *    FROZEN centroids read back from the index (never re-trained —
  *    re-training is a rebuild, [[IndexStore.appendIvfPq]]'s contract)
  *    and appended as one more file per touched cell;
  *  - v39 re-runs the ANN query against the RE-READ physical cells
  *    table — candidates come from the measured index, scores from the
  *    fact-table floats — and the DuckDB oracle PREDICTS the same
  *    ranking from the fact tables alone, so a hash match certifies the
  *    append placed every delta vector in exactly the planned cell.
  *    `from_delta` is now constant false: nothing is served from a
  *    side-table any more (the v38 SLA tag drains to zero);
  *    `arrived_in_delta` keeps the batch provenance observable.
  *  - v40 emits the MEASURED cell inventory (`_metadata` file counts +
  *    row counts per cell, k4's discipline); the oracle predicts
  *    n_files = (has snapshot rows) + (has delta rows) from the
  *    assignment algebra — the exact-placement proof.
  *
  * Post-fold vs pre-fold semantics, stated honestly: the fold indexes
  * the delta, so delta candidates now arrive via probed cells like
  * everyone else. Pre-fold v38 scanned the delta EXHAUSTIVELY, so its
  * merged ranking can only be a superset-at-equal-rank of the post-fold
  * one (a delta hit in an unprobed cell was visible pre-fold only) —
  * IndexCompactionSpec asserts that containment plus the snapshot-leg
  * equality; recall parity is the nProbe dial, same as any IVF index. */
object IndexCompaction {

  /** Snapshot membership rule — v38's (and d29's): vec_id % 10 < 8. */
  val SnapshotMod = 8L

  /** Physical index roots per (session, sfDir) — built once, shared by
    * v39 and v40; exposed for the spec's file-level assertions. */
  private[graft] val indexDirs =
    scala.collection.concurrent.TrieMap[(SparkSession, String), String]()

  /** Rank-1 frozen-centroid assignment of `vecs` (vec_id, embedding,
    * norm2): max cosine, ties to the lowest centroid — v38's rule. */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val wv = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("centroid_id").asc)
    vecs.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(dotCol(col("embedding"), col("c_emb")),
        col("norm2"), col("c_norm2")))
      .withColumn("crank", row_number().over(wv))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("centroid_id").as("cell"))
  }

  /** Build the snapshot index physically, then FOLD the delta into it.
    * Returns the index root. One build per (session, sfDir). */
  private def foldedIndex(spark: SparkSession, dir: String,
                          nCentroids: Int): String =
    indexDirs.getOrElseUpdate((spark, dir), {
      val indexDir = graft.etl.Scratch.tempDir("v39-index")
      val e = withNorm(spark, dir)
      val snap = e.filter(col("vec_id") % 10 < SnapshotMod)
      // v38's coarse quantizer: the first nCentroids snapshot vectors
      val cents = snap.orderBy(col("vec_id").asc).limit(nCentroids)
        .select(col("vec_id").as("cent_vid"), col("embedding").as("c_emb"),
          col("norm2").as("c_norm2"))
        .withColumn("centroid_id",
          row_number().over(Window.orderBy(col("cent_vid"))) - 1)
        .drop("cent_vid")
      cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
      // snapshot cells: ONE file per cell (the compacted main index)
      graft.etl.LakeApply.writeExactFiles(
        assign(snap, cents).withColumn("__fk", col("cell").cast("string")),
        Seq("cell"), "__fk", s"$indexDir/cells")
      // THE FOLD: delta assigned against the frozen quantizer READ BACK
      // from the index (floats round-trip parquet bit-exactly, so the
      // loaded centroids are the built ones), appended one file per
      // touched cell — partition layout unchanged, probes still prune.
      val centsBack = spark.read.parquet(s"$indexDir/centroids")
      val delta = e.filter(col("vec_id") % 10 >= SnapshotMod)
      graft.etl.LakeApply.writeExactFiles(
        assign(delta, centsBack)
          .withColumn("__fk", col("cell").cast("string")),
        Seq("cell"), "__fk", s"$indexDir/cells", mode = "append")
      indexDir
    })

  /** v39: post-fold ANN from the MEASURED index — candidate identity
    * from the re-read physical cells table, scores from the fact-table
    * floats; the oracle predicts the same relation from the fact tables
    * alone (plan == action, k24's contract on the vector index). */
  def compactionApplied(spark: SparkSession, dir: String, k: Int = 5,
                        nQueries: Int = defaultNQueries,
                        nCentroids: Int = 8, nProbe: Int = 2): DataFrame =
    graft.model.Silver.memoize(spark, "v39CompactionApplied", dir) {
      val indexDir = foldedIndex(spark, dir, nCentroids)
      val cents = broadcast(spark.read.parquet(s"$indexDir/centroids"))
      val e = withNorm(spark, dir)
      val queries = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("norm2").as("q_norm2"))
      val wq = Window.partitionBy(col("query_id"))
        .orderBy(col("qcos").desc, col("centroid_id").asc)
      val qprobe = queries.crossJoin(cents)
        .withColumn("qcos", cosine(dotCol(col("q_emb"), col("c_emb")),
          col("q_norm2"), col("c_norm2")))
        .withColumn("crank", row_number().over(wq))
        .filter(col("crank") <= nProbe)
        .select(col("query_id"), col("centroid_id").as("cell"),
          col("q_emb"), col("q_norm2"))
      // candidates from the PHYSICAL index: the partitioned cells table
      // joined on the probed cells (the inverted-list seek)
      val cells = spark.read.parquet(s"$indexDir/cells")
        .select(col("vec_id").as("neighbor_id"), col("cell"))
      val scored = broadcast(qprobe).join(cells, Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .join(e.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("n_emb"), col("norm2").as("n_norm2")),
          Seq("neighbor_id"))
        .withColumn("cosine", cosine(dotCol(col("q_emb"), col("n_emb")),
          col("q_norm2"), col("n_norm2")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          // the side-table is folded away: nothing is served from it
          lit(false).as("from_delta"),
          (col("neighbor_id") % 10 >= SnapshotMod).as("arrived_in_delta"),
          col("cosine"))
        .orderBy(col("query_id"), col("rank"))
    }

  /** The assigned-cells CTE chain shared by both oracles: ALL vectors
    * (snapshot + delta) assigned to the snapshot-derived frozen
    * centroids — what the folded index must physically contain. */
  private def assignedCtesSql(nCentroids: Int): String =
    s"""e AS ($withNormSql),
       |snap AS (SELECT * FROM e WHERE vec_id % 10 < $SnapshotMod),
       |cents AS (
       |  SELECT vec_id AS cent_vid, embedding AS c_emb, norm2 AS c_norm2,
       |    ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id
       |  FROM snap ORDER BY vec_id LIMIT $nCentroids),
       |aff AS (
       |  SELECT v.vec_id, v.embedding, v.norm2, c.centroid_id,
       |    ${dotSql("v.embedding", "c.c_emb")}
       |      / sqrt(v.norm2 * c.c_norm2) AS ccos
       |  FROM e v CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id AS neighbor_id, centroid_id AS cell,
       |    embedding AS n_emb, norm2 AS n_norm2
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |          ORDER BY ccos DESC, centroid_id ASC) AS crank FROM aff)
       |  WHERE crank = 1)""".stripMargin

  def compactionAppliedSql(k: Int = 5, nQueries: Int = defaultNQueries,
                           nCentroids: Int = 8, nProbe: Int = 2): String =
    s"""WITH ${assignedCtesSql(nCentroids)},
       |qaff AS (
       |  SELECT q.vec_id AS query_id, q.embedding AS q_emb,
       |    q.norm2 AS q_norm2, c.centroid_id AS cell,
       |    ${dotSql("q.embedding", "c.c_emb")}
       |      / sqrt(q.norm2 * c.c_norm2) AS qcos
       |  FROM e q CROSS JOIN cents c WHERE q.vec_id < $nQueries),
       |qprobe AS (
       |  SELECT query_id, cell, q_emb, q_norm2
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY qcos DESC, cell ASC) AS crank FROM qaff)
       |  WHERE crank <= $nProbe),
       |pairs AS (
       |  SELECT p.query_id, a.neighbor_id,
       |    ${dotSql("p.q_emb", "a.n_emb")}
       |      / sqrt(p.q_norm2 * a.n_norm2) AS cosine
       |  FROM qprobe p JOIN assigned a USING (cell)
       |  WHERE p.query_id <> a.neighbor_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM pairs)
       |SELECT query_id, rank, neighbor_id,
       |  FALSE AS from_delta,
       |  (neighbor_id % 10 >= $SnapshotMod) AS arrived_in_delta,
       |  cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** v40: the MEASURED post-fold cell inventory — per cell, read-back
    * row count, delta-batch row count, and distinct `_metadata` file
    * count. Exact placement makes the file count predictable: one
    * snapshot file (if the cell had snapshot rows) + one appended delta
    * file (if the fold touched it). The oracle derives all three from
    * the assignment algebra — the hash gate certifies the fold wrote
    * exactly the planned files with zero row loss. */
  def cellInventory(spark: SparkSession, dir: String,
                    nCentroids: Int = 8): DataFrame =
    graft.model.Silver.memoize(spark, "v40CellInventory", dir) {
      val indexDir = foldedIndex(spark, dir, nCentroids)
      spark.read.parquet(s"$indexDir/cells")
        .select(col("cell"), col("vec_id"),
          col("_metadata.file_path").as("__fp"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"),
          sum((col("vec_id") % 10 >= SnapshotMod).cast("long")).as("n_delta"),
          countDistinct(col("__fp")).as("n_files"))
        .orderBy(col("cell"))
    }

  /** v41: FOLD-RECALL READOUT — the tradeoff v39's fold makes,
    * quantified per query. Pre-fold v38 scans the delta EXHAUSTIVELY
    * (recall-maximal freshness); post-fold the delta is indexed, so
    * delta candidates arrive only via probed cells. This key full-joins
    * the two top-k rankings and emits, per query, the overlap count,
    * recall of the post-fold ranking against the pre-fold reference
    * (the nProbe dial every IVF index trades on), and the delta-hit
    * counts on each side. Both rankings are SQL-predictable, so the
    * whole readout rides the hash gate — and the post side is the
    * MEASURED physical index, so this is also a second independent
    * certification of the fold. */
  def foldRecall(spark: SparkSession, dir: String, k: Int = 5,
                 nQueries: Int = defaultNQueries,
                 nCentroids: Int = 8, nProbe: Int = 2): DataFrame =
    graft.model.Silver.memoize(spark, "v41FoldRecall", dir) {
      val pre = Similarity.deltaIndexAnn(spark, dir, k, nQueries,
          nCentroids, nProbe)
        .select(col("query_id"), col("neighbor_id"),
          col("from_delta").cast("long").as("pre_delta"))
        .withColumn("in_pre", lit(1L))
      val post = compactionApplied(spark, dir, k, nQueries,
          nCentroids, nProbe)
        .select(col("query_id"), col("neighbor_id"),
          col("arrived_in_delta").cast("long").as("post_delta"))
        .withColumn("in_post", lit(1L))
      pre.join(post, Seq("query_id", "neighbor_id"), "full_outer")
        .groupBy(col("query_id"))
        .agg(
          sum(when(col("in_pre") === 1L && col("in_post") === 1L, 1L)
            .otherwise(0L)).as("n_common"),
          sum(coalesce(col("pre_delta"), lit(0L))).as("n_delta_pre"),
          sum(coalesce(col("post_delta"), lit(0L))).as("n_delta_post"))
        .select(col("query_id"), col("n_common"),
          expr(s"n_common * 1000 DIV $k").as("recall_milli"),
          col("n_delta_pre"), col("n_delta_post"))
        .orderBy(col("query_id"))
    }

  def foldRecallSql(k: Int = 5, nQueries: Int = defaultNQueries,
                    nCentroids: Int = 8, nProbe: Int = 2): String =
    s"""WITH pre AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN from_delta THEN 1 ELSE 0 END AS pre_delta,
       |    1 AS in_pre
       |  FROM (${Similarity.deltaIndexAnnSql(k, nQueries, nCentroids, nProbe)})),
       |post AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN arrived_in_delta THEN 1 ELSE 0 END AS post_delta,
       |    1 AS in_post
       |  FROM (${compactionAppliedSql(k, nQueries, nCentroids, nProbe)}))
       |SELECT COALESCE(pre.query_id, post.query_id) AS query_id,
       |  CAST(SUM(CASE WHEN in_pre = 1 AND in_post = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_common,
       |  CAST(SUM(CASE WHEN in_pre = 1 AND in_post = 1 THEN 1 ELSE 0 END)
       |    * 1000 // $k AS BIGINT) AS recall_milli,
       |  CAST(SUM(COALESCE(pre_delta, 0)) AS BIGINT) AS n_delta_pre,
       |  CAST(SUM(COALESCE(post_delta, 0)) AS BIGINT) AS n_delta_post
       |FROM pre
       |FULL JOIN post
       |  ON pre.query_id = post.query_id
       |  AND pre.neighbor_id = post.neighbor_id
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  def cellInventorySql(nCentroids: Int = 8): String =
    s"""WITH ${assignedCtesSql(nCentroids)}
       |SELECT cell,
       |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(CASE WHEN neighbor_id % 10 >= $SnapshotMod
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
       |  CAST(
       |    CASE WHEN SUM(CASE WHEN neighbor_id % 10 < $SnapshotMod
       |      THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END
       |    + CASE WHEN SUM(CASE WHEN neighbor_id % 10 >= $SnapshotMod
       |      THEN 1 ELSE 0 END) > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_files
       |FROM assigned
       |GROUP BY cell
       |ORDER BY cell""".stripMargin
}
