package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-level HANDLE memoization for the shared silver relations,
  * materialized to PLAN LEAVES.
  *
  * Spark's CacheManager already dedupes silver EXECUTION by logical-plan
  * identity — but every re-call of a silver builder still re-constructs
  * and re-analyzes the full logical tree before the cache lookup can
  * match it, and for the deep silvers (trend directions, anomalies: scan
  * → rollup → explode-join → window → agg) that driver-side planning is
  * ~0.7 s per call at ANY data size (it is planning, not execution — the
  * same cost class as the d6 lineage-truncation fix). Queries that
  * compose three such silvers (x3/x4/r2) paid it three times. Worse, the
  * cost COMPOUNDS with the number of cached entries: every action's
  * `useCachedData` canonicalizes each fragment of the incoming plan
  * against every cached plan, so ~40 deep cached silvers tax EVERY query
  * in the suite (the r7 bench's uniform per-key constant).
  *
  * The fix is the production posture: in a medallion lake the silvers
  * are PERSISTED tables registered once in the catalog — a consumer
  * reads `silver.trend_direction` as a SCAN LEAF, it does not re-derive
  * (or re-match) the lineage per query. Here the first call builds the
  * silver once, `localCheckpoint` materializes it, and the memoized
  * handle is a `LogicalRDD` LEAF: consumer plans are shallow (cheap to
  * analyze/canonicalize), and the builder's interim `.cache()` entry is
  * dropped so the CacheManager stays small. Disable with
  * `spark.graft.silver.leaf=false` (SQL conf or system property) to get
  * the plain cached-plan behavior (some plan-shape tests want the full
  * lineage visible).
  *
  * A DataFrame is bound to the session that built it, so the key
  * includes the session — a second session in the same JVM (the
  * extension-wiring pattern some specs use) builds its own handles
  * instead of receiving frames bound to a session it doesn't own. */
object Silver {
  private val memo =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  private def leafEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.silver.leaf")
      .orElse(sys.props.get("spark.graft.silver.leaf"))
      .forall(_ == "true")

  /** Return the memoized handle for `name` under `dir` in `spark`,
    * building (and leaf-materializing) it on first call. `name` must
    * encode any non-dir parameters (e.g. `"topProductsDec:5"`). Keyed by
    * session IDENTITY — the handful of sessions a JVM holds makes the
    * strong reference harmless. */
  def memoize(spark: SparkSession, name: String, dir: String)
             (build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, name, dir), {
      val df = build
      if (leafEnabled(spark)) {
        // eager localCheckpoint: one job materializes the silver into
        // executor-local blocks and the handle's plan becomes a leaf;
        // the builder's own cache entry is then redundant (the
        // checkpoint holds its own copy), so drop it to keep
        // CacheManager's entry list — which every action scans — small
        val leaf = df.localCheckpoint()
        df.unpersist()
        leaf
      } else df
    })
}
