package graft.model

import org.apache.spark.sql.DataFrame

/** Session-level HANDLE memoization for the shared silver relations.
  *
  * Spark's CacheManager already dedupes silver EXECUTION by logical-plan
  * identity — but every re-call of a silver builder still re-constructs
  * and re-analyzes the full logical tree before the cache lookup can
  * match it, and for the deep silvers (trend directions, anomalies: scan
  * → rollup → explode-join → window → agg) that driver-side planning is
  * ~0.7 s per call at ANY data size (it is planning, not execution — the
  * same cost class as the d6 lineage-truncation fix, measured via
  * [[graft.DevProbe]]-style counts: cached-scan count 0.3 s, fresh
  * builder call 1.1 s). Queries that compose three such silvers (x3/x4/
  * r2) paid it three times.
  *
  * In production the medallion silvers are PERSISTED tables registered
  * once in the catalog — a consumer reads `silver.trend_direction`, it
  * does not re-derive the lineage per query. Memoizing the DataFrame
  * handle per (name, dir, params) is that registration for this
  * library's in-session silvers. One JVM = one session in every harness
  * entry point (Verify/Bench/tests — the [[graft.dedup.Dedup]] cluster
  * memo set the precedent), so keying by directory is sound.
  */
object Silver {
  private val memo =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]()

  /** Return the memoized handle for `name` under `dir`, building (and
    * typically `.cache()`-ing) it on first call. `name` must encode any
    * non-dir parameters (e.g. `"topProductsDec:5"`). */
  def memoize(name: String, dir: String)(build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((name, dir), build)
}
