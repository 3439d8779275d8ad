package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry lint over `SparkEntry`: the oracle gate only checks keys it
  * can see, so a key registered in `queries` but accidentally missing
  * from `oracleSql` silently degrades to the weaker rows-only check —
  * the one failure mode the driver's correctness table cannot flag
  * (it reports `no_oracle` as if it were by design). Every rows-only
  * key must therefore be DECLARED here with the reason no DuckDB twin
  * can exist; anything else missing an oracle fails this spec at commit
  * time, the same pattern as the HUGEINT lint. */
class QueryRegistrySpec extends AnyFunSuite {

  /** Keys with no oracle BY DESIGN, each with the reason. */
  private val rowsOnly: Map[String, String] = Map(
    "s6_file_inventory" -> "Spark _metadata hidden column has no DuckDB analogue",
    "sk18_native_hll" -> "Datasketches HLL estimates are implementation-defined (the in-row n_exact column is the anchor; NativeHllSpec bounds error and asserts lossless union)",
    "sk19_native_quantiles" -> "GK approx_percentile summaries are implementation-defined (the in-row positional exact columns are the anchor; NativeQuantileSpec asserts the rank-error bound)",
    "sk1_daily_approx" -> "HLL++/GK sketch values are implementation-defined",
    "sk2_store_sku_approx" -> "HLL++ sketch values are implementation-defined",
    "sk3_store_top_sellers" -> "Misra-Gries summary contents are algorithm-defined",
    "sk5_domain_vocab_approx" -> "HLL++ sketch values are implementation-defined (t16 is the exact anchor)",
    // the xxhash twins (d5/d9/d10/d11/d13/t8) moved to the hash gate in
    // r13: their id silvers are materialized via OracleSilver and the
    // downstream algebra is SQL both engines run over the same bytes
    "m2_multimodal" -> "PNG/WAV/Y4M container parsing has no DuckDB analogue",
    "m4_frame_dedup" -> "frame hashes derive from the Y4M frame-plane decode DuckDB cannot do (MultimodalSpec recomputes from an independent walk)",
    "m6_audio_windows" -> "features derive from WAV byte parsing DuckDB cannot do",
    // m7/m9/m11/v28 joined the hash gate in r13 via the OracleSilver
    // feature/codebook silvers (the decode/fit halves stay spec-certified)
    "sk6_rolling_approx" -> "Datasketches HLL estimates are implementation-defined (e15 is the exact anchor)",
    "k4_clustering_audit" -> "Spark _metadata file ranges have no DuckDB analogue (SkewSpec asserts both layouts exactly)",
    "m8_image_near_dup" -> "aHashes derive from PNG pixel decode (inflate+unfilter) DuckDB cannot do; spec pins to javax.imageio",
    "sk9_audience_overlap" -> "Datasketches HLL estimates are implementation-defined (SketchesSpec brackets all four vs exact)",
    "m10_phash_dup" -> "pHashes derive from PNG pixel decode + DCT DuckDB cannot do (MultimodalSpec asserts banded-candidate completeness vs all-pairs)",
    "sk12_hll_sweep" -> "HLL estimates are implementation-defined (SketchesSpec brackets every tier against the exact count)")

  test("every query key has an oracle or a declared rows-only reason") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val undeclared = (q -- o -- rowsOnly.keySet).toSeq.sorted
    assert(undeclared.isEmpty,
      s"keys with neither oracle nor declared rows-only reason: " +
        undeclared.mkString(", "))
  }

  test("no orphan oracle SQL (oracle for an unregistered key)") {
    val orphans = (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet)
      .toSeq.sorted
    assert(orphans.isEmpty, s"oracleSql without queries entry: " +
      orphans.mkString(", "))
  }

  test("declared rows-only keys are actually rows-only (and registered)") {
    val wrong = rowsOnly.keySet.filter(SparkEntry.oracleSql.contains).toSeq.sorted
    assert(wrong.isEmpty,
      s"declared rows-only but an oracle exists (remove from the list): " +
        wrong.mkString(", "))
    val gone = rowsOnly.keySet.filterNot(SparkEntry.queries.contains).toSeq.sorted
    assert(gone.isEmpty, s"declared rows-only but not registered: " +
      gone.mkString(", "))
  }
}
