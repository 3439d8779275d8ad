package graft

import graft.model.OracleSilver
import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle-silver path contract (ADVICE r12 medium + r13 low):
  * writes are namespaced by scale-factor basename so a multi-SF Bench
  * session can never clobber one scale's bytes with another's, the SQL
  * builders embed the path of the MOST RECENT WRITE (same-JVM, recorded
  * ONLY at write time — dirFor is pure so read-path callers cannot
  * repoint the SQL), a never-written table embeds a sentinel that fails
  * loudly at read_parquet instead of matching stale bytes, and the
  * read-back relation is the physical bytes the oracle sees. */
class OracleSilverSpec extends GraftSpec {

  test("dirFor namespaces by sf basename and is pure; sqlGlob tracks " +
      "the last WRITE only") {
    import spark.implicits._
    val a = OracleSilver.dirFor("spec_probe", "/root/testdata/sf0.001")
    val b = OracleSilver.dirFor("spec_probe", "/root/testdata/sf0.01")
    assert(a !== b)
    assert(a.endsWith("/sf0.001/spec_probe"))
    assert(b.endsWith("/sf0.01/spec_probe"))
    // per-JVM run segment: concurrent same-host JVMs verifying the SAME
    // scale write disjoint subtrees (and each JVM's SQL embeds its own)
    assert(a.contains("/run-"))
    // both under the shared fixed root (NOT delete-at-exit: the DuckDB
    // compare runs after the writer JVM exits)
    assert(a.startsWith(OracleSilver.root) && b.startsWith(OracleSilver.root))
    // deriving a path records nothing...
    assert(OracleSilver.sqlGlob("spec_probe").contains(
      "never_written_this_session"))
    // ...a write records; a later read-path dirFor at ANOTHER scale
    // must NOT repoint the embedded SQL (the r13 read-records-too bug)
    OracleSilver.materialize(spark, "spec_probe",
      "/root/testdata/sf0.01") { Seq(1L).toDF("id") }
    assert(OracleSilver.sqlGlob("spec_probe") === s"$b/*.parquet")
    OracleSilver.dirFor("spec_probe", "/root/testdata/sf0.001")
    assert(OracleSilver.sqlGlob("spec_probe") === s"$b/*.parquet")
  }

  test("a table never written this session embeds a loud sentinel, " +
      "never a stale-byte match") {
    assert(OracleSilver.sqlGlob("spec_never_written") ===
      s"${OracleSilver.root}/never_written_this_session/" +
        "spec_never_written/*.parquet")
  }

  test("materialize writes, reads back the physical bytes, and two " +
      "scale factors coexist without clobbering") {
    import spark.implicits._
    val small = OracleSilver.materialize(spark, "spec_rows", sfDir) {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    assert(small.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq === Seq((1L, "a"), (2L, "b")))
    // a second sf writes its own subdir; the first one's bytes survive
    val other = OracleSilver.dirFor("spec_rows", "/root/testdata/sf0.01")
    Seq((9L, "z")).toDF("id", "v")
      .write.mode("overwrite").parquet(other)
    val firstAgain = spark.read.parquet(
      OracleSilver.dirFor("spec_rows", sfDir))
    assert(firstAgain.count() === 2)
    assert(spark.read.parquet(other).count() === 1)
    // memoized handle: a second materialize call returns the same rows
    // without re-running the builder (builder would throw if re-run)
    val again = OracleSilver.materialize(spark, "spec_rows", sfDir) {
      sys.error("builder must not re-run for a memoized silver")
    }
    assert(again.count() === 2)
  }
}
