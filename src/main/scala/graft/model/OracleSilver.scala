package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped root for the ORACLE-READABLE silvers — the m12
  * discipline (write the engine-computed silver to parquet at a path the
  * DuckDB oracle's read_parquet() can see, read it BACK, run the
  * downstream algebra over the physical bytes; the oracle runs its own
  * algebra over the same files). Used by every key whose upstream half
  * has no SQL analogue (xxhash64 id assignment, PNG/WAV/Y4M decode,
  * Lloyd codebook training) but whose downstream algebra is plain SQL.
  *
  * The root is a FIXED path and the silvers are NOT cleaned at JVM
  * exit — deliberately: the oracle compare runs in a separate DuckDB
  * process AFTER the Verify JVM exits, so the bytes must outlive the
  * writer. Accumulation stays bounded because every (sf, table) pair
  * overwrites its own fixed subdir on each run.
  *
  * The r12 fixed single-level path allowed a CROSS-SF clobber — Bench
  * runs the same key at sf0.1, sf0.01 (slope) and sf1.0 in one session,
  * each overwriting the previous scale's bytes — closed by namespacing
  * every write with the sf basename. The r13 residue (concurrent
  * same-host JVMs verifying the SAME scale factor raced on one fixed
  * path) is closed by a per-JVM RUN SEGMENT in the path: each JVM
  * writes under its own `run-<pid>-<startMillis>` subtree and its SQL
  * embeds its own paths, so two JVMs can verify the same scale
  * concurrently without touching each other's bytes. Accumulation is
  * pruned at first use: run subtrees whose files were last modified
  * more than [[PruneAfterMillis]] ago are deleted (the driver's
  * Verify → compare window is minutes; a day-old silver can have no
  * live reader), never the current run's.
  *
  * The SQL side stays consistent because [[graft.Verify]] dumps
  * `SparkEntry.oracleSql` (a def) AFTER running the queries in the SAME
  * JVM: each WRITE records its path here (and only writes record —
  * [[dirFor]] is pure derivation, because the index-GC/rebalance keys
  * also call it on the READ path, and an r13 read-records-too design
  * let a reader of one scale silently repoint another scale's SQL), and
  * the SQL builders embed the recorded path — the oracle always reads
  * exactly the bytes this run's queries wrote. A table never written
  * this session embeds a sentinel path no run ever writes: building the
  * SQL string still succeeds (Verify dumps the FULL oracleSql map even
  * under a dev subset run), but a compare against it fails loudly at
  * read_parquet instead of silently blessing stale bytes from an
  * earlier run (the r13 sf0.01 fallback masked exactly that). */
object OracleSilver {

  val root: String = "/tmp/graft_oracle_silver"

  /** Stale-run retention: subtrees idle longer than this are pruned. */
  val PruneAfterMillis: Long = 24L * 3600 * 1000

  /** This JVM's run segment — pid + JVM start time: unique per live
    * JVM, stable for the JVM lifetime (the SQL dump and the silvers it
    * points at always agree). */
  private[model] val runSeg: String = {
    val pid = ProcessHandle.current().pid()
    val t0 = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getStartTime
    s"run-$pid-$t0"
  }

  /** One-time stale-run prune (first dirFor in the JVM): delete sibling
    * run subtrees idle past retention. Never the current run's; a
    * failure to delete is ignored (another JVM may be pruning too). */
  private lazy val pruned: Unit = {
    def newestMtime(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified() +: Option(f.listFiles()).toSeq.flatten
          .map(newestMtime)).max
      else f.lastModified()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete(): Unit
    }
    val now = System.currentTimeMillis()
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("run-") &&
        d.getName != runSeg)
      .filter(d => now - newestMtime(d) > PruneAfterMillis)
      .foreach(d => try rm(d) catch { case _: Throwable => () })
  }

  private val lastWrite =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Physical dir for silver `table` under scale dir `dir` — pure path
    * derivation (within this JVM's run subtree), safe on read paths;
    * never records. */
  def dirFor(table: String, dir: String): String = {
    pruned
    s"$root/$runSeg/${new java.io.File(dir).getName}/$table"
  }

  /** The path the most recent [[materialize]] of `table` wrote — what
    * the SQL builders embed (same JVM, recorded at write time). */
  def sqlGlob(table: String): String =
    Option(lastWrite.get(table))
      .getOrElse(s"$root/never_written_this_session/$table") +
      "/*.parquet"

  /** Write `df` as the oracle-readable silver `table` for `dir`, read it
    * back, and leaf-memoize the read-back handle (the downstream algebra
    * must run over the PHYSICAL bytes the oracle sees). The recording
    * repeats on memoize HITS too: a later same-JVM run of the query at
    * another scale re-materializes there, and whichever scale ran LAST
    * owns the embedded path — matching Verify's run-then-dump order. */
  def materialize(spark: SparkSession, table: String, dir: String)
                 (df: => DataFrame): DataFrame = {
    val path = dirFor(table, dir)
    val out = Silver.memoize(spark, s"oracleSilver:$table", dir) {
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    lastWrite.put(table, path)
    out
  }
}
