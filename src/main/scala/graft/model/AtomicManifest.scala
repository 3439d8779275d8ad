package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ATOMIC COMMIT for generation-structured physical stores — the
  * vector index (v39–v44) and the k29 lake rewrite share it. The
  * manifest discipline the r13 index lacked: the live set was derived
  * from PRESENCE (gen-2 dir exists + the sub-centroid silver readable),
  * so a reader between "gen-2 partially written" and "silver recorded",
  * or after a crashed rebalance, could see a TORN index — both
  * generations of a split cell, or neither. Here a single manifest file
  * under the index root alone defines the live (generation, file) set:
  *
  *  - every commit point (snapshot build, delta fold, rebalance, GC)
  *    writes the full entry list to `_manifest.tmp` and promotes it
  *    with ONE `ATOMIC_MOVE` rename — readers see the old manifest or
  *    the new one, never a mix, and data files written before the
  *    rename are simply invisible (a crashed writer leaves garbage
  *    bytes, never a torn view);
  *  - readers resolve files ONLY through the manifest — no directory
  *    listing, no existence probes, no de-list anti-joins;
  *  - every commit ALSO lands as an immutable `_manifest.v<N>`
  *    snapshot: time travel. A reader pinned to version N certifies
  *    that commit's live set regardless of later commits — the
  *    post-fold keys (v39–v41) pin the fold commit so a subsequent
  *    rebalance commit cannot change what they measure (key-execution-
  *    order independence, preserved from the presence-based design).
  *
  * This is the same commit shape as Delta/Iceberg's removeFiles +
  * addFiles transaction log, scoped to one generation-structured index;
  * the reference analogue is the idempotent whole-object overwrite that
  * makes each reference commit atomic (write-metrics
  * lambda_function.py:104). At 100 TB the manifest stays tiny (one line
  * per index FILE, not per row) and the rename is O(1) on any
  * rename-atomic store.
  *
  * Entry format: one `<generation>\t<path relative to the index root>`
  * line per live data file, sorted for determinism. */
object AtomicManifest {

  val Name = "_manifest"

  /** Recursively list the parquet data files under `root/sub`,
    * returning index-root-relative paths (sorted). */
  def listFiles(root: String, sub: String): Seq[String] = {
    val base = new java.io.File(root, sub)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    if (!base.exists()) Seq.empty
    else walk(base)
      .map(_.getPath.stripPrefix(new java.io.File(root).getPath)
        .stripPrefix(java.io.File.separator))
      .sorted
  }

  /** Promote `entries` as the new live set and return the committed
    * VERSION. Two atomic renames: the immutable `_manifest.v<N>`
    * snapshot first (the time-travel anchor a pinned reader resolves —
    * e.g. the post-fold keys keep certifying the fold commit after a
    * later rebalance commit de-lists files from the current view), then
    * the `_manifest` pointer. A crash between the two leaves the
    * previous pointer intact and an orphan version file — still never a
    * torn view. */
  def commit(root: String, entries: Seq[(Long, String)]): Int = {
    val dir = new java.io.File(root)
    dir.mkdirs()
    val body = entries.sortBy(e => (e._1, e._2))
      .map { case (g, p) => s"$g\t$p" }.mkString("", "\n", "\n")
    def promote(target: java.io.File): Unit = {
      val tmp = java.io.File.createTempFile(s"$Name-", ".tmp", dir)
      java.nio.file.Files.write(tmp.toPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp.toPath, target.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
    val n = nextVersion(root)
    promote(new java.io.File(dir, s"$Name.v$n"))
    promote(new java.io.File(dir, Name))
    n
  }

  private def nextVersion(root: String): Int = {
    val vs = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName)
      .collect { case n if n.startsWith(s"$Name.v") =>
        n.stripPrefix(s"$Name.v").toIntOption.getOrElse(0) }
    if (vs.isEmpty) 1 else vs.max + 1
  }

  /** The committed live set — the current pointer, or the immutable
    * `version` snapshot when pinned — or an empty list if no commit has
    * ever been promoted (a reader of an index mid-first-build sees
    * nothing, not partial files). */
  def read(root: String, version: Option[Int] = None): Seq[(Long, String)] = {
    val f = new java.io.File(root,
      version.map(v => s"$Name.v$v").getOrElse(Name))
    if (!f.exists()) Seq.empty
    else new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
      .map { line =>
        val Array(g, p) = line.split("\t", 2)
        (g.toLong, p)
      }
  }

  /** Read generation `gen`'s live files as one DataFrame (hive
    * partition columns resolved against `baseSub`, `_metadata` intact),
    * or None when the generation has no live files. */
  def readGen(spark: SparkSession, root: String, gen: Long,
              baseSub: String, version: Option[Int] = None)
      : Option[DataFrame] = {
    val files = read(root, version).collect { case (`gen`, p) => s"$root/$p" }
    if (files.isEmpty) None
    else Some(spark.read
      .option("basePath", s"$root/$baseSub")
      .parquet(files: _*))
  }
}
