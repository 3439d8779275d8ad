package graft

import org.apache.spark.sql.functions._
import graft.vector.{IndexStore, Similarity}

/** The index lifecycle round trip: build → persist → load → query must
  * reproduce the in-memory v11 relation bit-for-bit, and the query
  * path must not scan the float corpus beyond the query rows. */
class IndexStoreSpec extends GraftSpec {

  test("persisted IVF-PQ index answers queries bit-identical to in-memory v11") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    try {
      IndexStore.writeIvfPq(spark, sfDir, tmp)
      // the four relations exist and are self-describing
      assert(spark.read.parquet(s"$tmp/cells").count() ==
        graft.model.Tables.embeddings(spark, sfDir).count())
      assert(spark.read.parquet(s"$tmp/codebook").count() == 4 * 8)
      val got = IndexStore.queryIvfPq(spark, tmp, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
          r.getDouble(4)))
      val want = Similarity.ivfPqAnn(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
          r.getDouble(4)))
      assert(want.nonEmpty)
      assert(got.toSeq == want.toSeq,
        "loaded-index query diverged from the in-memory index")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("persisted BM25 posting list answers queries bit-identical to in-memory t15") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lex").toString
    try {
      IndexStore.writeLexical(spark, sfDir, tmp)
      val got = IndexStore.queryLexical(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      val want = graft.text.TextAnalysis.bm25(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assert(want.nonEmpty)
      assert(got.toSeq == want.toSeq,
        "loaded-posting-list query diverged from the in-memory t15 ranking")
      // query plan never touches documents.parquet — the corpus is
      // only needed at index-build time
      val plan = IndexStore.queryLexical(spark, tmp)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("documents.parquet"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("appendIvfPq: half build + delta append is query-identical to a full build") {
    val tmpFull = java.nio.file.Files.createTempDirectory("graft-ivfpq-f").toString
    val tmpInc = java.nio.file.Files.createTempDirectory("graft-ivfpq-i").toString
    val tmpHalf = java.nio.file.Files.createTempDirectory("graft-half").toString
    try {
      val all = graft.model.Tables.embeddings(spark, sfDir)
      val n = all.count()
      val cut = n / 2
      // a dataset dir holding only the first half of the corpus; the
      // quantizer donors (first rows) live entirely inside it, so the
      // frozen quantizers match the full build's
      all.filter(col("vec_id") < cut)
        .write.mode("overwrite").parquet(s"$tmpHalf/embeddings.parquet")
      IndexStore.writeIvfPq(spark, sfDir, tmpFull)
      IndexStore.writeIvfPq(spark, tmpHalf, tmpInc)
      IndexStore.appendIvfPq(spark, sfDir, tmpInc, col("vec_id") >= cut)
      assert(spark.read.parquet(s"$tmpInc/cells").count() == n)
      assert(spark.read.parquet(s"$tmpInc/codes").count() == n)
      // appended assignments/codes match the full build row-for-row
      val cellsDiff = spark.read.parquet(s"$tmpInc/cells")
        .except(spark.read.parquet(s"$tmpFull/cells")).count()
      val codesDiff = spark.read.parquet(s"$tmpInc/codes")
        .except(spark.read.parquet(s"$tmpFull/codes")).count()
      assert(cellsDiff == 0 && codesDiff == 0,
        s"append diverged from full build: $cellsDiff cells, $codesDiff codes")
      val got = IndexStore.queryIvfPq(spark, tmpInc, sfDir).collect().toSeq
      val want = IndexStore.queryIvfPq(spark, tmpFull, sfDir).collect().toSeq
      assert(want.nonEmpty && got == want,
        "incrementally-maintained index answered differently from the full build")
    } finally {
      Seq(tmpFull, tmpInc, tmpHalf).foreach(t =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t)))
    }
  }

  test("query path reads the compressed tables, not the float corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq2").toString
    try {
      IndexStore.writeIvfPq(spark, sfDir, tmp)
      val plan = IndexStore.queryIvfPq(spark, tmp, sfDir)
        .queryExecution.executedPlan.toString
      // embeddings appear ONLY under the query-side scan (vec_id < n
      // pushed down); candidate scoring comes from cells+codes
      assert(plan.contains("cells"))
      assert(plan.contains("codes"))
      val embScans = "embeddings.parquet".r.findAllIn(plan).length
      assert(embScans <= 1, s"float corpus scanned $embScans times in the probe path")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("probe scan partition-prunes to the probed cells' files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq3").toString
    try {
      IndexStore.writeIvfPq(spark, sfDir, tmp) // partitionByCell default on
      // hive layout: one cell=N directory per coarse cell
      val cellDirs = Option(new java.io.File(s"$tmp/cells").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cellDirs.length > 1, "cells table must be hive-partitioned by cell")
      val df = IndexStore.queryIvfPq(spark, tmp, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      // the probed-cell literal IN-filter must reach the cells scan as a
      // PARTITION filter (static pruning: only those dirs are listed)
      assert(plan.contains("PartitionFilters: [cell"),
        s"no partition filter on the cells scan:\n$plan")
      // and the result is still v11's exactly (pruning is a no-op
      // semantically — the cell join already implied it)
      val got = df.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getInt(3), r.getDouble(4)))
      val want = Similarity.ivfPqAnn(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
          r.getDouble(4)))
      assert(got.toSeq == want.toSeq)
      // append keeps the partitioned layout (no flat files at the root)
      IndexStore.appendIvfPq(spark, sfDir, tmp, col("vec_id") < 0) // empty delta
      val flat = Option(new java.io.File(s"$tmp/cells").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(flat.isEmpty, "append must not write flat files into a partitioned cells table")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("trained centroids: fit-once round trip is bit-identical to the " +
    "in-memory fit; a second call loads instead of refitting") {
    import graft.vector.Lloyd
    val tmp = java.nio.file.Files.createTempDirectory("graft-trained").toString
    try {
      val direct = Lloyd.ivfTrain(spark, sfDir, nCentroids = 8, iters = 2)
      // first call under an empty index dir: fits and persists
      val fitted = Lloyd.ivfTrainedOnce(spark, sfDir, 8, 2, Some(tmp))
      assert(fitted.length === direct.length)
      fitted.zip(direct).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b),
          "fit-once centroids diverged from the direct fit")
      }
      // the persisted copy loads bit-identical (doubles survive parquet)
      val loaded = IndexStore.readTrainedCentroids(spark, tmp).get
      loaded.zip(direct).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b),
          "persisted centroids diverged from the in-memory fit")
      }
      // an empty dir reads as None, never a bogus quantizer
      assert(IndexStore.readTrainedCentroids(spark, s"$tmp/nope").isEmpty)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("appendIvfPq detects a FLAT cells layout and appends flat") {
    // the layout probe goes through the Hadoop FileSystem API (works on
    // file://, hdfs://, s3a:// alike — java.io.File silently returned
    // null off the local FS and would demote every object-store append);
    // this is the probe's false branch with a real delta
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq4").toString
    val tmpHalf = java.nio.file.Files.createTempDirectory("graft-half2").toString
    try {
      val all = graft.model.Tables.embeddings(spark, sfDir)
      val n = all.count()
      val cut = n / 2
      all.filter(col("vec_id") < cut)
        .write.mode("overwrite").parquet(s"$tmpHalf/embeddings.parquet")
      IndexStore.writeIvfPq(spark, tmpHalf, tmp, partitionByCell = false)
      IndexStore.appendIvfPq(spark, sfDir, tmp, col("vec_id") >= cut)
      assert(spark.read.parquet(s"$tmp/cells").count() == n)
      val cellDirs = Option(new java.io.File(s"$tmp/cells").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cellDirs.isEmpty,
        "append must not introduce hive partitions into a flat cells table")
    } finally {
      Seq(tmp, tmpHalf).foreach(t =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t)))
    }
  }
}
