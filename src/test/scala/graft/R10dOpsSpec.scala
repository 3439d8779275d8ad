package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Invariant specs for the round-10 batch-4 keys: a54 Theil–Sen robust
  * trend, t32 Flesch readability profile, er3 entity clusters. */
class R10dOpsSpec extends GraftSpec {

  test("a54: every store's slope is the lower median of the in-process " +
      "pairwise-slope scan over the trailing 60 dates") {
    val got = graft.analytics.Series.theilSen(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val byStore = Tables.sales(spark, sfDir)
      .groupBy(col("store_id"), col("sale_date"))
      .agg(((sum(col("line_total")) - sum(col("discount_amount"))) * 100)
        .cast("decimal(18,0)").cast("long").as("net_c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val epoch = java.time.LocalDate.parse("1992-01-01")
    byStore.foreach { case (store, rows) =>
      val pts = rows.toSeq.sortBy(_._2).takeRight(60).map { case (_, d, y) =>
        (java.time.temporal.ChronoUnit.DAYS.between(
          epoch, java.time.LocalDate.parse(d)), y)
      }
      val pairs = for {
        (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
      } yield (y2 - y1, x2 - x1, x1, x2)
      val ordered = pairs.sortBy { case (dy, dx, x1, x2) =>
        (dy.toDouble / dx.toDouble, dy, dx, x1, x2)
      }
      val (dy, dx, _, _) = ordered((ordered.size + 1) / 2 - 1)
      assert(got(store) == (pairs.size.toLong, dy, dx, dy.toDouble / dx),
        s"store $store")
    }
    assert(got.keySet == byStore.keySet)
  }

  test("a54: slopes differ across stores (the fixture is not degenerate)") {
    val slopes = graft.analytics.Series.theilSen(spark, sfDir)
      .select(col("slope_cents_per_day")).collect().map(_.getDouble(0))
    assert(slopes.distinct.length > 1)
  }

  test("t32: group means/extremes match an in-process per-doc recompute " +
      "with truncating division on the negative score sum") {
    val got = graft.text.TextAnalysis.readability(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("lang"), col("text")).collect()
      .map { r =>
        val text = r.getString(2)
        val w = math.max(text.split("\\s+").count(_.nonEmpty), 1).toLong
        val s = math.max("[.!?]+".r.findAllIn(text).size, 1).toLong
        val y = math.max("[aeiouy]+".r
          .findAllIn(text.toLowerCase).size, 1).toLong
        (r.getString(0), r.getString(1),
          206835L - (1015L * w) / s - (84600L * y) / w, w, y)
      }.groupBy(d => (d._1, d._2))
    docs.foreach { case (key, ds) =>
      val scores = ds.map(_._3)
      val sumS = scores.sum
      val n = ds.size.toLong
      val mean = sumS / n // JVM long division truncates — as do both engines
      val expect = (n, mean, scores.min, scores.max,
        ds.map(_._5).sum * 1000L / ds.map(_._4).sum)
      assert(got(key) == expect, s"group $key")
    }
    assert(got.keySet == docs.keySet)
  }

  test("er3: histogram matches an in-process union-find over the er1 " +
      "link pairs, and the fixture resolves real entities") {
    val links = graft.analytics.Linkage.scoredPairs(spark, sfDir)
      .where(col("decision") === "link")
      .select(col("key_c"), col("key_d")).collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val verts = Tables.part(spark, sfDir).select(col("p_partkey")).collect()
      .flatMap(r => Seq(r.getLong(0) * 2, r.getLong(0) * 2 + 1))
    val parent = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
    def find(v: Long): Long =
      if (parent(v) == v) v
      else { val r = find(parent(v)); parent(v) = r; r }
    links.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusters = verts.groupBy(find)
    val expect = clusters.values
      .map(ms => (ms.length.toLong, ms.map(_ / 2).distinct.length == 1))
      .groupBy(_._1)
      .map { case (size, cs) =>
        size -> (cs.size.toLong, cs.count(_._2).toLong, size * cs.size)
      }
    val got = graft.analytics.Linkage.entityClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    // records conserve: every clean and dirty row lands in exactly one cluster
    assert(got.values.map(_._3).sum == verts.length.toLong)
    // the linkage actually resolves: some multi-member pure clusters exist
    val pureMulti = got.filter { case (size, (_, pure, _)) =>
      size >= 2 && pure > 0 }
    assert(pureMulti.nonEmpty,
      "fixture must contain pure resolved entities (true 1:1 matches)")
  }
}
