package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsBatch
import graft.dedup.Dedup
import graft.export.Flatten
import graft.model.Tables

/** Invariants for e28 absorption probability, d24 chunk-level dedup,
  * and the x12 retrieval-stack card. */
class ChunkAbsorptionSpec extends GraftSpec {

  test("e28: probabilities match an exact in-process integer recursion") {
    val edgeRows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (_, rows) =>
        val types = rows.sortBy(r =>
          (r.getAs[java.sql.Timestamp]("ts").getTime, r.getLong(2)))
          .map(_.getString(3)).toList
        types.zip(types.drop(1))
      }
      .groupBy(x => x).view.mapValues(_.size.toLong).toMap
    val out = EventsBatch.absorptionProbability(spark, sfDir).collect()
    val nodes = out.map(_.getString(0)).toSeq.sorted
    val outc = edgeRows.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var p = nodes.map(v => v -> (if (v == "purchase") 1000L else 0L)).toMap
    val steps = (1 to 3).map { _ =>
      p = nodes.map { v =>
        if (v == "purchase") v -> 1000L
        else {
          val mass = edgeRows.collect {
            case ((f, t), c) if f == v => c * p(t)
          }.sum
          v -> (if (outc.getOrElse(v, 0L) == 0L) 0L
                else mass / outc(v))
        }
      }.toMap
      p
    }
    out.foreach { r =>
      val v = r.getString(0)
      assert(r.getAs[Long]("p1_milli") == steps(0)(v), s"p1 $v")
      assert(r.getAs[Long]("p2_milli") == steps(1)(v), s"p2 $v")
      assert(r.getAs[Long]("p3_milli") == steps(2)(v), s"p3 $v")
    }
    // monotone: widening the horizon can only help reach the target
    out.foreach { r =>
      assert(r.getAs[Long]("p1_milli") <= r.getAs[Long]("p2_milli") + 1)
    }
  }

  test("d24: counts conserve and the flag follows the exact 30% rule") {
    val out = Dedup.chunkDedup(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_chunks")
      val d = r.getAs[Long]("n_dup_chunks")
      assert(d <= n)
      assert(r.getAs[Long]("dup_milli") == d * 1000 / n)
      assert(r.getAs[Boolean]("flagged") == (d * 10 >= n * 3))
    }
    // global: duplicated-chunk count is consistent with a direct census
    val chunks = graft.text.Corpus.docsTok(spark, sfDir)
      .select(col("doc_id"), col("words")).collect()
      .flatMap { r =>
        val ws = r.getSeq[String](1)
        ws.grouped(64).filter(_.size >= 8).map(c => (r.getLong(0), c.mkString(" ")))
      }
    val freq = chunks.groupBy(_._2).view.mapValues(_.length).toMap
    val wantDup = chunks.groupBy(_._1).view
      .mapValues(_.count(c => freq(c._2) > 1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_dup_chunks") == wantDup(r.getLong(0)).toLong,
        s"doc ${r.getLong(0)}")
    }
  }

  test("d25: inflation figures reconcile with the d6 label relation") {
    val r = Dedup.dupInflation(spark, sfDir).head
    val labels = Dedup.dupClusters(spark, sfDir).collect()
    assert(r.getAs[Long]("n_docs") == labels.length.toLong)
    val dupClusters = labels.filter(_.getAs[Long]("cluster_size") > 1)
      .map(_.getAs[Long]("cluster_id")).distinct.length.toLong
    assert(r.getAs[Long]("n_dup_clusters") == dupClusters)
    val redundant = labels.count(l => l.getAs[Long]("cluster_size") > 1 &&
      l.getAs[Long]("doc_id") != l.getAs[Long]("cluster_id")).toLong
    assert(r.getAs[Long]("n_redundant_docs") == redundant)
    assert(r.getAs[Long]("wasted_tokens") <= r.getAs[Long]("total_tokens"))
    assert(r.getAs[Long]("wasted_milli") ==
      r.getAs[Long]("wasted_tokens") * 1000 / r.getAs[Long]("total_tokens"))
  }

  test("x13: corpus-health card reconciles with its parent relations") {
    val r = Flatten.exportCorpusHealth(spark, sfDir).head
    val nDocs = graft.text.Corpus.docsTok(spark, sfDir).count()
    assert(r.getAs[Long]("n_docs") == nDocs)
    // d16 drops exactly the non-keeper members of nontrivial clusters —
    // the same population d25 counts as redundant copies
    assert(r.getAs[Long]("n_dropped_docs") == r.getAs[Long]("n_redundant_docs"))
    assert(r.getAs[Long]("n_boilerplate_docs") <= nDocs)
    assert(r.getAs[Long]("wasted_milli") >= 0 &&
      r.getAs[Long]("wasted_milli") <= 1000)
  }

  test("x12: card tops agree with the parent rankings") {
    val card = Flatten.exportRetrievalCards(spark, sfDir).collect()
    assert(card.nonEmpty)
    val sem1 = graft.vector.Similarity.cosineTopK(spark, sfDir, 5, 3)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    card.foreach { r =>
      assert(r.getAs[Long]("sem_top1") == sem1(r.getAs[Long]("query_id")))
      assert(r.getAs[Boolean]("tops_agree") ==
        (r.getAs[Long]("sem_top1") == r.getAs[Long]("lex_top1")))
      val ov = r.getAs[Long]("overlap_at_5")
      assert(ov >= 0 && ov <= 5)
    }
  }
}
