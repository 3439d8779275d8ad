package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a custom
  * `TypedImperativeAggregate` — the approximate top-k-by-count the sketch
  * family (sk1 HLL, sk2 quantiles) was missing, and the
  * `TypedImperativeAggregate` upgrade SURVEY §2.8 declared optional. The
  * buffer holds AT MOST `summarySize` (sku → count) entries regardless of
  * how many distinct keys stream through a partition — the property that
  * matters at 100 TB, where an exact per-group top-k's partial aggregate
  * state is unbounded (every distinct key) but a Misra-Gries partial is a
  * fixed-size summary the shuffle can always carry.
  *
  * Guarantees (classic Misra-Gries + the mergeability result of
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *  - every reported estimate is an UNDER-count: est ≤ true;
  *  - the total decrement `max_err` bounds the loss: true ≤ est + max_err
  *    (the bound is per-summary and survives merges, which add the two
  *    sides' decrements plus the merge-truncation subtraction);
  *  - any key with true count > max_err is guaranteed present;
  *  - with `summarySize` ≥ distinct keys the summary is EXACT
  *    (max_err = 0) — the spec's correctness anchor.
  *
  * Update cost: the classic "decrement every tracked key" step is realized
  * LAZILY via a global offset `delta` (effective count = stored − delta),
  * so an untracked arrival against a full summary is O(log summarySize)
  * — one offset bump plus amortized O(1) eviction of keys whose effective
  * count reached zero — instead of an O(summarySize) sweep per miss. At
  * skewed 100 TB inputs most arrivals ARE misses, so the sweep form is a
  * scale-killer (measured 36× time at 10× data before this form); the
  * offset form's per-row cost is flat in the summary size. A TreeMap of
  * stored-count → keys makes "which keys just died" an O(#evicted)
  * lookup; each tracked key is evicted at most once per insertion, so the
  * eviction loop is amortized O(1) per arrival.
  *
  * Output: struct(items: array<struct<sku, est_count>> sorted
  * (est desc, sku asc), max_err: long). Deterministic: ties order by key.
  */
case class TopKByCount(
    child: Expression,
    summarySize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByCount.MG] {

  import TopKByCount.MG

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override val dataType: DataType = TopKByCount.SummaryType

  override def createAggregationBuffer(): MG = new MG(mutable.HashMap.empty, 0L)

  override def update(b: MG, input: InternalRow): MG = {
    val v = child.eval(input)
    if (v != null) TopKByCount.updateOne(b, v.toString, summarySize)
    b
  }

  override def merge(b: MG, other: MG): MG = {
    TopKByCount.mergeInto(b, other, summarySize)
    b
  }

  override def eval(b: MG): Any = TopKByCount.evalItems(b)

  override def serialize(b: MG): Array[Byte] = TopKByCount.serializeMG(b)

  override def deserialize(bytes: Array[Byte]): MG =
    TopKByCount.deserializeMG(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByCount =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByCount =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "topk_by_count"
}

object TopKByCount {
  /** Mutable Misra-Gries state: bounded (key → stored count) map, a lazy
    * global decrement `delta` (effective count = stored − delta; invariant
    * stored > delta for every tracked key), the total decrement `decs`
    * (the one-sided error bound), and a stored-count → keys index for
    * O(#evicted) lazy eviction. Constructed from an EFFECTIVE-counts map
    * (delta starts at 0), which is also the serialized form — so wire
    * format and observable semantics are identical to the eager-sweep
    * implementation. */
  final class MG(initCounts: mutable.HashMap[String, Long], var decs: Long) {
    // defensively copied: aliasing the caller's map would let a caller
    // that retains it (or builds two MGs from one map) corrupt the
    // summary and its bucket index out from under us
    private[functions] val stored: mutable.HashMap[String, Long] =
      mutable.HashMap.from(initCounts)
    private[functions] var delta: Long = 0L
    private[functions] val buckets =
      new java.util.TreeMap[Long, mutable.HashSet[String]]()
    initCounts.foreach { case (k, c) => bucketAdd(c, k) }

    private[functions] def bucketAdd(c: Long, k: String): Unit = {
      val s = buckets.get(c)
      if (s == null) {
        val n = mutable.HashSet.empty[String]; n += k; buckets.put(c, n)
      } else s += k
    }

    private[functions] def bucketRemove(c: Long, k: String): Unit = {
      val s = buckets.get(c)
      if (s != null) { s -= k; if (s.isEmpty) buckets.remove(c) }
    }

    /** Drop stored/buckets/delta and install a fresh effective-count map,
      * pre-shifted by `cut` (merge truncation), keeping positives only. */
    private[functions] def reset(eff: mutable.HashMap[String, Long], cut: Long): Unit = {
      stored.clear(); buckets.clear(); delta = 0L
      eff.foreach { case (k, c) =>
        val r = c - cut
        if (r > 0) { stored.update(k, r); bucketAdd(r, k) }
      }
    }

    /** Number of tracked keys. */
    def size: Int = stored.size

    /** Effective (key → count) view — what eval/serialize/consumers see. */
    def entries: Iterator[(String, Long)] =
      stored.iterator.map { case (k, c) => (k, c - delta) }

    /** Immutable effective snapshot (streaming state checkpointing). */
    def toMap: Map[String, Long] = entries.toMap
  }

  /** One Misra-Gries arrival. Shared by the batch aggregate and the
    * streaming state twin ([[graft.streaming.StatefulTopSellers]]) so the
    * two paths run the IDENTICAL algebra by construction. The decrement
    * step is the lazy-offset form: bump `delta` (one unit off every
    * tracked key, and the arriving key is simply not added), then evict
    * only the keys whose effective count reached zero — found in O(log
    * summarySize) via the min stored-count bucket. */
  def updateOne(b: MG, key: String, summarySize: Int): Unit =
    b.stored.get(key) match {
      case Some(c) =>
        b.stored.update(key, c + 1)
        b.bucketRemove(c, key)
        b.bucketAdd(c + 1, key)
      case None =>
        if (b.stored.size < summarySize) {
          b.stored.update(key, b.delta + 1)
          b.bucketAdd(b.delta + 1, key)
        } else {
          b.delta += 1
          b.decs += 1
          var e = b.buckets.firstEntry()
          while (e != null && e.getKey <= b.delta) {
            e.getValue.foreach(b.stored.remove)
            b.buckets.remove(e.getKey)
            e = b.buckets.firstEntry()
          }
        }
    }

  /** Mergeable-summaries combine: add effective counts, then subtract the
    * (size+1)-th largest and drop the non-positive remainder. Runs once
    * per partial-pair (not per row), so the eager O(summarySize) rebuild
    * is fine here. */
  def mergeInto(b: MG, other: MG, summarySize: Int): Unit = {
    val eff = mutable.HashMap.empty[String, Long]
    b.entries.foreach { case (k, c) => eff.update(k, c) }
    other.entries.foreach { case (k, c) =>
      eff.update(k, eff.getOrElse(k, 0L) + c)
    }
    b.decs += other.decs
    var cut = 0L
    if (eff.size > summarySize) {
      cut = eff.values.toArray.sorted(Ordering[Long].reverse).apply(summarySize)
      b.decs += cut
    }
    b.reset(eff, cut)
  }

  /** The summary struct type all three MG aggregates share. */
  val SummaryType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("sku", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("max_err", LongType, nullable = false)))

  /** The summary as the output struct: items sorted (est desc, key asc),
    * plus the one-sided error bound. */
  def evalItems(b: MG): Any = {
    val items = b.entries.toArray.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => InternalRow(UTF8String.fromString(k), c) }
    InternalRow(new GenericArrayData(items.asInstanceOf[Array[Any]]), b.decs)
  }

  /** Wire format shared by shuffle partials (serialize/deserialize) and
    * the PERSISTED sketch column ([[TopKSketch]]/[[TopKMergeSketch]]):
    * decs, n, then (key, effective count) pairs. */
  def serializeMG(b: MG): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.decs)
    out.writeInt(b.size)
    b.entries.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  def deserializeMG(bytes: Array[Byte]): MG = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val decs = in.readLong()
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    new MG(m, decs)
  }

  /** Column-API entry point. */
  def topKByCount(c: Column, summarySize: Int): Column =
    ColumnBridge.column(
      TopKByCount(ColumnBridge.expression(c), summarySize).toAggregateExpression())

  /** Column-API: the PERSISTABLE sketch (binary) form. */
  def topKSketch(c: Column, summarySize: Int): Column =
    ColumnBridge.column(
      TopKSketch(ColumnBridge.expression(c), summarySize).toAggregateExpression())

  /** Column-API: fold persisted sketches back into a summary struct. */
  def topKMergeSketch(c: Column, summarySize: Int): Column =
    ColumnBridge.column(
      TopKMergeSketch(ColumnBridge.expression(c), summarySize).toAggregateExpression())
}

/** [[TopKByCount]] with a BINARY result: the Misra-Gries summary in its
  * wire format, for PERSISTING the partial (the DataSketches pattern —
  * sketch columns in silver tables, merged at read). Same buffer, same
  * update/merge algebra; only eval differs. */
case class TopKSketch(
    child: Expression,
    summarySize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByCount.MG] {
  import TopKByCount.MG
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override val dataType: DataType = BinaryType
  override def createAggregationBuffer(): MG = new MG(mutable.HashMap.empty, 0L)
  override def update(b: MG, input: InternalRow): MG = {
    val v = child.eval(input)
    if (v != null) TopKByCount.updateOne(b, v.toString, summarySize)
    b
  }
  override def merge(b: MG, other: MG): MG = {
    TopKByCount.mergeInto(b, other, summarySize); b
  }
  override def eval(b: MG): Any = TopKByCount.serializeMG(b)
  override def serialize(b: MG): Array[Byte] = TopKByCount.serializeMG(b)
  override def deserialize(bytes: Array[Byte]): MG =
    TopKByCount.deserializeMG(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_sketch"
}

/** Fold a column of PERSISTED Misra-Gries sketches (the [[TopKSketch]]
  * wire format) into one summary — the ⊕ of the mergeable-summaries
  * contract, exposed as an aggregate so base ⊕ delta runs as ordinary
  * partial aggregation over a sketch-valued silver table. */
case class TopKMergeSketch(
    child: Expression,
    summarySize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByCount.MG] {
  import TopKByCount.MG
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override val dataType: DataType = TopKByCount.SummaryType
  override def createAggregationBuffer(): MG = new MG(mutable.HashMap.empty, 0L)
  override def update(b: MG, input: InternalRow): MG = {
    val v = child.eval(input)
    if (v != null)
      TopKByCount.mergeInto(b,
        TopKByCount.deserializeMG(v.asInstanceOf[Array[Byte]]), summarySize)
    b
  }
  override def merge(b: MG, other: MG): MG = {
    TopKByCount.mergeInto(b, other, summarySize); b
  }
  override def eval(b: MG): Any = TopKByCount.evalItems(b)
  override def serialize(b: MG): Array[Byte] = TopKByCount.serializeMG(b)
  override def deserialize(bytes: Array[Byte]): MG =
    TopKByCount.deserializeMG(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMergeSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMergeSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_merge_sketch"
}
