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

  override val dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("sku", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("max_err", LongType, nullable = false)))

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

  override def eval(b: MG): Any = {
    val items = b.counts.toArray.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => InternalRow(UTF8String.fromString(k), c) }
    InternalRow(new GenericArrayData(items.asInstanceOf[Array[Any]]), b.decs)
  }

  override def serialize(b: MG): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.decs)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MG = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val decs = in.readLong()
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    new MG(m, decs)
  }

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
  /** Mutable Misra-Gries state: bounded (key → count) map + the total
    * decrement, which is the one-sided error bound. */
  final class MG(val counts: mutable.HashMap[String, Long], var decs: Long)

  /** One Misra-Gries arrival. Shared by the batch aggregate and the
    * streaming state twin ([[graft.streaming.StatefulTopSellers]]) so the
    * two paths run the IDENTICAL algebra by construction. */
  def updateOne(b: MG, key: String, summarySize: Int): Unit =
    b.counts.get(key) match {
      case Some(c) => b.counts.update(key, c + 1)
      case None =>
        if (b.counts.size < summarySize) b.counts.update(key, 1L)
        else {
          // classic MG decrement step: one unit off every tracked key
          // (and one off the arriving key, which is simply not added)
          val dead = mutable.ArrayBuffer.empty[String]
          b.counts.mapValuesInPlace((_, c) => c - 1)
          b.counts.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(b.counts.remove)
          b.decs += 1
        }
    }

  /** Mergeable-summaries combine: add counts, then subtract the
    * (size+1)-th largest and drop the non-positive remainder. */
  def mergeInto(b: MG, other: MG, summarySize: Int): Unit = {
    other.counts.foreach { case (k, c) =>
      b.counts.update(k, b.counts.getOrElse(k, 0L) + c)
    }
    b.decs += other.decs
    if (b.counts.size > summarySize) {
      val cut = b.counts.values.toArray.sorted(Ordering[Long].reverse)
        .apply(summarySize)
      val dead = mutable.ArrayBuffer.empty[String]
      b.counts.mapValuesInPlace((_, c) => c - cut)
      b.counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b.counts.remove)
      b.decs += cut
    }
  }

  /** Column-API entry point. */
  def topKByCount(c: Column, summarySize: Int): Column =
    ColumnBridge.column(
      TopKByCount(ColumnBridge.expression(c), summarySize).toAggregateExpression())
}
