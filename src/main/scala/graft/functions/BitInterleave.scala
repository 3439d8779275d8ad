package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Morton (z-order) bit interleave of the LOW 16 BITS
  * of two `bigint` columns — the write-side primitive under k15's
  * OPTIMIZE ZORDER layout. The declarative form ([[graft.etl.Layout]]
  * previously folded per bit) builds 3 expression nodes per bit — 30
  * nodes, 30 shifts/masks/adds per row per layout build; this
  * expression is the classic 4-step magic-mask spread (each step
  * doubles the gap between payload bits, 9 ops per operand) and stays
  * one node inside WholeStageCodegen.
  *
  * BIT-PARITY CONTRACT: for inputs in [0, 2^16) the result equals the
  * per-bit fold Σ ((a>>i & 1) << 2i) + ((b>>i & 1) << 2i+1); inputs
  * outside that range are masked to their low 16 bits first (the fold
  * with more iterations would interleave them — callers scale into a
  * shared bit budget first, the k15 rule, so the mask is a guard, not
  * a semantic). BitInterleaveSpec holds the equality property under
  * BOTH codegen and interpretation, and k15's oracle re-certifies the
  * swap end to end. */
case class BitInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bit_interleave expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    BitInterleave.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitInterleave.morton($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bit_interleave"
}

object BitInterleave {

  /** Spread the low 16 bits of x so bit i lands at position 2i. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** a's bits on even lanes, b's on odd — the z-value. */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column-API entry point (no registry needed). */
  def bitInterleave(a: Column, b: Column): Column =
    ColumnBridge.column(
      BitInterleave(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
