package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd integer floor-log2 of a `bigint` column — the
  * engine-portable log primitive under every milli-bits score in the
  * library (t13/t14 surprisal, t15 BM25 idf, h3 query likelihood, t31
  * char entropy, e18 lateness buckets): those paths spelled it
  * `length(bin(x)) - 1`, which is value-correct but materializes a
  * 64-char binary STRING per row just to measure it — a per-row
  * allocation on paths that score every posting/pair/char of a corpus.
  * This expression is one `Long.numberOfLeadingZeros` instruction
  * (lowers to LZCNT), zero allocation, and stays inside
  * WholeStageCodegen.
  *
  * BIT-PARITY CONTRACT: for EVERY long x — including 0 (bin "0" →
  * length 1 → 0) and negatives (two's-complement bin is 64 chars →
  * 63) — the result equals `length(bin(x)) - 1`, so swapping it under
  * an oracle-checked key cannot move a value (FloorLog2Spec holds the
  * equality property under both codegen and interpretation; the
  * DuckDB twins keep their `length(format('{:b}', x)) - 1` form). */
case class FloorLog2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"floor_log2 expects bigint, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    if (v == 0L) 0L
    else (63 - java.lang.Long.numberOfLeadingZeros(v)).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c == 0L) ? 0L : (long) (63 - java.lang.Long.numberOfLeadingZeros($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "floor_log2"
}

object FloorLog2 {
  /** Column-API entry point (no registry needed). */
  def floorLog2(x: Column): Column =
    ColumnBridge.column(FloorLog2(ColumnBridge.expression(x)))
}
