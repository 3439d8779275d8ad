package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Classic-mode Column <-> catalyst Expression bridge. Spark 4 moved these
  * helpers behind `private[sql]` (`org.apache.spark.sql.classic.
  * ExpressionUtils`); a subpackage of `org.apache.spark.sql` is the
  * sanctioned way for libraries extending Catalyst to reach them — the
  * only non-`graft` package in this repo, kept to three forwarders. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `SparkSession.internalCreateDataFrame` forwarder: lets GlobalRank
    * re-enter SQL from an `RDD[InternalRow]` without the external-Row
    * round-trip (`Dataset.rdd` deserializes every row to `Row` and
    * `createDataFrame` re-encodes it — two per-row closure passes that
    * whole-stage codegen can never touch, guide §4 step 2). */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
