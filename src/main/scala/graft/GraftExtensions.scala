package graft

import graft.functions.{VectorD2, VectorDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the engine's native functions for SQL use
  * (`SELECT vector_dot(a.embedding, b.embedding) ...`). Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — the DataFrame API
  * ([[VectorDot.vectorDot]]) works without registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children.head, children(1))))
    e.injectFunction((
      new FunctionIdentifier("vector_d2"),
      new ExpressionInfo(classOf[VectorD2].getName, "vector_d2"),
      (children: Seq[Expression]) => VectorD2(children.head, children(1))))
  }
}
