package graft

import graft.export.Flatten
import org.apache.spark.sql.functions._

/** Regression anchors for the r3 report's money rendering — the two
  * engine-parity time bombs the r8 review filed:
  *  1. negative cents: Spark `DIV` and DuckDB `//` BOTH truncate toward
  *     zero (-7 DIV 2 = -3 in both — see Regression.scala/Flatten.scala
  *     docs), and `%` keeps the dividend's sign in both, so a naive
  *     `c DIV 100 || '.' || c % 100` renders `-2.-50` (the % piece
  *     carries its own minus) in both engines. The fixed helpers format
  *     abs(cents) and prepend the sign explicitly.
  *  2. NULL totals (zero-transaction date): Spark `concat_ws` silently
  *     DROPS a null piece while DuckDB `||` nulls the whole row — the
  *     `moneyOrNa*` pair COALESCEs to 'N/A' in both engines. */
class MoneyRenderSpec extends GraftSpec {

  /** The shared reference rule both engine renderings must implement. */
  private def reference(cents: Long): String = {
    val a = math.abs(cents)
    (if (cents < 0) "-" else "") + (a / 100) + "." + f"${a % 100}%02d"
  }

  test("moneySpark renders negative, zero and positive cents sign-correctly") {
    import spark.implicits._
    val cases = Seq(-250L, -99L, -1L, 0L, 1L, 99L, 100L, 12345L, -10000L)
    val got = cases.toDF("c")
      .select(col("c"), expr(Flatten.moneySpark("c")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { c =>
      assert(got(c) === reference(c), s"cents=$c")
    }
  }

  test("moneyOrNaSpark renders NULL cents as N/A instead of nulling the line") {
    import spark.implicits._
    val got = Seq((1L, Some(250L)), (2L, None))
      .toDF("id", "c")
      .select(col("id"),
        concat(lit("Avg: $"), expr(Flatten.moneyOrNaSpark("c"))).as("line"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "Avg: $2.50")
    assert(got(2L) === "Avg: $N/A")
  }

  test("the DuckDB twins carry the same sign/NULL handling textually") {
    // the oracle side can't execute here; gate the structural invariants
    // that make the twins equivalent: abs() before the divide (so floor
    // vs truncate cannot diverge), an explicit sign branch, and the
    // COALESCE fallback on the nullable rendering
    val duck = Flatten.moneyDuck("c")
    assert(duck.contains("abs(c) // 100"))
    assert(duck.contains("abs(c) % 100"))
    assert(duck.contains("CASE WHEN c < 0 THEN '-' ELSE '' END"))
    assert(Flatten.moneyOrNaDuck("c").startsWith("COALESCE("))
    assert(Flatten.moneyOrNaDuck("c").endsWith(", 'N/A')"))
    val sp = Flatten.moneySpark("c")
    assert(sp.contains("abs(c) DIV 100") && sp.contains("abs(c) % 100"))
  }
}
