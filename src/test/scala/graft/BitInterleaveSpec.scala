package graft

import graft.functions.BitInterleave
import graft.functions.BitInterleave.bitInterleave
import org.apache.spark.sql.functions._

/** The drop-in contract of the native Morton interleave: for every
  * input it equals the per-bit fold it replaced in Layout's z-order
  * build (low 16 bits interleaved, higher bits masked) — so k15's
  * oracle value cannot move. */
class BitInterleaveSpec extends GraftSpec {

  /** The reference fold — 16-iteration form of Layout's zValue. */
  private def foldRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc + (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))
    }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val pairs: Seq[(Long, Long)] =
    Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L), (1024L, 1L),
      (0xFFFFL, 0xFFFFL), (0x10000L, 0x10000L), (-1L, -1L),
      (Long.MaxValue, Long.MinValue)) ++
      (1 to 5000).map(i => (mix(i.toLong) & 0xFFFFL, mix(-i.toLong) & 0xFFFFL)) ++
      (1 to 500).map(i => (mix(i * 7L), mix(i * 13L))) // unmasked longs

  test("bit_interleave == the per-bit fold for every input (eval property)") {
    pairs.foreach { case (a, b) =>
      val got = BitInterleave.morton(a, b)
      assert(got == foldRef(a, b), s"($a, $b)")
    }
  }

  test("round trip: even/odd lane extraction recovers both 16-bit inputs") {
    pairs.foreach { case (a, b) =>
      val z = BitInterleave.morton(a, b)
      def unspread(x: Long): Long = {
        var v = x & 0x55555555L
        v = (v | (v >> 1)) & 0x33333333L
        v = (v | (v >> 2)) & 0x0F0F0F0FL
        v = (v | (v >> 4)) & 0x00FF00FFL
        (v | (v >> 8)) & 0xFFFFL
      }
      assert(unspread(z) == (a & 0xFFFFL))
      assert(unspread(z >> 1) == (b & 0xFFFFL))
    }
  }

  test("bit_interleave matches the fold column under codegen AND interpretation") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    def foldCol = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(col("a"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(col("b"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
    val q = df.select(bitInterleave(col("a"), col("b")).as("native"),
      foldCol.as("viaFold"))
    assert(q.filter(col("native") =!= col("viaFold")).count() === 0)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(q.filter(col("native") =!= col("viaFold")).count() === 0)
    finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("bit_interleave registers for SQL via GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT bit_interleave(CAST(3 AS BIGINT), CAST(1 AS BIGINT)) AS z")
        .head.getLong(0)
      // a=0b11 on even lanes -> 0b0101; b=0b1 on odd lane -> 0b10; z=0b111
      assert(r === 7L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
      }
    }
  }
}
