package graft

import graft.functions.FloorLog2
import graft.functions.FloorLog2.floorLog2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** The drop-in contract of the native floor-log2: for EVERY long it
  * equals the `length(bin(x)) - 1` string formulation it replaced in
  * the milli-bits hot paths — so no oracle value can move. */
class FloorLog2Spec extends GraftSpec {

  // edges + a deterministic splitmix64 stream covering the full range
  private val interesting: Seq[Long] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq(0L, 1L, 2L, 3L, 63L, 64L, 1023L, 1024L, 1025L,
      Long.MaxValue, Long.MinValue, -1L, Long.MaxValue - 1) ++
      (1 to 5000).map(i => mix(i.toLong)) ++
      (0 to 62).map(b => 1L << b) ++ (0 to 62).map(b => (1L << b) - 1)
  }

  test("floor_log2(x) == length(bin(x)) - 1 for every long (property)") {
    interesting.foreach { x =>
      val viaEval = FloorLog2(
        org.apache.spark.sql.catalyst.expressions.Literal(x)).eval(null)
      // bin() renders Long.toBinaryString (two's complement, no padding)
      val want = java.lang.Long.toBinaryString(x).length.toLong - 1L
      assert(viaEval === want)
    }
  }

  test("floor_log2 matches the bin-length column under codegen, whole range") {
    import spark.implicits._
    val xs = Seq(0L, 1L, 2L, 3L, 7L, 8L, 1023L, 1024L, 1025L,
      (1L << 40) - 1, 1L << 40, Long.MaxValue, -1L, Long.MinValue,
      -123456789L) ++ (1 to 200).map(i => (i.toLong * 2654435761L) ^ i)
    val df = xs.toDF("x")
    val both = df.select(
      floorLog2(col("x")).as("native"),
      (length(bin(col("x"))) - lit(1)).cast("long").as("viaBin"))
    assert(both.filter(col("native") =!= col("viaBin")).count() === 0)
  }

  test("floor_log2 survives codegen-disabled interpretation identically") {
    import spark.implicits._
    val df = (0L to 2000L).toDF("x")
    val withCodegen = df.select(floorLog2(col("x")).as("b"))
      .collect().map(_.getLong(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(floorLog2(col("x")).as("b"))
        .collect().map(_.getLong(0))
      assert(withCodegen.sameElements(interpreted))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("floor_log2 registers for SQL via GraftExtensions") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT floor_log2(CAST(1024 AS BIGINT)) AS b")
        .head.getLong(0)
      assert(r === 10L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }
}
