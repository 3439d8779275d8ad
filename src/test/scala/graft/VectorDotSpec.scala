package graft

import graft.vector.Similarity
import graft.model.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class VectorDotSpec extends GraftSpec {

  test("native vector_dot is bit-identical to the aggregate/zip_with fold") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val both = e.select(
      Similarity.dotCol(col("embedding"), col("embedding")).as("native"),
      Similarity.dotColHof(col("embedding"), col("embedding")).as("hof"))
    // exact bitwise equality, not tolerance: same fold order, same rounding
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.filter(col("native") <= 0).count() === 0) // self-dot > 0
  }

  test("vector_dot registers for SQL via GraftExtensions") {
    // getOrCreate() would return the suite's shared session and skip
    // extension wiring — build a genuinely new session on the same context.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a STATIC conf — inert once a context
      // exists; the programmatic hook works on any new session.
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head.getDouble(0)
      assert(r === 11.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
  }

  test("vector_dot survives codegen-disabled interpretation identically") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val withCodegen = e.select(Similarity.dotCol(col("embedding"), col("embedding"))
      .as("d")).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = e.select(Similarity.dotCol(col("embedding"), col("embedding"))
        .as("d")).collect().map(_.getDouble(0))
      assert(withCodegen.sameElements(interpreted))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("mismatched-length arrays yield null from both natives, like the HOF fold") {
    import graft.functions.VectorD2
    val df = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
    val r = df.select(
      Similarity.dotCol(col("a"), col("b")).as("dot"),
      VectorD2.vectorD2(col("a"), col("b")).as("d2"),
      Similarity.dotColHof(col("a"), col("b")).as("hof")).head
    assert(r.isNullAt(0), "vector_dot must be null on length mismatch")
    assert(r.isNullAt(1), "vector_d2 must be null on length mismatch")
    assert(r.isNullAt(2), "(the HOF reference is null too)")
  }

  test("native vector_d2 is bit-identical to the diff-square fold; zero on self") {
    import graft.functions.VectorD2
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val shifted = e.select(col("vec_id"), col("embedding"),
      reverse(col("embedding")).as("other"))
    val both = shifted.select(
      VectorD2.vectorD2(col("embedding"), col("other")).as("native"),
      aggregate(
        zip_with(col("embedding"), col("other"),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("hof"),
      VectorD2.vectorD2(col("embedding"), col("embedding")).as("self"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.filter(col("self") =!= 0.0).count() === 0)
  }

  test("vector_d2 registers for SQL and survives interpretation") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT vector_d2(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS d").head.getDouble(0)
      assert(r === 13.0) // (1-3)^2 + (2-5)^2
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p => SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p) }
    }
    import graft.functions.VectorD2
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val withCodegen = e.select(VectorD2.vectorD2(col("embedding"),
      reverse(col("embedding"))).as("d")).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = e.select(VectorD2.vectorD2(col("embedding"),
        reverse(col("embedding"))).as("d")).collect().map(_.getDouble(0))
      assert(withCodegen.sameElements(interpreted))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}
