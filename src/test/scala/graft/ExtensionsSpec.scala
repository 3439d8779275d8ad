package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives [[GraftExtensions]] through the REAL registration path: a
  * session built with `.withExtensions(new GraftExtensions)` (the same
  * seam `spark.sql.extensions` uses), then pure-SQL calls against it —
  * asserting the SQL surface computes bit-identically to the DataFrame
  * surface it mirrors. */
class ExtensionsSpec extends GraftSpec {

  /** A session with the extensions installed, sharing the test JVM's
    * SparkContext: getOrCreate returns the EXISTING session unless the
    * active/default slots are cleared first, so clear, build, restore. */
  private lazy val extSpark: SparkSession = {
    val base = spark // force shared session creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("vector_dot / vector_d2 resolve in pure SQL and match the fold") {
    extSpark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("emb_ext")
    val rows = extSpark.sql(
      """SELECT vec_id,
        |  vector_dot(embedding, embedding) AS dot,
        |  vector_d2(embedding, embedding) AS d2,
        |  aggregate(zip_with(embedding, embedding, (x, y) -> double(x) * double(y)),
        |    0.0D, (acc, v) -> acc + v) AS ref_dot
        |FROM emb_ext ORDER BY vec_id""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(3), "SQL vector_dot != fold")
      assert(r.getDouble(2) === 0.0, "self-distance must be exactly 0")
    }
  }

  test("topk_by_count aggregates in pure SQL; exact regime matches counts") {
    graft.model.Tables.sales(extSpark, sfDir)
      .select(col("sku").cast("string").as("sku"), col("store_id"))
      .createOrReplaceTempView("sales_ext")
    val mg = extSpark.sql(
      """SELECT store_id, topk_by_count(sku, 100000) AS mg
        |FROM sales_ext GROUP BY store_id""".stripMargin)
      .selectExpr("store_id", "mg.max_err AS max_err",
        "aggregate(mg.items, 0L, (acc, it) -> acc + it.est_count) AS n_est")
    val exact = extSpark.table("sales_ext")
      .groupBy("store_id").agg(count(lit(1)).as("n_true"))
    val joined = mg.join(exact, "store_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("max_err") =!= 0L).count() === 0,
      "summary >= key space: MG must be exact")
    assert(joined.filter(col("n_est") =!= col("n_true")).count() === 0,
      "exact-regime MG counts must total the true row count")
  }

  test("SelfDistanceElimination folds vector_d2(x, x) and keeps null/value " +
    "semantics") {
    extSpark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("emb_opt")
    val self = extSpark.sql(
      "SELECT vector_d2(embedding, embedding) AS d2 FROM emb_opt")
    // the rewrite removed the kernel from the optimized plan entirely
    assert(!self.queryExecution.optimizedPlan.toString.contains("vector_d2"),
      "self-distance should fold away in the optimizer")
    assert(self.collect().forall(r => r.getDouble(0) == 0.0))
    // null contract preserved through the fold
    val n = extSpark.sql(
      "SELECT vector_d2(CAST(NULL AS ARRAY<FLOAT>), CAST(NULL AS ARRAY<FLOAT>)) AS d2")
    assert(n.collect().head.isNullAt(0))
    // non-finite elements must still poison the result (Inf-Inf = NaN in
    // the kernel; the fold must not turn that into 0.0)
    val nf = extSpark.sql(
      """SELECT vector_d2(a, a) AS d2 FROM VALUES
        |  (array(CAST('Infinity' AS FLOAT), CAST(1.0 AS FLOAT))),
        |  (array(CAST('NaN' AS FLOAT))) AS t(a)""".stripMargin)
    assert(nf.collect().forall(r => r.getDouble(0).isNaN),
      "folded self-distance must stay NaN on non-finite input")
    // distinct operands must NOT fold — and still match the reference fold
    val distinct = extSpark.sql(
      """SELECT vector_d2(embedding, reverse(embedding)) AS d2,
        |  aggregate(zip_with(embedding, reverse(embedding),
        |    (x, y) -> (double(x) - double(y)) * (double(x) - double(y))),
        |    0.0D, (acc, v) -> acc + v) AS ref
        |FROM emb_opt""".stripMargin)
    assert(distinct.queryExecution.optimizedPlan.toString.contains("vector_d2"))
    distinct.collect().foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("the un-extended shared session does NOT see the functions") {
    val err = intercept[Exception] {
      spark.sql("SELECT vector_dot(array(1.0F), array(1.0F))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("unresolved")
      || err.getMessage.toLowerCase.contains("cannot resolve")
      || err.getMessage.toLowerCase.contains("undefined"),
      s"expected an unresolved-function error, got: ${err.getMessage}")
  }
}
