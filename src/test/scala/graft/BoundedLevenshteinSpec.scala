package graft

import org.apache.spark.sql.functions._

/** r15: five hot sites (ER agreements ×3, k11 pair filter, t22
  * candidate filter) replaced the full O(len²) levenshtein DP with the
  * bounded `levenshtein(a, b, k)` form (banded O(len·k) DP, -1 above
  * k). The rewrite's entire correctness claim is the equivalence this
  * spec pins: `bounded >= 0` ⟺ `full <= k`, and surviving rows carry
  * the identical exact distance — checked against Spark's own
  * unbounded expression AND an in-process reference DP, over string
  * pairs covering every regime the sites see (equal, 1/2/3-edit
  * substitutions, deletions at each position, length gaps beyond the
  * band, empty strings, and the ER fixture's real name corruption). */
class BoundedLevenshteinSpec extends GraftSpec {

  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val fixtures: Seq[(String, String)] = {
    val base = "lavender metallic snow misty ivory"
    val dels = base.indices.map(i => base ->
      (base.substring(0, i) + base.substring(i + 1)))
    val subs = Seq(
      base -> base,
      base -> base.replace('a', 'o'),
      base -> ("x" + base.tail),
      base -> (base.dropRight(2) + "zz"),
      base -> "lavender",                       // length gap ≫ band
      "" -> "", "" -> "ab", "abc" -> "",
      "ab" -> "ba", "kitten" -> "sitting")
    dels ++ subs
  }

  test("bounded levenshtein(a, b, k) >= 0 is exactly levenshtein(a, b)" +
      " <= k, with identical distances below the threshold") {
    import spark.implicits._
    val df = fixtures.toDF("a", "b")
    for (k <- Seq(1, 2, 3)) {
      val rows = df.select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).as("full"),
        levenshtein(col("a"), col("b"), k).as("bounded")).collect()
      rows.foreach { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        val full = r.getInt(2); val bounded = r.getInt(3)
        assert(full == refLev(a, b), s"full DP disagrees on ($a, $b)")
        if (full <= k)
          assert(bounded == full, s"bounded($k) lost the distance on ($a, $b)")
        else
          assert(bounded == -1, s"bounded($k) must be -1 above k on ($a, $b)")
      }
    }
  }

  test("the er-fixture name corruption (one char deleted) is distance 1" +
      " under both forms on real catalog names") {
    val p = graft.model.Tables.part(spark, sfDir).limit(50)
      .select(col("p_name").as("a"),
        expr("concat(substring(p_name, 1, 3), substring(p_name, 5))")
          .as("b"))
    val bad = p.filter(
      (levenshtein(col("a"), col("b"), 2) >= 0) =!=
        (levenshtein(col("a"), col("b")) <= 2)).count()
    assert(bad == 0L)
  }
}
