package graft

import org.apache.spark.sql.SparkSession

/** 100× scale probe: build target/sf10 (100× the bench SF — two full
  * decades above the per-round measurement) and re-time the heaviest
  * keys of the last bench run there. The per-round sf1.0 section stops
  * one decade up; the brief's bar is "survive a 100× scale-up", and a
  * constant that is quadratic in a minor term can clear 10× yet still
  * blow up at 100×. Run manually (it costs ~half an hour); the result
  * is committed as `bench_sf10.json` with slopes against BOTH anchors:
  * the sf0.1 medians (data ratio 100) and the sf1.0 one-shots (data
  * ratio 10). Flag discipline mirrors the sf1.0 section: a key flags
  * when its sf10 time exceeds 2× the data ratio against sf1.0 (slope
  * > 20) above a noise floor, with a confirmation run keeping the min
  * (first runs pay per-plan codegen). */
object Scale10Probe {

  private def jstr(s: String) = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => " "
    case c => c.toString
  } + "\""

  private def r3(d: Double) = math.round(d * 1000) / 1000.0

  def main(args: Array[String]): Unit = {
    val topN = args.headOption.map(_.toInt).getOrElse(10)
    val srcSf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // anchors from the committed bench artifact
    val lines = scala.io.Source.fromFile("bench_full.json").getLines().toSeq
    def section(metric: String): Option[ujsonLite] =
      lines.map(ujsonLite.parse).find(_.str("metric").contains(metric))
    val detail = section("total_detail").getOrElse(
      sys.error("bench_full.json has no total_detail line"))
    val medians = detail.obj("queries")
    val sf1Times = section("scale_slope_sf1").map(_.obj("times"))
      .getOrElse(Map.empty[String, Double])
    val top = medians.toSeq.filter(_._2 > 0).sortBy(-_._2)
      .take(topN).map(_._1)
    System.err.println(s"[sf10] probing: ${top.mkString(", ")}")
    val sf10 = ScaleData.ensure(spark, srcSf, "target/sf10", 100)
    // warm only the silvers the probed families read (media silvers
    // are skipped deliberately: no m-key ranks in the top set, and the
    // fixture-lake encode at 100× would dominate the probe itself)
    try {
      graft.etl.StoreDaily.rollupDec(spark, sf10).count()
      graft.etl.StoreDaily.paymentDec(spark, sf10).count()
      graft.text.Corpus.docsTok(spark, sf10).count()
      graft.dedup.Dedup.warm(spark, sf10)
    } catch { case e: Throwable =>
      System.err.println(s"[sf10] warm failed: ${e.getMessage}")
    }
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sf10).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[sf10] $name failed: ${e.getMessage}")
        -1.0
      }
    }
    val times = top.map { name =>
      val t1 = timeOnce(name)
      val vs1 = sf1Times.getOrElse(name, -1.0)
      val wouldFlag = t1 >= 25.0 && vs1 > 0 && t1 > 20.0 * vs1
      val t = if (wouldFlag) {
        val t2 = timeOnce(name)
        if (t2 >= 0) math.min(t1, t2) else t1
      } else t1
      System.err.println(f"[sf10] $name%-28s ${t}%.2f s")
      name -> t
    }
    val s100 = times.collect { case (k, t) if t >= 0 &&
      medians.getOrElse(k, -1.0) > 0 => k -> r3(t / medians(k)) }
    val s10 = times.collect { case (k, t) if t >= 0 &&
      sf1Times.getOrElse(k, -1.0) > 0 => k -> r3(t / sf1Times(k)) }
    val tm = times.toMap
    val flagged = s10.filter { case (k, s) => tm(k) >= 25.0 && s > 20.0 }
    def jmap(m: Seq[(String, Double)]) =
      m.map { case (k, v) => jstr(k) + ":" + r3(v) }.mkString("{", ",", "}")
    val line = s"""{"metric":"scale_slope_sf10","sf_large":"target/sf10","anchors":{"sf0.1_median":100.0,"sf1.0_oneshot":10.0},"selection":"top${topN}_by_sf0.1_median","n_keys":${times.size},"n_flagged":${flagged.size},"flagged":${jmap(flagged)},"times":${jmap(times)},"slopes_vs_sf0.1":${jmap(s100)},"slopes_vs_sf1.0":${jmap(s10)}}"""
    println(line)
    val w = new java.io.PrintWriter("bench_sf10.json")
    try w.println(line) finally w.close()
    spark.stop()
  }

  /** Just-enough JSON reader for bench_full.json lines (flat objects
    * with string/number/nested-object values) — no library deps. */
  private[graft] case class ujsonLite(raw: String) {
    def str(key: String): Option[String] = {
      val m = ("\"" + key + "\":\"([^\"]*)\"").r
      m.findFirstMatchIn(raw).map(_.group(1))
    }
    def obj(key: String): Map[String, Double] = {
      val start = raw.indexOf("\"" + key + "\":{")
      if (start < 0) return Map.empty
      val open = raw.indexOf('{', start)
      val close = raw.indexOf('}', open)
      if (close < 0) return Map.empty
      raw.substring(open + 1, close).split(",").iterator
        .map(_.split(":", 2))
        .collect { case Array(k, v) if v.nonEmpty &&
          v.forall(c => c.isDigit || c == '.' || c == '-' || c == 'E' || c == 'e') =>
          k.replaceAll("\"", "") -> v.toDouble
        }.toMap
    }
  }
  private object ujsonLite {
    def parse(line: String): ujsonLite = ujsonLite(line)
  }
}
