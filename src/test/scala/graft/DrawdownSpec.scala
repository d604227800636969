package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Drawdown, TimeSeries}

/** Distributed single-pass drawdown vs the windowed reference
  * implementation — value-exact on fixtures, generated series, and the
  * real daily series. */
class DrawdownSpec extends SparkSpec {

  private def windowedDd(df: org.apache.spark.sql.DataFrame): (Double, String, String) = {
    val wCum = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(lit(1)).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dd = df
      .withColumn("cum", sum(col("pct")).over(wCum))
      .withColumn("cummax", max(col("cum")).over(wCum))
      .withColumn("dd", col("cum") - col("cummax"))
      .withColumn("min_dd", min(col("dd")).over(wAll))
      .withColumn("valley", min(when(col("dd") === col("min_dd"), col("date"))).over(wAll))
      .withColumn("peak_cum", min(when(col("dd") === col("min_dd"), col("cummax"))).over(wAll))
      .withColumn("peak",
        min(when(col("date") <= col("valley") && col("cum") === col("peak_cum"), col("date"))).over(wAll))
      .select("min_dd", "peak", "valley").limit(1).first()
    (dd.getDouble(0), dd.get(1).toString, dd.get(2).toString)
  }

  private def series(vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
    }.toDF("date", "pct")
  }

  test("hand fixture: peak at the top, valley at the bottom") {
    val df = series(Seq(0.1, 0.2, -0.15, -0.25, 0.1, 0.3))
    val r = Drawdown.maxDrawdown(df, partitions = 3).get
    assert(math.abs(r.maxDrawdown - (-0.4)) < 1e-12)
    assert(r.peakDate.toString === "2024-01-02")
    assert(r.valleyDate.toString === "2024-01-04")
    val (wv, wp, wvy) = windowedDd(df)
    assert(math.abs(r.maxDrawdown - wv) < 1e-12)
    assert(r.peakDate.toString === wp && r.valleyDate.toString === wvy)
  }

  test("exact min-drawdown tie picks the earliest valley at every split") {
    // dd hits -1.0 at BOTH date2 and date5; the argmin rule (oracle
    // MIN(date)) demands valley=date2 regardless of partitioning
    val df = series(Seq(1.0, -1.0, 1.0, 0.0, -1.0))
    val (wv, wp, wvy) = windowedDd(df)
    for (p <- 1 to 5) {
      val r = Drawdown.maxDrawdown(df, partitions = p).get
      assert(math.abs(r.maxDrawdown - wv) < 1e-12, s"p=$p")
      assert(r.valleyDate.toString === wvy, s"p=$p valley=${r.valleyDate}")
      assert(r.peakDate.toString === wp, s"p=$p peak=${r.peakDate}")
    }
  }

  test("generated series agree with the windowed form across partition counts") {
    val g = Gen.nonEmptyListOf(Gen.choose(-0.3, 0.3)).map(_.take(40))
    val cases = (1 to 6).flatMap(i => g.apply(Gen.Parameters.default, Seed(100L + i)))
    cases.foreach { vals =>
      val df = series(vals)
      val (wv, _, _) = windowedDd(df)
      for (p <- Seq(1, 3, 7)) {
        val r = Drawdown.maxDrawdown(df, partitions = p).get
        assert(math.abs(r.maxDrawdown - wv) < 1e-9,
          s"partitions=$p vals=$vals got=${r.maxDrawdown} want=$wv")
      }
    }
  }

  test("by-key: each series' result equals its single-series run at every partition count") {
    import spark.implicits._
    // three series with different shapes, interleaved key ranges —
    // partition boundaries land mid-series for small partition counts
    val shapes = Map(
      "a" -> Seq(0.1, 0.2, -0.15, -0.25, 0.1, 0.3),
      "b" -> Seq(-0.1, -0.1, 0.3, -0.2, -0.2),
      "c" -> Seq(0.05, 0.0, -0.05))
    val df = shapes.toSeq.flatMap { case (n, vals) =>
      vals.zipWithIndex.map { case (v, i) =>
        (n, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
      }
    }.toDF("name", "date", "pct")
    for (p <- Seq(1, 2, 4, 8)) {
      val byKey = Drawdown.maxDrawdownByKey(df, partitions = p).toMap
      assert(byKey.keySet === shapes.keySet, s"p=$p")
      shapes.foreach { case (n, vals) =>
        val solo = Drawdown.maxDrawdown(series(vals), partitions = 1).get
        val r = byKey(n)
        assert(math.abs(r.maxDrawdown - solo.maxDrawdown) < 1e-12, s"p=$p name=$n")
        assert(r.peakDate === solo.peakDate && r.valleyDate === solo.valleyDate, s"p=$p name=$n")
      }
    }
  }

  test("real daily series: distributed value matches the windowed value") {
    val wDate = Window.orderBy("date")
    val daily = TimeSeries.dailyOrderRevenue(spark, sf)
      .withColumn("pct", (col("tvl") - lag(col("tvl"), 1).over(wDate)) / lag(col("tvl"), 1).over(wDate))
      .where(col("pct").isNotNull)
      .select("date", "pct")
    val (wv, wp, wvy) = windowedDd(daily)
    val r = Drawdown.maxDrawdown(daily, partitions = 8).get
    assert(math.abs(r.maxDrawdown - wv) < 1e-9)
    assert(r.peakDate.toString === wp)
    assert(r.valleyDate.toString === wvy)
  }
}
