package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  test("tvl: first row has zero change and the quirk divides by current tvl") {
    val rows = TimeSeries.tvl(spark, sf).limit(3).collect()
    assert(rows.head.getAs[Double]("change_tvl") === 0.0)
    val r1 = rows(1)
    val expectedPct = r1.getAs[Double]("change_tvl") / r1.getAs[Double]("tvl")
    assert(math.abs(r1.getAs[Double]("percent_change") - expectedPct) < 1e-6)
  }

  test("gotk: starts at 10000 and compounds consistently") {
    val rows = TimeSeries.gotk(spark, sf).limit(5).collect()
    assert(rows.head.getAs[Double]("start_day_investment") === 10000.0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("start_day_investment") === a.getAs[Double]("end_day_investment"))
      val ratio = b.getAs[Double]("end_day_investment") / b.getAs[Double]("start_day_investment") - 1
      assert(math.abs(ratio - b.getAs[Double]("percent_change")) < 1e-5)
    }
  }

  test("total return resets at each month boundary") {
    // the first row of each month compounds exactly one day, so its
    // value must equal that day's own daily pct (gotk's percent_change)
    val tr = TimeSeries.totalReturn(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("month").orderBy("date")))
      .where(col("rn") === 1)
      .select(col("date"), col("percent_change").as("month_pct"))
    val daily = TimeSeries.gotk(spark, sf).select(col("date"), col("percent_change"))
    val mismatched = tr.join(daily, "date")
      .where(abs(col("month_pct") - coalesce(col("percent_change"), lit(0.0))) > 1e-5)
      .count()
    assert(mismatched === 0)
  }

  test("trailing return emits all six periods") {
    val periods = TimeSeries.trailingReturn(spark, sf)
      .select("period").collect().map(_.getString(0)).toSet
    assert(periods === Set("1d", "1m", "3m", "6m", "1y", "ytd"))
  }

  test("interpolation: interior gaps filled linearly, non-gaps identity") {
    import spark.implicits._
    val df = TimeSeries.interpolate(spark, sf)
    // identity where v non-null
    val broken = df.where(col("v").isNotNull && col("v") =!= col("v_interp")).count()
    assert(broken === 0)
    // all interior nulls are filled
    val unfilled = df.where(col("v").isNull && col("v_interp").isNull).count()
    // only leading nulls may stay null; none expected with this data
    assert(unfilled === 0)
  }

  test("interpolation matches hand-computed fixture") {
    import spark.implicits._
    // fixture: values 10, null, null, 40 -> 10, 20, 30, 40
    val w = org.apache.spark.sql.expressions.Window.orderBy("i")
    val src = Seq((1, Some(10.0)), (2, None), (3, None), (4, Some(40.0)))
      .toDF("i", "v")
    val before = w.rowsBetween(Long.MinValue, 0)
    val after = w.rowsBetween(0, Long.MaxValue)
    val out = src
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(before))
      .withColumn("pr", last(when(col("v").isNotNull, col("i")), ignoreNulls = true).over(before))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(after))
      .withColumn("nr", first(when(col("v").isNotNull, col("i")), ignoreNulls = true).over(after))
      .withColumn("interp",
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, lit(null))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (col("i") - col("pr")).cast("double") / (col("nr") - col("pr")).cast("double")))
      .orderBy("i").select("interp").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(10.0, 20.0, 30.0, 40.0))
  }
}
