package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantify the single-row-group scan bottleneck: time a token
  * explode + agg over documents as-read (1 task) vs repartitioned.
  * NOT part of the driver contract — local tooling. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min ${reps.min}%.2f s  reps ${reps.map(r => f"$r%.2f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("explode+agg as-read") {
      docs.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count().count()
    }
    t("explode+agg repartition(32)") {
      docs.repartition(32)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").count().count()
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    t("lineitem agg as-read") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice")).count()
    }
    t("lineitem agg repartition(32)") {
      li.repartition(32).groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice")).count()
    }
    spark.stop()
  }
}
