package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch harness (not part of the driver surface): times the
  * navigable-graph artifact build and the beam search at a given SF. */
object GsDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[gs] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("navGraph build+count") {
      println("  edges " + graft.ops.Similarity.navGraphShared(spark, dir).count())
    }
    t("graphSearch (warm index)") {
      graft.ops.Similarity.graphSearch(spark, dir).count()
    }
    spark.stop()
  }
}
