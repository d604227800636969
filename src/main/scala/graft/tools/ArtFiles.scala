package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: run named queries, then list every artifact
  * parquet's file count/sizes before the exit sweep — verifies the
  * write-boundary file sizing. NOT part of the driver contract.
  * `runMain graft.tools.ArtFiles <sfDir> <query> [query...]` */
object ArtFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q => graft.SparkEntry.queries(q)(spark, sfDir).count() }
    val root = graft.ops.IterState.rootFor(spark)
    val dir = new java.io.File(root)
    Option(dir.listFiles()).getOrElse(Array.empty).sortBy(_.getName).foreach { d =>
      if (d.isDirectory && d.getName.startsWith("art_")) {
        val parts = Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
        println(f"${d.getName}%-44s files=${parts.length}%3d  " +
          f"bytes=${parts.map(_.length()).sum}%10d  maxFile=${if (parts.nonEmpty) parts.map(_.length()).max else 0L}%9d")
      }
    }
    spark.stop()
  }
}
