package graft.tools

import org.apache.spark.sql.SparkSession

/** Time named `SparkEntry` queries on a data dir (min of 3 reps,
  * caches cleared per rep — the Bench discipline without the full
  * suite). NOT part of the driver contract — local tooling behind
  * PERF.md's scaling rows.
  * `runMain graft.tools.TimeQuery <sfDir> <query> [query...]` */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val reps = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min ${reps.min}%7.2f s  reps ${reps.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
