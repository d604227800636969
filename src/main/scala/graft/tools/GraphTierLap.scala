package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Measures the driver-tier vs distributed-loop crossover for the
  * graph family — the round-15 verdict's ask #4:
  * `graft.graph.collectEdgesMax` defaulted to 1M edges on an
  * assumption, not a measurement. Generates hash-derived 3-out-regular
  * graphs (the kNN top-3 shape the gated queries run on) at a ladder
  * of edge counts, lands them as parquet (so both tiers start from a
  * scan, as in production), then runs pagerank / label propagation /
  * k-core under BOTH tiers in the same session:
  *
  *   - driver tier forced by raising the threshold above the size,
  *   - distributed loop forced with `collectEdgesMax = -1`
  *     (the `SimilarityTierSpec.forceLoopTier` seam).
  *
  * Prints min-of-2 seconds per (algorithm, size, tier). The crossover
  * read from the table sets the conf default. NOT part of the driver
  * contract — local tooling.
  * `runMain graft.tools.GraphTierLap [edgeCounts…]` */
object GraphTierLap {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(60000L, 600000L, 2000000L, 6000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_tierlap").toString

    def timeMin2(f: => Long): Double = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.min

    def tier[A](max: Long)(body: => A): A = {
      spark.conf.set("graft.graph.collectEdgesMax", max.toString)
      try body finally spark.conf.unset("graft.graph.collectEdgesMax")
    }

    for (nEdges <- sizes) {
      val n = math.max(nEdges / 3, 4L)
      val dir = s"$base/e$nEdges"
      spark.range(n).select(col("id").as("vec_id"))
        .withColumn("r", explode(expr("sequence(1, 3)")))
        .select(col("vec_id"),
          pmod(hash(col("vec_id"), col("r")), lit(n)).cast("bigint").as("nbr_id"))
        .where(col("vec_id") =!= col("nbr_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/edges")
      spark.range(n).select(col("id").as("vec_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/nodes")
      val edges: DataFrame = spark.read.parquet(s"$dir/edges")
      val nodes: DataFrame = spark.read.parquet(s"$dir/nodes")
      // k-core runs on the undirected mutualized form its caller feeds
      edges.select(least(col("vec_id"), col("nbr_id")).as("a"),
          greatest(col("vec_id"), col("nbr_id")).as("b"))
        .distinct().write.mode(SaveMode.Overwrite).parquet(s"$dir/und")
      val und: DataFrame = spark.read.parquet(s"$dir/und")
      val real = edges.count()
      println(s"== $real directed edges (${und.count()} undirected), $n nodes ==")
      val algos: Seq[(String, () => Long)] = Seq(
        "pagerank" -> (() => Similarity.pagerankFrom(spark, edges, nodes).count()),
        "labelProp" -> (() => Similarity.labelPropFrom(spark, edges, nodes).count()),
        "kcore" -> (() => Similarity.kcoreFrom(spark, und).count()))
      for ((name, run) <- algos) {
        val dt = timeMin2(tier(Long.MaxValue)(run()))
        val lt = timeMin2(tier(-1L)(run()))
        println(f"$name%-10s driver ${dt}%7.2f s   distributed ${lt}%7.2f s")
      }
    }
    spark.stop()
  }
}
