package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-arrival cost for the ann chain — the `NavMaintainScale`
  * question asked of `streaming.AnnStreams`: does a long chain of
  * label-grain arrivals stay FLAT per batch (each increment touching
  * only the arriving labels' buckets), and does the retention
  * lifecycle reclaim the chain afterwards? Builds the ×k
  * label-structured corpus (the `AnnCost` duplication: per-label
  * width constant, label cardinality scaled), holds out the
  * `batches` highest labels, lands v0 over the rest, then feeds one
  * label per batch through `AnnStreams.maintainBatch`, timing each.
  * Ends with compact + vacuum + a one-shot-build equality check.
  * NOT part of the driver contract — local tooling.
  * `runMain graft.tools.AnnMaintainScale [sfDir] [dupFactor] [batches]` */
object AnnMaintainScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dupFactor = args.lift(1).map(_.toInt).getOrElse(100)
    val batches = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb0 = graft.Tables.embeddings(spark, sfDir)
    val emb =
      if (dupFactor <= 1) emb0
      else {
        val idOff = emb0.agg(max("vec_id")).head().getLong(0) + 1L
        val labOff = emb0.agg(max(col("label").cast("bigint"))).head().getLong(0) + 1L
        val dup = (0 until dupFactor).map { c =>
          emb0.select((col("vec_id") + lit(c * idOff)).as("vec_id"),
            col("embedding"),
            (col("label").cast("bigint") + lit(c * labOff)).as("label"))
        }.reduce(_.unionByName(_))
        val out = s"/tmp/graft_annms_x$dupFactor"
        dup.write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
        spark.read.parquet(s"$out/embeddings.parquet")
      }
    val labs = emb.select(col("label").cast("bigint").as("label")).distinct()
      .orderBy(col("label").desc).limit(batches)
      .collect().map(_.getLong(0)).sorted
    val cut = labs.head
    println(s"corpus ${emb.count()} vectors; ${batches} single-label arrival batches (labels >= $cut)")

    val root = java.nio.file.Files.createTempDirectory("graft_annms").toString
    time("v0 build (bulk corpus)") {
      graft.streaming.AnnStreams.maintainBatch(
        spark, emb.where(col("label") < cut), root, 0L)
    }
    labs.zipWithIndex.foreach { case (lab, i) =>
      spark.catalog.clearCache()
      time(f"batch ${i + 1}%2d (label $lab)") {
        val path = graft.streaming.AnnStreams.maintainBatch(
          spark, emb.where(col("label") === lab), root, i + 1L)
        require(path == "increment", s"expected increment, took $path")
      }
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val preBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(root)).getLength
    time("compact (anchorify tip)")(graft.streaming.AnnStreams.compact(spark, root))
    spark.conf.set("graft.vacuum.orphanMinAgeMs", "0")
    try time("vacuum (keepLast=1)")(graft.streaming.AnnStreams.vacuum(spark, root, 1))
    finally spark.conf.unset("graft.vacuum.orphanMinAgeMs")
    val postBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(root)).getLength
    println(f"chain bytes ${preBytes / 1e6}%.1f MB -> ${postBytes / 1e6}%.1f MB " +
      s"(versions ${graft.pipelines.AnnIndex.committedVersions(spark, root)})")
    spark.catalog.clearCache()
    val fullRoot = java.nio.file.Files.createTempDirectory("graft_annms_full").toString
    time("one-shot full build")(graft.pipelines.AnnIndex.buildState(spark, emb, fullRoot))
    val got = graft.streaming.AnnStreams.currentGraph(spark, root)
    val want = graft.pipelines.AnnIndex.graph(spark, fullRoot)
    println(s"graph equal after ${batches}-batch chain + vacuum: " +
      s"${got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0}")
    spark.stop()
  }
}
