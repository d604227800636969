package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance cost for the PQ chain at scale — the
  * `AnnMaintainScale` question asked of `pipelines.PqIndex`: is the
  * frozen-codebook increment delta-proportional (train+encode paid
  * once, arrivals pay encode-of-delta only), does the drift router
  * send a shifted delta to rebuild, and does retention reclaim an
  * increment chain afterwards? Corpus: the `RetrievalScale` planted
  * mixture at ×scale. NOT part of the driver contract — local
  * tooling.
  * `runMain graft.tools.PqMaintainScale [scale] [batches]` */
object PqMaintainScale {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(100)
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
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
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val n = 2000L * scale
    val out = s"/tmp/graft_pqms_x$scale"
    RetrievalScale.mixture(spark, n)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    // hold out `batches` arrival slices of 0.5% each, plus one
    // shifted slice for the drift probe
    val sliceW = n / 200
    val held = batches.toLong * sliceW
    val base = emb.where(col("vec_id") < n - held)
    println(s"corpus $n vectors; $batches arrival batches of $sliceW (0.5%) each")

    import graft.pipelines.PqIndex
    import graft.streaming.PqStreams
    val root = java.nio.file.Files.createTempDirectory("graft_pqms").toString
    time("v0 build (train+encode)")(
      PqStreams.maintainBatch(spark, base, root, 0L))
    for (i <- 1 to batches) {
      val lo = n - held + (i - 1).toLong * sliceW
      val slice = emb.where(col("vec_id") >= lo && col("vec_id") < lo + sliceW)
      val path = time(f"batch $i%2d increment ($sliceW rows)")(
        PqStreams.maintainBatch(spark, slice, root, i.toLong))
      require(path == "increment", s"expected increment, got $path")
    }
    // serving read over the incremented tip
    val q = emb.where(col("vec_id") < 10)
    val tip = s"$root/v$batches"
    val ans = time("adc search (10 q, tip)")(
      PqIndex.adcSearch(spark, tip, q).collect())
    require(ans.length == 30)
    // drift probe: a scaled slice must route to rebuild
    val shifted = emb.where(col("vec_id") < sliceW)
      .select(col("vec_id") + lit(10000000L * scale) as "vec_id",
        expr("transform(embedding, x -> cast(5 * x as float))").as("embedding"),
        col("label"))
    val p = time("shifted slice (drift route)")(
      PqStreams.maintainBatch(spark, shifted, root, (batches + 1).toLong))
    println(s"drift route: $p")
    require(p == "rebuild(err)", s"expected rebuild(err), got $p")
    // retention: auto-compact + reclaim to the tip
    spark.conf.set("graft.vacuum.orphanMinAgeMs", "0")
    time("vacuum keepLast=1")(PqIndex.vacuum(spark, root, 1))
    println(s"versions after vacuum: ${PqIndex.committedVersions(spark, root)}")
    spark.stop()
  }
}
