package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure incremental ANN index maintenance vs full rebuild — the
  * PERF.md evidence behind `pipelines.AnnIndex`'s claim that a
  * release increment re-pairs only touched cells (and, round 13,
  * rewrites only touched-label buckets). Splits the embeddings by
  * vec_id into vN and a fixed-size delta (the highest |n| ids — the
  * realistic new-release regime), builds the vN state, then times
  * `incrementState` against a timed full rebuild and checks graph
  * equality.
  *
  * Optional ×k scaling (`dupFactor`): duplicates the corpus with
  * per-copy LABEL offsets — per-label width stays constant while the
  * label cardinality (and so the bucket-prune opportunity) scales,
  * the shape a many-domain production corpus has. With `deltaLabels`
  * set, the delta is all rows of the HIGHEST n labels instead of the
  * highest ids — the "new content domain arrives" release regime the
  * bucket splice is built for. (The planted-mixture corpus is the
  * wrong input here: its clusters collapse into single mega-cells
  * and the self-join quadratics dominate — the regime where
  * `CurateThenIndex` shows dedup-before-index is mandatory.)
  *
  * NOT part of the driver contract — local tooling.
  * `runMain graft.tools.AnnCost <sfDir> [deltaRows] [dupFactor] [deltaLabels]` */
object AnnCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val deltaRows = args.lift(1).map(_.toInt).getOrElse(500)
    val dupFactor = args.lift(2).map(_.toInt).getOrElse(1)
    val deltaLabels = args.lift(3).map(_.toInt).getOrElse(0)
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
        val out = s"/tmp/graft_anncost_x$dupFactor"
        dup.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$out/embeddings.parquet")
        spark.read.parquet(s"$out/embeddings.parquet")
      }
    val (vN, delta) =
      if (deltaLabels > 0) {
        val cutL = emb.select(col("label").cast("bigint").as("label")).distinct()
          .orderBy(col("label").desc)
          .limit(deltaLabels).agg(min(col("label"))).first().getLong(0)
        println(s"delta = all rows of the $deltaLabels highest labels (>= $cutL)")
        (emb.where(col("label") < cutL), emb.where(col("label") >= cutL))
      } else {
        val cut = emb.select("vec_id").orderBy(col("vec_id").desc)
          .limit(deltaRows).agg(min(col("vec_id"))).first().getLong(0)
        (emb.where(col("vec_id") < cut), emb.where(col("vec_id") >= cut))
      }
    println(s"corpus ${emb.count()} vectors; delta ${delta.count()}")

    val base = java.nio.file.Files.createTempDirectory("graft_anncost").toString
    // chain layout (<chain>/v<N>) so the retention lifecycle below
    // runs on exactly the versioned-root convention AnnIndex.vacuum
    // governs — the paths ARE the measured state, not copies
    val chain = s"$base/chain"
    def vr(b: Int) = s"$chain/v$b"
    graft.pipelines.AnnIndex.buildState(spark, vN, vr(0))
    spark.catalog.clearCache()
    time("incrementState (delta)") {
      graft.pipelines.AnnIndex.incrementState(spark, delta, vr(0), vr(1))
    }
    spark.catalog.clearCache()
    time("buildState (full)") {
      graft.pipelines.AnnIndex.buildState(spark, emb, s"$base/full")
    }
    val g1 = graft.pipelines.AnnIndex.graph(spark, vr(1))
    val g2 = graft.pipelines.AnnIndex.graph(spark, s"$base/full")
    println(s"graph equal: ${g1.exceptAll(g2).count() == 0 && g2.exceptAll(g1).count() == 0}")
    // lifecycle: anchorify the increment tip (round 14) — pure I/O
    // re-homing of the referenced buckets; after it, every earlier
    // version of the chain is reclaimable
    spark.catalog.clearCache()
    println(s"tip anchor pre-compact: " +
      s"${graft.pipelines.AnnIndex.isAnchor(spark, vr(1))}")
    time("compactState (anchorify tip)") {
      graft.pipelines.AnnIndex.compactTip(spark, chain)
    }
    println(s"tip anchor post-compact: " +
      s"${graft.pipelines.AnnIndex.isAnchor(spark, vr(1))}")
    val g3 = graft.pipelines.AnnIndex.graph(spark, vr(1))
    println(s"graph equal post-compact: " +
      s"${g3.exceptAll(g2).count() == 0 && g2.exceptAll(g3).count() == 0}")
    // retention (round 16): the anchored tip lets vacuum reclaim the
    // whole pre-compact chain — measure the reclaimed bytes and that
    // the surviving tip still reads identically
    val fs = new org.apache.hadoop.fs.Path(chain)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val preBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(chain)).getLength
    spark.conf.set("graft.vacuum.orphanMinAgeMs", "0")
    try time("vacuum (keepLast=1)") {
      graft.pipelines.AnnIndex.vacuum(spark, chain, 1)
    } finally spark.conf.unset("graft.vacuum.orphanMinAgeMs")
    val postBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(chain)).getLength
    println(f"chain bytes ${preBytes / 1e6}%.1f MB -> ${postBytes / 1e6}%.1f MB " +
      f"(reclaimed ${(preBytes - postBytes) / 1e6}%.1f MB); " +
      s"versions ${graft.pipelines.AnnIndex.committedVersions(spark, chain)}")
    val g4 = graft.pipelines.AnnIndex.graph(spark, vr(1))
    println(s"graph equal post-vacuum: " +
      s"${g4.exceptAll(g2).count() == 0 && g2.exceptAll(g4).count() == 0}")
    spark.stop()
  }
}
