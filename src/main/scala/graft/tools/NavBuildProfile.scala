package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Stage-by-stage profile of the navigable-graph FULL build — the
  * round-11 watch item: the ×100 build constant (229.5 s at 200k
  * vectors, ~12× the ×10 time for 10× the data). Replicates
  * `Similarity.navGraphRounds` with a timer and a row count around
  * every stage (band table, seed-pair volume, each NN-descent round's
  * capped adjacency / 2-hop candidate volume / top-K rank) so the
  * constant's owner — seed-pair volume vs descent-round candidate
  * volume vs the rank window — is measured, not guessed.
  * NOT part of the driver contract — local tooling behind PERF.md.
  * `runMain graft.tools.NavBuildProfile [embDir]` */
object NavBuildProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_retr_scale/mix100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val iterDir = s"/tmp/graft_nav_profile_${java.util.UUID.randomUUID().toString.take(8)}"
    def mat(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$iterDir/$name")
      spark.read.parquet(s"$iterDir/$name")
    }

    val emb = graft.Tables.embeddings(spark, dir)
    val v = time("land normed vectors")(
      mat(Similarity.vecsOf(spark, emb).select("vec_id", "v", "norm"), "v"))
    val n = v.count()
    val bits = Similarity.navBitsFor(n)
    println(s"corpus $n vectors, seed bands at $bits bits")

    val bands = time("land band table")(
      mat(Similarity.navBands(v, bits), "bands"))
    val stats = bands.groupBy("b", "key").agg(count(lit(1)).as("w"))
    val overCap = stats.where(col("w") > Similarity.NavBucketCap)
    println(s"buckets: ${stats.count()} total, ${overCap.count()} over-cap; " +
      s"widest ${stats.agg(max(col("w"))).first().getLong(0)}; " +
      s"over-cap mass ${overCap.agg(coalesce(sum(col("w")), lit(0L))).first().getLong(0)} member-rows")

    val seed = time("land seed pairs")(
      mat(Similarity.navSeedPairs(bands, Seq("b", "key")), "seed"))
    println(f"seed pairs: ${seed.count()} (${seed.count().toDouble / n}%.1f /node)")

    var edges = time("round 0: navTopK(seed)")(
      mat(Similarity.navTopK(spark, v, seed), "e0"))
    println(s"e0 edges: ${edges.count()}")
    for (r <- 1 to 2) {
      val a = time(s"round $r: capped adjacency")(
        mat(Similarity.navExpandAdj(Similarity.navUnd(edges)), s"u$r"))
      println(f"u$r rows: ${a.count()} (${a.count().toDouble / n}%.1f /node)")
      val cand = time(s"round $r: land candidates (adj+2hop+prev)")(
        mat(Similarity.navRefineCand(a).unionByName(edges), s"c$r"))
      println(f"c$r rows: ${cand.count()} raw (${cand.count().toDouble / n}%.1f /node)")
      edges = time(s"round $r: navTopK(candidates)")(
        mat(Similarity.navTopK(spark, v, cand), s"e$r"))
      println(s"e$r edges: ${edges.count()}")
    }
    time("symmetrize")(println(s"final und edges: ${Similarity.navUnd(edges).count()}"))
    spark.stop()
  }
}
