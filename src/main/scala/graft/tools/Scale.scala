package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an N× scaled copy of a driver testdata dir (into /tmp) for
  * scale experiments: fact tables become N key-shifted copies, with
  * document text perturbed per copy so the dedup workload grows as
  * NEAR duplicates (the hard case for candidate generation) and
  * embeddings duplicated exactly (the hard case for near-dup output).
  * NOT part of the driver contract — local tooling behind PERF.md's
  * scaling measurements.
  * `runMain graft.tools.Scale <srcDir> <outDir> [copies]` */
object Scale {
  private val K = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sfx10")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def raw(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    def times(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(k => f(df, k)).reduce(_.unionByName(_))

    write(raw("region"), "region")
    write(raw("nation"), "nation")
    write(raw("part"), "part")
    write(times(raw("supplier")) { (df, k) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(k * K)) }, "supplier")
    write(times(raw("customer")) { (df, k) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(k * K)) }, "customer")
    write(times(raw("orders")) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * K))
        .withColumn("o_custkey", col("o_custkey") + lit(k * K)) }, "orders")
    write(times(raw("lineitem")) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * K)) }, "lineitem")
    write(times(raw("events")) { (df, k) =>
      df.withColumn("user_id", col("user_id") + lit(k * K)) }, "events")
    write(times(raw("documents")) { (df, k) =>
      df.withColumn("doc_id", col("doc_id") + lit(k * K))
        .withColumn("text",
          if (k == 0) col("text") else concat(col("text"), lit(s" copy$k"))) }, "documents")
    write(times(raw("embeddings")) { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + lit(k * K)) }, "embeddings")
    println(s"scaled x$copies -> $out")
    spark.stop()
  }
}
