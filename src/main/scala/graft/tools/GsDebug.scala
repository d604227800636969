package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch harness (not part of the driver surface): compares the
  * per-hop-persisted beam walk against a single-action unpersisted
  * walk (tiny stages; the union double-reference costs 2^hops of
  * cheap work vs hops× of fixed action overhead). */
object GsDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[gs] $label%-28s min ${reps.min}%.2f s  reps ${reps.map(r => f"$r%.2f").mkString(",")}")
      null.asInstanceOf[A]
    }
    // warm the artifact
    graft.ops.Similarity.navGraphShared(spark, dir).count()
    t("walk per-hop persist") {
      graft.ops.Similarity.graphSearch(spark, dir).count()
    }
    // inline unpersisted variant
    def d(a: Column, b: Column) = graft.functions.VectorFunctions.dot(spark, a, b)
    t("walk single-action") {
      val base = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("norm", sqrt(d(col("v"), col("v")))).persist()
      base.count()
      val q = base.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
      val entries = base.select(col("vec_id").as("node")).orderBy("node").limit(16)
      val edges = graft.ops.Similarity.navGraphShared(spark, dir)
      def beam(c: DataFrame, b: Int): DataFrame = {
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("node"))
        c.distinct()
          .join(base.select(col("vec_id").as("node"), col("v").as("nv"), col("norm").as("nnorm")), "node")
          .join(broadcast(q), "qid")
          .where(col("node") =!= col("qid"))
          .withColumn("cos", round(d(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")), 6))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= b)
          .select(col("qid"), col("node"), col("cos"), col("rn"))
      }
      def hop(s: DataFrame): DataFrame = beam(
        s.select("qid", "node").unionByName(
          s.select("qid", "node").join(edges, "node")
            .select(col("qid"), col("nbr_id").as("node"))), 16)
      val s0 = beam(q.select("qid").crossJoin(broadcast(entries)), 16)
      hop(hop(hop(s0))).where(col("rn") <= 3).count()
      base.unpersist()
    }
    spark.stop()
  }
}
