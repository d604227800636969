package graft.tools
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
object GsDebug {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.01")
    import graft.ops.Similarity
    val emb = graft.Tables.embeddings(spark, dir)
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
      .withColumn("norm", sqrt(graft.functions.VectorFunctions.dot(spark, col("v"), col("v")))).persist()
    base.count()
    val q = base.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val entries = base.groupBy("label").agg(min(col("vec_id")).as("node")).select("node")
    def d(x: Column, y: Column) = graft.functions.VectorFunctions.dot(spark, x, y)
    // navigable graph: top-3 per node among sign-LSH band mates (4 bands x 8 dims)
    val sigCols = (0 until 4).map { b =>
      concat((1 to 8).map(i => when(element_at(col("v"), b * 8 + i) >= 0, "1").otherwise("0")): _*).as(s"band$b")
    }
    val banded = base.select(Seq(col("vec_id"), col("v"), col("norm")) ++ sigCols: _*)
      .unpivot(Array(col("vec_id"), col("v"), col("norm")), (0 until 4).map(b => col(s"band$b")).toArray, "band", "sig")
      .select(col("vec_id"), col("v"), col("norm"), concat(col("band"), lit("_"), col("sig")).as("bkt"))
    val aSide = banded.select(col("vec_id").as("node"), col("v").as("av"), col("norm").as("an"), col("bkt"))
    val bSide = banded.select(col("vec_id").as("nbr_id"), col("v").as("bv"), col("norm").as("bn"), col("bkt"))
    val wG = Window.partitionBy("node").orderBy(col("c").desc, col("nbr_id"))
    val g0 = aSide.join(bSide, "bkt").where(col("node") =!= col("nbr_id"))
      .withColumn("c", round(d(col("av"), col("bv")) / (col("an") * col("bn")), 6))
      .select("node", "nbr_id", "c").distinct()
      .withColumn("rg", row_number().over(wG)).where(col("rg") <= 3)
      .select("node", "nbr_id")
    val g = g0.unionByName(g0.select(col("nbr_id").as("node"), col("node").as("nbr_id"))).distinct().persist()
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
      s.select("qid","node").unionByName(
        s.select("qid","node").join(g, "node").select(col("qid"), col("nbr_id").as("node"))), 8)
    // exact top3
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("node"))
    val exact = base.select(col("vec_id").as("node"), col("v").as("nv"), col("norm").as("nnorm"))
      .join(broadcast(q), col("node") =!= col("qid"))
      .withColumn("cos", round(d(col("qv"), col("nv")) / (col("qnorm") * col("nnorm")), 6))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select(col("qid"), col("node")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var s = beam(q.select("qid").crossJoin(broadcast(entries)), 8)
    for (h <- 1 to 6) {
      s = hop(s)
      val got = s.where(col("rn") <= 3).select("qid","node").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"hops=$h recall=${(got intersect exact).size}/30")
    }
    spark.stop()
  }
}
