package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`,
  * 64-dim): brute-force cosine top-k as the exact baseline, an
  * LSH-bucketed (sign-signature) variant as the scale path, and
  * cosine near-duplicate pair detection.
  *
  * Vectors are cast to array<double> before the dot product so both
  * engines accumulate in double, left-to-right — identical results.
  *
  * Scale notes (100 TB): brute force is O(n²·d) — correct baseline,
  * only viable per-bucket. The LSH variant buckets by hyperplane-sign
  * signature so the self-join touches only same-bucket pairs — that's
  * the IVF-style path: at scale, signatures come from r random
  * hyperplanes tuned so buckets hold ~thousands of vectors, the
  * bucket join is a shuffle on the signature key, and skewed buckets
  * split via AQE/salting. The query side broadcasts (one row here;
  * a query *batch* of ≤ a few MB would broadcast too).
  */
object Similarity {

  /** cosine(a, b) for two array<double> columns — sequential fold,
    * engine-portable. */
  private def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))

  /** Brute-force cosine top-k: for each query vector (vec_id < 10 to
    * bound output), the k=3 nearest neighbors over all vectors.
    * Ranked on round(cos, 6) with neighbor-id tiebreak so ordering is
    * engine-deterministic. Output: vec_id, nbr_id, cos, rank. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val q = vecs(spark, dir).where(col("vec_id") < 10)
      .select(col("vec_id"), col("v"))
    val c = vecs(spark, dir).select(col("vec_id").as("nbr_id"), col("v").as("w"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr_id"))
    c.join(broadcast(q), col("vec_id") =!= col("nbr_id"))
      .withColumn("cos", round(cosine(col("v"), col("w")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("nbr_id"), col("cos"), col("rank").cast("bigint").as("rank"))
      .orderBy("vec_id", "rank")
  }

  /** LSH-bucketed ANN: bucket = sign signature of the first 8
    * dimensions (8 fixed hyperplanes); nearest neighbor searched only
    * within the bucket. Output: vec_id, bucket, nbr_id, cos. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val sig = (0 until 8).map(i => when(element_at(col("v"), i + 1) >= 0, "1").otherwise("0"))
    val bucketed = vecs(spark, dir).withColumn("bucket", concat(sig: _*))
    val a = bucketed.select(col("vec_id"), col("bucket"), col("v"))
    val b = bucketed.select(col("vec_id").as("nbr_id"), col("bucket"), col("v").as("w"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr_id"))
    a.join(b, Seq("bucket"))
      .where(col("vec_id") =!= col("nbr_id"))
      .withColumn("cos", round(cosine(col("v"), col("w")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("vec_id", "bucket", "nbr_id", "cos")
      .orderBy("vec_id")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with
    * cos >= 0.9 (distinct pairs, a < b). Output: doc_a, doc_b, cos. */
  def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    val a = vecs(spark, dir).select(col("vec_id").as("doc_a"), col("v"))
    val b = vecs(spark, dir).select(col("vec_id").as("doc_b"), col("v").as("w"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("cos", round(cosine(col("v"), col("w")), 6))
      .where(col("cos") >= 0.9)
      .select("doc_a", "doc_b", "cos")
      .orderBy("doc_a", "doc_b")
  }

  /** Per-label centroid + the vector closest to its centroid — the
    * k-means-assignment-shaped aggregation (array_agg-free: position
    * explode + avg). Output: label, n, medoid_id, medoid_cos. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val centroids = v
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("cx"))
      .groupBy("label").agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("label"), expr("transform(pairs, p -> p.cx)").as("centroid"))
    val w = Window.partitionBy("label").orderBy(col("cos").desc, col("vec_id"))
    v.join(centroids, "label")
      .withColumn("cos", round(cosine(col("v"), col("centroid")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("label"), col("vec_id").as("medoid_id"), col("cos").as("medoid_cos"))
      .join(v.groupBy("label").agg(count(lit(1)).as("n")), "label")
      .select("label", "n", "medoid_id", "medoid_cos")
      .orderBy("label")
  }
}
