package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for LLM training-data pipelines over the
  * `documents` table: exact (hash-groupBy), prefix near-exact,
  * MinHash + LSH band candidate generation, n-gram Jaccard
  * verification, and SimHash signatures.
  *
  * Hash parity note: every hash is `md5` over an explicitly
  * constructed string, so Spark and the DuckDB oracle compute
  * identical signatures; MinHash "permutations" are md5 with a salt
  * prefix, minimized lexicographically over the hex strings (a valid
  * uniform min-hash; engine-portable, unlike murmur-based builtins).
  *
  * Scale notes (100 TB): exact dedup is one shuffle on the content
  * hash. MinHash is the scale path for near-dup: shingle explode is
  * map-side, signatures are one groupBy(doc), band buckets are a
  * self-equi-join on (band, key) — candidate pairs only, never the
  * O(n²) cross join. Jaccard verification touches only the candidate
  * pairs. Skewed buckets (boilerplate docs) are AQE skew-join
  * territory; a production variant would also cap bucket width.
  */
object Dedup {

  /** Exact dedup by full-content hash: every doc keyed by md5(text),
    * keeper = lowest doc_id in its group.
    * Output: doc_id, h, keep. */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("h")
    Tables.documents(spark, dir)
      .withColumn("h", md5(col("text")))
      .withColumn("keep", (col("doc_id") === min(col("doc_id")).over(w)).cast("boolean"))
      .select("doc_id", "h", "keep")
      .orderBy("doc_id")
  }

  /** Near-exact dedup on a 40-char prefix hash: duplicate groups only.
    * Output: h, n_dups, keep_id. */
  def prefix(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(substring(col("text"), 1, 40)).as("h"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .where(col("n_dups") > 1)
      .orderBy("h")

  /** MinHash signatures (H=8 salted-md5 min-hashes over distinct
    * 12-char shingles) → 4 LSH bands of 2 → candidate pairs sharing
    * at least one band bucket. Output: doc_a, doc_b. */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(spark, dir)
    val a = bands.select(col("doc_id").as("doc_a"), col("b"), col("key"))
    val b = bands.select(col("doc_id").as("doc_b"), col("b"), col("key"))
    a.join(b, Seq("b", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** (doc_id, band index, band key) — the LSH bucket table. */
  private[ops] def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val shingles = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("array_distinct(transform(sequence(1, length(text) - 11), i -> substring(text, i, 12)))")).as("sh"))
    val mh = (0 until 8).map(j => min(md5(concat(lit(s"$j|"), col("sh")))).as(s"mh$j"))
    val sigs = shingles.groupBy("doc_id").agg(mh.head, mh.tail: _*)
    (0 until 4).map { b =>
      sigs.select(col("doc_id"), lit(b).as("b"),
        md5(concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("key"))
    }.reduce(_.unionByName(_))
  }

  /** Exact n-gram Jaccard over MinHash candidates: |A∩B| / |A∪B| on
    * distinct 12-char shingle sets, thresholded at 0.3.
    * Output: doc_a, doc_b, jac. */
  def jaccard(spark: SparkSession, dir: String): DataFrame = {
    val cands = minhashCandidates(spark, dir)
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr("array_distinct(transform(sequence(1, length(text) - 11), i -> substring(text, i, 12)))")).as("sh"))
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .where(col("sh") === col("sh_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_int"))
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jac", round(col("n_int").cast("double") /
        (col("n_a") + col("n_b") - col("n_int")).cast("double"), 6))
      .where(col("jac") >= 0.3)
      .select("doc_a", "doc_b", "jac")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 16-bit signature from the md5 hex digits of each
    * whitespace token (bit k set iff the weighted sum of hex-digit-k
    * high bits is positive). Near-dup docs land on close signatures.
    * Output: doc_id, simhash. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val ss = (1 to 16).map(k =>
      sum(when(substring(col("h"), k, 1).between("8", "f"), 1).otherwise(-1)).as(s"s$k"))
    val bitSums = toks.groupBy("doc_id").agg(ss.head, ss.tail: _*)
    bitSums
      .select(col("doc_id"),
        concat((1 to 16).map(k => when(col(s"s$k") > 0, "1").otherwise("0")): _*).as("simhash"))
      .orderBy("doc_id")
  }
}
