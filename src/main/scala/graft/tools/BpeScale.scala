package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Text

/** BPE deep-vocabulary scaling measurement behind PERF.md's rows:
  * trains `Text.bpeTrainLoop` to a realistic merge count (default
  * 1000) and measures, per corpus scale,
  *
  *   - TRAIN time (the once-per-release tokenizer cost) — the claim
  *     under test: after the one vocab aggregate, per-round cost is
  *     O(vocabulary), so ×10/×100 corpus copies move train time by
  *     the vocab-aggregate term only;
  *   - merge-list BIT-IDENTITY across scales (training is weighted by
  *     occurrence counts, so uniform duplication cannot change any
  *     election — the `QclfScale` duplication-invariance discipline);
  *   - ENCODE time over the full corpus under the deep merge list
  *     (`Text.bpeEncodeWith`, the per-partition greedy scan);
  *   - the FERTILITY CURVE (tokens per whitespace word) at merge
  *     prefixes k ∈ {89, 250, 1000} — the number a tokenizer
  *     evaluation actually reads, at the vocabulary depths that
  *     matter.
  *
  * CORPUS: the driver's `documents` table has a CLOSED vocabulary
  * (template-generated), which saturates at 89 learnable merges —
  * fertility collapses to 1.0 long before a deep vocabulary is
  * exercised (round-12 finding). The default corpus here is
  * therefore an OPEN-VOCABULARY synthetic ([[openCorpus]]):
  * Zipf-distributed CVCV stems with productive prefix/suffix
  * affixing, deterministic in doc_id alone (the FIXTURES.md
  * discipline — no RNG state, any engine regenerates it bit-for-bit).
  * ~3k stems × 7 prefixes × 16 suffixes give ~10^5 surface forms, so
  * 1000 merges stay productive and the fertility curve means what a
  * tokenizer evaluation wants. Pass a path as arg 1 to run the
  * legacy documents-table mode instead.
  *
  * NOT part of the driver contract — local tooling.
  * `runMain graft.tools.BpeScale [open[:nDocs]|srcDir] [k] [scales…]` */
object BpeScale {

  private val Onsets = Vector("b", "d", "f", "g", "k", "l", "m", "n", "p", "r",
    "s", "t", "v", "z", "br", "st", "tr", "pl")
  private val Vowels = Vector("a", "e", "i", "o", "u", "ai", "ou")
  private val Codas  = Vector("", "n", "r", "s", "t", "l", "nd", "st")
  private val Suffixes = Vector("", "s", "ing", "ed", "er", "est", "ly", "tion",
    "ness", "ment", "ish", "al", "ic", "ous", "ity", "ive")
  private val Prefixes = Vector("", "", "", "un", "re", "pre", "over")
  private val NStems = 3000

  private def stem(ix: Int): String = {
    val o1 = Onsets(ix % Onsets.size)
    val v1 = Vowels((ix / Onsets.size) % Vowels.size)
    val c1 = Codas((ix / (Onsets.size * Vowels.size)) % Codas.size)
    val o2 = Onsets((ix * 13 + 7) % Onsets.size)
    val v2 = Vowels((ix * 29 + 3) % Vowels.size)
    o1 + v1 + o2 + v2 + c1
  }

  private def lcg(x: Long): Long =
    x * 6364136223846793005L + 1442695040888963407L

  /** Open-vocabulary synthetic text: `wordsPerDoc` words per doc,
    * each word = Zipf-ranked stem (rank = floor(nStems^u), the
    * inverse-CDF trick for a ~1/r law) with Zipf-leaning affixes —
    * natural-text-shaped frequency structure with a productive
    * morphology. Deterministic per (doc_id, position) through a bare
    * LCG chain — duplicated corpora (new doc_ids, same texts) keep
    * the invariance property the scaling legs assert. */
  private[tools] def openCorpus(spark: SparkSession, nDocs: Long,
      wordsPerDoc: Int = 100): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).as[Long].map { d =>
      val sb = new StringBuilder
      var h = lcg(d + 1)
      var w = 0
      while (w < wordsPerDoc) {
        h = lcg(h)
        val u = (h >>> 11).toDouble / (1L << 53).toDouble
        val r = math.min(NStems - 1, math.exp(u * math.log(NStems.toDouble)).toInt)
        h = lcg(h)
        val suf = Suffixes(((h >>> 33) % Suffixes.size).toInt)
        h = lcg(h)
        val pre = Prefixes(((h >>> 33) % Prefixes.size).toInt)
        if (sb.nonEmpty) sb.append(' ')
        sb.append(pre).append(stem(r)).append(suf)
        w += 1
      }
      (d, sb.toString)
    }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("open:4000")
    val k = args.lift(1).map(_.toInt).getOrElse(1000)
    val scales = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outBase = "/tmp/graft_bpe_scale"
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
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // the ×1 corpus: open-vocab synthetic (default) or a documents dir
    val open = src.startsWith("open")
    val x1Dir = s"$outBase/x1"
    if (open) {
      val nDocs = src.split(":", 2).lift(1).map(_.toLong).getOrElse(4000L)
      openCorpus(spark, nDocs)
        .write.mode(SaveMode.Overwrite).parquet(s"$x1Dir/documents.parquet")
    } else {
      spark.read.parquet(s"$src/documents.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$x1Dir/documents.parquet")
    }

    var mergesX1: Seq[(Long, String, String, Long)] = Seq.empty
    for (scale <- scales) {
      val dir =
        if (scale == 1) x1Dir
        else {
          val out = s"$outBase/x$scale"
          val docs = spark.read.parquet(s"$x1Dir/documents.parquet")
          // copy offset derived from the source's own id range — a
          // fixed constant would collide ids across copies on a
          // corpus whose doc_id already exceeds it and silently
          // distort the duplication-invariance check
          val off = docs.agg(max("doc_id")).head().getLong(0) + 1L
          (0 until scale).map { c =>
            docs.withColumn("doc_id", col("doc_id") + lit(c * off))
          }.reduce(_.unionByName(_))
            .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
          out
        }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println(s"== scale x$scale (${docs.count()} docs) ==")
      // tiered trainer (round 14): driver-resident incremental pair
      // counts when the vocab fits, the distributed loop above the
      // ceiling; GRAFT_BPE_LOOP=1 forces the loop for cross-checking
      val trained = time(s"x$scale train $k merges")(
        if (sys.env.contains("GRAFT_BPE_LOOP")) Text.bpeTrainLoop(spark, docs, k)
        else Text.bpeTrainTiered(spark, docs, k))
      val rows = trained.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      println(s"x$scale learned merges: ${rows.length}")
      if (scale == 1) mergesX1 = rows
      else if (mergesX1.isEmpty)
        println(s"x$scale invariance SKIPPED (no x1 baseline in this run)")
      else {
        // duplication invariance: elections identical, counts ×scale
        val ok = rows.length == mergesX1.length && rows.zip(mergesX1).forall {
          case ((r1, a1, b1, n1), (r0, a0, b0, n0)) =>
            r1 == r0 && a1 == a0 && b1 == b0 && n1 == n0 * scale
        }
        println(s"x$scale merge-list invariance vs x1: " +
          (if (ok) "IDENTICAL (counts x" + scale + ")" else "DIVERGED"))
      }
      val ms = rows.map(r => (r._2, r._3))
      time(s"x$scale encode corpus ($k merges)")(
        Text.bpeEncodeWith(spark, docs, ms).count())
      if (scale == 1) {
        // FERTILITY CURVE at merge-prefix depths: training order means
        // merges.take(j) IS the tokenizer trained to j merges
        println("-- fertility curve (tokens/word at merge-prefix k) --")
        for (j <- Seq(89, 250, 1000).filter(_ <= rows.length)) {
          val enc = Text.bpeEncodeWith(spark, docs, ms.take(j))
            .join(docs.select(col("doc_id"),
              size(split(col("text"), " ")).cast("bigint").as("words")), "doc_id")
            .agg(sum("n_tokens").as("toks"), sum("words").as("words"),
              sum("n_chars").as("chars"))
            .head()
          val fert = enc.getLong(0).toDouble / enc.getLong(1)
          val cpt = enc.getLong(2).toDouble / enc.getLong(0)
          println(f"  k=$j%4d  fertility ${fert}%6.3f  chars/tok ${cpt}%6.3f")
        }
        if (!open) {
          println("-- per-language fertility (5-merge oracle vocab vs deep vocab) --")
          Text.bpeFertility(spark, dir).show(10, false)
          Text.bpeFertilityWith(spark, dir, ms).show(10, false)
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
