package graft

import org.apache.spark.sql.functions._

import graft.ops.Text

/** The deep-vocabulary BPE paths: the driver-loop trainer
  * (`bpeTrainLoop`) against the unrolled oracle-pinned 5-merge form,
  * and the per-partition greedy encoder (`bpeEncodeWith`) against the
  * literal-replace fold. */
class TokenizerSpec extends SparkSpec {

  test("bpe loop trainer: row-identical to the unrolled 5-merge form") {
    val docs = Tables.documents(spark, sf)
    // the loop at k = 5 IS the unrolled oracle-pinned trainer
    val looped = Text.bpeTrainLoop(spark, docs, 5)
    val unrolled = Text.bpeTrain(spark, sf)
    assert(looped.exceptAll(unrolled).count() === 0)
    assert(unrolled.exceptAll(looped).count() === 0)
  }

  test("deep encoder matches the literal-replace apply path") {
    val docs = Tables.documents(spark, sf)
    val ms = Text.bpeTrain(spark, sf).orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Text.bpeEncodeWith(spark, docs, ms)
    val ref = Text.bpeApply(spark, sf)
    assert(enc.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(enc).count() === 0)
  }

  test("deep training run crosses the parquet seam with sane elections") {
    val docs = Tables.documents(spark, sf)
    // 64 rounds crosses the BpeSeamEvery = 32 seam: rounds are
    // consecutive from 1 and elected counts never increase (a merge
    // can only create pairs bounded by its own count)
    val deep = Text.bpeTrainLoop(spark, docs, 64).orderBy("round").collect()
    assert(deep.length > 5 && deep.length <= 64)
    assert(deep.map(_.getLong(0)).toSeq === (1L to deep.length.toLong))
    val ns = deep.map(_.getLong(3))
    assert(ns.zip(ns.tail).forall { case (x, y) => y <= x },
      s"elected pair counts must be non-increasing: ${ns.toSeq}")
  }
}
