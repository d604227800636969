package graft.io

import org.apache.spark.sql.SparkSession

/** The one copy of the version-chain retention algorithm that the
  * nav-index chain (`streaming.IndexStreams`) and the curation
  * release chain (`pipelines.Curation`) share, parameterized by the
  * chain's own predicates. Both chains land versioned roots
  * `<root>/v<N>` whose bucketed tables reference ancestor versions'
  * buckets by manifest, so both need the identical rule: keep the
  * newest `keepLast` committed versions, find the newest ANCHOR (a
  * version whose bucketed tables are self-contained) at or below the
  * oldest kept one, delete only versions strictly below that anchor,
  * then manifest-diff-sweep crashed-write orphans inside what stays
  * ([[BucketedTable.sweepOrphans]], with its in-flight-write fences).
  * Keeping the algorithm here means a fix to the retention rule lands
  * once (the round-15 review caught the two chains drifting apart the
  * day the second copy was written). */
object ChainRetention {

  def versionRoot(root: String, b: Long): String = s"$root/v$b"

  /** Committed version numbers under `root`, ascending, judged by the
    * chain's own commit predicate. */
  def committedVersions(spark: SparkSession, root: String,
      isCommitted: String => Boolean): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.drop(1).toLong)
      .filter(b => isCommitted(versionRoot(root, b)))
      .sorted
  }

  /** Version-count threshold for the AUTO-COMPACT trigger inside
    * [[vacuum]]: when the chain holds this many committed versions
    * ABOVE its newest anchor (all of them splice-landed increments —
    * nothing for version-grain retention to delete), [[vacuum]]
    * compacts the tip first so retention can advance. Without it an
    * increment-only maintainer accumulates versions forever: splices
    * never cross the nav chain's per-bucket DIR-count trigger (they
    * keep one dir per bucket), and vacuum alone refuses on an
    * anchorless window — correctly, but permanently. Default 16
    * (one corpus-sized pure-I/O rewrite amortized over ≥15 cheap
    * splice landings); ≤ 0 disables, deferring to explicit compact
    * calls. */
  private def autoCompactVersions(spark: SparkSession): Int =
    spark.conf.getOption("graft.chain.autoCompactVersions").map { s =>
      try s.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft.chain.autoCompactVersions must be an integer version count, got '$s'")
      }
    }.getOrElse(16)

  /** Anchor-bounded retention + orphan sweep. `isAnchor` decides
    * whether a version can terminate the reference chain (no anchor
    * in the kept window → nothing is deleted: safety over
    * reclamation); `referencedDirs`/`sweep` are the chain's wrappers
    * over its bucketed state tables; `compactTip` anchorifies the
    * chain's newest version (the chain's own compact entry point —
    * only the TIP is safe to anchorify in place, because descendants
    * of a version reference its pre-compact directories by manifest)
    * and is invoked by the [[autoCompactVersions]] trigger when an
    * increment-only chain has outgrown the threshold. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
      isCommitted: String => Boolean,
      isAnchor: (Long, String) => Boolean,
      referencedDirs: String => Set[String],
      sweep: (String, Set[String]) => Unit,
      compactTip: () => Unit = () => ()): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val vs = committedVersions(spark, root, isCommitted)
    // auto-compact trigger: committed versions strictly above the
    // newest anchor ≥ threshold → anchorify the tip before the
    // retention pass (the new anchor ages into the ≤ oldest-kept
    // window as the chain grows — immediately at keepLast = 1 —
    // bounding chain length at ~threshold + keepLast instead of
    // unbounded). The anchor probe walks newest-down and stops at the
    // first hit, so its cost is bounded by the chain length the
    // trigger itself bounds.
    val auto = autoCompactVersions(spark)
    if (auto > 0 && vs.size >= auto) {
      val sinceAnchor = vs.reverse
        .find(b => isAnchor(b, versionRoot(root, b)))
        .map(a => vs.count(_ > a)).getOrElse(vs.size)
      if (sinceAnchor >= auto) compactTip()
    }
    if (vs.size > keepLast) {
      val oldestKept = vs.takeRight(keepLast).head
      vs.filter(_ <= oldestKept).reverse
        .find(b => isAnchor(b, versionRoot(root, b)))
        .foreach { anchor =>
          val fs = new org.apache.hadoop.fs.Path(root)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          vs.filter(_ < anchor).foreach { b =>
            fs.delete(new org.apache.hadoop.fs.Path(versionRoot(root, b)), true)
          }
        }
    }
    // Manifest-diff orphan sweep over the RETAINED versions:
    // version-grain deletion above can never reclaim a crashed
    // compact's orphan generation (or a crashed splice's stale
    // data/pb= dirs) INSIDE a version that stays retained — those
    // dirs sit next to live ones and appear in no manifest.
    // Subtracting the chain-wide referenced union from each retained
    // version's on-disk generation dirs reclaims exactly the bytes no
    // manifest can ever reach again (a dir absent from every retained
    // manifest can never become referenced: manifests only carry
    // forward prior entries or their own local writes).
    val kept = committedVersions(spark, root, isCommitted)
    val live = kept.flatMap(b => referencedDirs(versionRoot(root, b))).toSet
    kept.foreach(b => sweep(versionRoot(root, b), live))
  }
}
