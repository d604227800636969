package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucket-partitioned, manifest-versioned parquet state — the storage
  * layout that makes incremental index maintenance pay at scale
  * (round-12 PERF.md named it: "bucket-partitioned round tables with
  * partition-level overwrite would be the next step at billion-vector
  * scale"). A version of a table is
  *
  * ```
  * <path>/data/pb=<k>/part-*.parquet   locally-written buckets
  * <path>/_parts                       the manifest (commit marker)
  * ```
  *
  * where `_parts` maps every bucket to the PHYSICAL directories
  * holding its rows — locally-written dirs for buckets this version
  * touched, and absolute references into ANCESTOR versions for
  * buckets it did not (references are stored pre-resolved, so chains
  * stay one hop deep no matter how many increments stack). An
  * incremental writer therefore rewrites ONLY frontier-touched
  * buckets; everything else is a manifest line. This is the
  * shared-file posture of the table formats (an Iceberg/Delta
  * snapshot reuses unchanged data files and rewrites a manifest);
  * kept on Spark core the same way `Writers.mergeKeyed` keeps the
  * versioned upsert.
  *
  * Commit contract: data first, manifest LAST (tmp + rename, the
  * `Writers.commitPointer` discipline) — manifest presence IS the
  * commit marker, so a crashed writer leaves unreferenced bytes,
  * never a torn table. Replay-safe with deterministic derivations:
  * a re-run writes the same buckets through dynamic partition
  * overwrite ([[Writers.rangedOverwrite]]) and re-commits the same
  * manifest; stale local dirs outside the re-derived touched set are
  * ignored because only the manifest is read.
  *
  * Retention: a version's untouched buckets LIVE in ancestor
  * directories, so deleting an ancestor version invalidates its
  * descendants — vacuuming this layout must keep every version a
  * retained manifest references (reference-counted vacuum, the same
  * contract lake formats carry). The index pipelines here retire
  * whole version CHAINS (or rebuild, which references nothing), so
  * the simple rule "vacuum only below the oldest retained full
  * build" suffices.
  *
  * Readers take an EXPLICIT schema: a manifest can resolve to zero
  * directories (an empty table) where inference has nothing to read,
  * and at 100 TB a declared schema also skips the footer-sampling
  * pass entirely.
  */
object BucketedTable {

  private val ManifestName = "_parts"

  private def dataDir(path: String): String = s"$path/data"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A committed version exists at `path` (manifest present). */
  def isCommitted(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(s"$path/$ManifestName"))

  /** The bucket → physical-directories map of the committed version
    * at `path`. Every directory is absolute and holds plain parquet
    * part files for exactly that bucket. */
  def parts(spark: SparkSession, path: String): Map[Int, Seq[String]] = {
    val f = fs(spark, path)
    val mp = new org.apache.hadoop.fs.Path(s"$path/$ManifestName")
    require(f.exists(mp), s"no committed bucketed table at $path (missing $ManifestName)")
    val in = f.open(mp)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    text.linesIterator.filter(_.nonEmpty).toSeq
      .map { line =>
        val Array(k, dir) = line.split("\t", 2)
        k.toInt -> dir
      }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  }

  /** Locally-written bucket dirs under `path`/data (pb=<k> children),
    * optionally restricted to an expected bucket set (replay hygiene:
    * stale dirs from a crashed attempt outside the re-derived touched
    * set must not enter the manifest). */
  private def localParts(spark: SparkSession, path: String,
      expect: Option[Set[Int]]): Map[Int, Seq[String]] = {
    val f = fs(spark, path)
    val d = new org.apache.hadoop.fs.Path(dataDir(path))
    if (!f.exists(d)) Map.empty
    else f.listStatus(d).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("pb="))
      .map(st => st.getPath.getName.drop(3).toInt -> st.getPath.toUri.getPath)
      .filter { case (k, _) => expect.forall(_.contains(k)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  }

  /** Align the shuffle with the bucket layout before a partitioned
    * write: each bucket then lands from ONE task, so a table is
    * ~one file per bucket instead of tasks × buckets small files
    * (the footer-read/task-launch tax `Writers.compactKeyed` exists
    * to undo — cheaper to never pay it). */
  private def byBucket(df: DataFrame): DataFrame =
    df.repartition(org.apache.spark.sql.functions.col("pb"))

  private def commitManifest(spark: SparkSession, path: String,
      entries: Map[Int, Seq[String]]): Unit = {
    val f = fs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/$ManifestName.tmp")
    val ptr = new org.apache.hadoop.fs.Path(s"$path/$ManifestName")
    val body = entries.toSeq.sortBy(_._1)
      .flatMap { case (k, dirs) => dirs.sorted.map(d => s"$k\t$d") }
      .mkString("\n")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (f.exists(ptr)) f.delete(ptr, false)
    require(f.rename(tmp, ptr), s"manifest commit failed for $path")
  }

  /** Land a FULL version: every row written locally. `df` must carry
    * an integer `pb` bucket column (dropped into the directory
    * layout). Full truncate of the data dir — a replayed full build
    * cannot inherit stale buckets. */
  def write(df: DataFrame, path: String): Unit = {
    byBucket(df).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("pb").parquet(dataDir(path))
    val spark = df.sparkSession
    commitManifest(spark, path, localParts(spark, path, None))
  }

  /** Land a SPLICED version: `touched` (rows of buckets in
    * `touchedPb`, with the `pb` column) written locally through
    * dynamic partition overwrite; every bucket outside `touchedPb`
    * carried by reference to the prior version's physical dirs. The
    * caller guarantees `touched` holds ALL surviving rows of the
    * touched buckets — this is a bucket-grain replace. */
  def writeSpliced(spark: SparkSession, touched: DataFrame, touchedPb: Set[Int],
      priorPath: String, path: String): Unit = {
    val prior = parts(spark, priorPath)
    Writers.rangedOverwrite(byBucket(touched), dataDir(path), "pb")
    val entries = prior.filter { case (k, _) => !touchedPb.contains(k) } ++
      localParts(spark, path, Some(touchedPb))
    commitManifest(spark, path, entries)
  }

  /** Land an APPENDED version: `delta` rows (with `pb`) written
    * locally; every prior bucket stays referenced, and buckets the
    * delta lands in carry BOTH directory lists. Zero prior-data I/O —
    * the pure-insert fast path (new vectors joining an index). */
  def writeAppended(spark: SparkSession, delta: DataFrame,
      priorPath: String, path: String): Unit = {
    val prior = parts(spark, priorPath)
    Writers.rangedOverwrite(byBucket(delta), dataDir(path), "pb")
    val local = localParts(spark, path, None)
    val entries = (prior.keySet ++ local.keySet).map { k =>
      k -> (prior.getOrElse(k, Seq.empty) ++ local.getOrElse(k, Seq.empty))
    }.toMap
    commitManifest(spark, path, entries)
  }

  /** The committed table at `path` is SELF-CONTAINED: every manifest
    * entry points under `prefix` (a full write references nothing; an
    * incremented version references ancestors). The retention
    * primitive — a version whose tables are all self-contained is a
    * chain ANCHOR, and everything strictly below the newest retained
    * anchor is reclaimable (`streaming.IndexStreams.vacuum`). */
  def isSelfContained(spark: SparkSession, path: String, prefix: String): Boolean =
    parts(spark, path).values.flatten.forall(_.startsWith(prefix))

  /** Read the whole logical table (one multi-root parquet scan over
    * every referenced directory; the `pb` value is a derived function
    * of the row, not stored data, so it does not reappear). */
  def read(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    readDirs(spark, parts(spark, path).values.flatten.toSeq, schemaDdl)

  /** Read ONLY the given buckets — the partition-pruned scan an
    * incremental splice stands on (untouched buckets are never
    * opened). */
  def readParts(spark: SparkSession, path: String, schemaDdl: String,
      pbs: Set[Int]): DataFrame =
    readDirs(spark,
      parts(spark, path).filter { case (k, _) => pbs.contains(k) }
        .values.flatten.toSeq,
      schemaDdl)

  private def readDirs(spark: SparkSession, dirs: Seq[String],
      schemaDdl: String): DataFrame =
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
    else spark.read.schema(schemaDdl).parquet(dirs.sorted: _*)
}
