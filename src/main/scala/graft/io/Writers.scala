package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent table writers — the Spark-native form of the reference's
  * load semantics (SURVEY.md §2.1 S5–S9):
  *
  *  - reference "ranged DELETE then append" (`aave_extract.py:702-727`)
  *    → dynamic partition overwrite of exactly the partitions present
  *      in the incoming batch;
  *  - reference "point DELETE then append" for the one-row-per-day
  *    risk table (`aave_transform.py:484-514`) → same mechanism, one
  *    partition;
  *  - reference WRITE_TRUNCATE (`aave_transform.py:227-239`) → full
  *      overwrite;
  *  - CSV interchange for the GCS landing zone shape
  *    (`aave_extract.py:662-682`).
  *
  * Partitioned parquet + `partitionOverwriteMode=dynamic` gives the
  * reference's at-least-once + delete-dedup idempotency: re-running a
  * day replaces that day's partition atomically and leaves the rest of
  * the table untouched. At 100 TB this is also the right physical
  * layout: date-partitioned directories mean readers prune to the
  * queried range and incremental runs rewrite only what they produced.
  * (Delta's `replaceWhere` would express the same contract; parquet
  * dynamic overwrite keeps the dependency surface to Spark core.)
  */
object Writers {

  /** Append-only load with declared schema (reference S5). */
  def append(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partitionCol).parquet(path)

  /** Full-replace load (reference S6 WRITE_TRUNCATE). */
  def truncateLoad(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Idempotent ranged overwrite (reference S7/S8): replaces exactly
    * the partition-column combinations present in `df`, keeps all
    * others. Safe to re-run: same input → same resulting table state.
    * Multi-column layouts (`"name", "date"` — the reference's
    * per-(strategy, date-range) DELETE, `aave_extract.py:702-727`)
    * give hierarchical directories that prune on BOTH keys at read
    * time — the 100 TB physical layout for many-strategy tables. */
  def rangedOverwrite(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.sparkSession.conf.withSqlConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    }

  /** JDBC delete-then-append sink (reference S10 — the datamart loads
    * at `aave_load.py:72-84,108-119,147-158` all do `DELETE FROM t
    * WHERE strategy_id = X` then append): deletes exactly the key
    * values present in the incoming batch, then appends the batch over
    * JDBC. The key set is the set of entities being reloaded — O(#
    * entities), never O(rows) — so the driver-side DELETE batch is
    * bounded; the row append streams from executors through Spark's
    * JDBC writer. Idempotent: re-running a batch reproduces the same
    * table state. Identifiers are double-quoted to match the quoting
    * Spark's JDBC writer uses when it creates the table. */
  def jdbcDeleteAppend(df: DataFrame, url: String, table: String, keyCol: String): Unit = {
    val keys = df.select(keyCol).distinct().collect().map(_.get(0))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      // dialect-proof existence probe: a zero-row SELECT against the
      // table either parses+binds (table exists) or fails to resolve
      // (it does not) — no reliance on how the driver's metadata
      // catalog cases or quotes identifiers. Only the specific
      // table-not-found SQLStates read as "absent" (Derby 42X05,
      // MySQL/SQL Server 42S02, Postgres 42P01, HSQLDB/ODBC S0002);
      // anything else — including permission errors, which also live
      // in class 42 — rethrows, because silently skipping the DELETE
      // would break the delete-then-append idempotency contract.
      val tableNotFound = Set("42X05", "42S02", "42P01", "S0002")
      val exists =
        try {
          val st = conn.createStatement()
          try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
          finally st.close()
        } catch {
          case e: java.sql.SQLException
            if Option(e.getSQLState).exists(tableNotFound.contains) => false
        }
      if (exists) {
        val st = conn.prepareStatement(s"""DELETE FROM $table WHERE "$keyCol" = ?""")
        try {
          keys.foreach { k => st.setObject(1, k); st.addBatch() }
          st.executeBatch()
        } finally st.close()
      }
    } finally conn.close()
    df.write.mode(SaveMode.Append).jdbc(url, table, new java.util.Properties())
  }

  /** Batched JDBC UPDATE of summary columns (reference S11 —
    * `UPDATE strategy SET "tvl" = {latest} WHERE "id" = {id}`,
    * `aave_load.py:121-128,160-167`): one UPDATE per row of `summary`
    * (id + new column values), executed as a single JDBC batch.
    * `summary` is O(#entities) by construction — it is the per-entity
    * latest-value table, not fact rows. */
  def jdbcUpdateSummary(summary: DataFrame, url: String, table: String,
                        idCol: String, valueCols: Seq[String]): Unit = {
    val rows = summary.select((idCol +: valueCols).map(col): _*).collect()
    val sets = valueCols.map(c => s""""$c" = ?""").mkString(", ")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(s"""UPDATE $table SET $sets WHERE "$idCol" = ?""")
      try {
        rows.foreach { r =>
          valueCols.indices.foreach(i => st.setObject(i + 1, r.get(i + 1)))
          st.setObject(valueCols.length + 1, r.get(0))
          st.addBatch()
        }
        st.executeBatch()
      } finally st.close()
    } finally conn.close()
  }

  /** Bucketed save: pre-shuffles and sorts by the join key at write
    * time so later equi-joins between co-bucketed tables need NO
    * exchange (the 100 TB answer to repeated fact-fact joins on the
    * same key). Requires a catalog table; `tableName` lands in the
    * session's warehouse dir. */
  def bucketedSave(df: DataFrame, tableName: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(tableName)

  /** MERGE-shaped keyed upsert over parquet — update-else-insert by
    * key, the Delta-MERGE alternative the reference's datamart loads
    * approximate with delete-then-append (SURVEY §2.1 S11), kept on
    * Spark core with a versioned read-modify-swap:
    *
    *  1. read the CURRENT snapshot (the version the `_current` pointer
    *     names; empty on first run);
    *  2. merged = current ANTI-JOIN update-keys ∪ updates — matched
    *     keys take the incoming row, unmatched rows carry over, new
    *     keys insert;
    *  3. land merged under a NEW version directory `v<N+1>`;
    *  4. swing the pointer (write `_current.tmp`, delete, rename) —
    *     on HDFS the rename is atomic; the delete→rename window can
    *     only yield a MISSING pointer (readers fall back to the
    *     highest landed version), never a torn snapshot, because data
    *     files are immutable once a version lands.
    *
    * Idempotent: re-running a batch produces a new version with
    * identical contents. Old versions stay readable (time travel /
    * audit) until vacuumed. SINGLE-WRITER contract (the reference's
    * load model): concurrent mergers race benignly on `ErrorIfExists`
    * (one wins, the loser's partial dir is skipped by the
    * max-landed-version rule and ignored by readers, which only
    * trust `_SUCCESS`-committed dirs) — but last-pointer-wins means
    * concurrent COMMITS need the multi-writer log Delta/Iceberg
    * carry, which is out of scope here. At 100 TB the snapshot rewrite scopes
    * down the same way Delta/Iceberg do it — rewrite only the FILES
    * whose key-range stats intersect the update keys, tracked by the
    * same pointer/manifest mechanism; the merge dataflow (one
    * key-partitioned anti-join + union) is unchanged, and the
    * anti-join prunes to matched files via min/max pushdown. */
  def mergeKeyed(spark: SparkSession, updates: DataFrame, root: String,
                 keyCols: Seq[String]): Unit = {
    val cur = currentVersion(spark, root)
    var keyRelease: () => Unit = () => ()
    val merged = cur match {
      case None => updates
      case Some(v) =>
        val existing = spark.read.parquet(s"$root/$v")
        // the update-key side is O(#entities) in the reference's
        // datamart shape — broadcast it when it actually is small so
        // the carried-over scan avoids a shuffle; the count is one
        // cheap job against the (distinct-key) batch, not the table
        val keys = updates.select(keyCols.map(col): _*).distinct().persist()
        val side = if (keys.count() <= 1000000L) broadcast(keys) else keys
        val out = existing.join(side, keyCols, "left_anti").unionByName(updates)
        keyRelease = () => { keys.unpersist(); () }
        out
    }
    val nextN = nextVersionN(spark, root, cur)
    try {
      merged.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/v$nextN")
      commitPointer(spark, root, s"v$nextN")
    } finally keyRelease()
  }

  /** Next snapshot version = 1 + max over BOTH the pointer and every
    * landed directory (committed or not): a writer that crashed after
    * creating v(N+1) but before the pointer swing leaves an orphan
    * dir, and deriving from the pointer alone would collide with it
    * on ErrorIfExists forever. Shared by [[mergeKeyed]] and
    * [[compactKeyed]] so both writers survive the same crash residue. */
  private def nextVersionN(spark: SparkSession, root: String,
      cur: Option[String]): Long = {
    val fs = hadoopFs(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val landedMax =
      if (!fs.exists(rootPath)) -1L
      else fs.listStatus(rootPath).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toLong).foldLeft(-1L)(math.max)
    math.max(cur.map(_.drop(1).toLong).getOrElse(-1L), landedMax) + 1
  }

  /** Read the keyed table's current snapshot (pointer, falling back
    * to the highest landed version if the pointer is mid-swap). */
  def readKeyed(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/${currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version under $root"))}")

  /** Table maintenance #1 — COMPACTION: rewrite the current snapshot
    * into ~`targetBytes` files (the small-file problem is the #1
    * operational failure of streaming/merge-heavy lakes: a 100 TB
    * table fed by per-batch appends degrades every scan with
    * footer-read and task-launch overhead). Lands as a NEW version
    * through the same pointer swap as [[mergeKeyed]], so readers
    * never see a half-compacted table and the pre-compaction snapshot
    * stays for audit until vacuumed. Row content is untouched. */
  def compactKeyed(spark: SparkSession, root: String, targetBytes: Long): Unit = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version under $root"))
    val fs = hadoopFs(spark, root)
    val cur = new org.apache.hadoop.fs.Path(s"$root/$v")
    val bytes = fs.getContentSummary(cur).getLength
    val files = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // landedMax-aware, NOT pointer+1: an orphan v(N+1) from a crashed
    // writer would otherwise fail every compaction on ErrorIfExists
    val nextN = nextVersionN(spark, root, Some(v))
    spark.read.parquet(s"$root/$v")
      .repartition(files)
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/v$nextN")
    commitPointer(spark, root, s"v$nextN")
  }

  /** Table maintenance #2 — VACUUM: drop all snapshots older than the
    * newest `keepLast` (the current version is always kept). The
    * retention window is what makes the immutable-version scheme
    * viable at scale — without it a daily merge keeps 365 full copies
    * a year. */
  def vacuumKeyed(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the current version")
    val fs = hadoopFs(spark, root)
    // rank COMMITTED versions only (_SUCCESS present): an orphan dir
    // from a crashed writer must never displace the current snapshot
    // out of the keep window; orphans themselves are left alone (they
    // may belong to an in-flight writer — reclaiming them needs the
    // retention-time contract a multi-writer log would bring)
    val committed = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .filter(n => fs.exists(new org.apache.hadoop.fs.Path(s"$root/$n/_SUCCESS")))
      .sortBy(_.drop(1).toLong)
    val current = currentVersion(spark, root)
    committed.dropRight(keepLast)
      .filterNot(current.contains)
      .foreach { old =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/$old"), true)
      }
  }

  /** TIME TRAVEL: read snapshot `vN` of the keyed table. Every
    * [[mergeKeyed]]/[[deleteKeyed]]/[[compactKeyed]] commit is an
    * immutable version directory, so a historical read is a plain
    * parquet scan (the lake-format `VERSION AS OF`, with the
    * retention window set by [[vacuumKeyed]]). Throws if `vN` was
    * never committed or has been vacuumed. */
  def readKeyedVersion(spark: SparkSession, root: String, n: Long): DataFrame = {
    val fs = hadoopFs(spark, root)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v$n/_SUCCESS")),
      s"version v$n under $root was never committed or has been vacuumed")
    spark.read.parquet(s"$root/v$n")
  }

  /** Table maintenance #3 — keyed DELETE: retire every row matching a
    * key in `keys` (columns `keyCols`), landed as a new immutable
    * version through the same pointer swap as [[mergeKeyed]] — so the
    * delete is atomic to readers, idempotent to re-run, and the
    * pre-delete snapshot stays readable ([[readKeyedVersion]]) until
    * vacuumed. */
  def deleteKeyed(spark: SparkSession, keys: DataFrame, root: String,
      keyCols: Seq[String]): Unit = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version under $root"))
    val side = keys.select(keyCols.map(col): _*).distinct()
    val nextN = nextVersionN(spark, root, Some(v))
    spark.read.parquet(s"$root/$v")
      .join(side, keyCols, "left_anti")
      .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/v$nextN")
    commitPointer(spark, root, s"v$nextN")
  }

  /** CHANGE FEED: the row-level diff that turns snapshot `fromN` into
    * snapshot `toN` — `_op` ∈ insert/update/delete plus the full row
    * payload (post-image; pre-image for deletes). Derived FROM the
    * two immutable snapshots by three joins (no log replay, no
    * write-path bookkeeping), so it is exact between ANY pair of
    * retained versions and across writers that never heard of it —
    * the lake-format `table_changes` surface, computed instead of
    * recorded. Assumes the keyed-table contract (one row per key,
    * which [[mergeKeyed]]'s upsert maintains). */
  def keyedChanges(spark: SparkSession, root: String, fromN: Long, toN: Long,
      keyCols: Seq[String]): DataFrame = {
    val a = readKeyedVersion(spark, root, fromN)
    val b = readKeyedVersion(spark, root, toN)
    val aKeys = a.select(keyCols.map(col): _*).distinct()
    val bKeys = b.select(keyCols.map(col): _*).distinct()
    val inserts = b.join(aKeys, keyCols, "left_anti")
      .withColumn("_op", lit("insert"))
    val deletes = a.join(bKeys, keyCols, "left_anti")
      .withColumn("_op", lit("delete"))
    // updates: key survives, row content differs (post-image)
    val updates = b.exceptAll(a).join(aKeys, keyCols, "left_semi")
      .withColumn("_op", lit("update"))
    inserts.unionByName(updates).unionByName(deletes)
  }

  private def currentVersion(spark: SparkSession, root: String): Option[String] = {
    val fs = hadoopFs(spark, root)
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_current")
    if (fs.exists(ptr)) {
      val in = fs.open(ptr)
      try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
    } else {
      // pointer mid-swap or first run: highest COMMITTED version wins.
      // Commit is evidenced by Spark's _SUCCESS marker — a writer
      // that crashed mid-write leaves a partial dir without one, and
      // falling back to it would serve torn data.
      val p = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(p)) None
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
        .filter(n => fs.exists(new org.apache.hadoop.fs.Path(s"$root/$n/_SUCCESS")))
        .sortBy(_.drop(1).toLong).lastOption
    }
  }

  private def commitPointer(spark: SparkSession, root: String, version: String): Unit = {
    val fs = hadoopFs(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_current.tmp")
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_current")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    if (fs.exists(ptr)) fs.delete(ptr, false)
    require(fs.rename(tmp, ptr), s"pointer swing failed for $root -> $version")
  }

  private def hadoopFs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** CSV interchange sink/source (reference S3/S4). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).option("header", "true").csv(path)

  /** JSONL sink/source — the interchange format corpus releases ship
    * (one JSON object per line; Spark's json source is line-delimited
    * by default, so each file splits at line grain). Writes land
    * gzip-compressed and partitioned (a corpus drop is
    * `source=<s>/part-*.json.gz`); reads take an EXPLICIT schema —
    * at 100 TB, schema inference is a full extra pass over the data
    * that a declared contract makes free, and a typo'd field surfaces
    * as an analysis error instead of a silent null column. */
  def writeJsonl(df: DataFrame, path: String, partitionCols: String*): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("compression", "gzip")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).json(path)
  }

  def readJsonl(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  private implicit class ConfOps(val conf: org.apache.spark.sql.RuntimeConfig) extends AnyVal {
    /** Run `body` with a conf temporarily set, restoring the prior value. */
    def withSqlConf(kv: (String, String))(body: => Unit): Unit = {
      val (k, v) = kv
      val prev = conf.getOption(k)
      conf.set(k, v)
      try body finally prev match {
        case Some(p) => conf.set(k, p)
        case None    => conf.unset(k)
      }
    }
  }
}
