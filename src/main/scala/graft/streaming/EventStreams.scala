package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines — the streaming twins of
  * `graft.ops.Events` (SURVEY.md §2.9: the reference is batch-daily;
  * these show the same semantics under `readStream`, which is how the
  * engine would ingest a live event feed at scale).
  *
  * Design: watermarked event-time tumbling windows for the rollup;
  * `flatMapGroupsWithState` for gap-based sessionization (per-user
  * keyed state, processing-time timeout closes idle sessions). State
  * stores shard by the groupBy key, so both scale horizontally with
  * the key space.
  */
object EventStreams {

  /** Streaming file source over a directory of event parquet files
    * (the file source tails a directory; point it at the drop zone).
    * `ts` has shipped as TIMESTAMP(NANOS) (readable only as raw longs
    * via the legacy conf) or native TIMESTAMP(MICROS) across testdata
    * generations; normalize either to session-TZ timestamps — same
    * convention as `Tables.events`. */
  def readEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    graft.Tables.normalizeEventTs(spark.readStream.schema(schema).parquet(eventsDir))
  }

  /** Watermarked 1h tumbling-window rollup (streaming twin of
    * `Events.hourlyRollup`). Append mode emits a window once the
    * watermark passes its end. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("win.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Incremental raw-zone ingest — the Spark mapping of the
    * reference's daily catch-up batch (SURVEY.md §2.9): a
    * `Trigger.AvailableNow` file-source query over the landing
    * directory. Each invocation processes exactly the files that
    * arrived since the last run (checkpoint-tracked), appends the
    * transformed rows, and terminates — at-least-once becomes
    * exactly-once per file without any DELETE-range bookkeeping.
    * Returns after the run completes. */
  def ingestAvailableNow(spark: SparkSession, landingDir: String, schemaSource: String,
                         outDir: String, checkpointDir: String): Unit = {
    val schema = spark.read.parquet(schemaSource).schema
    val q = spark.readStream.schema(schema).parquet(landingDir)
      .withColumn("day", to_date(col("o_orderdate")))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .queryName("ingest")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming quantile-sketch maintenance — the live half of
    * `Events.quantileSketch`: each micro-batch reduces MAP-SIDE to
    * its per-(event_type, bucket) counts (≤ 64 rows per key per
    * batch) and lands them under a batchId subdirectory with
    * overwrite (the house at-least-once contract). Bucket counts
    * merge by integer ADDITION, so any batching of the same arrivals
    * lands the same merged state — the monitor sums the landed
    * histograms and runs the SAME rank readout as batch, making the
    * live percentiles definitionally the batch percentiles
    * (`StreamingSpec` asserts it). */
  def sketchGate(spark: SparkSession, events: DataFrame,
      outPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Events.sketchBuckets(batch)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .start()

  /** Percentile readout over the landed gate output: merge the
    * per-batch histograms by addition, then the shared rank walk. */
  def sketchMonitor(spark: SparkSession, gateOut: String): DataFrame =
    graft.ops.Events.sketchReadout(
      spark.read.parquet(gateOut)
        .groupBy("event_type", "bucket").agg(sum(col("c")).as("c")))

  /** Streaming exact dedup — the streaming twin of `Dedup.exact` for a
    * live ingest feed: re-deliveries of the same content key are
    * dropped, and `dropDuplicatesWithinWatermark` lets the store evict
    * a key's state once the watermark passes its event time + delay —
    * the at-scale answer to otherwise-unbounded dedup state on an
    * infinite stream (plain `dropDuplicates` state grows forever).
    * The content key is an explicit md5 over the identifying columns,
    * same convention as the batch dedup family. */
  def dedupExact(events: DataFrame): DataFrame =
    events
      .withColumn("h", md5(concat_ws("|",
        col("user_id").cast("string"), col("event_type"), col("props"),
        col("value").cast("string"))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")

  /** Stream-stream interval join — attribute each purchase to the
    * same user's click within the preceding 30 minutes (the funnel /
    * attribution shape). Both sides are watermarked, and the interval
    * condition bounds the join state: a buffered click is evictable
    * once the purchase-side watermark passes click ts + 30 min, so
    * state is O(join-window traffic), not O(stream history) — the
    * stream-stream answer to an ever-growing shuffle-join buffer. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("c_ts"), col("p_ts"), col("value"))
  }

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionId: Long, startTs: Long, lastTs: Long, count: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        start_us: Long, last_us: Long)

  /** Exact microsecond epoch of a Timestamp — `getTime` alone is
    * millis and silently truncates the micros the batch sessionizer
    * compares with (`unix_micros`), which would drift gap decisions
    * and durations at sub-milli boundaries. */
  private def usOf(t: java.sql.Timestamp): Long =
    (t.getTime / 1000) * 1000000 + t.getNanos / 1000

  /** Gap-based sessionization with explicit keyed state — the
    * streaming twin of `Events.sessionize` (>30 min silence starts a
    * new session). Emits a row per event with its session id, the
    * session's start, and the event's time — so a downstream
    * aggregation reconstructs the batch sessionizer's exact
    * (n_events, duration) per session (proven row-identical in
    * `StreamingSpec`).
    *
    * NoTimeout keeps the demo's micro-batch loop finite (a timeout
    * re-arm schedules batches forever under `processAllAvailable`);
    * a production deployment bounding state growth would switch to
    * EventTimeTimeout keyed off the watermark to evict idle users. */
  def sessionize(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = 30L * 60 * 1000000

    def update(user: Long, batch: Iterator[Ev],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue, 0L))
      val out = batch.toSeq.sortBy(e => usOf(e.ts)).map { e =>
        val us = usOf(e.ts)
        st = if (st.lastTs == Long.MinValue || us - st.lastTs > gapUs)
          SessionState(st.sessionId + 1, us, us, 1L)
        else st.copy(lastTs = us, count = st.count + 1)
        SessionOut(user, st.sessionId, st.count, st.startTs, us)
      }
      state.update(st)
      out.iterator
    }

    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  case class EvT(user_id: Long, event_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class Scd2State(version: Long, state: String, validFromUs: Long)
  case class Scd2Change(user_id: Long, version: Long, state: String, valid_from_us: Long)

  /** Streaming SCD2 maintenance — the streaming twin of
    * `Events.scd2`: per-user keyed state carries the OPEN dimension
    * version (state, valid_from, version counter); each event whose
    * `event_type` differs from the open version closes it and emits
    * the new version's change row. Downstream, `valid_to` of version
    * k is by construction `valid_from` of version k+1 — exactly the
    * batch builder's LEAD — so a consumer (or the parity test)
    * reconstructs the full interval table from the change stream.
    * This is how a warehouse keeps an SCD2 dimension CURRENT from a
    * live feed instead of rebuilding history nightly.
    *
    * State is one (version, state, valid_from) triple per user,
    * sharded by the groupBy key. Events inside a micro-batch are
    * ordered by (event time, event_id) — the batch builder's exact
    * tiebreak. NoTimeout for the same finite-micro-batch reason as
    * `sessionize`. */
  def scd2Changes(spark: SparkSession, events: DataFrame): Dataset[Scd2Change] = {
    import spark.implicits._

    def update(user: Long, batch: Iterator[EvT],
               state: GroupState[Scd2State]): Iterator[Scd2Change] = {
      var cur = state.getOption.orNull
      val out = Seq.newBuilder[Scd2Change]
      batch.toSeq.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
        if (cur == null || cur.state != e.event_type) {
          cur = Scd2State(if (cur == null) 1L else cur.version + 1L,
            e.event_type, usOf(e.ts))
          out += Scd2Change(user, cur.version, cur.state, cur.validFromUs)
        }
      }
      if (cur != null) state.update(cur)
      out.result().iterator
    }

    events.select(col("user_id"), col("event_id"), col("ts"), col("event_type")).as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  case class UserTotal(user_id: Long, total: Double, n: Long)

  /** Streaming heavy hitters — the streaming twin of
    * `Events.topUsers`: per-user running purchase totals held in
    * keyed state (`mapGroupsWithState`), emitted on every update so a
    * downstream consumer (or the test) can take the current top-k at
    * any micro-batch boundary. State is one (total, n) pair per user
    * — sharded by the groupBy key like the sessionizer, so the hot
    * path scales with the key space, and the top-k itself stays a
    * bounded downstream aggregation over the update stream, never a
    * global sort inside the stateful operator. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserTotal] = {
    import spark.implicits._
    def update(user: Long, batch: Iterator[Ev],
               state: GroupState[UserTotal]): UserTotal = {
      val st = state.getOption.getOrElse(UserTotal(user, 0.0, 0L))
      val next = batch.foldLeft(st)((s, e) => UserTotal(user, s.total + e.value, s.n + 1))
      state.update(next)
      next
    }
    events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
