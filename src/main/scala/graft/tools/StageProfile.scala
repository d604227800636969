package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level attribution for named SparkEntry queries — the Spark-UI
  * stage table reduced to what the optimization loop needs, captured
  * through a SparkListener because the bench runs with the UI off.
  * Session confs mirror graft.Bench exactly (same broadcast threshold,
  * same compression posture) so stage shapes match the driver's runs.
  *
  * Per query: min-of-3 wall time (Bench discipline), then for the last
  * rep every stage with its wall ms, task count, input/shuffle-read/
  * shuffle-write bytes, and max/median task ms (skew readout, guide
  * §2.5). NOT part of the driver contract — local tooling.
  * `runMain graft.tools.StageProfile <sfDir> <query> [query...]` */
object StageProfile {
  final case class StageRow(id: Int, name: String, wallMs: Long, tasks: Int,
      inputMB: Double, srMB: Double, swMB: Double,
      taskMaxMs: Long, taskMedMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      // Let AQE re-optimize INSIDE cached plans (default false): the
      // engine's materialize-before-fan-out discipline persists most
      // intermediates, and with the default every shuffle below an
      // InMemoryRelation keeps all 32 tiny partitions — 32-task
      // dispatch on sub-MB stages. Interleaved TailProbe A/B on the
      // persist-heavy subset: ON 10.45/11.36 s vs OFF 11.95/12.85 s.
      // Scale-neutral: AQE sizes partitions from data, and the one
      // partitioning-sensitive consumer (withGlobalRank) pins its
      // range exchange with an explicit N, which AQE never coalesces.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    val stages = mutable.ArrayBuffer.empty[StageRow]
    val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    var collecting = false
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (collecting) {
        taskMs.synchronized {
          taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
            t.taskInfo.duration
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val i = s.stageInfo
          val m = i.taskMetrics
          val ts = taskMs.synchronized {
            taskMs.getOrElse(i.stageId, mutable.ArrayBuffer.empty[Long]).sorted
          }
          stages.synchronized {
            stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n'),
              i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
              i.numTasks,
              m.inputMetrics.bytesRead / 1e6,
              m.shuffleReadMetrics.totalBytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6,
              if (ts.nonEmpty) ts.last else 0L,
              if (ts.nonEmpty) ts(ts.size / 2) else 0L)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // reps 1-2: warm (codegen, artifact builds); rep 3: collected
      val reps = (1 to 3).map { rep =>
        spark.catalog.clearCache()
        if (rep == 3) { stages.clear(); taskMs.clear(); collecting = true }
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch {
          case e: Throwable => println(s"$name FAILED: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep == 3) { Thread.sleep(400); collecting = false }
        dt
      }
      println(f"\n== $name  min ${reps.min}%.3f s  reps ${reps.map(r => f"$r%.3f").mkString(",")}")
      val rows = stages.sortBy(-_.wallMs)
      val stageSum = rows.map(_.wallMs).sum
      println(f"   stage wall sum ${stageSum / 1e3}%.3f s  (gap to rep3 = driver/planning/broadcast-build)")
      rows.take(14).foreach { r =>
        println(f"   [${r.id}%4d] ${r.wallMs}%6d ms  ${r.tasks}%4d tasks  " +
          f"in ${r.inputMB}%8.1f MB  sr ${r.srMB}%8.1f MB  sw ${r.swMB}%8.1f MB  " +
          f"task max/med ${r.taskMaxMs}%5d/${r.taskMedMs}%4d ms  ${r.name.take(60)}")
      }
    }
    spark.stop()
  }
}
