package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Noise-resistant work profile per registry query: wall-clock on this
  * box swings ±20-50% with JIT warmth and scheduler jitter, but the
  * WORK a query schedules — job/stage/task counts, summed task time,
  * shuffle bytes, spill — is deterministic for a fixed plan. The
  * optimization round A/Bs against these numbers; a change that cuts
  * summed task time or shuffle bytes without inflating the others is a
  * real win regardless of what the wall clock happened to read.
  *
  *   runMain graft.WorkProfile <sfDir> <outJson> [querySubstr,...]
  *
  * Each query runs TWICE; the second run's profile is recorded (the
  * first absorbs JIT/codegen and, for lifecycle queries, publishes a
  * comparable starting state — both runs do the same work by the
  * lifecycle contract: every run re-inits its tables from scratch).
  */
object WorkProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/workprofile.json")
    val nameFilter: String => Boolean = args.lift(2) match {
      case Some(subs) =>
        val pats = subs.split(",").toSeq
        name => pats.exists(name.contains)
      case None => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val shufR = new AtomicLong; val shufW = new AtomicLong
    val spill = new AtomicLong; val inBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
          inBytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    def snap(): Seq[Long] = Seq(jobs.get.toLong, stages.get.toLong,
      tasks.get.toLong, taskMs.get, shufR.get, shufW.get, spill.get,
      inBytes.get)
    spark.read.parquet(s"$dir/region.parquet").count()

    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => nameFilter(kv._1)).flatMap { case (name, fn) =>
        try {
          fn(spark, dir).count() // warmup + lifecycle precedent
          org.apache.spark.graftbridge.GraftCoreBridge
            .waitListenerBusEmpty(spark.sparkContext)
          val before = snap()
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graftbridge.GraftCoreBridge
            .waitListenerBusEmpty(spark.sparkContext)
          val d = snap().zip(before).map { case (a, b) => a - b }
          println(f"[work] $name%-32s jobs=${d(0)}%4d stages=${d(1)}%4d " +
            f"tasks=${d(2)}%5d taskSec=${d(3) / 1e3}%8.2f " +
            f"shufMB=${(d(4) + d(5)) / 2097152.0}%8.2f wall=$wall%6.2f")
          Some(s"""  "$name": {"jobs":${d(0)},"stages":${d(1)},""" +
            s""""tasks":${d(2)},"task_ms":${d(3)},"shuf_read":${d(4)},""" +
            s""""shuf_write":${d(5)},"spill":${d(6)},"input":${d(7)},""" +
            s""""wall_sec":${f"$wall%.3f"}}""")
        } catch { case e: Throwable =>
          System.err.println(s"[work] $name failed: $e"); None }
      }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      rows.mkString("{\n", ",\n", "\n}\n"))
    spark.stop()
  }
}
