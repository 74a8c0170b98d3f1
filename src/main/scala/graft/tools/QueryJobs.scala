package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch profiler: per-query JOB/STAGE/TASK accounting. For each
  * named query prints wall seconds, job count, stage count, task
  * count, summed executor task time, and the wall ⁄ task-time ratio —
  * the diagnostic that separates overhead-bound rows (many tiny jobs,
  * wall >> parallel task time) from compute-bound ones (guide §1:
  * decide whether the time goes to scheduler/plan overhead or work
  * before optimizing either).
  *
  * Usage: runMain graft.tools.QueryJobs SF_DIR q_a q_b ...
  * (repeat a name for a warm sample; first listed query is warmed once)
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val d = args.head
    val names = args.tail
    val spark = graft.Sessions.localBuilder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val cpuNanos = new AtomicLong(0L)
    val gcMillis = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          cpuNanos.addAndGet(m.executorCpuTime)
          gcMillis.addAndGet(m.jvmGCTime)
        }
      }
    })
    SparkEntry.queries(names.head)(spark, d).count() // warm-up
    Thread.sleep(300) // drain listener bus
    names.foreach { n =>
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
      cpuNanos.set(0L); gcMillis.set(0L)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener catch up before reading
      val tt = taskNanos.get() / 1e9
      val cpu = cpuNanos.get() / 1e9
      val gc = gcMillis.get() / 1e3
      println(f"[jobs] $n%-26s wall ${wall}%6.2f s  jobs ${jobs.get()}%3d  " +
        f"stages ${stages.get()}%3d  tasks ${tasks.get()}%5d  " +
        f"taskTime ${tt}%7.2f s  cpu ${cpu}%7.2f s  gc ${gc}%5.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
