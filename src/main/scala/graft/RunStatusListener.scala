package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler._

/** Aggregated run progress as seen by [[RunStatusListener]]. */
final case class RunStatus(
    jobsStarted: Long, jobsSucceeded: Long, jobsFailed: Long,
    stagesCompleted: Long, tasksCompleted: Long) {
  def state: String =
    if (jobsFailed > 0) "FAILED"
    else if (jobsStarted > jobsSucceeded) "RUNNING"
    else "COMPLETED"
}

/** Run-status hook — the public replacement for the reference's Spark
  * listener (util/CustomSparkListener.scala:17-75, which POSTs
  * RUNNING/COMPLETED to a fixed HTTP endpoint; dropped as proprietary —
  * SURVEY §2.11). Progress is tracked from the scheduler bus and every
  * transition is handed to `onUpdate`; the transport (HTTP, log line,
  * metrics system) is the caller's choice, and the default is a no-op so
  * registering the listener never adds I/O to the job path.
  *
  * Register with `spark.sparkContext.addSparkListener(new RunStatusListener(...))`.
  */
final class RunStatusListener(onUpdate: RunStatus => Unit = _ => ())
    extends SparkListener {

  private val started = new AtomicLong
  private val succeeded = new AtomicLong
  private val failed = new AtomicLong
  private val stages = new AtomicLong
  private val tasks = new AtomicLong

  def status: RunStatus =
    RunStatus(started.get, succeeded.get, failed.get, stages.get, tasks.get)

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    started.incrementAndGet()
    onUpdate(status)
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit = {
    e.jobResult match {
      case JobSucceeded => succeeded.incrementAndGet()
      case _ => failed.incrementAndGet()
    }
    onUpdate(status)
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    onUpdate(status)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasks.incrementAndGet()
    // no onUpdate per task: task counts surface on the next job/stage
    // transition, keeping callback frequency bounded by stages, not tasks
  }
}
