package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQueryListener}

/** RaQL `NOTIFY "name" WITH params` → alerter semantics, Spark-first.
  *
  * The reference sends notification tuples to a dedicated alerter daemon
  * that dedups them into incidents and debounces delivery
  * (`/root/reference/src/RamenAlerter.ml:1-60`). Here the notification
  * stream is just another Dataset; delivery is a `foreachBatch` sink so any
  * transport (HTTP, exec, syslog, Kafka) can be plugged per batch, and the
  * firing/debounce state machine is kept per notification name.
  */
final case class Notification(name: String, firing: Boolean, params: Map[String, String])

object Notify {

  /** Incident tracker with start/stop dedup (a notification only opens an
    * incident when not already firing, and only closes one when firing). */
  final class Alerter {
    private val log = new ConcurrentLinkedQueue[String]()
    private var firing = Set.empty[String]

    def deliver(n: Notification): Unit = synchronized {
      if (n.firing && !firing.contains(n.name)) {
        firing += n.name
        log.add(s"START ${n.name}")
      } else if (!n.firing && firing.contains(n.name)) {
        firing -= n.name
        log.add(s"STOP ${n.name}")
      } // else: duplicate — debounced
    }

    def incidents: Seq[String] = log.asScala.toSeq
    def currentlyFiring: Set[String] = synchronized(firing)
  }

  /** Attach an alerter to a notification stream. */
  def sink(ds: Dataset[Notification], alerter: Alerter): DataStreamWriter[Notification] =
    ds.writeStream.foreachBatch { (batch: Dataset[Notification], _: Long) =>
      batch.collect().foreach(alerter.deliver)
    }

  /** `LISTEN FOR INSTRUMENTATION FROM *` — the reference republishes
    * per-worker runtime stats as a stream (`src/runtime_stats.type`).
    * Spark equivalent: a StreamingQueryListener capturing per-batch
    * progress (rows/sec, batch duration, state size). */
  final class InstrumentationListener extends StreamingQueryListener {
    val progress = new ConcurrentLinkedQueue[(String, Double, Long)]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      progress.add((e.progress.name,
        e.progress.processedRowsPerSecond,
        e.progress.numInputRows))
    def snapshot: Seq[(String, Double, Long)] = progress.asScala.toSeq
  }
}
