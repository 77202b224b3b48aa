package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQueryListener}

/** RaQL `NOTIFY "name" WITH params` → alerter semantics, Spark-first.
  *
  * The reference sends notification tuples to a dedicated alerter daemon
  * (`/root/reference/src/RamenAlerter.ml`) that assigns each to a team,
  * dedups start/stop into incidents, debounces delivery, and sends
  * messages through the team's contacts with `${…}` templating
  * ([[StringExpansion]], the reference's RamenStringExpansion). Here the
  * notification stream is just another Dataset; delivery is a
  * `foreachBatch` sink, and the incident/debounce state machine lives in
  * [[Notify.Alerter]] with an injectable clock so tests drive time.
  */
final case class Notification(
    name: String,
    firing: Boolean,
    params: Map[String, String],
    site: String = "",
    worker: String = "",
    test: Boolean = false,
    sentTime: Double = 0.0,
    eventTime: Option[Double] = None,
    certainty: Double = 1.0,
    debounce: Double = 10.0, // alerting_notification.type's default
    timeout: Double = 0.0) {
  /** The reference's notif_time: event time if set, else sent time. */
  def time: Double = eventTime.getOrElse(sentTime)
}

/** A team contact (`alerting_contact.type`). The reference also ships a
  * Kafka contact; no broker exists in this environment — `Exec` reaches
  * the kafka CLI, and the delivery layer is where a direct producer
  * would plug in. */
sealed trait Contact
object Contact {
  /** Drop the message (the reference's `Ignore`). */
  case object Ignore extends Contact
  /** Run a shell command built from the template (`Exec`). */
  final case class Exec(cmd: String) extends Contact
  /** Log a line built from the template (`SysLog`; the sink function is
    * injected — no syslog daemon in this environment). */
  final case class SysLog(template: String) extends Contact
  /** Insert a row per message; on insert failure with a non-empty
    * `create`, create the table and retry (`sqllite_insert`,
    * RamenAlerter.ml:594-616). Delivered through the `sqlite3` CLI —
    * no embedded driver ships with this build; template nulls render
    * as SQL `NULL` (the reference expands the insert with `~n:"NULL"`). */
  final case class Sqlite(file: String, insert: String,
      create: String = "") extends Contact
}

object Notify {

  /** The reference's alerter core: team assignment by longest name
    * prefix (`find_in_charge`, RamenAlerter.ml:182-215), incident
    * start/stop dedup, debounced delivery (a start cancelled by a stop
    * inside the debounce window sends nothing), per-contact `${…}`
    * message expansion over the reference's dict
    * (RamenAlerter.ml:723-760), and timed-out stops for notifications
    * carrying a timeout.
    *
    * Time is LOGICAL: `deliver` stamps receipt with the notification's
    * own time (falling back to the injected clock) and nothing sends
    * until `flush(at)` — callers decide the cadence (the streaming sink
    * flushes each batch with the batch's max time). */
  final class Alerter(
      teams: Map[String, Seq[Contact]] = Map.empty,
      defaultTeam: String = "default",
      execRunner: String => Int = Alerter.shellRun,
      syslog: String => Unit = _ => (),
      clock: () => Double = () => System.currentTimeMillis() / 1000.0,
      sqlite3: String = "sqlite3",
      maxJournal: Int = 10000) {

    // bounded like the reference's max_last_incidents_kept — a
    // long-running alerter must not grow its journal without bound
    private val log = new ConcurrentLinkedQueue[String]()
    private def journal(s: String): Unit = {
      log.add(s)
      while (log.size > maxJournal) log.poll()
    }
    private var firing = Set.empty[String]

    private final class Incident(val id: Long, val team: String,
        val start: Notification) {
      var stop: Option[Notification] = None
      var pending: Option[Boolean] = None // Some(firing) awaiting delivery
      var due = 0.0
      var startSent = false
      var firstSent: Option[Double] = None
      var lastSent: Option[Double] = None
      var lastStateChange: Notification = start
    }

    private var nextId = 0L
    private val open = scala.collection.mutable.Map.empty[String, Incident]

    /** Longest team name that prefixes the notification name; else the
      * default team; else (no teams configured) None — state is still
      * tracked, nothing is delivered. */
    private def findInCharge(name: String): Option[String] =
      teams.keys.filter(name.startsWith).maxByOption(_.length)
        .orElse(if (teams.contains(defaultTeam)) Some(defaultTeam)
          else teams.keys.minOption)

    def deliver(n0: Notification): Unit = synchronized {
      val n = if (n0.sentTime > 0) n0 else n0.copy(sentTime = clock())
      noteTime(n.time)
      if (n.firing && !firing.contains(n.name)) {
        firing += n.name
        journal(s"START ${n.name}")
        // a previous incident whose STOP is still pending delivery: the
        // stop logically precedes this start — send it now rather than
        // dropping it with the overwritten entry
        open.get(n.name).foreach { prev =>
          if (prev.pending.contains(false)) send(prev, firing = false, n.time)
          open.remove(n.name)
        }
        nextId += 1
        val inc = new Incident(nextId, findInCharge(n.name).getOrElse(""), n)
        inc.pending = Some(true)
        inc.due = n.time + math.max(0.0, n.debounce)
        open(n.name) = inc
      } else if (!n.firing && firing.contains(n.name)) {
        firing -= n.name
        journal(s"STOP ${n.name}")
        open.get(n.name).foreach { inc =>
          inc.lastStateChange = n
          inc.stop = Some(n)
          if (!inc.startSent) {
            // flap inside the debounce window: nothing was sent, nothing
            // will be (the reference cancels a StartToBeSent incident)
            journal(s"CANCEL ${n.name}")
            open.remove(n.name)
          } else {
            inc.pending = Some(false)
            inc.due = n.time + math.max(0.0, n.debounce)
          }
        }
      } // else: duplicate — debounced
    }

    /** Send every due pending message and synthesize timed-out stops
      * (notifications carrying `timeout` whose stop never arrived). */
    def flush(at: Double): Unit = synchronized {
      // timeouts first so they can cancel/schedule at this same flush
      open.values.toSeq.foreach { inc =>
        if (inc.start.timeout > 0 && inc.stop.isEmpty &&
            firing.contains(inc.start.name) &&
            at >= inc.start.time + inc.start.timeout) {
          firing -= inc.start.name
          journal(s"STOP ${inc.start.name} (timeout)")
          if (!inc.startSent) { journal(s"CANCEL ${inc.start.name}"); open.remove(inc.start.name) }
          else { inc.pending = Some(false); inc.due = at }
        }
      }
      open.values.toSeq.sortBy(_.id).foreach { inc =>
        inc.pending match {
          case Some(f) if at >= inc.due =>
            send(inc, f, at)
            inc.pending = None
            if (f) inc.startSent = true
            else open.remove(inc.start.name)
          case _ => ()
        }
      }
    }

    def deliverNow(n: Notification): Unit = {
      deliver(n)
      flush(if (n.time > 0) n.time else clock())
    }

    /** The alerter's clock — what `deliver` stamps un-timed notifications
      * with; exposed so sinks can flush against the same time base. */
    def nowTime(): Double = clock()

    /** The reference's expansion dict (RamenAlerter.ml:723-760):
      * builtins first, notification parameters override them. */
    private def dictFor(inc: Incident, firing: Boolean, at: Double)
        : Seq[(String, String)] = {
      import StringExpansion.niceFloat
      val builtins = Seq(
        "name" -> inc.start.name,
        "incident_id" -> inc.id.toString,
        "start" -> niceFloat(inc.start.time),
        "now" -> niceFloat(at),
        "first_sent" -> niceFloat(inc.firstSent.getOrElse(at)),
        "last_sent" -> niceFloat(inc.lastSent.getOrElse(at)),
        "site" -> inc.start.site,
        "worker" -> inc.start.worker,
        "test" -> inc.start.test.toString,
        "firing" -> firing.toString,
        "last_state_change" -> niceFloat(inc.lastStateChange.time),
        "certainty" -> niceFloat(inc.start.certainty),
        "hostname" -> sys.env.getOrElse("HOSTNAME", "?HOSTNAME?")) ++
        inc.stop.map(s => "stop" -> niceFloat(s.time)) ++
        (if (firing) Nil
         else Seq("timed-out" -> inc.stop.isEmpty.toString))
      val params = if (firing) inc.start.params
        else inc.stop.map(_.params).getOrElse(inc.start.params)
      // parameters overwrite builtins: later bindings must win, and
      // substDict takes the FIRST match — so params go first
      params.toSeq ++ builtins
    }

    private def send(inc: Incident, firing: Boolean, at: Double): Unit = {
      val dict = dictFor(inc, firing, at)
      if (inc.firstSent.isEmpty) inc.firstSent = Some(at)
      inc.lastSent = Some(at)
      teams.getOrElse(inc.team, Nil).foreach { c =>
        val what = if (firing) "START" else "STOP"
        def exp(t: String, n: Option[String] = None) =
          StringExpansion.substDict(dict, t, n)
        // a contact that cannot deliver (unspawnable command, throwing
        // sink) must not kill the whole notification stream — the
        // reference counts the failure and moves on
        try c match {
          case Contact.Ignore => ()
          case Contact.Exec(cmd) =>
            val code = execRunner(exp(cmd))
            journal(if (code == 0) s"SENT $what ${inc.start.name} via exec"
              else s"FAILED $what ${inc.start.name} via exec ($code)")
          case Contact.SysLog(t) =>
            syslog(exp(t))
            journal(s"SENT $what ${inc.start.name} via syslog")
          case Contact.Sqlite(file, insert, create) =>
            import StringExpansion.shellQuote
            val f = exp(file)
            def run(q: String): Int =
              execRunner(s"${shellQuote(sqlite3)} ${shellQuote(f)} ${shellQuote(q)}")
            val ins = exp(insert, Some("NULL"))
            // insert; on failure with a create statement, create the table
            // (VERBATIM, like the reference — no template expansion in
            // DDL) and retry once. A failing create (e.g. table already
            // exists under a constraint violation) reports the ORIGINAL
            // insert failure, not the create's.
            val first = run(ins)
            val code =
              if (first == 0) 0
              else if (create.nonEmpty && run(create) == 0) run(ins)
              else first
            journal(if (code == 0) s"SENT $what ${inc.start.name} via sqlite"
              else s"FAILED $what ${inc.start.name} via sqlite ($code)")
        } catch {
          case e: Exception =>
            journal(s"FAILED $what ${inc.start.name}: ${e.getMessage}")
        }
      }
    }

    def incidents: Seq[String] = log.asScala.toSeq
    def currentlyFiring: Set[String] = synchronized(firing)

    // logical-time high-water mark and the wall instant it was seen at,
    // so the heartbeat can EXTRAPOLATE logical time instead of jumping to
    // wall time (which would instantly expire every event-time debounce
    // window and timeout when replaying archived notification streams)
    private var maxSeen = 0.0
    private var wallAtMax = 0.0
    private def noteTime(t: Double): Unit =
      if (t > maxSeen) { maxSeen = t; wallAtMax = clock() }

    /** Where the heartbeat flushes: the last seen logical time advanced
      * by the wall time elapsed since — wall-equivalent for live streams,
      * replay-safe for archived ones. */
    private def heartbeatAt(): Double = synchronized {
      if (maxSeen <= 0) clock() else maxSeen + math.max(0.0, clock() - wallAtMax)
    }

    /** Periodic self-flush — without it, debounced sends and timeout
      * stops only progress when a new batch arrives (the reference's
      * alerter loop wakes on its own schedule). Daemon thread; start is
      * idempotent while one is alive (and restartable after one dies);
      * [[stopHeartbeat]] interrupts it. */
    private val heartLock = new Object
    private var heart: Thread = null
    def startHeartbeat(intervalMillis: Long = 1000L): this.type =
      heartLock.synchronized {
        if (heart == null || !heart.isAlive) {
          val t = new Thread(() => {
            try {
              while (!Thread.currentThread().isInterrupted) {
                try flush(heartbeatAt())
                catch {
                  case _: InterruptedException =>
                    Thread.currentThread().interrupt()
                  case e: Exception =>
                    journal(s"FAILED heartbeat flush: ${e.getMessage}")
                }
                Thread.sleep(intervalMillis)
              }
            } catch { case _: InterruptedException => () }
          }, "graft-alerter-heartbeat")
          t.setDaemon(true)
          t.start()
          heart = t
        }
        this
      }
    def stopHeartbeat(): Unit = heartLock.synchronized {
      if (heart != null) { heart.interrupt(); heart = null }
    }
  }

  object Alerter {
    /** The reference's Exec contact runs a shell command
      * (`execute_cmd`, RamenAlerter.ml:569-582). */
    def shellRun(cmd: String): Int =
      new ProcessBuilder("sh", "-c", cmd).inheritIO().start().waitFor()
  }

  /** The reference's `normalize_notif_parameters`
    * (`RingBufLib.ml:460-503`): firing/certainty/debounce/timeout travel
    * as ORDINARY notification parameters (case-insensitive names) and are
    * pulled out alerter-side, defaulting to (true, 0.5, 0, 0); a value
    * that doesn't convert stays a plain parameter. */
  def normalizeParams(params: Seq[(String, String)])
      : (Boolean, Double, Double, Double, Seq[(String, String)]) = {
    var firing = true
    var certainty = 0.5
    var debounce = 0.0
    var timeout = 0.0
    val rest = params.filter { case (n, v) =>
      val t = v.trim.toLowerCase
      n.toLowerCase match {
        case "firing" if Set("true", "t", "1")(t) => firing = true; false
        case "firing" if Set("false", "f", "0")(t) => firing = false; false
        case "certainty" if t.toDoubleOption.isDefined =>
          certainty = t.toDouble; false
        case "debounce" if t.toDoubleOption.isDefined =>
          debounce = t.toDouble; false
        case "timeout" if t.toDoubleOption.isDefined =>
          timeout = t.toDouble; false
        case _ => true // unconvertible specials stay plain parameters
      }
    }
    (firing, certainty, debounce, timeout, rest)
  }

  /** A [[Notification]] from a compiled `NOTIFY` row's (name, params),
    * with the special parameters normalized out. */
  def notification(name: String, params: Map[String, String],
      worker: String = "", sentTime: Double = 0.0,
      eventTime: Option[Double] = None): Notification = {
    val (firing, certainty, debounce, timeout, rest) =
      normalizeParams(params.toSeq)
    Notification(name, firing, rest.toMap, worker = worker,
      sentTime = sentTime, eventTime = eventTime, certainty = certainty,
      debounce = debounce, timeout = timeout)
  }

  /** Attach an alerter to a notification stream: deliver each batch, then
    * flush at the batch's latest notification time (wall clock when the
    * batch carries no times). */
  def sink(ds: Dataset[Notification], alerter: Alerter): DataStreamWriter[Notification] =
    ds.writeStream.foreachBatch { (batch: Dataset[Notification], _: Long) =>
      val ns = batch.collect()
      ns.foreach(alerter.deliver)
      // un-timed notifications (time 0) were stamped with the alerter's
      // clock inside deliver — flush on the same time base, or their
      // debounce deadlines (clock + d) would never come due
      val at = ns.map(_.time).filter(_ > 0).maxOption
        .getOrElse(alerter.nowTime())
      alerter.flush(at)
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
