package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Contact, Notification, Notify, StringExpansion}

/** The reference alerter's template engine and incident machine:
  * RamenStringExpansion.ml's own doctests, and notifications.feature's
  * flow (team contact config → NOTIFY → templated delivery) driven with
  * a logical clock. */
class AlerterSpec extends AnyFunSuite {

  import StringExpansion.substDict

  private def sd(dict: (String, String)*)(text: String,
      nullStr: String = null): String =
    substDict(dict.toSeq, text, Option(nullStr))

  test("subst_dict doctests (RamenStringExpansion.ml:156-203)") {
    assert(sd("glop" -> "pas")("glop ${glop|shell} glop") == "glop 'pas' glop")
    assert(sd("glop" -> "pas")("${glop}") == "pas")
    assert(sd("glop" -> "pas")("${gloup}", "?") == "?")
    assert(sd("glop" -> "pas")("${gloup|trim}", "?") == "?")
    assert(sd("glop" -> "pas")("${gloup|json-dict}", "null") ==
      """{"gloup":null}""")
    assert(sd("glop" -> "pas")("${gloup,glop|json-dict}", "null") ==
      """{"gloup":null,"glop":"pas"}""")
    assert(sd("f" -> "123.456")("${f|int}") == "123")
    assert(sd("t" -> "1575039473.9")("${t|int|date}").take(10) == "2019-11-29")
    assert(sd("f" -> "1")("${f|?glop:pas glop}") == "glop")
    assert(sd("f" -> "0")("${f|?glop:pas glop}") == "pas glop")
    assert(sd("f" -> "")("${f|?glop:pas glop}") == "pas glop")
    assert(sd("f" -> " \tglop  ")("${f|trim}") == "glop")
    assert(sd("a" -> "1", "b" -> "2")("${a,b|json-dict}") ==
      """{"a":"1","b":"2"}""")
    assert(sd("a" -> "1", "b" -> "2")("${*|json-dict}") ==
      """{"a":"1","b":"2"}""")
    assert(sd("a" -> " pas ", "b" -> " \tglop ")("${a,b|trim|json-dict}") ==
      """{"a":"pas","b":"glop"}""")
    assert(sd("a" -> "1.2", "b" -> "2.4")("${a,b}") == "1.2,2.4")
    assert(sd("a" -> "1.2", "b" -> "2.4")("${a,b|int}") == "1,2")
    assert(sd("f" -> ".25")("${f|percent}") == "25")
    assert(sd("a" -> "1")("${b|int}", "?") == "?")
    assert(sd("a" -> "1")("${b|int|?set:unset}", "?") == "unset")
    assert(sd("a" -> "6")("${a|*=7|int}") == "42")
    assert(sd("a" -> "50", "b" -> "8")("${a,b|diff|int}") == "42")
    assert(sd("a" -> "40", "b" -> "2")("${a,b|sum|int}") == "42")
    assert(sd()("${42}") == "42")
    assert(sd()("${42|int}") == "42")
    assert(sd()("${ 42 |int}") == "42")
    assert(sd()("${42.1|round}") == "42")
    assert(sd()("${41.9|round}") == "42")
    assert(sd()("${41.5|ceil}") == "42")
    assert(sd()("${42.9|floor}") == "42")
    assert(sd("a" -> "21")("${a,21|sum|int}") == "42")
    // nested expansion resolves innermost-first to a fixpoint
    assert(sd("a" -> "21")("${a,${a}|sum|int}") == "42")
    assert(sd("a" -> "glop")("${a|?${a}:pas glop}") == "glop")
    assert(sd("a" -> "glop")("${a|?${a}:pas glop|shell}") == "'glop'")
    assert(sd()("${a|?${a}:pas glop}") == "pas glop")
    // sql/json escaping (nice_string_of_float/json_quote doctests)
    assert(sd("t" -> "o'uch")("${t|sql}") == "'o''uch'")
    assert(sd("t" -> "foo\"bar")("${t|json}") == "\"foo\\\"bar\"")
    assert(StringExpansion.niceFloat(1.234) == "1.234")
    assert(StringExpansion.niceFloat(1.001) == "1.001")
    assert(StringExpansion.niceFloat(1.0) == "1")
    assert(StringExpansion.niceFloat(31536000.0) == "31536000")
    assert(StringExpansion.niceFloat(0.0) == "0")
  }

  private def mkAlerter(sent: scala.collection.mutable.Buffer[String],
      teams: Map[String, Seq[Contact]]) =
    new Notify.Alerter(teams = teams,
      execRunner = cmd => { sent += cmd; 0 },
      clock = () => 1000.0)

  test("team assignment by longest prefix; templated exec delivery") {
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = mkAlerter(sent, Map(
      "default" -> Seq(Contact.Exec("default ${name}")),
      "net" -> Seq(Contact.Exec("net ${name}")),
      "net/edge" -> Seq(Contact.Exec(
        "insert ${incident_id} ${name|sql} ${text|sql}"))))
    // notifications.feature's canonical flow: NOTIFY with a text param,
    // delivered through the team's contact with |sql quoting
    a.deliver(Notification("net/edge down", firing = true,
      Map("text" -> "o'uch"), sentTime = 100.0, debounce = 0.1))
    a.flush(100.05)
    assert(sent.isEmpty, "delivered before the debounce elapsed")
    a.flush(100.2)
    assert(sent == Seq("insert 1 'net/edge down' 'o''uch'"), sent)
    // an unrelated name falls back to the default team
    a.deliver(Notification("disk full", firing = true, Map.empty,
      sentTime = 200.0, debounce = 0.0))
    a.flush(200.0)
    assert(sent.last == "default disk full")
    // "net something" prefers the shorter prefix team over default
    a.deliver(Notification("net misc", firing = true, Map.empty,
      sentTime = 300.0, debounce = 0.0))
    a.flush(300.0)
    assert(sent.last == "net net misc")
  }

  test("a stop inside the debounce window cancels the start (flap)") {
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = mkAlerter(sent,
      Map("default" -> Seq(Contact.Exec("${name}:${firing}"))))
    a.deliver(Notification("flappy", firing = true, Map.empty,
      sentTime = 10.0, debounce = 5.0))
    a.deliver(Notification("flappy", firing = false, Map.empty,
      sentTime = 12.0, debounce = 5.0))
    a.flush(100.0)
    assert(sent.isEmpty, s"flap leaked a delivery: $sent")
    assert(a.incidents.contains("CANCEL flappy"))
    // a stable alert delivers both transitions, with firing in the dict
    a.deliver(Notification("stable", firing = true, Map.empty,
      sentTime = 20.0, debounce = 1.0))
    a.flush(21.0)
    a.deliver(Notification("stable", firing = false, Map.empty,
      sentTime = 50.0, debounce = 1.0))
    a.flush(51.0)
    assert(sent == Seq("stable:true", "stable:false"), sent)
  }

  test("a notification with a timeout stops by itself") {
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = mkAlerter(sent,
      Map("default" -> Seq(Contact.Exec("${name} ${firing} ${timed-out}"))))
    a.deliver(Notification("volatile", firing = true, Map.empty,
      sentTime = 10.0, debounce = 0.0, timeout = 30.0))
    a.flush(10.0)
    assert(sent == Seq("volatile true ??timed-out??"))
    a.flush(39.0) // not yet
    assert(a.currentlyFiring == Set("volatile"))
    a.flush(41.0)
    assert(a.currentlyFiring.isEmpty)
    assert(a.incidents.contains("STOP volatile (timeout)"))
    assert(sent.last == "volatile false true", sent.last)
  }

  test("special parameters normalize out of the wire params (RingBufLib)") {
    val (firing, certainty, debounce, timeout, rest) = Notify.normalizeParams(
      Seq("FIRING" -> "f", "Certainty" -> " 0.9 ", "debounce" -> "2.5",
        "timeout" -> "60", "text" -> "ouch", "certaintyX" -> "junk"))
    assert(!firing && certainty == 0.9 && debounce == 2.5 && timeout == 60.0)
    assert(rest == Seq("text" -> "ouch", "certaintyX" -> "junk"))
    // defaults (the reference's normalized defaults, not the notif type's)
    assert(Notify.normalizeParams(Nil) == (true, 0.5, 0.0, 0.0, Nil))
    // an unconvertible special stays a plain parameter
    val (_, c2, _, _, rest2) =
      Notify.normalizeParams(Seq("certainty" -> "high"))
    assert(c2 == 0.5 && rest2 == Seq("certainty" -> "high"))
    val n = Notify.notification("alert", Map("firing" -> "0", "k" -> "v"))
    assert(!n.firing && n.params == Map("k" -> "v"))
  }

  test("data-controlled templates terminate; un-timed notifications deliver") {
    // a param value referencing itself must not hang the fixpoint loop
    val r = substDict(Seq("text" -> "x${text}"), "${text}")
    assert(r.startsWith("x"), r) // bounded passes, no hang
    assert(substDict(Seq("a" -> "${b}", "b" -> "${a}"), "${a}").nonEmpty)
    // an un-timed notification (sentTime 0) is stamped with the alerter's
    // clock — deliverNow/sink must flush on that same base
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = mkAlerter(sent, Map("default" -> Seq(Contact.Exec("${name}"))))
    a.deliverNow(Notification("untimed", firing = true, Map.empty,
      debounce = 0.0))
    assert(sent == Seq("untimed"), sent)
  }

  test("a throwing contact does not kill delivery to the others") {
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(
        Contact.SysLog("${name}"), Contact.Exec("${name}"))),
      execRunner = cmd => { sent += cmd; 0 },
      syslog = _ => throw new RuntimeException("syslog daemon down"),
      clock = () => 1000.0)
    a.deliverNow(Notification("alert", firing = true, Map.empty,
      sentTime = 1.0, debounce = 0.0))
    assert(sent == Seq("alert"), sent) // exec delivered despite syslog
    assert(a.incidents.exists(_.startsWith("FAILED START alert")))
  }

  test("a new start while a stop is pending delivers the stop first") {
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = mkAlerter(sent, Map("default" -> Seq(Contact.Exec("${name}:${firing}"))))
    a.deliver(Notification("bouncy", firing = true, Map.empty,
      sentTime = 10.0, debounce = 1.0))
    a.flush(11.0) // start sent
    a.deliver(Notification("bouncy", firing = false, Map.empty,
      sentTime = 20.0, debounce = 5.0)) // stop pending until 25
    a.deliver(Notification("bouncy", firing = true, Map.empty,
      sentTime = 22.0, debounce = 1.0)) // new incident before the stop sent
    a.flush(30.0)
    assert(sent == Seq("bouncy:true", "bouncy:false", "bouncy:true"), sent)
  }

  test("heartbeat fires timeout stops on a quiet stream") {
    val sent = scala.collection.mutable.Buffer.empty[String]
    @volatile var now = 100.0
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Exec("${name}:${firing}"))),
      execRunner = cmd => { sent.synchronized(sent += cmd); 0 },
      clock = () => now)
    a.startHeartbeat(intervalMillis = 20L)
    try {
      a.deliver(Notification("quiet", firing = true, Map.empty,
        sentTime = 100.0, debounce = 0.0, timeout = 50.0))
      val deadline = System.currentTimeMillis() + 5000
      while (sent.synchronized(sent.isEmpty) &&
          System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(sent.synchronized(sent.headOption).contains("quiet:true"))
      now = 200.0 // past the 50 s timeout; NO deliver/flush call follows
      while (sent.synchronized(sent.size) < 2 &&
          System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(sent.synchronized(sent.lastOption).contains("quiet:false"), sent)
      assert(a.incidents.contains("STOP quiet (timeout)"))
    } finally a.stopHeartbeat()
  }

  test("sqlite contact: notifications.feature's canonical flow") {
    // the feature's to-sql contact: create-on-first-insert, ${...|sql}
    // quoting, then the same verification query against the db
    val sqlite3 = (sys.env.get("PATH").toSeq.flatMap(_.split(":"))
      .map(_ + "/sqlite3") ++
      Seq("/root/miniconda/bin/sqlite3", "/usr/bin/sqlite3"))
      .find(p => new java.io.File(p).canExecute)
    assume(sqlite3.isDefined, "no sqlite3 binary in this environment")
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite")
    val db = s"$dir/alerts.db"
    try {
      val a = new Notify.Alerter(
        sqlite3 = sqlite3.get,
        teams = Map("test" -> Seq(Contact.Sqlite(db,
          insert = """insert into "alerts" ("incident_id", "name", "text")
            values (${incident_id}, ${name|sql}, ${text|sql});""",
          create = """create table "alerts" (
              "incident_id" integer not null,
              "name" text not null,
              "text" text not null);"""))),
        clock = () => 42.0)
      a.deliverNow(Notification("test", firing = true,
        Map("text" -> "ouch"), sentTime = 7.0, debounce = 0.1))
      a.flush(8.0)
      // the feature's check: SELECT "text" FROM "alerts" WHERE name="test"
      val out = new ProcessBuilder(sqlite3.get, db,
        """SELECT "text" FROM "alerts" WHERE name='test'""")
        .start()
      val got = new String(out.getInputStream.readAllBytes(), "UTF-8").trim
      out.waitFor()
      assert(got == "ouch", got)
      assert(a.incidents.exists(_.startsWith("SENT START test via sqlite")))
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("exec contact really runs a shell command (feature's file check)") {
    val f = java.nio.file.Files.createTempFile("graft_alert", ".log")
    try {
      val a = new Notify.Alerter(
        teams = Map("default" -> Seq(Contact.Exec(
          "echo ${name|shell}:${text|shell} >> " + f))),
        clock = () => 42.0)
      a.deliverNow(Notification("test", firing = true,
        Map("text" -> "ouch"), sentTime = 5.0, debounce = 0.0))
      val got = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      assert(got == "test:ouch\n", got)
    } finally java.nio.file.Files.delete(f)
  }

  test("kafka contact: exact producer record (RamenAlerter.ml:618-664,772-774)") {
    // the reference expands the text with nulls rendered "null" and
    // produces (topic, partition, text) — no message key
    val produced = scala.collection.mutable.Buffer
      .empty[(Seq[(String, String)], String, Int, String)]
    val opts = Seq("metadata.broker.list" -> "k1:9092,k2:9092",
      "topic.message.timeout.ms" -> "5000", "compression.codec" -> "lz4")
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Kafka(opts, "alerts", 3,
        """{"name":${name|json},"text":${text|json},"missing":${nope}}"""))),
      kafkaSend = (o, t, p, v) => produced += ((o, t, p, v)),
      clock = () => 1000.0)
    a.deliverNow(Notification("kk", firing = true, Map("text" -> "o\"uch"),
      sentTime = 7.0, debounce = 0.0))
    assert(produced.size == 1)
    val (o, topic, part, payload) = produced.head
    assert(o == opts && topic == "alerts" && part == 3)
    assert(payload == """{"name":"kk","text":"o\"uch","missing":null}""",
      payload)
    assert(a.incidents.exists(_.startsWith("SENT START kk via kafka")))
    // option partition: `topic.`-prefixed configs go to the topic handle,
    // the rest to the producer (get_or_create_kafka_producer)
    val (topicOpts, prodOpts) = Notify.kafkaOptionSplit(opts)
    assert(topicOpts == Seq("topic.message.timeout.ms" -> "5000"))
    assert(prodOpts == Seq("metadata.broker.list" -> "k1:9092,k2:9092",
      "compression.codec" -> "lz4"))
    // no client in this build: the default callback refuses and the
    // failure is journaled without killing delivery
    val b = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Kafka(Nil, "t", 0, "x"))),
      clock = () => 1000.0)
    b.deliverNow(Notification("nk", firing = true, Map.empty,
      sentTime = 7.0, debounce = 0.0))
    assert(b.incidents.exists(_.startsWith("FAILED START nk")))
  }

  test("negative debounce uses the configured default delay (debounce_delay_for)") {
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Exec("${name}"))),
      execRunner = cmd => { sent += cmd; 0 },
      clock = () => 1000.0, defaultDebounce = 10.0)
    a.deliver(Notification("neg", firing = true, Map.empty,
      sentTime = 100.0, debounce = -1.0))
    a.flush(105.0) // a clamp-to-zero would have sent already
    assert(sent.isEmpty, s"negative debounce did not borrow the default: $sent")
    a.flush(110.5)
    assert(sent == Seq("neg"))
    // and the wire default is 0 (normalize_notif_parameters): no debounce
    // parameter ⇒ send at the next flush
    assert(Notify.notification("d", Map("text" -> "x")).debounce == 0.0)
  }

  test("a hung contact cannot block the alerter state machine (r11 advice)") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val sent = scala.collection.mutable.Buffer.empty[String]
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Exec("${name}"))),
      execRunner = cmd => {
        sent.synchronized { sent += cmd }
        entered.countDown()
        gate.await() // a wedged sendmail
        0
      },
      clock = () => 1000.0)
    a.deliver(Notification("slow", firing = true, Map.empty,
      sentTime = 10.0, debounce = 0.0))
    val flusher = new Thread(() => a.flush(10.0))
    flusher.start()
    assert(entered.await(5, java.util.concurrent.TimeUnit.SECONDS))
    // contact I/O is in flight and stuck — deliver/flush BOOKKEEPING and
    // reads must not wait on it (they used to share the monitor)
    val t0 = System.nanoTime()
    a.deliver(Notification("other", firing = true, Map.empty,
      sentTime = 11.0, debounce = 60.0))
    assert(a.currentlyFiring == Set("slow", "other"))
    assert((System.nanoTime() - t0) / 1e9 < 2.0,
      "deliver blocked behind a hung contact")
    gate.countDown()
    flusher.join(5000)
    assert(sent.synchronized(sent.toSeq) == Seq("slow"))
  }

  test("deliver with a NON-EMPTY outbox skips a held dispatch lock (r12 advice)") {
    // the r12 hung-contact spec only exercised the empty-outbox fast
    // path; here a second delivery is ENQUEUED while the drainer is
    // stuck inside a contact, and a third deliver (non-empty outbox, lock
    // held) must still return promptly — tryLock, not a monitor wait
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val sent = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Exec("${name}"))),
      execRunner = cmd => {
        sent.add(cmd)
        if (sent.size == 1) { entered.countDown(); gate.await() }
        0
      },
      clock = () => 1000.0)
    a.deliver(Notification("slow", firing = true, Map.empty,
      sentTime = 10.0, debounce = 0.0))
    val flusher = new Thread(() => a.flush(10.0)) // dispatches, wedges in gate
    flusher.start()
    assert(entered.await(5, java.util.concurrent.TimeUnit.SECONDS))
    // a second due notification, then a flush on another thread: its
    // flushLocked ENQUEUES the delivery (outbox now non-empty) and its
    // drainOutbox(wait=true) parks behind the wedged drainer
    a.deliver(Notification("second", firing = true, Map.empty,
      sentTime = 10.2, debounce = 0.0))
    val t1 = new Thread(() => a.flush(10.5))
    t1.start()
    Thread.sleep(200) // t1 enqueued 'second' and parked on the lock
    // outbox non-empty, lock held: deliver must NOT park for the contact
    val t0 = System.nanoTime()
    a.deliver(Notification("third", firing = true, Map.empty,
      sentTime = 11.0, debounce = 60.0))
    assert((System.nanoTime() - t0) / 1e9 < 2.0,
      "deliver parked on the dispatch lock with a non-empty outbox")
    assert(a.currentlyFiring.contains("third"))
    gate.countDown()
    flusher.join(5000); t1.join(5000)
    assert(sent.toArray.toSeq.contains("slow"))
  }

  test("sink overflow rescues STOPs beyond the cap (r12 advice)") {
    val spark = GraftSession.builder("2").getOrCreate()
    import spark.implicits._
    val sent = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Exec("${name}:${firing}"))),
      execRunner = cmd => { sent.add(cmd); 0 },
      clock = () => 1000.0)
    // cap 3: the kept prefix is [A start, B start, C start]; the tail
    // holds [D start, A STOP]. Without the rescue A stays firing forever
    // (timeout 0); with it the tail STOP is appended and closes A.
    val batch = Seq(
      Notification("A", firing = true, Map.empty, sentTime = 1.0, debounce = 0.0),
      Notification("B", firing = true, Map.empty, sentTime = 2.0, debounce = 0.0),
      Notification("C", firing = true, Map.empty, sentTime = 3.0, debounce = 0.0),
      Notification("D", firing = true, Map.empty, sentTime = 4.0, debounce = 0.0),
      Notification("A", firing = false, Map.empty, sentTime = 5.0, debounce = 0.0)
    ).toDS()
    Notify.sinkBatch(batch, a, maxPerBatch = 3)
    assert(!a.currentlyFiring.contains("A"),
      s"tail STOP was dropped — still firing: ${a.currentlyFiring}")
    // kept starts delivered; the dropped D start is the accepted loss
    assert(a.currentlyFiring == Set("B", "C"), a.currentlyFiring)
    // the rescued STOP landed BEFORE the flush, so A resolves as a flap
    // (start never sent -> CANCEL, nothing delivered for A) — exactly a
    // same-batch start/stop pair's semantics; B and C deliver normally
    assert(sent.toArray.map(_.toString).toSeq.sorted == Seq("B:true", "C:true"),
      sent.toArray.toSeq)
    assert(a.incidents.exists(_.contains("CANCEL A")), a.incidents)
    // the journal records the overflow and the rescue
    assert(a.incidents.exists(_.contains("overflow")),
      "overflow must be journaled")
  }

  test("sink overflow rescue never replays a KEPT stop over its later start") {
    val spark = GraftSession.builder("2").getOrCreate()
    import spark.implicits._
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Ignore)),
      clock = () => 1000.0)
    // kept prefix (cap 3) = [STOP X (no-op), START X, START C]; the tail
    // overflows with START D. The rescue pass must NOT re-deliver the
    // kept STOP X after the kept START X — that replay would cancel a
    // legitimate incident (the r13 review-pass bug).
    val batch = Seq(
      Notification("X", firing = false, Map.empty, sentTime = 1.0, debounce = 0.0),
      Notification("X", firing = true, Map.empty, sentTime = 2.0, debounce = 0.0),
      Notification("C", firing = true, Map.empty, sentTime = 3.0, debounce = 0.0),
      Notification("D", firing = true, Map.empty, sentTime = 4.0, debounce = 0.0)
    ).toDS()
    Notify.sinkBatch(batch, a, maxPerBatch = 3)
    assert(a.currentlyFiring == Set("X", "C"),
      s"kept STOP replayed over its later START: ${a.currentlyFiring}")
  }

  test("cross-thread deliveries reach contacts in preparation order (FIFO outbox)") {
    // deliveries are enqueued UNDER the state monitor and drained FIFO:
    // a flush racing another thread's in-flight dispatch hands its
    // deliveries to that drainer instead of reordering around it
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val sent = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val a = new Notify.Alerter(
      teams = Map("default" -> Seq(Contact.Exec("${name}:${firing}"))),
      execRunner = cmd => {
        sent.add(cmd)
        if (sent.size == 1) { entered.countDown(); gate.await() }
        0
      },
      clock = () => 1000.0)
    a.deliver(Notification("x", firing = true, Map.empty,
      sentTime = 10.0, debounce = 0.0))
    val t1 = new Thread(() => a.flush(10.0)) // dispatches START, blocks in gate
    t1.start()
    assert(entered.await(5, java.util.concurrent.TimeUnit.SECONDS))
    a.deliver(Notification("x", firing = false, Map.empty,
      sentTime = 11.0, debounce = 0.0))
    val t2 = new Thread(() => a.flush(11.0)) // enqueues STOP behind the drainer
    t2.start()
    Thread.sleep(100) // let t2 reach the dispatch lock
    gate.countDown()
    t1.join(5000); t2.join(5000)
    assert(sent.toArray.toSeq == Seq("x:true", "x:false"), sent.toArray.toSeq)
  }

  test("shellRun kills a wedged command after the timeout (124)") {
    val t0 = System.nanoTime()
    assert(Notify.Alerter.shellRun("sleep 60", timeoutSec = 0.3) == 124)
    assert((System.nanoTime() - t0) / 1e9 < 10.0)
    assert(Notify.Alerter.shellRun("exit 3", timeoutSec = 5.0) == 3)
  }
}
