package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.raql.{RaqlCompiler, RaqlParser}
import graft.service.{AlertApi, GraftHttpd}

/** Mirrors the reference's `tests/features/api.feature.in` flows: version,
  * get-tables, get-columns (group-key flag), set-alerts → transpiled RaQL
  * program → NOTIFY stream, unknown-field error, and the HTTP binding. */
class AlertApiSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def mkApi(): (RaqlCompiler, AlertApi) = {
    val c = new RaqlCompiler(spark, "/tmp")
    c.registerTable("tables/events", Tables.events(spark, sfDir))
    val src = """
      DEFINE events AS
        FROM tables/events
        SELECT user_id, event_type, value, float(ts) AS start
        FACTORS event_type;
      DEFINE per_user AS
        FROM tables/events
        SELECT user_id, min value AS low, float(min ts) AS start
        GROUP BY user_id;
      DEFINE maybe AS
        FROM tables/events
        SELECT user_id,
               CASE WHEN value > 100 THEN value END AS nullable_v,
               float(ts) AS start;
    """
    RaqlParser.parseProgram(src) match {
      case Right(p) => c.register("test", p)
      case Left(e) => fail(s"parse: $e")
    }
    (c, new AlertApi(spark, c))
  }

  test("version and get-tables over JSON-RPC") {
    val (_, api) = mkApi()
    val v = api.handle("""{"method":"version","id":"123"}""")
    assert(v.contains(s""""result":"${AlertApi.version}""""))
    assert(v.contains(""""id":"123""""))
    // integer and float ids echo verbatim
    assert(api.handle("""{"method":"version","id":123}""").contains(""""id":123"""))
    // method names dispatch case-insensitively (RamenApi.ml:751)
    assert(api.handle("""{"method":"Version","id":1}""")
      .contains(s""""result":"${AlertApi.version}""""))
    assert(api.handle("""{"method":"version","id":12.3}""").contains(""""id":12.3"""))
    val t = api.handle("""{"method":"get-tables","id":1,"params":{"prefix":"test/ev"}}""")
    assert(t.contains("test/events"))
    // per_user has an event time too, but the prefix excludes it
    assert(!t.contains("per_user"))
  }

  test("get-columns marks group keys and carries alerts") {
    val (_, api) = mkApi()
    val r = api.handle("""{"id":1,"method":"get-columns","params":["test/per_user"]}""")
    assert(r.contains(""""user_id":{"""))
    assert(r.contains(""""group-key":true"""))
    val r2 = api.handle("""{"id":1,"method":"get-columns","params":["test/events"]}""")
    assert(r2.contains(""""value":{"""))
    assert(!r2.contains(""""group-key":true"""))
    // FACTORS marks event_type; nothing else is a factor
    assert(r2.contains(""""event_type":{"type":"string","factor":true"""))
    assert(!r2.contains(""""value":{"type":"double","factor":true"""))
  }

  test("set-alerts transpiles, compiles, and notifies on threshold crossings") {
    val (c, api) = mkApi()
    val r = api.handle("""{"method":"set-alerts","id":1,"params":{
      "test/events":{"value":[{"threshold":180,"recovery":50,"id":"hi_value","desc-firing":"boum!"}]}}}""")
    assert(r.contains(""""result":null"""), r)
    // the generated program is registered and compiles to a NOTIFY stream
    val notifs = c.notifications("api/alerts/hi_value/notif")
      .getOrElse(fail("no notif function"))
      .collect()
    assert(notifs.nonEmpty)
    val name = notifs.head.getAs[String]("name")
    assert(name.contains("hi_value") && name.contains("test/events"))
    // transitions alternate: firing is a typed FIELD (normalized out of
    // the params like the reference's normalize_notif_parameters)
    val firingSeq = notifs.map(_.getAs[Boolean]("firing")).toSeq
    assert(firingSeq.contains(true))
    firingSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a != b, s"consecutive $a")
      case _ => ()
    }
    assert(!notifs.head.getAs[Map[String, String]]("params").contains("firing"))
    // deleting alerts unregisters the program
    val del = api.handle(
      """{"method":"set-alerts","id":1,"params":{"test/events":{"value":[]}}}""")
    assert(del.contains(""""result":null"""))
    assert(c.notifications("api/alerts/hi_value/notif").isEmpty)
    // empty params is valid
    assert(api.handle("""{"method":"set-alerts","id":1,"params":{}}""")
      .contains(""""result":null"""))
  }

  test("grouped alert: one hysteresis context per group key") {
    val (c, api) = mkApi()
    val r = api.handle("""{"method":"set-alerts","id":1,"params":{
      "test/per_user":{"low":[{"threshold":150,"recovery":50,"id":"low_per_user"}]}}}""")
    assert(r.contains(""""result":null"""), r)
    val alert = c.compile("api/alerts/low_per_user/alert")
    assert(alert.columns.contains("firing"))
    assert(alert.count() > 0)
  }

  test("get-timeseries: time-step buckets, end times, filters, bad fields") {
    val (_, api) = mkApi()
    // events span 2024; take a 2-hour window bucketized by 3600s steps
    val t0 = 1704067200L // 2024-01-01T00:00:00Z
    val r = api.handle(s"""{"method":"get-timeseries","id":1,"params":{
      "since":$t0,"until":${t0 + 7200},"time-step":3600,
      "data":{"test/events":{"select":["value"],
        "where":[{"lhs":"user_id","op":">=","rhs":"0"}]}}}}""")
    // bucket-time defaults to end: two buckets ending at t0+3600, t0+7200
    assert(r.contains(s""""times":[${t0 + 3600},${t0 + 7200}]"""), r)
    assert(r.contains(""""test/events":{"column_labels":[[]],"column_values":"""), r)
    // api.feature: time-step can replace num-points — one bucket, end time
    val one = api.handle("""{"method":"get-timeseries","id":1,"params":{
      "since":0,"until":9,"time-step":60,
      "data":{}}}""")
    assert(one.contains(""""times":[60]"""), one)
    // a misspelled select field names the candidates
    val bad = api.handle(s"""{"method":"get-timeseries","id":1,"params":{
      "since":$t0,"until":${t0 + 7200},"num-points":5,
      "data":{"test/events":{"select":["x"]}}}}""")
    assert(bad.contains("No column x") && bad.contains("value"), bad)
  }

  test("api.feature remainder: #_ selector, nullable field, empty where, having-style") {
    val (c, api) = mkApi()
    // "Can set an alert on table#_ selector" — prog#_ matches any instance
    val r1 = api.handle("""{"method":"set-alerts","id":1,"params":{
      "test#_/events":{"value":[{"threshold":42,"recovery":37,"id":"glop","desc-firing":"boum!"}]}}}""")
    assert(r1.contains(""""result":null"""), r1)
    assert(c.notifications("api/alerts/glop/notif").nonEmpty)
    // "Query with empty where filter must be accepted" — every optional
    // field supplied, where empty
    val r2 = api.handle("""{"id":1,"method":"set-alerts","params":{
      "test/maybe":{"nullable_v":[{"enabled":true,"id":"xyz","threshold":200,"recovery":100,"duration":0,"ratio":1,"where":[],"desc-firing":"x","desc-recovery":"y","desc-title":"t"}]}}}""")
    assert(r2.contains(""""result":null"""), r2)
    // "Alerting must work on a nullable field" — the generated program
    // compiles and runs over the nullable lhs
    val alert = c.compile("api/alerts/xyz/alert")
    assert(alert.columns.contains("firing"))
    alert.collect() // must execute, not just register
    // "Another example with a having clause" — same shape, no ratio
    val r3 = api.handle("""{"id":1,"method":"set-alerts","params":{
      "test/maybe":{"nullable_v":[{"enabled":true,"id":"xyz","threshold":200,"recovery":100,"duration":0,"where":[],"desc-firing":"x","desc-recovery":"y"}]}}}""")
    assert(r3.contains(""""result":null"""), r3)
    // "Can get some time series" — num-points form returns the column data
    val t0 = 1704067200L
    val ts = api.handle(s"""{"method":"get-timeseries","id":1,"params":{
      "since":$t0,"until":${t0 + 7200},"num-points":5,
      "data":{"test/events":{"select":["value"],
        "where":[{"lhs":"user_id","op":">=","rhs":"0"}]}}}}""")
    assert(ts.contains(""""test/events""""), ts)
    assert(ts.contains(""""column_values""""), ts)
  }

  test("misspelled alert field is mentioned in the error") {
    val (_, api) = mkApi()
    val r = api.handle("""{"id":1,"method":"set-alerts","params":{
      "test/events":{"value":[{"enapled":true,"threshold":200,"recovery":100}]}}}""")
    assert(r.contains("'enapled'"), r)
  }

  test("HTTP binding: JSON-RPC, version paths, graphite find/render") {
    val (_, api) = mkApi()
    import spark.implicits._
    val metrics = Seq(
      ("servers.web1.cpu", 10.0, 1.0), ("servers.web1.cpu", 20.0, 3.0),
      ("servers.web2.mem", 15.0, 7.0))
      .toDF("path", "time", "value")
    val httpd = new GraftHttpd(api, metrics = () => Some(metrics))
    val port = httpd.start()
    try {
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String): String =
        client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString()).body()
      def get(path: String): String =
        client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .GET().build(), HttpResponse.BodyHandlers.ofString()).body()

      assert(post("/", """{"method":"version","id":"123"}""")
        .contains(s""""result":"${AlertApi.version}""""))
      assert(post("/v1", """{"method":"version","id":"123"}""")
        .contains(""""id":"123""""))
      assert(post("/v99", """{"method":"version","id":"123"}""")
        .contains("Bad HTTP API version"))
      val find = get("/metrics/find?query=servers.*")
      assert(find.contains("servers.web1") && find.contains("servers.web2"))
      assert(find.contains(""""expandable":true"""))
      // graphite impersonator version (trailing slashes tolerated)
      assert(get("/version") == "1.1.3")
      assert(get("/version/") == "1.1.3")
      // graphite_api.feature: "It doesn't matter if the URL has some extra
      // slashes" — //version over a raw socket (HttpClient would normalize
      // the URI before sending). DOCUMENTED DEVIATION: the JDK HttpServer
      // rejects doubled slashes with 400 BEFORE any handler runs (our
      // path normalization at GraftHttpd covers every reachable case);
      // pin the transport behavior so a silent change is caught
      locally {
        val sock = new java.net.Socket("127.0.0.1", port)
        try {
          sock.getOutputStream.write(
            "GET //version HTTP/1.1\r\nHost: t\r\nConnection: close\r\n\r\n"
              .getBytes("US-ASCII"))
          val raw = new String(sock.getInputStream.readAllBytes(), "UTF-8")
          assert(raw.startsWith("HTTP/1.1 400"), raw)
        } finally sock.close()
      }
      val render = get("/render?target=servers.*.cpu&from=0&until=30&maxDataPoints=3")
      // graphite shape: times 10 and 20 land in buckets [10,20) and [20,30)
      assert(render.contains(""""target":"servers.web1.cpu""""))
      assert(render.contains(""""datapoints":[[1.0,10],[3.0,20]]"""))
      assert(!render.contains("web2")) // target glob filtered
    } finally httpd.stop()
  }

  test("HTTP binding: POSTed form params and OPTIONS preflight (graphite clients)") {
    val (_, api) = mkApi()
    import spark.implicits._
    val metrics = Seq(
      ("servers.web1.cpu", 10.0, 1.0), ("servers.web1.cpu", 20.0, 3.0),
      ("servers.web2.mem", 15.0, 7.0))
      .toDF("path", "time", "value")
    val httpd = new GraftHttpd(api, metrics = () => Some(metrics))
    val port = httpd.start()
    try {
      val client = HttpClient.newHttpClient()
      def send(req: HttpRequest.Builder): HttpResponse[String] =
        client.send(req.build(), HttpResponse.BodyHandlers.ofString())
      def uri(path: String) = URI.create(s"http://127.0.0.1:$port$path")

      // Grafana POSTs /render with a form-encoded body
      // (RamenHttpHelpers.ml:201-214 merges posted params)
      val render = send(HttpRequest.newBuilder(uri("/render"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(
          "target=servers.*.cpu&from=0&until=30&maxDataPoints=3"))).body()
      assert(render.contains(""""target":"servers.web1.cpu""""), render)
      assert(render.contains(""""datapoints":[[1.0,10],[3.0,20]]"""), render)
      // multipart/form-data bodies parse too
      val b = "XBOUNDARYX"
      val mp = s"--$b\r\n" +
        "Content-Disposition: form-data; name=\"query\"\r\n\r\n" +
        "servers.*\r\n" + s"--$b--\r\n"
      val find = send(HttpRequest.newBuilder(uri("/metrics/find"))
        .header("Content-Type", s"multipart/form-data; boundary=$b")
        .POST(HttpRequest.BodyPublishers.ofString(mp))).body()
      assert(find.contains("servers.web1") && find.contains("servers.web2"),
        find)
      // a posted param beats the same key in the query string: body
      // maxDataPoints=3 (2 populated buckets) overrides url's =1 (1 wide
      // bucket averaging both samples)
      val over = send(HttpRequest.newBuilder(uri(
        "/render?target=servers.*.cpu&from=0&until=30&maxDataPoints=1"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString("maxDataPoints=3"))).body()
      assert(over.contains(""""datapoints":[[1.0,10],[3.0,20]]"""), over)
      // OPTIONS preflight: 200 + CORS headers (RamenGraphite.ml:590-594)
      val opt = send(HttpRequest.newBuilder(uri("/render"))
        .method("OPTIONS", HttpRequest.BodyPublishers.noBody()))
      assert(opt.statusCode() == 200)
      assert(opt.headers().firstValue("Access-Control-Allow-Methods")
        .orElse("") == "POST")
      assert(opt.headers().firstValue("Access-Control-Allow-Headers")
        .orElse("") == "Content-Type")
    } finally httpd.stop()
  }

  test("HTTP binding: graphite relative times, multi-target render, 400s") {
    val (_, api) = mkApi()
    import spark.implicits._
    val now = System.currentTimeMillis() / 1000.0
    val metrics = Seq(
      ("servers.web1.cpu", now - 100, 10.0), ("servers.web1.cpu", now - 50, 20.0),
      ("servers.web2.mem", now - 75, 40.0))
      .toDF("path", "time", "value")
    val httpd = new GraftHttpd(api, metrics = () => Some(metrics))
    val port = httpd.start()
    try {
      val client = HttpClient.newHttpClient()
      def get(path: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      // Grafana's default range is relative: from=-6h&until=now
      // (time_of_graphite_time, RamenGraphite.ml:404-417)
      val rel = get("/render?target=servers.web1.cpu&from=-6h&until=now&maxDataPoints=1").body()
      assert(rel.contains("[15.0,"), rel) // (10+20)/2 in the one bucket
      // missing/unparseable from falls back to 24h-ago..now, not an error
      val dflt = get("/render?target=servers.web1.cpu&from=bogus&maxDataPoints=1").body()
      assert(dflt.contains("[15.0,"), dflt)
      // every repeated target= renders, not just the first
      val multi = get("/render?target=servers.web1.cpu&target=servers.web2.mem" +
        "&from=-6h&until=now&maxDataPoints=1").body()
      assert(multi.contains(""""target":"servers.web1.cpu"""") &&
        multi.contains(""""target":"servers.web2.mem""""), multi)
      // non-JSON formats and malformed client input are 400s, not 500s
      assert(get("/render?target=x&format=csv").statusCode() == 400)
      // an inverted/empty range is a client error too
      assert(get("/render?target=x&from=10&until=10").statusCode() == 400)
      val (_, api2) = mkApi()
      val bare = new GraftHttpd(api2) // compiler-backed tree
      val p2 = bare.start()
      try {
        val bad = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$p2/metrics/find?query=a.%22b")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(bad.statusCode() == 400, s"${bad.statusCode()} ${bad.body()}")
        assert(bad.body().contains("bad quotes"), bad.body())
      } finally bare.stop()
    } finally httpd.stop()
  }

  test("compiled NOTIFY normalizes firing/certainty/debounce/timeout into fields") {
    val (c, _) = mkApi()
    graft.raql.RaqlParser.parseProgram("""
      DEFINE alerts AS
        FROM tables/events
        SELECT user_id, value > 100 AS firing, 0.9 AS certainty, value
        NOTIFY "vol";
    """) match {
      case Right(p) => c.register("t2", p)
      case Left(e) => fail(s"parse: $e")
    }
    val ndf = c.notifications("t2/alerts").getOrElse(fail("no NOTIFY"))
    val rows = ndf.collect()
    assert(rows.nonEmpty)
    // firing is a real boolean column tracking the transition expression —
    // a recovery row must arrive with firing=false, not as a string param
    rows.foreach { r =>
      val v = r.getAs[Map[String, String]]("params")("value").toDouble
      assert(r.getAs[Boolean]("firing") == (v > 100.0), r.toString)
      assert(r.getAs[Double]("certainty") == 0.9)
      assert(r.getAs[String]("worker") == "t2/alerts")
      // the special parameters normalized OUT of the param map
      val keys = r.getAs[Map[String, String]]("params").keySet
      assert(!keys.contains("firing") && !keys.contains("certainty"), keys)
    }
  }

  test("tail where filters (tailing.feature): ops, AND, unknown field names itself") {
    val (_, api) = mkApi()
    import spark.implicits._
    val gen = Seq((1L, 42L, "green"), (2L, 42L, "red"), (3L, 42L, "blue"),
      (4L, 42L, "green"), (5L, 42L, "blue"))
      .toDF("x", "y", "color")
    val httpd = new GraftHttpd(api,
      tables = n => if (n == "test/gen") Some(gen) else None)
    val port = httpd.start()
    try {
      val client = HttpClient.newHttpClient()
      def get(path: String): HttpResponse[String] =
        client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      // tail -w x=4 -n 1: one row, mentioning 42
      val one = get(s"/tail/test/gen?n=1&where=${enc("x=4")}").body()
      assert(one.contains("\"x\":4") && one.contains("42"), one)
      // two where options AND (x=4, y=42)
      val anded = get(s"/tail/test/gen?n=9&where=${enc("x=4")}&where=${enc("y=42")}").body()
      assert(anded.contains("\"x\":4") && !anded.contains("\"x\":1"), anded)
      // string !=: no "blue" in the output
      val ne = get(s"/tail/test/gen?n=9&where=${enc("color != \"blue\"")}").body()
      assert(!ne.contains("blue") && ne.contains("42"), ne)
      // in / not in lists
      val in = get(s"/tail/test/gen?n=9&where=${enc("color in [\"blue\";\"red\"]")}").body()
      assert(!in.contains("green") && in.contains("blue"), in)
      val notIn = get(s"/tail/test/gen?n=9&where=${enc("color not in [\"green\"]")}").body()
      assert(!notIn.contains("green") && notIn.contains("42"), notIn)
      // unknown field: client error that NAMES the field
      val bad = get(s"/tail/test/gen?n=1&where=${enc("z=0")}")
      assert(bad.statusCode() == 400 && bad.body().contains("z"),
        s"${bad.statusCode()} ${bad.body()}")
      // an operator carved out of a field name is a parse error, not a
      // filter on the wrong column
      val carved = get(s"/tail/test/gen?n=1&where=${enc("xin [1;2]")}")
      assert(carved.statusCode() == 400 &&
        carved.body().contains("cannot parse"), carved.body())
      // a malformed n= is a 400 too
      assert(get("/tail/test/gen?n=abc").statusCode() == 400)
    } finally httpd.stop()
  }

  test("HTTP binding without a metrics frame: compiler-backed graphite tree") {
    val (_, api) = mkApi()
    val httpd = new GraftHttpd(api) // no metrics source bound
    val port = httpd.start()
    try {
      val client = HttpClient.newHttpClient()
      def get(path: String): String =
        client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .GET().build(), HttpResponse.BodyHandlers.ofString()).body()
      // tree walk: program components → function → factor values → leaves,
      // reference find JSON shape (text/id/int flags — RamenGraphite.ml:272)
      val funcs = get("/metrics/find?query=test.*")
      assert(funcs.contains(""""id":"test.events"""") &&
        funcs.contains(""""allowChildren":1"""), funcs)
      val vals = get("/metrics/find?query=test.events.*")
      assert(vals.contains(""""text":"error"""") &&
        vals.contains(""""expandable":1"""), vals)
      val leaves = get("/metrics/find?query=test.events.error.*")
      assert(leaves.contains(""""text":"value"""") &&
        leaves.contains(""""leaf":1"""), leaves)
      // render over the virtual tree: full bucket grid with nulls
      val t0 = 1704067200L
      val r = get(s"/render?target=test.events.error.value&from=$t0&until=${t0 + 7200}&maxDataPoints=2")
      assert(r.contains(""""target":"test.events.error.value""""), r)
      assert(r.contains(""""datapoints":[["""), r)
    } finally httpd.stop()
  }
}
