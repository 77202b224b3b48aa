package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.service.GraphiteApi

class GraphiteApiSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def metrics = Seq(
    ("servers.web01.cpu", 0.0, 10.0),
    ("servers.web01.cpu", 30.0, 20.0),
    ("servers.web01.mem", 10.0, 50.0),
    ("servers.web02.cpu", 5.0, 30.0),
    ("servers.web02.cpu", 65.0, 40.0),
    ("clients.app.latency", 2.0, 1.5)
  ).toDF("path", "t", "v")

  test("glob translation handles graphite wildcards") {
    import GraphiteApi.globToRegex
    assert("servers.web01.cpu".matches(globToRegex("servers.*.cpu")))
    assert(!"servers.web01.mem".matches(globToRegex("servers.*.cpu")))
    assert(!"servers.a.b.cpu".matches(globToRegex("servers.*.cpu"))) // * is one component
    assert("servers.web01.cpu".matches(globToRegex("servers.web0?.cpu")))
    assert("servers.web01.cpu".matches(globToRegex("servers.{web01,db01}.*")))
    assert(!"servers.app02.cpu".matches(globToRegex("servers.{web01,db01}.*")))
  }

  test("user char classes survive glob translation (no post-hoc rewrite)") {
    import GraphiteApi.{componentGlobToRegex, globToRegex}
    // a user-written [^.] class must keep meaning "not a dot" in BOTH
    // variants — only the *_/? wildcards differ between them
    assert("ab".matches(componentGlobToRegex("[^.]b")))
    assert(!".b".matches(componentGlobToRegex("[^.]b")))
    assert("ab".matches(globToRegex("[^.]b")))
    assert(!".b".matches(globToRegex("[^.]b")))
    // component wildcards may cross dots (raw factor values contain dots)
    assert("10.0.0.1".matches(componentGlobToRegex("10.*")))
    assert(!"10.0.0.1".matches(globToRegex("10.*")))
    // a [^.] literal inside an alternation's \Q…\E quoting stays literal
    assert("[^.]a".matches(componentGlobToRegex("{[^.]a,b}")))
  }

  test("graphite time parsing (time_of_graphite_time)") {
    import graft.service.GraphiteTime.parse
    val now = 1723700000.0
    // relative offsets from now; a unit is required
    assert(parse("-6h", now).contains(now - 6 * 3600))
    assert(parse(" -30min ", now).contains(now - 1800))
    assert(parse("-2w", now).contains(now - 14 * 86400))
    assert(parse("-1mon", now).contains(now - 30 * 86400))
    assert(parse("-1y", now).contains(now - 365 * 86400))
    assert(parse("-100", now).isEmpty)
    // keywords and bare epochs (reference doctests: Some 10., Some 1523052000.)
    assert(parse("now", now).contains(now))
    assert(parse("10", now).contains(10.0))
    assert(parse("1523052000", now).contains(1523052000.0))
    assert(parse("", now).isEmpty)
    assert(parse("next tuesday", now).isEmpty)
    // date spellings agree (reference doctests around time_of_abstime)
    assert(parse("28.01.1976", now) == parse("01/28/1976", now))
    assert(parse("1976-01-28", now) == parse("28.01.1976", now))
    val d = parse("1976-01-28", now).get
    assert(parse("1976-01-28 12:00", now).contains(d + 12 * 3600))
    assert(parse("1976-01-28T12:00:00.9", now) // seconds round half-up
      .contains(d + 12 * 3600 + 1))
    // times of day mirror the reference literally: now or now + 86400
    assert(Set(Option(now), Option(now + 86400)).contains(parse("midnight", now)))
    assert(Set(Option(now), Option(now + 86400)).contains(parse("4:00pm", now)))
  }

  test("find returns tree nodes with leaf/expandable flags") {
    val top = GraphiteApi.find(metrics, "path", "*").collect()
    assert(top.map(_.getString(0)).toSeq == Seq("clients", "servers"))
    assert(top.forall(r => !r.getBoolean(1) && r.getBoolean(2))) // all expandable
    val leaves = GraphiteApi.find(metrics, "path", "servers.web01.*").collect()
    assert(leaves.map(_.getString(0)).toSeq ==
      Seq("servers.web01.cpu", "servers.web01.mem"))
    assert(leaves.forall(r => r.getBoolean(1) && !r.getBoolean(2))) // all leaves
  }

  test("render bucketizes matching series over the requested range") {
    val out = GraphiteApi.render(metrics, "path", "t", "v",
      target = "servers.*.cpu", since = 0.0, until = 120.0, maxDataPoints = 2)
      .collect()
    // two series × the buckets that have points; bucket width = 60 s
    val byKey = out.map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(byKey(("servers.web01.cpu", 0.0)) == 15.0)   // (10+20)/2
    assert(byKey(("servers.web02.cpu", 0.0)) == 30.0)
    assert(byKey(("servers.web02.cpu", 60.0)) == 40.0)
    assert(!byKey.contains(("servers.web01.mem", 0.0))) // target filtered
    // decoded graphite lines feed straight in
    val lines = Seq("servers.web01.cpu 5.0 3", "one two three four")
      .toDF("line").as[String].collect()
      .flatMap(graft.sources.Listeners.parseGraphite(_))
    assert(lines.length == 1 && lines.head.metric == "servers.web01.cpu")
  }

  // --- the compiler-backed virtual tree (RamenGraphite.ml:95-193) -------

  private def mkCompiler(): graft.raql.RaqlCompiler = {
    val c = new graft.raql.RaqlCompiler(spark, "/tmp")
    c.registerTable("tables/events",
      Tables.events(spark, "/root/testdata/sf0.001"))
    val src = """
      DEFINE events AS
        FROM tables/events
        SELECT user_id, event_type, value, float(ts) AS start
        FACTORS event_type;
      DEFINE plain AS
        FROM tables/events
        SELECT value, float(ts) AS start;
    """
    graft.raql.RaqlParser.parseProgram(src) match {
      case Right(p) => c.register("mon/web", p)
      case Left(e) => fail(s"parse: $e")
    }
    c
  }

  test("virtual tree: program components, function, factor values, numeric leaves") {
    import graft.service.GraphiteTree
    val c = mkCompiler()
    // program name components consume one filter each (RamenGraphite
    // loop_prog splits on '/')
    assert(GraphiteTree.find(c, "*").map(_.id) == Seq("mon"))
    assert(GraphiteTree.find(c, "mon.*").map(_.id) == Seq("mon.web"))
    val funcs = GraphiteTree.find(c, "mon.web.*")
    assert(funcs.map(_.id) == Seq("mon.web.events", "mon.web.plain"))
    assert(funcs.forall(n => n.expandable && !n.leaf))
    // below a function with FACTORS: the factor's distinct VALUES
    val vals = GraphiteTree.find(c, "mon.web.events.*")
    assert(vals.map(_.id.split("\\.").last).toSet ==
      Set("click", "error", "purchase", "signup", "view"))
    assert(vals.forall(n => n.expandable && !n.leaf))
    // below a factor value: numeric non-factor public fields as leaves
    // (event_type is a factor AND a string — absent twice over)
    val leaves = GraphiteTree.find(c, "mon.web.events.error.*")
    assert(leaves.map(_.id.split("\\.").last).toSet ==
      Set("user_id", "value", "start"))
    assert(leaves.forall(n => n.leaf && !n.expandable))
    assert(leaves.head.text == leaves.head.id.split("\\.").last)
    // a function WITHOUT factors goes straight to field leaves
    assert(GraphiteTree.find(c, "mon.web.plain.*").map(_.id.split("\\.").last)
      .toSet == Set("value", "start"))
    // globs filter factor values like any component
    assert(GraphiteTree.find(c, "mon.web.events.{error,signup}")
      .map(_.id.split("\\.").last).toSet == Set("error", "signup"))
    // the since/until range restricts the enumerated values: out of range
    // ⇒ the single empty FactorAll component, quoted per fix_quote
    // (RamenGraphite.ml:51-60,130-140) so deeper levels stay reachable
    assert(GraphiteTree.find(c, "mon.web.events.*",
      since = Some(0.0), until = Some(1.0)).map(_.id) ==
      Seq("mon.web.events.\"\""))
  }

  test("virtual tree: dotted factor values quote as one component (split_query/fix_quote)") {
    import graft.service.GraphiteTree
    // the reference's netflow factors are IPs — values with dots MUST be
    // one quoted component (RamenGraphite.ml:206-245), or they vanish
    // from the tree and their render targets never match
    val c = new graft.raql.RaqlCompiler(spark, "/tmp")
    c.registerTable("tables/events",
      Tables.events(spark, "/root/testdata/sf0.001"))
    val src = """
      DEFINE flows AS
        FROM tables/events
        SELECT user_id,
               "10.0.0." || string(user_id % 2) AS src_ip,
               value, float(ts) AS start
        FACTORS src_ip;
    """
    graft.raql.RaqlParser.parseProgram(src) match {
      case Right(p) => c.register("net", p)
      case Left(e) => fail(s"parse: $e")
    }
    assert(GraphiteTree.splitQuery("""net.flows."10.0.0.1".value""").toSeq ==
      Seq("net", "flows", "\"10.0.0.1\"", "value"))
    c.compile("net/flows").collect() // must compile; surface errors here
    val vals = GraphiteTree.find(c, "net.flows.*")
    assert(vals.map(_.id).toSet ==
      Set("""net.flows."10.0.0.0"""", """net.flows."10.0.0.1""""))
    assert(vals.head.text.startsWith("\"10.0.0."))
    // a literal quoted target expands to exactly that series
    val s = GraphiteTree.expandTarget(c, """net.flows."10.0.0.1".value""")
    assert(s.map(_.path) == Seq("""net.flows."10.0.0.1".value"""))
    assert(s.head.factorVals == Seq("src_ip" -> "10.0.0.1")) // raw value
    // and renders real data
    val t0 = 1704067200.0
    val out = GraphiteTree.render(c, Seq("""net.flows."10.0.0.1".value"""),
      t0, t0 + 30 * 86400, maxDataPoints = 1)
    assert(out.size == 1 && out.head._2.head._2.isDefined)
  }

  test("graphite_metrics.feature mirror: ids complete ONLY the last query component") {
    import graft.service.GraphiteTree
    // tests/features/graphite_metrics.feature: a two-factor function
    // (digit, color — one color value dotted) under a nested program name,
    // plus a factorless one-field program
    val c = new graft.raql.RaqlCompiler(spark, "/tmp")
    c.registerTable("tables/events",
      Tables.events(spark, "/root/testdata/sf0.001"))
    def reg(name: String, src: String): Unit =
      graft.raql.RaqlParser.parseProgram(src) match {
        case Right(p) => c.register(name, p)
        case Left(e) => fail(s"parse: $e")
      }
    reg("p1/p2/t1", """
      DEFINE f1 AS
        FROM tables/events
        SELECT user_id % 10 AS digit,
               CASE WHEN user_id % 10 = 0 THEN "cyan"
                    WHEN user_id % 10 = 1 THEN "magenta"
                    WHEN user_id % 10 = 2 THEN "yellow"
                    ELSE "bl.a.ck" END AS color,
               value AS high_card, float(ts) AS start
        FACTORS digit, color;
    """)
    reg("t2", """
      DEFINE f2 AS FROM tables/events SELECT 42 AS the_answer,
        float(ts) AS start;
    """)
    def find(q: String) = GraphiteTree.find(c, q)
    // completing nothing yields the first program components
    assert(find("*").map(_.text).toSet == Set("p1", "t2"))
    // completing p1 yields p2
    assert(find("p1.*").map(_.text) == Seq("p2"))
    // below the function: the digit factor's values
    assert(find("p1.p2.t1.f1.*").map(_.text).contains("1"))
    // a glob prefix survives VERBATIM in the id — only the last
    // component completes ("id":"*.*.*.f1.1" in the feature)
    val globbed = find("*.*.*.f1.*")
    assert(globbed.map(_.text).contains("1"))
    assert(globbed.map(_.id).contains("*.*.*.f1.1"), globbed.map(_.id))
    // next factor level: color values, the dotted one quoted, the id
    // prefix kept as typed
    val colors = find("p1.p2.t1.f1.0.*")
    assert(colors.map(_.text).contains("magenta"))
    assert(colors.map(_.text).contains("\"bl.a.ck\""))
    assert(colors.map(_.id).contains("p1.p2.t1.f1.0.\"bl.a.ck\""),
      colors.map(_.id))
    // quoted filter components unquote
    assert(find("\"p1\".p2.\"t1\".f1.0.*").map(_.text).contains("magenta"))
    // below the factors: numeric non-factor fields, all leaves
    val leaves = find("p1.p2.t1.f1.0.magenta.*")
    assert(leaves.map(_.text).contains("high_card"))
    assert(leaves.forall(n => n.leaf && !n.expandable))
    // completing past the leaves yields nothing
    assert(find("p1.p2.t1.f1.0.magenta.*.*").isEmpty)
  }

  test("fixQuote keeps every value one well-formed splittable component") {
    import graft.service.GraphiteTree._
    // the reference's own doctests (RamenGraphite.ml:62-68)
    assert(fixQuote("") == "\"\"")
    assert(fixQuote("glop") == "glop")
    assert(fixQuote("\"glop\"") == "glop")
    assert(fixQuote("pas.glop") == "\"pas.glop\"")
    assert(fixQuote("\"pas.glop\"") == "\"pas.glop\"")
    // beyond the reference: embedded quotes/backslashes escape instead of
    // producing an id splitQuery rejects (one odd factor value must not
    // 500 a whole find response)
    for (v <- Seq("a\"b.c", "\"10.0", "back\\slash.x", "q\"uote")) {
      val comp = fixQuote(v)
      assert(splitQuery(comp).toSeq == Seq(comp), s"$v -> $comp")
      assert(unquote(comp) == v, s"$v -> $comp")
      assert(fixQuote(comp) == comp, s"round-trip $v")
    }
  }

  test("reachability resolves relative FROM forms before compiling (no socket bind)") {
    import graft.service.GraphiteTree
    val c = new graft.raql.RaqlCompiler(spark, "/tmp")
    // a LISTEN ancestor referenced through a RELATIVE ../ path: the static
    // walk must resolve it like the compiler would and exclude the head
    // WITHOUT compiling it (compiling a ListenFor binds its UDP port)
    val port = {
      val s = new java.net.DatagramSocket(0)
      try s.getLocalPort finally s.close()
    }
    def reg(name: String, src: String): Unit =
      graft.raql.RaqlParser.parseProgram(src) match {
        case Right(p) => c.register(name, p)
        case Left(e) => fail(s"parse: $e")
      }
    reg("net/listen", s"DEFINE src AS LISTEN FOR NETFLOW ON PORT $port;")
    reg("net/agg", """
      DEFINE f AS
        FROM ../listen/src
        SELECT bytes, float(first) AS start;
    """)
    val nodes = GraphiteTree.find(c, "*")
    assert(!nodes.exists(_.id.startsWith("net")), nodes.map(_.id))
    // the walk compiled nothing upstream: the listener's port is still free
    val probe = new java.net.DatagramSocket(port)
    probe.close()
  }

  test("virtual tree render: multiple targets expand together, one scan per function") {
    import graft.service.GraphiteTree
    val c = mkCompiler()
    val t0 = 1704067200.0
    val out = GraphiteTree.render(c,
      Seq("mon.web.events.error.value", "mon.web.plain.value"),
      t0, t0 + 30 * 86400, maxDataPoints = 2).toMap
    assert(out.keySet ==
      Set("mon.web.events.error.value", "mon.web.plain.value"))
  }

  test("virtual tree render: one scan per function, bucket means match a direct query") {
    import graft.service.GraphiteTree
    import org.apache.spark.sql.functions._
    val c = mkCompiler()
    val t0 = 1704067200.0 // 2024-01-01T00:00:00Z
    val t1 = t0 + 30 * 86400
    val series = GraphiteTree.expandTarget(c, "mon.web.events.*.value")
    assert(series.map(_.path).toSet.size == 5 &&
      series.forall(_.field == "value"))
    val out = GraphiteTree.render(c,
      Seq("mon.web.events.{error,purchase}.value"), t0, t1,
      maxDataPoints = 3).toMap
    assert(out.keySet == Set("mon.web.events.error.value",
      "mon.web.events.purchase.value"))
    // every series carries the full bucket grid (nulls where empty)
    assert(out.values.forall(_.length == 3))
    // the first bucket's mean equals a direct computation
    val step = (t1 - t0) / 3
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "error" &&
        unix_micros(col("ts")) / 1e6 >= t0 &&
        unix_micros(col("ts")) / 1e6 < t0 + step)
      .agg(avg("value")).collect().head.getDouble(0)
    val got = out("mon.web.events.error.value").head._2.get
    assert(math.abs(got - want) < 1e-9, s"got $got want $want")
  }

  test("find memoizes the function walk per registry generation (r11 advisory)") {
    import graft.service.GraphiteTree
    val c = mkCompiler()
    GraphiteTree.find(c, "mon.*")
    val walks = GraphiteTree.headsWalks.get()
    // a burst of finds against an unchanged registry walks nothing new
    GraphiteTree.find(c, "*")
    GraphiteTree.find(c, "mon.web.*")
    GraphiteTree.find(c, "mon.web.plain.*")
    assert(GraphiteTree.headsWalks.get() == walks,
      "an unchanged registry was re-walked")
    // registering a program bumps the generation: exactly one re-walk
    graft.raql.RaqlParser.parseProgram(
      "DEFINE extra AS FROM tables/events SELECT value, float(ts) AS start;") match {
      case Right(p) => c.register("mon/extra", p)
      case Left(e) => fail(s"parse: $e")
    }
    assert(GraphiteTree.find(c, "mon.*").map(_.id) ==
      Seq("mon.extra", "mon.web"))
    GraphiteTree.find(c, "mon.*")
    assert(GraphiteTree.headsWalks.get() == walks + 1,
      "register did not invalidate exactly once")
  }
}
