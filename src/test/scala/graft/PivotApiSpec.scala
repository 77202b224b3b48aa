package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.raql.{RaqlCompiler, RaqlParser}
import graft.service.{AlertApi, PivotApi}
import graft.service.AlertApi.SimpleFilter
import graft.service.PivotApi.{Pivot, PivotField, TopSpec}

/** The pivot + simple-filter transpilers
  * (`/root/reference/src/CodeGen_Pivot2RaQL.ml`,
  * `src/CodeGen_SimpleFilter2RaQL.ml`): generated RaQL parses, compiles
  * through the front-end, and the pivot answer matches a directly-built
  * DataFrame oracle; filter printing is typed (quoting, IN collapse,
  * nullable COALESCE). */
class PivotApiSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def mkApi(): (RaqlCompiler, AlertApi) = {
    val c = new RaqlCompiler(spark, "/tmp")
    c.registerTable("tables/events", Tables.events(spark, sfDir))
    val src = """
      DEFINE events AS
        FROM tables/events
        SELECT user_id, event_type, value, float(ts) AS start;
    """
    RaqlParser.parseProgram(src) match {
      case Right(p) => c.register("test", p)
      case Left(e) => fail(s"parse: $e")
    }
    (c, new AlertApi(spark, c))
  }

  // --- simple-filter printer (CodeGen_SimpleFilter2RaQL.ml:15-40) -------

  private val schema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("note", StringType, nullable = true)))

  test("printFilter: empty filter prints true") {
    assert(PivotApi.printFilter(schema, Nil) == "true")
  }

  test("printFilter: rhs literals take the lhs column type") {
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "bob"), SimpleFilter("score", "3.5", ">"))) ==
      """name = "bob" AND score > 3.5""")
    // non-numeric rhs against a numeric column is a typed error
    intercept[AlertApi.BadRequest] {
      PivotApi.printFilter(schema, Seq(SimpleFilter("score", "high", ">")))
    }
    intercept[AlertApi.BadRequest] {
      PivotApi.printFilter(schema, Seq(SimpleFilter("missing", "1")))
    }
  }

  test("printFilter: singleton IN collapses to equality, NOT IN to <>") {
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "[bob]", "in"))) == """name = "bob"""")
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("score", "[4]", "not in"))) == "score <> 4")
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "[a; b]", "in"))) ==
      """name IN ["a"; "b"]""")
  }

  test("printFilter: ops outside the whitelist are rejected, not interpolated") {
    // the typed-rhs quoting is bypassable through the op field — an op
    // like "= 0 OR 1 =" must be a typed error, never generated source
    for (bad <- Seq("= 0 OR 1 =", "<> x; NOTIFY", "is", "between"))
      intercept[AlertApi.BadRequest] {
        PivotApi.printFilter(schema, Seq(SimpleFilter("score", "3", bad)))
      }
    // every whitelisted op still prints
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("score", "3", "!="))) == "score != 3")
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "b%", "LIKE"))) == """name LIKE "b%"""")
  }

  test("printFilter: LIKE family (RamenExpr.ml:1078-1112 ops) prints surface syntax") {
    // canonical op strings from the reference grammar map to parseable
    // RaQL surface forms; patterns are string constants whatever the lhs
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "b%", "not like"))) ==
      """name NOT LIKE "b%"""")
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "B%", "cs-like"))) ==
      """name CASE SENSITIVE LIKE "B%"""")
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "B%", "not cs-like"))) ==
      """name NOT CASE SENSITIVE LIKE "B%"""")
    // internal-whitespace variants normalize rather than 400 — for the
    // IN family too (a "not  in" must take the vector-rhs branch, not the
    // general scalar printer)
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("name", "b%", "NOT  LIKE"))) ==
      """name NOT LIKE "b%"""")
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("score", "[4; 5]", "not  in"))) ==
      "score NOT IN [4; 5]")
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("score", "[4]", "NOT  IN"))) == "score <> 4")
    // and the generated forms parse as RaQL expressions
    for (src <- Seq("""name NOT LIKE "b%"""",
        """name CASE SENSITIVE LIKE "B%"""",
        """name NOT CASE SENSITIVE LIKE "B%"""",
        """COALESCE(note NOT LIKE "x%", false)"""))
      graft.raql.RaqlParser.parseExpr(src).fold(
        e => fail(s"'$src' did not parse: $e"), _ => ())
  }

  test("printFilter: nullable lhs wraps in COALESCE(…, false)") {
    assert(PivotApi.printFilter(schema,
      Seq(SimpleFilter("note", "x"))) == """COALESCE(note = "x", false)""")
  }

  test("printFilter: non-string/numeric rhs never passes through raw") {
    import org.apache.spark.sql.types.{BooleanType, TimestampType}
    val s2 = StructType(Seq(
      StructField("ok", BooleanType, nullable = false),
      StructField("at", TimestampType, nullable = false)))
    assert(PivotApi.printFilter(s2, Seq(SimpleFilter("ok", "TRUE"))) ==
      "ok = true")
    // an rhs that is not a boolean literal is a typed error, not RaQL
    // source injection into the generated program
    intercept[AlertApi.BadRequest] {
      PivotApi.printFilter(s2, Seq(SimpleFilter("ok", "true OR 1 = 1")))
    }
    // unknown-typed columns quote the rhs (never raw passthrough)
    assert(PivotApi.printFilter(s2,
      Seq(SimpleFilter("at", "2024-01-01 00:00:00", ">="))) ==
      """at >= "2024-01-01 00:00:00"""")
  }

  // --- pivot generation (CodeGen_Pivot2RaQL.ml:34-124) ------------------

  private val evSchema = StructType(Seq(
    StructField("user_id", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("start", DoubleType, nullable = false)))

  test("toRaql emits the reference's program shape") {
    val p = Pivot(
      from = "test/events",
      where = Seq(SimpleFilter("event_type", "[signup]", "not in")),
      typeField = "event_type", valueField = "value",
      fields = Seq(
        PivotField("click", types = Seq("cli%")),
        PivotField("purchase", sum = true, count = true, avg = false),
        PivotField("error", avg = false, max = true,
          percentiles = Seq(95), tops = Seq(TopSpec(3)))),
      groupBy = Seq("user_id"), duration = 86400, maxLateness = 60)
    val src = PivotApi.toRaql(p, evSchema)
    assert(src.contains("""WHERE event_type <> "signup""""))
    assert(src.contains("TRUNCATE(start, 86400) AS start"))
    // default selector is the field's own name; explicit types pass through
    assert(src.contains("""(IF event_type LIKE "cli%" THEN value) AS _click"""))
    assert(src.contains("""(IF event_type LIKE "purchase" THEN value) AS _purchase"""))
    // single aggregate keeps the bare field name; several get prefixed
    assert(src.contains("AVG(_click) AS click"))
    assert(src.contains("SUM(_purchase) AS sum_purchase"))
    assert(src.contains("COUNT(_purchase) AS count_purchase"))
    assert(src.contains("MAX(_error) AS max_error"))
    assert(src.contains("95th PERCENTILE (_error) AS perc_error"))
    assert(src.contains("LIST TOP 3 (_error) AS top_error"))
    assert(src.contains("true AS _delim"))
    assert(src.contains("GROUP BY user_id, TRUNCATE(start, 86400)"))
    assert(src.contains("COMMIT AFTER in.start > out.start + 86460"))
    // the generated text parses as a RaQL program
    assert(RaqlParser.parseProgram(src).isRight)
  }

  test("toRaql rejects unknown columns and empty fields") {
    val base = Pivot(from = "t", typeField = "event_type",
      valueField = "value", fields = Seq(PivotField("x")), duration = 60)
    intercept[AlertApi.BadRequest] {
      PivotApi.toRaql(base.copy(typeField = "nope"), evSchema)
    }
    intercept[AlertApi.BadRequest] {
      PivotApi.toRaql(base.copy(groupBy = Seq("nope")), evSchema)
    }
    intercept[AlertApi.BadRequest] {
      PivotApi.toRaql(base.copy(fields = Nil), evSchema)
    }
    intercept[AlertApi.BadRequest] {
      PivotApi.toRaql(base.copy(fields = Seq(PivotField("x", avg = false))),
        evSchema)
    }
  }

  test("set-pivots registers a program whose answer matches a DataFrame oracle") {
    val (c, api) = mkApi()
    val r = api.handle("""{"method":"set-pivots","id":7,"params":{
      "daily":{
        "from":"test/events",
        "where":[{"lhs":"event_type","rhs":"[signup]","op":"not in"}],
        "type-field":"event_type","value-field":"value",
        "fields":[
          {"name":"click"},
          {"name":"purchase","avg":false,"sum":true,"count":true},
          {"name":"err","types":["error"],"avg":false,"max":true}],
        "group-by":["user_id"],
        "duration":86400}}}""")
    assert(r.contains(""""daily":"api/pivots/daily""""), r)

    val got = c.compile("api/pivots/daily/pivot")
    // private (_-prefixed) helper fields never reach the output
    assert(!got.columns.exists(_.startsWith("_")))

    val dur = 86400.0
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts").cast("double").as("ts"))
      .filter(col("event_type") =!= "signup")
    def sel(pat: String) = lower(col("event_type")).like(pat.toLowerCase)
    val want = ev
      .groupBy((floor(col("ts") / dur) * dur).as("start"), col("user_id"))
      .agg(
        avg(when(sel("click"), col("value"))).as("click"),
        sum(when(sel("purchase"), col("value"))).as("sum_purchase"),
        count(when(sel("purchase"), col("value"))).as("count_purchase"),
        max(when(sel("error"), col("value"))).as("err"))

    val gotRows = got.select("start", "user_id", "click", "sum_purchase",
        "count_purchase", "err")
      .orderBy("user_id", "start").collect()
    val wantRows = want.select("start", "user_id", "click", "sum_purchase",
        "count_purchase", "err")
      .orderBy("user_id", "start").collect()
    assert(gotRows.length == wantRows.length && gotRows.nonEmpty)
    gotRows.zip(wantRows).foreach { case (g, w) =>
      // engine start is LONG (integral duration literal), oracle's double
      assert(g.getAs[Number](0).doubleValue == w.getAs[Number](0).doubleValue &&
        g.getLong(1) == w.getLong(1))
      def close(i: Int): Boolean =
        (g.isNullAt(i) && w.isNullAt(i)) ||
          (!g.isNullAt(i) && !w.isNullAt(i) &&
            math.abs(g.getAs[Number](i).doubleValue -
              w.getAs[Number](i).doubleValue) < 1e-9)
      (2 to 5).foreach(i => assert(close(i), s"col $i: $g vs $w"))
    }
    // re-registering the same name replaces, not duplicates
    api.setPivot("daily", PivotApi.parsePivot(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("""{"from":"test/events","type-field":"event_type",
        "value-field":"value","fields":[{"name":"view"}],"duration":3600}""")))
    assert(c.compile("api/pivots/daily/pivot").columns.contains("view"))
  }

  test("percentile and LIST TOP pivot aggregates compile and run") {
    val (c, api) = mkApi()
    api.setPivot("pct", Pivot(
      from = "test/events",
      typeField = "event_type", valueField = "value",
      fields = Seq(PivotField("click", avg = false,
        percentiles = Seq(95), tops = Seq(TopSpec(3)))),
      duration = 7 * 86400))
    val got = c.compile("api/pivots/pct/pivot")
    assert(got.columns.toSet == Set("start", "perc_click", "top_click"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    // the 95th percentile of click values sits inside the value range,
    // and the top list holds at most 3 entries
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").agg(
        org.apache.spark.sql.functions.min("value"),
        org.apache.spark.sql.functions.max("value")).head()
    rows.foreach { r =>
      val p = r.getAs[Double]("perc_click")
      assert(p >= ev.getDouble(0) && p <= ev.getDouble(1), s"p95 $p")
      assert(r.getAs[Seq[Any]]("top_click").size <= 3)
    }
  }
}
