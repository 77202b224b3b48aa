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
    val lines = Seq("servers.web01.cpu 5.0 3", "garbage").toDF("line")
      .as[String].collect().flatMap(graft.sources.Listeners.parseGraphite)
    assert(lines.length == 1 && lines.head.path == "servers.web01.cpu")
  }
}
