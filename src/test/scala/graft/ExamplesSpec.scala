package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.raql.{RaqlCompiler, RaqlParser}
import graft.raql.Ast.{ListenFor, ReadKafka}

/** Sweep the reference's `examples/` corpus — its REAL-WORLD programs
  * (`/root/reference/examples`: network monitoring on netflow+collectd,
  * synthetic-load generators, a comms benchmark) as opposed to the unit
  * fixtures under `tests/func`. Every program must parse, and every
  * function that doesn't need a live socket must batch-compile to a
  * DataFrame plan. These programs exercise cross-directory `FROM ../x/f`
  * resolution (`src/RamenName.ml:168-183`), instance refs (`#1min`),
  * parameter units, doc strings, and the reference's netflow/collectd
  * LISTEN schemas (`src/RamenNetflow.ml`, `src/RamenCollectd.ml`). */
class ExamplesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  private val exDir = "/root/reference/examples"

  private def allPrograms: Map[String, String] = {
    def walk(p: Path): Seq[Path] =
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.toSeq.flatMap(walk)
      else if (p.toString.endsWith(".ramen")) Seq(p) else Nil
    walk(Paths.get(exDir)).map { p =>
      val rel = Paths.get(exDir).relativize(p).toString.stripSuffix(".ramen")
      rel -> Files.readString(p)
    }.toMap
  }

  test("every example program parses") {
    val failures = allPrograms.toSeq.sortBy(_._1).flatMap { case (name, src) =>
      RaqlParser.parseProgram(src) match {
        case Right(_) => None
        case Left(e) => Some(s"$name: ${e.take(200)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("security DDoS_detector counts new connections per minute slice") {
    // pins the modifier-less 3-arg REMEMBER (fpr, dur, (src; dst)) inside
    // SUM (`examples/monitoring/network/security.ramen:6-27`; arg order
    // afun3_sf, `src/RamenExpr.ml:1466-1468`): a (src,dst) pair already
    // seen within the hour no longer counts as a new connection
    import spark.implicits._
    val c = new RaqlCompiler(spark, "/tmp")
    // minute 0: pairs (1,9) twice and (2,9) once → 2 new; minute 1: (1,9)
    // again within the hour → 0 new, (3,9) → 1 new
    // the trailing far-future row advances in.start past every window's
    // commit horizon so all slices emit
    c.registerTable("tables/flows", Seq(
      (1L, 9L, 10.0), (1L, 9L, 20.0), (2L, 9L, 30.0),
      (1L, 9L, 70.0), (3L, 9L, 80.0),
      (9L, 9L, 10000.0)).toDF("src", "dst", "start"))
    RaqlParser.parseProgram("""DEFINE q AS
        FROM tables/flows
        GROUP BY start // 60
        COMMIT AFTER in.start > out.start + 120
        SELECT
          TRUNCATE(start, 60) AS start,
          sum (1.1 * float (NOT REMEMBER (0.1, 3600, (src; dst)))) / 60
            AS new_cnxs_per_secs;""") match {
      case Right(p) => c.register("m", p)
      case Left(e) => fail(s"parse: $e")
    }
    val got = c.compile("m/q").collect()
      .map(r => (r.getAs[Number]("start").doubleValue(),
        math.rint(r.getAs[Number]("new_cnxs_per_secs").doubleValue() * 600)
          / 10)).toMap
    // per-second rates × 60. REMEMBER defaults to LOCAL lifespan under
    // GROUP BY (`src/RamenOperation.ml:865-877`): state is per minute
    // slice, so minute 0 dedups its (1,9) repeat (2 new × 1.1 = 2.2) and
    // minute 1's (1,9) counts again (2 new); the flusher row is 1 new
    assert(got == Map(0.0 -> 2.2, 60.0 -> 2.2, 9960.0 -> 1.1), s"got $got")
  }

  test("every non-live example function batch-compiles") {
    import spark.implicits._
    val sources = allPrograms
    val c = RaqlCompiler.fromSources(spark, exDir, sources)
      .fold(e => fail(s"parse: $e"), identity)
    // COUNTRYCODE compiles against registered GeoIP ranges (aggregated.ramen)
    c.registerGeoRanges(Seq((0L, 2000000000L, "AA"), (2000000001L, 4294967295L, "BB")))
    // LISTEN FOR NETFLOW/COLLECTD need a bound socket: pre-register empty
    // frames with the decoders' (reference) schemas so functions reading
    // FROM them still compile; the LISTEN functions themselves are skipped
    // (their sockets are exercised in StreamingSpec).
    sources.foreach { case (prog, src) =>
      RaqlParser.parseProgram(src).foreach(_.funcs.foreach { f =>
        f.op match {
          case ListenFor("netflow", _, _) => c.registerTable(s"$prog/${f.name}",
            spark.emptyDataset[graft.sources.Listeners.NetflowRecord].toDF())
          case ListenFor("collectd", _, _) => c.registerTable(s"$prog/${f.name}",
            spark.emptyDataset[graft.sources.Listeners.CollectdRecord].toDF())
          case _ => ()
        }
      })
    }
    var ok = 0; var tried = 0
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    sources.keys.toSeq.sorted.foreach { prog =>
      RaqlParser.parseProgram(sources(prog)).foreach { p =>
        p.funcs.foreach { f =>
          val usesLive = f.op match {
            case ListenFor(proto, _, _) => proto != "instrumentation"
            case _: ReadKafka => true
            case _ => false
          }
          if (!usesLive) {
            tried += 1
            // compile AND execute: a plan that dies at runtime (bad cast,
            // unresolved generator, empty-source edge) is not covered
            try {
              val df = c.compile(s"$prog/${f.name}")
              if (!df.isStreaming) df.count() // streaming plans: compile only
              ok += 1
            }
            catch { case e: Exception =>
              failures += s"$prog/${f.name}: ${e.toString.take(250)}" }
          }
        }
      }
    }
    info(s"compiled $ok/$tried example functions")
    failures.foreach(f => info(s"  FAIL $f"))
    assert(ok == tried, s"only $ok of $tried example functions compiled:\n" +
      failures.mkString("\n"))
  }
}
