package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.DataFrame

/** Thin HTTP binding for the service layer — the reference's `ramen httpd`
  * (`/root/reference/src/RamenHttpd.ml`, `RamenGraphite.ml`): the JSON-RPC
  * alert API at `/` and `/v1`, graphite `/metrics/find` and `/render`, and
  * a `/tail/<table>?n=` peek. JDK built-in httpserver: no extra deps, the
  * server only drives the DataFrame transforms.
  *
  * This is a control/read-plane endpoint (GUI traffic), not a data plane —
  * single-threaded handling is deliberate; the heavy lifting stays in
  * Spark jobs.
  */
final class GraftHttpd(
    api: AlertApi,
    metrics: () => Option[DataFrame] = () => None,
    pathCol: String = "path",
    timeCol: String = "time",
    valueCol: String = "value",
    tables: String => Option[DataFrame] = _ => None) {

  private val M = new ObjectMapper()
  private val F = JsonNodeFactory.instance
  private var server: HttpServer = _

  /** Max API version, as the reference's current_api_version. */
  private val apiVersion = 1

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 16)
    server.createContext("/", handler)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String,
      ctype: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def decodePairs(s: String): Seq[(String, String)] =
    s.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }

  /** POSTed form params — graphite clients (Grafana) POST find/render
    * with a form body; the reference merges posted args over URL args
    * (RamenHttpHelpers.ml:201-214). Urlencoded and multipart both
    * accepted; any other content type yields no params, like the
    * reference's catch-all. */
  private def bodyPairs(ex: HttpExchange, body: String): Seq[(String, String)] = {
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    if (body.isEmpty) Nil
    else if (ct.startsWith("application/x-www-form-urlencoded")) decodePairs(body)
    else if (ct.startsWith("multipart/form-data")) {
      ct.split("boundary=", 2) match {
        case Array(_, rest) =>
          val b = rest.split(";").head.trim.stripPrefix("\"").stripSuffix("\"")
          body.split(java.util.regex.Pattern.quote("--" + b)).toSeq.flatMap {
            part =>
              val cut = part.indexOf("\r\n\r\n")
              if (cut < 0) None
              else "name=\"([^\"]*)\"".r.findFirstMatchIn(part.substring(0, cut))
                .map(_.group(1) ->
                  part.substring(cut + 4).stripSuffix("\r\n"))
          }
        case _ => Nil
      }
    } else Nil
  }

  /** URL params then posted params: `.toMap` keeps the LAST binding, so a
    * posted value wins over the query string (the reference's merge
    * order); list reads (repeated `target=`) see both. */
  private def allParams(ex: HttpExchange, body: String): Seq[(String, String)] =
    Option(ex.getRequestURI.getRawQuery).toSeq.flatMap(decodePairs) ++
      bodyPairs(ex, body)

  /** Rows → JSON array of objects (small result sets only: find/render
    * trees and tail peeks — never a data-plane path). */
  private def rowsToJson(df: DataFrame, limit: Int = 10000): String = {
    val arr = F.arrayNode()
    val names = df.columns
    df.limit(limit).collect().foreach { r =>
      val o = arr.addObject()
      names.zipWithIndex.foreach { case (n, i) =>
        r.get(i) match {
          case null => o.putNull(n)
          case b: Boolean => o.put(n, b)
          case x: Int => o.put(n, x)
          case x: Long => o.put(n, x)
          case x: Double => o.put(n, x)
          case x: Float => o.put(n, x.toDouble)
          case x => o.put(n, x.toString)
        }
      }
    }
    M.writeValueAsString(arr)
  }

  private val handler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      // tolerate duplicate/trailing slashes like the reference httpd
      val path = ex.getRequestURI.getPath.replaceAll("/+", "/").stripSuffix("/")
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      if (ex.getRequestMethod == "OPTIONS") {
        // CORS preflight for browser graphite clients
        // (RamenGraphite.ml:590-594)
        ex.getResponseHeaders.set("Access-Control-Allow-Methods", "POST")
        ex.getResponseHeaders.set("Access-Control-Allow-Headers", "Content-Type")
        respond(ex, 200, "", "text/plain")
      } else path match {
        case "/version" =>
          // graphite impersonator version (RamenGraphite.ml:571)
          respond(ex, 200, "1.1.3", "text/plain")
        case "" | "/v1" | "/api" | "/api/v1" =>
          respond(ex, 200, api.handle(body))
        case v if v.matches("/v\\d+") =>
          val n = v.drop(2).toInt
          if (n >= 1 && n <= apiVersion) {
            respond(ex, 200, api.handle(body))
          } else respond(ex, 400,
            s"""{"error":"Bad HTTP API version: \\"$n\\" (must be between 1 and $apiVersion)"}""")
        case "/metrics/find" =>
          val p = allParams(ex, body).toMap
          val q = p.getOrElse("query", "*")
          metrics() match {
            case Some(df) =>
              respond(ex, 200, rowsToJson(GraphiteApi.find(df, pathCol, q)))
            case None =>
              // no external metrics frame: the compiler-backed tree over
              // the registered programs (reference find JSON shape —
              // RamenGraphite.ml:272-275, int flags). Unparseable
              // from/until (graphite relative times like "-6h") are
              // IGNORED like the reference's get_opt_ts (:312-317), not
              // a 500
              def ts(k: String): Option[Double] =
                p.get(k).flatMap(s => scala.util.Try(s.toDouble).toOption)
              val nodes = api.graphiteFind(q, ts("from"), ts("until"))
              val arr = F.arrayNode()
              nodes.foreach { n =>
                val o = arr.addObject()
                o.put("text", n.text)
                o.put("id", n.id)
                o.put("expandable", if (n.expandable) 1 else 0)
                o.put("leaf", if (n.leaf) 1 else 0)
                o.put("allowChildren", if (n.expandable) 1 else 0)
              }
              respond(ex, 200, M.writeValueAsString(arr))
          }
        case "/render" =>
          val pairs = allParams(ex, body)
          val p = pairs.toMap
          // clients repeat target= per requested series
          val targets = pairs.collect { case ("target", v) => v } match {
            case Nil => Seq("*")
            case ts => ts
          }
          // graphite times — relative ("-6h"), "now", epoch, dates — with
          // the API's defaults (from: 24 h ago, until: now) when missing
          // OR unparseable: the reference's `time_of_graphite_time |?
          // default` (RamenGraphite.ml:404-417; find's ignore-on-bad
          // get_opt_ts is a different endpoint's rule)
          val now = System.currentTimeMillis() / 1000.0
          def ts(k: String): Option[Double] =
            p.get(k).flatMap(GraphiteTime.parse(_, now))
          val since = ts("from").getOrElse(now - 86400)
          val until = ts("until").getOrElse(now)
          val n = p.get("maxDataPoints")
            .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(300)
          if (p.getOrElse("format", "json") != "json")
            throw new AlertApi.BadRequest("only JSON format is supported")
          if (until <= since)
            throw new AlertApi.BadRequest(
              s"empty render range [$since, $until)")
          metrics() match {
            case Some(df) =>
              // graphite render shape: [{target, datapoints: [[v, t], …]}]
              // (RamenGraphite.ml:337-338); every repeated target renders,
              // deduped — a series two targets match appears once
              val rows = targets
                .map(GraphiteApi.render(df, pathCol, timeCol, valueCol,
                  _, since, until, n))
                .reduce(_.unionByName(_)).distinct().collect()
              val arr = F.arrayNode()
              rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach {
                case (tgt, pts) =>
                  val o = arr.addObject()
                  o.put("target", tgt)
                  val dp = o.putArray("datapoints")
                  pts.sortBy(_.getDouble(1)).foreach { r =>
                    val p = dp.addArray()
                    p.add(r.getDouble(2))
                    p.add(r.getDouble(1).toLong)
                  }
              }
              respond(ex, 200, M.writeValueAsString(arr))
            case None =>
              // compiler-backed render: [{target, datapoints: [[v, t], …]}]
              // with null points where no rows landed (graphite nulls)
              val arr = F.arrayNode()
              api.graphiteRender(targets, since, until, n).foreach {
                case (tgt, pts) =>
                  val o = arr.addObject()
                  o.put("target", tgt)
                  val dp = o.putArray("datapoints")
                  pts.foreach { case (ts, v) =>
                    val pt = dp.addArray()
                    v.fold[Unit] { pt.addNull(); () } { x => pt.add(x); () }
                    pt.add(ts)
                  }
              }
              respond(ex, 200, M.writeValueAsString(arr))
          }
        case t if t.startsWith("/tail/") =>
          val name = t.stripPrefix("/tail/")
          val pairs = allParams(ex, body)
          val n = pairs.toMap.get("n").map(s => s.toIntOption.getOrElse(
            throw new AlertApi.BadRequest(s"bad tail count n=$s"))).getOrElse(10)
          // repeated where= filters AND together (`ramen tail -w … -w …`,
          // tailing.feature)
          val wheres = pairs.collect { case ("where", w) => w }
          tables(name) match {
            case Some(df0) =>
              val df = wheres.foldLeft(df0)((d, w) => d.filter(TailWhere(d, w)))
              respond(ex, 200, rowsToJson(df, n))
            case None => respond(ex, 404, s"""{"error":"no table $name"}""")
          }
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      // client-input errors (bad graphite quotes, no event time, bad
      // format) are 400s, not server errors
      case e: AlertApi.BadRequest =>
        respond(ex, 400, M.writeValueAsString(
          F.objectNode().put("error", Option(e.getMessage).getOrElse(e.toString))))
      case e: Exception =>
        respond(ex, 500, M.writeValueAsString(
          F.objectNode().put("error", Option(e.getMessage).getOrElse(e.toString))))
    }
  }
}
