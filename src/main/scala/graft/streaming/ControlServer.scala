package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import scala.collection.concurrent.TrieMap

/** REST control shim for replay sources — parity with the reference's
  * streamtester control API (trigger/streamtester/tester.go:63-74):
  * POST /tester/start | stop | pause | resume | reload, globally or for
  * one named source via ?name=. Built on the JDK's HttpServer (no extra
  * dependencies); GET /tester/status reports each source's state.
  */
class ControlServer(port: Int) {

  private val sources = TrieMap.empty[String, CsvReplay]
  private var server: HttpServer = _

  def register(name: String, replay: CsvReplay): Unit =
    sources.put(name, replay)

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/tester", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath.stripPrefix("/tester").stripPrefix("/")
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    val name = query.split("&").collectFirst {
      case kv if kv.startsWith("name=") =>
        java.net.URLDecoder.decode(kv.stripPrefix("name="), "UTF-8")
    }
    val targets = name match {
      case Some(n) => sources.get(n).map(n -> _).toSeq
      case None    => sources.toSeq
    }
    val (code, body) = path match {
      case _ if name.isDefined && targets.isEmpty =>
        (404, s"""{"error": "unknown source: ${esc(name.get)}"}""")
      case "start"  => targets.foreach(_._2.start()); ok(targets)
      case "stop"   => targets.foreach(_._2.stop()); ok(targets)
      case "pause"  => targets.foreach(_._2.pause()); ok(targets)
      case "resume" => targets.foreach(_._2.resume()); ok(targets)
      case "reload" => targets.foreach(_._2.reload()); ok(targets)
      case "status" => ok(targets)
      case other    => (404, s"""{"error": "unknown action: $other"}""")
    }
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def ok(targets: Seq[(String, CsvReplay)]): (Int, String) =
    (200, targets.map { case (n, r) =>
      s""""${esc(n)}": {"running": ${r.isRunning}}"""
    }.mkString("{", ",", "}"))

  /** JSON string escape for interpolated (possibly user-supplied) names. */
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
