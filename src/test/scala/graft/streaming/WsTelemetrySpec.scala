package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/** Drives the ws telemetry bridge with the raw RFC 6455 client
  * ([[WsTestClient]]): handshake, accept-key check, then frame decode of
  * broadcast events — the same contract the reference's websocket
  * clients rely on (service/telemetry/service.go:195-231). */
class WsTelemetrySpec extends AnyFunSuite {

  private def expectedAccept(key: String): String =
    Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))

  test("handshake, broadcast, multi-client fan-out, dead-client cleanup") {
    val sink = new WsTelemetrySink(0)
    try {
      val c1 = WsTestClient.connect(sink.boundPort)
      assert(c1.responseHeaders.exists(_.equalsIgnoreCase(
        s"Sec-WebSocket-Accept: ${expectedAccept(WsTestClient.SampleKey)}")))
      val c2 = WsTestClient.connect(sink.boundPort)
      val deadline = System.currentTimeMillis() + 5000
      while (sink.clientCount < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(sink.clientCount == 2)

      sink.emit(Telemetry.StageProgress("q1", "graft_stage_0_filter", 42L, 7L))
      val msg1 = c1.readFrame()
      assert(msg1.contains("\"stage-finished\"") && msg1.contains("42"))
      assert(c2.readFrame() == msg1)

      // >125-byte payload exercises the 16-bit length header
      sink.emit(Telemetry.PipelineStarted("q-" + ("x" * 140), "big", 1L))
      assert(c1.readFrame().contains("pipeline-started"))
      c2.readFrame()

      // a hung-up client is dropped on the next write, not before
      c2.close()
      sink.emit(Telemetry.PipelineFinished("q1", 8L))
      assert(c1.readFrame().contains("pipeline-finished"))
      val d2 = System.currentTimeMillis() + 5000
      while (sink.clientCount > 1 && System.currentTimeMillis() < d2) {
        sink.emit(Telemetry.PipelineFinished("q1", 9L))
        Thread.sleep(20)
      }
      assert(sink.clientCount == 1)
      c1.close()
    } finally sink.close()
  }
}
