package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/** Drives the ws telemetry bridge with a raw RFC 6455 client: handshake,
  * accept-key check, then frame decode of broadcast events — the same
  * contract the reference's websocket clients rely on
  * (service/telemetry/service.go:195-231). */
class WsTelemetrySpec extends AnyFunSuite {

  private val wsKey = "dGhlIHNhbXBsZSBub25jZQ=="

  private def expectedAccept(key: String): String =
    Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))

  private def connect(port: Int): Socket = {
    val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(5000)
    val req = s"GET /telemetry HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $wsKey\r\nSec-WebSocket-Version: 13\r\n\r\n"
    sock.getOutputStream.write(req.getBytes(UTF_8))
    sock.getOutputStream.flush()
    sock
  }

  private def readHeaders(sock: Socket): Seq[String] = {
    val in = sock.getInputStream
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) sb.append(in.read().toChar)
    sb.toString.split("\r\n").toSeq
  }

  /** Reads one text frame (server frames are unmasked). */
  private def readFrame(sock: Socket): String = {
    val in = sock.getInputStream
    val b0 = in.read(); val b1 = in.read()
    assert((b0 & 0xff) == 0x81, "FIN + text opcode")
    val len0 = b1 & 0x7f
    val len =
      if (len0 < 126) len0
      else if (len0 == 126) (in.read() << 8) | in.read()
      else { // 64-bit length: top 4 bytes must be zero for test sizes
        (0 until 4).foreach(_ => in.read())
        (in.read() << 24) | (in.read() << 16) | (in.read() << 8) | in.read()
      }
    val buf = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(buf, off, len - off)
      assert(n > 0); off += n
    }
    new String(buf, UTF_8)
  }

  test("handshake, broadcast, multi-client fan-out, dead-client cleanup") {
    val sink = new WsTelemetrySink(0)
    try {
      val c1 = connect(sink.boundPort)
      val headers = readHeaders(c1)
      assert(headers.head.contains("101"))
      assert(headers.exists(_.equalsIgnoreCase(
        s"Sec-WebSocket-Accept: ${expectedAccept(wsKey)}")))
      val c2 = connect(sink.boundPort)
      readHeaders(c2)
      val deadline = System.currentTimeMillis() + 5000
      while (sink.clientCount < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(sink.clientCount == 2)

      sink.emit(Telemetry.StageProgress("q1", "graft_stage_0_filter", 42L, 7L))
      val msg1 = readFrame(c1)
      assert(msg1.contains("\"stage-finished\"") && msg1.contains("42"))
      assert(readFrame(c2) == msg1)

      // >125-byte payload exercises the 16-bit length header
      sink.emit(Telemetry.PipelineStarted("q-" + ("x" * 140), "big", 1L))
      assert(readFrame(c1).contains("pipeline-started"))
      readFrame(c2)

      // a hung-up client is dropped on the next write, not before
      c2.close()
      sink.emit(Telemetry.PipelineFinished("q1", 8L))
      assert(readFrame(c1).contains("pipeline-finished"))
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
