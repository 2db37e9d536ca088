package graft.streaming

import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal raw RFC 6455 test client shared by the ws telemetry specs:
  * handshake + unmasked text-frame decode. Every read fails fast on EOF
  * (a closed peer must fail the test, not spin). */
object WsTestClient {

  private def readByte(in: java.io.InputStream): Int = {
    val b = in.read()
    assert(b >= 0, "unexpected EOF from ws server")
    b
  }

  final class Conn(sock: Socket, val responseHeaders: Seq[String]) {
    def readFrame(): String = {
      val in = sock.getInputStream
      val b0 = readByte(in); val b1 = readByte(in)
      assert((b0 & 0xff) == 0x81, "FIN + text opcode")
      val len0 = b1 & 0x7f
      val len =
        if (len0 < 126) len0
        else if (len0 == 126) (readByte(in) << 8) | readByte(in)
        else {
          (0 until 4).foreach(_ => readByte(in))
          (readByte(in) << 24) | (readByte(in) << 16) |
            (readByte(in) << 8) | readByte(in)
        }
      val buf = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val n = in.read(buf, off, len - off)
        assert(n > 0, "unexpected EOF inside ws frame"); off += n
      }
      new String(buf, UTF_8)
    }
    def close(): Unit = sock.close()
  }

  val SampleKey = "dGhlIHNhbXBsZSBub25jZQ=="

  def connect(port: Int, timeoutMs: Int = 15000): Conn = {
    val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(timeoutMs)
    val req = s"GET /telemetry HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $SampleKey\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n"
    sock.getOutputStream.write(req.getBytes(UTF_8))
    sock.getOutputStream.flush()
    // drain the 101 response headers (EOF-checked)
    val in = sock.getInputStream
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) sb.append(readByte(in).toChar)
    val headers = sb.toString.split("\r\n").toSeq
    assert(headers.head.startsWith("HTTP/1.1 101"), headers.head)
    new Conn(sock, headers)
  }
}
