package graft.streaming

import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal raw RFC 6455 test client shared by the ws telemetry specs:
  * handshake + unmasked text-frame decode. */
object WsTestClient {
  final class Conn(sock: Socket) {
    def readFrame(): String = {
      val in = sock.getInputStream
      val b0 = in.read(); val b1 = in.read()
      assert((b0 & 0xff) == 0x81, "FIN + text opcode")
      val len0 = b1 & 0x7f
      val len =
        if (len0 < 126) len0
        else if (len0 == 126) (in.read() << 8) | in.read()
        else {
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
    def close(): Unit = sock.close()
  }

  def connect(port: Int, timeoutMs: Int = 15000): Conn = {
    val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(timeoutMs)
    val req = s"GET /telemetry HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n"
    sock.getOutputStream.write(req.getBytes(UTF_8))
    sock.getOutputStream.flush()
    // drain the 101 response headers
    val in = sock.getInputStream
    val sb = new StringBuilder
    while (!sb.endsWith("\r\n\r\n")) sb.append(in.read().toChar)
    assert(sb.toString.startsWith("HTTP/1.1 101"), sb.toString)
    new Conn(sock)
  }
}
