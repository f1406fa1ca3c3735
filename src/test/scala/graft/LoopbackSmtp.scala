package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.US_ASCII

import scala.collection.mutable.ArrayBuffer

/** Minimal single-connection loopback SMTP server for tests: scripted
  * replies, captures every client command line and the DATA payload. */
class LoopbackSmtp {
  val server = new ServerSocket(0)
  val commands = ArrayBuffer[String]()
  val dataLines = ArrayBuffer[String]()
  @volatile var authUser = ""; @volatile var authPass = ""

  val thread = new Thread(() => {
    val s = server.accept()
    val in = new BufferedReader(new InputStreamReader(s.getInputStream, US_ASCII))
    val out = s.getOutputStream
    def w(l: String): Unit = { out.write((l + "\r\n").getBytes(US_ASCII)); out.flush() }
    w("220 stub ESMTP")
    var inAuth = 0
    var done = false
    while (!done) {
      val l = in.readLine()
      if (l == null) done = true
      else {
        commands += l
        if (inAuth == 1) { authUser = l; inAuth = 2; w("334 UGFzc3dvcmQ6") }
        else if (inAuth == 2) { authPass = l; inAuth = 0; w("235 ok") }
        else if (l.startsWith("EHLO")) { w("250-stub"); w("250 AUTH LOGIN") }
        else if (l == "AUTH LOGIN") { inAuth = 1; w("334 VXNlcm5hbWU6") }
        else if (l.startsWith("MAIL FROM") || l.startsWith("RCPT TO")) w("250 ok")
        else if (l == "DATA") {
          w("354 go")
          var dl = in.readLine()
          while (dl != null && dl != ".") { dataLines += dl; dl = in.readLine() }
          w("250 queued")
        } else if (l == "QUIT") { w("221 bye"); done = true }
        else w("250 ok")
      }
    }
    s.close()
  })
  thread.setDaemon(true); thread.start()
  def port: Int = server.getLocalPort
}
