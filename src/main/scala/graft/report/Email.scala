package graft.report

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.file.{Files, Path}
import java.util.Base64

import javax.net.ssl.SSLSocketFactory

/** Report delivery by email — the reference's actual product output
  * (`controller/app.py:583-659`): an HTML body plus extension-sniffed
  * MIME attachments, sent over SMTP with credentials from environment
  * variables. Re-expressed on the pure JDK (no mail library): RFC 5322
  * message assembly with base64 parts, and a minimal SMTP(S) client
  * speaking EHLO / AUTH LOGIN / MAIL FROM / RCPT TO / DATA with
  * dot-stuffing.
  *
  * Message assembly is DETERMINISTIC for a fixed boundary (no clock, no
  * random Message-ID — the receiving MTA stamps both), so the wire
  * bytes golden-fixture cleanly in `EmailSpec`. */
object Email {

  final case class Attachment(filename: String, bytes: Array[Byte])

  /** Mirrors the reference's extension→MIME table verbatim
    * (`controller/app.py:628-640`) — including its quirk that `.jpg`
    * maps to `image/jpg` (the raw extension), not `image/jpeg`. */
  def sniffMime(filename: String): String = {
    val f = filename.toLowerCase
    if (f.endsWith(".pdf")) "application/pdf"
    else if (f.endsWith(".html")) "text/html"
    else if (f.endsWith(".csv")) "text/csv"
    else if (f.endsWith(".txt")) "text/plain"
    else if (f.endsWith(".png") || f.endsWith(".jpg") || f.endsWith(".jpeg"))
      "image/" + f.substring(f.lastIndexOf('.') + 1)
    else "application/octet-stream"
  }

  /** Load attachments from paths, SKIPPING missing files with a warning
    * — reference behavior (`app.py:646-648`), not an error. */
  def loadAttachments(paths: Seq[Path]): Seq[Attachment] =
    paths.flatMap { p =>
      if (Files.exists(p)) Some(Attachment(p.getFileName.toString, Files.readAllBytes(p)))
      else { System.err.println(s"[email] attachment not found, skipped: $p"); None }
    }

  private def b64Wrapped(bytes: Array[Byte]): String =
    Base64.getMimeEncoder(76, Array('\r', '\n')).encodeToString(bytes)

  /** Assemble the full RFC 5322 message. HTML-only messages are a bare
    * `text/html` part; with attachments the shape is `multipart/mixed`
    * with the HTML body first — matching what Python's EmailMessage
    * produces for `add_alternative(html) + add_attachment(...)`. */
  def assemble(subject: String, from: String, to: String, htmlBody: String,
      attachments: Seq[Attachment] = Nil,
      boundary: String = "graft-boundary-0000"): Array[Byte] = {
    val sb = new StringBuilder
    def line(s: String): Unit = { sb.append(s).append("\r\n") }
    line(s"Subject: $subject")
    line(s"From: $from")
    line(s"To: $to")
    line("MIME-Version: 1.0")
    if (attachments.isEmpty) {
      line("Content-Type: text/html; charset=\"utf-8\"")
      line("Content-Transfer-Encoding: base64")
      line("")
      line(b64Wrapped(htmlBody.getBytes(UTF_8)))
    } else {
      line(s"""Content-Type: multipart/mixed; boundary="$boundary"""")
      line("")
      line(s"--$boundary")
      line("Content-Type: text/html; charset=\"utf-8\"")
      line("Content-Transfer-Encoding: base64")
      line("")
      line(b64Wrapped(htmlBody.getBytes(UTF_8)))
      attachments.foreach { a =>
        line(s"--$boundary")
        line(s"""Content-Type: ${sniffMime(a.filename)}; name="${a.filename}"""")
        line("Content-Transfer-Encoding: base64")
        line(s"""Content-Disposition: attachment; filename="${a.filename}"""")
        line("")
        line(b64Wrapped(a.bytes))
      }
      line(s"--$boundary--")
    }
    sb.toString.getBytes(UTF_8)
  }

  /** Minimal SMTP client. `ssl=true` gives implicit TLS (SMTPS :465,
    * the reference's `smtplib.SMTP_SSL`); tests run `ssl=false` against
    * an in-process loopback server. Throws on any non-2xx/3xx reply —
    * the reference wraps these in RuntimeError, same contract. */
  def send(host: String, port: Int, user: String, password: String,
      to: String, message: Array[Byte], ssl: Boolean = true): Unit = {
    val socket: Socket =
      if (ssl) SSLSocketFactory.getDefault.createSocket(host, port)
      else new Socket(host, port)
    try {
      val in = new BufferedReader(new InputStreamReader(socket.getInputStream, US_ASCII))
      val out: OutputStream = socket.getOutputStream
      def reply(): String = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        var l = in.readLine()
        val code = l.take(3)
        while (l != null && l.length > 3 && l.charAt(3) == '-') l = in.readLine()
        if (l == null) throw new RuntimeException("SMTP: connection closed")
        code
      }
      def cmd(s: String, expect: String): Unit = {
        out.write((s + "\r\n").getBytes(US_ASCII)); out.flush()
        val code = reply()
        if (code != expect)
          throw new RuntimeException(s"SMTP: '$s' -> $code (expected $expect)")
      }
      if (reply() != "220") throw new RuntimeException("SMTP: bad greeting")
      cmd("EHLO graft", "250")
      cmd("AUTH LOGIN", "334")
      cmd(Base64.getEncoder.encodeToString(user.getBytes(UTF_8)), "334")
      cmd(Base64.getEncoder.encodeToString(password.getBytes(UTF_8)), "235")
      cmd(s"MAIL FROM:<$user>", "250")
      cmd(s"RCPT TO:<$to>", "250")
      cmd("DATA", "354")
      // dot-stuff: any line starting with '.' gets one prepended
      val text = new String(message, UTF_8)
      val stuffed = text.split("\r\n", -1)
        .map(l => if (l.startsWith(".")) "." + l else l).mkString("\r\n")
      out.write(stuffed.getBytes(UTF_8))
      if (!stuffed.endsWith("\r\n")) out.write("\r\n".getBytes(US_ASCII))
      out.write(".\r\n".getBytes(US_ASCII)); out.flush()
      if (reply() != "250") throw new RuntimeException("SMTP: message rejected")
      cmd("QUIT", "221")
    } finally socket.close()
  }

  /** Reference entry point: creds and endpoint from the environment
    * (`CONTROLLER_SENDER_{SERVER,PORT,EMAIL,PASSWORD}` — reference
    * names, `app.py:604-610`; `GRAFT_SMTP_*` take precedence), HTML
    * body, attachment paths sniffed and skipped-if-missing. Missing
    * email/password is an error, mirroring the reference. */
  def sendReport(subject: String, htmlBody: String, toEmail: String,
      attachmentPaths: Seq[Path] = Nil,
      env: String => Option[String] = sys.env.get): Unit = {
    def envOr(a: String, b: String) = env(a).orElse(env(b))
    val server = envOr("GRAFT_SMTP_SERVER", "CONTROLLER_SENDER_SERVER")
      .getOrElse(throw new RuntimeException("SMTP server env var not set"))
    val port = envOr("GRAFT_SMTP_PORT", "CONTROLLER_SENDER_PORT")
      .map(_.toInt).getOrElse(465)
    val (user, pass) = (
      envOr("GRAFT_SMTP_EMAIL", "CONTROLLER_SENDER_EMAIL"),
      envOr("GRAFT_SMTP_PASSWORD", "CONTROLLER_SENDER_PASSWORD")) match {
      case (Some(u), Some(p)) => (u, p)
      case _ => throw new RuntimeException(
        "sender email/password env vars must be set")
    }
    val msg = assemble(subject, user, toEmail, htmlBody,
      loadAttachments(attachmentPaths))
    send(server, port, user, pass, toEmail, msg,
      ssl = env("GRAFT_SMTP_PLAINTEXT").isEmpty)
  }
}
