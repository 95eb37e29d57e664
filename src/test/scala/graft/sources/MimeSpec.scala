package graft.sources

/** Pins [[Mime]]: header unfolding, RFC 2047 encoded words (B and Q,
  * adjacent-word joining), quoted-printable (soft breaks, =HH),
  * base64 bodies, nested multipart (mixed containing alternative),
  * the alternative text/plain preference, attachment counting, the
  * mbox postmark split with ">From " unescaping, and hostile-input
  * fences. */
class MimeSpec extends graft.SparkSpec {
  import spark.implicits._

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def eml(subject: String): String =
    s"""Subject: $subject
       |From: Alice Example <alice@example.com>
       |MIME-Version: 1.0
       |Content-Type: multipart/mixed; boundary="outer"
       |
       |preamble is ignored
       |--outer
       |Content-Type: multipart/alternative; boundary="inner"
       |
       |--inner
       |Content-Type: text/plain; charset=utf-8
       |Content-Transfer-Encoding: quoted-printable
       |
       |caf=C3=A9 plain wins over the html =
       |alternative.
       |--inner
       |Content-Type: text/html; charset=utf-8
       |
       |<p>html alternative body</p>
       |--inner--
       |--outer
       |Content-Type: text/html; charset=utf-8
       |Content-Transfer-Encoding: base64
       |
       |${b64("<p>base64 html — second part</p>")}
       |--outer
       |Content-Type: application/pdf
       |Content-Disposition: attachment; filename="x.pdf"
       |Content-Transfer-Encoding: base64
       |
       |JVBERi0=
       |--outer--
       |""".stripMargin.replace("\n", "\r\n")

  test("nested multipart: alternative prefers text/plain; mixed " +
       "concatenates; attachments counted not decoded") {
    val d = Mime.parseEml(eml("Hello").getBytes("UTF-8"))
      .getOrElse(fail("no parse"))
    assert(d.subject == "Hello")
    assert(d.from == "Alice Example <alice@example.com>")
    assert(d.text == "café plain wins over the html alternative.\n" +
      "base64 html — second part")
    assert(d.nAttachments == 1)
    assert(d.nParts >= 5)
  }

  test("RFC 2047 encoded words: B and Q forms, underscores, adjacent " +
       "words join without the separating space") {
    val subjB = "=?UTF-8?B?" + b64("Résumé — ") + "?= =?UTF-8?B?" +
      b64("part two") + "?="
    val d = Mime.parseEml(eml(subjB).getBytes("UTF-8")).get
    assert(d.subject == "Résumé — part two")
    val subjQ = "=?ISO-8859-1?Q?caf=E9_serr=E9?="
    val d2 = Mime.parseEml(eml(subjQ).getBytes("UTF-8")).get
    assert(d2.subject == "café serré")
  }

  test("header unfolding joins continuation lines") {
    val raw = ("Subject: one\r\n two\r\nFrom: x@y\r\n" +
      "Content-Type: text/plain\r\n\r\nbody line").getBytes("UTF-8")
    val d = Mime.parseEml(raw).get
    assert(d.subject == "one two")
    assert(d.text == "body line")
  }

  test("mbox: postmark split, >From unescape, one row per message " +
       "through the frame surface") {
    val m1 = "Subject: first\r\nContent-Type: text/plain\r\n\r\n" +
      "alpha\r\n>From the start it worked\r\n"
    val m2 = "Subject: second\r\nContent-Type: text/plain\r\n\r\nbeta\r\n"
    val mbox = ("From a@b Thu Jan  1 00:00:00 2026\n" + m1 +
      "\nFrom c@d Thu Jan  1 00:00:01 2026\n" + m2).getBytes("UTF-8")
    val msgs = Mime.mboxMessages(mbox)
    assert(msgs.length == 2)
    val d1 = Mime.parseEml(msgs(0)).get
    assert(d1.subject == "first")
    assert(d1.text == "alpha\nFrom the start it worked")
    val rows = Mime.mboxDocText(
        Multimodal.asMedia(Seq((7L, mbox)).toDF("id", "b"), "id", "b", "mbox"))
      .orderBy("msg_idx")
      .select("media_id", "msg_idx", "subject", "text")
      .as[(Long, Int, String, String)].collect().toSeq
    assert(rows == Seq(
      (7L, 0, "first", "alpha\nFrom the start it worked"),
      (7L, 1, "second", "beta")))
  }

  test("quoted-printable soft breaks and =HH decode; bare = survives") {
    val qp = "a=3Db=\r\ncontinues =zz tail".getBytes("ISO-8859-1")
    assert(new String(Mime.decodeQp(qp, softBreaks = true), "UTF-8") ==
      "a=bcontinues =zz tail")
  }

  test("message/rfc822 routes through the shared doc router as " +
       "carrier 'eml' (cell door)") {
    val body = eml("Routed").getBytes("UTF-8")
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: message/rfc822\r\n\r\n")
      .getBytes("ISO-8859-1") ++ body
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://ex.com/m.eml\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("ISO-8859-1") ++
      http ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val rows = Warc.warcDocText(
        Multimodal.asMedia(Seq((1L, rec)).toDF("id", "b"), "id", "b", "warc"))
      .select("carrier", "text").as[(String, String)].collect().toSeq
    assert(rows == Seq(("eml",
      "café plain wins over the html alternative.\nbase64 html — second part")))
  }

  test("hostile input never throws: truncation, junk, deep nesting") {
    val good = eml("x").getBytes("UTF-8")
    (1 until good.length by 11).foreach(n => Mime.parseEml(good.take(n)))
    assert(Mime.parseEml(Array.emptyByteArray).isEmpty)
    assert(Mime.mboxMessages("not an mbox".getBytes).isEmpty)
    // 20-deep nested multipart: the depth fence stops the recursion
    var body = "Content-Type: text/plain\r\n\r\ndeep leaf"
    (1 to 20).foreach { k =>
      body = s"Content-Type: multipart/mixed; boundary=b$k\r\n\r\n" +
        s"--b$k\r\n$body\r\n--b$k--\r\n"
    }
    Mime.parseEml(body.getBytes("UTF-8")) // must terminate quietly
    val rnd = new scala.util.Random(17)
    (1 to 200).foreach { k =>
      val mut = good.clone()
      (0 to k % 4).foreach(_ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte)
      Mime.parseEml(mut)
    }
  }
}
