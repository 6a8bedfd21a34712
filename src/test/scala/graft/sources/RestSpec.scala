package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The injectable REST transport (r13 verdict item 4): pagination and
  * error paths exercised through a stubbed [[RestTransport]] — no
  * network, no filesystem staging by the test itself. The file://
  * semantics (JSONPath navigation, schema application, http rejection)
  * stay covered by IoSpec + gated q53; this spec covers what file://
  * alone cannot reach: multi-page chains, mid-chain failures, and the
  * runaway-pagination bound. */
class RestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Serves `pages(i)` for URL ".../page/i", chaining i → i+1. */
  private class PagedStub(pages: Seq[String],
      failAt: Int = -1) extends RestTransport {
    var fetches: List[String] = Nil
    private def idx(url: String): Int = url.split('/').last.toInt
    override def fetch(url: String): Array[Byte] = {
      fetches ::= url
      val i = idx(url)
      if (i == failAt)
        throw new RuntimeException("HTTP 500 Internal Server Error")
      pages(i).getBytes("UTF-8")
    }
    override def nextPage(url: String, payload: Array[Byte]): Option[String] = {
      val i = idx(url)
      if (i + 1 < pages.length) Some(s"https://api.test/items/page/${i + 1}")
      else None
    }
  }

  test("multi-page payloads concatenate across the chain, path applied") {
    val pages = Seq(
      """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""",
      """[{"id": 3, "name": "c"}]""",
      """[{"id": 4, "name": "d"}, {"id": 5, "name": "e"}]""")
    val stub = new PagedStub(pages)
    val df = Rest.readVia(spark, stub, "https://api.test/items/page/0",
      jsonPath = "$[*]", schemaDdl = Some("id INT, name STRING"))
    val got = df.collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")))
    assert(stub.fetches.reverse.map(_.split('/').last) ==
      List("0", "1", "2"))
  }

  test("a mid-chain fetch failure surfaces the page URL, not a partial frame") {
    val pages = Seq("""[{"id": 1}]""", """[{"id": 2}]""", """[{"id": 3}]""")
    val e = intercept[java.io.IOException] {
      Rest.readVia(spark, new PagedStub(pages, failAt = 1),
        "https://api.test/items/page/0", "$[*]")
    }
    assert(e.getMessage.contains("page/1") && e.getMessage.contains("page 2"))
    assert(e.getMessage.contains("HTTP 500"))
  }

  test("a cyclic pagination chain hits the maxPages bound instead of hanging") {
    val cyclic = new RestTransport {
      override def fetch(url: String): Array[Byte] =
        """[{"id": 1}]""".getBytes("UTF-8")
      override def nextPage(url: String, payload: Array[Byte]) = Some(url)
    }
    val e = intercept[RuntimeException] {
      Rest.readVia(spark, cyclic, "https://api.test/loop", "$[*]",
        maxPages = 7)
    }
    assert(e.getMessage.contains("7 pages"))
  }

  // ---- live HTTP over an in-process loopback server ----------------------
  // com.sun.net.httpserver bound to 127.0.0.1 — genuine http semantics
  // (status codes, request/response headers, chunked bodies) with zero
  // egress. This is the production-transport path the stub tests can't
  // reach: HttpTransport really opens sockets here.

  private def withServer(
      routes: Map[String, com.sun.net.httpserver.HttpExchange => Unit])(
      body: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, 0), 0)
    routes.foreach { case (p, h) =>
      srv.createContext(p, (ex: com.sun.net.httpserver.HttpExchange) =>
        try h(ex) finally ex.close())
    }
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      status: Int, bytes: Array[Byte], chunked: Boolean = false,
      headers: Map[String, String] = Map.empty): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    // length 0 = chunked transfer encoding on this server
    ex.sendResponseHeaders(status, if (chunked) 0 else bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }

  test("live loopback: Link-paginated GET, chunked bodies, headers sent") {
    val pages = Seq(
      """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""",
      """[{"id": 3, "name": "c"}]""",
      """[{"id": 4, "name": "d"}]""")
    val seenAuth = collection.mutable.Buffer.empty[String]
    withServer(Map("/items" -> { ex =>
      val page = Option(ex.getRequestURI.getQuery)
        .flatMap(_.split('&').collectFirst {
          case q if q.startsWith("page=") => q.drop(5).toInt
        }).getOrElse(0)
      seenAuth += Option(
        ex.getRequestHeaders.getFirst("Authorization")).orNull
      // RELATIVE next link — resolution against the page URL is part
      // of the contract; last page carries no rel="next"
      val link =
        if (page + 1 < pages.length)
          Map("Link" -> (s"""</items?page=${page + 1}>; rel="next", """ +
            """</items?page=0>; rel="first""""))
        else Map("Link" -> """</items?page=0>; rel="first"""")
      respond(ex, 200, pages(page).getBytes("UTF-8"),
        chunked = page % 2 == 1, headers = link)
    })) { base =>
      val t = new HttpTransport(headers = Map("Authorization" -> "Bearer x"))
      val df = Rest.readVia(spark, t, s"$base/items", "$[*]",
        Some("id INT, name STRING"))
      assert(df.collect().map(r => (r.getInt(0), r.getString(1))).sorted
        .toSeq == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
      assert(seenAuth.toSeq == Seq.fill(3)("Bearer x"),
        "every page request must carry the configured headers")
    }
  }

  test("live loopback: non-2xx surfaces status + body snippet + page") {
    withServer(Map(
      "/gone" -> (ex => respond(ex, 404,
        """{"error": "no such collection"}""".getBytes("UTF-8"))),
      "/boom" -> (ex => respond(ex, 500, "oops".getBytes("UTF-8"))))
    ) { base =>
      val e = intercept[java.io.IOException](
        Rest.readVia(spark, new HttpTransport(), s"$base/gone", "$[*]"))
      assert(e.getMessage.contains("HTTP 404") &&
        e.getMessage.contains("no such collection") &&
        e.getMessage.contains("/gone"))
      // 5xx is retryable — exhaust a zero-retry budget so the failure
      // path (not the backoff path) is what's under test here
      val e2 = intercept[java.io.IOException](
        Rest.readVia(spark, new HttpTransport(maxRetries = 0),
          s"$base/boom", "$[*]"))
      assert(e2.getMessage.contains("HTTP 500"))
    }
  }

  test("live loopback: 503,503,200 retries on exponential backoff") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val sleeps = collection.mutable.Buffer.empty[Long]
    withServer(Map("/flaky" -> { ex =>
      if (hits.incrementAndGet() <= 2)
        respond(ex, 503, "try later".getBytes("UTF-8"))
      else respond(ex, 200, """[{"id": 9}]""".getBytes("UTF-8"))
    })) { base =>
      val t = new HttpTransport(maxRetries = 4, retryBaseMs = 40,
        sleeper = sleeps.append(_))
      val df = Rest.readVia(spark, t, s"$base/flaky", "$[*]", Some("id INT"))
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(9))
      assert(hits.get() == 3, "two 503s then the success fetch")
      assert(sleeps.toSeq == Seq(40L, 80L),
        "bounded exponential backoff: base, then doubled")
    }
  }

  test("live loopback: 429 honors Retry-After; exhausted budget throws") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val sleeps = collection.mutable.Buffer.empty[Long]
    withServer(Map(
      "/limited" -> { ex =>
        if (hits.incrementAndGet() == 1)
          respond(ex, 429, "slow down".getBytes("UTF-8"),
            headers = Map("Retry-After" -> "2"))
        else respond(ex, 200, """[{"id": 5}]""".getBytes("UTF-8"))
      },
      "/always429" -> (ex => respond(ex, 429,
        "no".getBytes("UTF-8"), headers = Map("Retry-After" -> "1"))))
    ) { base =>
      val t = new HttpTransport(sleeper = sleeps.append(_))
      val df = Rest.readVia(spark, t, s"$base/limited", "$[*]",
        Some("id INT"))
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(5))
      assert(sleeps.toSeq == Seq(2000L),
        "Retry-After seconds win over the backoff schedule")
      val drop = collection.mutable.Buffer.empty[Long]
      val e = intercept[java.io.IOException](Rest.readVia(spark,
        new HttpTransport(maxRetries = 2, sleeper = drop.append(_)),
        s"$base/always429", "$[*]"))
      assert(e.getMessage.contains("HTTP 429") &&
        e.getMessage.contains("after 2 retries"))
      assert(drop.size == 2, "budget consumed before giving up")
    }
  }

  test("live loopback: redirects are followed with a bound; loops throw") {
    withServer(Map(
      "/old" -> { ex =>
        ex.getResponseHeaders.add("Location", "/new")
        ex.sendResponseHeaders(302, -1)
      },
      "/new" -> (ex => respond(ex, 200, """[{"id": 11}]""".getBytes("UTF-8"))),
      "/ping" -> { ex =>
        ex.getResponseHeaders.add("Location", "/pong")
        ex.sendResponseHeaders(301, -1)
      },
      "/pong" -> { ex =>
        ex.getResponseHeaders.add("Location", "/ping")
        ex.sendResponseHeaders(301, -1)
      })) { base =>
      val df = Rest.readVia(spark, new HttpTransport(), s"$base/old",
        "$[*]", Some("id INT"))
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(11))
      val e = intercept[java.io.IOException](Rest.readVia(spark,
        new HttpTransport(maxRedirects = 4), s"$base/ping", "$[*]"))
      assert(e.getMessage.contains("redirect chain exceeded 4"))
    }
  }

  test("redirect hygiene: credentials never cross origins; non-http " +
      "targets refuse") {
    // two loopback servers = two origins (the port differs): a
    // redirect from A to B must arrive at B WITHOUT the configured
    // headers, while a same-origin hop keeps them
    val seenAtB = new java.util.concurrent.atomic.AtomicReference[String]()
    withServer(Map("/landing" -> { ex =>
      seenAtB.set(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, """[{"id": 1}]""".getBytes("UTF-8"))
    })) { baseB =>
      val seenSameOrigin =
        new java.util.concurrent.atomic.AtomicReference[String]()
      withServer(Map(
        "/out" -> { ex =>
          ex.getResponseHeaders.add("Location", s"$baseB/landing")
          ex.sendResponseHeaders(302, -1)
        },
        "/inhop" -> { ex =>
          ex.getResponseHeaders.add("Location", "/inland")
          ex.sendResponseHeaders(302, -1)
        },
        "/inland" -> { ex =>
          seenSameOrigin.set(ex.getRequestHeaders.getFirst("Authorization"))
          respond(ex, 200, """[{"id": 2}]""".getBytes("UTF-8"))
        },
        "/toftp" -> { ex =>
          ex.getResponseHeaders.add("Location", "ftp://evil.example/x")
          ex.sendResponseHeaders(302, -1)
        })) { baseA =>
        val t = () => new HttpTransport(
          headers = Map("Authorization" -> "Bearer secret"))
        val cross = Rest.readVia(spark, t(), s"$baseA/out", "$[*]",
          Some("id INT"))
        assert(cross.collect().map(_.getInt(0)).toSeq == Seq(1))
        assert(seenAtB.get() == null,
          "credentials must be STRIPPED on a cross-origin redirect")
        val same = Rest.readVia(spark, t(), s"$baseA/inhop", "$[*]",
          Some("id INT"))
        assert(same.collect().map(_.getInt(0)).toSeq == Seq(2))
        assert(seenSameOrigin.get() == "Bearer secret",
          "a same-origin hop keeps the configured headers")
        val e = intercept[java.io.IOException](Rest.readVia(spark, t(),
          s"$baseA/toftp", "$[*]"))
        assert(e.getMessage.contains("non-http(s)"),
          s"redirect off http(s) must refuse: ${e.getMessage}")
      }
    }
  }

  test("live loopback: a self-linking page hits the maxPages bound") {
    withServer(Map("/loop" -> (ex => respond(ex, 200,
      """[{"id": 1}]""".getBytes("UTF-8"),
      headers = Map("Link" -> "</loop>; rel=\"next\""))))) { base =>
      val e = intercept[RuntimeException](Rest.readVia(spark,
        new HttpTransport(), s"$base/loop", "$[*]", maxPages = 5))
      assert(e.getMessage.contains("5 pages"))
    }
  }

  test("live loopback TLS: self-signed HttpsServer needs explicit trust") {
    import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}
    // a real keypair via the JDK's own keytool (SAN=IP so hostname
    // verification passes for the loopback address)
    val dir = java.nio.file.Files.createTempDirectory("rest_tls")
    val ks = dir.resolve("srv.p12")
    val pw = "graft-test"
    val rc = new ProcessBuilder("keytool", "-genkeypair", "-alias", "srv",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "2",
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      "-storepass", pw, "-keypass", pw).start().waitFor()
    assert(rc == 0, "keytool must generate the test keypair")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(ks)
    try store.load(in, pw.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, pw.toCharArray)
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store)
    val serverCtx = SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val clientCtx = SSLContext.getInstance("TLS")
    clientCtx.init(null, tmf.getTrustManagers, null)
    val srv = com.sun.net.httpserver.HttpsServer.create(
      new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, 0), 0)
    srv.setHttpsConfigurator(
      new com.sun.net.httpserver.HttpsConfigurator(serverCtx))
    srv.createContext("/secure",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        try respond(ex, 200, """[{"id": 7}]""".getBytes("UTF-8"))
        finally ex.close())
    srv.start()
    try {
      val base = s"https://127.0.0.1:${srv.getAddress.getPort}"
      // default trust store: the self-signed cert must be REFUSED —
      // the sslContext override is opt-in, never a global bypass
      intercept[java.io.IOException](Rest.readVia(spark,
        new HttpTransport(), s"$base/secure", "$[*]"))
      // explicit trust: a real TLS handshake + fetch end-to-end
      val df = Rest.readVia(spark,
        new HttpTransport(sslContext = Some(clientCtx)),
        s"$base/secure", "$[*]", Some("id INT"))
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(7))
    } finally srv.stop(0)
  }

  test("Link header parsing: rel=next among other rels, quoting forms") {
    val t = new HttpTransport()
    assert(t.nextLink("""<u2>; rel="next"""").contains("u2"))
    assert(t.nextLink("""<a>; rel="prev", <b>; rel=next, <c>; rel="last"""")
      .contains("b"))
    assert(t.nextLink("""<a>; rel="first"""").isEmpty)
    assert(t.nextLink("""<a>; title="next"""").isEmpty,
      "rel is the attribute that matters, not other params")
    // RFC 8288: commas are legal INSIDE <...> — tokenization must
    // respect angle brackets, not split the header blindly on ','
    assert(t.nextLink(
      """</items?ids=1,2,3&page=2>; rel="next", <a>; rel="prev"""")
      .contains("/items?ids=1,2,3&page=2"))
    assert(t.nextLink(
      """<a>; rel="first", </x?y=a,b>; rel=next""").contains("/x?y=a,b"))
  }

  test("Retry-After parsing: integer seconds, capped; date form ignored") {
    val t = new HttpTransport(maxRetryAfterMs = 5000)
    assert(t.retryAfterMs("2").contains(2000L))
    assert(t.retryAfterMs(" 3 ").contains(3000L))
    assert(t.retryAfterMs("999999").contains(5000L), "capped at the max")
    assert(t.retryAfterMs("Wed, 21 Oct 2026 07:28:00 GMT").isEmpty,
      "HTTP-date form falls back to the backoff schedule")
    assert(t.retryAfterMs(null).isEmpty)
  }

  test("the default FileTransport keeps the zero-egress stance") {
    val e = intercept[RuntimeException] {
      Rest.FileTransport.fetch("https://api.test/items")
    }
    assert(e.getMessage.contains("zero egress"))
    val f = java.nio.file.Files.createTempFile("rest_one", ".json")
    java.nio.file.Files.write(f, """{"ok": true}""".getBytes("UTF-8"))
    val df = Rest.readVia(spark, Rest.FileTransport, s"file://$f", "$.ok")
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true))
  }
}
