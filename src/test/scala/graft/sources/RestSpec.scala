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
