package graft

import java.net.{InetSocketAddress, URI}
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import graft.schema.NewsArticle
import graft.sources.HttpFetcher

/** S5: the driver-side REST fetch → watched-dir NDJSON handoff, driven
  * against an in-process JDK HttpServer (no egress). The written batch
  * must be readable by the S2 batch source with the pipeline schema.
  */
class HttpFetcherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val payload =
    """{"totalArticles": 2, "articles": [
      |  {"id": "x1", "title": "First headline", "description": "a good day",
      |   "url": "https://example.invalid/1", "publishedAt": "2024-01-01T10:00:00Z", "lang": "en"},
      |  {"id": "x2", "title": "Second headline", "description": "a bad day",
      |   "url": "https://example.invalid/2", "publishedAt": "2024-01-01T11:00:00Z", "lang": "en"}
      |]}""".stripMargin

  test("fetchOnce pulls articles over HTTP and lands an atomic NDJSON batch") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v4/top-headlines", { exchange =>
      val bytes = payload.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val dir = Files.createTempDirectory("fetch_watch").toString
      val at = java.time.Instant.parse("2024-01-01T12:00:00Z")
      val port = server.getAddress.getPort
      val written = HttpFetcher.fetchOnce(
        new URI(s"http://127.0.0.1:$port/v4/top-headlines?lang=en"),
        dir, fetchedAt = at)
      assert(written.isDefined)
      assert(written.get.getFileName.toString.endsWith(".json"))

      // the batch reads back through the S2 source with fetched_at stamped
      val df = spark.read.schema(NewsArticle.schema).json(dir)
      val rows = df.collect().map(r => r.getAs[String]("id") ->
        r.getAs[String]("fetched_at")).toMap
      assert(rows == Map("x1" -> "2024-01-01T12:00:00Z",
        "x2" -> "2024-01-01T12:00:00Z"))
    } finally server.stop(0)
  }

  test("same-fetchedAt batches land as distinct files, never replaced") {
    val dir = Files.createTempDirectory("fetch_seq").toString
    val at = java.time.Instant.parse("2024-01-01T12:00:00Z")
    val p1 = HttpFetcher.writeArticles(payload, dir, at)
    val p2 = HttpFetcher.writeArticles(payload, dir, at)
    assert(p1.isDefined && p2.isDefined && p1.get != p2.get)
    assert(new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".json")) == 2)
  }

  test("non-200 responses raise; empty article lists write nothing") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/limit", { exchange =>
      exchange.sendResponseHeaders(429, -1); exchange.close()
    })
    server.start()
    try {
      val dir = Files.createTempDirectory("fetch_err").toString
      val port = server.getAddress.getPort
      intercept[java.io.IOException] {
        HttpFetcher.fetchOnce(new URI(s"http://127.0.0.1:$port/limit"), dir)
      }
      assert(HttpFetcher.writeArticles("""{"articles": []}""", dir,
        java.time.Instant.EPOCH).isEmpty)
      assert(new java.io.File(dir).listFiles.isEmpty)
    } finally server.stop(0)
  }
}
