package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** S5: the reference's HTTP REST fetch (reference work.py:52-82,
  * streaming_pipeline.py:258-308), as a driver-side utility. The
  * reference polls the GNews REST endpoint, stamps each article with
  * `fetched_at`, and appends NDJSON for the pipeline to pick up; this
  * does the same with JDK-only HTTP (java.net.http) and Spark's bundled
  * Jackson, writing one atomic NDJSON batch file into the directory the
  * streaming source (S1, NewsStream) watches.
  *
  * Driver-side BY DESIGN (SURVEY.md §2.1): a rate-limited external API
  * poll belongs on the driver's clock, not inside an executor task —
  * the engine's source contract is file arrival, which keeps the
  * streaming query replayable/checkpointable regardless of API flakes.
  */
object HttpFetcher {

  private val mapper = new ObjectMapper()

  /** one client for the object's lifetime — each HttpClient owns a
    * selector thread + connection pool, so a per-call client would leak
    * a thread per poll until GC
    */
  private lazy val client =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** monotonic suffix: two fetches in the same millisecond (or with the
    * same explicit fetchedAt) must not collide — ATOMIC_MOVE would
    * silently replace a batch the stream already recorded as processed
    */
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** GET `endpoint`, expect `{"articles": [...]}` (the GNews response
    * shape), stamp each article with `fetched_at`, and write all of them
    * as one NDJSON file into `watchDir` (temp file + atomic move, so the
    * watching stream never sees a half-written batch). Returns the
    * written path, or None when the response has no articles.
    */
  def fetchOnce(endpoint: URI, watchDir: String,
      fetchedAt: java.time.Instant = java.time.Instant.now(),
      timeout: Duration = Duration.ofSeconds(10)): Option[Path] = {
    val req = HttpRequest.newBuilder(endpoint).timeout(timeout).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"fetch failed: HTTP ${resp.statusCode()} from $endpoint")
    writeArticles(resp.body(), watchDir, fetchedAt)
  }

  /** Parse an `{"articles": [...]}` payload and write the NDJSON batch —
    * split out so tests can exercise the transform without a socket.
    */
  def writeArticles(payload: String, watchDir: String,
      fetchedAt: java.time.Instant): Option[Path] = {
    val root = mapper.readTree(payload)
    val articles = root.path("articles")
    if (!articles.isArray || articles.isEmpty) return None
    val sb = new StringBuilder
    articles.forEach { a =>
      val obj = a.asInstanceOf[ObjectNode]
      obj.put("fetched_at", fetchedAt.toString) // work.py:76 shape
      sb.append(mapper.writeValueAsString(obj)).append('\n')
    }
    val dir = Paths.get(watchDir)
    Files.createDirectories(dir)
    val name = s"fetch_${fetchedAt.toEpochMilli}_${seq.incrementAndGet()}.json"
    val tmp = Files.createTempFile(dir, ".fetch", ".tmp")
    Files.write(tmp, sb.toString.getBytes("UTF-8"))
    Some(Files.move(tmp, dir.resolve(name),
      StandardCopyOption.ATOMIC_MOVE))
  }
}
