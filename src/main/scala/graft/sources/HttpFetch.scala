package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

/** HTTP acquisition feeder (SURVEY.md §2.1 S10): the reference's entry
  * point — scrape an HTML directory index for node folders, find each
  * node's required files, download them into the landing directory the
  * [[graft.streaming.Compactor]] watches
  * (`step-1/transformer.py:43-176`: `fetch_html` with fixed-wait retries,
  * `get_node_urls` with natural node sort, `get_required_file_urls`
  * returning None on any missing file, `download_file`).
  *
  * Driver-side by DESIGN, like the reference: acquisition is the thin edge
  * that feeds the distributed pipeline, not part of it — the downloads
  * land in a directory and Structured Streaming takes over. Downloads are
  * staged to a `.part` temp name and atomically renamed so the watching
  * file source never reads a half-written file (write-validate-rename,
  * S14, applied at the ingest edge).
  */
object HttpFetch {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(20))
    .build()

  /** GET a URL as text, with `retries` fixed-wait attempts
    * (`transformer.py` NETWORK_RETRIES/NETWORK_WAIT_SECONDS). */
  def fetchHtml(url: String, retries: Int = 3, waitMillis: Long = 2000): String =
    withRetries(url, retries, waitMillis) {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }

  /** `(linkText, href)` pairs of an HTML page — directory indexes are flat
    * `<a href="...">name</a>` listings, a regex is the whole parser. */
  def hrefs(html: String): Seq[(String, String)] =
    """(?is)<a\s[^>]*href\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a>""".r
      .findAllMatchIn(html)
      .map(m => (m.group(2).replaceAll("<[^>]*>", "").trim, m.group(1)))
      .toSeq

  /** Node directories under a base index, naturally sorted by the numeric
    * part of the name (NODE2 before NODE10 — `transformer.py:86-88`). */
  def nodeDirs(baseUrl: String, namePattern: String = """(NODE\d+)/?"""): Seq[(String, String)] = {
    val pat = namePattern.r
    hrefs(fetchHtml(baseUrl)).collect {
      case (text, href) if pat.pattern.matcher(text).matches() =>
        val name = pat.findFirstMatchIn(text).get.group(1)
        (name, resolve(baseUrl, href, ensureSlash = true))
    }.sortBy { case (name, _) =>
      """\d+""".r.findFirstIn(name).map(_.toLong).getOrElse(Long.MaxValue)
    }
  }

  /** Download URLs for each of `required` under a node dir; None if ANY is
    * missing (the reference skips incomplete nodes —
    * `transformer.py:116-121`). */
  def requiredFileUrls(nodeUrl: String,
                       required: Seq[String]): Option[Map[String, String]] = {
    val found = hrefs(fetchHtml(nodeUrl))
      .collect { case (text, href) if required.contains(text) =>
        text -> resolve(nodeUrl, href, ensureSlash = false) }
      .toMap
    if (required.forall(found.contains)) Some(found) else None
  }

  /** Stream a URL to `dest`: staged as `dest.part`, atomically renamed
    * only after the full body is on disk. Each attempt TRUNCATES the stage
    * file (the default `ofFile` handler opens CREATE+WRITE only, so a
    * retry after a failed longer attempt — an error body, an interrupted
    * download — would leave trailing garbage that then gets renamed in as
    * a "complete" file); the stage file is removed after the final failed
    * attempt so no orphan `.part` lingers in the landing tree. */
  def downloadFile(url: String, dest: Path, retries: Int = 3,
                   waitMillis: Long = 2000): Unit = {
    Files.createDirectories(dest.getParent)
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".part")
    try withRetries(url, retries, waitMillis) {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofFile(tmp,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
          java.nio.file.StandardOpenOption.WRITE))
      require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} for $url")
      Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
  }

  /** The composed acquisition loop: for every node dir under `baseUrl`
    * with ALL `required` files present, download them to
    * `landingDir/<node>/<file>`. Returns the node names fetched. */
  def acquireNodes(baseUrl: String, required: Seq[String],
                   landingDir: String): Seq[String] =
    nodeDirs(baseUrl).flatMap { case (name, nodeUrl) =>
      requiredFileUrls(nodeUrl, required).map { urls =>
        urls.foreach { case (file, url) =>
          downloadFile(url, Paths.get(landingDir, name, file))
        }
        name
      }
    }

  private def resolve(base: String, href: String, ensureSlash: Boolean): String = {
    val abs = URI.create(if (base.endsWith("/")) base else base + "/")
      .resolve(href).toString
    if (ensureSlash && !abs.endsWith("/")) abs + "/" else abs
  }

  private def withRetries[T](what: String, retries: Int, waitMillis: Long)(f: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    var lastErr: Throwable = null
    while (out.isEmpty && attempt < retries) {
      attempt += 1
      try out = Some(f)
      catch {
        case e: Throwable =>
          lastErr = e
          if (attempt < retries) Thread.sleep(waitMillis)
      }
    }
    out.getOrElse(throw new java.io.IOException(
      s"failed after $retries attempts: $what", lastErr))
  }
}
