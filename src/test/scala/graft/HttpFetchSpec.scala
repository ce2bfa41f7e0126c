package graft

import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpFetch

/** S10 acquisition feeder against a local JDK HttpServer standing in for
  * the remote directory index: node discovery with natural sort, required-
  * file gating, retried downloads with atomic landing. */
class HttpFetchSpec extends AnyFunSuite {

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  private def withServer(f: String => Unit): Unit = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger
    srv.createContext("/", (x: HttpExchange) => {
      val p = x.getRequestURI.getPath
      p match {
        case "/" => respond(x, 200,
          // NODE10 listed before NODE2: natural sort must reorder; a non-
          // node link must be ignored
          """<html><a href="NODE10/">NODE10</a> <a href="NODE2/">NODE2</a>
            |<a href="logs/">logs</a></html>""".stripMargin)
        case "/NODE2/" => respond(x, 200,
          """<a href="block.csv">block.csv</a><a href="cpu.csv">cpu.csv</a>""")
        case "/NODE10/" => // missing cpu.csv -> node must be skipped
          respond(x, 200, """<a href="block.csv">block.csv</a>""")
        case "/NODE2/block.csv" =>
          // first attempt fails: download must retry and then land
          if (flakyHits.incrementAndGet() == 1) respond(x, 503, "flaky")
          else respond(x, 200, "Host,v\nn2,1\n")
        case "/NODE2/cpu.csv" => respond(x, 200, "Host,user\nn2,9\n")
        case _ => respond(x, 404, "nope")
      }
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/")
    finally srv.stop(0)
  }

  test("acquireNodes: discovers, sorts naturally, gates on required files, retries") {
    withServer { base =>
      val nodes = HttpFetch.nodeDirs(base)
      assert(nodes.map(_._1) == Seq("NODE2", "NODE10")) // numeric, not lexical
      val landing = Files.createTempDirectory("landing").toString
      val fetched = HttpFetch.acquireNodes(base,
        Seq("block.csv", "cpu.csv"), landing)
      assert(fetched == Seq("NODE2")) // NODE10 lacks cpu.csv -> skipped
      val block = new String(Files.readAllBytes(
        java.nio.file.Paths.get(landing, "NODE2", "block.csv")), "UTF-8")
      assert(block.contains("n2,1")) // retried past the 503
      import scala.jdk.CollectionConverters._
      val names = Files.list(java.nio.file.Paths.get(landing, "NODE2"))
        .iterator().asScala.map(_.getFileName.toString).toSet
      // exactly the required files, and no .part staging residue
      assert(names == Set("block.csv", "cpu.csv"))
    }
  }

  test("requiredFileUrls: None when any required file is missing") {
    withServer { base =>
      assert(HttpFetch.requiredFileUrls(base + "NODE10/",
        Seq("block.csv", "cpu.csv")).isEmpty)
      val some = HttpFetch.requiredFileUrls(base + "NODE2/",
        Seq("block.csv", "cpu.csv"))
      assert(some.exists(_.keySet == Set("block.csv", "cpu.csv")))
    }
  }

  test("downloadFile truncates a stale longer .part — no trailing garbage lands") {
    withServer { base =>
      val landing = Files.createTempDirectory("landing-trunc")
      val dest = landing.resolve("cpu.csv")
      // residue of a failed earlier attempt, LONGER than the real body: a
      // CREATE+WRITE-only handler would overwrite the prefix and rename
      // the trailing garbage in as part of a "complete" file
      Files.write(dest.resolveSibling("cpu.csv.part"),
        ("X" * 500).getBytes("UTF-8"))
      HttpFetch.downloadFile(base + "NODE2/cpu.csv", dest)
      val got = new String(Files.readAllBytes(dest), "UTF-8")
      assert(got == "Host,user\nn2,9\n", s"stale bytes leaked: ${got.length} bytes")
      assert(!Files.exists(dest.resolveSibling("cpu.csv.part")))
    }
  }

  test("downloadFile cleans up .part after the final failed attempt") {
    withServer { base =>
      val landing = Files.createTempDirectory("landing-fail")
      val dest = landing.resolve("gone.csv")
      intercept[java.io.IOException](
        HttpFetch.downloadFile(base + "missing.csv", dest, retries = 2, waitMillis = 10))
      assert(!Files.exists(dest))
      assert(!Files.exists(dest.resolveSibling("gone.csv.part")),
        "orphan .part residue after exhausted retries")
    }
  }

  test("fetchHtml: exhausted retries raise, not hang") {
    withServer { base =>
      val e = intercept[java.io.IOException](
        HttpFetch.fetchHtml(base + "missing", retries = 2, waitMillis = 10))
      assert(e.getMessage.contains("failed after 2 attempts"))
    }
  }
}
