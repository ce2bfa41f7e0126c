package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.runner.Main
import graft.sources.HttpFetch

/** Full reference topology rehearsal, end to end in ONE spec: the remote
  * directory index (S10 `HttpFetch`) → raw CSV landing → step-1 transform →
  * parquet landing dir → streaming compactor drain (T1/T2) → step-2
  * interval-join + bucketed wide table → step-3 finalize. Every stage is
  * individually specced elsewhere; this proves the seams — the same files,
  * directories and schemas flow through the entire chain the reference
  * runs in production (`transformer.py` → `mover/appender` → step-2/3). */
class TopologySpec extends SparkSpec {

  private val T = "01/01/2013"

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  private val csvBodies = Map(
    "block.csv" ->
      ("jobID,node,timestamp,device,rd_sectors,wr_sectors\n" +
        s"job1,N1,$T 10:00:00,sda,0,0\n" +
        s"job1,N1,$T 10:01:00,sda,1048576,1048576\n"),
    "cpu.csv" ->
      ("jobID,node,timestamp,device,user,nice,system,idle,iowait,irq,softirq\n" +
        s"job1,N1,$T 10:00:00,cpu0,100,0,0,900,0,0,0\n" +
        s"job1,N1,$T 10:01:00,cpu0,200,0,0,1800,0,0,0\n"),
    "llite.csv" ->
      ("jobID,node,timestamp,read_bytes,write_bytes\n" +
        s"job1,N1,$T 10:00:00,0,0\n" +
        s"job1,N1,$T 10:01:00,52428800,52428800\n"),
    "mem.csv" ->
      ("jobID,node,timestamp,MemTotal,MemFree,MemUsed,FilePages\n" +
        s"job1,N1,$T 10:00:00,2147483648,1073741824,1073741824,536870912\n"))

  private def withServer(f: String => Unit): Unit = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (x: HttpExchange) => {
      x.getRequestURI.getPath match {
        case "/" => respond(x, 200, """<a href="NODE1/">NODE1</a>""")
        case "/NODE1/" => respond(x, 200,
          csvBodies.keys.map(n => s"""<a href="$n">$n</a>""").mkString)
        case p if p.startsWith("/NODE1/") && csvBodies.contains(p.stripPrefix("/NODE1/")) =>
          respond(x, 200, csvBodies(p.stripPrefix("/NODE1/")))
        case _ => respond(x, 404, "nope")
      }
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}/")
    finally srv.stop(0)
  }

  private def dir(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toFile.getAbsolutePath

  test("HTTP acquire → step1 → compactor drain → step2 → step3: the reference topology") {
    withServer { base =>
      // S10: scrape the index, gate on the four required families, land raw CSVs
      val rawLanding = dir("topo-raw")
      val fetched = HttpFetch.acquireNodes(base, csvBodies.keys.toSeq.sorted, rawLanding)
      assert(fetched == Seq("NODE1"))

      // step 1: raw CSVs → FRESCO long, written as parquet into the dir the
      // compactor watches (the transformer → mover handoff)
      val node = s"$rawLanding/NODE1"
      val fresco = Pipeline.step1(spark, s"$node/block.csv", s"$node/cpu.csv",
        s"$node/llite.csv", s"$node/mem.csv")
      val parquetLanding = dir("topo-landing")
      fresco.write.mode("overwrite").parquet(parquetLanding)
      val nFresco = fresco.count()
      assert(nFresco > 0)

      // T1/T2: streaming compactor drains the backlog exactly-once into the
      // daily-partitioned store (same surface the CLI exposes)
      val compacted = dir("topo-compacted")
      val ckpt = dir("topo-ckpt")
      Main.run(Seq("compact", "--landing", parquetLanding, "--out", compacted,
        "--checkpoint", ckpt, "--once"), spark)
      val store = spark.read.parquet(compacted)
      assert(store.count() == nFresco)
      assert(store.columns.contains("date")) // daily layout

      // steps 2+3 read the COMPACTED store, not the transformer output
      val acct = tmpCsv("accounting.csv",
        "jobID,user,account,jobname,queue,nnodes,ncpus,walltime,start,end,submit,exit_status",
        s"job1,alice,acctA,sim,normal,1,16,3600,$T 10:00:00,$T 10:02:00,$T 09:59:00,0")
      val out = Pipeline.step3(Pipeline.step2(spark, compacted, acct)).collect()
      assert(out.length == 2) // job1: 1-minute buckets 0 and 1
      assert(out.forall(_.getAs[String]("host") == "N1_S"))
      assert(out.forall(_.getAs[String]("jid") == "1_S"))
      assert(out.forall(_.getAs[String]("username") == "alice_S"))
      assert(out.forall(_.getAs[String]("host_list") == "N1_S"))
      // the metric values made it through the whole chain, not just the keys
      assert(out.exists(r => !r.isNullAt(r.fieldIndex("value_block"))))
    }
  }
}
