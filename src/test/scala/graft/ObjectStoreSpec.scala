package graft

import org.apache.spark.sql.functions._

import graft.sources.ObjectStore

/** S11/S12: the engine's object-store path, exercised end to end through
  * `s3a://` URIs served by [[graft.sources.StubS3FileSystem]] — the same
  * `FileSystem` calls the real hadoop-aws connector would serve (which
  * cannot be vendored in this zero-egress build; see ObjectStore docs).
  * The stub emulates object-store semantics: non-atomic copy+delete
  * rename, no append — so the commit protocol is proven NOT to rely on
  * POSIX atomicity. */
class ObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stubs3").toFile
    dir.deleteOnExit()
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", "graft.sources.StubS3FileSystem")
    hc.set("fs.stubs3.root", dir.getAbsolutePath)
    // hadoop core-default pre-wires the s3a SCHEME to S3ACommitterFactory
    // (hadoop-aws); point it back at the rename-based default so the stub
    // exercises the classic commit dance
    hc.set("mapreduce.outputcommitter.factory.scheme.s3a",
      "org.apache.hadoop.mapreduce.lib.output.FileOutputCommitterFactory")
    dir
  }

  test("parquet round-trip through s3a: committer rename dance on object-store semantics") {
    root // force registration
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "v")
    df.write.mode("overwrite").parquet("s3a://test-bucket/warehouse/t1")
    val back = spark.read.parquet("s3a://test-bucket/warehouse/t1")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // overwrite replaces, not merges
    df.filter($"id" === 1).write.mode("overwrite")
      .parquet("s3a://test-bucket/warehouse/t1")
    assert(spark.read.parquet("s3a://test-bucket/warehouse/t1").count() == 1)
  }

  test("uploadFolder: every file in a local dir lands in the bucket, key = basename") {
    root
    val local = java.nio.file.Files.createTempDirectory("graft-up").toFile
    for (n <- Seq("a.csv", "b.csv", "c.csv")) {
      val w = new java.io.PrintWriter(new java.io.File(local, n))
      try { w.println("Host,v"); w.println(s"h-$n,1") } finally w.close()
    }
    val n = ObjectStore.uploadFolder(spark, local.getAbsolutePath,
      "s3a://test-bucket/incoming")
    assert(n == 3)
    val keys = spark.read.option("header", "true")
      .csv("s3a://test-bucket/incoming")
      .select(input_file_name()).distinct().as[String].collect()
    assert(keys.length == 3 && keys.forall(_.contains("test-bucket/incoming/")))
  }

  test("readFilterWriteback: drops matching rows in place, survivors intact") {
    root
    // reference semantics (s3_data_cleanup.py): remove rows whose Host
    // equals the node being scrubbed, keep everything else byte-equal
    Seq(("NODE404", 1), ("keep-1", 2), ("NODE404", 3), ("keep-2", 4))
      .toDF("Host", "v")
      .write.mode("overwrite").option("header", "true")
      .csv("s3a://test-bucket/metrics")
    val (before, after) = ObjectStore.readFilterWriteback(spark,
      "s3a://test-bucket/metrics", col("Host") === "NODE404")
    assert(before == 4 && after == 2)
    val left = spark.read.option("header", "true")
      .csv("s3a://test-bucket/metrics")
      .select("Host", "v").as[(String, String)].collect().toSet
    assert(left == Set(("keep-1", "2"), ("keep-2", "4")))
    // no temp prefix left behind after the swap
    val fs = new org.apache.hadoop.fs.Path("s3a://test-bucket/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path("s3a://test-bucket/metrics_graft_tmp")))
  }

  test("readFilterWriteback keeps NULL-keyed rows (NULL predicate is not a match)") {
    root
    // a missing Host cell reads back as NULL; NULL === 'NODE404' is NULL and
    // the reference keeps such rows — a bare filter(!drop) would drop them
    val df = Seq(("NODE404", "1"), (null, "2"), ("keep", "3")).toDF("Host", "v")
    df.write.mode("overwrite").option("header", "true")
      .csv("s3a://test-bucket/nullmetrics")
    val (before, after) = ObjectStore.readFilterWriteback(spark,
      "s3a://test-bucket/nullmetrics", col("Host") === "NODE404")
    assert(before == 3 && after == 2)
    val left = spark.read.option("header", "true")
      .csv("s3a://test-bucket/nullmetrics")
      .select("v").as[String].collect().toSet
    assert(left == Set("2", "3"), "the NULL-Host row must survive the writeback")
  }

  test("writeback swap: original survives a crash between the two renames") {
    root
    val fs = new org.apache.hadoop.fs.Path("s3a://test-bucket/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"s3a://test-bucket/$s")
    // replay the swap protocol readFilterWriteback performs, crashing
    // after step 1: the original must exist COMPLETE at _graft_old and the
    // new data at _graft_tmp — nothing is lost, both recovery paths work
    Seq(("orig", 1)).toDF("Host", "v").write.mode("overwrite")
      .option("header", "true").csv("s3a://test-bucket/swap")
    Seq(("new", 2)).toDF("Host", "v").write.mode("overwrite")
      .option("header", "true").csv("s3a://test-bucket/swap_graft_tmp")
    assert(fs.rename(p("swap"), p("swap_graft_old"))) // step 1, then "crash"
    assert(!fs.exists(p("swap")))
    assert(spark.read.option("header", "true").csv("s3a://test-bucket/swap_graft_old")
      .select("Host").as[String].collect().toSeq == Seq("orig"),
      "original bytes must survive the crash window complete")
    // recovery path A: roll forward (what a re-run's swap tail does)
    assert(fs.rename(p("swap_graft_tmp"), p("swap")))
    fs.delete(p("swap_graft_old"), true)
    assert(spark.read.option("header", "true").csv("s3a://test-bucket/swap")
      .select("Host").as[String].collect().toSeq == Seq("new"))
    // and a fresh full readFilterWriteback leaves neither staging prefix
    val (_, after) = ObjectStore.readFilterWriteback(spark,
      "s3a://test-bucket/swap", col("Host") === "nomatch")
    assert(after == 1)
    assert(!fs.exists(p("swap_graft_tmp")) && !fs.exists(p("swap_graft_old")))
  }

  test("readFilterWriteback self-heals a crashed swap at entry; ambiguous state fails loudly") {
    root
    val fs = new org.apache.hadoop.fs.Path("s3a://test-bucket/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"s3a://test-bucket/$s")
    // simulate the crash BETWEEN the two renames: live prefix gone, the
    // original complete at _graft_old — a plain re-run must roll it back
    // and then run normally (compactDaily's entry-time repair, mirrored)
    Seq(("NODE404", "1"), ("keep", "2")).toDF("Host", "v")
      .write.mode("overwrite").option("header", "true")
      .csv("s3a://test-bucket/heal_graft_old")
    assert(!fs.exists(p("heal")))
    val (before, after) = ObjectStore.readFilterWriteback(spark,
      "s3a://test-bucket/heal", col("Host") === "NODE404")
    assert(before == 2 && after == 1, "repair must restore the original, then filter it")
    assert(!fs.exists(p("heal_graft_old")))
    // live + _graft_old with _graft_tmp fully GONE = the swap completed
    // and the crash hit before delete(old): live IS the new data, so a
    // re-run self-heals (drops old) and proceeds against live
    Seq(("a", "1"), ("keepme", "2")).toDF("Host", "v").write.mode("overwrite")
      .option("header", "true").csv("s3a://test-bucket/done")
    Seq(("stale", "9")).toDF("Host", "v").write.mode("overwrite")
      .option("header", "true").csv("s3a://test-bucket/done_graft_old")
    val (b2, a2) = ObjectStore.readFilterWriteback(
      spark, "s3a://test-bucket/done", col("Host") === "a")
    assert(b2 == 2 && a2 == 1, "completed-swap state must proceed from live")
    assert(!fs.exists(p("done_graft_old")))
    // live + _graft_old + _graft_tmp ALL present is genuinely ambiguous
    // (mid rename-aside or mid rename-in): refuse, name the prefixes
    Seq(("a", "1")).toDF("Host", "v").write.mode("overwrite")
      .option("header", "true").csv("s3a://test-bucket/amb")
    Seq(("b", "2")).toDF("Host", "v").write.mode("overwrite")
      .option("header", "true").csv("s3a://test-bucket/amb_graft_old")
    Seq(("c", "3")).toDF("Host", "v").write.mode("overwrite")
      .option("header", "true").csv("s3a://test-bucket/amb_graft_tmp")
    val e = intercept[java.io.IOException](ObjectStore.readFilterWriteback(
      spark, "s3a://test-bucket/amb", col("Host") === "a"))
    assert(e.getMessage.contains("amb") && e.getMessage.contains("amb_graft_old"))
    // nothing was touched by the refusal
    assert(fs.exists(p("amb")) && fs.exists(p("amb_graft_old")) &&
      fs.exists(p("amb_graft_tmp")))
  }

  test("reliable CC checkpoints write to s3a:// and clusters stay correct") {
    // composes the two cluster features: Dedup's reliable-checkpoint mode
    // (executor-loss survival) against object-store rename semantics —
    // the checkpoint story a 1000-executor deployment actually runs
    // (setCheckpointDir on a shared store, not executor-local disk)
    root
    import graft.operators.Dedup
    spark.sparkContext.setCheckpointDir("s3a://test-bucket/cc-ckpt")
    spark.conf.set(Dedup.ReliableCheckpointKey, "true")
    try {
      val pairs = Seq((1L, 2L), (2L, 6L), (8L, 9L)).toDF("id_a", "id_b")
      val got = Dedup.duplicateClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 6L -> 1L, 8L -> 8L, 9L -> 8L))
      val fs = new org.apache.hadoop.fs.Path("s3a://test-bucket/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ckpt = new org.apache.hadoop.fs.Path("s3a://test-bucket/cc-ckpt")
      assert(fs.exists(ckpt) && fs.listStatus(ckpt).nonEmpty,
        "checkpoint rounds must land on the object store")
    } finally {
      spark.conf.set(Dedup.ReliableCheckpointKey, "false")
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt-local").toString)
    }
  }

  test("reliable cosine-LSH index checkpoints to s3a:// and pairs stay correct") {
    // same composition for the OTHER flagship scale path: Similarity's
    // LSH index goes through Materialize, so the one conf key gives the
    // embedding near-dup pipeline the identical object-store durability
    root
    import graft.operators.{Dedup, Similarity}
    spark.sparkContext.setCheckpointDir("s3a://test-bucket/lsh-ckpt")
    spark.conf.set(Dedup.ReliableCheckpointKey, "true")
    try {
      val vecs = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
        (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(0.0f, 0.9f, 0.1f)),
        (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
      val got = Similarity.lshCosinePairs(vecs, "vec_id", "embedding",
          dims = 3, minCosine = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((0L, 1L), (2L, 3L)))
      val fs = new org.apache.hadoop.fs.Path("s3a://test-bucket/")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ckpt = new org.apache.hadoop.fs.Path("s3a://test-bucket/lsh-ckpt")
      assert(fs.exists(ckpt) && fs.listStatus(ckpt).nonEmpty,
        "LSH index checkpoint must land on the object store")
    } finally {
      spark.conf.set(Dedup.ReliableCheckpointKey, "false")
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt-local2").toString)
    }
  }

  test("object-store semantics enforced: append rejected, rename non-destructive") {
    root
    val fs = new org.apache.hadoop.fs.Path("s3a://test-bucket/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path("s3a://test-bucket/x/file1")
    val out = fs.create(p, true)
    out.write("hello".getBytes); out.close()
    intercept[UnsupportedOperationException](fs.append(p))
    // rename onto an existing target returns false (no clobber)
    val p2 = new org.apache.hadoop.fs.Path("s3a://test-bucket/x/file2")
    val o2 = fs.create(p2, true); o2.write("x".getBytes); o2.close()
    assert(!fs.rename(p, p2))
    assert(fs.exists(p) && fs.exists(p2))
  }
}
