package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}
import graft.streaming.HashIndexIngest

/** Persisted 64-bit hash-index lifecycle (the multimodal mirror of the
  * banded MinHash index): build → append (idempotent, replay no-op) →
  * delete → compact, served by banded-Hamming pairing; streamed ingest ≡
  * one-shot rebuild; keep-set resolution over verified pairs.
  *
  * Image corpora mirror q_image_dedup's construction at spec scale (base
  * BMPs from the relative-coordinate luminance field; copies through the
  * REAL resize operator). Audio corpora the q_audio_dedup construction.
  */
class HashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val N = 40
  private lazy val baseAssets = Multimodal.toAssets(
    spark.range(N).toDF("doc_id")
      .select(col("doc_id"), SparkEntry.synthImagePayload(col("doc_id")).as("img")),
    "doc_id", "img", "image/bmp")

  private lazy val copies = Multimodal.resizeImages(
      baseAssets.filter(pmod(col("asset_id"), lit(5)) === 0), 128, 96)
    .select((col("asset_id") + SparkEntry.ImgCopyOffset).as("asset_id"),
      col("content"), col("meta"))

  private lazy val corpus = baseAssets.unionByName(copies)

  /** NEW ingest batch: rescaled copies of every 7th base at a fresh id
    * offset — near-dups of indexed assets through a second transcode. */
  private lazy val batch = Multimodal.resizeImages(
      baseAssets.filter(pmod(col("asset_id"), lit(7)) === 0), 96, 72)
    .select((col("asset_id") + SparkEntry.ImgBatchOffset).as("asset_id"),
      col("content"), col("meta"))

  private def served(name: String): Set[(Long, Long, Int)] =
    Dedup.imagePairsAgainstHashIndex(batch, name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Brute-force batch × index hamming pairs at radius 3, from collected
    * hashes — what any layout must answer. */
  private def brute(indexIds: Long => Boolean): Set[(Long, Long, Int)] = {
    val ih = Dedup.imageHashes(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(kv => indexIds(kv._1))
    val nh = Dedup.imageHashes(batch).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    (for {
      (nid, nsim) <- nh; (iid, isim) <- ih
      d = java.lang.Long.bitCount(nsim ^ isim) if d <= 3
    } yield (nid, iid, d)).toSet
  }

  private def dropIx(name: String): Unit =
    Seq("_bands", "_sigs", "_meta", "_tombs").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s"))

  test("lifecycle-grown index serves ≡ one-shot build ≡ brute force; " +
    "replayed append key no-ops") {
    dropIx("hix_life"); dropIx("hix_oneshot")
    val hashes = graft.operators.Materialize.eagerCheckpoint(
      Dedup.imageHashes(corpus))
    def slice(r: Int) = hashes.filter(pmod(col("sh_id"), lit(3)) === r)
    Dedup.writeHashIndex(slice(0), "hix_life", buckets = 4)
    Dedup.appendToHashIndex(slice(1), "hix_life")
    assert(Dedup.appendToHashIndexIdempotent(slice(2), "hix_life", "b0"))
    val sigsAfter = spark.table("hix_life_sigs").count()
    assert(!Dedup.appendToHashIndexIdempotent(slice(2), "hix_life", "b0"),
      "replayed key must report already-delivered")
    assert(spark.table("hix_life_sigs").count() == sigsAfter,
      "replayed append must not grow the index")
    Dedup.writeHashIndex(hashes, "hix_oneshot", buckets = 4)
    val life = served("hix_life")
    assert(life == served("hix_oneshot"),
      "append-grown tables must answer exactly as a one-shot build")
    assert(life == brute(_ => true))
    assert(life.nonEmpty, "the transcoded batch must hit its bases")
    dropIx("hix_life"); dropIx("hix_oneshot")
  }

  test("delete tombstones victims at serve time; compact makes it " +
    "physical, keeps keys, and preserves the answer") {
    dropIx("hix_del")
    Dedup.writeHashIndex(Dedup.imageHashes(corpus), "hix_del", buckets = 4)
    // victims: every indexed asset congruent 0 mod 14 (hits some of the
    // batch's base-7 targets but not all — the interesting case)
    Dedup.deleteFromHashIndex(
      corpus.filter(pmod(col("asset_id"), lit(14)) === 0).select("asset_id"),
      "hix_del", "asset_id")
    val afterDelete = served("hix_del")
    assert(afterDelete == brute(_ % 14 != 0),
      "a tombstoned asset must stop matching, everything else unchanged")
    Dedup.compactHashIndex(spark, "hix_del")
    assert(served("hix_del") == afterDelete,
      "compaction must never change the answer")
    assert(!spark.catalog.tableExists("hix_del_tombs"),
      "compaction physicalizes tombstones and drops the table")
    assert(spark.table("hix_del_meta").select("build_id").distinct().count() == 1,
      "one merged epoch after compaction")
    dropIx("hix_del")
  }

  test("streamed ingest (MemoryStream + sink) ≡ rebuild; audio modality") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    dropIx("hix_stream"); dropIx("hix_stream_rebuild")
    val M = 30
    def pcm(ids: Seq[Long]): DataFrame =
      ids.toDF("doc_id")
        .select(col("doc_id"),
          SparkEntry.synthAudioPayload(col("doc_id")).as("pcm"))
        .select(col("doc_id").as("asset_id"), col("pcm").as("content"))
    // resampled near-dup copies of the first ten clips, streamed later
    val copiesA = Multimodal.resamplePcm(
        Multimodal.toAssets(
          spark.range(10).toDF("doc_id")
            .select(col("doc_id"),
              SparkEntry.synthAudioPayload(col("doc_id")).as("pcm")),
          "doc_id", "pcm", "audio/pcm-u8"),
        3000, gain = 0.5)
      .select((col("asset_id") + SparkEntry.AudioCopyOffset).as("asset_id"),
        col("content"))
    Dedup.writeHashIndex(
      Dedup.audioHashes(pcm(0L until 10L)), "hix_stream", buckets = 4)
    val in = MemoryStream[(Long, Array[Byte])]
    val q = in.toDF().toDF("asset_id", "content")
      .writeStream
      .foreachBatch(HashIndexIngest.sink("hix_stream",
        HashIndexIngest.AudioAssets))
      .start()
    val mid = pcm(10L until M.toLong).as[(Long, Array[Byte])].collect()
    in.addData(mid.toIndexedSeq)
    q.processAllAvailable()
    in.addData(copiesA.as[(Long, Array[Byte])].collect().toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    // the rebuild twin: everything in one writeHashIndex
    val all = pcm(0L until M.toLong)
      .unionByName(copiesA.select(col("asset_id"), col("content")))
    Dedup.writeHashIndex(Dedup.audioHashes(all), "hix_stream_rebuild",
      buckets = 4)
    val probe = pcm(0L until 10L) // original clips as the serve batch
    def pairs(name: String) =
      Dedup.audioPairsAgainstHashIndex(probe, name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = pairs("hix_stream")
    assert(streamed == pairs("hix_stream_rebuild"),
      "streamed appends must serve exactly what a rebuild serves")
    // the streamed copies are near-dups of their probing bases
    assert(streamed.exists(_._2 >= SparkEntry.AudioCopyOffset),
      "a streamed resampled copy must collide with its base clip")
    dropIx("hix_stream"); dropIx("hix_stream_rebuild")
  }

  test("streamed ingest: video modality through the SAME sink (third " +
    "modality, same protocol)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    dropIx("hix_vstream"); dropIx("hix_vstream_rebuild")
    def clips(ids: Seq[Long]): DataFrame =
      ids.toDF("doc_id")
        .select(col("doc_id"),
          SparkEntry.synthVideoPayload(col("doc_id")).as("vid"))
        .select(col("doc_id").as("asset_id"), col("vid").as("content"))
    // transcoded near-dup copies of the first clips, streamed later
    val copiesV = Multimodal.transcodeVideo(
        Multimodal.toAssets(
          spark.range(5).toDF("i").select((col("i") * 3).as("doc_id"))
            .select(col("doc_id"),
              SparkEntry.synthVideoPayload(col("doc_id")).as("vid")),
          "doc_id", "vid", "video/x-graft-bmpseq"),
        Multimodal.VideoSampleFrames, 96, 72)
      .select((col("asset_id") + SparkEntry.VideoCopyOffset).as("asset_id"),
        col("content"))
    val ids = (0L until 15L).map(_ * 3)
    Dedup.writeHashIndex(
      Dedup.videoHashes(clips(ids.take(5))), "hix_vstream", buckets = 4)
    val in = MemoryStream[(Long, Array[Byte])]
    val q = in.toDF().toDF("asset_id", "content")
      .writeStream
      .foreachBatch(HashIndexIngest.sink("hix_vstream",
        HashIndexIngest.VideoAssets))
      .start()
    in.addData(clips(ids.drop(5)).as[(Long, Array[Byte])].collect().toIndexedSeq)
    q.processAllAvailable()
    in.addData(copiesV.as[(Long, Array[Byte])].collect().toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val all = clips(ids).unionByName(copiesV.select(col("asset_id"), col("content")))
    Dedup.writeHashIndex(Dedup.videoHashes(all), "hix_vstream_rebuild",
      buckets = 4)
    val probe = clips(ids.take(5))
    def pairs(name: String) =
      Dedup.videoPairsAgainstHashIndex(probe, name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = pairs("hix_vstream")
    assert(streamed == pairs("hix_vstream_rebuild"),
      "streamed appends must serve exactly what a rebuild serves")
    assert(streamed.exists(_._2 >= SparkEntry.VideoCopyOffset),
      "a streamed transcoded copy must collide with its base clip")
    dropIx("hix_vstream"); dropIx("hix_vstream_rebuild")
  }

  test("keep-set: each verified near-dup cluster keeps exactly its min " +
    "id; unpaired assets all survive") {
    val pairs = Dedup.imageNearDupPairsVerified(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept = Dedup.imageNearDupKeep(corpus).collect()
      .map(_.getLong(0)).toSet
    val allIds = corpus.select("asset_id").collect().map(_.getLong(0)).toSet
    val paired = pairs.flatMap(p => Set(p._1, p._2))
    // unpaired assets are untouchable
    assert(allIds.diff(paired).subsetOf(kept))
    // spec-side union-find over the collected pairs — the expected keep
    // set derived independently of the engine's CC implementation
    val root = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val r = root.getOrElse(x, x)
      if (r == x) x else { val t = find(r); root(x) = t; t }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) root(math.max(ra, rb)) = math.min(ra, rb)
    }
    val losers = paired.filter(m => find(m) != m)
    assert(kept == allIds.diff(losers),
      "keep = every id minus non-representative cluster members")
    // and each cluster keeps exactly one member — its minimum
    paired.groupBy(find).foreach { case (rep, members) =>
      assert(kept.intersect(members) == Set(rep),
        s"cluster of $members must keep exactly its min $rep")
    }
    assert(pairs.nonEmpty, "the corpus plants verified near-dups")
  }
}
