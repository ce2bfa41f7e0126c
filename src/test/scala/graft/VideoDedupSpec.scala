package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Video near-duplicate dedup: concatenated-BMP frame walk, temporal-mean
  * dHash invariance, banded Hamming pairing, temporally-aligned verify,
  * keep-set resolution.
  *
  * The corpus mirrors q_video_dedup's construction at spec scale: base
  * clips of 3-5 amplitude-ramped frames rendered from SparkEntry's
  * relative-coordinate luminance field, planted copies produced by the
  * REAL transcode operator (temporal resample to 4 frames + spatial
  * resample to 96×72 + re-encode), so the copies share no bytes with
  * their bases — the pair class byte-level dedup AND per-image dedup
  * both miss, which this operator exists to catch.
  */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private val N = 60 // doc ids 0..59; videos at ids ≡ 0 (mod 3) → 20 clips
  private lazy val baseAssets = Multimodal.toAssets(
    spark.range(N).toDF("doc_id")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"), SparkEntry.synthVideoPayload(col("doc_id")).as("vid")),
    "doc_id", "vid", "video/x-graft-bmpseq")

  private lazy val copies = Multimodal.transcodeVideo(
      baseAssets.filter(pmod(col("asset_id"), lit(15)) === 0),
      Multimodal.VideoSampleFrames, 96, 72)
    .select((col("asset_id") + SparkEntry.VideoCopyOffset).as("asset_id"),
      col("content"), col("meta"))

  private lazy val corpus = baseAssets.unionByName(copies)

  test("frame walk: 3-5 frames per clip, per-frame dims, honest stop at the " +
    "malformed tail") {
    val metas = Multimodal.videoFrameMeta(baseAssets).collect()
      .groupBy(_.getLong(0)).map { case (id, rows) => id -> rows.sortBy(_.getInt(1)) }
    (0 until N by 3).foreach { id =>
      val rows = metas(id.toLong)
      // frame count scatters off id/3 (id is always ≡ 0 mod 3)
      assert(rows.length == 3 + (id / 3) % 3,
        s"clip $id: expected ${3 + (id / 3) % 3} frames, got ${rows.length}")
      rows.foreach { r =>
        assert(r.getInt(4) == 48 + id % 16 && r.getInt(5) == 40 + id % 12,
          s"clip $id frame ${r.getInt(1)}: dims ${r.getInt(4)}x${r.getInt(5)}")
      }
      // frames tile the payload contiguously: off(i+1) = off(i) + bytes(i)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) == a.getLong(2) + a.getLong(3))
        case _ =>
      }
    }
    // the every-11th malformed tail (magic + header-length OK, declared
    // extent overruns the payload) must not surface as a frame: clip 0
    // and clip 33 carry it, and their walks stop at the last REAL frame
    Seq(0L, 33L).foreach { id =>
      val last = metas(id).last
      val total = baseAssets.filter(col("asset_id") === id)
        .select(length(col("content"))).as[Int].head()
      assert(last.getLong(2) + last.getLong(3) == total - 54,
        s"clip $id: walk must stop exactly at the 54-byte malformed tail")
    }
  }

  test("zero-frame payloads: one null row from the walk, null vhash, excluded " +
    "from pairing") {
    val junk = Multimodal.toAssets(Seq(
        (100L, "definitely not a container".getBytes("UTF-8")),
        (101L, Array.emptyByteArray),
        (102L, null.asInstanceOf[Array[Byte]]))
        .toDF("doc_id", "vid"),
      "doc_id", "vid", "video/x-graft-bmpseq")
    val meta = Multimodal.videoFrameMeta(junk).collect()
    assert(meta.length == 3 && meta.forall(_.isNullAt(1)),
      "each zero-frame asset keeps exactly one null walk row")
    val hashed = Multimodal.videoDHash(junk).collect()
    assert(hashed.length == 3 && hashed.forall(_.isNullAt(1)))
    assert(Dedup.videoNearDupPairs(junk).count() == 0)
  }

  test("planted transcoded copies collide in temporal-mean dHash space; " +
    "unrelated clips do not") {
    val hashes = Multimodal.videoDHash(corpus).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashes.values.forall(_.isDefined), "every synthesized clip hashes")
    val plantIds = (0 until N by 15).map(_.toLong)
    val plantHams = plantIds.map { id =>
      id -> java.lang.Long.bitCount(
        hashes(id).get ^ hashes(id + SparkEntry.VideoCopyOffset).get)
    }
    assert(plantHams.count(_._2 <= 3) >= plantHams.size - 1,
      s"planted transcodes drifted past the hamming radius: $plantHams")
    val baseIds = (0 until N by 3).map(_.toLong)
    val cross = for {
      i <- baseIds; j <- baseIds if i < j
    } yield java.lang.Long.bitCount(hashes(i).get ^ hashes(j).get)
    assert(cross.min > 3,
      s"two unrelated synthesized clips collided (min hamming ${cross.min})")
  }

  test("videoNearDupPairs ≡ brute-force hamming; verified keeps the true plants") {
    val hashes = Multimodal.videoDHash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.videoNearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- all; j <- all if i < j
      if java.lang.Long.bitCount(hashes(i) ^ hashes(j)) <= 3
    } yield (i, j)).toSet
    assert(pairs == brute)
    val kept = Dedup.videoNearDupPairsVerified(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == pairs,
      s"true transcoded copies must survive the aligned verify: ${pairs -- kept}")
    assert(kept.nonEmpty)
  }

  test("temporal REORDER: collides in the order-blind hash, dies in the " +
    "temporally-aligned verify") {
    // two clips of the same two frames in opposite order: the temporal
    // MEAN grid is identical (hamming 0 — a guaranteed candidate), but
    // frame 0 of one is frame 1 of the other, and the two frames differ
    // by a large luminance offset — exactly the false-positive class the
    // hash cannot see and the aligned qgrid distance exists to kill
    def flatBmp(lum: Int): Array[Byte] = {
      val (w, h) = (36, 32)
      val stride = (w * 3 + 3) / 4 * 4
      val data = new Array[Byte](54 + stride * h)
      val head = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      head.put('B'.toByte).put('M'.toByte).putInt(data.length).putInt(0)
        .putInt(54).putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24).putInt(0).putInt(stride * h)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // a mild horizontal gradient on top of the offset keeps the
          // mean-grid dHash bits deterministic (all "increasing")
          val v = (lum + 40 * x / (w - 1)).toByte
          val off = 54 + y * stride + x * 3
          data(off) = v; data(off + 1) = v; data(off + 2) = v
          x += 1
        }
        y += 1
      }
      data
    }
    val dark = flatBmp(20); val bright = flatBmp(170)
    def cat(fs: Array[Byte]*): Array[Byte] = fs.reduce(_ ++ _)
    val pairCorpus = Multimodal.toAssets(
      Seq((700L, cat(dark, bright)), (701L, cat(bright, dark)))
        .toDF("doc_id", "vid"),
      "doc_id", "vid", "video/x-graft-bmpseq")
    val hams = Multimodal.videoDHash(pairCorpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hams(700L) == hams(701L),
      "opposite-order cuts must collide in temporal-mean space")
    assert(Dedup.videoNearDupPairs(pairCorpus).count() == 1,
      "the reordered pair must surface as a candidate")
    assert(Dedup.videoNearDupPairsVerified(pairCorpus).count() == 0,
      "the temporally-aligned grid check must reject a reordered cut")
  }

  test("copies share no bytes with their base; transcode is a real re-encode") {
    val byId = corpus.select(col("asset_id"), md5(col("content")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until N by 15).foreach { id =>
      assert(byId(id.toLong) != byId(id + SparkEntry.VideoCopyOffset))
    }
    // transcoded frames decode at the target geometry and count
    val meta = Multimodal.videoFrameMeta(copies).collect()
      .groupBy(_.getLong(0))
    meta.values.foreach { rows =>
      assert(rows.length == Multimodal.VideoSampleFrames)
      rows.foreach(r => assert(r.getInt(4) == 96 && r.getInt(5) == 72))
    }
    // an undecodable payload transcodes to a null payload, never a fake
    val nulled = Multimodal.transcodeVideo(
      Multimodal.toAssets(Seq((900L, "junk".getBytes("UTF-8"))).toDF("doc_id", "vid"),
        "doc_id", "vid", "video/x-graft-bmpseq"), 4, 96, 72).collect()
    assert(nulled.length == 1 && nulled.head.isNullAt(1))
  }

  test("videoHashGridsQ ≡ videoDHash + videoGridsQ (single-decode combined pass)") {
    val withJunk = corpus.unionByName(Multimodal.toAssets(
      Seq((900L, "not frames".getBytes("UTF-8"))).toDF("doc_id", "vid"),
      "doc_id", "vid", "video/x-graft-bmpseq"))
    val combined = Multimodal.videoHashGridsQ(withJunk).collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    val hashes = Multimodal.videoDHash(withJunk).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val grids = Multimodal.videoGridsQ(withJunk).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(combined.keySet == hashes.keySet && combined.keySet == grids.keySet)
    combined.foreach { case (id, (h, g)) =>
      assert(h == hashes(id), s"vhash diverged for asset $id")
      assert(g == grids(id), s"qgrid diverged for asset $id")
    }
    assert(combined(900L) == ((null, null)), "frameless payload: both null")
  }

  test("keep-set: each planted group keeps exactly its min id; unpaired clips " +
    "all survive") {
    val kept = Dedup.videoNearDupKeep(corpus).collect().map(_.getLong(0)).toSet
    val verified = Dedup.videoNearDupPairsVerified(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val losers = verified.map(_._2).toSet // id_a < id_b and groups are pairs
    val allIds = corpus.select("asset_id").collect().map(_.getLong(0)).toSet
    assert(kept == allIds -- losers)
    assert(losers.nonEmpty && losers.forall(_ >= SparkEntry.VideoCopyOffset),
      "only planted copies may lose to their base")
  }
}
