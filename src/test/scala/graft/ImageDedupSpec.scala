package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Image near-duplicate dedup: dHash invariance + banded Hamming pairing.
  *
  * The corpus mirrors q_image_dedup's construction at spec scale: base
  * BMPs rendered from SparkEntry's relative-coordinate luminance field,
  * planted copies produced by the REAL resize operator (nearest-neighbor
  * resample + re-encode at a different resolution AND aspect ratio), so
  * the copies share no bytes with their bases — the exact pair class
  * byte-level dedup misses and this operator exists to catch.
  */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private val N = 60
  private lazy val baseAssets = Multimodal.toAssets(
    spark.range(N).toDF("doc_id")
      .select(col("doc_id"), SparkEntry.synthImagePayload(col("doc_id")).as("img")),
    "doc_id", "img", "image/bmp")

  private lazy val copies = Multimodal.resizeImages(
      baseAssets.filter(pmod(col("asset_id"), lit(5)) === 0), 128, 96)
    .select((col("asset_id") + SparkEntry.ImgCopyOffset).as("asset_id"),
      col("content"), col("meta"))

  private lazy val corpus = baseAssets.unionByName(copies)

  test("planted rescaled copies collide in dHash space; unrelated images do not") {
    val hashes = Multimodal.imageDHash(corpus).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashes.size == N + N / 5)
    assert(hashes.values.forall(_.isDefined), "every synthesized BMP decodes + hashes")
    // planted copies land within (or near) the hamming radius: dHash is
    // rescale-INVARIANT up to pooling noise, not bit-exact — a copy can
    // legitimately drift a bit past the radius when its field is flat
    // where the grid compares (measured: ~96% of 1000 plants within 3 at
    // sf0.1). Pin the measured floor, not a fiction of 100%.
    val plantHams = (0 until N by 5).map { id =>
      id -> java.lang.Long.bitCount(
        hashes(id.toLong).get ^ hashes(id + SparkEntry.ImgCopyOffset).get)
    }
    assert(plantHams.count(_._2 <= 3) >= plantHams.size - 1,
      s"planted pairs drifted past the hamming radius: $plantHams")
    assert(plantHams.forall(_._2 <= 8),
      s"a planted pair lost rescale invariance entirely: $plantHams")
    // unrelated bases sit far apart: no base-base pair within the radius
    val baseIds = (0L until N).toArray
    val cross = for {
      i <- baseIds; j <- baseIds if i < j
    } yield java.lang.Long.bitCount(hashes(i).get ^ hashes(j).get)
    assert(cross.min > 3,
      s"two unrelated synthesized images collided (min hamming ${cross.min})")
  }

  test("imageNearDupPairs ≡ brute-force hamming: exactly the within-radius plants") {
    val hashes = Multimodal.imageDHash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.imageNearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the operator's banded candidate path must agree with brute force
    // over ALL asset pairs (plants and bases alike), pigeonhole-complete
    // at radius 3 with 4 bands
    val all = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- all; j <- all if i < j
      if java.lang.Long.bitCount(hashes(i) ^ hashes(j)) <= 3
    } yield (i, j)).toSet
    assert(pairs == brute)
    // and the within-radius planted copies are all of them (no spurious
    // base-base collisions at this corpus size), nearly all plants caught
    val expected = (0 until N by 5)
      .map(id => (id.toLong, id + SparkEntry.ImgCopyOffset))
      .filter { case (a, b) =>
        java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3 }.toSet
    assert(pairs == expected && expected.size >= N / 5 - 1)
  }

  test("copies share no bytes with their base (exact dedup provably misses them)") {
    val byId = corpus.select(col("asset_id"), md5(col("content")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until N by 5).foreach { id =>
      assert(byId(id.toLong) != byId(id + SparkEntry.ImgCopyOffset))
    }
  }

  test("verified pairs: plants survive the grid check; a same-hash different-image " +
    "candidate is rejected") {
    // engineered spurious candidate: two horizontal-gradient BMPs — every
    // dHash bit compares grid[gx+1] > grid[gx], TRUE for both (hamming
    // 0, a guaranteed candidate), but one is dark (0→100 luma) and one
    // bright (150→250): the pooled grids disagree by ~150 luma per cell,
    // the exact pair class the hash alone can never separate
    def gradientBmp(lo: Int, hi: Int): Array[Byte] = {
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
          val v = (lo + (hi - lo) * x / (w - 1)).toByte
          val off = 54 + y * stride + x * 3
          data(off) = v; data(off + 1) = v; data(off + 2) = v
          x += 1
        }
        y += 1
      }
      data
    }
    val pairCorpus = Multimodal.toAssets(
      Seq((500L, gradientBmp(0, 100)), (501L, gradientBmp(150, 250)))
        .toDF("doc_id", "img"),
      "doc_id", "img", "image/bmp")
    val hams = Multimodal.imageDHash(pairCorpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hams(500L) == hams(501L), "gradients must collide in dHash space")
    assert(Dedup.imageNearDupPairs(pairCorpus).count() == 1,
      "the engineered pair must surface as a candidate")
    assert(Dedup.imageNearDupPairsVerified(pairCorpus).count() == 0,
      "the grid check must reject a same-hash different-image pair")
    // and on the planted corpus, the verify pass keeps exactly the
    // candidates (every candidate there IS a true rescaled copy)
    val cands = Dedup.imageNearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept = Dedup.imageNearDupPairsVerified(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == cands,
      s"true rescaled copies must survive the verify: ${cands -- kept}")
  }

  test("imageHashGridsQ ≡ imageDHash + luminanceGridsQ (single-decode combined pass)") {
    // corpus + an undecodable payload, so the null path is compared too
    val withJunk = corpus.unionByName(Multimodal.toAssets(
      Seq((999L, "not an image at all")).toDF("doc_id", "img"),
      "doc_id", "img", "image/bmp"))
    val combined = Multimodal.imageHashGridsQ(withJunk).collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    val hashes = Multimodal.imageDHash(withJunk).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val grids = Multimodal.luminanceGridsQ(withJunk).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(combined.keySet == hashes.keySet && combined.keySet == grids.keySet)
    combined.foreach { case (id, (h, g)) =>
      assert(h == hashes(id), s"dhash diverged for asset $id")
      assert(g == grids(id), s"qgrid diverged for asset $id")
    }
    assert(combined(999L) == ((null, null)), "undecodable payload: both null")
  }

  test("unhashable assets degrade to null dhash and are excluded from pairing") {
    val junk = Seq(
      (100L, "not an image at all".getBytes("UTF-8")),
      (101L, Array.emptyByteArray),
      (102L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "img")
    val junkAssets = Multimodal.toAssets(junk, "doc_id", "img", "image/bmp")
    val hashed = Multimodal.imageDHash(junkAssets).collect()
    assert(hashed.length == 3 && hashed.forall(_.isNullAt(1)))
    // a decodable raster BELOW the 9x8 grid is unhashable too (tiny BMPs
    // from the q_multimodal_pixels generator: w in 1..8, h in 1..6)
    val tiny = Multimodal.imageDHash(Multimodal.toAssets(
      spark.range(1).toDF("doc_id")
        .select(col("doc_id"), SparkEntry.bmpPayload(col("doc_id")).as("img")),
      "doc_id", "img", "image/bmp")).collect()
    assert(tiny.forall(_.isNullAt(1)))
    // and neither class ever reaches the pair join
    assert(Dedup.imageNearDupPairs(junkAssets).count() == 0)
  }
}
