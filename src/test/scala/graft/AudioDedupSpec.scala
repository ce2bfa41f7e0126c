package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Audio near-duplicate dedup: energy-delta fingerprint invariance +
  * banded Hamming pairing — the ImageDedupSpec story on the third
  * modality.
  *
  * The corpus mirrors q_audio_dedup's construction at spec scale: base
  * fake-PCM clips rendered from SparkEntry's relative-time two-tone
  * field, planted copies produced by the REAL resample operator
  * (nearest-neighbor resample to a different length at half gain), so the
  * copies share no bytes with their bases — the exact pair class
  * byte-level dedup misses and this operator exists to catch.
  */
class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private val N = 60
  private lazy val baseAssets = Multimodal.toAssets(
    spark.range(N).toDF("doc_id")
      .select(col("doc_id"), SparkEntry.synthAudioPayload(col("doc_id")).as("pcm")),
    "doc_id", "pcm", "audio/pcm-u8")

  private lazy val copies = Multimodal.resamplePcm(
      baseAssets.filter(pmod(col("asset_id"), lit(5)) === 0), 3000, gain = 0.5)
    .select((col("asset_id") + SparkEntry.AudioCopyOffset).as("asset_id"),
      col("content"), col("meta"))

  private lazy val corpus = baseAssets.unionByName(copies)

  test("planted resampled half-gain copies collide in fingerprint space; unrelated clips do not") {
    val fps = Multimodal.audioFingerprints(corpus).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(fps.size == N + N / 5)
    assert(fps.values.forall(_.isDefined), "every synthesized clip fingerprints")
    // planted copies land within (or near) the hamming radius: the
    // fingerprint is gain/resample-INVARIANT up to pooling and rounding
    // noise, not bit-exact — a copy can drift a bit past the radius when
    // its energy curve is flat where adjacent frames compare (the dHash
    // caveat, 1-D). Pin the measured floor, not a fiction of 100%.
    val plantHams = (0 until N by 5).map { id =>
      id -> java.lang.Long.bitCount(
        fps(id.toLong).get ^ fps(id + SparkEntry.AudioCopyOffset).get)
    }
    assert(plantHams.count(_._2 <= 3) >= plantHams.size - 1,
      s"planted pairs drifted past the hamming radius: $plantHams")
    assert(plantHams.forall(_._2 <= 8),
      s"a planted pair lost resample invariance entirely: $plantHams")
    // unrelated bases sit far apart: no base-base pair within the radius
    val baseIds = (0L until N).toArray
    val cross = for {
      i <- baseIds; j <- baseIds if i < j
    } yield java.lang.Long.bitCount(fps(i).get ^ fps(j).get)
    assert(cross.min > 3,
      s"two unrelated synthesized clips collided (min hamming ${cross.min})")
  }

  test("audioNearDupPairs ≡ brute-force hamming: exactly the within-radius plants") {
    val fps = Multimodal.audioFingerprints(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.audioNearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = fps.keys.toSeq.sorted
    val brute = (for {
      i <- all; j <- all if i < j
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= 3
    } yield (i, j)).toSet
    assert(pairs == brute)
    val expected = (0 until N by 5)
      .map(id => (id.toLong, id + SparkEntry.AudioCopyOffset))
      .filter { case (a, b) =>
        java.lang.Long.bitCount(fps(a) ^ fps(b)) <= 3 }.toSet
    assert(pairs == expected && expected.size >= N / 5 - 1)
  }

  test("pure gain at unchanged length keeps the delta-sign pattern") {
    // no resampling (asset 0's length is exactly 4000, the resample
    // target, so source indices map to themselves): frame boundaries
    // identical, energies scale by the gain uniformly — the delta-sign
    // pattern must survive up to per-frame rounding noise (gain 0.5
    // rounds each sample by <=0.5, averaging to ~0 over a 60+-sample
    // frame)
    val a0 = baseAssets.filter(col("asset_id") === 0)
    assert(a0.select(length(col("content"))).head().getInt(0) == 4000)
    val h1 = Multimodal.audioFingerprints(a0).head().getLong(1)
    val h2 = Multimodal.audioFingerprints(
      Multimodal.resamplePcm(a0, 4000, gain = 0.5)).head().getLong(1)
    val d = java.lang.Long.bitCount(h1 ^ h2)
    assert(d <= 2, s"same-length half-gain copy drifted to hamming $d")
  }

  test("copies share no bytes with their base (exact dedup provably misses them)") {
    val byId = corpus.select(col("asset_id"), md5(col("content")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until N by 5).foreach { id =>
      assert(byId(id.toLong) != byId(id + SparkEntry.AudioCopyOffset))
    }
  }

  test("verified pairs: plants survive the shape check; a same-fingerprint " +
    "different-shape candidate is rejected") {
    // engineered spurious candidate: two clips whose frame energies RISE
    // monotonically (identical all-ones delta-sign fingerprint) but with
    // different slopes — gently for A, steeply for B. The mean-normalized
    // shapes disagree far beyond the per-frame tolerance, the exact pair
    // class the sign pattern alone can never separate.
    def rampClip(base: Int, step: Int): Array[Byte] = {
      val perFrame = 64
      val out = new Array[Byte](65 * perFrame)
      var k = 0
      while (k < 65) {
        val d = base + step * k // constant |deviation| within frame k
        var i = 0
        while (i < perFrame) {
          out(k * perFrame + i) =
            (128 + (if (i % 2 == 0) d else -d)).toByte
          i += 1
        }
        k += 1
      }
      out
    }
    val pairCorpus = Multimodal.toAssets(
      // same +1 step keeps both sign patterns all-ones; the different
      // BASES (30 vs 5) change the mean, so the normalized shapes
      // diverge everywhere except the crossing at the mean frame
      Seq((600L, rampClip(30, 1)), (601L, rampClip(5, 1)))
        .toDF("doc_id", "pcm"),
      "doc_id", "pcm", "audio/pcm-u8")
    val fps = Multimodal.audioFingerprints(pairCorpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(600L) == fps(601L), "both ramps must fingerprint identically")
    assert(Dedup.audioNearDupPairs(pairCorpus).count() == 1,
      "the engineered pair must surface as a candidate")
    assert(Dedup.audioNearDupPairsVerified(pairCorpus).count() == 0,
      "the shape check must reject a same-fingerprint different-shape pair")
    // and on the planted corpus, the verify keeps exactly the candidates
    val cands = Dedup.audioNearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val kept = Dedup.audioNearDupPairsVerified(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == cands,
      s"true resampled copies must survive the verify: ${cands -- kept}")
  }

  test("audioHashCurvesQ ≡ audioFingerprints + energyCurvesQ (single-pass combined)") {
    // corpus + a too-short clip (both null) + a SILENT clip (hashable
    // fingerprint, null curve — the asymmetric null case)
    val withEdge = corpus.unionByName(Multimodal.toAssets(
      Seq((900L, "tiny".getBytes("UTF-8")),
          (901L, Array.fill[Byte](200)(128.toByte))).toDF("doc_id", "pcm"),
      "doc_id", "pcm", "audio/pcm-u8"))
    val combined = Multimodal.audioHashCurvesQ(withEdge).collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    val fps = Multimodal.audioFingerprints(withEdge).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val curves = Multimodal.energyCurvesQ(withEdge).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(combined.keySet == fps.keySet && combined.keySet == curves.keySet)
    combined.foreach { case (id, (h, q)) =>
      assert(h == fps(id), s"fingerprint diverged for asset $id")
      assert(q == curves(id), s"qcurve diverged for asset $id")
    }
    assert(combined(900L) == ((null, null)), "short clip: both null")
    assert(combined(901L)._1 == 0L && combined(901L)._2 == null,
      "silent clip: zero fingerprint, null curve")
  }

  test("unhashable assets degrade to null fingerprint and are excluded from pairing") {
    val junk = Seq(
      (100L, "short".getBytes("UTF-8")),                 // < 65 bytes
      (101L, Array.emptyByteArray),
      (102L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "pcm")
    val junkAssets = Multimodal.toAssets(junk, "doc_id", "pcm", "audio/pcm-u8")
    val fps = Multimodal.audioFingerprints(junkAssets).collect()
    assert(fps.length == 3 && fps.forall(_.isNullAt(1)))
    assert(Dedup.audioNearDupPairs(junkAssets).count() == 0)
    // exactly 65 bytes is the hashable floor: every frame holds one byte
    val floor = Multimodal.audioFingerprints(Multimodal.toAssets(
      Seq((103L, Array.fill[Byte](65)(7))).toDF("doc_id", "pcm"),
      "doc_id", "pcm", "audio/pcm-u8")).collect()
    assert(floor.forall(!_.isNullAt(1)))
  }
}
