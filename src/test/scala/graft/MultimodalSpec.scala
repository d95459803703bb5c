package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRow, MediaMeta}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val media = Multimodal
    .packText(Tables.t(spark, sf, "documents").limit(50), "doc_id", "text")
    .as[MediaRow].cache()

  test("packText produces binary media with typed metadata") {
    val schema = media.toDF().schema
    assert(schema("media").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val r = media.head()
    assert(r.meta.kind === "text")
    assert(r.media.nonEmpty)
  }

  test("decodeFeatures yields fixed-dim deterministic vectors") {
    val f1 = Multimodal.decodeFeatures(media, 16).orderBy("id").collect()
    val f2 = Multimodal.decodeFeatures(media, 16).orderBy("id").collect()
    assert(f1.length === 50)
    assert(f1.forall(_.features.length === 16))
    assert(f1.forall(_.features.forall(v => v >= 0f && v <= 1f)))
    // deterministic across runs (fake decode is content-derived)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
  }

  test("resize pads or truncates media to target size, updating metadata") {
    val resized = Multimodal.resize(media, 128).collect()
    assert(resized.forall(_.media.length === 128))
    assert(resized.forall(_.meta.width === 128))
  }

  test("frameSample chunks media and respects stride") {
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 2)
    val byId = frames.collect().groupBy(_.id)
    val src = media.collect().map(r => r.id -> r.media.length).toMap
    for ((id, fs) <- byId) {
      val nChunks = (src(id) + 63) / 64
      assert(fs.length === (nChunks + 1) / 2, s"id=$id")
      assert(fs.forall(_.frame.length <= 64))
      assert(fs.map(_.frameIdx).sorted.toSeq === (0 until nChunks by 2).toSeq)
    }
  }

  test("real PNG decode: grid features read actual pixel values") {
    // left half pure red, right half pure blue — 2×1 grid must separate them
    val png = Multimodal.pngBytes(64, 32,
      (x, _) => if (x < 32) 0xff0000 else 0x0000ff)
    val ds = Seq(MediaRow(7L, png, MediaMeta("image/png", 64, 32, 0L))).toDS()
    val f = Multimodal.decodeImageFeatures(ds, gridW = 2, gridH = 1).head()
    assert(f.features.length === 6)
    val Array(lr, lg, lb, rr, rg, rb) = f.features
    assert(lr === 1.0f && lg === 0.0f && lb === 0.0f, s"left cell ${f.features.toSeq}")
    assert(rr === 0.0f && rg === 0.0f && rb === 1.0f, s"right cell ${f.features.toSeq}")
  }

  test("real PNG resize: output re-decodes at the target geometry") {
    val png = Multimodal.pngBytes(40, 40, (_, _) => 0x00ff00)
    val ds = Seq(MediaRow(9L, png, MediaMeta("image/png", 40, 40, 0L))).toDS()
    val out = Multimodal.resizeImage(ds, 10, 5).head()
    assert(out.meta === MediaMeta("image/png", 10, 5, 0L))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.media))
    assert(back.getWidth === 10 && back.getHeight === 5)
    // solid green survives the bilinear rescale exactly
    assert((back.getRGB(4, 2) & 0xffffff) === 0x00ff00)
  }

  test("undecodable bytes fail loudly with the row id") {
    val ds = Seq(MediaRow(3L, Array[Byte](1, 2, 3), MediaMeta("image/png", 0, 0, 0L))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageFeatures(ds).collect()
    }
    assert(e.getMessage.contains("id=3") ||
      Option(e.getCause).exists(_.getMessage.contains("id=3")))
  }

  test("GVID video: real container parse, stride sampling, frame-hash pairing") {
    // frames distinct at aHash's 8×8 LUMINANCE granularity: a bright
    // 4-px column at grid position i (color alone wouldn't separate
    // them — the hash reads luma structure, not hue)
    def fr(i: Int) = Multimodal.pngBytes(32, 32,
      (x, y) => if (x / 4 == i) 0xffffff else 0x000000)
    val f = (0 until 6).map(fr)
    val videos = Seq(
      // A and B share frames 0,1 (their openings); C is all-distinct
      MediaRow(1L, Multimodal.videoBytes(Seq(f(0), f(1), f(2))),
        MediaMeta("video/gvid", 32, 32, 3000L)),
      MediaRow(2L, Multimodal.videoBytes(Seq(f(0), f(1), f(3))),
        MediaMeta("video/gvid", 32, 32, 3000L)),
      MediaRow(3L, Multimodal.videoBytes(Seq(f(4), f(5))),
        MediaMeta("video/gvid", 32, 32, 2000L))).toDS()

    // stride sampling keeps exactly frames 0, 2, 4, …
    val sampled = Multimodal.videoSampleFrames(videos, stride = 2).collect()
    assert(sampled.filter(_.id == 1L).map(_.frameIdx).sorted.toSeq === Seq(0, 2))
    assert(sampled.filter(_.id == 3L).map(_.frameIdx).toSeq === Seq(0))
    // the sampled bytes are the ORIGINAL PNG frames, byte-identical
    assert(sampled.find(f0 => f0.id == 1L && f0.frameIdx == 0)
      .get.frame.toSeq === f(0).toSeq)

    // every sampled frame decodes and hashes; identical frames collide
    val hashes = Multimodal.videoFrameHashes(videos, stride = 1)
      .as[(Long, Int, Long)].collect()
    assert(hashes.length === 8)
    val h1 = hashes.filter(_._1 == 1L).map(h => h._2 -> h._3).toMap
    val h2 = hashes.filter(_._1 == 2L).map(h => h._2 -> h._3).toMap
    assert(h1(0) === h2(0) && h1(1) === h2(1), "shared opening frames collide")
    assert(h1(2) !== h2(2), "distinct third frames differ")

    // near-dup: only (A, B) share >= 2 sampled frame hashes
    val pairs = Multimodal.videoNearDupPairs(videos, stride = 1, minShared = 2)
      .as[(Long, Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 2L)), pairs.toSeq.toString)
  }

  test("video scene cuts: planted shot boundaries, repeats within a scene don't cut") {
    // frames distinct at aHash granularity (bright column position)
    def fr(i: Int) = Multimodal.pngBytes(32, 32,
      (x, y) => if (x / 4 == i) 0xffffff else 0x000000)
    val videos = Seq(
      // shots: [f0 f0 f0] [f3 f3] [f6] -> 2 cuts, 3 scenes, longest 3
      MediaRow(1L, Multimodal.videoBytes(
        Seq(fr(0), fr(0), fr(0), fr(3), fr(3), fr(6))),
        MediaMeta("video/gvid", 32, 32, 6000L)),
      // single still shot: 0 cuts, 1 scene
      MediaRow(2L, Multimodal.videoBytes(Seq(fr(1), fr(1))),
        MediaMeta("video/gvid", 32, 32, 2000L))).toDS()
    val rows = Multimodal.videoSceneChanges(videos, stride = 1, maxHamming = 3)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(rows === Array((1L, 6, 2, 3, 3), (2L, 2, 0, 1, 2)),
      rows.mkString(", "))
  }

  test("image aHash: re-encode-stable, edit-tolerant, content-sensitive") {
    // base: half dark / half bright; near-dup: same with a small bright
    // patch; different: checkerboard
    def base(x: Int, y: Int) = if (x < 32) 0x101010 else 0xf0f0f0
    val basePng = Multimodal.pngBytes(64, 64, base)
    val nearPng = Multimodal.pngBytes(64, 64,
      (x, y) => if (x < 4 && y < 4) 0xffffff else base(x, y))
    val diffPng = Multimodal.pngBytes(64, 64,
      (x, y) => if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff)
    val ds = Seq(
      MediaRow(1L, basePng, MediaMeta("image/png", 64, 64, 0L)),
      MediaRow(2L, nearPng, MediaMeta("image/png", 64, 64, 0L)),
      MediaRow(3L, diffPng, MediaMeta("image/png", 64, 64, 0L))).toDS()
    val hashes = Multimodal.imageAHash(ds)
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) !== hashes(3L), "different content, different hash")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hashes(1L), hashes(2L)) <= 3,
      s"small edit stays near: ${hamming(hashes(1L), hashes(2L))}")
    assert(hamming(hashes(1L), hashes(3L)) > 3,
      s"unrelated images stay far: ${hamming(hashes(1L), hashes(3L))}")

    val pairs = Multimodal.imageNearDupPairs(ds)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"only the near-dup pair alerts: ${pairs.toSeq}")
  }

  test("audio fingerprint: gain-invariant, pattern-sensitive, pairs via block LSH") {
    val sr = 8000f
    // base: loud first half, quiet second half; gain-scaled copy keeps
    // the envelope shape; different: alternating loud/quiet eighths
    def env(i: Int, n: Int, pattern: Int => Double) =
      (pattern(i * 64 / n) * 20000).toShort
    val n = 8000
    val base = Array.tabulate(n)(i =>
      env(i, n, w => if (w < 32) math.sin(i * 0.5) else 0.05 * math.sin(i * 0.5)))
    val gained = base.map(s => (s * 0.5).toShort)
    val diff = Array.tabulate(n)(i =>
      env(i, n, w => if ((w / 8) % 2 == 0) math.sin(i * 0.5) else 0.05 * math.sin(i * 0.5)))
    val ds = Seq(
      MediaRow(1L, Multimodal.wavBytes(base, sr), MediaMeta("audio/wav", 0, 0, 1000L)),
      MediaRow(2L, Multimodal.wavBytes(gained, sr), MediaMeta("audio/wav", 0, 0, 1000L)),
      MediaRow(3L, Multimodal.wavBytes(diff, sr), MediaMeta("audio/wav", 0, 0, 1000L))).toDS()
    val pairs = Multimodal.nearDupPairsByHash(Multimodal.audioFingerprint(ds))
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"gain-scaled copy alerts, different envelope doesn't: ${pairs.toSeq}")
  }

  test("partition parallelism is preserved through mapPartitions") {
    val repart = media.repartition(7)
    assert(Multimodal.decodeFeatures(repart, 4).rdd.getNumPartitions === 7)
  }

  test("real WAV decode: sine features match signal theory") {
    val sr = 8000f
    val freq = 440.0
    val amp = 0.5
    val n = 8000 // exactly 1 second
    val samples = Array.tabulate(n)(i =>
      (amp * 32767.0 * math.sin(2 * math.Pi * freq * i / sr)).toShort)
    val wav = Multimodal.wavBytes(samples, sr)
    val rows = Seq(MediaRow(1L, wav, MediaMeta("audio/wav", 0, 0, 1000L))).toDS()
    val f = Multimodal.decodeAudioFeatures(rows).collect().head.features
    assert(math.abs(f(0) - 1.0f) < 1e-3, s"duration ${f(0)}")
    assert(math.abs(f(1) - amp / math.sqrt(2)) < 0.01, s"rms ${f(1)}")
    assert(math.abs(f(2) - amp) < 0.01, s"peak ${f(2)}")
    // a 440 Hz sine crosses zero 2·440 times/sec → rate 880/8000 = 0.11
    assert(math.abs(f(3) - 2 * freq / sr) < 0.005, s"zcr ${f(3)}")
  }

  test("real WAV decode: silence has zero rms/peak and exact duration") {
    val wav = Multimodal.wavBytes(new Array[Short](4000), 8000f)
    val rows = Seq(MediaRow(2L, wav, MediaMeta("audio/wav", 0, 0, 500L))).toDS()
    val f = Multimodal.decodeAudioFeatures(rows).collect().head.features
    assert(f(0) === 0.5f)
    assert(f(1) === 0f && f(2) === 0f && f(3) === 0f)
  }
}
