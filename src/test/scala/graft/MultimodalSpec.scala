package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** The real image codec path: javax.imageio decode for true
  * dimensions, DCT pHash recovering planted near-duplicate images,
  * and the deterministic fallback staying bit-identical to the
  * codegen stub so the synthetic-corpus oracle is untouched.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Render a PNG in memory. */
  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pix(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def rgb(r: Int, g: Int, b: Int): Int =
    ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)

  private def payloadFrame(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "payload")
      .select(col("doc_id"), lit("image").as("modality"),
        octet_length(col("payload")).cast("long").as("n_bytes"), col("payload"))

  test("real PNG payloads decode to true header dimensions") {
    val bytes = png(64, 48)((x, y) => rgb(x * 4, y * 5, 128))
    val textBytes = "not an image at all".getBytes("UTF-8")
    val feats = Multimodal.decode(
      spark, payloadFrame(Seq(1L -> bytes, 2L -> textBytes)))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 64 && feats(1L).height == 48 && feats(1L).n_frames == 1)
    // non-image bytes fall through to the deterministic stub
    val h = graft.functions.HashOps.fnv1a64(textBytes, 0, textBytes.length)
    assert(feats(2L).width == (math.abs(h % 1024) + 1).toInt)
    assert(feats(2L).height == (math.abs((h >>> 16) % 1024) + 1).toInt)
  }

  test("animated GIF payloads report their true frame count") {
    val frames = (0 until 4).map(i =>
      new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB) {
        { var y = 0; while (y < 16) { var x = 0; while (x < 16) {
            setRGB(x, y, rgb(i * 60, x * 15, y * 15)); x += 1 }; y += 1 } }
      })
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence(); writer.dispose(); out.close()
    val gif = bos.toByteArray
    val feats = Multimodal.decode(spark, payloadFrame(Seq(7L -> gif))).collect().head
    assert(feats.width == 16 && feats.height == 16 && feats.n_frames == 4)
  }

  test("WAV payloads report channels, sample rate and sample frames") {
    val sampleRate = 8000f
    val nFrames = 1600 // 0.2 s mono 16-bit
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) { // small deterministic sawtooth
      val v = ((i % 64) * 512 - 16384).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val feats = Multimodal.decode(spark, payloadFrame(Seq(8L -> wav))).collect().head
    // (width, height, n_frames) carry (channels, frames/sec, frames)
    assert(feats.width == 1 && feats.height == 8000 && feats.n_frames == nFrames)
  }

  test("WAV PCM sample decode: peak amplitude matches a brute-force sample scan") {
    // an AudioSystem-written WAV (independent of wavBytes) with a
    // known extreme sample, read back through the sample-level path
    val sampleRate = 16000f
    val nFrames = 3000
    val pcm = new Array[Byte](nFrames * 2)
    var maxAbs = 0
    var i = 0
    while (i < nFrames) {
      val v = (((i * 97) % 24001) - 12000).toShort
      if (math.abs(v.toInt) > maxAbs) maxAbs = math.abs(v.toInt)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((frames, channels, rate, peak)) =
      Multimodal.decodeWavSamples(bos.toByteArray)
    assert(frames == nFrames && channels == 1 && rate == 16000)
    assert(peak == maxAbs, s"peak $peak != brute-force $maxAbs")
  }

  test("wavBytes fixtures round-trip with peak 617 by construction; non-WAV declines") {
    for ((n, ch, hz) <- Seq((441, 2, 44100), (100, 1, 8000), (1, 1, 11025))) {
      val Some((frames, channels, rate, peak)) =
        Multimodal.decodeWavSamples(Multimodal.wavBytes(n, ch, hz))
      assert((frames, channels, rate, peak) == ((n.toLong, ch, hz, 617)),
        s"($n,$ch,$hz) -> ($frames,$channels,$rate,$peak)")
    }
    assert(Multimodal.decodeWavSamples("not a wav".getBytes).isEmpty)
  }

  test("MP4 payloads report tkhd dimensions and stsz frame count via the box walk") {
    val mp4 = Multimodal.mp4Bytes(nFrames = 24, width = 640, height = 360)
    assert(Multimodal.decodeMp4Meta(mp4).contains((640, 360, 24)))
    val feats = Multimodal.decode(spark, payloadFrame(Seq(9L -> mp4))).collect().head
    assert(feats.width == 640 && feats.height == 360 && feats.n_frames == 24)
    // truncated container (moov cut mid-box) quarantines, not crashes
    assert(Multimodal.decodeMp4Meta(mp4.take(mp4.length / 2)).isEmpty)
    // an ftyp-only payload (no moov) also falls through
    assert(Multimodal.decodeMp4Meta(mp4.take(24)).isEmpty)
  }

  test("FLAC payloads report channels, sample rate and total samples from STREAMINFO") {
    val flac = Multimodal.flacBytes(totalSamples = 88200L, channels = 2, rate = 44100)
    assert(Multimodal.decodeFlacMeta(flac).contains((88200L, 2, 44100)))
    val feats = Multimodal.decode(spark, payloadFrame(Seq(11L -> flac))).collect().head
    // (width, height, n_frames) carry (channels, rate, samples) — the WAV convention
    assert(feats.width == 2 && feats.height == 44100 && feats.n_frames == 88200)
    // a >32-bit total-samples field round-trips through the 36-bit layout
    assert(Multimodal.decodeFlacMeta(
      Multimodal.flacBytes(0x5_0000_0001L, 1, 48000)).contains((0x5_0000_0001L, 1, 48000)))
    // truncated/markerless payloads quarantine
    assert(Multimodal.decodeFlacMeta(flac.take(20)).isEmpty)
    assert(Multimodal.decodeFlacMeta("fLaX garbage".getBytes("US-ASCII")).isEmpty)
  }

  test("corrupt image bytes (valid magic, garbage body) quarantine to the stub") {
    val junk = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++
      Array.fill[Byte](32)(0x7f)
    val feats = Multimodal.decode(spark, payloadFrame(Seq(9L -> junk))).collect()
    assert(feats.length == 1, "a corrupt payload must not kill the task")
    val h = graft.functions.HashOps.fnv1a64(junk, 0, junk.length)
    assert(feats.head.width == (math.abs(h % 1024) + 1).toInt)
  }

  test("planted near-duplicate PNG is recovered by DCT pHash; distinct images are not paired") {
    val w = 64; val h = 64
    // deterministic texture with a RICH spectrum (one noise value per
    // 2×2 block): a synthetic ramp or checkerboard concentrates DCT
    // energy in a handful of coefficients and parks the other ~60 at
    // the median, where every bit is a coin flip — real photographs
    // (and this texture) spread energy so the hash bits are stable
    def noise(seed: Long)(x: Int, y: Int): Int = {
      val v = (graft.functions.HashOps.splitmix64(
        seed * 7919 + (y / 2) * 64 + (x / 2)) & 0xff).toInt
      rgb(v, v, v)
    }
    val base = png(w, h)(noise(1))
    // near-dup: same texture, one small dim patch — the kind of light
    // edit (logo stamp, re-encode noise) pHash must absorb
    val nearDup = png(w, h) { (x, y) =>
      val v0 = noise(1)(x, y) & 0xff
      val d = if (x >= 30 && x < 34 && y >= 30 && y < 34) 2 else 0
      rgb(v0 - d, v0 - d, v0 - d)
    }
    val others = (2 to 5).map(s => png(w, h)(noise(s.toLong)))
    val corpus = payloadFrame(
      Seq(1L -> base, 100L -> nearDup) ++
        others.zipWithIndex.map { case (b, i) => (2L + i) -> b } ++
        Seq(50L -> "text payload rides along".getBytes("UTF-8")))
    val pairs = Multimodal
      .phashDedupPairs(spark, corpus, col("doc_id"), col("payload"), maxHamming = 3)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 100L)), s"got $pairs")
  }

  test("fallback signatures are bit-identical to the codegen expression pair") {
    import graft.functions.F
    val df = Seq(
      (1L, "alpha payload"), (2L, "beta payload"), (3L, ""))
      .toDF("doc_id", "txt")
      .select(col("doc_id"), col("txt").cast("binary").as("payload"))
    val viaCodec = Multimodal
      .phashSignatures(spark, df, col("doc_id"), col("payload"))
      .as[(Long, Long)].collect().toMap
    val viaExpr = df
      .select(col("doc_id"), F.splitmix64(F.fnvBinary(col("payload"))))
      .as[(Long, Long)].collect().toMap
    assert(viaCodec == viaExpr)
  }

  test("pHash is stable under re-render; sensitive to structure") {
    val a = png(48, 32)((x, y) => rgb(x * 5, y * 7, 99))
    val b = png(48, 32)((x, y) => rgb(x * 5, y * 7, 99))
    assert(Multimodal.phash64(a) == Multimodal.phash64(b), "same pixels → same hash")
    val c = png(48, 32)((x, y) => rgb(255 - x * 5, y * 7, 99))
    assert(java.lang.Long.bitCount(
      Multimodal.phash64(a) ^ Multimodal.phash64(c)) > 3,
      "mirrored structure must not collide within the dedup threshold")
  }
}
