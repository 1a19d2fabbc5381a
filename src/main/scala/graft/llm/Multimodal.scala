package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 M): media as opaque
  * `binary` payloads plus typed metadata, routed by modality.
  *
  * The IMAGE codec is real: payloads whose magic bytes identify a
  * PNG/JPEG/GIF/BMP decode through `javax.imageio` (JDK-standard,
  * headless-safe) for true dimensions and a DCT perceptual hash.
  * Payloads that are not decodable images (this repo's synthetic
  * test corpus stores text bytes; a real deployment might hold
  * codecs this JVM lacks, e.g. video) fall back to the
  * deterministic stub so the pipeline keeps the same schema and the
  * cross-engine oracle can recompute it. Audio/video decode remains
  * stubbed — same swap-in point, nothing else changes.
  */
object Multimodal {

  /** A decoded-media feature row: the schema a real decoder would
    * emit (dimensions for images, sample counts for audio, frames for
    * video).
    */
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** A decoded-audio feature row: sample-level statistics (peak is
    * max |16-bit amplitude| across all channels) plus whether a real
    * codec produced them (`decoded` false = deterministic stub arm).
    */
  case class AudioFeatures(
      doc_id: Long,
      n_frames: Long,
      channels: Int,
      rate: Int,
      peak: Int,
      decoded: Boolean)

  /** True iff the payload's magic bytes name a format `javax.imageio`
    * ships a decoder for: PNG (89 50 4E 47), JPEG (FF D8), GIF
    * ("GIF8"), BMP ("BM"). Sniffing first keeps the non-image fast
    * path allocation-free — no speculative decoder probe per row.
    */
  private[llm] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 0x50 && b(2) == 0x4e && b(3) == 0x47) ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** Decode an image payload; None when the bytes aren't a supported
    * image (or are corrupt — a truncated PNG must not kill a 100 TB
    * scan task, it must fall through to the quarantine path).
    */
  private[llm] def decodeImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(b)) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
      catch { case _: Exception => None }

  /** Frame count of an image payload WITHOUT decoding pixel data:
    * ImageIO readers report the image count per container (GIFs
    * carry their animation frames; single-frame formats report 1).
    */
  private[llm] def imageFrameCount(b: Array[Byte]): Int =
    try {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) 1
        else {
          val rd = readers.next()
          rd.setInput(in)
          try math.max(1, rd.getNumImages(true))
          finally rd.dispose()
        }
      } finally in.close()
    } catch { case _: Exception => 1 }

  /** True iff the payload starts with a RIFF/WAVE header. */
  private[llm] def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Decode WAV audio metadata through `javax.sound.sampled` (the one
    * audio container the JDK ships a parser for): (sample frames,
    * channels, frames/sec). Header-only — no sample data decoded.
    */
  private[llm] def decodeWavMeta(b: Array[Byte]): Option[(Long, Int, Int)] =
    if (!looksLikeWav(b)) None
    else
      try {
        val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(b))
        Some((
          fmt.getFrameLength.toLong,
          fmt.getFormat.getChannels,
          math.round(fmt.getFormat.getFrameRate)))
      } catch { case _: Exception => None }

  /** REAL sample decode for WAV PCM payloads — the one compressed-
    * payload-free audio codec the JVM decodes with zero dependencies
    * (`javax.sound.sampled`): (sample frames, channels, frames/sec,
    * peak |amplitude|). Unlike [[decodeWavMeta]] this reads EVERY
    * sample: the AudioInputStream's raw PCM bytes are interpreted at
    * the container's declared endianness and the peak is the max
    * absolute 16-bit sample value across all channels — the loudness
    * statistic an audio curation filter keys on. Non-PCM16 encodings
    * and malformed payloads → None (→ the deterministic stub arm),
    * so the remaining stub surface is exactly the non-JVM compressed
    * codecs (MP3/AAC/FLAC frames…).
    */
  private[graft] def decodeWavSamples(b: Array[Byte]): Option[(Long, Int, Int, Int)] =
    if (!looksLikeWav(b)) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val big = fmt.isBigEndian
            val buf = new Array[Byte](8192)
            var peak = 0
            var carry = -1 // odd-byte boundary straddle between reads
            var read = in.read(buf)
            while (read > 0) {
              var i = 0
              if (carry >= 0 && read >= 1) {
                val s =
                  if (big) (carry << 8) | (buf(0) & 0xff)
                  else (buf(0) << 8) | carry
                val a = math.abs(s.toShort.toInt)
                if (a > peak) peak = a
                carry = -1
                i = 1
              }
              while (i + 1 < read) {
                val s =
                  if (big) ((buf(i) & 0xff) << 8) | (buf(i + 1) & 0xff)
                  else ((buf(i + 1) & 0xff) << 8) | (buf(i) & 0xff)
                val a = math.abs(s.toShort.toInt)
                if (a > peak) peak = a
                i += 2
              }
              if (i < read) carry = buf(i) & 0xff
              read = in.read(buf)
            }
            Some((in.getFrameLength, fmt.getChannels,
              math.round(fmt.getFrameRate), peak))
          }
        } finally in.close()
      } catch { case _: Exception => None }

  /** Deterministic minimal PCM16-LE WAV payload for planting a truly
    * decodable audio file under the oracle (the GIF/MP4/FLAC idiom).
    * Sample (frame i, channel c) = ((i·37 + c·11) mod 1234) − 617, so
    * for ANY n ≥ 1 the peak |amplitude| is exactly 617 (frame 0
    * channel 0 hits −617; every other value lies in [−616, 616]) —
    * a constant the oracle can pin.
    */
  def wavBytes(nFrames: Int, channels: Int, rate: Int): Array[Byte] = {
    val dataLen = nFrames * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits/sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        out.putShort((((i * 37 + c * 11) % 1234) - 617).toShort)
        c += 1
      }
      i += 1
    }
    out.array()
  }

  /** True iff the payload starts with the FLAC stream marker. */
  private[llm] def looksLikeFlac(b: Array[Byte]): Boolean =
    b.length >= 42 &&
      b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** Audio metadata from a FLAC STREAMINFO block (the mandatory first
    * metadata block per the public FLAC format spec): (total sample
    * frames, channels, sample rate). Pure byte parsing, header-only —
    * the same stance as WAV/GIF/MP4; malformed payloads → None.
    * STREAMINFO bit layout after the 4-byte block header: 16+16 bits
    * block sizes, 24+24 bits frame sizes, 20 bits sample rate,
    * 3 bits channels−1, 5 bits bps−1, 36 bits total samples.
    */
  private[graft] def decodeFlacMeta(b: Array[Byte]): Option[(Long, Int, Int)] =
    if (!looksLikeFlac(b)) None
    else
      try {
        // first metadata block must be STREAMINFO (type 0), length 34
        val blockType = b(4) & 0x7f
        val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
        if (blockType != 0 || len < 34) None
        else {
          def u(i: Int): Int = b(8 + i) & 0xff
          val rate = (u(10) << 12) | (u(11) << 4) | (u(12) >> 4)
          val channels = ((u(12) >> 1) & 0x7) + 1
          val totalSamples =
            ((u(13) & 0x0fL) << 32) | (u(14).toLong << 24) |
              (u(15).toLong << 16) | (u(16).toLong << 8) | u(17).toLong
          if (rate <= 0) None
          else Some((totalSamples, channels, rate))
        }
      } catch { case _: Exception => None }

  /** Deterministic minimal FLAC payload (marker + STREAMINFO with the
    * spec's real bit layout) for planting a true audio container
    * under the oracle — the GIF/MP4 idiom. [[decodeFlacMeta]] and any
    * conformant decoder read back exactly (totalSamples, channels,
    * rate).
    */
  def flacBytes(totalSamples: Long, channels: Int, rate: Int): Array[Byte] = {
    val out = new Array[Byte](8 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last-metadata-block flag + type 0 (STREAMINFO)
    out(7) = 34          // block length
    def set(i: Int, v: Int): Unit = out(8 + i) = v.toByte
    set(0, 0x10); set(1, 0x00) // min block size 4096
    set(2, 0x10); set(3, 0x00) // max block size
    // frame sizes (bytes 4..9) unknown = 0
    set(10, rate >> 12); set(11, (rate >> 4) & 0xff)
    set(12, ((rate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) | 0) // bps-1 high bit 0
    set(13, (0xf << 4) | ((totalSamples >> 32) & 0xf).toInt) // bps-1 low = 15 (16-bit)
    set(14, ((totalSamples >> 24) & 0xff).toInt)
    set(15, ((totalSamples >> 16) & 0xff).toInt)
    set(16, ((totalSamples >> 8) & 0xff).toInt)
    set(17, (totalSamples & 0xff).toInt)
    // md5 (bytes 18..33) zero = unknown
    out
  }

  /** True iff the payload carries an ISO-BMFF `ftyp` box up front —
    * the MP4/MOV/3GP container family.
    */
  private[llm] def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  /** Video metadata from an ISO-BMFF (MP4) container by walking the
    * box tree — pure JDK byte parsing, the same stance as the
    * WAV/GIF headers (ISO/IEC 14496-12 is public spec; no pixel or
    * sample data is touched):
    *
    *   moov → trak → tkhd        presentation width/height (16.16 fixed)
    *   moov → trak → mdia → minf → stbl → stsz   sample (frame) count
    *
    * The first trak with a nonzero tkhd width×height is the video
    * track (audio traks carry 0×0 by spec). Each box is 4-byte BE
    * size + 4-byte type; size 1 = 64-bit largesize follows, size 0 =
    * extends to end of enclosing box. tkhd/mvhd are versioned full
    * boxes (v1 widens the time fields by 4 bytes each). Truncated or
    * malformed boxes abort to None — a corrupt payload must fall
    * through to the quarantine path, not kill a 100 TB scan task.
    */
  private[graft] def decodeMp4Meta(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (!looksLikeMp4(b)) None
    else
      try {
        def be32(off: Int): Long =
          ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
            ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
        def be64(off: Int): Long =
          (be32(off) << 32) | be32(off + 4)
        def typ(off: Int): String =
          new String(b, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        // children of the box spanning [off, end): Seq of (type, bodyOff, bodyEnd)
        def children(off: Int, end: Int): Iterator[(String, Int, Int)] =
          new Iterator[(String, Int, Int)] {
            private var p = off
            def hasNext: Boolean = p + 8 <= end
            def next(): (String, Int, Int) = {
              val sz = be32(p)
              val (bodyOff, boxEnd) =
                if (sz == 1L) (p + 16, p + be64(p + 8))
                else if (sz == 0L) (p + 8, end.toLong)
                else (p + 8, p + sz)
              if (boxEnd > end || boxEnd < bodyOff)
                throw new IllegalArgumentException("box overruns container")
              val t = typ(p)
              p = boxEnd.toInt
              (t, bodyOff, boxEnd.toInt)
            }
          }
        def find(off: Int, end: Int, t: String): Option[(Int, Int)] =
          children(off, end).collectFirst { case (`t`, o, e) => (o, e) }
        find(0, b.length, "moov").flatMap { case (moovO, moovE) =>
          children(moovO, moovE).filter(_._1 == "trak").flatMap { case (_, to, te) =>
          find(to, te, "tkhd").flatMap { case (ho, he) =>
            val version = b(ho) & 0xff
            // v0 body: vf4 + times 4+4 + id4 + res4 + dur4 + res8 +
            // layer2 + group2 + vol2 + res2 + matrix36 → width at 76;
            // v1 widens creation/modification/duration to 8 bytes (+12)
            val wOff = ho + (if (version == 1) 88 else 76)
            if (wOff + 8 > he) None
            else {
              val w = (be32(wOff) >> 16).toInt   // 16.16 fixed point
              val h = (be32(wOff + 4) >> 16).toInt
              if (w <= 0 || h <= 0) None // audio/hint trak: keep looking
              else {
                val frames = for {
                  (mo, me) <- find(to, te, "mdia")
                  (no, ne) <- find(mo, me, "minf")
                  (so, se) <- find(no, ne, "stbl")
                  (zo, ze) <- find(so, se, "stsz")
                  if zo + 12 <= ze
                } yield be32(zo + 8).toInt // sample_count
                Some((w, h, math.max(1, frames.getOrElse(1))))
              }
            }
          }
          }.nextOption()
        }
      } catch { case _: Exception => None }

  /** DCT perceptual hash of a decoded image (the classic pHash
    * recipe): area-average the luma plane to 32×32, 2-D DCT-II, keep
    * the 8×8 low-frequency block, one bit per NON-DC coefficient =
    * above the median of the 63 non-DC values (odd count → the
    * middle element, nonDc(31)). The DC coefficient is excluded —
    * it is virtually always above the median, so including it would
    * spend a constant bit; its position (bit 0) stays 0. Bit layout
    * row-major from (0,1); deterministic for a given pixel grid.
    */
  private[llm] def imagePhash64(img: java.awt.image.BufferedImage): Long = {
    val N = 32
    val w = img.getWidth
    val h = img.getHeight
    val luma = new Array[Double](N * N)
    var y = 0
    while (y < N) {
      val y0 = y * h / N
      val y1 = math.max(y0 + 1, (y + 1) * h / N)
      var x = 0
      while (x < N) {
        val x0 = x * w / N
        val x1 = math.max(x0 + 1, (x + 1) * w / N)
        var s = 0.0
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val rgb = img.getRGB(xx, yy)
            s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            xx += 1
          }
          yy += 1
        }
        luma(y * N + x) = s / ((y1 - y0) * (x1 - x0))
        x += 1
      }
      y += 1
    }
    // separable DCT-II, only the first 8 output frequencies per axis
    val K = 8
    val cosT = Array.tabulate(K, N)((k, n) =>
      math.cos((2 * n + 1) * k * math.Pi / (2.0 * N)))
    val rows = Array.ofDim[Double](K, N) // DCT over x, first K u-freqs
    var u = 0
    while (u < K) {
      var yy = 0
      while (yy < N) {
        var s = 0.0
        var xx = 0
        while (xx < N) { s += luma(yy * N + xx) * cosT(u)(xx); xx += 1 }
        rows(u)(yy) = s
        yy += 1
      }
      u += 1
    }
    val coef = new Array[Double](K * K)
    var v = 0
    while (v < K) {
      var uu = 0
      while (uu < K) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += rows(uu)(yy) * cosT(v)(yy); yy += 1 }
        coef(v * K + uu) = s
        uu += 1
      }
      v += 1
    }
    val nonDc = coef.drop(1).sorted
    val median = nonDc(31) // true median of the 63 non-DC values
    var bits = 0L
    var i = 1 // DC excluded: bit 0 is always 0
    while (i < 64) {
      if (coef(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Deterministic minimal ISO-BMFF (MP4) payload with the spec's
    * real box layout — ftyp + moov{mvhd, trak{tkhd(width, height),
    * mdia{minf{stbl{stsz(nFrames)}}}}} — for planting a true video
    * container under the oracle (the GIF idiom). Byte-exact for
    * given arguments; [[decodeMp4Meta]] reads back exactly
    * (width, height, nFrames), and so would any conformant demuxer.
    */
  def mp4Bytes(nFrames: Int, width: Int, height: Int): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(t: String, body: Array[Byte]*): Array[Byte] = {
      val b = body.flatten.toArray
      be32(8L + b.length) ++ t.getBytes("US-ASCII") ++ b
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII"), be32(512), "isommp41".getBytes("US-ASCII"))
    // mvhd v0: vf, creation, modification, timescale, duration, rate,
    // volume+reserved, reserved, matrix (identity), predefined, next id
    val mvhd = box("mvhd",
      be32(0), be32(0), be32(0), be32(1000), be32(nFrames * 40L),
      be32(0x00010000L), Array[Byte](0, 0, 0, 0), new Array[Byte](8),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      new Array[Byte](24), be32(2))
    // tkhd v0 (flags=7 enabled): times, track id, duration, layout,
    // identity matrix, then 16.16 presentation width/height
    val tkhd = box("tkhd",
      be32(7), be32(0), be32(0), be32(1), be32(0), be32(nFrames * 40L),
      new Array[Byte](8), Array[Byte](0, 0, 0, 0, 0, 0, 0, 0),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      be32(width.toLong << 16), be32(height.toLong << 16))
    val stsz = box("stsz", be32(0), be32(1024), be32(nFrames))
    val mdia = box("mdia", box("minf", box("stbl", stsz)))
    ftyp ++ box("moov", mvhd, box("trak", tkhd, mdia))
  }

  /** Deterministic multi-frame GIF payload (JDK gif writer in
    * sequence mode): the planted fixture that drives the REAL
    * [[imageFrameCount]] codec path inside oracle-checked queries —
    * a decodable animated container with a KNOWN frame count the
    * cross-engine oracle can pin as a constant.
    */
  def animatedGifBytes(nFrames: Int, size: Int = 16): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    var i = 0
    while (i < nFrames) {
      val img = new java.awt.image.BufferedImage(
        size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < size) {
        var x = 0
        while (x < size) {
          img.setRGB(x, y,
            (((i * 40 + x * 8) % 256) << 16) | (((y * 8) % 256) << 8) |
              ((x * y) % 256))
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      i += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    out.close()
    bos.toByteArray
  }

  /** 64-bit perceptual signature of a payload: real DCT pHash when
    * the bytes decode as an image, deterministic stub
    * (splitmix64∘FNV-1a — bit-identical to the codegen
    * `F.splitmix64(F.fnvBinary(...))` pair, both call the same
    * [[graft.functions.HashOps]] kernels) otherwise.
    */
  def phash64(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case Some(img) => imagePhash64(img)
      case None =>
        graft.functions.HashOps.splitmix64(
          graft.functions.HashOps.fnv1a64(payload, 0, payload.length))
    }

  /** Per-payload perceptual signatures via the batched codec
    * interface (iterator-in/iterator-out `mapPartitions`, same shape
    * a JNI/FFI codec needs — no per-row JVM↔native crossing).
    */
  def phashSignatures(
      spark: SparkSession, df: DataFrame, id: Column, payload: Column): DataFrame = {
    import spark.implicits._
    df.select(id.as("doc_id"), payload.as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, bytes) => (docId, phash64(bytes)) })
      .toDF("doc_id", "sig")
  }

  /** Perceptual-hash near-duplicate pairs over binary payloads — the
    * image twin of SimHash text dedup. Signatures come from
    * [[phashSignatures]] (real DCT pHash for decodable images, the
    * deterministic stub otherwise); everything downstream is the
    * real scale machinery: [[Dedup.hammingPairs]]' 4×16-bit banding,
    * one shuffle, pigeonhole-exact recall for Hamming ≤ 3.
    */
  def phashDedupPairs(
      spark: SparkSession, df: DataFrame, id: Column, payload: Column,
      maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs(phashSignatures(spark, df, id, payload), maxHamming)

  /** Attach an opaque binary payload + modality metadata to a
    * documents frame. Payload here is the UTF-8 encoding of the text
    * (deterministic stand-in for real media bytes).
    */
  def attachPayload(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      text.cast("binary").as("payload"),
      when(id % 3 === 0, "image")
        .when(id % 3 === 1, "audio")
        .otherwise("video").as("modality"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))

  /** Resize plan for decoded media: cap the longest edge at `maxDim`
    * preserving aspect ratio (integer arithmetic — the real resample
    * happens in the stubbed codec; this computes the target geometry
    * every image pipeline needs). Pure projection, zero shuffles.
    */
  def resizePlan(features: DataFrame, maxDim: Int = 256): DataFrame = {
    // floor() on both engines — a bare double→int cast truncates in
    // Spark but ROUNDS in DuckDB, which would break oracle parity
    def scaled(a: Column, b: Column): Column =
      greatest(lit(1), floor((a * least(b, lit(maxDim))) / b).cast("int"))
    features.select(
      col("doc_id"), col("modality"), col("width"), col("height"),
      when(col("width") >= col("height"), least(col("width"), lit(maxDim)))
        .otherwise(scaled(col("width"), col("height"))).as("out_w"),
      when(col("height") > col("width"), least(col("height"), lit(maxDim)))
        .otherwise(scaled(col("height"), col("width"))).as("out_h"))
  }

  /** Frame-sampling plan for video rows: at most `maxFrames` evenly
    * strided frames — emits the sampled frame indices (the real frame
    * extraction is codec work; the plan is what the pipeline
    * schedules). Images/audio pass through with frame 0. Stride is
    * ceil(n/maxFrames) so the sample count never exceeds `maxFrames`.
    */
  def frameSamplePlan(features: DataFrame, maxFrames: Int = 8): DataFrame = {
    // (n + maxFrames - 1) / maxFrames in exact integer math; the
    // double-division + int cast truncates (positive) = floor
    val stride = greatest(lit(1),
      ((col("n_frames") + (maxFrames - 1)) / maxFrames).cast("int"))
    features.select(
      col("doc_id"), col("modality"), col("n_frames"),
      when(col("modality") === "video",
        sequence(lit(0), col("n_frames") - 1, stride))
        .otherwise(array(lit(0))).as("frame_idx"))
      .withColumn("n_sampled", size(col("frame_idx")).cast("long"))
  }

  /** Reason-coded curation filter on decoded media features — the
    * keep/drop pass every web-scale image pipeline runs after decode
    * (size floor, aspect-ratio band, payload floor). FIRST-match
    * reason in a stable order, so per-reason rejection counts are
    * additive and reproducible; the aspect test is integer
    * (maxAspect·min(w,h) ≥ max(w,h)) — no float ratio to round.
    * Pure projection: map-only, composes with the decode batch at
    * full scan parallelism.
    */
  def curationFilter(
      features: DataFrame, minDim: Int = 64, maxAspect: Int = 3,
      minBytes: Long = 64L): DataFrame =
    features.select(
      col("doc_id"), col("modality"), col("width"), col("height"),
      col("n_bytes"),
      when(col("width") < minDim || col("height") < minDim, "too_small")
        .when(least(col("width"), col("height")) * maxAspect <
          greatest(col("width"), col("height")), "bad_aspect")
        .when(col("n_bytes") < minBytes, "tiny_payload")
        .otherwise("keep").as("verdict"))

  /** Feature extraction with the REAL codecs the JDK ships: image
    * payloads (PNG/JPEG/GIF/BMP) report true header dimensions and
    * container frame count (animated GIFs > 1) through
    * `javax.imageio`; WAV payloads report (channels, sample rate,
    * sample frames) as (width, height, n_frames) through
    * `javax.sound.sampled`; MP4/ISO-BMFF payloads report tkhd
    * presentation dims and the stsz sample count via the box walk
    * ([[decodeMp4Meta]]). Everything else falls through to the
    * deterministic stub — same schema, same batched `mapPartitions`
    * shape, so further codecs (FLAC, MKV, …) swap into the per-row
    * closure without touching the plan.
    */
  def decode(spark: SparkSession, withPayload: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("modality"), col("n_bytes"), col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, modality, nBytes, payload) =>
          decodeImage(payload) match {
            case Some(img) =>
              MediaFeatures(docId, modality, nBytes, img.getWidth, img.getHeight,
                imageFrameCount(payload))
            case None =>
              decodeWavMeta(payload) match {
                case Some((frames, channels, rate)) =>
                  MediaFeatures(docId, modality, nBytes, channels, rate,
                    math.min(frames, Int.MaxValue.toLong).toInt)
                case None =>
                  decodeMp4Meta(payload) match {
                    case Some((w, h, frames)) =>
                      MediaFeatures(docId, modality, nBytes, w, h, frames)
                    case None =>
                      decodeFlacMeta(payload) match {
                        case Some((samples, channels, rate)) =>
                          MediaFeatures(docId, modality, nBytes, channels, rate,
                            math.min(samples, Int.MaxValue.toLong).toInt)
                        case None => stubFeatures(docId, modality, nBytes, payload)
                      }
                  }
              }
          }
        }
      }
  }

  /** Sample-level audio decode over binary payloads: WAV PCM16 rows
    * get REAL per-sample statistics through [[decodeWavSamples]]
    * (`decoded` = true); everything else falls to the deterministic
    * stub arm so the schema, the batched `mapPartitions` shape and
    * the cross-engine oracle are uniform. Same swap-in contract as
    * [[decode]]: an MP3/AAC codec would slot into the per-row closure
    * without touching the plan.
    */
  def decodeAudio(spark: SparkSession, withPayload: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, payload) =>
        decodeWavSamples(payload) match {
          case Some((frames, channels, rate, peak)) =>
            AudioFeatures(docId, frames, channels, rate, peak, decoded = true)
          case None =>
            val h = graft.functions.HashOps.fnv1a64(payload, 0, payload.length)
            // deterministic fake stats, unsigned-shift arithmetic the
            // oracle replays with HUGEINT floor-division
            AudioFeatures(docId,
              (h >>> 8) % 100000L + 1L,
              (((h >>> 16) % 2) + 1).toInt,
              (8000L * (((h >>> 24) % 6) + 1)).toInt,
              ((h >>> 40) % 32768).toInt,
              decoded = false)
        }
      })
  }

  private def stubFeatures(
      docId: Long, modality: String, nBytes: Long,
      payload: Array[Byte]): MediaFeatures = {
    val h = graft.functions.HashOps.fnv1a64(payload, 0, payload.length)
    // deterministic fake dims — the real codec reads the header
    val w = (math.abs(h % 1024) + 1).toInt
    val ht = (math.abs((h >>> 16) % 1024) + 1).toInt
    val frames = if (modality == "video") (math.abs((h >>> 32) % 300) + 1).toInt else 1
    MediaFeatures(docId, modality, nBytes, w, ht, frames)
  }

  /** STUB-ONLY decode: the deterministic fallback for every row, kept
    * for oracle generation and determinism specs. [[decode]] is the
    * production path.
    */
  def fakeDecode(spark: SparkSession, withPayload: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("modality"), col("n_bytes"), col("payload"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions(_.map { case (docId, modality, nBytes, payload) =>
        stubFeatures(docId, modality, nBytes, payload)
      })
  }
}
