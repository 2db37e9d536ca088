package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** REAL MP4/ISO-BMFF container demux — pure-JVM byte parsing, zero
  * dependencies. INTER-FRAME video codecs are not in the JDK, so their
  * pixel decode is a PERMANENT boundary of this library (degraded
  * per-sample; [[Multimodal]]'s scaladoc states the contract) — but
  * MJPEG samples are complete JPEGs and I420 samples are raw planes,
  * so [[decodeVideoFrames]] below decodes those pixels for real — and
  * everything a 100 TB video pipeline does BEFORE the codec is container
  * work, and that is real here: walk the box tree (ftyp/moov/trak/mdia/
  * minf/stbl), read each track's media header and sample tables
  * (stts/stsz/stss/stsc/stco|co64), and resolve every sample's byte
  * range in `mdat` — which is exactly what a demuxer does to route
  * keyframe payloads to GPU decoders without touching the other 97% of
  * the bytes.
  *
  * Box layout reference: ISO/IEC 14496-12 (the public ISOBMFF spec);
  * the reference engine has no media surface — this extends the
  * LLM-pipeline layer like the image/audio decode paths.
  *
  * Degradation contract (same as [[Multimodal.decodeImageFrames]]): a
  * payload that is not an MP4, is truncated, or carries an inconsistent
  * sample table emits ZERO rows — the row degrades, a 1000-task stage
  * never throws. Consistency is strict per record: stts and stsz must
  * agree on the sample count, stsc/stco must cover every sample, and
  * every resolved byte range must lie inside the payload.
  */
object VideoDemux {

  /** One track's container-level metadata. `durationUnits` is in the
    * track's own `timescale` (exact integers end-to-end — milliseconds
    * would force a float division into the truth contract). */
  case class TrackInfo(id: Long, track: Int, handler: String,
                       timescale: Long, durationUnits: Long,
                       width: Int, height: Int, nSamples: Long,
                       nKeyframes: Long, sampleBytes: Long)

  /** One resolved sample: its byte range in the payload and the md5 of
    * those bytes — proof the range was actually read, not inferred. */
  case class SampleInfo(id: Long, track: Int, sample: Int, offset: Long,
                        size: Int, isKey: Boolean, md5: String)

  /** Internal parse failure — caught at the record boundary. */
  private final class ParseError(msg: String) extends Exception(msg)

  private def fail(msg: String): Nothing = throw new ParseError(msg)

  // ---- big-endian primitive reads with bounds checks ------------------

  private def u32(b: Array[Byte], p: Long): Long = {
    if (p < 0 || p + 4 > b.length) fail(s"u32 read past end at $p")
    val i = p.toInt
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  }

  private def u64(b: Array[Byte], p: Long): Long = {
    if (p < 0 || p + 8 > b.length) fail(s"u64 read past end at $p")
    (u32(b, p) << 32) | u32(b, p + 4)
  }

  private def fourcc(b: Array[Byte], p: Long): String = {
    if (p < 0 || p + 4 > b.length) fail(s"fourcc read past end at $p")
    new String(b, p.toInt, 4, "ISO-8859-1")
  }

  /** One parsed box: (type, payload start, payload end). */
  private case class Box(typ: String, start: Long, end: Long)

  /** Walk the boxes in [from, to): size(4) type(4) [largesize(8)];
    * size==0 means to-end, size==1 means 64-bit largesize. */
  private def boxes(b: Array[Byte], from: Long, to: Long): List[Box] = {
    val out = List.newBuilder[Box]
    var p = from
    while (p < to) {
      if (p + 8 > to) fail(s"box header past end at $p")
      val size0 = u32(b, p)
      val typ = fourcc(b, p + 4)
      val (hdr, size) =
        if (size0 == 1L) (16L, u64(b, p + 8))
        else if (size0 == 0L) (8L, to - p)
        else (8L, size0)
      // size > to - p (not p + size > to): a hostile largesize near
      // Long.MaxValue would overflow the addition past the check
      if (size < hdr || size > to - p) fail(s"box $typ size $size at $p")
      out += Box(typ, p + hdr, p + size)
      p += size
    }
    out.result()
  }

  private def child(bs: List[Box], typ: String): Option[Box] =
    bs.find(_.typ == typ)

  /** Parsed sample tables of one track. `codec` is the first sample
    * entry's fourcc from `stsd` ("jpeg" for MJPEG, "avc1" for H.264, …)
    * or "" when the box is absent — metadata parsing never required it,
    * so its absence must not fail records older strictness accepted. */
  private case class Stbl(nSamples: Long, durationUnits: Long,
                          sizes: Array[Int], keyframes: Array[Boolean],
                          offsets: Array[Long], codec: String)

  private def parseStbl(b: Array[Byte], stbl: Box): Stbl = {
    val bs = boxes(b, stbl.start, stbl.end)

    // stsd: codec identity = first sample entry's fourcc (entry_count at
    // +4, first entry's size at +8, its fourcc at +12)
    val codec = child(bs, "stsd") match {
      case Some(sd) if u32(b, sd.start + 4) >= 1 => fourcc(b, sd.start + 12)
      case _ => ""
    }

    // stts: sample count + total duration (run-length (count, delta))
    val stts = child(bs, "stts").getOrElse(fail("no stts"))
    val nStts = u32(b, stts.start + 4)
    var nSamples = 0L
    var dur = 0L
    var i = 0L
    while (i < nStts) {
      val c = u32(b, stts.start + 8 + i * 8)
      val d = u32(b, stts.start + 12 + i * 8)
      nSamples += c
      dur += c * d
      i += 1
    }

    // stsz: per-sample sizes (uniform when sample_size != 0)
    val stsz = child(bs, "stsz").getOrElse(fail("no stsz"))
    val uniform = u32(b, stsz.start + 4)
    val nStsz = u32(b, stsz.start + 8)
    if (nStsz != nSamples) fail(s"stsz count $nStsz != stts count $nSamples")
    if (nSamples > Int.MaxValue) fail("sample count overflow")
    val n = nSamples.toInt
    val sizes = new Array[Int](n)
    var j = 0
    while (j < n) {
      val s = if (uniform != 0L) uniform else u32(b, stsz.start + 12 + j * 4L)
      if (s > Int.MaxValue) fail("sample size overflow")
      sizes(j) = s.toInt
      j += 1
    }

    // stss: sync samples (1-based); ABSENT means every sample is a key
    val stssBox = child(bs, "stss")
    val keyframes = Array.fill(n)(stssBox.isEmpty)
    stssBox.foreach { stss =>
      val k = u32(b, stss.start + 4)
      var i = 0L
      while (i < k) {
        val sn = u32(b, stss.start + 8 + i * 4)
        if (sn < 1 || sn > n) fail(s"stss sample $sn out of 1..$n")
        keyframes(sn.toInt - 1) = true
        i += 1
      }
    }

    // stsc runs + stco/co64 chunk offsets -> per-sample byte offsets
    val stsc = child(bs, "stsc").getOrElse(fail("no stsc"))
    val nRuns = u32(b, stsc.start + 4).toInt
    val runs = (0 until nRuns).map { r =>
      (u32(b, stsc.start + 8 + r * 12L),   // first_chunk (1-based)
        u32(b, stsc.start + 12 + r * 12L)) // samples_per_chunk
    }
    val (co, wide) = child(bs, "stco").map((_, false))
      .orElse(child(bs, "co64").map((_, true)))
      .getOrElse(fail("no stco/co64"))
    val nChunks = u32(b, co.start + 4).toInt
    def chunkOffset(c: Int): Long = // c is 0-based
      if (wide) u64(b, co.start + 8 + c * 8L) else u32(b, co.start + 8 + c * 4L)

    val offsets = new Array[Long](n)
    var sample = 0
    var chunk = 0
    while (chunk < nChunks && sample < n) {
      // samples-per-chunk of the run covering chunk (1-based chunk+1)
      val spc = runs.takeWhile(_._1 <= chunk + 1).lastOption
        .getOrElse(fail(s"no stsc run covers chunk ${chunk + 1}"))._2
      var off = chunkOffset(chunk)
      var s = 0L
      while (s < spc && sample < n) {
        offsets(sample) = off
        off += sizes(sample)
        sample += 1
        s += 1
      }
      chunk += 1
    }
    if (sample != n) fail(s"chunks cover $sample of $n samples")
    Stbl(nSamples, dur, sizes, keyframes, offsets, codec)
  }

  /** Full parse of one record: per-track (TrackInfo, Stbl). Throws
    * [[ParseError]] on any malformation — callers catch at the record
    * boundary and degrade to zero rows. */
  private def parse(id: Long, bytes: Array[Byte]): List[(TrackInfo, Stbl)] = {
    val top = boxes(bytes, 0L, bytes.length.toLong)
    if (!top.exists(_.typ == "ftyp")) fail("no ftyp")
    val moov = child(top, "moov").getOrElse(fail("no moov"))
    boxes(bytes, moov.start, moov.end).filter(_.typ == "trak")
      .zipWithIndex.map { case (trak, t) =>
        val tb = boxes(bytes, trak.start, trak.end)

        // tkhd: width/height (16.16 fixed point) after the version-
        // dependent times/ids (v0: 20 B, v1: 32 B) + 52 B of layout
        val tkhd = child(tb, "tkhd").getOrElse(fail("no tkhd"))
        val tv = (u32(bytes, tkhd.start) >> 24).toInt
        val wOff = tkhd.start + 4 + (if (tv == 1) 32 else 20) + 52
        val width = (u32(bytes, wOff) >> 16).toInt
        val height = (u32(bytes, wOff + 4) >> 16).toInt

        val mdia = child(tb, "mdia").getOrElse(fail("no mdia"))
        val mb = boxes(bytes, mdia.start, mdia.end)
        val mdhd = child(mb, "mdhd").getOrElse(fail("no mdhd"))
        val mv = (u32(bytes, mdhd.start) >> 24).toInt
        val timescale =
          if (mv == 1) u32(bytes, mdhd.start + 20) else u32(bytes, mdhd.start + 12)
        val hdlr = child(mb, "hdlr").getOrElse(fail("no hdlr"))
        val handler = fourcc(bytes, hdlr.start + 8)
        val minf = child(mb, "minf").getOrElse(fail("no minf"))
        val stblBox = child(boxes(bytes, minf.start, minf.end), "stbl")
          .getOrElse(fail("no stbl"))
        val stbl = parseStbl(bytes, stblBox)

        (TrackInfo(id, t, handler, timescale, stbl.durationUnits,
          width, height, stbl.nSamples,
          stbl.keyframes.count(identity).toLong,
          stbl.sizes.foldLeft(0L)(_ + _)), stbl)
      }
  }

  /** Per-track container metadata of one record; zero rows when the
    * payload is not a consistent MP4. */
  def demuxTracks(r: Multimodal.MediaRecord): Iterator[TrackInfo] = {
    val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
    try parse(r.id, bytes).iterator.map(_._1)
    catch { case _: ParseError => Iterator.empty }
  }

  /** Resolved samples of one record — the frame-sample path: keyframes
    * only when `keyOnly` (what a sampling pipeline routes to decoders),
    * every range bounds-checked against the payload and md5-hashed from
    * the actual bytes. `handlerFilter` restricts to one handler type
    * (e.g. "vide"); zero rows on any malformation, including a sample
    * table whose ranges point outside the file (truncated mdat). */
  def extractSamples(r: Multimodal.MediaRecord, keyOnly: Boolean = true,
                     handlerFilter: Option[String] = Some("vide"))
      : Iterator[SampleInfo] = {
    val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
    try {
      val parsed = parse(r.id, bytes)
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = List.newBuilder[SampleInfo]
      parsed.withFilter { case (info, _) =>
        handlerFilter.forall(_ == info.handler)
      }.foreach { case (info, stbl) =>
        var s = 0
        while (s < stbl.sizes.length) {
          if (!keyOnly || stbl.keyframes(s)) {
            val off = stbl.offsets(s)
            val sz = stbl.sizes(s)
            if (off < 0 || off + sz > bytes.length)
              fail(s"sample $s range [$off, ${off + sz}) outside payload")
            md.reset()
            md.update(bytes, off.toInt, sz)
            out += SampleInfo(r.id, info.track, s, off, sz,
              stbl.keyframes(s), md.digest().map("%02x".format(_)).mkString)
          }
          s += 1
        }
      }
      out.result().iterator
    } catch { case _: ParseError => Iterator.empty }
  }

  /** Partition-parallel demux — the row-expanding (flatMap) shape of
    * [[Multimodal.decodeAllFrames]]. */
  def demuxAll(ds: Dataset[Multimodal.MediaRecord])
              (implicit spark: SparkSession): Dataset[TrackInfo] = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap(demuxTracks))
  }

  /** Partition-parallel keyframe-sample extraction. */
  def extractAllSamples(ds: Dataset[Multimodal.MediaRecord],
                        keyOnly: Boolean = true,
                        handlerFilter: Option[String] = Some("vide"))
      (implicit spark: SparkSession): Dataset[SampleInfo] = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap(extractSamples(_, keyOnly, handlerFilter)))
  }

  // ---- REAL pixel decode for MJPEG tracks ------------------------------

  /** One decoded video frame. `decoded = false` rows (zero dims,
    * `meanPixel = -1.0`, empty md5) mark samples whose codec has no JDK
    * decoder or whose payload would not decode — per-SAMPLE degradation,
    * one bad frame in a billion-frame corpus fails that row only. */
  case class FrameDecode(id: Long, track: Int, sample: Int, isKey: Boolean,
                         decoded: Boolean, width: Int, height: Int,
                         meanPixel: Double, rasterMd5: String)

  /** Raster signature of a decoded frame: exact integer RGB sum (the
    * [[Multimodal.decodeImage]] mean arithmetic) and an md5 over the
    * packed row-major (R, G, B) bytes — a value only obtainable by
    * actually producing the pixels. Shared with the fixture generator so
    * truth and operator walk the raster identically. */
  def rasterSignature(img: java.awt.image.BufferedImage): (Long, String) = {
    val w = img.getWidth
    val h = img.getHeight
    val md = java.security.MessageDigest.getInstance("MD5")
    val row = new Array[Byte](w * 3)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        sum += r + g + b
        row(x * 3) = r.toByte; row(x * 3 + 1) = g.toByte
        row(x * 3 + 2) = b.toByte
        x += 1
      }
      md.update(row)
      y += 1
    }
    (sum, md.digest().map("%02x".format(_)).mkString)
  }

  /** Per-sample pixel decoder: (codec fourcc, sample bytes, track
    * width, track height) → Some((w, h, rgbSum, rasterMd5)) on success,
    * None when the codec is not handled or the bytes do not decode —
    * the `decoded = false` per-sample degradation. */
  private type SampleDecoder =
    (String, Array[Byte], Int, Int) => Option[(Int, Int, Long, String)]

  private val jpegDecoder: SampleDecoder = (codec, slice, _, _) =>
    if (codec != "jpeg") None
    else {
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(slice))
        catch { case _: java.io.IOException => null }
      if (img == null) None
      else {
        val (sum, md5) = rasterSignature(img)
        Some((img.getWidth, img.getHeight, sum, md5))
      }
    }

  private val i420Decoder: SampleDecoder = (codec, slice, w, h) =>
    if (codec != "I420") None else i420Signature(slice, w, h)

  /** Raster signature of one I420 (planar YUV 4:2:0, 8-bit) sample —
    * the raw-video twin of [[rasterSignature]]: Y plane of `w*h` bytes,
    * then U and V planes of `ceil(w/2)*ceil(h/2)` each (odd dims round
    * UP — the chroma sample covering the edge row/column exists). Dims
    * come from the track header ('I420' carries no in-band geometry).
    * Returns None when dims are non-positive or the payload length is
    * not exactly the three-plane sum (a truncated or padded sample
    * cannot silently half-decode).
    *
    * YUV → RGB is the classic fixed-point studio-swing BT.601 kernel
    * (`c = 298(Y-16)`; `R = clamp((c + 409(V-128) + 128) >> 8)` etc.) —
    * exact integer arithmetic end-to-end, so raster md5 and mean are
    * reproducible bit-for-bit by any implementation of the same spec. */
  def i420Signature(bytes: Array[Byte], w: Int, h: Int)
      : Option[(Int, Int, Long, String)] = {
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    if (w <= 0 || h <= 0 ||
        bytes.length.toLong != w.toLong * h + 2L * cw * ch) None
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val row = new Array[Byte](w * 3)
      val uOff = w * h
      val vOff = uOff + cw * ch
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = bytes(y * w + x) & 0xff
          val u = bytes(uOff + (y / 2) * cw + x / 2) & 0xff
          val v = bytes(vOff + (y / 2) * cw + x / 2) & 0xff
          val c = 298 * (yy - 16)
          val d = u - 128
          val e = v - 128
          def cl(i: Int) = if (i < 0) 0 else if (i > 255) 255 else i
          val r = cl((c + 409 * e + 128) >> 8)
          val g = cl((c - 100 * d - 208 * e + 128) >> 8)
          val b = cl((c + 516 * d + 128) >> 8)
          sum += r + g + b
          row(x * 3) = r.toByte
          row(x * 3 + 1) = g.toByte
          row(x * 3 + 2) = b.toByte
          x += 1
        }
        md.update(row)
        y += 1
      }
      Some((w, h, sum, md.digest().map("%02x".format(_)).mkString))
    }
  }

  /** Shared decode walk: demux (box walk → stsc/stco sample ranges) →
    * slice the payload → hand each slice to `dec`. Degradation is
    * layered: a malformed CONTAINER emits zero rows (the
    * [[extractSamples]] contract); a sample the decoder declines emits
    * `decoded = false` for that SAMPLE only. */
  private def decodeFramesWith(r: Multimodal.MediaRecord, keyOnly: Boolean,
                               dec: SampleDecoder): Iterator[FrameDecode] = {
    val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
    try {
      val out = List.newBuilder[FrameDecode]
      parse(r.id, bytes).withFilter(_._1.handler == "vide").foreach {
        case (info, stbl) =>
          var s = 0
          while (s < stbl.sizes.length) {
            if (!keyOnly || stbl.keyframes(s)) {
              val off = stbl.offsets(s)
              val sz = stbl.sizes(s)
              if (off < 0 || off + sz > bytes.length)
                fail(s"sample $s range [$off, ${off + sz}) outside payload")
              val slice = java.util.Arrays.copyOfRange(
                bytes, off.toInt, off.toInt + sz)
              out += (dec(stbl.codec, slice, info.width, info.height) match {
                case None =>
                  FrameDecode(r.id, info.track, s, stbl.keyframes(s),
                    decoded = false, 0, 0, -1.0, "")
                case Some((w, h, sum, md5)) =>
                  FrameDecode(r.id, info.track, s, stbl.keyframes(s),
                    decoded = true, w, h, sum.toDouble / (3.0 * w * h), md5)
              })
            }
            s += 1
          }
      }
      out.result().iterator
    } catch { case _: ParseError => Iterator.empty }
  }

  /** REAL video pixel decode for MJPEG — a video codec whose samples
    * the JDK can decode, because each MJPEG sample IS a complete JPEG
    * image (`javax.imageio`, zero new dependencies; sample entry fourcc
    * "jpeg" per ISO/IEC 14496-12 + the QuickTime registry). The full
    * pipeline is demux → slice → decode the slice — exactly what a
    * production frame sampler does before handing H.264 samples to a
    * GPU codec; for MJPEG the JDK IS the codec, so the path is real
    * end-to-end. */
  def decodeJpegFrames(r: Multimodal.MediaRecord, keyOnly: Boolean = false)
      : Iterator[FrameDecode] =
    decodeFramesWith(r, keyOnly, jpegDecoder)

  /** Partition-parallel MJPEG frame decode. */
  def decodeAllJpegFrames(ds: Dataset[Multimodal.MediaRecord],
                          keyOnly: Boolean = false)
      (implicit spark: SparkSession): Dataset[FrameDecode] = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap(decodeJpegFrames(_, keyOnly)))
  }

  /** REAL pixel decode across every codec this library decodes in-JVM:
    * MJPEG ("jpeg", [[decodeJpegFrames]]) and uncompressed planar YUV
    * ("I420", [[i420Signature]]). Inter-frame codecs (avc1/hev1/vp09…)
    * have no JDK decoder — a PERMANENT boundary of this pure-JVM
    * library, degraded per-sample as `decoded = false` (route those
    * samples' byte ranges, which [[extractSamples]] resolves for any
    * codec, to an external decoder). */
  def decodeVideoFrames(r: Multimodal.MediaRecord, keyOnly: Boolean = false)
      : Iterator[FrameDecode] =
    decodeFramesWith(r, keyOnly,
      (codec, slice, w, h) =>
        if (codec == "jpeg") jpegDecoder(codec, slice, w, h)
        else i420Decoder(codec, slice, w, h))

  /** Partition-parallel all-codec frame decode. */
  def decodeAllVideoFrames(ds: Dataset[Multimodal.MediaRecord],
                           keyOnly: Boolean = false)
      (implicit spark: SparkSession): Dataset[FrameDecode] = {
    import spark.implicits._
    ds.mapPartitions(_.flatMap(decodeVideoFrames(_, keyOnly)))
  }
}
