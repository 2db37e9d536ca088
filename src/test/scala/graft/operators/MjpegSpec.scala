package graft.operators

import graft.SparkSpec
import graft.tools.MjpegFixture

/** MJPEG pixel decode: demux → sample slice → javax.imageio, against the
  * generation-time truth (container rows from the write plan, pixel rows
  * from decoding the exact bytes written into mdat). */
class MjpegSpec extends SparkSpec {

  private lazy val (rows, truth) = MjpegFixture.all()

  private def rec(r: MjpegFixture.Row) =
    Multimodal.MediaRecord(r.id, r.payload, r.media_type, 0, 0)

  test("every fixture frame decodes to its generation-time truth") {
    val byId = truth.groupBy(_.id)
    rows.filter(_.id <= 10).foreach { r =>
      val got = VideoDemux.decodeJpegFrames(rec(r)).toSeq
      val want = byId.getOrElse(r.id, Seq.empty).map(t =>
        VideoDemux.FrameDecode(t.id, t.track, t.sample, t.is_key,
          t.decoded, t.width, t.height, t.mean_pixel, t.raster_md5))
      assert(got == want, s"fixture ${r.id}: $got != $want")
    }
  }

  test("degradation is layered: container, codec, sample") {
    // malformed containers (ids 11-12) emit zero rows
    rows.filter(_.id >= 11).foreach { r =>
      assert(VideoDemux.decodeJpegFrames(rec(r)).isEmpty, s"id ${r.id}")
    }
    // avc1 (id 9): the container parses but no sample decodes — six
    // decoded=false rows, not zero rows and not a throw
    val avc1 = VideoDemux.decodeJpegFrames(rec(rows.find(_.id == 9).get)).toSeq
    assert(avc1.size == 6 && avc1.forall(f => !f.decoded && f.rasterMd5.isEmpty))
    // garbled sample (id 10, sample 2) fails alone; its siblings decode
    val mixed = VideoDemux.decodeJpegFrames(rec(rows.find(_.id == 10).get)).toSeq
    assert(mixed.filter(_.decoded).map(_.sample) ==
      mixed.map(_.sample).filter(_ != 2))
  }

  test("handler filtering: the A/V file decodes only the video track") {
    val av = VideoDemux.decodeJpegFrames(rec(rows.find(_.id == 8).get)).toSeq
    assert(av.nonEmpty && av.forall(_.track == 1))
    assert(av.forall(_.decoded))
  }

  test("keyOnly restricts to sync samples") {
    // id 1 marks every 2nd sample sync (stss); id 0 is all-intra
    val r1 = rows.find(_.id == 1).get
    val keys = VideoDemux.decodeJpegFrames(rec(r1), keyOnly = true).toSeq
    val all = VideoDemux.decodeJpegFrames(rec(r1)).toSeq
    assert(keys == all.filter(_.isKey) && keys.size < all.size)
    val r0 = rows.find(_.id == 0).get
    assert(VideoDemux.decodeJpegFrames(rec(r0), keyOnly = true).size ==
      VideoDemux.decodeJpegFrames(rec(r0)).size)
  }

  test("real image resize: dims contract, flat colors exact, round-trip") {
    import graft.tools.ImageFixture
    // a flat-color image resizes to the SAME flat color: bilinear
    // interpolation of identical pixels is exact, so the decoded mean
    // survives the lossy-free PNG round trip bit-for-bit
    val img = new java.awt.image.BufferedImage(40, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 20).foreach(y => (0 until 40).foreach(x =>
      img.setRGB(x, y, (90 << 16) | (140 << 8) | 200)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rec = Multimodal.MediaRecord(1L, bos.toByteArray, "image/png", 0, 0)
    val out = Multimodal.resizeImage(rec, 10)
    assert((out.width, out.height) == ((10, 5)), s"${out.width}x${out.height}")
    val dec = Multimodal.decodeImage(out)
    assert(dec.decoded && dec.width == 10 && dec.height == 5)
    assert(dec.meanPixel == (90.0 + 140.0 + 200.0) / 3.0, dec.meanPixel)
    // portrait transpose + floor division + floor-to-1
    val (b2, _) = ImageFixture.makeImage(7, 9, 31, "png")
    val o2 = Multimodal.resizeImage(
      Multimodal.MediaRecord(2L, b2, "image/png", 0, 0), 10)
    assert((o2.width, o2.height) == ((9 * 10 / 31, 10)))
    // no upscale: a within-budget image passes through byte-identical
    val (b3, _) = ImageFixture.makeImage(8, 8, 9, "png")
    val o3 = Multimodal.resizeImage(
      Multimodal.MediaRecord(3L, b3, "image/png", 0, 0), 10)
    assert(o3.payload.sameElements(b3) && (o3.width, o3.height) == ((8, 9)))
    // non-image passthrough, 0x0 metadata
    val junk = Multimodal.resizeImage(
      Multimodal.MediaRecord(4L, "not an image".getBytes, "x", 5, 5), 10)
    assert(junk.payload.sameElements("not an image".getBytes) &&
      junk.width == 0 && junk.height == 0)
  }

  test("distributed decode agrees with the local walk") {
    implicit val s = spark
    import s.implicits._
    val ds = spark.createDataset(rows.map(rec)).repartition(4)
    val got = VideoDemux.decodeAllJpegFrames(ds).collect()
      .sortBy(f => (f.id, f.track, f.sample)).toSeq
    val want = rows.sortBy(_.id).flatMap(r =>
      VideoDemux.decodeJpegFrames(rec(r)).toSeq)
    assert(got == want)
  }
}
