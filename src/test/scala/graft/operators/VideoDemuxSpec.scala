package graft.operators

import graft.SparkSpec
import graft.tools.VideoFixture

class VideoDemuxSpec extends SparkSpec {

  test("mp4 demux roundtrips every fixture's write-time truth") {
    (0 until 20).foreach { k =>
      val (bytes, trackTruth, sampleTruth) = VideoFixture.makeMp4(k)
      val rec = Multimodal.MediaRecord(k.toLong, bytes, "video/mp4", 0, 0)

      val tracks = VideoDemux.demuxTracks(rec).toSeq
      val want = trackTruth.map(t => VideoDemux.TrackInfo(t.id, t.track,
        t.handler, t.timescale, t.duration_units, t.width, t.height,
        t.n_samples, t.n_keyframes, t.sample_bytes))
      assert(tracks == want, s"fixture $k tracks: $tracks != $want")

      val samples = VideoDemux.extractSamples(rec).toSeq
      val wantS = sampleTruth.map(t => VideoDemux.SampleInfo(t.id, t.track,
        t.sample, t.offset, t.size, isKey = true, t.md5))
      assert(samples == wantS, s"fixture $k samples diverge")
    }
  }

  test("fixture population covers the branch matrix") {
    // two-track file (video+audio), audio track filtered out of samples
    val (b1, tt1, _) = VideoFixture.makeMp4(1)
    assert(tt1.map(_.handler) == Seq("vide", "soun"))
    val r1 = Multimodal.MediaRecord(1L, b1, "video/mp4", 0, 0)
    assert(VideoDemux.demuxTracks(r1).size == 2)
    assert(VideoDemux.extractSamples(r1).forall(_.track == 0))
    // handlerFilter=None + keyOnly=false walks EVERY sample of EVERY
    // track, and the per-track totals match the truth
    val all = VideoDemux.extractSamples(r1, keyOnly = false,
      handlerFilter = None).toSeq
    tt1.zipWithIndex.foreach { case (t, i) =>
      val ts = all.filter(_.track == i)
      assert(ts.size == t.n_samples, s"track $i sample count")
      assert(ts.map(_.size.toLong).sum == t.sample_bytes, s"track $i bytes")
    }
    // co64 branch: fixture 5 really carries 64-bit chunk offsets
    val (b5, _, _) = VideoFixture.makeMp4(5)
    assert(new String(b5, "ISO-8859-1").contains("co64"))
    // all-intra branch (no stss): every sample of fixture 2 is a key
    val (b2, tt2, _) = VideoFixture.makeMp4(2)
    assert(tt2.head.n_keyframes == tt2.head.n_samples)
    assert(VideoDemux.demuxTracks(
      Multimodal.MediaRecord(2L, b2, "video/mp4", 0, 0))
      .next().nKeyframes == tt2.head.n_samples)
  }

  test("degradation: corrupt payloads emit zero rows, never throw") {
    def rec(id: Long, bytes: Array[Byte]) =
      Multimodal.MediaRecord(id, bytes, "video/mp4", 0, 0)
    val (full, _, _) = VideoFixture.makeMp4(2)
    // not an mp4 / empty / null payload
    assert(VideoDemux.demuxTracks(rec(1, "not a video".getBytes)).isEmpty)
    assert(VideoDemux.demuxTracks(rec(2, Array.emptyByteArray)).isEmpty)
    assert(VideoDemux.demuxTracks(rec(3, null)).isEmpty)
    // truncated: moov (trailing) lost
    val cut = java.util.Arrays.copyOf(full, (full.length * 0.6).toInt)
    assert(VideoDemux.demuxTracks(rec(4, cut)).isEmpty)
    assert(VideoDemux.extractSamples(rec(4, cut)).isEmpty)
    // hostile box size: a largesize near Long.MaxValue must not
    // overflow the bounds check into an accepted box
    val hostile = java.util.Arrays.copyOf(full, full.length)
    // first top-level box is ftyp at 0: set size32=1 and no room for
    // largesize semantics -> the 16-byte header reads garbage as size
    hostile(0) = 0; hostile(1) = 0; hostile(2) = 0; hostile(3) = 1
    assert(VideoDemux.demuxTracks(rec(5, hostile)).isEmpty)
  }

  test("stco past EOF: metadata parses, sample extraction degrades") {
    val (rows, tracks, samples) = VideoFixture.all()
    val r23 = rows.find(_.id == 23L).get
    val rec = Multimodal.MediaRecord(23L, r23.payload, "video/mp4", 0, 0)
    assert(VideoDemux.demuxTracks(rec).toSeq ==
      tracks.filter(_.id == 23L).map(t => VideoDemux.TrackInfo(t.id,
        t.track, t.handler, t.timescale, t.duration_units, t.width,
        t.height, t.n_samples, t.n_keyframes, t.sample_bytes)))
    assert(VideoDemux.extractSamples(rec).isEmpty)
    assert(samples.forall(_.id != 23L), "no sample truth for id 23")
    // the other corrupt ids have neither track nor sample truth
    Seq(20L, 21L, 22L).foreach { id =>
      assert(tracks.forall(_.id != id) && samples.forall(_.id != id))
      val r = rows.find(_.id == id).get
      assert(VideoDemux.demuxTracks(Multimodal.MediaRecord(id, r.payload,
        r.media_type, 0, 0)).isEmpty)
    }
  }

  test("distributed demux agrees with the local parse") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val recs = (0 until 8).map { k =>
      val (bytes, _, _) = VideoFixture.makeMp4(k)
      Multimodal.MediaRecord(k.toLong, bytes, "video/mp4", 0, 0)
    } :+ Multimodal.MediaRecord(99L, "junk".getBytes, "x", 0, 0)
    val ds = s.createDataset(recs).repartition(3)
    val gotTracks = VideoDemux.demuxAll(ds).collect().sortBy(t => (t.id, t.track))
    val wantTracks = recs.flatMap(VideoDemux.demuxTracks)
      .sortBy(t => (t.id, t.track))
    assert(gotTracks.toSeq == wantTracks)
    val gotSamples = VideoDemux.extractAllSamples(ds).collect()
      .sortBy(t => (t.id, t.track, t.sample))
    val wantSamples = recs.flatMap(VideoDemux.extractSamples(_))
      .sortBy(t => (t.id, t.track, t.sample))
    assert(gotSamples.toSeq == wantSamples)
  }
}
