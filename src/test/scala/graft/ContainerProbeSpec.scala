package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{ContainerProbe, ImageHeaderDecoder, MediaRow, StubDecoder}
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ContainerProbe]]'s byte parsers on hand-built minimal
  * containers with known metadata — the video/audio twin of r3's image
  * header specs. Fixtures are authored box-by-box/element-by-element in
  * the test so every offset in the parser is exercised deliberately.
  */
class ContainerProbeSpec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  // ---- MP4: ftyp + moov(mvhd v0, trak(tkhd v0)) ----------------------
  // mvhd: timescale 600, duration 1200 ticks -> 2000 ms
  // tkhd: width 640, height 360 (16.16 fixed point)
  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body

  private val mp4Bytes: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0) ++ "isom".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++            // version 0 + flags
        be32(0) ++ be32(0) ++               // creation, modification
        be32(600) ++ be32(1200) ++          // timescale, duration
        Array.fill[Byte](100 - 20)(0))      // rate..next_track_id
    val tkhd = box("tkhd",
      Array[Byte](0, 0, 0, 0) ++            // version 0 + flags
        be32(0) ++ be32(0) ++ be32(1) ++    // creation, modification, track id
        be32(0) ++ be32(1200) ++            // reserved, duration
        Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++ // reserved..matrix
        be32(640L << 16) ++ be32(360L << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  test("MP4: mvhd timescale/duration and tkhd fixed-point dimensions") {
    val p = ContainerProbe.probe(mp4Bytes)
    assert(p.contains(ContainerProbe.Probe("mp4", Some(640), Some(360), Some(2000L))))
  }

  test("MP4: 64-bit largesize boxes and version-1 mvhd parse identically") {
    // moov as a size==1 largesize box; mvhd v1 with 64-bit duration
    def largebox(typ: String, body: Array[Byte]): Array[Byte] =
      be32(1) ++ typ.getBytes("ISO-8859-1") ++
        be32(0) ++ be32(body.length + 16L) ++ body
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++
        Array.fill[Byte](16)(0) ++          // creation, modification (8+8)
        be32(90000) ++                      // timescale
        be32(0) ++ be32(270000) ++          // duration (64-bit) -> 3000 ms
        Array.fill[Byte](80)(0))
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0))
    val p = ContainerProbe.probe(ftyp ++ largebox("moov", mvhd1))
    assert(p.flatMap(_.durationMs).contains(3000L))
  }

  // ---- EBML/WebM: Segment(Info(scale, duration), Tracks(.. Video)) ---
  private val webmBytes: Array[Byte] = {
    def el(id: Array[Byte], body: Array[Byte]): Array[Byte] = {
      require(body.length < 127)
      id ++ Array((0x80 | body.length).toByte) ++ body
    }
    val header = el(Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte),
      el(Array(0x42, 0x86).map(_.toByte), Array[Byte](1))) // EBMLVersion=1
    val info = el(Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte),
      el(Array(0x2a, 0xd7, 0xb1).map(_.toByte),
         Array(0x0f, 0x42, 0x40).map(_.toByte)) ++        // scale = 1e6 ns
      el(Array(0x44, 0x89).map(_.toByte),
         be32(java.lang.Float.floatToIntBits(2500f))))    // duration ticks
    val video = el(Array(0xe0).map(_.toByte),
      el(Array(0xb0).map(_.toByte), Array(0x05, 0x00).map(_.toByte)) ++ // 1280
      el(Array(0xba).map(_.toByte), Array(0x02, 0xd0).map(_.toByte)))   // 720
    val tracks = el(Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte),
      el(Array(0xae).map(_.toByte), video))
    header ++ el(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte), info ++ tracks)
  }

  test("EBML/WebM: TimestampScale x Duration and Video pixel dimensions") {
    val p = ContainerProbe.probe(webmBytes)
    assert(p.contains(ContainerProbe.Probe("ebml", Some(1280), Some(720), Some(2500L))))
  }

  test("EBML: unknown-size Segment (streamed) still parses to the end") {
    // replace the Segment's 1-byte size with the all-ones "unknown" vint
    val segIdx = webmBytes.indexOfSlice(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte))
    val patched = webmBytes.clone()
    patched(segIdx + 4) = 0xff.toByte
    val p = ContainerProbe.probe(patched)
    assert(p.flatMap(_.durationMs).contains(2500L) && p.flatMap(_.width).contains(1280))
  }

  // ---- WAV -----------------------------------------------------------
  private val wavBytes: Array[Byte] = {
    val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    "RIFF".getBytes ++ le32(4 + 8 + fmt.length + 8 + 32000L) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(fmt.length.toLong) ++ fmt ++
      "data".getBytes ++ le32(32000) ++ Array.fill[Byte](64)(0) // truncated payload
  }

  test("WAV: data bytes over byte rate, trusted from a truncated prefix") {
    assert(ContainerProbe.probe(wavBytes)
      .contains(ContainerProbe.Probe("wav", None, None, Some(2000L))))
  }

  // ---- corruption / fallback behavior --------------------------------
  test("corrupt and non-container payloads return None, never throw") {
    val candidates = Seq(
      Array.empty[Byte],
      "RIFFxxxxWAVE".getBytes,                       // WAV with no chunks
      mp4Bytes.take(10), mp4Bytes.take(40),           // truncated mid-box
      webmBytes.take(7), webmBytes.take(20),          // truncated mid-element
      Array.fill[Byte](64)(0x41),                     // not a container
      { val c = mp4Bytes.clone(); c(3) = 0x7f; c })   // lying ftyp size
    for (c <- candidates) ContainerProbe.probe(c) // must not throw
    assert(ContainerProbe.probe(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("fuzz: probe never throws on random or bit-flipped payloads") {
    val rnd = new scala.util.Random(1234)
    // pure random bytes
    for (_ <- 0 until 400) {
      val b = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(b)
      ContainerProbe.probe(b)
    }
    // random bytes behind real magic prefixes — exercises every parser
    // past its sniff check with garbage bodies
    val prefixes = Seq(
      mp4Bytes.take(8), webmBytes.take(4), wavBytes.take(12))
    for (_ <- 0 until 300; p <- prefixes) {
      val body = new Array[Byte](rnd.nextInt(128))
      rnd.nextBytes(body)
      ContainerProbe.probe((p ++ body).toArray)
    }
    // single-bit corruption of valid containers
    for (fixture <- Seq(mp4Bytes, webmBytes, wavBytes); _ <- 0 until 200) {
      val c = fixture.clone()
      val i = rnd.nextInt(c.length)
      c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
      ContainerProbe.probe(c)
    }
  }

  test("decode contract: container metadata overrides stub for video/audio") {
    val video = MediaRow(1L, "video", mp4Bytes, "t")
    val audio = MediaRow(2L, "audio", wavBytes, "t")
    val opaque = MediaRow(3L, "video", Array.fill[Byte](32)(0x13), "t")
    val dv = ImageHeaderDecoder.decode(video)
    assert((dv.width, dv.height, dv.duration_ms) == (640, 360, 2000L))
    assert(ImageHeaderDecoder.decode(audio).duration_ms == 2000L)
    // no parseable container -> byte-identical to the stub (feature is
    // an Array, so compare it as a Seq — case-class == is reference-eq
    // on array fields)
    val d = ImageHeaderDecoder.decode(opaque)
    val s = StubDecoder.decode(opaque)
    assert(d.productIterator.toSeq.dropRight(1) == s.productIterator.toSeq.dropRight(1))
    assert(d.feature.toSeq == s.feature.toSeq)
  }

  test("sampleFrames cardinality is bounded by the REAL mp4 duration") {
    val spark = SparkSpec.session
    import spark.implicits._
    val ds = spark.createDataset(Seq(MediaRow(1L, "video", mp4Bytes, "t")))
    val frames = Multimodal.sampleFrames(ds, everyMs = 500L).collect()
    // 2000 ms at 500 ms stride -> ts 0,500,1000,1500,2000
    assert(frames.map(_.ts_ms).sorted.toSeq == Seq(0L, 500L, 1000L, 1500L, 2000L))
  }

  // ---- hostile declared durations must not explode row counts --------

  // ~60-byte WAV declaring byteRate=1 and data size 0xFFFFFFFF:
  // probed duration ~4.29e12 ms. Without the sanity ceiling one such
  // row yields billions of stride rows, each SHA-256-hashing the payload.
  private val hostileWav: Array[Byte] = {
    val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(1) ++ le16(2) ++ le16(16)
    "RIFF".getBytes ++ le32(0xffffffffL) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(fmt.length.toLong) ++ fmt ++
      "data".getBytes ++ le32(0xffffffffL)
  }

  // mvhd declaring timescale=1, duration=0xFFFFFFFF ticks -> ~4.29e12 ms
  private val hostileMp4: Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0))
    val mvhd = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1) ++ be32(0xffffffffL) ++ Array.fill[Byte](80)(0))
    ftyp ++ box("moov", mvhd)
  }

  test("implausible declared durations fall back to the stub before stride loops") {
    val spark = SparkSpec.session
    import spark.implicits._
    assert(ContainerProbe.probe(hostileWav).flatMap(_.durationMs)
      .exists(_ > Multimodal.DefaultMaxDurationMs)) // the probe DOES see the huge claim
    assert(ContainerProbe.probe(hostileMp4).flatMap(_.durationMs)
      .exists(_ > Multimodal.DefaultMaxDurationMs))

    val audioRow = MediaRow(1L, "audio", hostileWav, "t")
    val stubAudioDur = StubDecoder.decode(audioRow).duration_ms
    val segs = Multimodal.segmentAudio(
      spark.createDataset(Seq(audioRow)), windowMs = 700L).collect()
    assert(segs.nonEmpty && segs.length == ((stubAudioDur + 699) / 700).toInt)
    assert(segs.map(_.end_ms).max == stubAudioDur)

    val videoRow = MediaRow(2L, "video", hostileMp4, "t")
    val stubVideoDur = StubDecoder.decode(videoRow).duration_ms
    val frames = Multimodal.sampleFrames(
      spark.createDataset(Seq(videoRow)), everyMs = 500L).collect()
    assert(frames.nonEmpty && frames.length == (stubVideoDur / 500 + 1).toInt)

    // a PLAUSIBLE real duration is still honored (no over-clamping)
    val ok = Multimodal.sampleFrames(
      spark.createDataset(Seq(MediaRow(3L, "video", mp4Bytes, "t"))), everyMs = 500L).collect()
    assert(ok.map(_.ts_ms).max == 2000L)
  }

  test("truncated mvhd/tkhd yield None instead of sibling-box bytes") {
    // moov( mvhd[declared body = 4 bytes] , free[garbage] ): the walker
    // must bound field reads by the mvhd box's OWN end — previously the
    // free box's bytes were readable as timescale/duration
    val shortMvhd = box("mvhd", Array[Byte](0, 0, 0, 0)) // v0, body ends after flags
    val garbage = box("free", Array.fill[Byte](40)(0x5a))
    val truncated = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0)) ++
      box("moov", shortMvhd ++ garbage)
    assert(ContainerProbe.probe(truncated).flatMap(_.durationMs).isEmpty)

    val shortTkhd = box("tkhd", Array[Byte](0, 0, 0, 0))
    val truncated2 = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0)) ++
      box("moov", box("trak", shortTkhd ++ garbage))
    assert(ContainerProbe.probe(truncated2).flatMap(_.width).isEmpty)
  }
}
