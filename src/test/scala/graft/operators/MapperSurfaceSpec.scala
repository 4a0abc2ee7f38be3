package graft.operators

import graft.SparkSpec

class MapperSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("SkipBad drops exactly the throwing records and counts them") {
    val acc = spark.sparkContext.longAccumulator("skipped")
    val ds = spark.createDataset(Seq("1", "2", "boom", "4", "boom"))
    val out = SkipBad.flatMapSkipBad(ds, acc)(s => Iterator.single(s.toInt))
      .collect().sorted
    assert(out.toSeq == Seq(1, 2, 4))
    assert(acc.value == 2L)
  }

  test("SkipBad keeps multi-row emissions from good records") {
    val acc = spark.sparkContext.longAccumulator("skipped")
    val ds = spark.createDataset(Seq("2", "x"))
    val out = SkipBad.flatMapSkipBad(ds, acc)(s => (1 to s.toInt).iterator)
      .collect().sorted
    assert(out.toSeq == Seq(1, 2) && acc.value == 1L)
  }

  test("Multimodal decodeStub derives features from raw bytes") {
    val payload = "abc".getBytes("UTF-8")
    val f = Multimodal.decodeStub(Multimodal.MediaIn(7L, "s", payload))
    val sum = 'a'.toInt + 'b'.toInt + 'c'.toInt
    assert(f == Multimodal.MediaFeat(7L, "s", 3L, 64 + 3 % 577, 64 + sum % 479, sum))
  }

  test("Multimodal extractFeatures runs per-partition over binary payloads") {
    val ds = Multimodal.mediaFromDocuments(
      Seq((1L, "s0", "hello"), (2L, "s1", "worlds"))
        .toDF("doc_id", "source", "text"))
    val out = Multimodal.extractFeatures(ds).collect()
    assert(out.map(f => (f.doc_id, f.n_bytes)).toSet == Set((1L, 5L), (2L, 6L)))
  }

  test("PPM decode parses a hand-written P6 file, comments and all") {
    // 2x1 image: red pixel (255,0,0), mid pixel (1,2,3); comments between
    // every header token plus tab/CR whitespace variants
    val header = "P6 # magic\n# a comment line\n 2\t# width\n1 # height\r\n255\n"
    val raster = Array(255, 0, 0, 1, 2, 3).map(_.toByte)
    val f = Multimodal.decodePpm(9L,
      header.getBytes("US-ASCII") ++ raster)
    assert(f == Multimodal.ImageFeat(9L, 2L, 1L, 255L, 256L, 2L, 3L))
  }

  test("PPM decode round-trips the synthetic encoder") {
    val f = Multimodal.decodePpm(5L, Multimodal.encodePpm(5L, w = 4, h = 3))
    val idx = 0 until (4 * 3 * 3)
    def ch(c: Int) = idx.filter(_ % 3 == c).map(i => (5L + i) % 251).sum
    assert(f == Multimodal.ImageFeat(5L, 4L, 3L, 255L, ch(0), ch(1), ch(2)))
  }

  test("WAV decode round-trips the encoder, chunk walk and sign-extension") {
    // stereo: 3 frames × 2 channels = 6 interleaved samples
    val f = Multimodal.decodeWav(3L,
      Multimodal.encodeWav(3L, nSamples = 3, sampleRate = 16000, channels = 2))
    val smp = (0 until 6).map(i => ((3L + 7 * i) % 65536) - 32768)
    assert(f == Multimodal.AudioFeat(3L, 2L, 16000L, 16L, 3L,
      smp.sum, smp.map(math.abs).max))
  }

  test("WAV decode handles negative samples and rejects malformed input") {
    // seed near 65536 puts early samples at the negative extreme
    val f = Multimodal.decodeWav(1L,
      Multimodal.encodeWav(65530L, nSamples = 4, sampleRate = 8000, channels = 1))
    val smp = (0 until 4).map(i => ((65530L + 7 * i) % 65536) - 32768)
    assert(f.sum_samples == smp.sum && f.max_abs == smp.map(math.abs).max)
    val good = Multimodal.encodeWav(1L, 4, 8000, 1)
    intercept[IllegalArgumentException] { // not RIFF
      Multimodal.decodeWav(1L, "JUNK".getBytes("US-ASCII") ++ good.drop(4))
    }
    intercept[IllegalArgumentException] { // data chunk overruns
      Multimodal.decodeWav(1L, good.dropRight(3))
    }
  }

  test("video decode yields one row per concatenated frame") {
    val frames = Multimodal.decodeVideo(2L, Multimodal.encodeVideo(14L, 3, 3, 2))
    assert(frames.map(_.frame_idx) == Seq(0L, 1L, 2L))
    assert(frames.forall(f => f.width == 3 && f.height == 2))
    // frame f pixels: (14 + f + i) % 251 over raster index i
    val want = (0 until 3).map { fr =>
      (0 until 18).filter(_ % 3 == 0).map(i => (14L + fr + i) % 251).sum
    }
    assert(frames.map(_.sum_r) == want)
    intercept[IllegalArgumentException] { // trailing partial frame
      Multimodal.decodeVideo(2L, Multimodal.encodeVideo(14L, 2, 3, 2).dropRight(1))
    }
  }

  test("PPM decode rejects malformed input with a position") {
    val good = Multimodal.encodePpm(1L, 3, 3)
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.decodePpm(1L, "P5\n3 3\n255\n".getBytes("US-ASCII") ++ good.drop(good.length - 27))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodePpm(1L, good.dropRight(1))
    }
    intercept[IllegalArgumentException] { // 16-bit maxval unsupported
      Multimodal.decodePpm(1L, "P6\n1 1\n65535\n".getBytes("US-ASCII") ++ Array.fill(6)(0.toByte))
    }
  }
}
