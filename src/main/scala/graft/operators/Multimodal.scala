package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: media (image/audio/video) carried as opaque
  * `BinaryType` payload columns with typed metadata, decoded/featurized by a
  * per-partition batch pass.
  *
  * The Spark-side plumbing is the real design for a 100 TB media corpus:
  *   - payloads stay `binary` end-to-end (no base64, no stringification);
  *   - decode runs in `mapPartitions` so a real decoder would amortize
  *     model/codec init once per partition and process rows as a stream —
  *     the Scala twin of a Python `mapInPandas` batch UDF;
  *   - feature rows are a flat case-class schema so downstream is ordinary
  *     columnar Spark;
  *   - partition sizing: payload rows are fat, so callers should lower
  *     `spark.sql.files.maxPartitionBytes` / repartition before decode to
  *     keep a partition's payload total inside executor memory.
  *
  * Two decoders:
  *   - [[decodePpm]] — a REAL container parse: binary PPM (P6), the
  *     classic whitespace-delimited `P6 <w> <h> <maxval>` header with
  *     `#` comments, then a w·h·3 RGB raster. Header fields and exact
  *     per-channel pixel sums come from actually walking the bytes, so
  *     any well-formed P6 file decodes (malformed input throws with a
  *     position). This is the image-decode stage of the pipeline made
  *     concrete; a JPEG/PNG codec would slot into the same shape.
  *   - [[decodeStub]] — deterministic byte-math pseudo-features for
  *     payloads with NO container structure (mirrored exactly by its
  *     oracle); kept as the codec-free featurizer baseline.
  */
object Multimodal {

  /** Input: media row with opaque payload. */
  final case class MediaIn(doc_id: Long, source: String, payload: Array[Byte])

  /** Output: per-media extracted features. */
  final case class MediaFeat(doc_id: Long, source: String, n_bytes: Long,
                             width: Long, height: Long, sum_bytes: Long)

  /** STUB decode: pseudo-features from the payload bytes —
    * n_bytes = payload length, sum_bytes = Σ unsigned byte values,
    * width = 64 + n_bytes mod 577, height = 64 + sum_bytes mod 479.
    * A real decoder (??? in production terms) would parse the container
    * format here instead.
    */
  def decodeStub(m: MediaIn): MediaFeat = {
    var sum = 0L
    var i = 0
    while (i < m.payload.length) { sum += m.payload(i) & 0xff; i += 1 }
    MediaFeat(m.doc_id, m.source, m.payload.length,
      64 + m.payload.length % 577, 64 + sum % 479, sum)
  }

  /** Batch feature extraction: one decoder pass per partition. */
  def extractFeatures(media: Dataset[MediaIn]): Dataset[MediaFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real decoders init codecs/models HERE, once per partition
      rows.map(decodeStub)
    }
  }

  /** documents → media frame: payload = UTF-8 bytes of `text` (stand-in for
    * real image/audio bytes; the pipeline is payload-agnostic).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaIn] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaIn]
  }

  // ---- real container decode: binary PPM (P6) -----------------------------

  /** Decoded image: header fields + exact per-channel pixel sums. */
  final case class ImageFeat(doc_id: Long, width: Long, height: Long,
                             maxval: Long, sum_r: Long, sum_g: Long,
                             sum_b: Long)

  /** Serialize a P6 PPM: standard header (with a comment line, so the
    * decoder's comment handling is exercised on every file) + RGB raster.
    * Pixel bytes are the deterministic pattern `(seed + i) mod 251`
    * (i = raster byte index) — gives the oracle a closed generative form
    * to recompute the channel sums from, independent of the parser.
    */
  def encodePpm(seed: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# graft synthetic image\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val raster = new Array[Byte](w * h * 3)
    var i = 0
    while (i < raster.length) {
      raster(i) = (((seed + i) % 251).toInt & 0xff).toByte
      i += 1
    }
    header ++ raster
  }

  /** Parse a binary PPM payload: whitespace-delimited header tokens with
    * `#`-to-end-of-line comments (the netpbm grammar), a single whitespace
    * byte after maxval, then the w·h·3 raster. Returns header fields and
    * per-channel unsigned byte sums; throws IllegalArgumentException with
    * a byte position on malformed input.
    */
  def decodePpm(docId: Long, payload: Array[Byte]): ImageFeat =
    parsePpm(docId, payload, 0)._1

  /** Parse one P6 image starting at `start`; returns the features and the
    * byte offset just past its raster (so concatenated-image streams —
    * the raw "video" container — decode by chaining calls).
    */
  def parsePpm(docId: Long, payload: Array[Byte],
               start: Int): (ImageFeat, Int) = {
    var pos = start
    def fail(msg: String) =
      throw new IllegalArgumentException(s"PPM byte $pos: $msg")
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < payload.length) {
        val c = payload(pos).toChar
        if (c == '#') { while (pos < payload.length && payload(pos) != '\n'.toByte) pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else done = true
      }
    }
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < payload.length && !payload(pos).toChar.isWhitespace &&
        payload(pos).toChar != '#') pos += 1
      if (pos == start) fail("expected header token")
      new String(payload, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    if (token() != "P6") fail("not a binary PPM (magic != P6)")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    pos += 1 // exactly ONE whitespace byte separates maxval from the raster
    val n = w * h * 3
    if (payload.length - pos < n) fail(s"truncated raster: need $n bytes")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = pos
    val end = pos + n
    while (i < end) {
      sr += payload(i) & 0xff
      sg += payload(i + 1) & 0xff
      sb += payload(i + 2) & 0xff
      i += 3
    }
    (ImageFeat(docId, w.toLong, h.toLong, maxval.toLong, sr, sg, sb), end)
  }

  /** Batch image decode: one parser pass per partition over (id, payload)
    * rows — the same distribution shape as [[extractFeatures]].
    */
  def decodeImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { case (id, payload) => decodePpm(id, payload) })
  }

  // ---- raw video: concatenated P6 frames ----------------------------------

  /** One decoded video frame (same stats as [[ImageFeat]] + frame index). */
  final case class FrameFeat(doc_id: Long, frame_idx: Long, width: Long,
                             height: Long, sum_r: Long, sum_g: Long,
                             sum_b: Long)

  /** Serialize a raw "video": `frames` P6 images back to back, frame f
    * seeded `seed + f` so every frame's pixels have the closed generative
    * form. Real multi-frame containers (y4m, AVI) are this plus per-frame
    * framing metadata; the parser side is identical chained image parses.
    */
  def encodeVideo(seed: Long, frames: Int, w: Int, h: Int): Array[Byte] =
    (0 until frames).toArray.flatMap(f => encodePpm(seed + f, w, h))

  /** Decode every frame of a concatenated-P6 payload: chained
    * [[parsePpm]] calls until the buffer is exhausted. Trailing garbage
    * (a partial frame) throws — a media pipeline wants truncated files
    * surfaced, not silently shortened.
    */
  def decodeVideo(docId: Long, payload: Array[Byte]): Seq[FrameFeat] = {
    val out = Seq.newBuilder[FrameFeat]
    var pos = 0
    var f = 0L
    while (pos < payload.length) {
      val (feat, next) = parsePpm(docId, payload, pos)
      out += FrameFeat(docId, f, feat.width, feat.height,
        feat.sum_r, feat.sum_g, feat.sum_b)
      pos = next
      f += 1
    }
    out.result()
  }

  /** Batch video decode: each payload row fans out to its frame rows inside
    * one mapPartitions pass — the distributed frame-extraction shape (no
    * driver involvement, output is ordinary flat columns).
    */
  def decodeVideos(media: Dataset[(Long, Array[Byte])]): Dataset[FrameFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { case (id, p) => decodeVideo(id, p) })
  }

  // ---- audio: RIFF/WAVE (PCM16) -------------------------------------------

  /** Decoded audio: fmt-chunk fields + exact integer sample stats. */
  final case class AudioFeat(doc_id: Long, channels: Long, sample_rate: Long,
                             bits: Long, n_samples: Long, sum_samples: Long,
                             max_abs: Long)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Serialize a canonical RIFF/WAVE file: `RIFF` size `WAVE`, a PCM
    * `fmt ` chunk, a junk `LIST` chunk (so decoders must really iterate
    * chunks, not assume fixed offsets), then the `data` chunk.
    * Samples are PCM16LE, interleaved when stereo, with the closed form
    * sample(i) = ((seed + 7·i) mod 65536) − 32768 over the flat
    * (interleaved) index i.
    */
  def encodeWav(seed: Long, nSamples: Int, sampleRate: Int,
                channels: Int): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val dataLen = nSamples * channels * 2
    val data = new Array[Byte](dataLen)
    var i = 0
    while (i < nSamples * channels) {
      val s = (((seed + 7L * i) % 65536L) - 32768L).toInt
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = "fmt ".getBytes(ascii) ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16)
    val junk = "LIST".getBytes(ascii) ++ le32(4) ++ "INFO".getBytes(ascii)
    val dataChunk = "data".getBytes(ascii) ++ le32(dataLen) ++ data
    val body = "WAVE".getBytes(ascii) ++ fmt ++ junk ++ dataChunk
    "RIFF".getBytes(ascii) ++ le32(body.length) ++ body
  }

  /** Parse a RIFF/WAVE payload: verify the RIFF/WAVE magic, iterate chunks
    * (word-aligned, unknown chunks skipped) to find `fmt ` and `data`,
    * require PCM 16-bit, then walk the samples for exact integer stats.
    * Throws IllegalArgumentException with a byte position on malformed
    * input.
    */
  def decodeWav(docId: Long, p: Array[Byte]): AudioFeat = {
    def fail(pos: Int, msg: String) =
      throw new IllegalArgumentException(s"WAV byte $pos: $msg")
    def u16(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    def tag(off: Int): String =
      new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (p.length < 12 || tag(0) != "RIFF") fail(0, "not a RIFF file")
    if (tag(8) != "WAVE") fail(8, "RIFF form is not WAVE")
    val riffEnd = math.min(p.length.toLong, 8L + u32(4))
    var pos = 12
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0L
    while (pos + 8 <= riffEnd && (fmtOff < 0 || dataOff < 0)) {
      val id = tag(pos)
      val len = u32(pos + 4)
      if (pos + 8 + len > riffEnd) fail(pos, s"chunk '$id' overruns file")
      if (id == "fmt ") fmtOff = pos + 8
      else if (id == "data") { dataOff = pos + 8; dataLen = len }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (fmtOff < 0) fail(p.length, "missing fmt chunk")
    if (dataOff < 0) fail(p.length, "missing data chunk")
    val audioFormat = u16(fmtOff)
    val channels = u16(fmtOff + 2)
    val sampleRate = u32(fmtOff + 4)
    val bits = u16(fmtOff + 14)
    if (audioFormat != 1) fail(fmtOff, s"not PCM (format $audioFormat)")
    if (bits != 16) fail(fmtOff + 14, s"unsupported bit depth $bits")
    if (channels <= 0) fail(fmtOff + 2, "zero channels")
    val total = (dataLen / 2L).toInt // interleaved 16-bit samples
    var (sum, maxAbs) = (0L, 0L)
    var i = 0
    while (i < total) {
      val v = (u16(dataOff + 2 * i) << 16) >> 16 // sign-extend
      sum += v
      val a = math.abs(v.toLong)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    AudioFeat(docId, channels.toLong, sampleRate, bits.toLong,
      total / channels, sum, maxAbs)
  }

  /** Batch audio decode (mapPartitions, same shape as [[decodeImages]]). */
  def decodeAudio(media: Dataset[(Long, Array[Byte])]): Dataset[AudioFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { case (id, p) => decodeWav(id, p) })
  }
}
