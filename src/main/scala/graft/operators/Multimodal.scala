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
  def decodePpm(docId: Long, payload: Array[Byte]): ImageFeat = {
    var pos = 0
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
    ImageFeat(docId, w.toLong, h.toLong, maxval.toLong, sr, sg, sb)
  }

  /** Batch image decode: one parser pass per partition over (id, payload)
    * rows — the same distribution shape as [[extractFeatures]].
    */
  def decodeImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { case (id, payload) => decodePpm(id, payload) })
  }
}
