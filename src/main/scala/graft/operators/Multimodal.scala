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
  * DECODE IS A STUB: this container has no image/audio codecs, so
  * [[decodeStub]] derives deterministic pseudo-features from the raw bytes
  * (documented below, mirrored exactly by the oracle). Swapping in a real
  * decoder changes ONLY the body of `decodeStub`.
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
}
