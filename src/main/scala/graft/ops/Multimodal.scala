package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, batch "decode" via mapPartitions.
  *
  * The container has no image/audio libraries, so the decode step is a
  * clearly-marked deterministic STUB ([[StubDecoder]]); everything
  * Spark-side — schema, binary payloads, partition-batched decode,
  * typed output — is real. Swapping in a real decoder is a one-line
  * change of the `MediaDecoder` instance used by [[decodeMeta]].
  */
object Multimodal {

  /** Typed metadata produced by decoding one media payload. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, sha256: String,
                             width: Int, height: Int, n_frames: Int)

  /** Decoder boundary: payload bytes -> decoded metadata fields. */
  trait MediaDecoder extends Serializable {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta
  }

  /** STUB: no media libs in this environment. Deterministic fake decode
    * deriving "dimensions" from payload bytes; a real implementation
    * would hand `payload` to an image/audio codec here. */
  object StubDecoder extends MediaDecoder {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val sha = md.digest(payload).map("%02x".format(_)).mkString
      val n = payload.length.toLong
      MediaMeta(docId, n, sha,
        width = (n % 640).toInt + 1,
        height = (n % 480).toInt + 1,
        n_frames = (n % 30).toInt + 1)
    }
  }

  /** Attach the opaque binary payload column (here: utf-8 of `text`,
    * standing in for real image/audio bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Batch decode via mapPartitions: one decoder instance per partition
    * (real codecs are expensive to construct), rows streamed through.
    * This is the Scala analogue of a pandas `mapInPandas` batch UDF. */
  def decodeMeta(spark: SparkSession, payloads: DataFrame,
                 decoder: MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // one instance per partition
        it.map { case (id, bytes) => d.decode(id, bytes) }
      }
  }
}
