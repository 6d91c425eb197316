package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payload + typed metadata
  * struct, with distributed decode/feature-extract/frame-sample stages.
  *
  * The Spark side — schema, partition-preserving `mapPartitions` batching,
  * deterministic output contract — is real and tested. The media kernels
  * (image decode, resampling) are STUBS: this container ships no codec
  * libraries, so `decodeStub` derives deterministic fake features from the
  * bytes. Swapping in a real decoder changes only the marked function body;
  * every surrounding stage (and its plan shape) stays as-is.
  */
object Multimodal {

  /** Blob row: payload + self-describing metadata (the pattern for image/
    * audio/video columns at rest: bytes in parquet, typed meta alongside). */
  final case class BlobRow(id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  final case class BlobFeatures(
      id: Long,
      n_bytes: Long,
      mean_byte: Double,
      head_hex: String,
      frames_sampled: Int)

  /** Wrap a text corpus as a blob table (test stand-in for a binary media
    * column; payload = UTF-8 bytes). */
  def toBlobTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))

  /** ======= STUB KERNEL =======
    * Stands in for an image/audio decode. Deterministic over the payload
    * bytes so tests are stable. A real implementation would decode here and
    * emit real features; signature and batching stay identical. */
  private def decodeStub(payload: Array[Byte]): (Double, String) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    val head = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
    (mean, head)
  }

  /** Evenly frame-sample `n` byte offsets from a payload — the shape of
    * video frame sampling (offsets chosen once, decode per offset). */
  def sampleOffsets(len: Int, n: Int): Seq[Int] =
    if (len <= 0 || n <= 0) Seq.empty
    else (0 until n).map(i => ((i.toLong * len) / n).toInt).distinct

  /** Distributed feature extraction: one pass per partition, no shuffle; the
    * decode kernel runs executor-side on the raw bytes. */
  def extractFeatures(blobs: DataFrame, framesPerBlob: Int = 4): Dataset[BlobFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id"), col("payload"), col("n_bytes")).as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        it.map { case (id, payload, nBytes) =>
          val (mean, head) = decodeStub(payload)
          val frames = sampleOffsets(payload.length, framesPerBlob).size
          BlobFeatures(id, nBytes, mean, head, frames)
        }
      }
  }

  /** End-to-end demo pipeline over the documents table. */
  def featureTable(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(toBlobTable(docs, "doc_id", "text")).toDF()
}
