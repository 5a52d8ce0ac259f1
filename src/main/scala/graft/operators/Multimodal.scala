package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Multimodal column handling: opaque `binary` payloads with typed metadata,
  * plus a decode/feature-extract stage.
  *
  * The container has no image/audio codec libraries, so `fakeDecode` below is
  * a clearly-marked deterministic STUB standing in for a real decoder; the
  * Spark-side plumbing — binary column, metadata struct, partition-iterator
  * batch shape, output schema — is real and is what matters at scale: decode
  * runs per-partition (no shuffle), and the binary column rides along
  * columnar parquet scans.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata struct to a document
    * table (stand-in for image/audio bytes arriving in a real pipeline).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("content", col("text").cast("binary"))
      .withColumn("media", struct(
        lit("text/plain").as("mime"),
        octet_length(col("content")).cast("bigint").as("n_bytes"),
        (crc32(col("content")) % 1000).cast("int").as("checksum_bucket")))

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (JPEG/PNG/WAV...) here; this deterministic fake derives `dim` floats
    * from byte content so the pipeline shape is testable end-to-end.
    */
  private[graft] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      val z = (h + d) * 0x9E3779B97F4A7C15L
      val m = (z ^ (z >>> 31)) & ((1L << 24) - 1)
      out(d) = m.toFloat / (1 << 24)
      d += 1
    }
    out
  }

  /** Feature extraction over the binary payload column: mapPartitions so a
    * real decoder could amortize per-batch model/codec setup; appends a
    * `features: array<float>` column.
    */
  def extractFeatures(df: DataFrame, payloadCol: String = "content", dim: Int = 16): DataFrame = {
    val schema = df.schema.add("features", ArrayType(FloatType, containsNull = false))
    implicit val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      // per-partition setup would init the decoder/model once here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // null payload (e.g. null source text) -> empty feature vector
        // rather than an executor-killing NPE mid-pipeline
        val feats = if (bytes == null) Seq.empty[Float] else fakeDecode(bytes, dim).toSeq
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
  }

  /** Multimodal record assembly: documents joined with their embedding
    * vectors into one struct-typed row (text + vector + metadata). The join
    * key is the shared id; at scale both sides are bucketed on it via
    * [[graft.sources.BucketedSink]] — FormatsSpec demonstrates the
    * exchange-free co-bucketed join plan.
    */
  def multimodalJoin(docs: DataFrame, embs: DataFrame): DataFrame =
    withPayload(docs)
      .join(embs, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"),
        struct(col("text"), col("embedding"), col("media")).as("record"),
        col("media.n_bytes").as("n_bytes"),
        size(col("embedding")).cast("bigint").as("dim"),
        col("label").cast("bigint").as("label"),
        col("lang"))
}
