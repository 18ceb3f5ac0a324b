package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** One multimodal asset: opaque binary payload + typed metadata — the
  * column layout a 100 TB media corpus uses (binary blobs in parquet,
  * metadata columns for pruning). */
final case class MediaAsset(doc_id: Long, media_type: String,
    payload: Array[Byte])

final case class MediaFeatures(doc_id: Long, media_type: String,
    width: Int, height: Int, channels: Int, n_bytes: Long, feat_mean: Double)

/** Multimodal-column plumbing for the training-data pipeline.
  *
  * Images/audio/video are opaque `binary` columns with typed metadata; the
  * decode / feature-extract step runs as a partition-local batch transform
  * (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas`: one iterator per partition, batch-shaped, no
  * driver-side gather).
  *
  * ==== STUB BOUNDARY ====
  * This container ships no image/audio codecs, so `decodeStub` fabricates a
  * deterministic fake decode from the payload bytes. The Spark-side
  * plumbing — schema, binary column handling, partitioning, the
  * partition-iterator transform signature, and the feature schema — is real
  * and tested; swap `decodeStub` for a codec call in production.
  */
object Multimodal {

  /** Synthesize a binary media column from the documents table (payload =
    * UTF-8 bytes; stands in for image bytes read from a media store). */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"),
        concat(lit("img/"), col("source")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaAsset]
  }

  /** STUB: deterministic fake decode — derives "image" dims and a feature
    * from the payload bytes. Replace with a real codec in production. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val w = 64 + java.lang.Byte.toUnsignedInt(payload(0)) % 192
    val h = 64 + java.lang.Byte.toUnsignedInt(payload(payload.length / 2)) % 192
    val c = 1 + java.lang.Byte.toUnsignedInt(payload(payload.length - 1)) % 3
    var s = 0L
    var i = 0
    while (i < payload.length) {
      s += java.lang.Byte.toUnsignedInt(payload(i)); i += 1
    }
    (w, h, c, s.toDouble / payload.length)
  }

  /** Partition-local decode + feature extraction (mapInPandas analog). */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (w, h, c, mean) = decodeStub(a.payload)
        MediaFeatures(a.doc_id, a.media_type, w, h, c,
          a.payload.length.toLong, mean)
      }
    }
  }

  /** Registered query: per-media-type feature aggregates over the decoded
    * corpus (drives the full binary→decode→feature→agg pipeline). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(spark, dir))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("width")).as("avg_width"),
        avg(col("height")).as("avg_height"))
      .orderBy(col("media_type"))
}
