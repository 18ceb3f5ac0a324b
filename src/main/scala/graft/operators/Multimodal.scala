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
  * Images/audio are opaque `binary` columns with typed metadata; the decode /
  * feature-extract step runs as a partition-local batch transform
  * (`mapPartitions` over a typed Dataset — the Scala analog of `mapInPandas`:
  * one iterator per partition, batch-shaped, no driver-side gather).
  *
  * The payloads are REAL format bytes (valid 24-bit BMP and PCM16 WAV files,
  * [[MediaCodec]]) synthesized deterministically from the documents table —
  * this container ships no external media fixtures — and the decode is a
  * REAL parse: magic sniff, header decode at the format's specified offsets,
  * payload scan for the feature. Production swaps [[MediaCodec]]'s two
  * formats for JPEG/FLAC codecs; every Spark-side piece (schema, binary
  * columns, partition transform, feature aggregation) stays as-is.
  */
object Multimodal {

  /** Deterministic media corpus over the documents table: even doc_ids
    * become grayscale BMP images whose pixels are the document's bytes;
    * odd doc_ids become PCM16 WAV clips whose samples are derived from the
    * text. Dims/lengths vary per document (pruned metadata would too). */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = {
          val b = if (text == null) Array.emptyByteArray
            else text.getBytes("UTF-8")
          if (b.isEmpty) Array[Byte](0) else b
        }
        if (id % 2 == 0) {
          val w = 64 + (id % 64).toInt
          val h = 64 + ((id / 2) % 64).toInt
          val img = MediaCodec.encodeBmp(w, h, (x, y) =>
            java.lang.Byte.toUnsignedInt(bytes((x + y * w) % bytes.length)))
          MediaAsset(id, "image/bmp", img)
        } else {
          val n = 2048 + (id % 2048).toInt
          val samples = Array.tabulate[Short](n)(i =>
            ((java.lang.Byte.toUnsignedInt(bytes(i % bytes.length)) - 128) * 256)
              .toShort)
          MediaAsset(id, "audio/wav", MediaCodec.encodeWav(samples, 16000, 1))
        }
      })
  }

  /** Partition-local decode + feature extraction (mapInPandas analog): one
    * real [[MediaCodec.decode]] per asset, batch-iterated per partition. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (w, h, c, mean) = MediaCodec.decode(a.payload)
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

  /** DuckDB oracle derived from FIRST PRINCIPLES: the synthesized dims/
    * lengths are pure functions of doc_id ([[assets]]), so the expected
    * widths, heights, and exact FILE SIZES (BMP row padding, WAV header)
    * follow from the format geometry alone. The Spark side must reproduce
    * them by actually encoding real bytes and parsing them back — any
    * codec bug (wrong header field, padding, sample count) hash-mismatches
    * here. Integer sums stay exact in both engines; averages divide exact
    * sums, so doubles agree bit-for-bit. */
  val multimodalFeaturesSql: String =
    """WITH geo AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END
      |      AS media_type,
      |    CASE WHEN doc_id % 2 = 0 THEN 64 + doc_id % 64
      |         ELSE 2048 + doc_id % 2048 END AS width,
      |    CASE WHEN doc_id % 2 = 0 THEN 64 + (doc_id // 2) % 64
      |         ELSE 1 END AS height,
      |    CASE WHEN doc_id % 2 = 0
      |         THEN 54 + (((64 + doc_id % 64) * 3 + 3) // 4 * 4)
      |              * (64 + (doc_id // 2) % 64)
      |         ELSE 44 + (2048 + doc_id % 2048) * 2 END AS n_bytes
      |  FROM documents)
      |SELECT media_type, COUNT(*) AS n_assets,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width,
      |  CAST(SUM(height) AS DOUBLE) / COUNT(*) AS avg_height
      |FROM geo GROUP BY media_type ORDER BY media_type""".stripMargin
}
