package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.Tables.t

/** Sharded-JSONL export/import for the documents table — the interchange
  * format LLM training pipelines actually consume (one JSON object per
  * line, N shard files). The reference engine has no export surface at all
  * (its only "sink" is the binary KV snapshot); this is pipeline-native
  * breadth alongside the parquet snapshots and the WAL DSv2 source.
  *
  * Scale shape: the export is `repartition(shards).write.json` — one
  * shuffle to the target shard count, then embarrassingly parallel line
  * writes; the read-back supplies an explicit schema so no inference scan
  * runs. Shard count at 100 TB follows file-size targets (~256 MB–1 GB
  * per shard), not a constant.
  */
object JsonlExport {

  val Shards = 8

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  /** Write documents as sharded JSONL under a session-scoped scratch path
    * ([[graft.SessionResources.scratchDir]] — SHA-256 of the source path +
    * applicationId, GC'd at engine shutdown or context stop), read them
    * back, and emit a per-document digest of the ROUND-TRIPPED content.
    * The DuckDB oracle computes the same digests from the parquet source
    * directly, so a green row proves the export/import cycle is lossless
    * byte-for-byte on every document (JSON string escaping, unicode, shard
    * scatter and all). */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.SessionResources.scratchDir(spark, "jsonl", dir)
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(Shards)
      .write.mode("overwrite").json(out)
    spark.read.schema(docSchema).json(out)
      .select(col("doc_id"), col("lang"),
        md5(col("text").cast("binary")).as("fp"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val jsonlRoundtripSql: String =
    """SELECT doc_id, lang, md5(text) AS fp,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** ORC round-trip — the second columnar format (Spark ships the ORC
    * reader/writer natively): documents are written as ORC PARTITIONED BY
    * LANGUAGE (`lang=xx/` directories — the partition column leaves the
    * file payload and comes back from directory names), read back, and
    * digested per document. A green oracle row proves the whole cycle —
    * columnar encode/decode, partition scatter, partition-column
    * reconstruction — is byte-lossless. The partitioned layout is the
    * point at 100 TB: a per-language read prunes to one directory
    * (JsonlExportSpec asserts the pruned scan), and language is the
    * natural partition key for corpus exports consumed by per-language
    * pipelines. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.SessionResources.scratchDir(spark, "orc", dir)
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").partitionBy("lang").orc(out)
    spark.read.orc(out)
      .select(col("doc_id"), col("lang").cast("string").as("lang"),
        md5(col("text").cast("binary")).as("fp"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val orcRoundtripSql: String = jsonlRoundtripSql

  /** CSV round-trip — the interchange format every external tool reads.
    * The danger CSV poses to a TEXT corpus is quoting: document text
    * freely contains commas, quotes and (in general) newlines, so the
    * export writes RFC-4180 quoted/escaped fields and the read-back runs
    * in `multiLine` mode with the same quote/escape contract. A green
    * oracle row (md5 + length per doc vs the parquet source) proves the
    * full encode→escape→parse cycle byte-lossless — the property to pin
    * BEFORE any 100 TB corpus leaves the columnar world. Shards bound
    * parallel writers exactly like the JSONL export.
    *
    * NULL vs "" is the subtle lossiness: Spark's CSV reader compares
    * every parsed string against `nullValue` AFTER unquoting, and the
    * default `nullValue` is "" — so a quoted empty field `""` silently
    * regresses to SQL NULL on read-back. Both sides therefore pin
    * `nullValue` to a NUL sentinel (U+0000, excluded from valid UTF-8
    * corpus text by contract — the same exclusion Postgres TEXT makes),
    * which lets quoted-empty survive as "" while genuine NULLs
    * round-trip through the sentinel. */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.SessionResources.scratchDir(spark, "csv", dir)
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .repartition(Shards)
      .write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .option("nullValue", "\u0000")
      // the WRITER trims field whitespace by default — a silent corpus
      // mutation; disable both sides explicitly
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
    spark.read.schema(docSchema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .option("nullValue", "\u0000")
      .csv(out)
      .select(col("doc_id"), col("lang"),
        md5(col("text").cast("binary")).as("fp"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val csvRoundtripSql: String = jsonlRoundtripSql

  /** SCHEMA EVOLUTION — the read-side contract every long-lived corpus
    * store needs: half the docs are written with the ORIGINAL schema
    * (doc_id, text), half with an EVOLVED one that added `lang`; a
    * `mergeSchema` read unifies them, old rows surfacing NULL for the
    * added column. The query proves the merge end-to-end: per-language
    * rollup where legacy rows land in the `unknown` bucket. At 100 TB
    * schema merging is a footer-only planning step (no data rewrite) —
    * which is exactly why additive evolution is the only kind a corpus
    * store should allow. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.SessionResources.scratchDir(spark, "schemaevo", dir)
    val docs = t(spark, dir, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$out/v1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/v2")
    spark.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
      .select(coalesce(col("lang"), lit("unknown")).as("lang_bucket"),
        col("text"))
      .groupBy(col("lang_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).cast("long").as("total_chars"))
      .orderBy(col("lang_bucket"))
  }

  val schemaEvolutionSql: String =
    """SELECT CASE WHEN doc_id % 2 = 1 THEN lang ELSE 'unknown' END
      |    AS lang_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars
      |FROM documents
      |GROUP BY lang_bucket ORDER BY lang_bucket""".stripMargin
}
