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

  /** Resize target — fixed 8×8 thumbnails (the embedding-input shape). A
    * production pipeline parameterizes this; the oracle inlines it. */
  final val ResizeW = 8
  final val ResizeH = 8

  /** Image RESIZE over the binary corpus: decode each BMP's real pixel
    * array, nearest-neighbor it to [[ResizeW]]×[[ResizeH]], RE-ENCODE the
    * thumbnail as a real BMP, then decode that product again for the
    * checksum — so the registered row proves the full decode→transform→
    * encode→decode round trip, not just the arithmetic. Partition-local
    * batch transform like [[extractFeatures]] (mapInPandas analog); at
    * 100 TB the payload column never leaves the executor.
    *
    * Output per image: source dims, thumbnail file size, and the exact
    * integer gray sum of the re-decoded thumbnail — which the DuckDB
    * oracle reproduces from first principles (the synthesized pixel at
    * (x,y) is text byte ((x + y·w) mod len), so the resized sum is pure
    * integer math over the text column — [[resizeImagesSql]]). */
  def resizeImages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .filter(_.media_type == "image/bmp")
      .mapPartitions(_.map { a =>
        val (w, h, px) = MediaCodec.decodeBmpPixels(a.payload)
        val small = MediaCodec.resizeNearest(w, h, px, ResizeW, ResizeH)
        val thumb = MediaCodec.encodeBmp(ResizeW, ResizeH,
          (x, y) => small(y * ResizeW + x))
        val (tw, th, back) = MediaCodec.decodeBmpPixels(thumb)
        require(tw == ResizeW && th == ResizeH)
        (a.doc_id, w.toLong, h.toLong, thumb.length.toLong,
          back.foldLeft(0L)(_ + _))
      })
      .toDF("doc_id", "src_width", "src_height", "out_bytes", "gray_sum")
      .orderBy(col("doc_id"))
  }

  /** Perceptual-hash bands (16 bits each over the 64-bit aHash) and the
    * near-dup hamming threshold. Pigeonhole: hamming ≤ 3 over 4 bands
    * guarantees at least one IDENTICAL band, so the banded equi-join's
    * recall at the threshold is 100% — the MinHash-LSH banding argument
    * applied to image hashes. At larger corpora the band width scales
    * with the corpus (wider hash, wider bands) exactly like LSH band
    * tuning, so random 16-bit collisions never dominate the join. */
  final val PhashBands = 4
  final val PhashHamming = 3

  /** The 64-bit average hash of one BMP payload, as [[PhashBands]]
    * 16-bit band integers: decode, nearest-neighbor to
    * [[ResizeW]]×[[ResizeH]], bit i = thumbnail pixel i above the
    * integer mean (aHash, the classic pHash-family baseline). Shared by
    * the registered hash query and the spec's ground-truth pairing. */
  private[operators] def phashBands(payload: Array[Byte]): Array[Int] = {
    val (w, h, px) = MediaCodec.decodeBmpPixels(payload)
    val small = MediaCodec.resizeNearest(w, h, px, ResizeW, ResizeH)
    val mean = small.map(_.toLong).sum / (ResizeW * ResizeH)
    val bands = Array.fill(PhashBands)(0)
    var i = 0
    while (i < ResizeW * ResizeH) {
      if (small(i) > mean) bands(i / 16) |= (1 << (i % 16))
      i += 1
    }
    bands
  }

  /** IMAGE PERCEPTUAL HASHING — the image-modality face of the dedup
    * family: the per-image 64-bit average hash as [[PhashBands]] band
    * integers plus the set-bit count, the stored artifact an image-dedup
    * pipeline banding-joins against.
    *
    * Scale shape: partition-local decode work — payloads never leave the
    * executor; only four 16-bit ints + a count per image shuffle (to the
    * presentation sort). The PAIRING operator over this table is
    * [[imagePhashPairsOf]]; it stays UNREGISTERED because this corpus
    * provably has no near-duplicate images to find — the synthesized
    * image dims are doc_id-dependent (w = 64 + id%64), so even two
    * byte-identical texts render structurally different images (measured
    * min cross-image hamming: 8 at sf0.01) — and a thresholded pair
    * query would be either empty or noise. Pairing correctness is
    * instead gated on ground-truth synthetic near-dups in
    * MediaCodecPropertiesSpec. */
  def imagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .filter(_.media_type == "image/bmp")
      .mapPartitions(_.map { a =>
        val b = phashBands(a.payload)
        (a.doc_id, b(0).toLong, b(1).toLong, b(2).toLong, b(3).toLong,
          b.map(java.lang.Integer.bitCount).sum.toLong)
      })
      .toDF("doc_id", "b0", "b1", "b2", "b3", "n_bits")
      .orderBy(col("doc_id"))
  }

  /** Near-dup image pairs over a (doc_id, b0..b3) hash table: candidates
    * from [[PhashBands]] band equi-joins (never an all-pairs product; a
    * corpus-sized self-join side must not broadcast, hence the
    * shuffle_hash hint), exact bit_count(xor) hamming inside the join's
    * codegen stage, threshold [[PhashHamming]] — at which the pigeonhole
    * bound (≤3 differing bits over 4 bands ⇒ one band identical) makes
    * the banded candidate recall exact. */
  def imagePhashPairsOf(hashes: DataFrame): DataFrame = {
    val cand = (0 until PhashBands).map { j =>
      hashes.alias("x").hint("shuffle_hash")
        .join(hashes.alias("y"),
          col(s"x.b$j") === col(s"y.b$j") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          col("x.b0").as("xb0"), col("x.b1").as("xb1"),
          col("x.b2").as("xb2"), col("x.b3").as("xb3"),
          col("y.b0").as("yb0"), col("y.b1").as("yb1"),
          col("y.b2").as("yb2"), col("y.b3").as("yb3"))
    }.reduce(_ union _)
    cand.distinct()
      .withColumn("hamming", (0 until PhashBands).map(j =>
          bit_count(col(s"xb$j").bitwiseXOR(col(s"yb$j"))))
        .reduce(_ + _).cast("long"))
      .filter(col("hamming") <= PhashHamming)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }

  /** First-principles oracle for [[imagePhash]]: thumbnail pixels via
    * the [[resizeImagesSql]] nearest-neighbor index formula, integer
    * mean, bits, band integers, set-bit count — exact integer arithmetic
    * end to end. */
  val imagePhashSql: String = {
    val srcIdx = s"((x.g * w // ${ResizeW}) + (y.g * h // ${ResizeH}) * w)"
    val gray = s"CASE WHEN hx IS NULL THEN 0 ELSE " +
      byteAtSql("hx", s"$srcIdx % len") + " END"
    val bandCols = (0 until PhashBands).map { j =>
      s"""CAST(SUM(CASE WHEN i // 16 = $j
         |      THEN bit * (1 << (i % 16)) ELSE 0 END) AS BIGINT) AS b$j"""
        .stripMargin
    }.mkString(",\n    ")
    s"""WITH ${bytesCte(0)},
       |geo AS (
       |  SELECT doc_id, hx, len, 64 + doc_id % 64 AS w,
       |         64 + (doc_id // 2) % 64 AS h
       |  FROM b),
       |px AS (
       |  SELECT doc_id, y.g * ${ResizeW} + x.g AS i, $gray AS gray
       |  FROM geo, generate_series(0, ${ResizeW - 1}) x(g),
       |       generate_series(0, ${ResizeH - 1}) y(g)),
       |m AS (SELECT doc_id, SUM(gray) // ${ResizeW * ResizeH} AS mean
       |      FROM px GROUP BY doc_id),
       |bits AS (
       |  SELECT px.doc_id, i,
       |    CASE WHEN gray > mean THEN 1 ELSE 0 END AS bit
       |  FROM px JOIN m ON m.doc_id = px.doc_id)
       |SELECT doc_id,
       |  $bandCols,
       |  CAST(SUM(bit) AS BIGINT) AS n_bits
       |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Audio frame-sampling stride: analyze every 2nd frame (temporal
    * subsampling — the video-frame-sample shape applied to PCM frames). */
  final val FrameStride = 2

  /** Frame length in samples (non-overlapping, trailing partial dropped). */
  final val FrameLen = 512

  /** Audio FRAME-SAMPLE over the binary corpus: decode each WAV's real
    * PCM samples, tile into non-overlapping [[FrameLen]]-sample frames,
    * keep every [[FrameStride]]-th frame (temporal subsampling — the same
    * access pattern as sampling every k-th video frame), and emit each
    * kept frame's exact integer energy (Σ s²) and peak (max |s|).
    * Partition-local; one output row per kept frame, so output size is
    * corpus-duration-bounded, not sample-bounded.
    *
    * Synthesized sample i is ((text byte (i mod len)) − 128)·256, so both
    * stats are pure integer functions of the text column — the DuckDB
    * oracle ([[audioFramesSql]]) replays them exactly. */
  def audioFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .filter(_.media_type == "audio/wav")
      .mapPartitions(_.flatMap { a =>
        val s = MediaCodec.decodeWavSamples(a.payload)
        val nFrames = s.length / FrameLen
        (0 until nFrames by FrameStride).iterator.map { f =>
          var energy = 0L
          var peak = 0L
          var i = f * FrameLen
          val end = i + FrameLen
          while (i < end) {
            val v = s(i).toLong
            energy += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          (a.doc_id, f.toLong, energy, peak)
        }
      })
      .toDF("doc_id", "frame_idx", "energy", "peak")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Every this-many docs carries a synthesized video (sparse modality —
    * most corpora have far fewer videos than text rows; the pruning
    * predicate is the point at 100 TB). */
  final val VideoEvery = 5

  /** Frame pixel offset per frame index: consecutive frames read the text
    * bytes at a 7·frame shift, so frames DIFFER and temporal sampling is
    * observable (a static video would make stride-sampling vacuous). */
  final val VideoFrameShift = 7

  /** Deterministic video corpus: every [[VideoEvery]]-th doc becomes a
    * GVID container of 2–5 small BMP frames whose pixels are the doc's
    * bytes at a per-frame shift. Same first-principles synthesis contract
    * as [[assets]]: dims, frame counts, and every pixel are pure integer
    * functions of (doc_id, text), so the oracle needs no codec. */
  def videoAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .filter(col("doc_id") % VideoEvery === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val b0 = if (text == null) Array.emptyByteArray
          else text.getBytes("UTF-8")
        val bytes = if (b0.isEmpty) Array[Byte](0) else b0
        val w = 16 + (id % 16).toInt
        val h = 16 + ((id / 2) % 16).toInt
        val nFrames = 2 + ((id / VideoEvery) % 4).toInt
        val frames = (0 until nFrames).map { f =>
          MediaCodec.encodeBmp(w, h, (x, y) => java.lang.Byte.toUnsignedInt(
            bytes((x + y * w + f * VideoFrameShift) % bytes.length)))
        }
        MediaAsset(id, "video/gvid", MediaCodec.encodeVideo(frames))
      })
  }

  /** Video FRAME-SAMPLE: walk each container's real frame index, decode
    * every [[FrameStride]]-th frame's embedded BMP, and emit its exact
    * integer gray sum — the keyframe-extraction access pattern (decode
    * only sampled frames; skipped frames cost an index hop, not a
    * decode). Partition-local like every other media transform. */
  def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoAssets(spark, dir)
      .mapPartitions(_.flatMap { a =>
        val frames = MediaCodec.decodeVideo(a.payload)
        (0 until frames.length by FrameStride).iterator.map { f =>
          val (w, h, px) = MediaCodec.decodeBmpPixels(frames(f))
          (a.doc_id, f.toLong, w.toLong, h.toLong, px.foldLeft(0L)(_ + _))
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "gray_sum")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** First-principles oracle for [[videoFrames]]: frame f's pixel (x,y)
    * is byte((x + y·w + ${VideoFrameShift}·f) mod len) — the gray sum is
    * exact integer arithmetic over the text column, no codec needed. */
  val videoFramesSql: String = {
    val gray = s"CASE WHEN hx IS NULL THEN 0 ELSE " + byteAtSql("hx",
      s"(x.g + y.g * w + ${VideoFrameShift} * frame_idx) % len") + " END"
    s"""WITH b AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL OR text = '' THEN NULL
       |         ELSE hex(encode(text)) END AS hx,
       |    CASE WHEN text IS NULL OR text = '' THEN 1
       |         ELSE octet_length(encode(text)) END AS len
       |  FROM documents WHERE doc_id % ${VideoEvery} = 0),
       |geo AS (
       |  SELECT doc_id, hx, len, 16 + doc_id % 16 AS w,
       |    16 + (doc_id // 2) % 16 AS h,
       |    2 + (doc_id // ${VideoEvery}) % 4 AS nf
       |  FROM b),
       |f AS (
       |  SELECT doc_id, hx, len, w, h, fr.g AS frame_idx
       |  FROM geo, generate_series(0, 4, ${FrameStride}) fr(g)
       |  WHERE fr.g < nf),
       |px AS (
       |  SELECT doc_id, frame_idx, w, h, $gray AS gray
       |  FROM f, generate_series(0, 30) x(g), generate_series(0, 30) y(g)
       |  WHERE x.g < w AND y.g < h)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(h) AS BIGINT) AS height,
       |  CAST(SUM(gray) AS BIGINT) AS gray_sum
       |FROM px GROUP BY doc_id, frame_idx
       |ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** Byte i (0-based, unsigned) of the UTF-8 encoding of `text` in DuckDB
    * SQL — hex-substring idiom (DuckDB has no BLOB subscript). */
  private def byteAtSql(hx: String, idx: String): String =
    s"CAST('0x' || substr($hx, 2 * ($idx) + 1, 2) AS INTEGER)"

  /** Shared oracle CTE: per-document UTF-8 byte string as hex + length,
    * with the Spark synthesis's empty/null → single-zero-byte rule (hx
    * NULL marks that case; readers treat byte value as 0). */
  private def bytesCte(parity: Int): String =
    s"""b AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL OR text = '' THEN NULL
       |         ELSE hex(encode(text)) END AS hx,
       |    CASE WHEN text IS NULL OR text = '' THEN 1
       |         ELSE octet_length(encode(text)) END AS len
       |  FROM documents WHERE doc_id % 2 = $parity)""".stripMargin

  /** First-principles oracle for [[resizeImages]]: nearest-neighbor source
    * index (X·w/8, Y·h/8) into the synthesized pixel function
    * byte((x + y·w) mod len) — exact integer arithmetic end to end. The
    * thumbnail file size is format geometry: 54 + rowSize(8)·8 where
    * rowSize(8) = (8·3+3)/4·4 = 24 → 246 bytes. */
  val resizeImagesSql: String = {
    val srcIdx = s"((x.g * w // ${ResizeW}) + (y.g * h // ${ResizeH}) * w)"
    val gray = s"CASE WHEN hx IS NULL THEN 0 ELSE " +
      byteAtSql("hx", s"$srcIdx % len") + " END"
    s"""WITH ${bytesCte(0)},
       |geo AS (
       |  SELECT doc_id, hx, len, 64 + doc_id % 64 AS w,
       |         64 + (doc_id // 2) % 64 AS h
       |  FROM b),
       |px AS (
       |  SELECT doc_id, w, h, $gray AS gray
       |  FROM geo, generate_series(0, ${ResizeW - 1}) x(g),
       |       generate_series(0, ${ResizeH - 1}) y(g))
       |SELECT doc_id, CAST(MIN(w) AS BIGINT) AS src_width,
       |  CAST(MIN(h) AS BIGINT) AS src_height,
       |  CAST(246 AS BIGINT) AS out_bytes,
       |  CAST(SUM(gray) AS BIGINT) AS gray_sum
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** First-principles oracle for [[audioFrames]]: sample i of odd doc is
    * (byte(i mod len) − 128)·256, so frame energy = 65536·Σ(b−128)² and
    * peak = 256·max|b−128| — exact integers (≤ 512·32768² ≈ 5.5e11, well
    * inside BIGINT). Frame count = (2048 + doc_id mod 2048) / 512, strided
    * by [[FrameStride]]. */
  val audioFramesSql: String = {
    val d = s"(CASE WHEN hx IS NULL THEN 0 ELSE " +
      byteAtSql("hx", s"(frame_idx * ${FrameLen} + i.g) % len") +
      " END) - 128"
    s"""WITH ${bytesCte(1)},
       |f AS (
       |  SELECT doc_id, hx, len, fr.g AS frame_idx
       |  FROM b, generate_series(0, 7, ${FrameStride}) fr(g)
       |  WHERE fr.g < (2048 + doc_id % 2048) // ${FrameLen}),
       |s AS (
       |  SELECT doc_id, frame_idx, ($d) AS d
       |  FROM f, generate_series(0, ${FrameLen - 1}) i(g))
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST(65536 * SUM(d * d) AS BIGINT) AS energy,
       |  CAST(256 * MAX(abs(d)) AS BIGINT) AS peak
       |FROM s GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx""".stripMargin
  }

  /** Mismatch-filter threshold for [[crossModalPairs]]: a candidate pair
    * trains only if caption↔image embedding cosine ≥ τ. Calibrated on the
    * synthetic embeddings: self pairs sit at cosine 1.0, neighbor pairs
    * in [−0.31, 0.36] — τ=0.25 keeps every self pair, admits the few
    * genuinely-close neighbors, and rejects the rest, so all three
    * outcome groups are populated at every SF. */
  final val CrossModalTau = 0.25

  /** CROSS-MODAL PAIRING — the caption↔image alignment stage of a
    * multimodal training pipeline (the CLIP-style pair-mining shape):
    * image docs join their caption CANDIDATES — the image's own document
    * and its successor, the web-scrape premise that nearby nodes are
    * caption candidates — each pair gets alignment stats (image dims and
    * exact gray mass from a REAL per-row decode, caption length/tokens,
    * pixels-per-char ratio, embedding cosine via the strict-fold
    * [[graft.functions.VecDot]]), and the mismatch filter marks which
    * candidates train ([[CrossModalTau]]).
    *
    * Scale shape: the decode is per-row bounded and partition-local
    * (payload bytes never shuffle — only the narrow stat columns leave
    * the executor); candidates are a constant 2 rows per image; caption
    * and embedding attachment are doc-id equi-joins. Docs without an
    * embedding row simply produce no pair (inner join) — the sf0.1
    * corpus has 5000 docs but 2000 embeddings, exactly the partial-
    * coverage reality of a scraped corpus.
    *
    * Exactness: dims/gray from the decode are integers the oracle
    * re-derives from the synthesis function; the cosine is the
    * strict-left-fold double both engines share bit-exactly
    * ([[graft.operators.Similarity.foldSql]]); ratios divide exact
    * integers. So the whole row — filter verdict included — is
    * hash-exact. */
  def crossModalPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vd = graft.functions.VecDot.vec_dot _
    val imgs = assets(spark, dir)
      .filter(_.media_type == "image/bmp")
      .mapPartitions(_.map { a =>
        val (w, h, px) = MediaCodec.decodeBmpPixels(a.payload)
        (a.doc_id, w.toLong, h.toLong, px.foldLeft(0L)(_ + _))
      })
      .toDF("img_doc", "width", "height", "gray_sum")
    val cands = imgs.select(col("img_doc"), col("width"), col("height"),
      col("gray_sum"),
      explode(array(col("img_doc"), col("img_doc") + 1)).as("cap_doc"))
    val caps = t(spark, dir, "documents").select(
      col("doc_id").as("cap_doc"),
      length(col("text")).cast("long").as("cap_chars"),
      size(split(col("text"), " ")).cast("long").as("cap_tokens"))
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ev"))
    cands
      .join(caps, Seq("cap_doc"))
      .join(emb.select(col("vec_id").as("img_doc"), col("ev").as("iv")),
        Seq("img_doc"))
      .join(emb.select(col("vec_id").as("cap_doc"), col("ev").as("cv")),
        Seq("cap_doc"))
      .withColumn("cosine", vd(col("iv"), col("cv")) /
        (sqrt(vd(col("iv"), col("iv"))) * sqrt(vd(col("cv"), col("cv")))))
      .select(col("img_doc"), col("cap_doc"), col("width"), col("height"),
        col("gray_sum"), col("cap_chars"), col("cap_tokens"),
        ((col("width") * col("height")).cast("double") / col("cap_chars"))
          .as("px_per_char"),
        col("cosine"),
        (col("cosine") >= CrossModalTau).as("matched"))
      .orderBy(col("img_doc"), col("cap_doc"))
  }

  /** Oracle for [[crossModalPairs]]: geometry and gray mass from first
    * principles — pixel (x,y) is byte((x + y·w) mod len) and the pixel
    * index sweeps [0, w·h) exactly once, so
    * gray_sum = (w·h ÷ len)·Σbytes + Σ first (w·h mod len) bytes — a
    * len-bounded series per doc, never a per-pixel one; cosine via the
    * shared strict-fold SQL. */
  val crossModalPairsSql: String = {
    val byteI = s"CASE WHEN hx IS NULL THEN 0 ELSE ${byteAtSql("hx", "i.g")} END"
    val cos = s"""${Similarity.foldSql("ei.ev", "ec.ev")}
       |      / (sqrt(${Similarity.foldSql("ei.ev", "ei.ev")})
       |         * sqrt(${Similarity.foldSql("ec.ev", "ec.ev")}))""".stripMargin
    s"""WITH ${bytesCte(0)},
       |geo AS (
       |  SELECT doc_id, hx, len, 64 + doc_id % 64 AS w,
       |         64 + (doc_id // 2) % 64 AS h
       |  FROM b),
       |gray AS (
       |  SELECT doc_id, w, h,
       |    (w * h // len) * SUM($byteI)
       |      + SUM(CASE WHEN i.g < (w * h) % len THEN $byteI ELSE 0 END)
       |      AS gray_sum
       |  FROM geo, generate_series(0, 4095) i(g) WHERE i.g < len
       |  GROUP BY doc_id, w, h, len),
       |cand AS (
       |  SELECT doc_id AS img_doc, w, h, gray_sum,
       |    unnest([doc_id, doc_id + 1]) AS cap_doc
       |  FROM gray),
       |caps AS (
       |  SELECT doc_id AS cap_doc, length(text) AS cap_chars,
       |    len(string_split(text, ' ')) AS cap_tokens
       |  FROM documents),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
       |SELECT img_doc, cap_doc,
       |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       |  CAST(gray_sum AS BIGINT) AS gray_sum,
       |  CAST(cap_chars AS BIGINT) AS cap_chars,
       |  CAST(cap_tokens AS BIGINT) AS cap_tokens,
       |  CAST(w * h AS DOUBLE) / cap_chars AS px_per_char,
       |  $cos AS cosine,
       |  $cos >= $CrossModalTau AS matched
       |FROM cand
       |JOIN caps USING (cap_doc)
       |JOIN e ei ON ei.vec_id = img_doc
       |JOIN e ec ON ec.vec_id = cap_doc
       |ORDER BY img_doc, cap_doc""".stripMargin
  }

  /** Negatives per positive pair, and the candidate-bucket modulus.
    * [[NegBuckets]] bounds the candidate slice each image ranks:
    * corpus/NegBuckets captions per image, NOT the full corpus — at
    * 100 TB you scale NegBuckets with the corpus so the per-image
    * candidate count stays O(desired-negatives × safety-factor). */
  final val NegPerPair = 3
  final val NegBuckets = 8L

  /** Contrastive NEGATIVE mining for the caption↔image pairs: for every
    * image (even doc_ids, [[assets]]), deterministically sample
    * [[NegPerPair]] mismatched captions to train against, excluding the
    * image's own caption candidates (doc_id and doc_id+1 — the positive
    * set [[crossModalPairs]] scores).
    *
    * Scale shape: candidate generation is an EQUI-join on the hash bucket
    * (cap_doc % [[NegBuckets]] = img_doc % [[NegBuckets]]) — never a
    * cross join — so each image ranks a corpus/NegBuckets slice; the
    * per-image top-[[NegPerPair]] runs through the k-BOUNDED partial
    * aggregator ([[graft.functions.TopKAgg]]): every (partition, image)
    * reduces to ≤ k candidates before the exchange, where the window
    * formulation shuffled and sorted the whole candidate join output
    * (measured 2.4 s → 1.5 s at sf0.1). Ranking key: the first 13 hex
    * digits of md5(img_doc:cap_doc) as a 52-bit integer — exactly
    * representable in double, engine/run/partitioning-independent, so
    * the sampled negatives are reproducible across the cluster and the
    * oracle replays the identical (key, cap) total order. No decode:
    * negative mining is metadata-only; the payload bytes stay untouched
    * in storage (binary-column pruning). */
  def crossModalNegatives(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val imgs = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("img_doc"),
        (col("doc_id") % NegBuckets).as("b"))
    val caps = docs.select(col("doc_id").as("neg_cap"),
      (col("doc_id") % NegBuckets).as("b"))
    val topk = graft.functions.TopKAgg.top_k(NegPerPair)
    imgs.join(caps, Seq("b"))
      .filter(col("neg_cap") =!= col("img_doc") &&
        col("neg_cap") =!= col("img_doc") + 1)
      .withColumn("hk", expr("cast(conv(substring(md5(cast(concat(" +
        "cast(img_doc as string), ':', cast(neg_cap as string)" +
        ") as binary)), 1, 13), 16, 10) as bigint)"))
      .groupBy(col("img_doc"))
      .agg(topk(col("neg_cap"), -col("hk").cast("double")).as("tk"))
      .select(col("img_doc"), posexplode(col("tk")))
      .select(col("img_doc"), col("col.id").as("neg_cap"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("img_doc"), col("rnk"))
  }

  val crossModalNegativesSql: String =
    s"""WITH imgs AS (
       |  SELECT doc_id AS img_doc FROM documents WHERE doc_id % 2 = 0),
       |caps AS (SELECT doc_id AS neg_cap FROM documents),
       |cand AS (
       |  SELECT img_doc, neg_cap,
       |    CAST(concat('0x', substring(md5(concat(CAST(img_doc AS VARCHAR),
       |      ':', CAST(neg_cap AS VARCHAR))), 1, 13)) AS BIGINT) AS hk
       |  FROM imgs JOIN caps ON neg_cap % $NegBuckets = img_doc % $NegBuckets
       |  WHERE neg_cap <> img_doc AND neg_cap <> img_doc + 1),
       |r AS (
       |  SELECT img_doc, neg_cap,
       |    row_number() OVER (PARTITION BY img_doc ORDER BY hk, neg_cap)
       |      AS rnk
       |  FROM cand)
       |SELECT img_doc, neg_cap, rnk FROM r WHERE rnk <= $NegPerPair
       |ORDER BY img_doc, rnk""".stripMargin

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
