package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2 Tier D "multimodal columns"):
  * image/audio/video travel as opaque `BinaryType` columns next to a typed
  * metadata struct; decode / feature-extraction runs partition-wise so a
  * real decoder processes a batch of payloads per task without any
  * driver-side materialization.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): [[stubDecode]] derives a deterministic fake feature vector
  * from the payload bytes. Everything around it — the binary schema, the
  * metadata struct, the `mapPartitions` batch shape, partition-preserving
  * execution — is the real 100 TB-scale plumbing: payloads never leave
  * executors, the feature pass is a narrow (shuffle-free) transformation,
  * and the output schema is a first-class `ArrayType(FloatType)` column
  * ready for the [[Vector]] similarity operators.
  */
object Multimodal {

  val FeatureDim = 8

  /** media-record schema: id + opaque payload + typed metadata */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true))), nullable = false)))

  /** Attach an opaque binary payload + metadata struct to `documents`.
    * (Here the payload is the utf-8 text bytes standing in for real media;
    * a production pipeline reads the binary column straight from parquet.) */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("text")).cast(LongType).as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio frame) and run a feature extractor. The fake is
    * deterministic — a rolling byte hash seeds each feature dimension —
    * so tests and re-runs are stable. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // fixed FNV-ish seed
    var i = 0
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    var x = h
    while (j < dim) {
      x = x * 6364136223846793005L + 1442695040888963407L // splitmix-style
      out(j) = ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
      j += 1
    }
    out
  }

  /** Frame geometry for [[defs]]' frame-sample key: a "frame" is
    * [[FrameBytes]] consecutive payload bytes; every [[FrameStride]]-th
    * offset is sampled (the video keyframe-sampling shape). */
  val FrameBytes = 16
  val FrameStride = 64

  /** queries() surface: decode + frame plumbing end-to-end. The
    * driver-checkable outputs are scalar — for decode, per-dim
    * `floor(feature * 1e6)::BIGINT` digests of the decoded feature vector
    * (raw `array<float>` columns aren't sortable by the driver's pandas
    * check; the array-valued variant stays a ScalaTest surface in
    * MultimodalSpec). The stub decoder is pure integer arithmetic over
    * the payload bytes, so the DuckDB oracle recomputes it exactly: the
    * JVM's wrapping signed-64 multiply/add is emulated with HUGEINT
    * arithmetic mod 2^64 (documents.text is ASCII, so `ord(char)` ==
    * utf-8 byte). */
  val defs: Seq[graft.QueryDef] = Seq(
    // ---------------------------------------- frame-sample + resize
    // the video-pipeline plumbing: sample every FrameStride-th FrameBytes
    // window of the opaque payload ("keyframes"), and per frame emit a
    // content digest plus a RESIZE stub digest (every 4th byte of the
    // frame — the downsample shape; a real pipeline swaps the stub for a
    // codec). One explode per doc, no shuffle, frames never leave their
    // executor; payloads are ASCII text standing in for media bytes, so
    // the DuckDB oracle replays the byte windows with substr exactly.
    // (Chars-as-bytes holds because documents.text is ASCII — same
    // assumption q_multimodal_decode's oracle documents.)
    graft.QueryDef("q_multimodal_frames",
      (s, d) => {
        val thumb = (0 until 4).map(j =>
          s"substring(frame, ${1 + 4 * j}, 1)").mkString("concat(", ", ", ")")
        graft.warehouse.Tables.table(s, d, "documents")
          .filter(length(col("text")) >= FrameBytes)
          .withColumn("off", explode(expr(
            s"sequence(0, length(text) - $FrameBytes, $FrameStride)")))
          .withColumn("frame",
            expr(s"substring(text, off + 1, $FrameBytes)"))
          .select(
            col("doc_id"),
            (col("off") / FrameStride).cast(LongType).as("frame_idx"),
            md5(col("frame").cast(BinaryType)).as("frame_md5"),
            md5(expr(thumb).cast(BinaryType)).as("thumb_md5"))
          .orderBy("doc_id", "frame_idx")
      },
      Some {
        val thumb = (0 until 4).map(j =>
          s"substr(frame, ${1 + 4 * j}, 1)").mkString("concat(", ", ", ")")
        s"""WITH f AS (
           |  SELECT doc_id,
           |    unnest(generate_series(0, length(text) - $FrameBytes, $FrameStride)) AS off,
           |    text
           |  FROM documents WHERE length(text) >= $FrameBytes
           |), g AS (
           |  SELECT doc_id, off, substr(text, off + 1, $FrameBytes) AS frame FROM f
           |)
           |SELECT doc_id, CAST(off // $FrameStride AS BIGINT) AS frame_idx,
           |  md5(frame) AS frame_md5,
           |  md5($thumb) AS thumb_md5
           |FROM g ORDER BY doc_id, frame_idx""".stripMargin
      }),

    graft.QueryDef("q_multimodal_decode",
      (s, d) => {
        val feats = extractFeatures(withPayload(
          graft.warehouse.Tables.table(s, d, "documents")))
        val digests = (0 until FeatureDim).map { j =>
          floor(element_at(col("features"), j + 1).cast(DoubleType) * lit(1e6))
            .cast(LongType).as(s"f$j")
        }
        feats.select(
            (Seq(col("doc_id"), col("meta.n_bytes").as("n_bytes")) ++ digests): _*)
          .orderBy("doc_id")
      },
      Some(decodeOracle)))

  /** DuckDB twin of [[stubDecode]] ∘ floor-scale digest: fold the rolling
    * byte hash with `list_reduce` over the characters, run the splitmix
    * recurrence per dimension via lateral column aliases, reproduce the
    * `toFloat`/`- 0.5f` float32 steps with REAL casts, then digest. */
  private def decodeOracle: String = {
    val m64 = "CAST('18446744073709551616' AS HUGEINT)"
    val xs = (0 until FeatureDim).map { j =>
      val prev = if (j == 0) "h0" else s"x${j - 1}"
      s"(($prev * 6364136223846793005 + 1442695040888963407) % $m64) AS x$j"
    }.mkString(",\n       ")
    val fs = (0 until FeatureDim).map { j =>
      s"CAST(floor(CAST((CAST(CAST((x$j // 2048) AS DOUBLE) / 9007199254740992e0 AS REAL)" +
        s" - CAST(0.5 AS REAL)) AS DOUBLE) * 1e6) AS BIGINT) AS f$j"
    }.mkString(",\n       ")
    s"""WITH b AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       |         list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
       |             list_transform(str_split(text, ''), c -> CAST(ord(c) AS HUGEINT))),
       |           (acc, v) -> (acc * 31 + v) % $m64) AS h0
       |  FROM documents
       |), xs AS (
       |  SELECT doc_id, n_bytes,
       |       $xs
       |  FROM b
       |)
       |SELECT doc_id, n_bytes,
       |       $fs
       |FROM xs ORDER BY doc_id""".stripMargin
  }

  /** Partition-wise feature extraction over the binary column: one
    * iterator pass per task (the batch shape a vectorized decoder wants),
    * no shuffle, payload dropped after decode so only the small feature
    * vector flows downstream. */
  def extractFeatures(media: DataFrame, dim: Int = FeatureDim): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("meta", media.schema("meta").dataType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("doc_id", "payload", "meta").mapPartitions { rows =>
      rows.map { r =>
        val feats = stubDecode(r.getAs[Array[Byte]]("payload"), dim)
        Row(r.getLong(0), r.getStruct(2), feats.toSeq)
      }
    }(enc)
  }
}
