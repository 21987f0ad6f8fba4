package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.zip.ZipExtract

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with typed metadata, processed in batch-shaped
  * per-partition passes — the Spark-side pattern for decode / feature
  * -extract / frame-sample stages. The actual media codecs are STUBBED
  * (this container has no image/audio libraries): [[Multimodal]] marks the
  * stub boundary, and the stand-in "decode" is a deterministic function of
  * the bytes so the full pipeline — schema, partitioning, batch iteration,
  * result shape — is real and oracle-checkable.
  *
  * `documents.text` (ASCII) cast to binary stands in for media payloads;
  * with real media only [[Multimodal]]'s internals change.
  *
  * Scale: mapPartitions keeps per-task state (a decoder context) allocated
  * once per partition, not per row — the same batch shape as an Arrow-batch
  * UDF; payload bytes never cross a shuffle (metadata-only outputs).
  */
object Multimodal {
  /** STUB — real implementation would decode the image and return pixel
    * features. Stand-in: 16-bin histogram of raw byte values (deterministic,
    * exercises the full byte path). */
  def decodeImageFeatures(body: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < body.length) { hist((body(i) & 0xff) >> 4) += 1; i += 1 }
    hist
  }

  /** STUB — real implementation would demux the container and decode every
    * k-th video frame. Stand-in: sample every 32nd byte as the "frame". */
  def sampleFrames(body: Array[Byte], stride: Int = 32): Iterator[(Int, Int)] =
    Iterator.range(0, body.length, stride).zipWithIndex.map {
      case (pos, idx) => (idx, body(pos) & 0xff)
    }

  /** STUB — real implementation would decode, bilinear-resample to the
    * target resolution, and re-encode. Stand-in: keep every `factor`-th
    * byte (a 1-D nearest-neighbor downsample, deterministic and
    * byte-exact). */
  def resize(body: Array[Byte], factor: Int = 2): Array[Byte] = {
    val out = new Array[Byte]((body.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = body(i * factor); i += 1 }
    out
  }
}

object MultimodalOps {
  import Tables._

  /** Metadata projection over an opaque binary column: byte length +
    * content hash — pure column ops, no decode. */
  def blobMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast(BinaryType)).cast("long").as("n_bytes"),
        sha2(col("text").cast(BinaryType), 256).as("content_sha"))
      .orderBy("doc_id")

  /** Batch feature extraction: binary payload → per-bin histogram rows via
    * mapPartitions (decoder stub allocated once per partition). */
  def byteHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder context would be initialized here (STUB)
        it.flatMap { case (id, body) =>
          Multimodal.decodeImageFeatures(body).iterator.zipWithIndex.collect {
            case (n, bin) if n > 0 => (id, bin, n)
          }
        }
      }
      .toDF("doc_id", "bin", "n")
      .orderBy("doc_id", "bin")
  }

  /** Frame sampling: one output row per sampled "frame" with its position
    * and value — the flatMap (1 row → N rows) shape of a video pipeline. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, body) =>
        Multimodal.sampleFrames(body).map { case (idx, v) => (id, idx, v) }
      }
      .toDF("doc_id", "frame_idx", "byte_val")
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize stage: payload in, downsampled payload + before/after metadata
    * out — the map shape of an image-resize pipeline (payload transforms
    * stay within the task; only the transformed payload would flow to the
    * next stage, never across a shuffle key). */
  def resizeStage(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, body) =>
          val r = Multimodal.resize(body)
          (id, body.length.toLong, r.length.toLong, ZipExtract.sha256Hex(r))
        }
      }
      .toDF("doc_id", "orig_bytes", "resized_bytes", "resized_sha")
      .orderBy("doc_id")
  }

  /** Audio-style framing: treat the payload as 8-bit samples, cut into
    * fixed 64-sample windows, emit per-window count and energy (sum of
    * squared sample values — the core of RMS/VAD features). Unlike the
    * mapPartitions stages this one is fully relational: posexplode +
    * integer arithmetic + one partial-aggregated shuffle on
    * (doc, window) — everything whole-stage codegen. A real audio decoder
    * would only replace the byte extraction, not the framing plan. */
  def audioWindows(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        expr("filter(split(text, ''), c -> c <> '')").as("cs"))
      .select(col("doc_id"), posexplode(col("cs")).as(Seq("i", "c")))
      .select(col("doc_id"), expr("CAST(i DIV 64 AS INT)").as("win"),
        expr("CAST(ascii(c) AS BIGINT)").as("v"))
      .groupBy(col("doc_id"), col("win"))
      .agg(count(lit(1)).as("n_samples"),
        sum(expr("v * v")).as("energy"))
      .select(col("doc_id"), col("win"), col("n_samples"), col("energy"),
        expr("energy / n_samples").as("mean_energy"))
      .orderBy("doc_id", "win")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_blob_meta" -> blobMeta,
    "m_byte_histogram" -> byteHistogram,
    "m_frame_sample" -> frameSample,
    "m_resize" -> resizeStage,
    "m_audio_windows" -> audioWindows)

  val oracles: Map[String, String] = Map(
    "m_blob_meta" -> """
      SELECT doc_id, octet_length(CAST(text AS BLOB))::BIGINT AS n_bytes,
             sha256(text) AS content_sha
      FROM documents ORDER BY doc_id""",
    // text is ASCII, so bytes == code points: the byte histogram equals the
    // character-code histogram.
    "m_byte_histogram" -> """
      WITH c AS (SELECT doc_id, unicode(unnest(string_split_regex(text, ''))) cp
                 FROM documents)
      SELECT doc_id, (cp // 16)::INT AS bin, count(*) AS n
      FROM c GROUP BY 1, 2 ORDER BY doc_id, bin""",
    "m_frame_sample" -> """
      WITH p AS (SELECT doc_id, text,
                   unnest(generate_series(1, length(text), 32)) pos
                 FROM documents WHERE doc_id < 100)
      SELECT doc_id, ((pos - 1) // 32)::INT AS frame_idx,
             unicode(substr(text, pos, 1)) AS byte_val
      FROM p ORDER BY doc_id, frame_idx""",
    "m_audio_windows" -> """
      WITH p AS (SELECT doc_id, text, unnest(generate_series(1, length(text))) pos
                 FROM documents WHERE doc_id < 100),
      v AS (SELECT doc_id, ((pos - 1) // 64)::INT AS win,
              unicode(substr(text, pos, 1))::BIGINT AS v
            FROM p)
      SELECT doc_id, win, count(*) AS n_samples,
             sum(v * v)::BIGINT AS energy,
             sum(v * v)::BIGINT / count(*) AS mean_energy
      FROM v GROUP BY doc_id, win ORDER BY doc_id, win""",
    // '(.).'->'\1' keeps char 1 of every pair (plus an odd tail) == the
    // stride-2 byte downsample over ASCII text.
    "m_resize" -> """
      WITH r AS (SELECT doc_id, length(text)::BIGINT orig_bytes,
                   regexp_replace(text, '(.).', '\1', 'g') rz
                 FROM documents)
      SELECT doc_id, orig_bytes, length(rz)::BIGINT AS resized_bytes,
             sha256(rz) AS resized_sha
      FROM r ORDER BY doc_id""")
}
