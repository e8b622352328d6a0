package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`StubDecoder`) — but the Spark-side
  * plumbing is real and tested: binary column handling, typed metadata
  * structs, batched `mapPartitions` with a per-partition decoder instance
  * (the Scala analogue of `mapInPandas` batch shape: amortize decoder init
  * across the partition, never per row).
  */
object Multimodal {

  /** Typed metadata emitted by the decode/feature stage. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      feature_norm: Double
  )

  /** STUB decoder: stands in for an image/audio codec. Deterministic fake —
    * dimensions and frame counts derived from the payload bytes. A real
    * deployment swaps this object for e.g. a JNI codec; the call shape
    * (init-once-per-partition, byte-array in, meta out) is the contract.
    */
  object StubDecoder {
    def decode(bytes: Array[Byte]): (String, Int, Int, Int) = {
      // ??? real codec goes here — deterministic fake below
      val n = bytes.length
      val fmt = n % 3 match { case 0 => "png"; case 1 => "jpeg"; case _ => "webm" }
      (fmt, 64 + (n % 512), 64 + ((n / 7) % 512), 1 + (n % 30))
    }
  }

  /** Derive a binary "media" table from documents: payload = UTF-8 bytes of
    * the text (the opaque-bytes stand-in), plus the passthrough metadata a
    * real pipeline would carry (capture ts, source).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"), col("lang"))

  /** Metadata-only pass: pure column derivations over the binary payload —
    * no decode, scan stays pruned to (doc_id, payload).
    */
  def mediaMetaSql(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      substring(hex(col("payload")), 1, 8).as("magic_hex")
    )

  /** Decode / feature-extract stage: batched mapPartitions over the binary
    * column, one decoder per partition, typed `Dataset[MediaMeta]` out.
    */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder/session init would happen HERE, once per partition
        it.map { case (id, bytes) =>
          val (fmt, w, h, frames) = StubDecoder.decode(bytes)
          // fake feature vector norm: deterministic from bytes
          val norm = math.sqrt(bytes.iterator.map(b => (b & 0xff).toDouble).sum)
          MediaMeta(id, bytes.length.toLong, fmt, w, h, frames,
            math.round(norm * 1e6) / 1e6)
        }
      }
  }

  /** Letterbox specs for model-input batching — the reference's ONNX
    * preprocessing math (scale_wh: r = min(W/w, H/h), resize to
    * (round(w*r), round(h*r)), pad the rest with 144/255 —
    * layout/model.rs:334-400) as a declarative column op over the decoded
    * media meta. The raster resize itself belongs to the decode stage
    * (StubDecoder territory: no codecs in this container); this op emits the
    * exact spec a vision-model batcher needs, including the letterbox
    * margins used to project detections back to image space. Math runs in
    * f64 (the analytics side; the reference's f32 rounds to the same
    * integers at these magnitudes).
    */
  def letterboxSpecs(spark: SparkSession, dir: String,
      targetW: Int = 1024, targetH: Int = 1024): DataFrame = {
    val scale = least(lit(targetW.toDouble) / col("width"),
      lit(targetH.toDouble) / col("height"))
    decodeMeta(spark, dir).toDF()
      .select(col("doc_id"), col("width"), col("height"))
      .withColumn("new_w", round(col("width") * scale).cast("int"))
      .withColumn("new_h", round(col("height") * scale).cast("int"))
      .select(col("doc_id"), col("width"), col("height"),
        round(scale, 6).as("scale"), col("new_w"), col("new_h"),
        (lit(targetW) - col("new_w")).as("pad_x"),
        (lit(targetH) - col("new_h")).as("pad_y"),
        round(lit(144.0 / 255.0), 6).as("pad_fill"))
  }

  /** Frame-sampling shape: explode a deterministic frame index per media row
    * (every 10th frame), the partition-preserving fan-out a video pipeline
    * needs (no shuffle — explode is a generator, stays in the same stage).
    */
  def sampleFrames(spark: SparkSession, dir: String): DataFrame = {
    val meta = decodeMeta(spark, dir).toDF()
    meta.select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(10))).as("frame_idx"))
      .withColumn("frame_key", concat_ws("#", col("doc_id"), col("frame_idx")))
  }
}
