package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract
  * / frame-sample operators.
  *
  * The actual media codecs are NOT available in this environment, so
  * the decode kernels are deterministic STUBS (clearly marked below):
  * they derive fake-but-stable "features" from the bytes. Everything
  * around them — schema, batch shape, partitioning, null handling — is
  * real, so swapping in a JNI/ffmpeg-backed kernel is a drop-in change
  * inside `mapPartitions` and nothing upstream or downstream moves.
  *
  * Scale posture: decode runs per-partition with no shuffle; feature
  * columns are pruned like any other; payload bytes never pass through
  * a wide dependency.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Wrap any table into the media shape (payload from a binary or
    * string column) — used by tests and by ingestion glue. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      struct(lit(null).cast("string").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** STUB decode: deterministic fake image decode. A real kernel
    * would parse the codec header; the stub derives stable pseudo
    * dimensions from a payload hash so plumbing (schema, nulls,
    * pruning) is fully exercised. */
  def decodeImageStub(payload: Column): Column = {
    val h = xxhash64(payload)
    struct(
      (pmod(h, lit(1920L)).cast("int") + 1).as("width"),
      (pmod(shiftright(h, 16), lit(1080L)).cast("int") + 1).as("height"),
      lit(3).as("channels"))
  }

  /** STUB feature extraction: fixed-length pseudo-embedding from
    * payload bytes (stable per payload). Real kernel: model inference
    * per partition-batch. */
  def featureStub(payload: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(payload, i), lit(1000L)).cast("double") / 1000.0)

  /** STUB frame sampling for video payloads: every `everyMs`
    * millisecond up to `durationMs`, emit a (frame_ts_ms, frame_hash)
    * struct — the batch shape a real decoder would produce. */
  def frameSampleStub(payload: Column, durationMs: Column, everyMs: Int): Column =
    transform(
      sequence(lit(0L), greatest(durationMs - 1, lit(0L)), lit(everyMs.toLong)),
      t => struct(t.as("frame_ts_ms"), xxhash64(payload, t).as("frame_hash")))

  /** Decode+extract pipeline over a media frame: adds decoded metadata
    * and features, preserving partitioning (no shuffle). */
  def extractFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("decoded", decodeImageStub(col("payload")))
      .withColumn("features", featureStub(col("payload")))

  /** Batch-kernel variant: the `mapInPandas`-equivalent shape for
    * kernels that amortize per-batch setup (model load, codec init).
    * `kernel` receives payload batches of ≤ `batchSize` and returns one
    * feature vector per payload, order-preserving — exactly the
    * contract a GPU/ffmpeg-backed implementation needs; the stub
    * kernel here is deterministic bytes-math. Runs per partition, no
    * shuffle, memory bounded by `batchSize` payloads. */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 64)(
      kernel: Seq[Array[Byte]] => Seq[Array[Double]] = stubBatchKernel): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (model/codec init)
          val features = kernel(batch.map(_._2))
          require(features.length == batch.length,
            "kernel must return one feature row per payload")
          batch.map(_._1).zip(features)
        }
      }
    out.toDF("media_id", "features")
  }

  /** STUB batch kernel: stable per-payload pseudo-features. */
  def stubBatchKernel(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
    payloads.map { bytes =>
      var h = 0xcbf29ce484222325L
      bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      Array.tabulate(8)(i => ((h >>> (i * 8)) & 0xff).toDouble / 255.0)
    }
}
