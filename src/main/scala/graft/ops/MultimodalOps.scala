package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column support: media travels as an opaque
 * `binary` column with a typed metadata struct; decode / feature-extract /
 * frame-sample are per-partition batch operators so a real decoder (JNI
 * image lib, ffmpeg pipe) drops in without changing the plan shape.
 *
 * STUB NOTE: this container has no image/audio codecs, so [[StubDecoder]]
 * is a clearly-marked deterministic fake (features derived from a rolling
 * hash of the bytes). The Spark-side plumbing — schema, partitioning,
 * batch iteration, output shape — is real and tested; swapping in a real
 * decoder is replacing one function.
 */
object MultimodalOps {

  /** media_id, kind ("image"|"audio"|"video"), content bytes, typed meta. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** A decoder turns one media blob into a fixed-size feature vector.
    * Implementations must be serializable (shipped to executors). */
  trait Decoder extends Serializable {
    def decode(kind: String, content: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decoder — STUB for the absent codec libraries.
    * Features are a seeded rolling hash folded into `dim` floats, so tests
    * are reproducible and the executor-side batch path is exercised for
    * real. */
  final class StubDecoder(dim: Int = 8) extends Decoder {
    def decode(kind: String, content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      if (content == null) return out
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < content.length) {
        h ^= (content(i) & 0xffL)
        h *= 0x100000001b3L
        out(i % dim) += ((h >>> 40).toInt % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Synthesize a media corpus from the documents table (text bytes stand
    * in for encoded frames) — plumbing-shape fixture, not a codec. */
  def syntheticCorpus(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      (when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      col(textCol).cast("binary").as("content"),
      struct(
        (pmod(col(idCol), lit(1280)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(720)) + 1).cast("int").as("height"),
        lit("raw").as("format")).as("meta"))

  /** Per-partition batch decode → (media_id, kind, features array<float>).
    * The decoder runs once per row inside a partition iterator (the batch
    * shape a vectorized decode lib wants); the plan stays a map-only scan. */
  def decodeFeatures(media: DataFrame, decoder: Decoder = new StubDecoder()): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val src = media.select(col("media_id").cast("long"), col("kind"), col("content"))
    val rdd = src.rdd.mapPartitions { it =>
      it.map { r =>
        val feats = decoder.decode(r.getString(1), r.getAs[Array[Byte]](2))
        Row(r.getLong(0), r.getString(1), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling as pure column ops: split the blob into fixed-size
    * "frames" and keep every `stride`-th one. Real video sampling swaps the
    * byte-slice for a container parser; the plan shape (map-only, exploded
    * frames with ordinals) is what matters at scale. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val frames = expr(
      s"""transform(
         |  sequence(0, greatest(cast((length(content) - 1) / $frameBytes as int), 0)),
         |  i -> substring(content, i * $frameBytes + 1, $frameBytes))""".stripMargin)
    media.select(col("media_id"), col("kind"),
        posexplode(frames).as(Seq("frame_no", "frame")))
      .where(pmod(col("frame_no"), lit(stride)) === 0)
  }
}
