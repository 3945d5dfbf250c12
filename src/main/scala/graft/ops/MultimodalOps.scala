package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
/** A decoder turns one media blob into a fixed-size feature vector.
  * Implementations must be serializable (shipped to executors). Empty and
  * null content are equivalent ("no content"). */
trait MediaDecoder extends Serializable {
  def decode(kind: String, content: Array[Byte]): Array[Float]
}

/** Deterministic fake decoder — STUB for the absent codec libraries.
  * Features are a seeded rolling hash folded into `dim` floats, so tests
  * are reproducible and the executor-side decode path is exercised for
  * real. */
final class StubDecoder(dim: Int = 8) extends MediaDecoder {
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

/** Codegen bridge for [[DecodeFeaturesExpr]] (static call target). */
object MediaDecodeUtil {
  def decode(decoder: MediaDecoder, kind: UTF8String, content: Array[Byte]): ArrayData =
    ArrayData.toArrayData(decoder.decode(kind.toString, content))
}

/** Media decode as a native expression: (kind, content) → array<float>.
  * The decoder object rides along as a codegen reference, so the multimodal
  * path stays inside WholeStageCodegen — no RDD drop-out, no per-row
  * Row↔InternalRow conversion (the former `rdd.mapPartitions` shape paid
  * both). A heavyweight decoder still amortizes fine: one JVM-wide decoder
  * instance per task, invoked per row like any other expression. */
case class DecodeFeaturesExpr(kind: Expression, content: Expression,
                              decoder: MediaDecoder) extends BinaryExpression {
  override def left: Expression = kind
  override def right: Expression = content
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "decode_features"

  override def nullSafeEval(k: Any, c: Any): Any =
    MediaDecodeUtil.decode(decoder, k.asInstanceOf[UTF8String], c.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dec = ctx.addReferenceObj("decoder", decoder, "graft.ops.MediaDecoder")
    defineCodeGen(ctx, ev, (k, c) => s"graft.ops.MediaDecodeUtil.decode($dec, $k, $c)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecodeFeaturesExpr =
    copy(kind = l, content = r)
}

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

  /** Decode → (media_id, kind, features array<float>), map-only and fully
    * inside WholeStageCodegen via [[DecodeFeaturesExpr]]. Null content is
    * normalized to empty bytes before the (null-intolerant) expression —
    * same decoder contract either way. */
  def decodeFeatures(media: DataFrame, decoder: MediaDecoder = new StubDecoder()): DataFrame = {
    val contentOrEmpty = coalesce(col("content"), lit(Array.emptyByteArray))
    media.select(
      col("media_id").cast("long").as("media_id"),
      col("kind"),
      decodeColumn(col("kind"), contentOrEmpty, decoder).as("features"))
  }

  /** Column form of [[DecodeFeaturesExpr]]. */
  def decodeColumn(kind: Column, content: Column, decoder: MediaDecoder): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DecodeFeaturesExpr(
      ColumnBridge.expression(kind), ColumnBridge.expression(content), decoder))
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
