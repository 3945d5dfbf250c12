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
 * frame-sample are per-partition batch operators so a heavier decoder (JNI
 * image lib, ffmpeg pipe) drops in without changing the plan shape.
 *
 * [[JdkMediaDecoder]] decodes REAL pixels/samples with the JDK's built-in
 * codecs: `javax.imageio` reads BMP/PNG/JPEG/GIF/WBMP and
 * `javax.sound.sampled` reads WAV/AIFF/AU PCM — no external codec
 * libraries needed. Video has no JDK codec; it decodes to the zero vector
 * (honestly: the plumbing is identical, the codec is absent from the JVM).
 */
/** A decoder turns one media blob into a fixed-size feature vector.
  * Implementations must be serializable (shipped to executors). Empty and
  * null content are equivalent ("no content"). */
trait MediaDecoder extends Serializable {
  def decode(kind: String, content: Array[Byte]): Array[Float]
}

/** Real JDK-codec decoder. The feature vector is fixed at 5 floats:
  *  - image (ImageIO): [width, height, sumR, sumG, sumB] — per-channel
  *    8-bit sums over all pixels (exact in a float up to ~65k pixels,
  *    which a per-row thumbnail decode stays under; a full-size pipeline
  *    would widen to double sums);
  *  - audio (javax.sound, PCM): [channels, sampleRateHz, frames,
  *    sumAbsFirstChannel, 0] — 16-bit little-endian samples;
  *  - video / unparseable bytes: zeros (no JDK video codec exists).
  * Decoding happens inside the expression on executors; one decoder
  * instance rides the closure per task. */
final class JdkMediaDecoder extends MediaDecoder {
  private val Dim = 5

  def decode(kind: String, content: Array[Byte]): Array[Float] = {
    val out = new Array[Float](Dim)
    if (content == null || content.isEmpty) return out
    try {
      kind match {
        case "image" => decodeImage(content, out)
        case "audio" => decodeAudio(content, out)
        case _ => // video: no JDK codec; zero vector
      }
    } catch { case scala.util.control.NonFatal(_) => java.util.Arrays.fill(out, 0.0f) }
    out
  }

  private def decodeImage(content: Array[Byte], out: Array[Float]): Unit = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null) return // not an image ImageIO recognizes
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y) // sRGB regardless of source layout
        sr += (argb >> 16) & 0xff; sg += (argb >> 8) & 0xff; sb += argb & 0xff
        x += 1
      }
      y += 1
    }
    out(0) = w.toFloat; out(1) = h.toFloat
    out(2) = sr.toFloat; out(3) = sg.toFloat; out(4) = sb.toFloat
  }

  private def decodeAudio(content: Array[Byte], out: Array[Float]): Unit = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      val frameSize = fmt.getFrameSize
      val frames = if (frameSize > 0) bytes.length / frameSize else 0
      var sumAbs = 0L
      if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian) {
        var f = 0
        while (f < frames) { // first channel of each frame
          val i = f * frameSize
          val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
          sumAbs += math.abs(s.toInt)
          f += 1
        }
      }
      out(0) = fmt.getChannels.toFloat; out(1) = fmt.getSampleRate
      out(2) = frames.toFloat; out(3) = sumAbs.toFloat
    } finally in.close()
  }
}

/** Codegen bridge for [[DecodeFeaturesExpr]] (static call target). */
object MediaDecodeUtil {
  def decode(decoder: MediaDecoder, kind: UTF8String, content: Array[Byte]): ArrayData =
    ArrayData.toArrayData(decoder.decode(kind.toString, content))
}

/**
 * Deterministic real-format media fixtures. `bmpForId` emits a VALID
 * 24-bit uncompressed BMP (bottom-up rows, 4-byte row padding) whose
 * logical pixel bytes follow a closed-form formula an SQL oracle can
 * replicate without a codec:
 *
 *   width  = id % 6 + 3,  height = id % 4 + 2
 *   value(idx) = (id*31 + idx*7) % 256  where idx = (y*width + x)*3 + c,
 *   c = 0/1/2 for R/G/B, y = 0 at the TOP row (the encoder handles BMP's
 *   bottom-up storage; decoders see top-down logical pixels).
 *
 * So `decode → [w, h, sumR, sumG, sumB]` is exactly reproducible as
 * integer arithmetic — the decoder is oracled end-to-end, not trusted.
 */
object MediaFixtures {
  def widthFor(id: Long): Int = (Math.floorMod(id, 6L) + 3L).toInt
  def heightFor(id: Long): Int = (Math.floorMod(id, 4L) + 2L).toInt

  /** Logical channel value at (x, y, c), top-down row order. */
  def channelValue(id: Long, w: Int, x: Int, y: Int, c: Int): Int =
    Math.floorMod(id * 31L + ((y.toLong * w + x) * 3L + c) * 7L, 256L).toInt

  def bmpForId(id: Long): Array[Byte] = bmpForIdScaled(id, 1)

  /** The same logical image as [[bmpForId]] upscaled `scale`× by pixel
    * duplication (nearest-neighbor): pixel'(x, y, c) =
    * channelValue(id, w, x/scale, y/scale, c). Bytes differ from the
    * original at every resolution, but any sampling grid that floors
    * coordinates sees the identical pixel values — the planted
    * "perceptual duplicate" for m42. */
  def bmpForIdScaled(id: Long, scale: Int): Array[Byte] =
    bmpForIdBumped(id, scale, Array.emptyIntArray)

  /** [[bmpForIdScaled]] with the pixels SAMPLED by the given 8×8
    * average-hash grid cells forced to white — the planted NEAR-MISS
    * perceptual duplicate for m43: at `scale >= 8 / min(w0, h0)` (scale 4
    * covers every fixture size) each grid cell samples a DISTINCT pixel,
    * so a bumped cell's bit is forced to 1 while every other cell keeps
    * its base sample; only the changed mean can flip other (borderline)
    * bits. The resulting hash is a few bits from the original — invisible
    * to exact-hash equality, found by the Hamming band join. */
  def bmpForIdBumped(id: Long, scale: Int, bumpCells: Array[Int]): Array[Byte] = {
    val w0 = widthFor(id); val h0 = heightFor(id)
    val w = w0 * scale; val h = h0 * scale
    // scaled positions the hash grid samples for the bumped cells
    val bumped = bumpCells.map(i => ((i % 8) * w / 8, (i / 8) * h / 8)).toSet
    val rowStride = (w * 3 + 3) & ~3 // each pixel row padded to 4 bytes
    val dataSize = rowStride * h
    val fileSize = 54 + dataSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER (14 bytes)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    // BITMAPINFOHEADER (40 bytes): positive height = bottom-up pixel rows
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1 // bottom-up: last logical row first
    while (row >= 0) {
      var x = 0
      while (x < w) { // BMP stores BGR
        if (bumped.contains((x, row))) {
          buf.put(255.toByte).put(255.toByte).put(255.toByte)
        } else {
          buf.put(channelValue(id, w0, x / scale, row / scale, 2).toByte)
          buf.put(channelValue(id, w0, x / scale, row / scale, 1).toByte)
          buf.put(channelValue(id, w0, x / scale, row / scale, 0).toByte)
        }
        x += 1
      }
      var pad = rowStride - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row -= 1
    }
    buf.array()
  }

  /** Synthetic 16-bit mono little-endian WAV (8 kHz, 1600 samples):
    * sample `i` belongs to the 100-sample block `b = i / 100`; blocks
    * with `(b + id) % 3 == 0` are SILENT (all zeros), other samples are
    * `(id*31 + i*7) % 2000 − 1000` — deterministic integer PCM an SQL
    * oracle recomputes exactly (WAV stores raw PCM after the 44-byte
    * header, and the decoder reads it back bit-for-bit). */
  def wavForId(id: Long): Array[Byte] = wavForIdGain(id, 1)

  /** [[wavForId]] with every PCM sample multiplied by `gain` — the
    * volume-changed re-encode of the same recording (|sample| ≤ 1000, so
    * gains up to 32 never clip 16-bit). Positive gain preserves every
    * sample-magnitude comparison, which is exactly the invariance the
    * energy-envelope fingerprint claims. */
  def wavForIdGain(id: Long, gain: Int): Array[Byte] = {
    require(gain >= 1 && gain <= 32, s"gain must be in [1, 32], got $gain")
    val sampleRate = 8000
    val n = 1600
    val dataBytes = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)             // PCM
      .putShort(1)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)  // byte rate
      .putShort(2)             // block align
      .putShort(16)            // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) {
      val silent = Math.floorMod(i / 100 + id, 3L) == 0L
      val s =
        if (silent) 0
        else (Math.floorMod(id * 31L + i * 7L, 2000L) - 1000L).toInt * gain
      buf.putShort(s.toShort)
      i += 1
    }
    buf.array()
  }

  /** A synthetic fixed-frame-size "video": `scenes × framesPerScene`
    * concatenated BMP frames. All frames share one geometry (scene base
    * ids step by 12 = lcm(6, 4), so width/height never change — the
    * fixed-size-frame container the slicing in `videoSceneCuts` assumes),
    * and frames WITHIN a scene are identical while scene boundaries
    * switch to a different deterministic image. Frame f's image id is
    * `id + (f / framesPerScene) * 12` — exactly reproducible by an SQL
    * oracle via [[channelValue]]. */
  def videoForId(id: Long, scenes: Int, framesPerScene: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var s = 0
    while (s < scenes) {
      val frame = bmpForId(id + s * 12L)
      var f = 0
      while (f < framesPerScene) { out.write(frame); f += 1 }
      s += 1
    }
    out.toByteArray
  }
}

/** Static call targets for the image perceptual hash. */
object MediaAHashUtil {
  /** 64-bit average-hash over an 8×8 nearest-neighbor downsample of the
    * DECODED image (javax.imageio — real codec, not the fixture formula):
    * integer grayscale g1000 = 299·R + 587·G + 114·B at the 64 grid
    * samples (sx = gx·w/8 floor), bit i set iff 64·g1000ᵢ > Σ g1000
    * (strict, ties → 0). All-integer, so an SQL oracle reproduces the
    * partition into equal-hash groups exactly; invariant to uniform
    * brightness/contrast-preserving rescales and to nearest-neighbor
    * upscaling (floor(floor(s·a)/s) = floor(a)). Null for undecodable
    * bytes. */
  def aHash64(content: Array[Byte]): java.lang.Long = {
    if (content == null || content.isEmpty) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    val g = new Array[Long](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val sx = (i % 8) * w / 8
      val sy = (i / 8) * h / 8
      val argb = img.getRGB(sx, sy)
      val v = 299L * ((argb >> 16) & 0xff) + 587L * ((argb >> 8) & 0xff) +
        114L * (argb & 0xff)
      g(i) = v; sum += v
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (64L * g(i) > sum) hash |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  def aHashOrNull(kind: UTF8String, content: Array[Byte]): java.lang.Long =
    if (kind == null || kind.toString != "image") null else aHash64(content)
}

/** Static call targets for image resampling. */
object MediaImageUtil {
  /** Decode through the real codec (javax.imageio) and box-filter by
    * averaging each `factor`×`factor` pixel block per RGB channel with
    * TRUNCATING integer division (matches SQL `//` on the non-negative
    * channel sums); trailing partial rows/columns are dropped (no
    * partial blocks). Output is the row-major `(y, x, c∈{R,G,B})`
    * channel-value array of the `w/factor × h/factor` result. Null for
    * undecodable bytes. */
  def boxDownsample(content: Array[Byte], factor: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (content == null || content.isEmpty || factor < 1) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    val w2 = w / factor; val h2 = h / factor
    val n = factor.toLong * factor
    val out = new Array[Long](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        var r = 0L; var g = 0L; var b = 0L
        var dy = 0
        while (dy < factor) {
          var dx = 0
          while (dx < factor) {
            val argb = img.getRGB(x * factor + dx, y * factor + dy)
            r += (argb >> 16) & 0xff
            g += (argb >> 8) & 0xff
            b += argb & 0xff
            dx += 1
          }
          dy += 1
        }
        val base = (y * w2 + x) * 3
        out(base) = r / n; out(base + 1) = g / n; out(base + 2) = b / n
        x += 1
      }
      y += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `image_box_downsample(content, factor)`: decode through the real image
  * codec and shrink by a truncating `factor`×`factor` block average per
  * RGB channel — anti-aliased resize, the thumbnail/preprocess step an
  * image pipeline runs before feature extraction. All-integer, so an SQL
  * oracle replays every output channel value from known pixels. */
case class ImageBoxDownsampleExpr(child: Expression, factor: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "image_box_downsample"

  override def nullSafeEval(c: Any): Any =
    MediaImageUtil.boxDownsample(c.asInstanceOf[Array[Byte]], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("shrunk")
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData $d =
         |  graft.ops.MediaImageUtil.boxDownsample($c, $factor);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): ImageBoxDownsampleExpr =
    copy(child = c)
}

/** `image_ahash(kind, content)` as a native codegen expression — the
  * perceptual-hash mirror of [[DecodeFeaturesExpr]]: real codec decode on
  * executors, inside WholeStageCodegen, null for non-image kinds and
  * undecodable bytes. */
/** Static call targets for audio frame analysis. */
object MediaAudioUtil {
  /** Per-frame Σ|sample| over the FIRST channel of a decoded audio blob
    * (javax.sound — real codec, not the fixture formula), `frameSamples`
    * samples per frame, trailing partial frame dropped. All-integer, so
    * an SQL oracle reproduces the energies exactly from known PCM. Null
    * for undecodable bytes / non-16-bit-LE formats. */
  def frameEnergies(content: Array[Byte],
                    frameSamples: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (content == null || content.isEmpty) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return null
        val bytes = in.readAllBytes()
        val frameSize = fmt.getFrameSize
        val samples = if (frameSize > 0) bytes.length / frameSize else 0
        val nFrames = samples / frameSamples
        val out = new Array[Long](nFrames)
        var f = 0
        while (f < nFrames) {
          var sum = 0L
          var k = 0
          while (k < frameSamples) {
            val i = (f * frameSamples + k) * frameSize
            val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            sum += math.abs(s.toInt)
            k += 1
          }
          out(f) = sum
          f += 1
        }
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(out)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Decode 16-bit LE PCM and average consecutive `factor`-sample groups
    * with TRUNCATING integer division (matches SQL `//`); trailing
    * partial group dropped. Null on codec/format mismatch, like
    * [[frameEnergies]]. */
  def decimate(content: Array[Byte],
               factor: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (content == null || content.isEmpty || factor < 1) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return null
        val bytes = in.readAllBytes()
        val frameSize = fmt.getFrameSize
        val samples = if (frameSize > 0) bytes.length / frameSize else 0
        val nOut = samples / factor
        val out = new Array[Long](nOut)
        var j = 0
        while (j < nOut) {
          var sum = 0L
          var k = 0
          while (k < factor) {
            val i = (j * factor + k) * frameSize
            sum += ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toLong
            k += 1
          }
          out(j) = sum / factor // truncating, like SQL //
          j += 1
        }
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(out)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}

/** `audio_decimate(content, factor)`: decode 16-bit little-endian PCM
  * through the real codec and decimate by averaging each consecutive
  * `factor`-sample group — TRUNCATING division (Java `/`, DuckDB `//`),
  * so an integer SQL oracle replays every output sample. The tail
  * group shorter than `factor` is dropped (no partial averages). */
case class AudioDecimateExpr(child: Expression, factor: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "audio_decimate"

  override def nullSafeEval(c: Any): Any =
    MediaAudioUtil.decimate(c.asInstanceOf[Array[Byte]], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("decimated")
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData $d =
         |  graft.ops.MediaAudioUtil.decimate($c, $factor);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): AudioDecimateExpr =
    copy(child = c)
}

/** `audio_frame_energies(content)`: per-frame Σ|sample| through the real
  * audio codec — the map-only front half of silence/VAD segmentation. */
case class AudioFrameEnergiesExpr(child: Expression, frameSamples: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "audio_frame_energies"

  override def nullSafeEval(c: Any): Any =
    MediaAudioUtil.frameEnergies(c.asInstanceOf[Array[Byte]], frameSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val e = ctx.freshName("energies")
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.sql.catalyst.util.ArrayData $e =
         |  graft.ops.MediaAudioUtil.frameEnergies($c, $frameSamples);
         |if ($e == null) { ${ev.isNull} = true; } else { ${ev.value} = $e; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): AudioFrameEnergiesExpr =
    copy(child = c)
}

/** `synthetic_wav(id)`: [[MediaFixtures.wavForIdGain]] as a codegen'd
  * column (`gain` = 1 is the base fixture). */
case class SyntheticWavExpr(child: Expression, gain: Int = 1)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synthetic_wav"
  override def nullSafeEval(id: Any): Any =
    MediaFixtures.wavForIdGain(id.asInstanceOf[Long], gain)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.ops.MediaFixtures.wavForIdGain($id, $gain)")
  override protected def withNewChildInternal(c: Expression): SyntheticWavExpr =
    copy(child = c)
}

case class ImageAHashExpr(kind: Expression, content: Expression)
    extends BinaryExpression {
  override def left: Expression = kind
  override def right: Expression = content
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_ahash"

  override def nullSafeEval(k: Any, c: Any): Any =
    MediaAHashUtil.aHashOrNull(k.asInstanceOf[UTF8String], c.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hash = ctx.freshName("ahash")
    nullSafeCodeGen(ctx, ev, (k, c) => {
      s"""java.lang.Long $hash = graft.ops.MediaAHashUtil.aHashOrNull($k, $c);
         |if ($hash == null) { ${ev.isNull} = true; } else { ${ev.value} = $hash.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ImageAHashExpr =
    copy(kind = l, content = r)
}

/** `synthetic_bmp(id)` as a native codegen expression: long → BMP bytes.
  * Fixture generation stays inside WholeStageCodegen like the decode. */
case class SyntheticBmpExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synthetic_bmp"
  override def nullSafeEval(id: Any): Any = MediaFixtures.bmpForId(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.ops.MediaFixtures.bmpForId($id)")
  override protected def withNewChildInternal(c: Expression): SyntheticBmpExpr = copy(child = c)
}

/** `synthetic_video(id)`: [[MediaFixtures.videoForId]] as a codegen'd
  * column — one fixed-frame-size multi-scene BMP concatenation per row. */
case class SyntheticVideoExpr(child: Expression, scenes: Int, framesPerScene: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synthetic_video"
  override def nullSafeEval(id: Any): Any =
    MediaFixtures.videoForId(id.asInstanceOf[Long], scenes, framesPerScene)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      id => s"graft.ops.MediaFixtures.videoForId($id, $scenes, $framesPerScene)")
  override protected def withNewChildInternal(c: Expression): SyntheticVideoExpr =
    copy(child = c)
}

/** `synthetic_bmp_scaled(id)`: the `scale`× pixel-duplication upscale of
  * [[SyntheticBmpExpr]]'s image — different bytes, same logical picture. */
case class SyntheticBmpScaledExpr(child: Expression, scale: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synthetic_bmp_scaled"
  override def nullSafeEval(id: Any): Any =
    MediaFixtures.bmpForIdScaled(id.asInstanceOf[Long], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.ops.MediaFixtures.bmpForIdScaled($id, $scale)")
  override protected def withNewChildInternal(c: Expression): SyntheticBmpScaledExpr =
    copy(child = c)
}

/** `synthetic_bmp_bumped(id)`: the scaled upscale with chosen hash-grid
  * sample pixels forced white — the planted near-miss re-encode for m43. */
case class SyntheticBmpBumpedExpr(child: Expression, scale: Int, cells: Seq[Int])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cells.size <= graft.functions.RefObjCaps.MaxBumpCells,
    s"bump cells ${cells.size} exceed plan-embed cap " +
      s"${graft.functions.RefObjCaps.MaxBumpCells}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "synthetic_bmp_bumped"
  private val cellsArr = cells.toArray
  override def nullSafeEval(id: Any): Any =
    MediaFixtures.bmpForIdBumped(id.asInstanceOf[Long], scale, cellsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bumpCells", cellsArr, "int[]")
    defineCodeGen(ctx, ev,
      id => s"graft.ops.MediaFixtures.bmpForIdBumped($id, $scale, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): SyntheticBmpBumpedExpr =
    copy(child = c)
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

  /** Real-format image corpus: one valid BMP per row of `docs`, generated
    * by [[MediaFixtures.bmpForId]] (deterministic pixels an SQL oracle can
    * recompute). Map-only, fully codegen. */
  def syntheticImageCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val id = col(idCol).cast("long")
    docs.select(
      id.as("media_id"),
      lit("image").as("kind"),
      ColumnBridge.column(SyntheticBmpExpr(ColumnBridge.expression(id))).as("content"),
      struct(
        (pmod(id, lit(6)) + 3).cast("int").as("width"),
        (pmod(id, lit(4)) + 2).cast("int").as("height"),
        lit("bmp").as("format")).as("meta"))
  }

  /** [[syntheticImageCorpus]] upscaled `scale`× by pixel duplication, with
    * `media_id = id + idOffset` — the planted perceptual duplicates for
    * [[imageNearDup]]: byte-different, picture-identical. */
  def syntheticImageCorpusScaled(docs: DataFrame, idCol: String, scale: Int,
                                 idOffset: Long): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val id = col(idCol).cast("long")
    docs.select(
      (id + idOffset).as("media_id"),
      lit("image").as("kind"),
      ColumnBridge.column(SyntheticBmpScaledExpr(ColumnBridge.expression(id), scale))
        .as("content"),
      struct(
        ((pmod(id, lit(6)) + 3) * scale).cast("int").as("width"),
        ((pmod(id, lit(4)) + 2) * scale).cast("int").as("height"),
        lit("bmp").as("format")).as("meta"))
  }

  /** [[syntheticImageCorpusScaled]] with the pixels sampled by `cells`
    * forced white ([[MediaFixtures.bmpForIdBumped]]) — planted NEAR-MISS
    * perceptual duplicates: a few ahash bits away from the original. */
  def syntheticImageCorpusBumped(docs: DataFrame, idCol: String, scale: Int,
                                 idOffset: Long, cells: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val id = col(idCol).cast("long")
    docs.select(
      (id + idOffset).as("media_id"),
      lit("image").as("kind"),
      ColumnBridge.column(SyntheticBmpBumpedExpr(
        ColumnBridge.expression(id), scale, cells)).as("content"),
      struct(
        ((pmod(id, lit(6)) + 3) * scale).cast("int").as("width"),
        ((pmod(id, lit(4)) + 2) * scale).cast("int").as("height"),
        lit("bmp").as("format")).as("meta"))
  }

  /** (media_id, kind, ahash): [[MediaAHashUtil.aHash64]] over the decoded
    * image — map-only, fully codegen; NULL ahash for non-images and
    * undecodable bytes. */
  def imageAHash(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val contentOrEmpty = coalesce(col("content"), lit(Array.emptyByteArray))
    media.select(
      col("media_id").cast("long").as("media_id"),
      col("kind"),
      ColumnBridge.column(ImageAHashExpr(
        ColumnBridge.expression(col("kind")),
        ColumnBridge.expression(contentOrEmpty))).as("ahash"))
  }

  /** Perceptual image near-dup: images whose 64-bit average-hash matches an
    * earlier image (min media_id per hash group is canonical) — catches
    * byte-different re-encodes/upscales that exact content hashing misses.
    * Output: (keep_id, dup_id) pairs, one per duplicate.
    *
    * 100 TB design: exactly the d30 exact-dedup shape — hash is computed
    * map-side next to the decode (images never ride a shuffle; 8 bytes per
    * image do), first-occurrence is a combinable min per hash, and dups
    * emerge from an equi-join on the hash. The hash subtree appears on
    * both join sides, so a one-shot call DECODES TWICE — at scale,
    * persist [[imageAHash]]'s output once (the e52 `encodeBinary` / e47
    * index argument: 16 bytes a row) and feed the join from the stored
    * column; the decode then happens exactly once per corpus ever.
    * Near-miss (Hamming ≤ r) matching is [[imageNearDupPairs]]. */
  def imageNearDup(media: DataFrame): DataFrame = {
    val hashed = imageAHash(media).where(col("ahash").isNotNull)
    val firsts = hashed.groupBy("ahash")
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("n"))
      .where(col("n") > 1)
    // SHUFFLE_HASH, firsts as build (the duplicateSpans argument — an
    // implicit broadcast at small scale serialized this join onto the
    // input partitions, 3x at sf1; SCALE.md r12)
    hashed.join(firsts.hint("shuffle_hash"), Seq("ahash"))
      .where(col("media_id") =!= col("keep_id"))
      .select(col("keep_id"), col("media_id").as("dup_id"))
  }

  /** NEAR-MISS perceptual image dedup: pairs of images whose 64-bit
    * average-hashes are within `maxHamming` bits — catches re-encodes
    * that shift a few grid cells (quality changes, small edits) where
    * [[imageNearDup]]'s exact-hash equality misses them. Output:
    * (id_a, id_b, hamming), id_a < id_b.
    *
    * 100 TB design: the d35 SimHash machinery over the ahash column —
    * hashes computed map-side next to the decode (images never ride a
    * shuffle; 8 bytes per image do), then [[DedupOps.hamming64Pairs]]'
    * 4×16-bit band join, EXACT at `maxHamming <= 3` by pigeonhole. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame = {
    val hashed = imageAHash(media).where(col("ahash").isNotNull)
      .select(col("media_id").as("doc_id"), col("ahash").as("sim"))
    DedupOps.hamming64Pairs(hashed, maxHamming, maxBucket)
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

  /** Decode → (media_id, kind, features array<float>), map-only and fully
    * inside WholeStageCodegen via [[DecodeFeaturesExpr]]. Null content is
    * normalized to empty bytes before the (null-intolerant) expression —
    * same decoder contract either way. */
  def decodeFeatures(media: DataFrame, decoder: MediaDecoder = new JdkMediaDecoder()): DataFrame = {
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

  /** Real-format "video" corpus: one fixed-frame-size multi-scene BMP
    * concatenation per row of `docs` ([[MediaFixtures.videoForId]] —
    * deterministic pixels an SQL oracle can recompute). Map-only, fully
    * codegen. */
  def syntheticVideoCorpus(docs: DataFrame, idCol: String, scenes: Int,
                           framesPerScene: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val id = col(idCol).cast("long")
    docs.select(
      id.as("media_id"),
      lit("video").as("kind"),
      ColumnBridge.column(SyntheticVideoExpr(ColumnBridge.expression(id),
        scenes, framesPerScene)).as("content"),
      struct(
        (pmod(id, lit(6)) + 3).cast("int").as("width"),
        (pmod(id, lit(4)) + 2).cast("int").as("height"),
        lit("bmpseq").as("format")).as("meta"))
  }

  /**
   * Scene-cut detection over fixed-frame-size video blobs: slice each blob
   * into `nFrames` equal frames, perceptual-hash every frame through the
   * REAL image codec ([[MediaAHashUtil.aHash64]]), and emit a cut wherever
   * consecutive frames' hashes differ by ≥ `minHamming` bits — the
   * classic hash-difference shot-boundary detector.
   *
   * 100 TB design: slicing + per-frame hashing is MAP-ONLY (the frame
   * explode multiplies rows, never shuffles, and only 8 hash bytes per
   * frame survive the projection — pixels never ride a shuffle). The
   * consecutive-frame comparison windows per `media_id` ordered by
   * `frame_no` — state bounded by frames-per-video, never the corpus; a
   * corpus-wide sort never happens because the hash pass already dropped
   * the payload. A real container format swaps the equal-size slice for a
   * parser expression; everything downstream is format-agnostic.
   *
   * Output: (media_id, frame_no, hamming) — one row per detected cut
   * (frame_no = first frame of the new scene).
   */
  def videoSceneCuts(media: DataFrame, nFrames: Int,
                     minHamming: Int = 1): DataFrame = {
    require(nFrames >= 2, s"nFrames must be >= 2, got $nFrames")
    val hashed = frameHashes(media, nFrames)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_no")
    hashed
      .withColumn("prev", lag(col("ahash"), 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("hamming", bit_count(col("ahash").bitwiseXOR(col("prev"))))
      .where(col("hamming") >= minHamming)
      .select(col("media_id"), col("frame_no"), col("hamming"))
  }

  /** Equal-size frame slicing + per-frame perceptual hash — the map-only
    * head shared by [[videoSceneCuts]] and [[videoNearDupPairs]]: only
    * 8 hash bytes per frame survive the projection, pixels never ride a
    * shuffle. Undecodable frames hash to null. */
  private def frameHashes(media: DataFrame, nFrames: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val frames = expr(
      s"""transform(sequence(0, ${nFrames - 1}),
         |  f -> substring(content, f * (length(content) div $nFrames) + 1,
         |                 length(content) div $nFrames))""".stripMargin)
    media
      .select(col("media_id"), posexplode(frames).as(Seq("frame_no", "frame")))
      .select(col("media_id"), col("frame_no"),
        ColumnBridge.column(ImageAHashExpr(
          ColumnBridge.expression(lit("image")),
          ColumnBridge.expression(col("frame")))).as("ahash"))
  }

  /**
   * Video near-duplicate pairs by frame-fingerprint overlap: two videos
   * pair when they share at least `minShared` DISTINCT frame hashes —
   * the re-upload/trim/re-encode dedup signal for video corpora (a
   * trimmed copy keeps most of the original's frames; a different video
   * shares none). The set-overlap analogue of the winnowing overlap
   * join (d71), at video granularity.
   *
   * 100 TB design: per-video hashing is the map-only [[frameHashes]]
   * head; the overlap join carries (media_id, 8-byte hash) rows only.
   * Frame hashes appearing in more than `maxFrameDf` videos are dropped
   * BEFORE the self-join — a black/title-card frame shared by half the
   * corpus is no near-dup evidence (the BM25 `maxDf` stopword argument)
   * and would otherwise go quadratic in that bucket.
   *
   * Output: (id_a, id_b, n_shared) with id_a < id_b.
   */
  def videoNearDupPairs(media: DataFrame, nFrames: Int, minShared: Int = 2,
                        maxFrameDf: Int = 1000): DataFrame = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    require(minShared >= 1 && maxFrameDf >= 1,
      s"minShared/maxFrameDf must be >= 1, got $minShared/$maxFrameDf")
    val fh = frameHashes(media, nFrames)
      .where(col("ahash").isNotNull)
      .select("media_id", "ahash").distinct()
    val rare = fh.groupBy("ahash").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxFrameDf).select("ahash")
    val pruned = fh.join(rare, Seq("ahash"))
    pruned.as("a").join(pruned.hint("shuffle_hash").as("b"), Seq("ahash"))
      .where(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Real-format audio corpus: one valid 16-bit PCM WAV per row of `docs`
    * ([[MediaFixtures.wavForId]] — deterministic samples an SQL oracle can
    * recompute). Map-only, fully codegen. */
  def syntheticAudioCorpus(docs: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val id = col(idCol).cast("long")
    docs.select(
      id.as("media_id"),
      lit("audio").as("kind"),
      ColumnBridge.column(SyntheticWavExpr(ColumnBridge.expression(id))).as("content"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit("wav").as("format")).as("meta"))
  }

  /**
   * Audio downsampling: decode through the REAL codec and decimate by
   * averaging each consecutive `factor`-sample group — the sample-rate
   * reduction (e.g. 16 kHz → 8 kHz at factor 2) every speech pipeline
   * runs before feature extraction. Averaging-then-decimating is the
   * box-filter anti-alias (a bare take-every-Nth aliases high
   * frequencies into band); division TRUNCATES like SQL `//`, so an
   * integer oracle replays every output sample. Map-only codegen: PCM
   * never leaves its task — output is the decimated sample array.
   *
   * Output: (media_id, samples array<bigint>).
   */
  def audioDownsample(media: DataFrame, factor: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(factor >= 1, s"factor must be >= 1, got $factor")
    media.select(col("media_id"),
      ColumnBridge.column(AudioDecimateExpr(
        ColumnBridge.expression(
          coalesce(col("content"), lit(Array.emptyByteArray))),
        factor)).as("samples"))
  }

  /**
   * Image downsampling: decode through the REAL codec and shrink by a
   * `factor`×`factor` box filter — the anti-aliased thumbnail/resize
   * every image pipeline runs before feature extraction (block
   * averaging is the box anti-alias; bare subsampling aliases). Per-RGB
   * truncating integer division matches SQL `//` (channel sums are
   * non-negative), so an integer oracle replays every output value.
   * Map-only codegen: pixels never leave their task — output is the
   * row-major channel-value array of the shrunk image.
   *
   * Output: (media_id, pixels array<bigint>).
   */
  def imageDownsample(media: DataFrame, factor: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(factor >= 1, s"factor must be >= 1, got $factor")
    media.select(col("media_id"),
      ColumnBridge.column(ImageBoxDownsampleExpr(
        ColumnBridge.expression(
          coalesce(col("content"), lit(Array.emptyByteArray))),
        factor)).as("pixels"))
  }

  /**
   * Silence/VAD segmentation over audio blobs: decode through the REAL
   * codec ([[MediaAudioUtil.frameEnergies]]), call a frame silent when its
   * Σ|sample| ≤ `maxSilenceEnergy`, and merge consecutive same-state
   * frames into segments — the trim/split primitive speech pipelines run
   * before transcription or training-chunk extraction.
   *
   * 100 TB design: decode + per-frame energy is ONE map-only codegen
   * expression per blob (pixels→samples never leave the task; only
   * 8 bytes per frame survive into the explode). The islands merge
   * windows per `media_id` ordered by `frame_no` — state bounded by
   * frames-per-clip, never the corpus.
   *
   * Output: (media_id, seg_no, silent, start_frame, n_frames, energy) —
   * seg_no 0-based per clip, energy = Σ over the segment's frames.
   */
  def audioSilenceSegments(media: DataFrame, frameSamples: Int = 100,
                           maxSilenceEnergy: Long = 0L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    val energies = ColumnBridge.column(AudioFrameEnergiesExpr(
      ColumnBridge.expression(coalesce(col("content"), lit(Array.emptyByteArray))),
      frameSamples))
    val frames = media
      .select(col("media_id"), posexplode(energies).as(Seq("frame_no", "energy")))
      .withColumn("silent", col("energy") <= maxSilenceEnergy)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_no")
    frames
      .withColumn("__chg",
        when(lag(col("silent"), 1).over(w).isNull ||
          lag(col("silent"), 1).over(w) =!= col("silent"), 1).otherwise(0))
      .withColumn("seg_no", sum(col("__chg")).over(w) - 1)
      .groupBy("media_id", "seg_no")
      .agg(first(col("silent")).as("silent"),
        min(col("frame_no")).as("start_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("energy"))
      .select(col("media_id"), col("seg_no"), col("silent"),
        col("start_frame"), col("n_frames"), col("energy"))
  }

  /** [[syntheticAudioCorpus]] re-encoded at `gain`× volume and re-keyed by
    * `idOffset` — the planted same-recording-different-master copy for the
    * m46 oracle (gain preserves every sample comparison, so the energy
    * fingerprint is identical by construction). */
  def syntheticAudioCorpusGain(docs: DataFrame, idCol: String, gain: Int,
                               idOffset: Long): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val id = col(idCol).cast("long")
    docs.select(
      (id + idOffset).as("media_id"),
      lit("audio").as("kind"),
      ColumnBridge.column(SyntheticWavExpr(ColumnBridge.expression(id), gain))
        .as("content"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit("wav").as("format")).as("meta"))
  }

  /**
   * Energy-envelope acoustic fingerprint — the time-domain form of the
   * Haitsma–Kallman sign-of-band-energy-difference fingerprint: frame the
   * clip, take Σ|sample| per frame through the REAL codec, and set bit
   * `f` iff `energy(f+1) > energy(f)`. The bits depend only on the SHAPE
   * of the loudness envelope, so any positive remaster gain (the most
   * common audio re-encode difference) yields the identical fingerprint;
   * integer-exact end to end, so an SQL oracle rebuilds every bit.
   *
   * Output: (media_id, n_frames, fp) for decodable clips of 2..64 frames
   * (bits need `n_frames − 1 ≤ 63`; frame undecodable/oversized clips are
   * dropped, mirroring [[imageAHash]]'s null contract).
   *
   * 100 TB design: decode → energies → bit-fold is ONE map-only codegen
   * chain per blob; 8 bytes per clip survive it. No shuffle here at all —
   * pairing cost lives entirely in [[audioNearDupPairs]]' band join.
   */
  def audioEnergyFingerprint(media: DataFrame, frameSamples: Int = 25): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    val energies = ColumnBridge.column(AudioFrameEnergiesExpr(
      ColumnBridge.expression(coalesce(col("content"), lit(Array.emptyByteArray))),
      frameSamples))
    media
      .select(col("media_id"), energies.as("__e"))
      .where(size(col("__e")).between(2, 64))
      .select(col("media_id"),
        size(col("__e")).as("n_frames"),
        aggregate(sequence(lit(0), size(col("__e")) - 2), lit(0L),
          (acc, f) => acc + when(
            element_at(col("__e"), f + 2) > element_at(col("__e"), f + 1),
            call_function("shiftleft", lit(1L), f)).otherwise(0L)).as("fp"))
  }

  /** Near-duplicate audio pairs over the energy-envelope fingerprint:
    * [[DedupOps.hamming64Pairs]]' 4×16-bit band join, EXACT at
    * `maxHamming <= 3` by pigeonhole. Clips never ride the shuffle — the
    * 8-byte fingerprints do. Volume-changed copies collide at Hamming 0;
    * clips with a few reshaped frames land within the radius. */
  def audioNearDupPairs(media: DataFrame, frameSamples: Int = 25,
                        maxHamming: Int = 3,
                        maxBucket: Int = DedupOps.DefaultMaxBucket): DataFrame = {
    val fp = audioEnergyFingerprint(media, frameSamples)
      .select(col("media_id").as("doc_id"), col("fp").as("sim"))
    DedupOps.hamming64Pairs(fp, maxHamming, maxBucket)
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
