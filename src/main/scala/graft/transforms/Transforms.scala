package graft.transforms

import graft.types._

/**
 * Canonical 32-bit Murmur3 (x86 variant, seed 0), as pinned by the Iceberg
 * spec for the bucket transform. Spark's own `hash()` is Murmur3 with
 * seed 42 AND different tail-byte handling, so it cannot be reused for
 * cross-writer-compatible bucketing (SURVEY.md §2.5).
 *
 * Public-domain algorithm (Austin Appleby, MurmurHash3.cpp).
 */
object Murmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashBytes(data: Array[Byte], seed: Int = 0): Int = {
    val len = data.length
    var h1 = seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val i4 = i << 2
      var k1 = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    val rem = len & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Iceberg hashes int/long/date/time/timestamp as the little-endian
    * 8-byte encoding of the long value. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    hashBytes(b)
  }

  def hashString(s: String): Int = hashBytes(s.getBytes("UTF-8"))

  /** Decimal: minimal two's-complement big-endian bytes of the unscaled value. */
  def hashDecimal(d: java.math.BigDecimal): Int = hashBytes(d.unscaledValue.toByteArray)

  def hashUuid(u: java.util.UUID): Int = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    hashBytes(bb.array())
  }
}

/**
 * The partition transforms — the only scalar "functions" the reference owns
 * (`lib/iceberg/transforms.rb:12-63`, `ext/iceberg/src/utils.rs:54-91`).
 * Each transform validates its source type (validity matrix asserted by the
 * reference's `test/transforms_test.rb:4-44`), computes a result type, and
 * evaluates on plain JVM values (used for partition tuples and pruning).
 */
sealed trait Transform {
  def name: String
  def canTransform(t: IType): Boolean
  def resultType(t: IType): IType
  /** Evaluate on a raw value of the source type (null → null). */
  def apply(v: Any, sourceType: IType): Any
  override def toString: String = name
}

case object IdentityTransform extends Transform {
  val name = "identity"
  def canTransform(t: IType) = t.isPrimitive
  def resultType(t: IType) = t
  def apply(v: Any, t: IType) = v
}

final case class BucketTransform(n: Int) extends Transform {
  require(n > 0, "bucket count must be positive")
  val name = s"bucket[$n]"
  def canTransform(t: IType): Boolean = t match {
    case IInt | ILong | IDate | ITime | ITimestamp | ITimestampTz |
         ITimestampNano | ITimestampTzNano | IString | IUuid | IBinary => true
    case IDecimal(_, _) | IFixed(_) => true
    case _ => false
  }
  def resultType(t: IType) = IInt
  def apply(v: Any, t: IType): Any = if (v == null) null else (hash(v, t) & Int.MaxValue) % n
  private def hash(v: Any, t: IType): Int = (v, t) match {
    case (i: Int, _) => Murmur3.hashLong(i.toLong)
    case (l: Long, _) => Murmur3.hashLong(l)
    case (s: String, IUuid) => Murmur3.hashUuid(java.util.UUID.fromString(s))
    case (s: String, _) => Murmur3.hashString(s)
    case (d: java.math.BigDecimal, _) => Murmur3.hashDecimal(d)
    case (d: BigDecimal, _) => Murmur3.hashDecimal(d.bigDecimal)
    case (d: java.sql.Date, _) => Murmur3.hashLong(d.toLocalDate.toEpochDay)
    case (d: java.time.LocalDate, _) => Murmur3.hashLong(d.toEpochDay)
    case (ts: java.sql.Timestamp, _) =>
      Murmur3.hashLong(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
    case (i: java.time.Instant, _) =>
      Murmur3.hashLong(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case (ldt: java.time.LocalDateTime, _) =>
      val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
      Murmur3.hashLong(inst.getEpochSecond * 1000000L + inst.getNano / 1000)
    case (b: Array[Byte], _) => Murmur3.hashBytes(b)
    case (u: java.util.UUID, _) => Murmur3.hashUuid(u)
    case (other, tt) => throw new IllegalArgumentException(s"cannot bucket $other: $tt")
  }
}

final case class TruncateTransform(width: Int) extends Transform {
  require(width > 0, "truncate width must be positive")
  val name = s"truncate[$width]"
  def canTransform(t: IType): Boolean = t match {
    case IInt | ILong | IString | IBinary => true
    case IDecimal(_, _) => true
    case _ => false
  }
  def resultType(t: IType) = t
  def apply(v: Any, t: IType): Any = if (v == null) null else v match {
    case i: Int => i - (((i % width) + width) % width)
    case l: Long => l - (((l % width) + width) % width)
    case s: String => if (s.length <= width) s else s.substring(0, width)
    case d: java.math.BigDecimal =>
      val w = java.math.BigInteger.valueOf(width.toLong)
      val unscaled = d.unscaledValue
      val m = unscaled.mod(w) // mod is always non-negative
      new java.math.BigDecimal(unscaled.subtract(m), d.scale)
    case b: Array[Byte] => if (b.length <= width) b else b.take(width)
    case other => throw new IllegalArgumentException(s"cannot truncate $other")
  }
}

sealed abstract class TimeTransform(val name: String) extends Transform {
  def canTransform(t: IType): Boolean = t match {
    case IDate | ITimestamp | ITimestampTz | ITimestampNano | ITimestampTzNano => true
    case _ => false
  }
  def resultType(t: IType) = IInt
  protected def fromLocalDate(d: java.time.LocalDate): Int
  protected def fromLocalDateTime(d: java.time.LocalDateTime): Int
  def apply(v: Any, t: IType): Any = if (v == null) null else v match {
    case d: java.sql.Date => fromLocalDate(d.toLocalDate)
    case d: java.time.LocalDate => fromLocalDate(d)
    case ts: java.sql.Timestamp => fromLocalDateTime(ts.toLocalDateTime)
    case i: java.time.Instant =>
      fromLocalDateTime(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
    case ldt: java.time.LocalDateTime => fromLocalDateTime(ldt)
    case other => throw new IllegalArgumentException(s"cannot apply $name to $other")
  }
}

/** Years since 1970. */
case object YearTransform extends TimeTransform("year") {
  protected def fromLocalDate(d: java.time.LocalDate) = d.getYear - 1970
  protected def fromLocalDateTime(d: java.time.LocalDateTime) = d.getYear - 1970
}
/** Months since 1970-01. */
case object MonthTransform extends TimeTransform("month") {
  protected def fromLocalDate(d: java.time.LocalDate) =
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  protected def fromLocalDateTime(d: java.time.LocalDateTime) =
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
}
/** Days since 1970-01-01. */
case object DayTransform extends TimeTransform("day") {
  protected def fromLocalDate(d: java.time.LocalDate) = d.toEpochDay.toInt
  protected def fromLocalDateTime(d: java.time.LocalDateTime) = d.toLocalDate.toEpochDay.toInt
}
/** Hours since 1970-01-01T00. Not valid on plain dates. */
case object HourTransform extends TimeTransform("hour") {
  override def canTransform(t: IType): Boolean = t match {
    case ITimestamp | ITimestampTz | ITimestampNano | ITimestampTzNano => true
    case _ => false
  }
  protected def fromLocalDate(d: java.time.LocalDate) =
    throw new IllegalArgumentException("hour transform is not valid on date")
  // floorDiv so pre-epoch values agree with the floor()-based write-path
  // column expression (truncating division would disagree and mis-prune)
  protected def fromLocalDateTime(d: java.time.LocalDateTime) =
    Math.floorDiv(d.toEpochSecond(java.time.ZoneOffset.UTC), 3600L).toInt
}

case object VoidTransform extends Transform {
  val name = "void"
  def canTransform(t: IType) = true
  def resultType(t: IType) = t
  def apply(v: Any, t: IType) = null
}

/** Forward-compat placeholder: parse-preserving, value-opaque — the spec
  * treats unknown transforms as producing null on read, so pruning never
  * trusts them. */
final case class UnknownTransform(raw: String) extends Transform {
  val name = raw
  def canTransform(t: IType) = true
  def resultType(t: IType) = IString
  def apply(v: Any, t: IType) = null
}

object Transform {
  private val Bucket = """bucket\[(\d+)\]""".r
  private val Truncate = """truncate\[(\d+)\]""".r

  /** Parse a transform string, accepting the spec forms `bucket[N]` /
    * `truncate[W]` (the reference also accepts class instances — our
    * analogue is constructing the case classes directly). */
  def parse(s: String): Transform = s.trim.toLowerCase match {
    case "identity" => IdentityTransform
    case "year" => YearTransform
    case "month" => MonthTransform
    case "day" => DayTransform
    case "hour" => HourTransform
    case "void" => VoidTransform
    case Bucket(n) => BucketTransform(n.toInt)
    case Truncate(w) => TruncateTransform(w.toInt)
    case other => UnknownTransform(other)
  }
}
