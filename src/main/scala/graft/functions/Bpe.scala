package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-pair-encoding tokenizer: greedy merge training (Sennrich et al.,
 * "Neural Machine Translation of Rare Words with Subword Units" — the
 * standard public BPE recipe) and rank-based inference. Real subword
 * token counts are what a training-data pipeline budgets by — whitespace
 * token counts undercount code/CJK/URLs badly.
 */
object BpeUtil {

  /** End-of-word marker symbol (its own symbol, merged like any other). */
  val EndOfWord = "</w>"

  /** Train `numMerges` merges from word frequencies. Deterministic:
    * highest pair count wins, ties break on the lexicographically
    * smallest (left, right) pair. Stops early when no pair repeats. */
  def train(wordFreq: Map[String, Long], numMerges: Int): Array[(String, String)] = {
    var seqs: Vector[(Array[String], Long)] = wordFreq.toVector.sortBy(_._1)
      .map { case (w, f) =>
        (w.map(_.toString).toArray :+ EndOfWord, f)
      }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2) done = true // nothing repeats; more merges are noise
        else {
          val (a, b) = best._1
          merges += ((a, b))
          seqs = seqs.map { case (syms, f) => (mergePair(syms, a, b), f) }
          m += 1
        }
      }
    }
    merges.result().toArray
  }

  /** All non-overlapping left-to-right occurrences of (a, b) merge. */
  private def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word: start from characters + [[EndOfWord]], repeatedly
    * merge the LOWEST-RANK adjacent pair present (all its occurrences,
    * left to right) until no ranked pair remains — standard BPE
    * inference. */
  def encodeWord(word: String,
                 ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    var running = syms.length > 1
    while (running) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) running = false
      else syms = mergePair(syms, bestA, bestB)
    }
    syms
  }

  /** Whitespace-split then per-word encode, flattened. The per-task word
    * cache exploits the Zipfian word distribution — most probes hit. */
  def encodeText(text: UTF8String,
                 ranks: java.util.HashMap[String, Integer],
                 cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]],
                 cacheCap: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val trimmed = text.toString.trim
    if (trimmed.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val words = trimmed.split("\\s+")
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var subs = cache.get(w)
      if (subs == null) {
        subs = encodeWord(w, ranks)
        if (cache.size >= cacheCap) cache.clear()
        cache.put(w, subs)
      }
      var j = 0
      while (j < subs.length) {
        out += UTF8String.fromString(subs(j))
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }
}

/** `bpe_encode(text)`: BPE subword tokens as `array<string>` — the merge
  * ranks ride the serialized plan as one shared reference object (the
  * trained model is `numMerges` pairs, bounded by construction), the
  * per-task word cache turns the Zipfian head into hash probes. Map-only
  * and stream-safe, like [[LmAvgLogP]]. */
case class BpeEncode(child: Expression, mergesA: Array[String],
                     mergesB: Array[String])
    extends UnaryExpression {
  require(mergesA.length == mergesB.length, "merge arrays length mismatch")
  require(mergesA.length <= RefObjCaps.MaxBpeMerges,
    s"BPE merge table ${mergesA.length} exceeds plan-embed cap " +
      s"${RefObjCaps.MaxBpeMerges}")
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](
      math.max(16, mergesA.length * 2))
    var i = 0
    while (i < mergesA.length) {
      m.put(mergesA(i) + " " + mergesB(i), i)
      i += 1
    }
    m
  }
  // concurrent: local-mode tasks can share one deserialized plan copy
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]](1 << 16)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(v: Any): Any =
    BpeUtil.encodeText(v.asInstanceOf[UTF8String], ranks, cache, 1 << 16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    val cref = ctx.addReferenceObj("bpeCache", cache,
      "java.util.concurrent.ConcurrentHashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeUtil.encodeText($c, $rref, $cref, ${1 << 16})")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}
