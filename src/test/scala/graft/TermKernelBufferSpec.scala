package graft

import graft.functions.GraftFunctions
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BUFFER-LIFETIME CONTRACT of the term_counts / term_postings
  * kernels (documented at the GraftFunctions entry points): their output
  * `term` strings ALIAS the input row buffer, which is safe ONLY because
  * every consumer projects/explodes the array within the same pipeline
  * stage — the projection writes UnsafeRow COPIES before any operator
  * buffers rows. This spec exercises the hostile consumers (sort across
  * the projection, cache, per-group collect) on a corpus whose token
  * buffers would visibly cross-contaminate if an alias escaped, and
  * checks values against an independent groupBy reference. If a future
  * change lets the raw kernel output cross a buffering operator without
  * a copying projection, these values corrupt and this spec goes red. */
class TermKernelBufferSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // many docs sharing token bytes at different offsets: an escaped alias
  // would resolve to whatever row occupies the buffer later
  private val docs = (1L to 200L).map { i =>
    (i, Seq.tabulate(8)(j => s"tok${(i + j) % 13}").mkString(" ") +
      s" unique$i tok${i % 13}")
  }

  private def refCounts: Map[(Long, String), Long] = docs.flatMap {
    case (id, text) =>
      text.trim.split("\\s+").groupBy(identity).map {
        case (t, occ) => (id, t) -> occ.length.toLong
      }
  }.toMap

  test("explode-adjacent term_counts stays value-correct across sort + cache") {
    val df = docs.toDF("doc_id", "text")
    // the sanctioned pattern: kernel → explode → projection, then hostile
    // downstream buffering (global sort, cache) over the PROJECTED copy
    val exploded = df
      .select(col("doc_id"),
        explode(GraftFunctions.term_counts(TextOps.tokens(col("text")))).as("p"))
      .select(col("doc_id"), col("p.term").as("term"), col("p.tf").as("tf"))
    val sorted = exploded.orderBy(desc("term"), asc("doc_id")).cache()
    try {
      val got = sorted.collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == refCounts)
    } finally sorted.unpersist()
  }

  test("projected term_postings survives per-group collect_list buffering") {
    val df = docs.toDF("doc_id", "text")
    val exploded = df
      .select(col("doc_id"),
        explode(GraftFunctions.term_postings(TextOps.tokens(col("text")))).as("p"))
      .select(col("doc_id"), col("p.term").as("term"), col("p.tf").as("tf"),
        col("p.positions").as("positions"))
    // buffering aggregation over the projected rows: collect every doc's
    // postings, then verify terms/positions against the reference
    val collected = exploded.groupBy("doc_id")
      .agg(collect_list(struct(col("term"), col("tf"), col("positions"))).as("ps"))
      .collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map { p =>
          (p.getString(0), p.getLong(1), p.getSeq[Int](2).toList)
        }.toSet
      }.toMap
    val want = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+")
      id -> toks.zipWithIndex.groupBy(_._1).map { case (t, occ) =>
        (t, occ.length.toLong, occ.map(_._2 + 1).toList)
      }.toSet
    }.toMap
    assert(collected == want)
  }
}
