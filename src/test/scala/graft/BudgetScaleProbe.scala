package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale probe (run manually against /tmp/sf1, see SCALE.md): validates
 * the round-10 two-phase [[CorpusOps.selectWithinBudget]] where its scale
 * claim lives — a SKEWED stratum. The single-window form sorts each
 * stratum in ONE task (the round-9 advice finding); the two-phase form
 * must (a) return the identical selection, and (b) window-sort only the
 * budget-straddling quality bucket, so the dominant stratum never hits a
 * single-task full sort.
 *
 * Corpus: lineitem at sf1 (6M rows), 90% of rows in one "hot" stratum,
 * the rest spread over 10 cold strata; quality is a deterministic hash
 * mix so buckets are balanced; budget cuts the hot stratum ~halfway.
 */
object BudgetScaleProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir = args.headOption.getOrElse("/tmp/sf1")

    val docs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        monotonically_increasing_id().as("id"),
        when(pmod(col("l_orderkey"), lit(10)) < 9, lit("hot"))
          .otherwise(concat(lit("cold"), pmod(col("l_partkey"), lit(10)))).as("stratum"),
        (pmod(col("l_orderkey") * 2654435761L + col("l_partkey") * 40503L, lit(100000)) / 1000.0)
          .as("quality"),
        (pmod(col("l_partkey") * 48271L, lit(900)) + 100L).as("tokens"))
      .persist()
    val total = docs.count()
    val hotTokens = docs.where("stratum = 'hot'")
      .agg(sum("tokens")).first().getLong(0)
    val budget = hotTokens / 2
    println(s"PROBE corpus rows=$total hotTokens=$hotTokens budget=$budget")

    // the pre-round-10 shape: one window over each whole stratum — the
    // hot stratum's sort+cumsum runs in a single task
    val singleWindow = timed("single-window selectWithinBudget (old shape)") {
      val w = Window.partitionBy("stratum")
        .orderBy(col("quality").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("cum", sum(col("tokens")).over(w))
        .where(col("cum") - col("tokens") < budget)
        .drop("cum")
        .select("id").collect().map(_.getLong(0))
    }

    val twoPhase = timed("two-phase selectWithinBudget (round 10)") {
      CorpusOps.selectWithinBudget(docs, "id", "stratum", "quality",
          "tokens", budget)
        .select("id").collect().map(_.getLong(0))
    }

    println(s"PROBE kept single=${singleWindow.length} twoPhase=${twoPhase.length} " +
      s"equal=${singleWindow.sorted.toSeq == twoPhase.sorted.toSeq}")

    // how much of the corpus the two-phase form actually window-sorts:
    // only the straddling bucket per stratum
    val qd = col("quality").cast("double")
    val range = docs.groupBy("stratum").agg(min(qd).as("qmin"), max(qd).as("qmax"))
    val b = least(greatest(floor((col("qmax") - qd) / (col("qmax") - col("qmin")) * 64),
      lit(0L)), lit(63L))
    val cumW = Window.partitionBy("stratum").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = docs.join(broadcast(range), Seq("stratum")).withColumn("b", b)
      .groupBy("stratum", "b").agg(sum("tokens").as("bt"), count(lit(1)).as("n"))
      .withColumn("cum", sum("bt").over(cumW))
      .withColumn("cumBefore", col("cum") - col("bt"))
    val straddleRows = stats
      .where(col("cum") >= budget && col("cumBefore") < budget)
      .agg(sum("n")).first().getLong(0)
    println(f"PROBE windowed-rows two-phase=$straddleRows (${100.0 * straddleRows / total}%.1f%% of corpus) vs single-window=$total (100%%)")
    println("BUDGET PROBE DONE")
  }
}
