package graft

import graft.ops.{JoinOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** sf1-scale timing + plan sanity for the temporal joins and distributed
  * k-means (not part of the suite): run with
  * `Test/runMain graft.JoinScaleProbe /tmp/sf1`. */
object JoinScaleProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = (if (evRaw.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      evRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else evRaw).select("event_id", "user_id", "ts", "value")
    println(s"events: ${ev.count()}")

    val quotes = ev.where("event_id % 7 = 0")
      .groupBy("user_id", "ts").agg(max("value").as("quote"))
    for (i <- 1 to 2) timed(s"asof backward #$i") {
      JoinOps.asofJoin(ev, quotes, "ts", "ts", by = Seq("user_id"))
        .write.mode("overwrite").format("noop").save()
    }
    // skew probe: all rows on ONE key — the documented worst case (one
    // sort task); must still complete, not OOM
    timed("asof single hot key") {
      JoinOps.asofJoin(ev.withColumn("user_id", lit(0L)),
          quotes.withColumn("user_id", lit(0L)).groupBy("user_id", "ts")
            .agg(max("quote").as("quote")),
          "ts", "ts", by = Seq("user_id"))
        .write.mode("overwrite").format("noop").save()
    }

    val markers = ev.where("event_id % 53 = 0").select(
      col("event_id").as("marker_id"), col("user_id"),
      col("ts").as("lo"), (col("ts") + expr("INTERVAL 2 HOURS")).as("hi"))
    for (i <- 1 to 2) timed(s"range join #$i") {
      JoinOps.rangeJoin(ev.select("event_id", "user_id", "ts"), "ts",
          markers, "lo", "hi", binWidth = 7200.0, by = Seq("user_id"))
        .write.mode("overwrite").format("noop").save()
    }
    // candidate-efficiency report: candidates vs true pairs at the chosen
    // bin width (the knob the docstring tells callers to tune)
    def secs(c: org.apache.spark.sql.Column) =
      c.cast("timestamp").cast("double")
    val cand = ev.select(col("event_id"), col("user_id"),
        floor(secs(col("ts")) / 7200.0).as("b"))
      .join(markers.select(col("marker_id"), col("user_id"),
        explode(sequence(floor(secs(col("lo")) / 7200.0).cast("long"),
          floor(secs(col("hi")) / 7200.0).cast("long"))).as("b")),
        Seq("user_id", "b")).count()
    val pairs = JoinOps.rangeJoin(ev.select("event_id", "user_id", "ts"), "ts",
      markers, "lo", "hi", binWidth = 7200.0, by = Seq("user_id")).count()
    println(s"range join: $cand same-bin candidates -> $pairs true pairs " +
      f"(${pairs.toDouble / math.max(cand, 1)}%.2f selectivity)")

    // corpus-scale as-of: 6M lineitems (sf1) pick the latest same-part
    // price change at-or-before their ship date — 200k keys, |L|+|R|
    // ~7.4M rows through the one exchange
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate",
        "l_extendedprice")
    println(s"lineitem: ${li.count()}")
    val priceChanges = li.where("l_linenumber = 1")
      .groupBy("l_partkey", "l_shipdate")
      .agg(max("l_extendedprice").as("px"))
      .withColumnRenamed("l_shipdate", "chg_date")
    for (i <- 1 to 2) timed(s"asof lineitem 6M #$i") {
      JoinOps.asofJoin(li, priceChanges, "l_shipdate", "chg_date",
          by = Seq("l_partkey"))
        .write.mode("overwrite").format("noop").save()
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"embeddings: ${emb.count()}")
    for (i <- 1 to 2) timed(s"kmeans k=64 iters=2 #$i") {
      SimilarityOps.kmeans(emb, "vec_id", "embedding", k = 64, iters = 2)
        .write.mode("overwrite").format("noop").save()
    }
  }
}
