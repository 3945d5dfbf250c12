package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Isolate top_k_by's per-row cost from skew: aggregate 11M uniform
  * synthetic rows (20k groups) and compare against the window form.
  * Not part of the suite. Run: `sbt "Test/runMain graft.ops.TopKAggProbe"`. */
object TopKAggProbe {
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"TIMER $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val df = spark.range(11000000L).select(
      (col("id") % 20000).as("g"),
      (col("id") * 2654435761L % 1000003L).cast("double").as("s"),
      col("id").as("v")).persist()
    df.count()
    for (round <- Seq("warm", "timed")) {
      timed(s"$round top_k_by 11M uniform") {
        df.groupBy("g").agg(GraftFunctions.top_k_by(col("s"), col("v"), 3).as("tk"))
          .write.mode("overwrite").format("noop").save()
      }
      timed(s"$round window row_number 11M uniform") {
        df.withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("g")
              .orderBy(col("s").desc, col("v"))))
          .where("rn <= 3")
          .write.mode("overwrite").format("noop").save()
      }
      timed(s"$round plain sum 11M uniform") {
        df.groupBy("g").agg(sum("s")).write.mode("overwrite").format("noop").save()
      }
    }
    df.unpersist()
  }
}
