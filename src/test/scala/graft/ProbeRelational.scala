package graft

import org.apache.spark.sql.functions._

/** Timing probe: decompose q01-style cost at sf0.1. */
object ProbeRelational {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = () => spark.read.parquet(s"$dir/lineitem.parquet")
    def time[T](label: String)(f: => T): Unit = {
      // second run after warm-up
      f
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("count only")(li().count())
    time("scan all cols")(li().write.mode("overwrite").format("noop").save())
    time("agg double")(
      li().groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
        .write.mode("overwrite").format("noop").save())
    time("agg decimal")(
      li().groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0) - col("l_discount")).cast("decimal(18,4)")), count(lit(1)))
        .write.mode("overwrite").format("noop").save())
    time("q01 full")(
      SparkEntry.queries("q01_pricing_summary")(spark, dir)
        .write.mode("overwrite").format("noop").save())
  }
}
