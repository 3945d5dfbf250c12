package graft

import graft.ops.JoinOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of and range joins: semantics vs brute-force reference on constructed
  * data, direction/tolerance behavior, and the plan-shape guarantees (one
  * exchange per side, no nested-loop/cartesian fallback). */
class JoinOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val trades = Seq(
    // (trade_id, sym, t, qty)
    (1L, "A", 10L, 5.0),
    (2L, "A", 25L, 6.0),
    (3L, "A", 30L, 7.0), // equal-time quote must match
    (4L, "B", 12L, 8.0),
    (5L, "B", 9L, 9.0),  // before any B quote -> no match
    (6L, "C", 50L, 1.0)  // sym with no quotes at all
  ).toDF("trade_id", "sym", "t", "qty")

  private val quotes = Seq(
    // (sym, t, px)
    ("A", 8L, 100.0),
    ("A", 20L, 101.0),
    ("A", 30L, 102.0),
    ("B", 10L, 200.0),
    ("B", 40L, 201.0)
  ).toDF("sym", "t", "px")

  test("asofJoin backward: latest at-or-before per key, left rows kept") {
    val r = JoinOps.asofJoin(trades, quotes, "t", "t", by = Seq("sym"))
      .select("trade_id", "right_t", "right_px")
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)).map(_.asInstanceOf[Long]), Option(x.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(r.size == 6, "left-outer: every trade survives")
    assert(r(1L) == (Some(8L), Some(100.0)))
    assert(r(2L) == (Some(20L), Some(101.0)))
    assert(r(3L) == (Some(30L), Some(102.0)), "equal timestamp matches (inclusive)")
    assert(r(4L) == (Some(10L), Some(200.0)))
    assert(r(5L) == (None, None), "no earlier quote -> null")
    assert(r(6L) == (None, None), "key with no right rows -> null")
  }

  test("asofJoin forward: earliest at-or-after per key") {
    val r = JoinOps.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), direction = "forward")
      .select("trade_id", "right_t")
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(r(1L) == Some(20L))
    assert(r(2L) == Some(30L))
    assert(r(3L) == Some(30L), "equal timestamp matches forward too")
    assert(r(4L) == Some(40L))
    assert(r(5L) == Some(10L))
    assert(r(6L) == None)
  }

  test("asofJoin nearest: closest match wins, backward on ties, one exchange") {
    val r = JoinOps.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), direction = "nearest")
      .select("trade_id", "right_t")
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(r(1L) == Some(8L), "bw diff 2 beats fw diff 10")
    assert(r(2L) == Some(20L), "bw 5 == fw 5 -> backward wins the tie")
    assert(r(3L) == Some(30L), "exact match")
    assert(r(4L) == Some(10L), "bw 2 beats fw 28")
    assert(r(5L) == Some(10L), "no backward -> forward")
    assert(r(6L) == None)
    val nodes = allNodes(JoinOps.asofJoin(trades, quotes, "t", "t",
      by = Seq("sym"), direction = "nearest"))
    val shuffles = nodes.count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
    assert(shuffles == 1,
      s"nearest must reuse ONE exchange for both directional sorts:\n${nodes.head}")
  }

  test("asofJoin allowExactMatches=false excludes equal timestamps") {
    val r = JoinOps.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), allowExactMatches = false)
      .select("trade_id", "right_t")
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(r(3L) == Some(20L), "t=30 must NOT match the t=30 quote strictly")
    assert(r(1L) == Some(8L), "strictly-earlier matches unaffected")
    val f = JoinOps.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), direction = "forward", allowExactMatches = false)
      .select("trade_id", "right_t")
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(f(3L) == None, "t=30 forward-strict has no later quote")
    assert(f(2L) == Some(30L))
  }

  test("asofJoin tolerance boundary is inclusive") {
    val r = JoinOps.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), tolerance = Some(5.0))
      .select("trade_id", "right_t")
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(r(1L) == Some(8L), "lag 2 <= 5 kept")
    assert(r(2L) == Some(20L), "lag exactly 5 kept (inclusive)")
  }

  test("asofJoin tolerance nulls matches beyond the bound") {
    val r = JoinOps.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), tolerance = Some(4.0))
      .select("trade_id", "right_t")
      .collect().map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(r(1L) == Some(8L), "lag 2 <= 4")
    assert(r(2L) == None, "lag 5 > 4 nulled")
    assert(r(3L) == Some(30L), "lag 0")
  }

  test("asofJoin matches a brute-force reference on the real events table") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"user_id", $"ts", $"value")
    val right = ev.where("event_id % 7 = 0")
      .groupBy("user_id", "ts").agg(max("value").as("quote"))
    val got = JoinOps.asofJoin(ev, right, "ts", "ts", by = Seq("user_id"))
      .select("event_id", "right_ts", "right_quote")
    // brute force: per left row, max right ts <= left ts, then its quote
    val best = ev.alias("l").join(right.alias("r"),
        $"l.user_id" === $"r.user_id" && $"r.ts" <= $"l.ts", "left")
      .groupBy($"l.event_id".as("event_id"))
      .agg(max(when($"r.ts".isNotNull, struct($"r.ts", $"r.quote"))).as("m"))
      .select($"event_id", $"m.ts".as("right_ts"), $"m.quote".as("right_quote"))
    assert(got.exceptAll(best).isEmpty && best.exceptAll(got).isEmpty,
      "sorted-union as-of != brute-force reference")
  }

  /** Every physical node of the final executed plan, recursing through the
    * AQE shell and its leaf-node QueryStage wrappers (whose inner plans
    * `collect` does not traverse). */
  private def allNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(flatten) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          flatten(q.plan)
        case _ => Nil
      }))
    flatten(df.queryExecution.executedPlan)
  }

  test("asofJoin plan: one shuffle total, a window, and NO join node") {
    val nodes = allNodes(
      JoinOps.asofJoin(trades, quotes, "t", "t", by = Seq("sym")))
    val joins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"as-of must not compile to a join:\n${nodes.head}")
    val shuffles = nodes.count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
    assert(shuffles == 1,
      s"expected exactly one hash exchange (the union shuffles once):\n${nodes.head}")
    val windows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"expected the running-state window:\n${nodes.head}")
  }

  test("asofJoin guards: empty by, reserved names, prefix collisions") {
    intercept[IllegalArgumentException] {
      JoinOps.asofJoin(trades, quotes, "t", "t", by = Nil)
    }
    intercept[IllegalArgumentException] {
      JoinOps.asofJoin(trades.withColumn("__asof_ts", lit(1)), quotes,
        "t", "t", by = Seq("sym"))
    }
    intercept[IllegalArgumentException] {
      // right payload (t, px) prefixed with "" collides with left's t
      JoinOps.asofJoin(trades, quotes, "t", "t", by = Seq("sym"),
        rightPrefix = "")
    }
  }

  private val pts = Seq(
    (1L, 0.5), (2L, 10.0), (3L, 10.5), (4L, 25.0), (5L, 99.9), (6L, 100.1)
  ).toDF("pid", "x")
  private val ivs = Seq(
    // spans multiple bins at width 10; boundaries inclusive
    (100L, 0.0, 10.0),
    (101L, 10.0, 30.0),
    (102L, 95.0, 100.0)
  ).toDF("iid", "lo", "hi")

  test("rangeJoin: exact pairs, inclusive bounds, multi-bin intervals meet once") {
    val got = JoinOps.rangeJoin(pts, "x", ivs, "lo", "hi", binWidth = 10.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L),
      (4L, 101L), (5L, 102L))
    assert(got == want)
    // no duplicate pair from an interval spanning several bins
    val cnt = JoinOps.rangeJoin(pts, "x", ivs, "lo", "hi", binWidth = 3.0)
      .groupBy("pid", "iid").count().where($"count" > 1).count()
    assert(cnt == 0, "a pair met in more than one bin")
    // bin width invariance
    val gotWide = JoinOps.rangeJoin(pts, "x", ivs, "lo", "hi", binWidth = 1000.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(gotWide == want)
  }

  test("rangeJoin honors equi keys and errors on oversized intervals") {
    val kp = pts.withColumn("k", ($"pid" % 2).cast("int"))
    val ki = ivs.withColumn("k", ($"iid" % 2).cast("int"))
    val got = JoinOps.rangeJoin(kp, "x", ki, "lo", "hi",
        binWidth = 10.0, by = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = kp.alias("p").join(ki.alias("i"),
        $"p.k" === $"i.k" && $"p.x" >= $"i.lo" && $"p.x" <= $"i.hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == brute, "keyed range join != brute-force predicate join")
    assert(got.nonEmpty && got != // keys actually restrict something
      JoinOps.rangeJoin(pts, "x", ivs, "lo", "hi", binWidth = 10.0)
        .select("pid", "iid").as[(Long, Long)].collect().toSet)
    val err = intercept[Exception] {
      JoinOps.rangeJoin(pts, "x", ivs, "lo", "hi",
        binWidth = 10.0, maxBinsPerInterval = 2).count()
    }
    assert(err.getMessage != null)
  }

  test("rangeJoin plan: sort-merge/hash equi join on the bin, no nested loop") {
    val nodes = allNodes(
      JoinOps.rangeJoin(pts, "x", ivs, "lo", "hi", binWidth = 10.0))
    val nested = nodes.collect {
      case n: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => n
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nested.isEmpty, s"range join fell back to a nested loop:\n${nodes.head}")
    val equi = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(equi.nonEmpty, s"expected an equi join on the bin key:\n${nodes.head}")
  }

  test("intervalJoin: overlap pairs meet exactly once across bin widths") {
    val as = Seq((1L, 0.0, 10.0), (2L, 5.0, 50.0), (3L, 60.0, 61.0))
      .toDF("a_id", "a_lo", "a_hi")
    val bs = Seq((10L, 8.0, 9.0), (11L, 49.0, 70.0), (12L, 52.0, 55.0))
      .toDF("b_id", "b_lo", "b_hi")
    val want = Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
    for (bw <- Seq(2.0, 10.0, 500.0)) {
      val got = JoinOps.intervalJoin(as, "a_lo", "a_hi", bs, "b_lo", "b_hi",
          binWidth = bw)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"multi-bin overlap counted twice at binWidth=$bw")
      assert(got.toSet == want, s"pair drift at binWidth=$bw")
    }
    // touching endpoints overlap (inclusive bounds)
    val t = JoinOps.intervalJoin(
        Seq((1L, 0.0, 5.0)).toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
        Seq((2L, 5.0, 9.0)).toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi",
        binWidth = 3.0)
      .count()
    assert(t == 1)
  }

  test("skewJoin set-equals the plain inner join, each pair exactly once") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_custkey".as("custkey"), $"o_totalprice")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select($"c_custkey".as("custkey"), $"c_mktsegment")
    val salted = JoinOps.skewJoin(o, c, on = Seq("custkey"), salts = 8)
    val plain = o.join(c, Seq("custkey"))
    assert(salted.count() == plain.count(), "replication must not duplicate pairs")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // a single hot key still splits across salts and stays correct
    val hotL = o.withColumn("custkey", lit(1L))
    val hotR = c.limit(1).withColumn("custkey", lit(1L))
    val hot = JoinOps.skewJoin(hotL, hotR, on = Seq("custkey"), salts = 4)
    assert(hot.count() == hotL.count())
    intercept[IllegalArgumentException] {
      JoinOps.skewJoin(o, c, on = Nil)
    }
  }

  test("rangeJoin on timestamps bins in seconds") {
    val p = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00")))
      .toDF("pid", "ts")
    val iv = Seq((9L,
      java.sql.Timestamp.valueOf("2024-01-01 09:30:00"),
      java.sql.Timestamp.valueOf("2024-01-01 10:30:00")))
      .toDF("iid", "lo", "hi")
    val got = JoinOps.rangeJoin(p, "ts", iv, "lo", "hi", binWidth = 3600.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 9L)))
  }

  test("detectGaps: threshold strictness, per-key isolation, duplicate timestamps never gap") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00"),
      (1L, "2024-01-01 00:00:00"), // duplicate ts: gap-0 link
      (1L, "2024-01-01 02:00:00"), // 2h gap -> reported
      (1L, "2024-01-01 03:00:00"), // exactly 1h -> NOT reported (strict >)
      (2L, "2024-01-01 23:00:00")) // single obs, no prev
      .toDF("uid", "s")
      .select(col("uid"), col("s").cast("timestamp").as("ts"))
    val gaps = JoinOps.detectGaps(ev, "ts", "uid", minGapMicros = 3600000000L)
      .collect()
    assert(gaps.length == 1)
    val g = gaps.head
    assert(g.getAs[Long]("uid") == 1L)
    assert(g.getAs[Long]("gap_us") == 7200000000L)
    assert(g.getAs[java.sql.Timestamp]("gap_start").toString.startsWith("2024-01-01 00:00:00"))
    assert(g.getAs[java.sql.Timestamp]("gap_end").toString.startsWith("2024-01-01 02:00:00"))
  }

  test("downsampleOhlc: open/close tie rules, null exclusion, one aggregate exchange") {
    val ev = Seq(
      (1L, "2024-01-01 00:05:00", 3.0),             // open
      (1L, "2024-01-01 00:10:00", 9.0),             // high
      (1L, "2024-01-01 00:40:00", 1.0),             // low
      (1L, "2024-01-01 00:50:00", 5.0),             // duplicate close ts...
      (1L, "2024-01-01 00:50:00", 4.0),             // ...tie -> max value 5.0
      (2L, "2024-01-01 01:30:00", 7.0))
      .toDF("uid", "s", "v")
      .select(col("uid"), col("s").cast("timestamp").as("ts"), col("v"))
      .union(Seq((2L, "2024-01-01 01:45:00"))
        .toDF("uid", "s")
        .select(col("uid"), col("s").cast("timestamp").as("ts"),
          lit(null).cast("double").as("v")))
    val got = JoinOps.downsampleOhlc(ev, "ts", "uid", "v")
    val r1 = got.where(col("uid") === 1L).head
    assert(r1.getAs[Double]("open") == 3.0)
    assert(r1.getAs[Double]("high") == 9.0)
    assert(r1.getAs[Double]("low") == 1.0)
    assert(r1.getAs[Double]("close") == 5.0) // ts tie broken by max value
    assert(r1.getAs[Long]("n_obs") == 5L)
    val r2 = got.where(col("uid") === 2L).head
    assert(r2.getAs[Double]("open") == 7.0 && r2.getAs[Double]("close") == 7.0)
    assert(r2.getAs[Long]("n_obs") == 1L) // null value row excluded
    val planStr = got.queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(nShuffles == 1, s"one partial-agg exchange only:\n$planStr")
  }

  test("rollingAgg: trailing inclusive frame, duplicate-ts peers, null exclusion, one exchange") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 2.0),
      (1L, "2024-01-01 00:30:00", 5.0),  // frame = {2,5}
      (1L, "2024-01-01 01:00:00", 3.0),  // 1h window includes 00:00 (inclusive) -> {2,5,3}
      (1L, "2024-01-01 02:30:00", 7.0),  // everything earlier aged out -> {7}
      (1L, "2024-01-01 02:30:00", 1.0),  // duplicate ts: PEER -> both rows see {7,1}
      (2L, "2024-01-01 00:10:00", 9.0))  // per-key isolation
      .toDF("uid", "s", "v")
      .select(col("uid"), col("s").cast("timestamp").as("ts"), col("v"))
      .union(Seq((1L, "2024-01-01 00:45:00"))
        .toDF("uid", "s")
        .select(col("uid"), col("s").cast("timestamp").as("ts"),
          lit(null).cast("double").as("v")))
    val got = JoinOps.rollingAgg(ev, "ts", "uid", "v",
      windowMicros = 3600000000L)
    val rows = got.orderBy("uid", "ts", "v")
      .select("uid", "roll_n", "roll_sum", "roll_min", "roll_max")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 2.0, 2.0, 2.0),
      (1L, 2L, 7.0, 2.0, 5.0),
      (1L, 3L, 10.0, 2.0, 5.0),
      (1L, 2L, 8.0, 1.0, 7.0), // dup-ts peers: identical frame {7,1}
      (1L, 2L, 8.0, 1.0, 7.0),
      (2L, 1L, 9.0, 9.0, 9.0)))
    assert(got.count() == 6L) // the NULL-value row is gone, not null-stat'd
    val planStr = got.queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(planStr).size
    assert(nShuffles == 1, s"one window exchange only:\n$planStr")
  }

  test("rollingZscore: hand-computed z, zero-variance null, threshold on unrounded z") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 2.0),  // n=1, var=0 -> z null, flag null
      (1L, "2024-01-01 00:30:00", 5.0),  // frame {2,5}: mean 3.5, std 1.5, z=1.0
      (2L, "2024-01-01 00:00:00", 4.0),
      (2L, "2024-01-01 00:30:00", 4.0),  // all-equal frame -> var 0 -> null
      (3L, "2024-01-01 00:00:00", 0.0),
      (3L, "2024-01-01 00:30:00", 10.0)) // frame {0,10}: mean 5, std 5, z=1.0
      .toDF("uid", "s", "v")
      .select(col("uid"), col("s").cast("timestamp").as("ts"),
        col("v").cast("decimal(18,6)").as("v"))
    val got = JoinOps.rollingZscore(ev, "ts", "uid", "v",
        windowMicros = 3600000000L, zThreshold = 0.9)
      .orderBy("uid", "ts")
      .select("uid", "roll_n", "zscore", "is_anomaly")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)),
        if (r.isNullAt(3)) null else java.lang.Boolean.valueOf(r.getBoolean(3))))
    assert(got.toSeq == Seq(
      (1L, 1L, null, null),
      (1L, 2L, java.lang.Double.valueOf(1.0), java.lang.Boolean.TRUE),
      (2L, 1L, null, null),
      (2L, 2L, null, null), // identical values: zero spread, no verdict
      (3L, 1L, null, null),
      (3L, 2L, java.lang.Double.valueOf(1.0), java.lang.Boolean.TRUE)))
  }

  test("resampleLocf: hourly grid spans trunc(min)..max, carries across gaps, null before first obs") {
    val ev = Seq(
      (1L, "2024-01-01 00:30:00", 1.0),
      (1L, "2024-01-01 02:15:00", 2.0),
      (2L, "2024-01-01 03:45:00", 9.0))
      .toDF("uid", "s", "v")
      .select(col("uid"), col("s").cast("timestamp").as("ts"), col("v"))
    val r = JoinOps.resampleLocf(ev, "ts", "uid", Seq("v"))
      .orderBy("uid", "ts")
      .collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).toString,
        Option(x.get(2)).map(_.asInstanceOf[Double])))
      .toSeq
    // grid: 00:00..03:00 (t0 = trunc(00:30), t1 = 03:45) x 2 keys = 8 rows
    assert(r == Seq(
      (1L, "2024-01-01 00:00:00.0", None),       // before uid 1's first obs
      (1L, "2024-01-01 01:00:00.0", Some(1.0)),
      (1L, "2024-01-01 02:00:00.0", Some(1.0)),  // gap hour carries forward
      (1L, "2024-01-01 03:00:00.0", Some(2.0)),
      (2L, "2024-01-01 00:00:00.0", None),
      (2L, "2024-01-01 01:00:00.0", None),
      (2L, "2024-01-01 02:00:00.0", None),
      (2L, "2024-01-01 03:00:00.0", None)))      // 03:45 obs is after 03:00
  }

  test("resampleLocf: parity with a plain-Scala carry on pseudo-random events") {
    val rnd = new scala.util.Random(7)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val events = (1 to 400).map { _ =>
      (rnd.nextInt(6).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(72 * 3600) * 1000L),
        rnd.nextInt(1000).toDouble)
    }.distinct
    val df = events.toDF("uid", "ts", "v")
      // de-dup (uid, ts) like any caller must (carry is order-dependent on ties)
      .groupBy("uid", "ts").agg(max("v").as("v"))
    val deduped = df.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    val got = JoinOps.resampleLocf(df, "ts", "uid", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    val t0 = {
      val min = deduped.map(_._2).min
      min - Math.floorMod(min, 3600 * 1000L) // UTC hour-trunc
    }
    val t1 = deduped.map(_._2).max
    val keys = deduped.map(_._1).distinct
    val want = (for {
      k <- keys
      t <- t0 to t1 by 3600 * 1000L
    } yield {
      val past = deduped.filter(e => e._1 == k && e._2 <= t)
      (k, t, if (past.isEmpty) None else Some(past.maxBy(_._2)._3))
    }).toSet
    assert(got == want && got.nonEmpty)
  }

  test("resampleInterp: exact hits verbatim, dyadic midpoints exact, no extrapolation") {
    val ev = Seq(
      (1L, "2024-01-01 01:00:00", 6.0),
      (1L, "2024-01-01 03:00:00", 18.0),
      (1L, "2024-01-01 05:00:00", 12.0),
      (2L, "2024-01-01 02:00:00", 7.0),   // single obs: exact hit only
      (3L, "2024-01-01 00:30:00", 0.0),   // off-grid bracket around 01:00
      (3L, "2024-01-01 01:30:00", 30.0))
      .toDF("uid", "s", "v")
      .select(col("uid"), col("s").cast("timestamp").as("ts"), col("v"))
    val r = JoinOps.resampleInterp(ev, "ts", "uid", "v")
      .orderBy("uid", "ts").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).toString,
        Option(x.get(2)).map(_.asInstanceOf[Double])))
      .toSeq
    // global grid 00:00..05:00 (t0 = trunc(00:30)) x 3 keys; dyadic
    // fractions make every expected value an exact double
    assert(r == Seq(
      (1L, "2024-01-01 00:00:00.0", None),        // before first obs
      (1L, "2024-01-01 01:00:00.0", Some(6.0)),   // exact hit
      (1L, "2024-01-01 02:00:00.0", Some(12.0)),  // halfway 6 -> 18
      (1L, "2024-01-01 03:00:00.0", Some(18.0)),
      (1L, "2024-01-01 04:00:00.0", Some(15.0)),  // halfway 18 -> 12
      (1L, "2024-01-01 05:00:00.0", Some(12.0)),
      (2L, "2024-01-01 00:00:00.0", None),
      (2L, "2024-01-01 01:00:00.0", None),
      (2L, "2024-01-01 02:00:00.0", Some(7.0)),   // exact hit, no bracket needed
      (2L, "2024-01-01 03:00:00.0", None),        // after last obs
      (2L, "2024-01-01 04:00:00.0", None),
      (2L, "2024-01-01 05:00:00.0", None),
      (3L, "2024-01-01 00:00:00.0", None),
      (3L, "2024-01-01 01:00:00.0", Some(15.0)),  // 0 + 30 * (30m / 60m)
      (3L, "2024-01-01 02:00:00.0", None),
      (3L, "2024-01-01 03:00:00.0", None),
      (3L, "2024-01-01 04:00:00.0", None),
      (3L, "2024-01-01 05:00:00.0", None)))
  }

  test("resampleInterp: parity with a plain-Scala interpolation on pseudo-random events") {
    val rnd = new scala.util.Random(11)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val events = (1 to 300).map { _ =>
      (rnd.nextInt(5).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(48 * 3600) * 1000L),
        rnd.nextInt(1000).toDouble)
    }.groupBy(e => (e._1, e._2)).map(_._2.maxBy(_._3)).toSeq // de-dup (uid, ts)
    val df = events.toDF("uid", "ts", "v")
      .groupBy("uid", "ts").agg(max("v").as("v"))
    val got = JoinOps.resampleInterp(df, "ts", "uid", "v")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    val t0 = {
      val min = events.map(_._2.getTime).min
      min - Math.floorMod(min, 3600 * 1000L) // UTC hour-trunc
    }
    val t1 = events.map(_._2.getTime).max
    val want = (for {
      k <- events.map(_._1).distinct
      t <- t0 to t1 by 3600 * 1000L
    } yield {
      val mine = events.filter(_._1 == k)
      val bw = mine.filter(_._2.getTime <= t).sortBy(_._2.getTime).lastOption
      val fw = mine.filter(_._2.getTime >= t).sortBy(_._2.getTime).headOption
      val v = (bw, fw) match {
        case (Some(b), Some(f)) =>
          if (b._2.getTime == t) Some(b._3)
          else Some(b._3 + (f._3 - b._3) *
            ((t - b._2.getTime).toDouble * 1000.0 /
              ((f._2.getTime - b._2.getTime).toDouble * 1000.0)))
        case _ => None
      }
      (k, t, v)
    }).toSet
    assert(got == want && got.exists(_._3.isDefined))
  }

  test("resampleInterp plan: no shuffled join, the one union exchange + grid distinct") {
    val ev = Seq((1L, "2024-01-01 01:00:00", 1.0))
      .toDF("uid", "s", "v")
      .select(col("uid"), col("s").cast("timestamp").as("ts"), col("v"))
    val nodes = allNodes(JoinOps.resampleInterp(ev, "ts", "uid", "v"))
    // the carry must stay the sorted-union window — the only join in the
    // plan is the broadcast of the ONE-ROW bounds aggregate
    assert(!nodes.exists {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _ => false
    }, s"interp carry compiled to a shuffled join:\n${nodes.head}")
    val shuffles = nodes.count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }
    assert(shuffles <= 3,
      s"expected the union exchange plus the grid key-distinct, got $shuffles:\n${nodes.head}")
    assert(nodes.exists {
      case _: org.apache.spark.sql.execution.window.WindowExec => true
      case _ => false
    }, s"expected the directional-carry windows:\n${nodes.head}")
  }
}
