package graft

/** Side-channel for per-entry LEG timings (seconds), so the bench record
  * can say WHERE an entry's wall time goes instead of leaving a single
  * opaque number to suite-wide load forensics (r15 verdict item 1: s66's
  * driver-machine number was elevated in two consecutive records while
  * quiet-machine re-measures read 3× lower — the record itself must split
  * ingest/drain from state-store commit so the next elevated number is
  * self-explaining).
  *
  * Entries record last-write-wins: the bench runs each query 4× (warm +
  * 3 timed), so what survives is the final steady-state run — the same
  * run population the reported median comes from. Thread-safe; never read
  * on an executor (driver-side instrumentation only, zero cost in task
  * hot paths). */
object BenchProbe {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, Double)]]

  /** Record the legs (name → seconds, insertion order preserved) for one
    * instrumented entry. */
  def record(name: String, legs: Seq[(String, Double)]): Unit =
    m.put(name, legs)

  def get(name: String): Option[Seq[(String, Double)]] = Option(m.get(name))

  /** Compact JSON object for the named probes (only those present), leg
    * values in seconds at 3 decimals: {"name":{"leg":0.123,...},...} */
  def toJson(names: Seq[String]): String =
    names.flatMap(n => get(n).map(legs =>
      "\"" + n + "\":" + legs.map { case (k, v) =>
        "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")))
      .mkString("{", ",", "}")
}
