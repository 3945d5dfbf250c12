package graft
object ProbeNewPlans {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // round-16 continuation entries (streaming drains excluded — their
    // plans live inside the micro-batch runner; their batch twins below
    // share the map-only select):
    //  - d119 must be ONE project over the scan (no Exchange before the
    //    output sort) — the entropy kernel never shuffles the tokens;
    //  - d120 must show the scoring pass as a single project (training
    //    already ran; its per-iteration plan is one partial aggregate);
    //  - d121 adds exactly one 10-key hash aggregate above that;
    //  - d122 a filter + one 4-key hash aggregate;
    //  - e68 one broadcast-free map assign + ONE top_k_by exchange on
    //    the 8 cluster keys (partial aggregation map-side).
    for (name <- Seq("d119_unigram_entropy", "d120_quality_classifier_train",
        "d121_classifier_calibration", "d122_classifier_eval",
        "e68_cluster_balanced_sample")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
  }
}
