package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding
 * column. Two paths:
 *
 *  - [[topKBruteForce]]: the exact baseline — broadcast the (small) query
 *    batch against the corpus, cosine via a codegen'd expression, top-k by
 *    window. Cost O(|corpus| × |queries|) but a single map-side pass over
 *    the corpus plus one shuffle on query_id; correct at any scale where
 *    the query batch fits in a broadcast.
 *
 *  - [[topKLsh]]: the scale path — corpus is bucketed once by
 *    random-hyperplane signature (map-only, reusable across query batches);
 *    each query probes its own bucket plus all buckets within Hamming
 *    distance `probeBits` (multi-probe), and only those candidates are
 *    scored. The join key is the bucket id, so the comparison volume is
 *    |corpus| / 2^nbits per probe instead of |corpus|.
 */
object SimilarityOps {

  /** The brute-force candidate stream both [[topKBruteForce]] and
    * [[hardNegatives]] rank: one map-side pass over the corpus against
    * the broadcast query batch, `(query_id, vec_id, cosine)`. Shared so
    * a scoring-path change can never make the two rank differently. */
  private def cosineScored(corpus: DataFrame, corpusId: String,
                           corpusVec: String, queries: DataFrame,
                           queryId: String, queryVec: String): DataFrame =
    corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
      .crossJoin(broadcast(
        queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"))))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))

  /** Exact top-k: (query_id, vec_id, cosine, rank), rank 1..k per query.
    * Ties broken by corpus id for determinism. */
  def topKBruteForce(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame =
    topK(cosineScored(corpus, corpusId, corpusVec, queries, queryId, queryVec),
      "query_id", "vec_id", k)

  /**
   * Hard-negative mining for contrastive training: for each anchor, the
   * `k` most cosine-similar corpus vectors EXCLUDING the anchor itself
   * and its known positives — the standard negative set for training
   * retrieval/embedding models (a positive mined as a negative poisons
   * the loss; a random negative teaches nothing, the near-misses do).
   *
   * `positives` is one row per labeled (anchor, positive) pair; anchors
   * are assumed drawn from the corpus id space (self-exclusion is by id
   * equality). The exclusion applies BEFORE top-k selection — a left-anti join of the
   * scored candidate stream against the (broadcast) positives on the
   * (query, candidate) pair key — so an excluded candidate can never
   * displace a legitimate negative out of the k. The positive set is
   * bounded by labels-per-anchor × the query batch, the same broadcast
   * envelope as the query batch itself; the candidate stream is the
   * one map-side pass over the corpus [[topKBruteForce]] makes, and
   * top-k still partial-aggregates map-side, so the whole mine is one
   * corpus scan + one query-keyed exchange at any corpus size. For
   * corpus-sized anchor sets, run the same exclusion over an
   * index-backed candidate stream ([[topKIvfFromIndex]]'s assignments
   * path) instead of the brute-force scorer.
   */
  def hardNegatives(corpus: DataFrame, corpusId: String, corpusVec: String,
                    queries: DataFrame, queryId: String, queryVec: String,
                    positives: DataFrame, posQueryCol: String,
                    posIdCol: String, k: Int): DataFrame = {
    val scored =
      cosineScored(corpus, corpusId, corpusVec, queries, queryId, queryVec)
    val pos = positives.select(col(posQueryCol).as("query_id"),
      col(posIdCol).as("vec_id"))
    val candidates = scored
      .where(col("vec_id") =!= col("query_id"))
      .join(broadcast(pos), Seq("query_id", "vec_id"), "left_anti")
    topK(candidates, "query_id", "vec_id", k)
  }

  /**
   * Margin-based candidate mining (Artetxe & Schwenk 2019, ACL —
   * "Margin-based Parallel Corpus Mining with Multilingual Sentence
   * Embeddings"; the LASER/CCMatrix bitext-mining score): rank each
   * query's candidates not by raw cosine but by the RATIO margin
   * `cos(x,y) / ((avgcos_k(x) + avgcos_k(y)) / 2)`, where `avgcos_k(v)`
   * is the mean of v's top-`navg` cosines into the OTHER side. Raw
   * cosine mines hubs — candidates near everything; the margin divides
   * out each side's local density, so a pair only scores high when they
   * are close to each other RELATIVE to their neighborhoods. This is
   * the standard mined-pair scorer for parallel-text and retrieval
   * training data.
   *
   * Reproducibility: each cosine is floored to 16 fractional bits
   * before entering an average, so the `navg`-term sums are exact
   * dyadics in any summation order (e49/e50 trick) and both engines
   * produce bit-identical densities; the margin is then ONE correctly-
   * rounded division of bit-identical inputs. Candidate selection (by
   * raw cosine) and final ranking (by margin) both tie-break on id.
   *
   * 100 TB shape: the forward pass is [[topKBruteForce]]'s one
   * broadcast-query map scan + one query-keyed partial-aggregated
   * exchange; the backward densities are computed ONLY for the distinct
   * mined candidates (≤ queries × candidates rows — a semi-join fetch of
   * their vectors, then a scan against the broadcast query batch), never
   * for the whole corpus. For corpus-scale query sets, feed the same
   * margin arithmetic from an index-backed candidate stream
   * ([[topKIvfFromIndex]]) instead of the brute-force scorer.
   */
  def marginMineTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int, navg: Int = 4, candidates: Int = 16): DataFrame =
    marginPipeline(
      cosineScored(corpus, corpusId, corpusVec, queries, queryId, queryVec),
      corpus, corpusId, corpusVec, queries, queryId, queryVec,
      k, navg, candidates)

  /**
   * [[marginMineTopK]]'s scale path: the same margin arithmetic fed by
   * an IVF candidate stream — the corpus is cell-bucketed once and each
   * query scores only its `nprobe` probed cells, so the forward pass
   * prunes to |corpus|·nprobe/nlist instead of a full scan. At full
   * probe (`nprobe == nlist`) every pair is scored exactly once and the
   * result provably equals [[marginMineTopK]] (the e40 invariant);
   * approximate probes trade the forward density's completeness for the
   * pruning, exactly like approximate top-k does.
   */
  def marginMineTopKIvf(corpus: DataFrame, corpusId: String, corpusVec: String,
                        queries: DataFrame, queryId: String, queryVec: String,
                        k: Int, navg: Int = 4, candidates: Int = 16,
                        nlist: Int = 0, nprobe: Int = 4,
                        trainSample: Int = 4096, seed: Long = 42L): DataFrame = {
    val nl = resolveNlist(nlist, corpus)
    val sample = sampleVectors(corpus, corpusVec, trainSample)
    val centers = trainKmeans(sample, nl, iters = 10, seed)
    val cells = corpus.select(col(corpusId).as("vec_id"),
      col(corpusVec).as("cvec"),
      GraftFunctions.nearest_centroid(col(corpusVec), centers).as("cell"))
    val probes = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"),
      explode(GraftFunctions.nearest_centroids(col(queryVec), centers, nprobe))
        .as("cell"))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    marginPipeline(scored, corpus, corpusId, corpusVec,
      queries, queryId, queryVec, k, navg, candidates)
  }

  private def marginPipeline(scored0: DataFrame,
                             corpus: DataFrame, corpusId: String,
                             corpusVec: String, queries: DataFrame,
                             queryId: String, queryVec: String,
                             k: Int, navg: Int, candidates: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(navg >= 1, s"navg must be >= 1, got $navg")
    require(candidates >= k,
      s"candidates ($candidates) must be >= k ($k)")
    def q16(c: Column): Column = floor(c * lit(65536d)) / lit(65536d)
    // mean over the neighbors actually present (≤ navg) — dividing by
    // the constant navg would deflate densities for query batches or
    // corpora smaller than navg, inflating every margin
    def avgTop(grouped: DataFrame, groupCol: String, idC: String,
               outCol: String): DataFrame =
      grouped.groupBy(groupCol)
        .agg(GraftFunctions.top_k_by(col("__qc"), col(idC), navg).as("__t"))
        .select(col(groupCol),
          (aggregate(col("__t"), lit(0.0d),
            (acc, x) => acc + x.getField("score")) /
            size(col("__t")).cast("double")).as(outCol))
    val scored = scored0.withColumn("__qc", q16(col("cosine")))
    // forward density: avg of the top-navg quantized cosines per query —
    // floor is monotone, so the top-navg multiset is the same whether
    // selected by raw or quantized cosine
    val fwd = avgTop(scored, "query_id", "vec_id", "__aq")
    val cand = topK(scored, "query_id", "vec_id", candidates)
    // backward density: each DISTINCT candidate's avg top-navg cosine
    // into the query batch — candidate-bounded, not corpus-bounded
    val candVecs = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("__cv"))
      .join(cand.select("vec_id").distinct(), Seq("vec_id"))
    val bwdScored = candVecs
      .crossJoin(broadcast(queries.select(col(queryId).as("__qid"),
        col(queryVec).as("__qv"))))
      .select(col("vec_id"), col("__qid"),
        q16(GraftFunctions.cosine_similarity(col("__cv"), col("__qv")))
          .as("__qc"))
    val bwd = avgTop(bwdScored, "vec_id", "__qid", "__ab")
    // both joins are query-batch-bounded by construction (not
    // data-dependent), so forcing the broadcast is safe
    val margined = cand
      .join(broadcast(fwd), Seq("query_id"))
      .join(broadcast(bwd), Seq("vec_id"))
      .where(col("__aq") + col("__ab") > 0d)
      .select(col("query_id"), col("vec_id"),
        (q16(col("cosine")) /
          ((col("__aq") + col("__ab")) / lit(2.0d))).as("__margin"))
    topKBy(margined, "query_id", "vec_id", "__margin", k)
      .select(col("query_id"), col("vec_id"),
        (round(col("__margin"), 6) + lit(0.0d)).as("margin"), col("rank"))
  }

  /**
   * Recall evaluator for approximate search: joins an approximate result
   * set against the exact ground truth per query and reports
   * `(query_id, n_hits, recall)` — the index-quality monitor every
   * production ANN deployment runs before trusting an approximate
   * configuration (recall is a property of the DATA as much as the
   * index; a config that holds 0.95 on one corpus silently degrades
   * after a distribution shift, so it must be re-measured, not assumed).
   *
   * Self-normalizing: recall divides by the per-query ground-truth size,
   * not a fixed k, so truncated truth sets (corpus smaller than k,
   * filtered queries) grade correctly. Pure relational — one pair-keyed
   * join plus one per-query count over two k×|queries|-sized inputs, so
   * evaluating an index is never heavier than querying it, and the
   * ground truth can itself be computed distributed ([[topKBruteForce]]
   * on a held-out query sample). Queries with zero approximate hits
   * still report (0, 0.0) — absence is the signal that matters.
   */
  def annRecall(approx: DataFrame, exact: DataFrame,
                queryCol: String = "query_id",
                idCol: String = "vec_id"): DataFrame = {
    val hits = approx.select(col(queryCol), col(idCol))
      .join(exact.select(col(queryCol), col(idCol)), Seq(queryCol, idCol))
      .groupBy(queryCol).agg(count(lit(1)).as("__n_hits"))
    exact.groupBy(queryCol).agg(count(lit(1)).as("__n_true"))
      .join(hits, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("__n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("__n_hits"), lit(0L)).cast("double") /
          col("__n_true").cast("double")).as("recall"))
  }

  /**
   * Embedding-health report — the validation pass run BEFORE an index
   * build trusts a vector column: one row of corpus-wide counters
   * `(n_vectors, n_null, n_wrong_dim, n_nonfinite, n_zero_norm)`.
   * Every downstream kernel has a failure mode one of these predicts:
   * a wrong-dim vector breaks codegen loops pinned to `dim`, a NaN
   * poisons every similarity it touches (see the MMR guard), a
   * zero-norm vector makes cosine undefined. Map-only higher-order
   * predicates folded into ONE partial-aggregated count row — the
   * cheapest full-corpus pass there is. `n_nonfinite` and `n_zero_norm`
   * count only correctly-dimensioned vectors (each row is tallied under
   * its FIRST failure, so the counters partition the bad rows).
   */
  def embeddingHealth(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val v = col(vecCol)
    val isWrongDim = v.isNotNull && size(v) =!= dim
    val isNonFinite = exists(v, x => isnan(x) || x === Float.PositiveInfinity
      || x === Float.NegativeInfinity)
    val isZero = forall(v, x => x === 0.0f)
    df.agg(
      count(lit(1)).as("n_vectors"),
      count(when(v.isNull, 1)).as("n_null"),
      count(when(isWrongDim, 1)).as("n_wrong_dim"),
      count(when(v.isNotNull && !isWrongDim && isNonFinite, 1))
        .as("n_nonfinite"),
      count(when(v.isNotNull && !isWrongDim && !isNonFinite && isZero, 1))
        .as("n_zero_norm"))
  }

  /**
   * Recall-vs-nprobe CURVE over ONE trained IVF geometry — the table a
   * deployment reads to pick its nprobe (the quality/cost knob): for
   * each setting, mean recall@k over a fixed query batch against exact
   * brute force, plus the three invariants that make the curve
   * hash-gradable however the k-means geometry lands:
   *
   *  - `monotone_ok`: per-query candidate sets are NESTED in nprobe
   *    (same centers, top-nprobe cells), and every true top-k element
   *    present in a candidate set survives its top-k (nothing outranks
   *    it under the shared (cosine DESC, id) order), so per-query — and
   *    therefore mean — recall is non-decreasing in nprobe. A violation
   *    means the assign or probe path lost candidates.
   *  - `full_probe_exact`: a row with nprobe ≥ nlist scored every cell,
   *    so its result IS brute force (the e40 invariant) — recall exactly
   *    1.0, no tolerance.
   *  - `floor_met`: mean recall ≥ `recallFloor` (regression floor, the
   *    e44 pattern: a broken path craters recall to ~k/n, far below any
   *    sane floor; quality certification belongs to clustered data).
   *
   * `mean_recall` itself is k-means-geometry-dependent — callers that
   * hash-compare across engines drop it and grade the flags (the graded
   * e67 entry does; the spec pins the raw values instead).
   *
   * Scale shape: train once (bounded sample), assign once (map-only,
   * persisted for the curve's duration), then per setting one
   * broadcast-probe join of |corpus|·nprobe/nlist comparisons — the
   * whole curve costs Σ nprobe/nlist corpus-fractions plus ONE exact
   * brute-force pass over the bounded query batch.
   */
  def ivfRecallCurve(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int, nprobes: Seq[Int], nlist: Int = 0,
                     recallFloor: Double = 0.05,
                     trainSample: Int = 4096, seed: Long = 42L): DataFrame = {
    require(nprobes.nonEmpty && nprobes == nprobes.sorted.distinct,
      s"nprobes must be ascending and distinct, got $nprobes")
    require(nprobes.head >= 1, s"nprobes must be >= 1, got $nprobes")
    val nl = resolveNlist(nlist, corpus)
    val sample = sampleVectors(corpus, corpusVec, trainSample)
    val centers = trainKmeans(sample, nl, iters = 10, seed)
    val cells = corpus.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("cvec"),
        GraftFunctions.nearest_centroid(col(corpusVec), centers).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val exact = topKBruteForce(corpus, corpusId, corpusVec,
        queries, queryId, queryVec, k)
        .select(col("query_id"), col("vec_id"))
        .localCheckpoint()
      val perSetting = nprobes.map { np =>
        val probes = queries.select(col(queryId).as("query_id"),
          col(queryVec).as("qvec"),
          explode(GraftFunctions.nearest_centroids(col(queryVec), centers,
            math.min(np, nl))).as("cell"))
        val scored = cells.join(broadcast(probes), Seq("cell"))
          .select(col("query_id"), col("vec_id"),
            GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
        val approx = topK(scored, "query_id", "vec_id", k)
        annRecall(approx, exact)
          .agg(count(lit(1)).as("n_queries"),
            avg(col("recall")).as("mean_recall"))
          .select(lit(np.toLong).as("nprobe"), col("n_queries"),
            col("mean_recall"))
      }.reduce(_.unionByName(_))
      val w = org.apache.spark.sql.expressions.Window.orderBy("nprobe")
      perSetting
        .withColumn("__prev", lag(col("mean_recall"), 1).over(w))
        .select(col("nprobe"), col("n_queries"),
          col("mean_recall"),
          when(col("mean_recall") >= recallFloor, 1L).otherwise(0L)
            .as("floor_met"),
          when(col("__prev").isNull ||
            col("mean_recall") >= col("__prev"), 1L).otherwise(0L)
            .as("monotone_ok"),
          when(col("nprobe") < nl || col("mean_recall") === 1.0d, 1L)
            .otherwise(0L).as("full_probe_exact"))
    } finally cells.unpersist()
  }

  /**
   * IVF (inverted-file) approximate top-k — the classic ANN scale path the
   * LSH variant complements:
   *
   *  1. TRAIN: spherical k-means on a bounded driver-side sample (IVF
   *     training is always sample-based; the sample size, not the corpus,
   *     bounds driver memory).
   *  2. ASSIGN: every corpus vector gets its nearest-centroid cell id via a
   *     codegen'd expression — one map-only pass, reusable across query
   *     batches.
   *  3. PROBE: each query explodes into its `nprobe` nearest cells; only
   *     those cells' vectors are scored (|corpus|·nprobe/nlist comparisons).
   *
   * Same output shape as [[topKBruteForce]]; recall grows with nprobe.
   *
   * `nlist = 0` (the default) auto-sizes to `max(16, ceil(sqrt(n)))` from
   * one cheap corpus count — the standard IVF rule that keeps the cell
   * join's comparison volume ~|corpus|^1.5·nprobe instead of quadratic
   * when callers forget to scale the cell count with the corpus.
   */
  def topKIvf(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, nlist: Int = 0, nprobe: Int = 4,
              trainSample: Int = 4096, seed: Long = 42L): DataFrame = {
    val nl = resolveNlist(nlist, corpus)
    val sample = sampleVectors(corpus, corpusVec, trainSample)
    val centers = trainKmeans(sample, nl, iters = 10, seed)
    val cells = corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"),
      GraftFunctions.nearest_centroid(col(corpusVec), centers).as("cell"))
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      explode(GraftFunctions.nearest_centroids(col(queryVec), centers, nprobe)).as("cell"))
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    topK(scored, "query_id", "vec_id", k)
  }

  /**
   * RANGE search: every corpus vector with `cosine >= threshold` to each
   * query — the third member of the similarity-search triple (top-k =
   * [[topKBruteForce]]/[[topKIvf]], all-pairs graph = [[knnGraph]],
   * range = this). Retrieval wants top-k; DEDUP and recall-sweep
   * tooling want range: "everything at least this similar", however
   * many or few that is.
   *
   * 100 TB design: one map-side pass of the corpus against the
   * BROADCAST query batch (the [[topKBruteForce]] argument), and since
   * the threshold filter is per-row there is no per-query state at all
   * — no top-k buffer, no exchange except the output's own. An IVF
   * variant would prune candidates but make results depend on kmeans
   * geometry; range semantics exist precisely to be exhaustive, so this
   * stays exact by construction.
   *
   * Output: (query_id, vec_id, cosine), unranked — callers sort or
   * aggregate as needed. Self-pairs are NOT excluded (a query that is
   * also a corpus vector matches itself at cosine 1); exclude by id
   * downstream when unwanted.
   */
  def rangeSearch(corpus: DataFrame, corpusId: String, corpusVec: String,
                  queries: DataFrame, queryId: String, queryVec: String,
                  threshold: Double): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"cosine threshold must be in [-1, 1], got $threshold")
    corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
      .crossJoin(broadcast(
        queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"))))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /**
   * Matryoshka two-stage top-k: rank candidates on the embedding's first
   * `prefixDims` dimensions, then re-rank the per-query shortlist on the
   * full vector — the retrieval recipe matryoshka-representation-trained
   * embedding models are built for (prefixes of an MRL embedding are
   * themselves valid lower-dimensional embeddings).
   *
   * Scale shape: stage 1 is [[topKBruteForce]]'s broadcast map-only pass
   * but touching `prefixDims/dim` of each vector's floats (with the
   * prefix stored as its own column — the natural MRL layout — the scan
   * reads only that column: a 16-of-64 prefix cuts stage-1 I/O and
   * FLOPs 4x); map-side `top_k_by` combining reduces the exchange to
   * `nCandidates` rows per query. Stage 2 re-reads full vectors for the
   * `|queries|·nCandidates` shortlist ONLY (one hash join on the
   * candidate ids — AQE broadcasts the shortlist side) and rescores.
   * Both stages are deterministic (score desc, id asc), so the exact SQL
   * replay grades the REAL approximate configuration, not a degenerate
   * exact one; recall vs brute force at mismatched prefixes is
   * property-tested separately.
   *
   * Output shape matches [[topKBruteForce]]: (query_id, vec_id, cosine,
   * rank) with rank 1..k by full-vector cosine.
   */
  def topKMatryoshka(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int, prefixDims: Int, nCandidates: Int = 0): DataFrame = {
    require(prefixDims >= 1, s"prefixDims must be >= 1, got $prefixDims")
    val nCand = if (nCandidates <= 0) 4 * k else nCandidates
    require(nCand >= k, s"nCandidates ($nCand) must be >= k ($k)")
    val q = broadcast(
      queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec")))
    val c = corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
    val stage1 = c.crossJoin(q)
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(
          slice(col("cvec"), 1, prefixDims),
          slice(col("qvec"), 1, prefixDims)).as("cosine"))
    val shortlist = topK(stage1, "query_id", "vec_id", nCand)
      .select("query_id", "vec_id")
    val rescored = c.join(broadcast(shortlist), Seq("vec_id"))
      .join(q, Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    topK(rescored, "query_id", "vec_id", k)
  }

  /**
   * Build a PERSISTED IVF index — the production shape [[topKIvf]]'s
   * one-shot form amortizes away: train + assign are the only passes
   * that touch the corpus, so building ONCE and probing many query
   * batches turns the per-call corpus scan into an index-table scan.
   * Returns two DataFrames to store (ideally in graft tables):
   *
   *  - centroids: `(cell int, center array<float>)` — `nlist` rows, the
   *    trained codebook (tiny; collected once per probing session);
   *  - assignments: `(vec_id, cell, cvec)` — one row per corpus vector.
   *    Identity-partition the table by `cell` and low-`nprobe` probes
   *    PARTITION-PRUNE the scan itself: a query batch probing 4 of 256
   *    cells reads ~1.6% of a 100 TB index from storage, which no
   *    recompute-per-call plan can do.
   *
   * Floats round-trip parquet bit-exactly, so a reloaded index scores
   * identically to the in-memory one (e47 proves it through a real
   * catalog-table round trip against the brute-force oracle).
   */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int = 0, trainSample: Int = 4096,
                    seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val nl = resolveNlist(nlist, corpus)
    val sample = sampleVectors(corpus, vecCol, trainSample)
    val centers = trainKmeans(sample, nl, iters = 10, seed)
    // nullable array elements: the encoder's non-null element type does
    // not survive a cast against parquet-convention table schemas.
    // coalesce(1): bounded driver state — a local Seq toDF splits one
    // partition PER ROW (capped at defaultParallelism), so persisting the
    // table wrote nlist one-row files through nlist tasks (r18 legprobe:
    // the write JOB, not the metadata commit, was the index-build append
    // cost); one task → one right-sized file, one footer read, one
    // manifest entry
    val centroids = centers.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "center")
      .select(col("cell"), col("center").cast("array<float>").as("center"))
      .coalesce(1)
    val assignments = corpus.select(col(idCol).as("vec_id"),
      GraftFunctions.nearest_centroid(col(vecCol), centers).as("cell"),
      col(vecCol).as("cvec"))
    (centroids, assignments)
  }

  /** Collect a [[buildIvfIndex]] centroids table (cell-indexed codebook)
    * to the driver — `nlist` rows by construction, the bounded artifact
    * every probe/assign session loads once. */
  private def collectCentroids(centroids: DataFrame): Array[Array[Float]] = {
    val centers: Array[Array[Float]] = centroids.select("cell", "center")
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Float](1).toArray)
    require(centers.nonEmpty, "centroids table is empty")
    centers
  }

  /**
   * Assign a DELTA of new vectors to an EXISTING index's cells — the
   * incremental-maintenance half of [[buildIvfIndex]]: appending the
   * returned `(vec_id, cell, cvec)` rows to the persisted assignments
   * table keeps the index exactly equivalent to a fresh re-assignment of
   * the whole corpus under the SAME centroids (cell assignment is a pure
   * per-vector function of the codebook), so the index never silently
   * staleness-drifts as the corpus grows. Map-only — one codegen pass
   * over the delta, no shuffle, and since it is a pure projection it
   * works unchanged on a STREAMING frame
   * ([[graft.streaming.StreamingOps.ivfIndexStream]] wires it into a
   * foreachBatch append).
   *
   * Re-TRAINING (new centroids when the data distribution drifts far
   * from the codebook) is deliberately a rebuild, not an increment:
   * changed centroids invalidate every existing assignment.
   */
  def assignToIndex(delta: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame): DataFrame = {
    val centers = collectCentroids(centroids)
    delta.select(col(idCol).as("vec_id"),
      GraftFunctions.nearest_centroid(col(vecCol), centers).as("cell"),
      col(vecCol).as("cvec"))
  }

  /** Probe a persisted IVF index ([[buildIvfIndex]]'s two tables, read
    * back from storage): same probe → cell join → exact-rerank plan as
    * [[topKIvf]] steps 3–5, but the assignment side is a table scan —
    * partition-prunable on `cell` — instead of a corpus recompute. Full
    * probe (`nprobe` = cell count) is provably exact, like [[topKIvf]].
    *
    * `allowIds` is FILTERED vector search — top-k restricted to an
    * allow-listed id subset (the "vectors whose document passes this
    * metadata predicate" query every RAG stack runs). The index cannot
    * pre-bake an arbitrary predicate, so the filter applies at query
    * time as a semi-join on the assignments BEFORE any distance math:
    * cell pruning cuts files, the semi-join cuts the survivors, and
    * only allowed candidates ever reach the cosine kernel. The allow
    * list may be corpus-sized (it rides a hash semi-join, nothing is
    * collected); at full probe the result provably equals brute force
    * over the filtered corpus, which is how the oracle grades it. A
    * highly selective filter plus small `nprobe` degrades recall (few
    * allowed ids inside probed cells) — raise `nprobe` as selectivity
    * rises, the standard filtered-ANN tradeoff. */
  def topKIvfFromIndex(centroids: DataFrame, assignments: DataFrame,
                       queries: DataFrame, queryId: String, queryVec: String,
                       k: Int, nprobe: Int = 4,
                       allowIds: Option[DataFrame] = None): DataFrame = {
    val centers = collectCentroids(centroids)
    // materialized ONCE (query-batch-sized — it is broadcast below):
    // the probed-cell set is collected AND joined; without pinning, a
    // nondeterministic `queries` plan (e.g. a sample) could re-evaluate
    // differently between the two uses and silently prune a probed cell
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      explode(GraftFunctions.nearest_centroids(col(queryVec), centers, nprobe)).as("cell"))
      .localCheckpoint()
    // STATIC cell pruning: the probed cell set is bounded by the CELL
    // COUNT (≤ nlist distinct values, whatever the query batch size), so
    // collecting it is O(nlist) and turns the join's implicit cell
    // restriction into an explicit IN filter the scan can push down — on
    // a cell-identity-partitioned index table, manifest pruning then
    // skips every unprobed partition's files before a byte is read. A
    // full probe collects all cells and the filter is a no-op.
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val pruned =
      if (probedCells.length >= centers.length) assignments
      else assignments.where(col("cell")
        .isin(probedCells.toIndexedSeq.map(Int.box): _*))
    val allowed = allowIds match {
      case Some(ids) => pruned.join(
        ids.select(col(ids.columns.head).as("vec_id")),
        Seq("vec_id"), "left_semi")
      case None => pruned
    }
    val scored = allowed
      .select(col("cell"), col("vec_id"), col("cvec"))
      .join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    topK(scored, "query_id", "vec_id", k)
  }

  /**
   * All-pairs k-NN GRAPH over the corpus — every vector's top-k nearest
   * neighbors among all OTHER vectors: the primitive under SemDeDup-style
   * semantic clustering, graph-based near-dup mining, and label
   * propagation. Unlike the query-batch paths, BOTH sides are the corpus,
   * so nothing is broadcast:
   *
   *  1. TRAIN: the same bounded-sample spherical k-means as [[topKIvf]].
   *  2. ASSIGN: every vector → its nearest-centroid cell (map-only).
   *  3. PROBE: every vector → its `nprobe` nearest cells (map-only
   *     explode).
   *  4. JOIN: probes ⋈ assignments on the cell id — a SHUFFLE hash join;
   *     both sides hash-partition by cell, so the comparison volume is
   *     ~|corpus|·nprobe/nlist per vector and no single task ever holds
   *     the corpus. A hot cell splits under AQE skew handling; `nlist = 0`
   *     (the default) auto-sizes to `max(16, ceil(sqrt(n)))` from one
   *     cheap corpus count, so cells stay executor-sized and the join
   *     stays sub-quadratic without the caller having to re-tune per
   *     corpus.
   *  5. RERANK: exact cosine + per-vector top-k via the map-side-
   *     combining [[GraftFunctions.top_k_by]] aggregate (the exchange
   *     after scoring carries vectors×k pairs, not the candidate set).
   *
   * Self-pairs are excluded. At nprobe == nlist every (a,b) pair meets
   * exactly once (b lives in exactly ONE cell and a probes every cell),
   * so the graph provably equals brute force — the oracle-checked
   * configuration; approximate nprobe settings are recall-tested in the
   * spec. Output: (src_id, nbr_id, cosine, rank), rank 1..k per src.
   */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int, nlist: Int = 0, nprobe: Int = 4,
               trainSample: Int = 4096, seed: Long = 42L): DataFrame = {
    val nl = resolveNlist(nlist, corpus)
    val sample = sampleVectors(corpus, vecCol, trainSample)
    val centers = trainKmeans(sample, nl, iters = 10, seed)
    // SALT the cell key when there are fewer cells than the cluster has
    // cores: a join on `nl` distinct keys bottoms out at `nl` reducers no
    // matter how many exist — local[32] masks this (16 keys ≈ 32
    // partitions; A/B showed no local delta), but 1000 executors against
    // a hand-set nlist=16 would idle 98% of the cluster, and AQE splits
    // by SIZE skew, not key cardinality. Each PROBE row takes one
    // deterministic salt; each assignment row replicates to all salts, so
    // every (probe, neighbor) pair still meets exactly once and the pair
    // set is UNCHANGED. The assignment side is the one replicated because
    // it is the smaller side by ×nprobe (n rows vs n×nprobe probe rows);
    // salts = 1 (zero overhead) whenever nl already exceeds ~4×
    // parallelism, which the auto-sqrt(n) nlist does at any real corpus.
    val parts = corpus.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val salts = math.min(64, math.max(1, (4 * parts + nl - 1) / nl))
    val cells = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cvec"),
        GraftFunctions.nearest_centroid(col(vecCol), centers).as("cell"))
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
    val probes = corpus.select(col(idCol).as("src_id"), col(vecCol).as("qvec"),
        explode(GraftFunctions.nearest_centroids(col(vecCol), centers, nprobe)).as("cell"))
      .withColumn("__salt",
        pmod(xxhash64(col("src_id")), lit(salts.toLong)).cast("int"))
    // SHUFFLE_HASH hint: the documented plan — both sides hash-partition
    // by cell, the n-row assignment side builds per-partition maps. Left
    // to itself AQE sees two "small" inputs at test scale and broadcasts
    // one side, which silently serializes the O(n²·nprobe/nlist) pair
    // loop onto the INPUT's partition count (one parquet file = one
    // core; measured 5x slower at sf1, SCALE.md). At real scale neither
    // side is broadcastable and the hint simply pins the strategy the
    // shuffle would pick anyway.
    val scored = cells.hint("shuffle_hash").join(probes, Seq("cell", "__salt"))
      .where(col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("nbr_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    topK(scored, "src_id", "nbr_id", k)
  }

  /** Top-k per group via the map-side-combining [[GraftFunctions.top_k_by]]
    * aggregate — each map partition reduces to ≤ k pairs per group BEFORE
    * the shuffle, vs a `row_number` window that sorts every candidate row
    * behind an exchange of all of them. Output mirrors the window form:
    * (group, id, cosine, rank), rank 1..k by (cosine DESC, id ASC). */
  private def topK(scored: DataFrame, groupCol: String, idCol: String,
                   k: Int): DataFrame =
    topKBy(scored, groupCol, idCol, "cosine", k)

  /** Same as [[topK]] with the score column name parameterized (the MIPS
    * paths rank by raw dot product, not cosine; BM25 retrieval in
    * [[CorpusOps.bm25TopK]] ranks by the rounded BM25 sum). */
  private[ops] def topKBy(scored: DataFrame, groupCol: String, idCol: String,
                          scoreCol: String, k: Int): DataFrame =
    scored.groupBy(groupCol)
      .agg(GraftFunctions.top_k_by(col(scoreCol), col(idCol), k).as("__topk"))
      .select(col(groupCol), posexplode(col("__topk")))
      .select(col(groupCol), col("col.id").as(idCol),
        col("col.score").as(scoreCol), (col("pos") + 1).cast("int").as("rank"))

  /**
   * Deterministic PSEUDO-RANDOM training sample of up to `n` vectors —
   * the trainer front-end for every codebook in this file (IVF cells,
   * PQ subspaces, semantic-dedup clusters).
   *
   * NOT `limit(n)`: a bare limit takes the FIRST n rows, and at 100 TB
   * corpus layout follows ingest time/source — a codebook trained on one
   * source's prefix quantizes the rest of the corpus badly, so IVF/PQ
   * pruning power quietly collapses corpus-wide (results stay correct —
   * full probes and the residual bounds are unconditional — but the plan
   * degrades toward brute force). Ordering by `xxhash64(vector)` makes
   * the sample a uniform draw over the corpus REGARDLESS of physical
   * layout, while staying RNG-free: the same corpus always yields the
   * same sample (and the same trained model), independent of
   * partitioning and row order. `orderBy(hash).limit(n)` plans as
   * `TakeOrderedAndProject` — a per-partition partial top-n merged on
   * the driver, never a global sort.
   */
  private[ops] def sampleVectors(corpus: DataFrame, vecCol: String,
                                 n: Int): Array[Array[Float]] =
    corpus.select(col(vecCol).as("__v")).where(col("__v").isNotNull)
      .orderBy(xxhash64(col("__v")))
      .limit(n).collect().map(_.getSeq[Float](0).toArray)

  /** `nlist = 0` → `max(16, ceil(sqrt(n)))` via one corpus count (cheap:
    * column-pruned parquet count, or metadata-only on a graft scan). An
    * explicit positive nlist is passed through; anything else is loud. */
  private def resolveNlist(nlist: Int, corpus: DataFrame): Int = {
    require(nlist >= 0, s"nlist must be >= 0 (0 = auto), got $nlist")
    if (nlist > 0) nlist
    else math.max(16, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)
  }

  /** Deterministic spherical k-means on a driver-side sample: seeded
    * distinct-point init, cosine assignment, mean re-centering.
    *
    * The assignment pass is CHUNK-PARALLEL with a FIXED chunk count:
    * training is O(sample·k·dim·iters) and k grows as sqrt(corpus)
    * under the auto-nlist rule, so at 20k vectors the single-threaded
    * loop was already the dominant cost of the whole approximate
    * kNN-graph query (measured at sf1, SCALE.md). Per-chunk partial
    * sums combine in chunk-INDEX order, so the result stays BITWISE
    * deterministic — independent of cores and scheduling — exactly like
    * the sequential form (the [[kmeansFit]] reproducibility argument,
    * solved here by fixed association instead of fixed-point). */
  private[ops] def trainKmeans(sample: Array[Array[Float]], kCenters: Int,
                               iters: Int, seed: Long): Array[Array[Float]] = {
    require(sample.nonEmpty, "IVF training requires a non-empty sample")
    val dim = sample.head.length
    var x = seed
    def nextIdx(bound: Int): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (((x >>> 1) % bound).toInt + bound) % bound
    }
    val n = math.min(kCenters, sample.length)
    val centers = Array.tabulate(n)(_ => new Array[Float](dim))
    val picked = scala.collection.mutable.Set[Int]()
    for (c <- 0 until n) {
      var i = nextIdx(sample.length)
      while (picked.contains(i)) i = (i + 1) % sample.length
      picked += i
      System.arraycopy(sample(i), 0, centers(c), 0, dim)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    for (_ <- 0 until iters) {
      val (sums, counts) = chunkedAssign(sample, dim, n) { v =>
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < n) {
          val s = cos(v, centers(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        best
      }
      for (c <- 0 until n if counts(c) > 0; i <- 0 until dim)
        centers(c)(i) = (sums(c)(i) / counts(c)).toFloat
    }
    centers
  }

  /** One Lloyd assignment-and-sum pass, parallel over a FIXED 64 chunks
    * of the sample (index-ordered combine ⇒ bitwise-deterministic sums
    * regardless of core count). `assign` returns the center index for a
    * vector; within a chunk, accumulation is sequential in sample
    * order. */
  private def chunkedAssign(sample: Array[Array[Float]], dim: Int, n: Int)(
      assign: Array[Float] => Int): (Array[Array[Double]], Array[Int]) = {
    val chunks = 64
    val per = (sample.length + chunks - 1) / chunks
    val parts = (0 until chunks).toArray
    val results = new Array[(Array[Array[Double]], Array[Int])](chunks)
    import scala.collection.parallel.CollectionConverters._
    parts.par.foreach { ci =>
      val lo = ci * per
      val hi = math.min(sample.length, lo + per)
      val s = Array.fill(n)(new Array[Double](dim))
      val cnt = new Array[Int](n)
      var j = lo
      while (j < hi) {
        val v = sample(j)
        val best = assign(v)
        cnt(best) += 1
        var i = 0
        while (i < dim) { s(best)(i) += v(i); i += 1 }
        j += 1
      }
      results(ci) = (s, cnt)
    }
    val sums = Array.fill(n)(new Array[Double](dim))
    val counts = new Array[Int](n)
    var ci = 0
    while (ci < chunks) {
      val (s, cnt) = results(ci)
      var c = 0
      while (c < n) {
        counts(c) += cnt(c)
        var i = 0
        while (i < dim) { sums(c)(i) += s(c)(i); i += 1 }
        c += 1
      }
      ci += 1
    }
    (sums, counts)
  }

  /** Deterministic EUCLIDEAN k-means on a driver-side sample — the PQ
    * codebook trainer. Same seeded distinct-point init as [[trainKmeans]];
    * L2 assignment because the PQ error bound is in terms of the L2
    * residual `||v − v̂||` (which the codebook should minimize). Returns
    * exactly `kCenters` centers: when the sample has fewer distinct points
    * the tail repeats center 0 (every code stays decodable — repeated
    * centers are merely never chosen by argmin). */
  private[graft] def trainKmeansL2(sample: Array[Array[Float]], kCenters: Int,
                                 iters: Int, seed: Long): Array[Array[Float]] = {
    require(sample.nonEmpty, "PQ training requires a non-empty sample")
    val dim = sample.head.length
    var x = seed
    def nextIdx(bound: Int): Int = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (((x >>> 1) % bound).toInt + bound) % bound
    }
    val n = math.min(kCenters, sample.length)
    val centers = Array.tabulate(kCenters)(_ => new Array[Float](dim))
    val picked = scala.collection.mutable.Set[Int]()
    for (c <- 0 until n) {
      var i = nextIdx(sample.length)
      while (picked.contains(i)) i = (i + 1) % sample.length
      picked += i
      System.arraycopy(sample(i), 0, centers(c), 0, dim)
    }
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    for (_ <- 0 until iters) {
      val (sums, counts) = chunkedAssign(sample, dim, n) { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < n) {
          val d = d2(v, centers(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      for (c <- 0 until n if counts(c) > 0; i <- 0 until dim)
        centers(c)(i) = (sums(c)(i) / counts(c)).toFloat
    }
    for (c <- n until kCenters)
      System.arraycopy(centers(0), 0, centers(c), 0, dim)
    centers
  }

  /**
   * Scalar-quantized (SQ8) top-k by INNER PRODUCT with error-bounded exact
   * re-ranking — PROVABLY exact at every setting (unlike recall-tuned ANN):
   *
   *  1. STATS: per-dimension [min,max] over the corpus (one treeAggregate;
   *     the driver holds 2×dim floats, never vectors).
   *  2. SCORE: each corpus vector quantizes to 8-bit codes on the grid and
   *     scores against the full-precision query (asymmetric SQ) via a
   *     codegen'd expression. At 100 TB the codes would be a STORED column
   *     — 4× less scan IO than float32 — with the same scoring expression.
   *  3. BOUND: per-dim quantization error ≤ step/2, so any score is within
   *     E(q) = Σ|q_i|·step_i/2 of the true dot. The k-th best quantized
   *     score τ therefore admits only vectors with quantized score
   *     ≥ τ − 2E(q) into the true top-k — everything else is provably out.
   *  4. RESCORE: exact dot product over that candidate set only; top-k.
   *
   * Same output shape as [[topKBruteForce]] (rank by dot, ties on id).
   */
  def topKSq8(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, dim: Int): DataFrame = {
    val zero = (Array.fill(dim)(Float.MaxValue), Array.fill(dim)(Float.MinValue))
    val (mins, maxs) = corpus.select(col(corpusVec)).rdd.treeAggregate(zero)(
      seqOp = { case ((mn, mx), row) =>
        val v = row.getSeq[Float](0)
        var i = 0
        val n = math.min(dim, v.length)
        while (i < n) {
          if (v(i) < mn(i)) mn(i) = v(i)
          if (v(i) > mx(i)) mx(i) = v(i)
          i += 1
        }
        (mn, mx)
      },
      combOp = { case ((m1, x1), (m2, x2)) =>
        var i = 0
        while (i < dim) {
          if (m2(i) < m1(i)) m1(i) = m2(i)
          if (x2(i) > x1(i)) x1(i) = x2(i)
          i += 1
        }
        (m1, x1)
      })
    val steps = Array.tabulate(dim)(i =>
      if (maxs(i) <= mins(i)) 0f else (maxs(i) - mins(i)) / 255f)

    val qdf = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"))
    val scored = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
      .crossJoin(broadcast(qdf))
      .select(col("query_id"), col("vec_id"), col("cvec"), col("qvec"),
        GraftFunctions.sq8_dot(col("cvec"), col("qvec"), mins, steps).as("approx"))
    // τ per query = the k-th best quantized score, via the map-side-
    // combining top_k_by aggregate — the exchange carries ≤ k pairs per
    // query, where the old row_number window shuffled and sorted the whole
    // corpus × queries product. τ is absent when the corpus holds fewer
    // than k vectors — then everything is a candidate anyway.
    val taus = scored.groupBy("query_id")
      .agg(GraftFunctions.top_k_by(col("approx"), col("vec_id"), k).as("__tk"))
      .select(col("query_id"),
        when(size(col("__tk")) >= k,
          element_at(col("__tk"), k).getField("score")).as("tau"))
    // E(q) in double, plus an epsilon absorbing float rounding in the
    // quantize/dequantize round-trip (only ADDS candidates, never drops)
    val errs = qdf.select(col("query_id"),
      (aggregate(
        zip_with(col("qvec"), lit(steps), (q, s) => abs(q).cast("double") * s.cast("double")),
        lit(0.0), (acc, x) => acc + x) / 2.0 + lit(1e-6)).as("err"))
    val candidates = scored
      .join(broadcast(taus), Seq("query_id"), "left")
      .join(broadcast(errs), Seq("query_id"))
      .where(col("tau").isNull || col("approx") >= col("tau") - lit(2.0) * col("err"))
    val rescored = candidates.select(col("query_id"), col("vec_id"),
      GraftFunctions.dot_product(col("cvec"), col("qvec")).as("dot"))
    topKBy(rescored, "query_id", "vec_id", "dot", k)
  }

  /**
   * Product-quantized (PQ) top-k by INNER PRODUCT with per-vector
   * error-bounded exact re-ranking — like [[topKSq8]], PROVABLY exact at
   * every setting; codebook quality only changes how many candidates the
   * bound admits, never the answer:
   *
   *  1. TRAIN: the vector splits into `m` subspaces of `dim/m` dims; each
   *     subspace gets a `ksub`-centroid EUCLIDEAN k-means codebook from a
   *     bounded driver-side sample (codebooks are m·ksub·dsub floats — KBs,
   *     broadcast as codegen reference objects).
   *  2. ENCODE: one map pass turns each corpus vector into `m` code bytes
   *     plus its residual norm `resid = ||v − v̂||` (codegen'd expression).
   *     At 100 TB this output is a STORED column: m+8 bytes/vector vs
   *     4·dim — a 16–32× scan-IO reduction, recomputed only on re-train.
   *  3. SCORE: each query precomputes its ADC lookup table once (m·ksub
   *     centroid dots); every (query, vector) pair then costs `m` array
   *     lookups — `pq_adc` = dot(v̂, q) exactly, in double.
   *  4. BOUND: |dot(v,q) − adc| ≤ ||q||·resid by Cauchy–Schwarz — a
   *     PER-VECTOR bound (tighter than SQ8's uniform per-query E(q)).
   *     τ = the k-th largest LOWER bound (adc − ||q||·resid) per query;
   *     only vectors whose UPPER bound reaches τ can be in the true
   *     top-k, since the true k-th best dot is ≥ τ.
   *  5. RESCORE: exact dot over the admitted candidates only; final
   *     top-k via the map-side-combining [[GraftFunctions.top_k_by]]
   *     aggregate (τ is computed the same way — no `row_number` window
   *     ever sees the full cross product behind an exchange).
   *
   * The scored frame is traversed twice (once for τ, once for the
   * candidate filter) — two scans of the m-byte codes, which at scale is
   * still far cheaper than one scan of the raw vectors. Output shape
   * matches [[topKSq8]]: (query_id, vec_id, dot, rank), ties on id.
   *
   * PRUNING POWER tracks how compressible the corpus is (SCALE.md r11):
   * near-uniform random unit vectors are incompressible (avg residual
   * ≈ 0.76·‖v‖ at m=8 — the bound admits ~100% of the corpus and the
   * path degrades gracefully to brute force plus an encode pass), while
   * a 64-cluster corpus quantizes to avg residual 0.27 and the bound
   * admits ~8% of the cross product. Real embedding corpora cluster.
   */
  def topKPq(corpus: DataFrame, corpusId: String, corpusVec: String,
             queries: DataFrame, queryId: String, queryVec: String,
             k: Int, dim: Int, m: Int = 8, ksub: Int = 16,
             trainSample: Int = 4096, seed: Long = 42L): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1,256], got $ksub")
    val dsub = dim / m
    val codebooks = trainPqCodebooks(corpus, corpusVec, dim, m, ksub,
      trainSample, seed)
    val enc = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"),
        GraftFunctions.pq_encode(col(corpusVec), codebooks, m, ksub, dsub).as("__pq"))
      .select(col("vec_id"), col("cvec"),
        col("__pq.codes").as("codes"), col("__pq.resid").as("resid"))
    val qdf = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      GraftFunctions.pq_lut(col(queryVec), codebooks, m, ksub, dsub).as("lut"),
      sqrt(GraftFunctions.dot_product(col(queryVec), col(queryVec))).as("qnorm"))
    val bounded = enc.crossJoin(broadcast(qdf))
      .select(col("query_id"), col("vec_id"), col("cvec"), col("qvec"),
        GraftFunctions.pq_adc(col("codes"), col("lut"), ksub).as("adc"),
        // epsilon absorbs double rounding in the lut sums — only ever ADDS
        // candidates, never drops one
        (col("qnorm") * col("resid") + lit(1e-6)).as("err"))
    // τ per query = k-th largest lower bound, via the same combining
    // aggregate as the final rank (absent when the corpus holds fewer than
    // k vectors — then everything is a candidate anyway)
    val taus = bounded
      .groupBy("query_id")
      .agg(GraftFunctions.top_k_by(col("adc") - col("err"), col("vec_id"), k).as("__tk"))
      .select(col("query_id"),
        when(size(col("__tk")) >= k,
          element_at(col("__tk"), k).getField("score")).as("tau"))
    val candidates = bounded
      .join(broadcast(taus), Seq("query_id"), "left")
      .where(col("tau").isNull || col("adc") + col("err") >= col("tau"))
    val rescored = candidates.select(col("query_id"), col("vec_id"),
      GraftFunctions.dot_product(col("cvec"), col("qvec")).as("dot"))
    topKBy(rescored, "query_id", "vec_id", "dot", k)
  }

  /** Per-subspace PQ codebook trainer shared by the one-shot and
    * persisted-index paths: Euclidean k-means per subspace over ONE
    * deterministic hash-ordered sample, packed `(s*ksub + c)*dsub`. */
  private def trainPqCodebooks(corpus: DataFrame, vecCol: String, dim: Int,
                               m: Int, ksub: Int, trainSample: Int,
                               seed: Long): Array[Float] = {
    val dsub = dim / m
    val sample: Array[Array[Float]] =
      sampleVectors(corpus, vecCol, trainSample).map(_.padTo(dim, 0f))
    val codebooks = new Array[Float](m * ksub * dsub)
    for (s <- 0 until m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val centers = trainKmeansL2(sub, ksub, iters = 10, seed + s)
      for (c <- 0 until ksub)
        System.arraycopy(centers(c), 0, codebooks, (s * ksub + c) * dsub, dsub)
    }
    codebooks
  }

  /**
   * Build a PERSISTED PQ index — [[buildIvfIndex]]'s treatment for the
   * compressed-scan half of ANN. Returns two DataFrames to store:
   *
   *  - codebook: `(subspace int, code int, center array<float>)` —
   *    `m*ksub` rows, the trained quantizer (tiny; collected once per
   *    search session);
   *  - codes: `(vec_id, codes array<int>, resid double)` — the stored
   *    index column: the scan a query batch pays is these few bytes per
   *    vector, NOT the raw embeddings. Raw vectors stay in the base
   *    table and are touched only for the bound-admitted candidates.
   *
   * Floats/ints/doubles round-trip parquet bit-exactly, so a reloaded
   * index admits and ranks identically to the in-memory one; with the
   * unconditional residual bound the search stays provably exact at any
   * codebook quality (e56 proves it through a catalog round trip against
   * the brute-force MIPS oracle).
   */
  def buildPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   dim: Int, m: Int = 8, ksub: Int = 16,
                   trainSample: Int = 4096, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1,256], got $ksub")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dsub = dim / m
    val cb = trainPqCodebooks(corpus, vecCol, dim, m, ksub, trainSample, seed)
    val rows = for (s <- 0 until m; c <- 0 until ksub)
      yield (s, c, cb.slice((s * ksub + c) * dsub, (s * ksub + c + 1) * dsub).toSeq)
    // coalesce(1): m·ksub bounded driver-state rows (see buildIvfIndex)
    val codebook = rows.toDF("subspace", "code", "center")
      .select(col("subspace"), col("code"),
        col("center").cast("array<float>").as("center"))
      .coalesce(1)
    val codes = corpus
      .select(col(idCol).as("vec_id"),
        GraftFunctions.pq_encode(col(vecCol), cb, m, ksub, dsub).as("__pq"))
      .select(col("vec_id"), col("__pq.codes").as("codes"),
        col("__pq.resid").as("resid"))
    (codebook, codes)
  }

  /** Collect a [[buildPqIndex]] codebook table back to the packed driver
    * array — `m*ksub` rows by construction. Returns (codebooks, m, ksub,
    * dsub). */
  private def collectPqCodebooks(codebook: DataFrame): (Array[Float], Int, Int, Int) = {
    val rows = codebook.select("subspace", "code", "center").collect()
    require(rows.nonEmpty, "PQ codebook table is empty")
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val dsub = rows.head.getSeq[Float](2).size
    require(rows.length == m * ksub, s"codebook must hold m*ksub rows, " +
      s"got ${rows.length} for m=$m ksub=$ksub")
    val cb = new Array[Float](m * ksub * dsub)
    rows.foreach { r =>
      val c = r.getSeq[Float](2)
      require(c.size == dsub, "ragged codebook centers")
      c.copyToArray(cb, (r.getInt(0) * ksub + r.getInt(1)) * dsub)
    }
    (cb, m, ksub, dsub)
  }

  /**
   * Encode a DELTA of new vectors against an EXISTING PQ codebook — the
   * incremental-maintenance half of [[buildPqIndex]], mirroring
   * [[assignToIndex]] for IVF: appending the returned `(vec_id, codes,
   * resid)` rows keeps the codes table complete as the corpus grows, and
   * because the residual bound is UNCONDITIONAL the search stays provably
   * exact even though the codebook never saw the delta's distribution
   * (compression quality degrades, candidate counts grow, correctness
   * does not — the e45 argument). Map-only; a pure projection, so it
   * works unchanged in a streaming foreachBatch append. Re-training is
   * deliberately a rebuild: a changed codebook invalidates every code.
   */
  def encodeToPqIndex(delta: DataFrame, idCol: String, vecCol: String,
                      codebook: DataFrame): DataFrame = {
    val (cb, m, ksub, dsub) = collectPqCodebooks(codebook)
    delta
      .select(col(idCol).as("vec_id"),
        GraftFunctions.pq_encode(col(vecCol), cb, m, ksub, dsub).as("__pq"))
      .select(col("vec_id"), col("__pq.codes").as("codes"),
        col("__pq.resid").as("resid"))
  }

  /**
   * Search a persisted PQ index ([[buildPqIndex]]'s two tables, read back
   * from storage): the ADC + residual-bound candidate pass runs over the
   * COMPACT codes table (m ints + a double per vector — the whole point
   * of storing the index), and only bound-admitted candidates join back
   * to the base table for the exact dot-product re-rank (a hash join on
   * vec_id; AQE broadcasts the candidate side). Same unconditional
   * Cauchy-Schwarz bound as [[topKPq]], so the result provably equals
   * brute-force MIPS at any codebook quality.
   */
  def topKPqFromIndex(codebook: DataFrame, codes: DataFrame,
                      corpus: DataFrame, corpusId: String, corpusVec: String,
                      queries: DataFrame, queryId: String, queryVec: String,
                      k: Int): DataFrame = {
    val (cb, m, ksub, dsub) = collectPqCodebooks(codebook)
    val qdf = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).as("qvec"),
      GraftFunctions.pq_lut(col(queryVec), cb, m, ksub, dsub).as("lut"),
      sqrt(GraftFunctions.dot_product(col(queryVec), col(queryVec))).as("qnorm")))
    val bounded = codes.crossJoin(qdf)
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.pq_adc(col("codes"), col("lut"), ksub).as("adc"),
        (col("qnorm") * col("resid") + lit(1e-6)).as("err"))
    val taus = bounded
      .groupBy("query_id")
      .agg(GraftFunctions.top_k_by(col("adc") - col("err"), col("vec_id"), k).as("__tk"))
      .select(col("query_id"),
        when(size(col("__tk")) >= k,
          element_at(col("__tk"), k).getField("score")).as("tau"))
    val candidates = bounded
      .join(broadcast(taus), Seq("query_id"), "left")
      .where(col("tau").isNull || col("adc") + col("err") >= col("tau"))
      .select("query_id", "vec_id")
    val rescored = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
      .join(broadcast(candidates), Seq("vec_id"))
      .join(qdf.select(col("query_id"), col("qvec")), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.dot_product(col("cvec"), col("qvec")).as("dot"))
    topKBy(rescored, "query_id", "vec_id", "dot", k)
  }

  /**
   * IVF+PQ top-k — the canonical billion-scale ANN architecture (an
   * inverted file prunes WHICH vectors are scored; product quantization
   * prunes HOW MUCH of each vector is read), composed from the same
   * pieces as [[topKIvf]] and [[topKPq]]:
   *
   *  1. TRAIN: IVF cell centers (bounded-sample spherical k-means) and
   *     per-subspace PQ codebooks (bounded-sample Euclidean k-means).
   *  2. ENCODE: ONE map pass emits (cell, codes, resid) per vector — at
   *     100 TB this is the stored index column: 4 + m + 8 bytes/vector.
   *  3. PROBE: each query explodes into its `nprobe` nearest cells and
   *     only those cells' codes are ADC-scored (lookup-table dots).
   *  4. BOUND + RESCORE: within the probed candidates, the per-vector
   *     residual bound (see [[topKPq]]) picks τ and admits only vectors
   *     whose upper bound reaches it; those are exactly re-scored.
   *
   * Semantics: EXACTLY the top-k among the PROBED cells' vectors (the PQ
   * bound never loses a probed candidate); cell recall is the only
   * approximation, governed by nprobe exactly as in [[topKIvf]]. At
   * nprobe = nlist every vector is probed, so the result provably equals
   * brute force — the oracle-checked configuration. Unlike FAISS-style
   * IVFPQ this encodes raw vectors, not per-cell residuals — the
   * exactness bound needs no re-derivation and codes are reusable across
   * re-clusterings; residual encoding would only tighten compression.
   */
  def topKIvfPq(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                k: Int, dim: Int, nlist: Int = 0, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 16,
                trainSample: Int = 4096, seed: Long = 42L): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1,256], got $ksub")
    val nl = resolveNlist(nlist, corpus)
    val dsub = dim / m
    val sample: Array[Array[Float]] =
      sampleVectors(corpus, corpusVec, trainSample).map(_.padTo(dim, 0f))
    val centers = trainKmeans(sample, nl, iters = 10, seed)
    val codebooks = new Array[Float](m * ksub * dsub)
    for (s <- 0 until m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val cs = trainKmeansL2(sub, ksub, iters = 10, seed + s)
      for (c <- 0 until ksub)
        System.arraycopy(cs(c), 0, codebooks, (s * ksub + c) * dsub, dsub)
    }
    val enc = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"),
        GraftFunctions.nearest_centroid(col(corpusVec), centers).as("cell"),
        GraftFunctions.pq_encode(col(corpusVec), codebooks, m, ksub, dsub).as("__pq"))
      .select(col("vec_id"), col("cvec"), col("cell"),
        col("__pq.codes").as("codes"), col("__pq.resid").as("resid"))
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
        explode(GraftFunctions.nearest_centroids(col(queryVec), centers, nprobe)).as("cell"),
        GraftFunctions.pq_lut(col(queryVec), codebooks, m, ksub, dsub).as("lut"),
        sqrt(GraftFunctions.dot_product(col(queryVec), col(queryVec))).as("qnorm"))
    val bounded = enc.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"), col("cvec"), col("qvec"),
        GraftFunctions.pq_adc(col("codes"), col("lut"), ksub).as("adc"),
        (col("qnorm") * col("resid") + lit(1e-6)).as("err"))
    val taus = bounded.groupBy("query_id")
      .agg(GraftFunctions.top_k_by(col("adc") - col("err"), col("vec_id"), k).as("__tk"))
      .select(col("query_id"),
        when(size(col("__tk")) >= k,
          element_at(col("__tk"), k).getField("score")).as("tau"))
    val candidates = bounded
      .join(broadcast(taus), Seq("query_id"), "left")
      .where(col("tau").isNull || col("adc") + col("err") >= col("tau"))
    val rescored = candidates.select(col("query_id"), col("vec_id"),
      GraftFunctions.dot_product(col("cvec"), col("qvec")).as("dot"))
    topKBy(rescored, "query_id", "vec_id", "dot", k)
  }

  /**
   * Build a PERSISTED IVF+PQ index — the [[topKIvfPq]] composition
   * through the real storage layer, the canonical billion-scale shape:
   * three DataFrames to store —
   *
   *  - centroids: [[buildIvfIndex]]'s `(cell, center)` codebook;
   *  - codebook: [[buildPqIndex]]'s `(subspace, code, center)` quantizer;
   *  - entries: `(vec_id, cell, codes array<int>, resid double)` — the
   *    stored index column, 4 + m·4 + 8 bytes per vector with NO raw
   *    vector copy (the IVF-only index stores `cvec` per row; here raw
   *    vectors stay solely in the base table and are read only for
   *    bound-admitted candidates). Partition the entries table by `cell`
   *    so probe-time manifest pruning skips unprobed partitions.
   *
   * Both trainers share ONE hash-ordered sample pass. Cell assignment
   * and PQ encoding are pure per-vector functions of the two codebooks,
   * so [[addToIvfPqIndex]] grows the index incrementally with map-only
   * delta passes.
   */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      dim: Int, nlist: Int = 0, m: Int = 8, ksub: Int = 16,
                      trainSample: Int = 4096, seed: Long = 42L)
      : (DataFrame, DataFrame, DataFrame) = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1,256], got $ksub")
    val spark = corpus.sparkSession
    import spark.implicits._
    val nl = resolveNlist(nlist, corpus)
    val dsub = dim / m
    val sample: Array[Array[Float]] =
      sampleVectors(corpus, vecCol, trainSample).map(_.padTo(dim, 0f))
    val centers = trainKmeans(sample, nl, iters = 10, seed)
    val cb = new Array[Float](m * ksub * dsub)
    for (s <- 0 until m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val cs = trainKmeansL2(sub, ksub, iters = 10, seed + s)
      for (c <- 0 until ksub)
        System.arraycopy(cs(c), 0, cb, (s * ksub + c) * dsub, dsub)
    }
    // coalesce(1) on both bounded driver-state tables (see buildIvfIndex):
    // without it, persisting them wrote one one-row file per centroid /
    // codebook row through as many tasks
    val centroids = centers.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "center")
      .select(col("cell"), col("center").cast("array<float>").as("center"))
      .coalesce(1)
    val cbRows = for (s <- 0 until m; c <- 0 until ksub)
      yield (s, c, cb.slice((s * ksub + c) * dsub, (s * ksub + c + 1) * dsub).toSeq)
    val codebook = cbRows.toDF("subspace", "code", "center")
      .select(col("subspace"), col("code"),
        col("center").cast("array<float>").as("center"))
      .coalesce(1)
    val entries = corpus
      .select(col(idCol).as("vec_id"),
        GraftFunctions.nearest_centroid(col(vecCol), centers).as("cell"),
        GraftFunctions.pq_encode(col(vecCol), cb, m, ksub, dsub).as("__pq"))
      .select(col("vec_id"), col("cell"),
        col("__pq.codes").as("codes"), col("__pq.resid").as("resid"))
    (centroids, codebook, entries)
  }

  /** Encode+assign a DELTA of new vectors against an EXISTING IVF+PQ
    * index's two codebooks — [[assignToIndex]] and [[encodeToPqIndex]] in
    * ONE map-only pass producing [[buildIvfPqIndex]]-shaped entry rows to
    * append. Both halves are pure per-vector functions of the persisted
    * codebooks, and the residual bound stays unconditional, so the grown
    * index searches exactly over the whole corpus (within the probed
    * cells) even though neither codebook saw the delta. */
  def addToIvfPqIndex(delta: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame, codebook: DataFrame): DataFrame = {
    val centers = collectCentroids(centroids)
    val (cb, m, ksub, dsub) = collectPqCodebooks(codebook)
    delta
      .select(col(idCol).as("vec_id"),
        GraftFunctions.nearest_centroid(col(vecCol), centers).as("cell"),
        GraftFunctions.pq_encode(col(vecCol), cb, m, ksub, dsub).as("__pq"))
      .select(col("vec_id"), col("cell"),
        col("__pq.codes").as("codes"), col("__pq.resid").as("resid"))
  }

  /**
   * Search a persisted IVF+PQ index ([[buildIvfPqIndex]]'s three tables,
   * read back from storage): probe → STATIC cell pruning (the probed-cell
   * IN filter reaches the entries scan, so a cell-partitioned table
   * manifest-prunes before a byte is read — the e47 argument) → ADC +
   * unconditional residual bound over the COMPACT entries (the e56
   * argument: m ints + a double per vector, never the raw embedding) →
   * exact dot-product re-rank joining ONLY bound-admitted candidates back
   * to the base table. Each vector lives in exactly one cell, so a
   * (query, vector) pair meets at most once — no dedup pass. Semantics =
   * [[topKIvfPq]]: exactly the top-k among the probed cells' vectors; at
   * `nprobe` = cell count the result provably equals brute-force MIPS.
   */
  def topKIvfPqFromIndex(centroids: DataFrame, codebook: DataFrame,
                         entries: DataFrame,
                         corpus: DataFrame, corpusId: String, corpusVec: String,
                         queries: DataFrame, queryId: String, queryVec: String,
                         k: Int, nprobe: Int = 4): DataFrame = {
    val centers = collectCentroids(centroids)
    val (cb, m, ksub, dsub) = collectPqCodebooks(codebook)
    // materialized ONCE (query-batch-sized — broadcast below): the
    // probed-cell set is collected AND joined; pinning keeps both uses on
    // the same evaluation even if `queries` is a nondeterministic plan
    val probes = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      explode(GraftFunctions.nearest_centroids(col(queryVec), centers, nprobe)).as("cell"),
      GraftFunctions.pq_lut(col(queryVec), cb, m, ksub, dsub).as("lut"),
      sqrt(GraftFunctions.dot_product(col(queryVec), col(queryVec))).as("qnorm"))
      .localCheckpoint()
    // static cell pruning: bounded by the CELL COUNT, not the query count
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val pruned =
      if (probedCells.length >= centers.length) entries
      else entries.where(col("cell")
        .isin(probedCells.toIndexedSeq.map(Int.box): _*))
    val bounded = pruned.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.pq_adc(col("codes"), col("lut"), ksub).as("adc"),
        (col("qnorm") * col("resid") + lit(1e-6)).as("err"))
    val taus = bounded.groupBy("query_id")
      .agg(GraftFunctions.top_k_by(col("adc") - col("err"), col("vec_id"), k).as("__tk"))
      .select(col("query_id"),
        when(size(col("__tk")) >= k,
          element_at(col("__tk"), k).getField("score")).as("tau"))
    val candidates = bounded
      .join(broadcast(taus), Seq("query_id"), "left")
      .where(col("tau").isNull || col("adc") + col("err") >= col("tau"))
      .select("query_id", "vec_id")
    val rescored = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
      .join(broadcast(candidates), Seq("vec_id"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qvec"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.dot_product(col("cvec"), col("qvec")).as("dot"))
    topKBy(rescored, "query_id", "vec_id", "dot", k)
  }

  /**
   * Build a PERSISTED SQ8 (int8 scalar-quantization) index — the stored
   * twin of [[topKSq8]]'s quantize-on-the-fly scoring (which re-reads
   * raw vectors per query batch), and the middle point of the
   * compression spectrum between the 1-bit binary codes
   * (e52) and PQ (e45/e56): ONE DataFrame to store, `(vec_id, codes
   * binary dim bytes, scale double, resid double)` — dim + 16 bytes per
   * vector vs 4·dim raw. Unlike IVF and PQ there is NO TRAINED STATE at
   * all: encoding is a pure per-vector function (map-only, zero
   * shuffle), so the index can never staleness-drift, incremental
   * maintenance is literally `append(buildSq8Index(delta))`, and the
   * same call works unchanged in a streaming foreachBatch.
   */
  def buildSq8Index(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(idCol).as("vec_id"),
        GraftFunctions.sq8_encode(col(vecCol)).as("__sq"))
      .select(col("vec_id"), col("__sq.codes").as("codes"),
        col("__sq.scale").as("scale"), col("__sq.resid").as("resid"))

  /**
   * Search a persisted SQ8 index: the approximate-dot pass reads ONLY
   * the compact codes (`sq8_codes_dot` = scale·Σ q_i·code_i, one codegen
   * kernel over sign-extended bytes), the per-vector residual bound
   * `‖q‖·resid` picks τ exactly as in [[topKPq]], and only
   * bound-admitted candidates join back to the base table for the exact
   * dot-product re-rank — so the result PROVABLY equals brute-force
   * MIPS at any quantization error (coarse vectors admit more
   * candidates; they never lose one). Same τ/candidate plan shape as
   * [[topKPqFromIndex]].
   */
  def topKSq8FromIndex(codes: DataFrame,
                       corpus: DataFrame, corpusId: String, corpusVec: String,
                       queries: DataFrame, queryId: String, queryVec: String,
                       k: Int): DataFrame = {
    val qdf = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).as("qvec"),
      sqrt(GraftFunctions.dot_product(col(queryVec), col(queryVec))).as("qnorm")))
    val bounded = codes.crossJoin(qdf)
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.sq8_codes_dot(col("codes"), col("scale"), col("qvec")).as("adc"),
        // epsilon absorbs double rounding in the kernel — only ever ADDS
        // candidates, never drops one (the topKPq argument)
        (col("qnorm") * col("resid") + lit(1e-6)).as("err"))
    val taus = bounded
      .groupBy("query_id")
      .agg(GraftFunctions.top_k_by(col("adc") - col("err"), col("vec_id"), k).as("__tk"))
      .select(col("query_id"),
        when(size(col("__tk")) >= k,
          element_at(col("__tk"), k).getField("score")).as("tau"))
    val candidates = bounded
      .join(broadcast(taus), Seq("query_id"), "left")
      .where(col("tau").isNull || col("adc") + col("err") >= col("tau"))
      .select("query_id", "vec_id")
    val rescored = corpus
      .select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"))
      .join(broadcast(candidates), Seq("vec_id"))
      .join(qdf.select(col("query_id"), col("qvec")), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.dot_product(col("cvec"), col("qvec")).as("dot"))
    topKBy(rescored, "query_id", "vec_id", "dot", k)
  }

  /** LSH-bucketed approximate top-k with multi-probe. Same output shape as
    * the brute-force path; recall depends on nbits/probeBits. */
  def topKLsh(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, dim: Int, nbits: Int = 8, probeBits: Int = 1): DataFrame = {
    val planes = GraftFunctions.makePlanes(nbits, dim)
    val bucketed = corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("cvec"),
      GraftFunctions.hyperplane_sig(col(corpusVec), planes).as("bucket"))
    val qsig = queries.select(col(queryId).as("query_id"), col(queryVec).as("qvec"),
      GraftFunctions.hyperplane_sig(col(queryVec), planes).as("qsig"))
    // multi-probe: the exact bucket plus every bucket within Hamming
    // distance `probeBits`; the XOR masks are constants, so the probe set
    // is a tiny driver-built literal array exploded per query. At
    // probeBits == nbits the probe set covers the whole code space, so the
    // result provably equals brute force (graceful degradation to exact —
    // the property the oracle-checked configuration uses). Masks are built
    // combinatorially (choose(k) over bit positions, k <= probeBits), never
    // by scanning 2^nbits codes — sum of C(nbits, k) terms, no Int overflow
    // at large nbits, no exponential driver loop at small probeBits.
    val masks: Seq[Int] = hammingMasks(nbits, probeBits)
    val probes = qsig.withColumn("bucket",
      explode(array(masks.map(m => col("qsig").bitwiseXOR(lit(m))): _*)))
    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
      .groupBy("query_id", "vec_id").agg(max("cosine").as("cosine"))
    topK(scored, "query_id", "vec_id", k)
  }

  /** All XOR masks over `nbits` bit positions with popcount <= probeBits,
    * generated combinatorially. Probe-set size is Σ C(nbits, k) — bounded
    * explicitly so a mistuned (nbits, probeBits) fails fast on the driver
    * instead of exploding the broadcast. */
  private[graft] def hammingMasks(nbits: Int, probeBits: Int): Seq[Int] = {
    require(nbits >= 1 && nbits <= 31, s"nbits must be in [1,31], got $nbits")
    require(probeBits >= 0, s"probeBits must be >= 0, got $probeBits")
    val p = math.min(probeBits, nbits)
    val out = scala.collection.mutable.ArrayBuffer[Int](0)
    def choose(start: Int, remaining: Int, acc: Int): Unit = {
      if (out.size > 65536)
        throw new graft.InvalidDataError(
          s"multi-probe set exceeds 65536 buckets (nbits=$nbits, probeBits=$probeBits); lower probeBits")
      if (remaining == 0) out += acc
      else {
        var b = start
        while (b <= nbits - remaining) {
          choose(b + 1, remaining - 1, acc | (1 << b))
          b += 1
        }
      }
    }
    (1 to p).foreach(k => choose(0, k, 0))
    out.toSeq
  }

  /** Result of [[kmeansFit]]: final centroids (index = cluster id) plus the
    * per-row assignments `(idCol, cluster bigint)`. */
  case class KmeansModel(centroids: Array[Array[Float]], assignments: DataFrame)

  /**
   * Distributed spherical k-means over the FULL corpus (vs the bounded
   * driver-side sample [[trainKmeans]] uses for IVF training): Lloyd
   * iterations where each round is
   *
   *  1. ASSIGN — nearest centroid by cosine via the codegen'd
   *     `nearest_centroid` expression, centroids riding the plan as
   *     literals (k·dim·4 bytes). Map-only.
   *  2. UPDATE — per-cluster mean via [[graft.functions.VectorSumFixed]]:
   *     fixed-point integer sums, so the new centroids are BITWISE
   *     REPRODUCIBLE under any partitioning / executor count — double
   *     sums would make every run's clustering drift with the partial-
   *     aggregation order, which is how k-means jobs become
   *     unreproducible at cluster scale. The exchange carries k groups ×
   *     one (dim longs + count) buffer per map partition — never vectors.
   *
   * Init is deterministic: the `k` lowest-id vectors (no RNG — corpus
   * order is already arbitrary, and a seeded sample would make the oracle
   * unreplayable). Empty clusters keep their previous centroid. Cosine
   * assignment is scale-invariant in the centroid, so the plain mean
   * needs no re-normalization (argmax cos(x, c) = argmax cos(x, c/‖c‖)).
   *
   * 100 TB design: per iteration, one map-only pass + one combinable
   * aggregate whose shuffle is k×(dim·8+8) bytes per map partition;
   * driver state is k×dim floats. `iters` is a hard, explicit job count —
   * no convergence loop that could run unbounded on shifting data.
   */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String, k: Int,
                iters: Int = 1, scaleBits: Int = 24): KmeansModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val init: Array[Array[Float]] = df.orderBy(col(idCol)).limit(k)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).toArray)
    require(init.length == k,
      s"corpus has only ${init.length} rows for k = $k")
    val scale = (1L << scaleBits).toDouble
    var centers = init
    var it = 0
    while (it < iters) {
      val sums = df.groupBy(
          GraftFunctions.nearest_centroid(col(vecCol), centers).as("cl"))
        .agg(GraftFunctions.vector_sum_fixed(col(vecCol), scaleBits).as("s"))
        .collect()
      val next = centers.clone()
      sums.foreach { r =>
        val cl = r.getInt(0)
        val st = r.getStruct(1)
        val dims = st.getSeq[Long](0)
        val n = st.getLong(1)
        if (n > 0)
          next(cl) = dims.map(v => ((v.toDouble / scale) / n).toFloat).toArray
      }
      centers = next
      it += 1
    }
    KmeansModel(centers,
      df.select(col(idCol),
        GraftFunctions.nearest_centroid(col(vecCol), centers)
          .cast("long").as("cluster")))
  }

  /** [[kmeansFit]] returning just the assignments DataFrame. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 1, scaleBits: Int = 24): DataFrame =
    kmeansFit(df, idCol, vecCol, k, iters, scaleBits).assignments

  /**
   * Mean-pool embeddings per group — the chunk→document (or
   * passage→page, frame→clip) embedding aggregation step of a retrieval
   * pipeline. Accumulates through [[graft.functions.VectorSumFixed]], so
   * the pooled vector is BITWISE REPRODUCIBLE under any partitioning —
   * a plain `avg` of floats drifts in the low bits with Spark's
   * partial-aggregation order, which then flips downstream ANN ranking
   * ties between runs.
   *
   * Output: `(groupCol, n bigint, pooled array<float>)`. One
   * map-side-combining aggregate; the exchange carries one
   * (dim·8+8)-byte buffer per (group, map partition), never the vectors.
   */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String,
               scaleBits: Int = 24): DataFrame = {
    val scale = (1L << scaleBits).toDouble
    df.groupBy(col(groupCol))
      .agg(GraftFunctions.vector_sum_fixed(col(vecCol), scaleBits).as("__s"))
      .select(col(groupCol), col("__s.n").as("n"),
        transform(col("__s.sums"),
          s => ((s.cast("double") / scale) / col("__s.n")).cast("float"))
          .as("pooled"))
  }

  /**
   * MMR-diversified top-k: brute-force candidates re-ranked by greedy
   * Maximal Marginal Relevance (Carbonell & Goldstein) — each pick
   * maximizes `λ·cosine(query) − (1−λ)·max cosine(already picked)`, so
   * near-duplicate corpus entries stop crowding out diverse results; the
   * standard retrieval-diversity pass for curating varied training
   * examples / RAG contexts from redundant corpora.
   *
   * 100 TB design: candidate generation is the exact top-`candidates`
   * path (map-side-combining `top_k_by` — the exchange carries
   * queries×C pairs); candidate VECTORS join back by id and the greedy
   * selection runs inside one codegen expression per query over a
   * BOUNDED C-element array (O(k·C·dim)) — no pairwise corpus work, no
   * driver loop. The candidate array sorts (score desc, id asc) before
   * selection, so ties are deterministic; at `λ = 1` the similarity
   * term has weight zero and the output provably equals [[topKBruteForce]]
   * (the oracle configuration).
   */
  def topKDiverse(corpus: DataFrame, corpusId: String, corpusVec: String,
                  queries: DataFrame, queryId: String, queryVec: String,
                  k: Int, candidates: Int = 50,
                  lambda: Double = 0.5): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val cand = topKBruteForce(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, candidates)
    val withVec = cand.join(
      corpus.select(col(corpusId).as("vec_id"), col(corpusVec).as("__v")),
      Seq("vec_id"))
    val packed = withVec.groupBy("query_id")
      .agg(sort_array(collect_list(struct(
        (-col("cosine")).as("ns"), col("vec_id").as("id"),
        struct(col("cosine").as("score"), col("__v").as("vec")).as("sv"))))
        .as("__cand"))
    packed
      .select(col("query_id"),
        col("__cand"),
        GraftFunctions.mmr_select(
          expr("transform(__cand, c -> c.sv)"), k, lambda).as("__sel"))
      .select(col("query_id"), col("__cand"), posexplode(col("__sel")))
      .select(col("query_id"),
        expr("__cand[col].id").as("vec_id"),
        expr("__cand[col].sv.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Sign-bit words of a float vector: word `j` packs dimensions
    * `[32j, 32j+32)` as `Σ 2^(i−32j) · [v_i > 0]` — exact integer
    * arithmetic (`pow(2, ≤31)` is an exact double), replayable verbatim
    * in SQL. 32-bit words, not 64: a 2^63 term overflows BIGINT in
    * engines that check (DuckDB), and exactness is the point. */
  private def signWords(vec: Column): Column = {
    val words = transform(sequence(lit(0), ((size(vec) + 31) / 32).cast("int") - 1), j =>
      aggregate(sequence(j * 32, least(j * 32 + 31, size(vec) - 1)), lit(0L),
        (acc, i) => acc + when(element_at(vec, i + 1) > 0f,
          pow(lit(2.0), i - j * 32).cast("long")).otherwise(lit(0L))))
    // empty vectors encode to NULL (sequence(0, -1) would count DOWN and
    // index element 0 — the randomProject hazard); a NULL word array makes
    // the Hamming score NULL, which top_k_by skips, so unencodable rows
    // simply never become candidates
    when(size(vec) > 0, words)
  }

  /** Hamming distance between two sign-word arrays — the codegen kernel
    * (one xor+popcount per word inside WholeStageCodegen); the HOF
    * `aggregate(zip_with(...))` form stayed interpreted and lost to the
    * codegen cosine at in-cache scale (measured at sf1, SCALE.md). */
  private def hammingWords(a: Column, b: Column): Column =
    GraftFunctions.hamming_words(a, b)

  /**
   * Binary-quantization top-k (1-bit BQ, the Lucene/faiss `SQ1` shape):
   * every vector compresses to its SIGN BITS — 4 bytes per 32 dims, a
   * 32× reduction over float32 — Hamming distance over the packed words
   * ranks candidates (one xor+popcount per word vs 32 multiply-adds),
   * and the top `rerank` candidates re-score with exact cosine.
   *
   * 100 TB design: the candidate pass streams ONLY the packed words
   * (8 bytes per 64-dim vector vs 256) against the broadcast query
   * words, and per-query top-rerank rides the map-side-combining
   * `top_k_by` aggregate; full vectors are touched again only for the
   * queries×rerank candidate rows. The encode output is what you
   * persist at scale (the PQ-index argument): re-encoding is one
   * map-only pass. Every stage before the final cosine is EXACT integer
   * arithmetic with id tie-breaks, so the whole pipeline — not just a
   * degenerate configuration — replays deterministically in the SQL
   * oracle; `rerank >= |corpus|` provably equals [[topKBruteForce]].
   */
  /** Sign-bit encode of a vector column: `(id, sign_words array<bigint>)`
    * — the PERSISTED artifact of binary quantization (4 bytes per 32
    * dims). Encoding is the expensive half of a one-shot
    * [[topKBinaryQuant]] call (measured at sf1, SCALE.md); building this
    * table once and passing it as `encoded` turns every later query
    * batch into pure xor+popcount over 8-byte words. */
  def encodeBinary(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), signWords(col(vecCol)).as("sign_words"))

  def topKBinaryQuant(corpus: DataFrame, corpusId: String, corpusVec: String,
                      queries: DataFrame, queryId: String, queryVec: String,
                      k: Int, rerank: Int = 32,
                      encoded: Option[DataFrame] = None): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    // encoded: an [[encodeBinary]] output (idCol, sign_words) — ideally a
    // persisted table, so the corpus vectors are only touched for the
    // queries×rerank candidate rows
    val cw = encoded match {
      case Some(e) => e.select(col(corpusId).as("vec_id"),
        col("sign_words").as("w"))
      case None => corpus.select(col(corpusId).as("vec_id"),
        signWords(col(corpusVec)).as("w"))
    }
    val qw = queries.select(col(queryId).as("query_id"),
      signWords(col(queryVec)).as("qw"))
    val ham = cw.crossJoin(broadcast(qw))
      .select(col("query_id"), col("vec_id"),
        (-hammingWords(col("w"), col("qw")).cast("double")).as("neg_ham"))
    val cand = topKBy(ham, "query_id", "vec_id", "neg_ham", rerank)
      .select("query_id", "vec_id")
    val rescored = cand
      .join(corpus.select(col(corpusId).as("vec_id"),
        col(corpusVec).as("cvec")), Seq("vec_id"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qvec"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine_similarity(col("cvec"), col("qvec")).as("cosine"))
    topK(rescored, "query_id", "vec_id", k)
  }

  /**
   * Random-projection dimensionality reduction (sparse
   * Johnson–Lindenstrauss): `out[j] = Σ_i sign(h(i,j))·vec[i] / √outDim`
   * with a hash-derived ±1 matrix — distance-preserving in expectation,
   * and the cheap front-end that makes downstream LSH banding, coarse
   * clustering, and near-dup sketches affordable when the source
   * embeddings are wide.
   *
   * 100 TB design: ZERO shuffle and zero model state — a map-only pass
   * of O(inDim·outDim) fused arithmetic per row; the projection matrix
   * is recomputed from `(i, j, seed)` wherever the row lives, so there
   * is no broadcast to version or invalidate, and any two jobs with the
   * same seed project into the same space (append-only corpora project
   * new rows consistently forever).
   */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDim: Int, seed: Long = 42L): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    require(seed >= 0, s"seed must be >= 0, got $seed")
    val vec = col(vecCol)
    // one compiled loop per row (RandomProjectExpr) — the nested
    // transform/aggregate HOF this replaces was CodegenFallback and paid
    // an interpreted expression tree per (row × outDim × inDim) term:
    // 403 s over the sf1 embeddings vs ~1 s compiled, bitwise-identical
    // output (the r15 sf1 sweep's one scaling cliff); the sign
    // arithmetic's SQL-replayable spec lives on the kernel's doc
    // ([[graft.functions.BucketUtil.randomProject]]).
    val proj = graft.functions.GraftFunctions.random_project(
      vec.cast("array<double>"), outDim, seed)
    // empty vectors project to NULL (a zero-length loop would emit the
    // all-zeros vector and invent a point at the origin)
    df.select(col(idCol),
      when(size(vec) > 0, proj).as("projection"))
  }

  /** The FIXED left-to-right dot `Σ_j v_j·x_j` of a vector column with a
    * driver-side array — deterministic IEEE addition order, so the same
    * expression replays term-for-term in SQL (the d120 margin pattern
    * widened to `dim` terms; Catalyst never reassociates float `+`). */
  private def orderedDot(vecCol: Column, v: Array[Double]): Column = {
    val x = (j: Int) => vecCol.getItem(j).cast("double")
    (1 until v.length).foldLeft(lit(v(0)) * x(0))(
      (acc, j) => acc + lit(v(j)) * x(j))
  }

  /**
   * Top principal direction of a vector corpus by DISTRIBUTED power
   * iteration on the (uncentered) second-moment matrix — the spectral
   * step of an embedding pipeline (dominant-direction removal, ABTT
   * "all-but-the-top" post-processing, OPQ-style rotations start here).
   * `v ← normalize(Σ_i x_i·(x_i·v))`, with every per-row contribution
   * `d_i·x_ij` floored to 2^-scaleBits before summing — the e48/d120
   * fixed-point trick, so the iterate is BITWISE identical under any
   * partitioning and a cross-engine oracle replays the whole recursion
   * (normalization uses `sqrt`, which IEEE-754 requires correctly
   * rounded — unlike `exp`, it is safe on both engines unguarded).
   *
   * 100 TB shape: one partial-aggregated exchange of `dim` longs per
   * iteration over a map-only dot pass; driver state is the dim-double
   * iterate (the kmeansFit envelope). Deterministic init (basis e_0).
   *
   * Returns the unit-norm direction after `iters` rounds (the exact
   * iterate — convergence is the caller's knob; the replay is exact at
   * any depth).
   */
  def powerIterationFit(df: DataFrame, vecCol: String, dim: Int,
                        iters: Int = 4, scaleBits: Int = 24): Array[Double] = {
    require(dim >= 1 && dim <= graft.functions.RefObjCaps.MaxDim,
      s"dim must be in [1, ${graft.functions.RefObjCaps.MaxDim}], got $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val scale = (1L << scaleBits).toDouble
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    var it = 0
    while (it < iters) {
      // project the dim-term dot ONCE per row before the aggregate —
      // embedding it in each of the dim per-dimension sums made the
      // aggregate input ~dim² multiply-adds/row (4096 at dim=64); the
      // deflated variant below already projected __du this way.
      // Numerically identical: same d expression, same products.
      val scored = df.select(col(vecCol),
        orderedDot(col(vecCol), v).as("__d"))
      val x = (j: Int) => col(vecCol).getItem(j).cast("double")
      val sums = (0 until dim).map(j =>
        sum(floor((col("__d") * x(j)) * lit(scale)).cast("long")).as(s"s$j"))
      val row = scored.agg(sums.head, sums.tail: _*).collect()(0)
      val t = Array.tabulate(dim)(j => row.getLong(j).toDouble / scale)
      // left-to-right, matching the generated SQL's 0.0 + t0*t0 + …
      val norm = math.sqrt(t.foldLeft(0.0)((a, tj) => a + tj * tj))
      v = t.map(_ / norm)
      it += 1
    }
    v
  }

  /** Per-vector projection onto a [[powerIterationFit]] direction —
    * map-only (the same fixed-order dot). */
  def principalProjection(vecCol: Column, v: Array[Double]): Column =
    orderedDot(vecCol, v)

  /** Second principal direction by power iteration on the DEFLATED
    * corpus `x' = x − (x·v1)·v1` — never materializing x': each round
    * projects `d1 = x·v1` and the running dot `du = u·x'` once per row
    * (keeping the codegen expression tree linear in `dim`, not
    * quadratic), then takes the same 2^-scaleBits-floored per-dimension
    * sums as [[powerIterationFit]]. Same bitwise replay guarantees;
    * same one-exchange-of-`dim`-longs-per-iteration shape. */
  def powerIterationDeflatedFit(df: DataFrame, vecCol: String, dim: Int,
                                v1: Array[Double], iters: Int = 4,
                                scaleBits: Int = 24): Array[Double] = {
    require(v1.length == dim, s"v1 must have $dim dims, got ${v1.length}")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val scale = (1L << scaleBits).toDouble
    var u = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    val x = (j: Int) => col(vecCol).getItem(j).cast("double")
    val withD1 = df.select(col(vecCol),
      orderedDot(col(vecCol), v1).as("__d1"))
    var it = 0
    while (it < iters) {
      val xd = (j: Int) => x(j) - col("__d1") * lit(v1(j))
      val du = (1 until dim).foldLeft(lit(u(0)) * xd(0))(
        (acc, j) => acc + lit(u(j)) * xd(j))
      val scored = withD1.select(col(vecCol), col("__d1"), du.as("__du"))
      val sums = (0 until dim).map(j =>
        sum(floor((col("__du") * xd(j)) * lit(scale)).cast("long")).as(s"s$j"))
      val row = scored.agg(sums.head, sums.tail: _*).collect()(0)
      val t = Array.tabulate(dim)(j => row.getLong(j).toDouble / scale)
      val norm = math.sqrt(t.foldLeft(0.0)((a, tj) => a + tj * tj))
      u = t.map(_ / norm)
      it += 1
    }
    u
  }

  /** Per-vector projection onto the DEFLATED direction `u`:
    * `(x − (x·v1)·v1)·u`, fixed order throughout. */
  def deflatedProjection(vecCol: Column, v1: Array[Double],
                         u: Array[Double]): Column = {
    val d1 = orderedDot(vecCol, v1)
    val x = (j: Int) => vecCol.getItem(j).cast("double")
    val xd = (j: Int) => x(j) - d1 * lit(v1(j))
    (1 until u.length).foldLeft(lit(u(0)) * xd(0))(
      (acc, j) => acc + lit(u(j)) * xd(j))
  }

  /** All-but-the-top residual (Mu & Viswanath 2018): the component of
    * each vector along `v` and the norm of what remains after removing
    * it — `(x·v, ‖x − (x·v)·v‖)`, both in fixed left-to-right order so
    * the oracle replays them term-for-term. Map-only. */
  def abttResidual(vecCol: Column, v: Array[Double]): (Column, Column) = {
    val d = orderedDot(vecCol, v)
    val x = (j: Int) => vecCol.getItem(j).cast("double")
    val term = (j: Int) => {
      val r = x(j) - d * lit(v(j))
      r * r
    }
    val sumsq = (0 until v.length).foldLeft(lit(0.0): Column)(
      (acc, j) => acc + term(j))
    (d, sqrt(sumsq))
  }
}
