package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-preparation operators a large-scale LLM training pipeline needs
 * beyond dedup/similarity (which live in [[DedupOps]]/[[SimilarityOps]]):
 * sequence packing, train/test decontamination, stratified sampling,
 * vocabulary statistics. All are declarative DataFrame plans — Catalyst
 * keeps filters pushed and aggregation partial, and nothing here collects
 * to the driver.
 */
object CorpusOps {

  /**
   * Concat-and-chunk sequence packing: documents are laid out back-to-back
   * in a deterministic order and cut into fixed `ctxLen`-token training
   * windows; each document learns its byte-offset and first chunk id.
   *
   * 100 TB design: packing is per `partitionCol` group (e.g. source shard),
   * so the only shuffle is a hash partition on the group key and the
   * running sum is a window inside each partition — no global total order,
   * which would be a single-reducer sort at corpus scale. Groups pack
   * independently exactly like sharded training data files do.
   */
  /**
   * Line-level (sub-document) deduplication — the CCNet/RefinedWeb
   * boilerplate pass: a LINE repeated across documents (header, footer,
   * cookie banner, nav bar) survives only in its FIRST occurrence
   * (ordered by `(idCol, line position)`); every other copy is removed
   * and the remaining lines are re-joined in their original order. Whole
   * documents are never dropped — a doc whose every line was boilerplate
   * comes back with empty text (`lines_kept = 0`), ready for a min-length
   * quality filter.
   *
   * Output: the original id column + `text` (deduped), `lines_kept`,
   * `lines_dropped`.
   *
   * 100 TB design: first-occurrence keys are a map-side-combinable
   * `min` over the `(id, idx)` STRUCT — struct ordering is
   * lexicographic, so the key works for ANY orderable id type (string
   * doc ids, ids past 2⁶³/10⁶, documents longer than 10⁶ lines — all
   * of which silently corrupt an arithmetic-packed long key). The
   * shuffle ships one candidate per distinct line per map partition,
   * keyed by the 16-byte `md5(line)` — raw line text never rides a
   * shuffle. The exploded corpus then joins that first-occurrence set
   * on the same hash; empty lines are structural, always kept, and
   * never shuffled (they would otherwise be the hottest key in the
   * corpus). Reassembly groups by document — the id-hash shuffle — and
   * sorts each doc's surviving lines in memory (docs are bounded; the
   * corpus is not).
   */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    // (id, idx, line) with idx the 1-based position inside the doc
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col(idCol), (col("pos") + 1).as("idx"), col("col").as("line"))
    val content = lines.where(length(col("line")) > 0)
      .withColumn("lh", md5(col("line").cast("binary")))
    // first occurrence per line: one combinable struct-min aggregate
    val firstKey = struct(col(idCol), col("idx"))
    val firsts = content.select(col("lh"), firstKey.as("k"))
      .groupBy("lh").agg(min("k").as("first_k"))
    val kept = content
      .join(firsts.hint("shuffle_hash"), "lh")
      .where(firstKey === col("first_k"))
      .select(col(idCol), col("idx"), col("line"))
      .unionByName(lines.where(length(col("line")) === 0)) // structural lines stay
    val totals = lines.groupBy(idCol).agg(count(lit(1)).as("lines_total"))
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(transform(array_sort(collect_list(struct(col("idx"), col("line")))),
        x => x.getField("line")), sep).as("text"),
        count(lit(1)).as("lines_kept"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("lines_kept"), lit(0L)).as("lines_kept"),
        (col("lines_total") - coalesce(col("lines_kept"), lit(0L))).as("lines_dropped"))
  }

  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    partitionCol: String, ctxLen: Int): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(partitionCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("chunk_id", floor(col("start_offset") / ctxLen))
  }

  /**
   * Packing-efficiency audit — the training-ops number behind
   * [[packSequences]]: per group, how many `ctxLen`-token windows the
   * corpus fills under concat-and-chunk packing versus pad-each-
   * document-to-ctx, and the padding fraction each strategy wastes.
   * The difference is the compute packing SAVES — the report that
   * justifies (or kills) a packing stage in a training pipeline.
   *
   * Integer-exact by construction: `ctxLen` must be a power of two so
   * `ceil(tokens/ctx)` computes as `floor((t + ctx−1)/ctx)` with an
   * EXACT power-of-two double division both engines replay; the two
   * padding fractions are single divisions of exact integers, rounded
   * at output. One map pass + one per-group counter exchange.
   */
  def packingEfficiency(df: DataFrame, textCol: String,
                        partitionCol: String, ctxLen: Int): DataFrame = {
    require(ctxLen >= 1 && (ctxLen & (ctxLen - 1)) == 0,
      s"ctxLen must be a positive power of two, got $ctxLen")
    def chunksOf(t: Column): Column =
      floor((t.cast("double") + lit((ctxLen - 1).toDouble)) /
        lit(ctxLen.toDouble)).cast("long")
    val toks = TextOps.tokenCount(col(textCol)).cast("long")
    df.select(col(partitionCol), toks.as("__t"))
      .groupBy(partitionCol)
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("total_tokens"),
        sum(chunksOf(col("__t"))).as("chunks_padded"))
      .withColumn("chunks_packed", chunksOf(col("total_tokens")))
      .withColumn("waste_padded",
        col("chunks_padded") * ctxLen - col("total_tokens"))
      .withColumn("waste_packed",
        col("chunks_packed") * ctxLen - col("total_tokens"))
      .select(col(partitionCol), col("n_docs"), col("total_tokens"),
        col("chunks_padded"), col("chunks_packed"),
        col("waste_padded"), col("waste_packed"),
        when(col("chunks_padded") === 0, lit(0.0))
          .otherwise(round(col("waste_padded").cast("double") /
            (col("chunks_padded") * ctxLen).cast("double"), 6))
          .as("pad_frac_padded"),
        when(col("chunks_packed") === 0, lit(0.0))
          .otherwise(round(col("waste_packed").cast("double") /
            (col("chunks_packed") * ctxLen).cast("double"), 6))
          .as("pad_frac_packed"))
  }

  /**
   * Sentence-aligned chunking — RAG-style windows that never split a
   * sentence: documents segment with [[TextOps.sentences]], and each
   * sentence joins the chunk its CUMULATIVE-token prefix falls in
   * (`chunk_idx = floor(tokens_before / chunkTokens)`). Boundary
   * alignment is exact integer arithmetic, so the chunking is
   * deterministic and engine-replayable; a chunk can overflow by at
   * most its boundary-straddling sentence (the price of alignment —
   * greedy repacking would need a sequential fold no SQL engine
   * replays). [[chunkDocuments]] is the token-exact fixed-window
   * alternative when mid-sentence cuts are acceptable.
   *
   * 100 TB design: MAP-ONLY. Prefix-sum chunk assignment and chunk-text
   * reassembly are PER-DOCUMENT quantities, so the former per-doc window
   * + (doc, chunk) groupBy paid two exchanges whose volume was the
   * corpus' sentence stream for row-local arithmetic; the compiled
   * [[graft.functions.GraftFunctions.sentence_chunks]] kernel computes
   * the same rows in one pass over state bounded by the document (the
   * termCounts/termPostings discipline, applied to the last
   * sentence-volume exchange in the text tier). Token counts replicate
   * `size(TextOps.tokens(sentence))` bit-exactly (ASCII-space-only trim,
   * Java-regex \s+ split, trailing empties kept); chunk text is the
   * " "-joined sentences in order, byte-identical to the former
   * sort-collect-join.
   *
   * Output: `(idCol, chunk_idx, text, n_sentences, n_tokens)`.
   */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int = 128): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    // the kernel feeds inline() DIRECTLY (the d76 explode(term_counts(..))
    // shape): a non-cheap generator child defeats InferFiltersFromGenerate,
    // so the kernel runs exactly ONCE per row in the Generate — projecting
    // it into an attribute first let the inferred size()/isnotnull filter
    // push through the alias and evaluate the kernel 3x per row
    df.select(col(idCol), inline(
      graft.functions.GraftFunctions.sentence_chunks(
        TextOps.sentences(col(textCol)), chunkTokens.toLong)))
  }

  /** Word n-grams of `textCol`, hashed to md5 hex (32 bytes ride the
    * shuffle instead of unbounded gram strings); empty when the document
    * has fewer than `n` tokens. */
  /** Distinct word-`n`-gram md5 hex hashes — same bytes as
    * `md5(array_join(slice(tokens, i, n), ' '))` but via ONE native
    * one-pass expression (grams + md5 + lowercase hex + first-occurrence
    * dedup in a single compiled loop): the earlier two-stage form left
    * the per-element hex relabel in an interpreted `transform` (HOF
    * bodies are CodegenFallback), taxing every contamination/novelty/
    * overlap op corpus-wide. */
  private[graft] def gramSet(textCol: Column, n: Int): Column =
    graft.functions.GraftFunctions.gram_hex_set(textCol, n)

  /**
   * Per-document n-gram NOVELTY audit: how much of each document appears
   * verbatim elsewhere in the corpus — `n_grams` (distinct word
   * `n`-grams), `n_shared` (those also in ≥ 1 OTHER document), and
   * `novelty = 1 − n_shared/n_grams`. The corpus-wide memorization/
   * duplication exposure report a release gate reads as a distribution:
   * [[graft.ops.DedupOps.duplicateSpanStats]] answers WHERE the copies
   * sit; this answers HOW MUCH per document, cheaper (no positions, no
   * islands merge). Documents shorter than `n` tokens surface as
   * `(0, 0, NULL)` through the final re-attach — silence would read as
   * "nothing to audit".
   *
   * 100 TB plan: ONE exploded (gram-hash, doc) shuffle — grams are
   * md5-hashed and per-doc distinct, so per-gram doc counts are a plain
   * count — and the per-doc re-join meets it on the same gram key; the
   * gram subplan feeds both sides of that join through exchange reuse.
   * The novelty division happens once per DOC, on exact integer counts.
   */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df.select(col(idCol),
      explode(gramSet(col(textCol), n)).as("gram"))
    val docFreq = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    val per = grams.join(docFreq, "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("__df") >= 2, 1)).as("n_shared"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("novelty",
        when(col("n_grams") === 0, lit(null).cast("double"))
          .otherwise(round(
            lit(1.0) - col("n_shared").cast("double") / col("n_grams"), 6)))
  }

  /**
   * Train/test decontamination: which training documents share at least
   * one word `n`-gram with any test/benchmark document (the standard
   * "n-gram collision" contamination test). Returns one row per
   * contaminated training doc with the number of distinct shared grams.
   *
   * 100 TB design: both sides explode to (doc, gram-hash) and meet in ONE
   * shuffle join keyed on the 32-byte hash — no document pair matrix. The
   * test side is a benchmark suite (tiny next to the corpus), so its
   * distinct gram set broadcasts; Spark's AQE does this from runtime stats,
   * the explicit hint makes it unconditional.
   */
  def ngramOverlap(train: DataFrame, test: DataFrame, idCol: String,
                   textCol: String, n: Int = 8): DataFrame = {
    val trainGrams = train
      .select(col(idCol), explode(gramSet(col(textCol), n)).as("gram"))
    val testGrams = test
      .select(explode(gramSet(col(textCol), n)).as("gram")).distinct()
    trainGrams.join(broadcast(testGrams), "gram")
      .groupBy(idCol) // grams are distinct per doc: count == distinct count
      .agg(count(lit(1)).as("n_shared"))
  }

  /**
   * [[ngramOverlap]] with a Bloom prefilter on the corpus side: the merged
   * test-gram Bloom sketch (built by a distributed aggregation, collected
   * once, shipped as a plan constant) probes every training gram map-side,
   * so only true hits plus the ~`fpp` false-positive fraction ever enter
   * the join shuffle — on a 100 TB corpus the shuffle shrinks from "every
   * distinct gram" to "approximately the contaminated grams". The sketch
   * has NO false negatives by construction and the exact join removes the
   * false positives, so the result EQUALS [[ngramOverlap]] row for row
   * (same oracle).
   */
  def ngramOverlapBloom(train: DataFrame, test: DataFrame, idCol: String,
                        textCol: String, n: Int = 8,
                        expectedTestGrams: Long = 1L << 20,
                        fpp: Double = 0.01): DataFrame = {
    val testGrams = test
      .select(explode(gramSet(col(textCol), n)).as("gram")).distinct()
    val bloom = testGrams.stat.bloomFilter("gram", expectedTestGrams, fpp)
    train
      .select(col(idCol), explode(gramSet(col(textCol), n)).as("gram"))
      .where(graft.functions.GraftFunctions.bloom_might_contain(col("gram"), bloom))
      .join(broadcast(testGrams), "gram")
      .groupBy(idCol) // grams are distinct per doc: count == distinct count
      .agg(count(lit(1)).as("n_shared"))
  }

  /**
   * Per-document contamination AUDIT — the graded counterpart of the
   * boolean [[ngramOverlap]] drop: every training document scored by the
   * fraction of its distinct word-`n`-grams that collide with the
   * test/benchmark suite (`n_shared / n_grams`). Pipelines threshold this
   * (drop ≥ x%, flag ≥ y%) instead of dropping on a single shared gram;
   * zero-gram docs score 0.
   *
   * 100 TB design: identical join shape to [[ngramOverlap]] (one shuffle
   * on the gram hash, test side broadcast) plus a map-only per-doc gram
   * count — the left join back to the corpus adds no second scan of the
   * gram stream.
   */
  def contaminationScore(train: DataFrame, test: DataFrame, idCol: String,
                         textCol: String, n: Int = 8): DataFrame = {
    val overlap = ngramOverlap(train, test, idCol, textCol, n)
    train
      .select(col(idCol), size(gramSet(col(textCol), n)).cast("long").as("n_grams"))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(coalesce(col("n_shared"), lit(0L)).cast("double") /
            col("n_grams")).as("frac"))
  }

  /**
   * The per-benchmark contamination REPORT over many suites at once —
   * "which benchmark is burned, and how badly": for each named test
   * suite, the count of corpus documents sharing any `n`-gram with it
   * (`n_flagged`), the count whose shared fraction reaches 0.5
   * (`n_heavy`), and the flagged rate. Per-suite values equal a
   * [[contaminationScore]] run aggregated — but the corpus side is
   * gram-hashed ONCE and joined against the union of suite-tagged test
   * grams, so auditing S suites costs one corpus pass, not S (at
   * 100 TB the corpus pass dominates; suites are small and bounded).
   *
   * The corpus gram stream additionally probes a Bloom sketch of the
   * union of suite grams BEFORE the join (the [[ngramOverlapBloom]]
   * d53 pattern): the sketch has no false negatives and the exact join
   * removes its false positives, so the result is unchanged row for
   * row — but only hits (plus the ~`fpp` false-positive sliver) ever
   * enter the shuffle, which at 27M corpus grams was the d116 sf1
   * shuffle-memory outlier (SCALE.md, r14 verdict item 4) and at
   * 100 TB is the difference between shuffling the corpus's gram
   * stream and shuffling approximately the contaminated grams.
   */
  def contaminationReport(train: DataFrame,
                          suites: Seq[(String, DataFrame)], idCol: String,
                          textCol: String, n: Int = 8,
                          expectedSuiteGrams: Long = 1L << 20,
                          fpp: Double = 0.01): DataFrame = {
    require(suites.nonEmpty, "at least one suite required")
    // duplicate names would double-count silently: the tagged gram union
    // merges same-named suites, so every shared gram of the duplicated
    // frame counts twice into __shared — fail loudly instead
    require(suites.map(_._1).distinct.size == suites.size,
      s"suite names must be unique, got ${suites.map(_._1).mkString(", ")}")
    // gramSet projected ONCE as __g, then __ng derived in a SUBSEQUENT
    // select: these HOF expressions are CodegenFallback with no
    // subexpression elimination, so `size(gramSet(...)), gramSet(...)`
    // in one select gram-hashes every document twice (ADVICE r14)
    val gs = train
      .select(col(idCol), gramSet(col(textCol), n).as("__g"))
      .select(col(idCol), size(col("__g")).cast("long").as("__ng"),
        col("__g"))
    val grams = gs.select(col(idCol), col("__ng"),
      explode(col("__g")).as("__gram"))
    val testGrams = suites.map { case (name, t) =>
      t.select(lit(name).as("suite"),
          explode(gramSet(col(textCol), n)).as("__gram"))
        .distinct()
    }.reduce(_.unionByName(_))
    val bloom = testGrams.select("__gram")
      .stat.bloomFilter("__gram", expectedSuiteGrams, fpp)
    val total = train.select(count(lit(1)).as("__total"))
    val counts = grams
      .where(graft.functions.GraftFunctions.bloom_might_contain(col("__gram"), bloom))
      .join(testGrams, Seq("__gram"))
      .groupBy(col("suite"), col(idCol))
      .agg(count(lit(1)).as("__shared"), first(col("__ng")).as("__ng"))
      .groupBy("suite")
      .agg(count(lit(1)).as("n_flagged"),
        count(when(col("__shared").cast("double") >=
          col("__ng").cast("double") * 0.5, 1)).as("n_heavy"))
    // a CLEAN suite must still report a zeros row — "missing" and
    // "uncontaminated" are different findings; the hit join naturally
    // drops zero-hit suites, so the bounded name list re-seats them
    val spark = train.sparkSession
    import spark.implicits._
    suites.map(_._1).toDF("suite")
      .join(counts, Seq("suite"), "left")
      .crossJoin(broadcast(total))
      .select(col("suite"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("n_heavy"), lit(0L)).as("n_heavy"),
        round(coalesce(col("n_flagged"), lit(0L)).cast("double") /
          col("__total").cast("double"), 6).as("flag_rate"))
  }

  /**
   * Token-budget corpus selection: within each stratum (language, source
   * shard), keep the highest-quality documents whose cumulative token
   * count fits the budget — the "fill the training mix" step after
   * quality scoring. A document is kept while the running total BEFORE it
   * is under the budget (so the budget-crossing document is included —
   * training pipelines truncate mid-document rather than waste budget;
   * callers wanting strict fit subtract one doc's worth).
   *
   * 100 TB design: TWO-PHASE, so no stratum is ever sorted whole in one
   * task. Phase 1 buckets each stratum by quality range (`numBuckets`
   * equal-width slices of [min,max] quality — bucketing only needs to be
   * monotone in the sort order, so double rounding cannot change results)
   * and computes per-bucket token totals plus a running total over the
   * tiny strata×buckets stats table. Every bucket whose cumulative total
   * stays under the budget is kept WHOLE (map-only filter, never sorted);
   * buckets starting at or past the budget are dropped whole; exactly ONE
   * budget-straddling bucket per stratum pays a window sort — ~1/numBuckets
   * of the stratum, not the stratum. Degenerate quality distributions
   * (constant, non-numeric, all-NaN) collapse to one bucket and behave
   * exactly like the single-window plan. Token totals are summed in the
   * column's own numeric type (long for integral tokens — exact integer
   * arithmetic; fractional token columns keep their native precision, same
   * as the windowed form); doubles appear only in bucket ASSIGNMENT.
   * NULL strata form their own budgeted group, exactly as
   * `Window.partitionBy` treats them (the internal joins go through a
   * struct-wrapped key, which is null-safe). Ordering is total and
   * deterministic: (quality DESC NULLS LAST, id ASC).
   */
  def selectWithinBudget(df: DataFrame, idCol: String, strataCol: String,
                         qualityCol: String, tokensCol: String,
                         budgetPerStratum: Long, numBuckets: Int = 64): DataFrame = {
    val reserved = Seq("__swb_s", "__swb_b", "__swb_cum", "__swb_cum_before",
      "__swb_run", "__swb_q_min", "__swb_q_max", "__swb_btoks")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input must not contain reserved working columns: ${clash.mkString(", ")}")
    val outCols = df.columns.toSeq.map(col)
    // null-safe stratum key: struct field comparison treats NULL == NULL,
    // so an equi-join on the wrapped key keeps null-stratum rows as their
    // own group instead of silently dropping them
    val withS = df.withColumn("__swb_s", struct(col(strataCol)))
    val qd = col(qualityCol).cast("double")
    // per-stratum quality range over finite values (NaN sorts above every
    // double in Spark, so it maps to the top bucket explicitly, and an
    // all-NaN/null stratum leaves the range null → single-bucket fallback)
    val qFinite = when(isnan(qd), lit(null).cast("double")).otherwise(qd)
    val range = withS.groupBy(col("__swb_s"))
      .agg(min(qFinite).as("__swb_q_min"), max(qFinite).as("__swb_q_max"))
    val span = col("__swb_q_max") - col("__swb_q_min")
    val bRaw = floor((col("__swb_q_max") - qd) / span * numBuckets)
    val bucket =
      when(col(qualityCol).isNull, lit(numBuckets.toLong + 1L)) // sorts last
        .when(isnan(qd), lit(0L)) // sorts first (Spark: NaN > any double)
        .otherwise(coalesce(
          least(greatest(bRaw, lit(0L)), lit(numBuckets.toLong - 1L)),
          lit(0L)))
    val withB = withS.join(broadcast(range), Seq("__swb_s"))
      .withColumn("__swb_b", bucket)
      .drop("__swb_q_min", "__swb_q_max")
    // strata × buckets rows: token totals and the running total across
    // buckets in quality order — tiny, broadcast back to the corpus
    val cumW = Window.partitionBy(col("__swb_s")).orderBy(col("__swb_b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = withB.groupBy(col("__swb_s"), col("__swb_b"))
      .agg(sum(col(tokensCol)).as("__swb_btoks"))
      .withColumn("__swb_cum", sum("__swb_btoks").over(cumW))
      .withColumn("__swb_cum_before", col("__swb_cum") - col("__swb_btoks"))
      .drop("__swb_btoks")
    val tagged = withB.join(broadcast(stats), Seq("__swb_s", "__swb_b"))
    // keep-whole: every doc's before-it total < its bucket's end < budget
    // (null-token docs drop here too — the windowed form's null arithmetic
    // always excluded them)
    val keepAll = tagged.where(
      col("__swb_cum") < budgetPerStratum && col(tokensCol).isNotNull)
    // the one straddling bucket per stratum: exact windowed decision,
    // offset by the tokens in the (whole-kept) buckets before it
    val straddle = tagged.where(
      col("__swb_cum") >= budgetPerStratum &&
        col("__swb_cum_before") < budgetPerStratum)
    val w = Window.partitionBy(col("__swb_s"), col("__swb_b"))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val straddleKept = straddle
      .withColumn("__swb_run", sum(col(tokensCol)).over(w))
      .where(col("__swb_cum_before") + col("__swb_run") - col(tokensCol)
        < budgetPerStratum)
    keepAll.select(outCols: _*).unionByName(straddleKept.select(outCols: _*))
  }

  /**
   * URL/domain blocklist filtering — the C4/RefinedWeb "bad domains" pass:
   * a document whose url's host equals a blocklisted domain OR any of its
   * subdomains is flagged (`ads.tracker.net` matches a `tracker.net`
   * entry). Output: the input plus `host` and `blocked_domains` (the
   * matched entries, sorted and comma-joined; NULL for clean documents) —
   * callers filter on `blocked_domains IS NULL`. The names `host` and
   * `blocked_domains` are part of the output contract, so the input must
   * not already contain them (rejected loudly). Duplicate blocklist rows
   * are harmless: the list is deduplicated before joining and matches are
   * collected as a set.
   *
   * Host extraction is one shared regexp (scheme://HOST, stopping at
   * `/:?#`), lowercased, so both engines parse identically; suffix
   * candidates are the host's label-suffixes (`a.b.c` → `a.b.c`, `b.c`,
   * `c`), bounded by the label count.
   *
   * 100 TB design: the corpus never rides a shuffle. Only `(id, suffix)`
   * pairs (bytes, not documents) join the blocklist — a plain equi-join
   * that broadcasts whichever side is small (a blocklist of millions of
   * domains stays a shuffle join and still never touches document text) —
   * and the tiny per-id match set joins back onto the corpus by id.
   */
  def domainBlocklist(df: DataFrame, idCol: String, urlCol: String,
                      blocklist: DataFrame,
                      domainCol: String = "domain"): DataFrame = {
    val clash = df.columns.filter(Seq("host", "blocked_domains").contains)
    require(clash.isEmpty,
      s"input must not contain output-contract columns: ${clash.mkString(", ")}")
    val hostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
    val withHost = df.withColumn("host",
      lower(regexp_extract(col(urlCol), hostRe, 1)))
    val labels = split(col("host"), "\\.")
    val suffixes = transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + lit(1)), "."))
    val pairs = withHost.select(col(idCol), explode(suffixes).as("__suf"))
    val matches = pairs
      .join(blocklist.select(col(domainCol).as("__suf")).distinct(), Seq("__suf"))
      .groupBy(idCol)
      .agg(concat_ws(",", sort_array(collect_set(col("__suf"))))
        .as("blocked_domains"))
    withHost.join(matches, Seq(idCol), "left")
  }

  /**
   * URL canonicalization — the normalization pass BEFORE URL-keyed exact
   * dedup (the same crawl page is fetched as `HTTP://Example.COM:80/a?b=2&a=1`
   * and `http://example.com/a?a=1&b=2`; byte-equality misses every such
   * pair): lowercase scheme and authority, strip the fragment, strip
   * default ports (`:80` http / `:443` https), trim trailing path slashes
   * (empty path → `/`), drop tracking parameters (`utm_*`, `gclid`,
   * `fbclid`), and SORT the surviving query parameters. Strings that
   * don't parse as `scheme://…` pass through untouched (they can't be
   * normalized, only dropped — a caller policy).
   *
   * Map-only column expression (regexp + small-array HOFs per row, no
   * shuffle); every rule is a regex/list operation with identical
   * semantics in an SQL oracle, so canonical keys are engine-portable —
   * the property URL dedup at 100 TB depends on.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val path0 = regexp_replace(
      regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=.*)?$"))
    val q = array_join(array_sort(params), "&")
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), auth, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /**
   * Deterministic stratified sampling: each stratum keeps the documents
   * whose content-hash first hex digit falls in its allowed set (so rates
   * are multiples of 1/16). Like [[graft.SparkEntry]]'s d43 sample but
   * with per-stratum rates — e.g. downsample the dominant language hard
   * and keep the tail. Map-only, reproducible across runs and engines:
   * membership depends only on document content.
   */
  def stratifiedSample(df: DataFrame, textCol: String, strataCol: String,
                       hexPrefixes: Map[String, Seq[String]],
                       defaultPrefixes: Seq[String]): DataFrame = {
    val h = substring(md5(col(textCol).cast("binary")), 1, 1)
    val keep = hexPrefixes.foldLeft(
      when(lit(false), lit(true))) { case (acc, (stratum, hexes)) =>
        acc.when(col(strataCol) === stratum, h.isin(hexes: _*))
    }.otherwise(h.isin(defaultPrefixes: _*))
    df.where(keep)
  }

  /**
   * Per-stratum distribution drift — KL(p_stratum ‖ p_corpus) over the
   * token distribution, one row per stratum `(stratum, n_tokens,
   * n_types, kl)`: the drift monitor a crawl pipeline runs per source /
   * per snapshot ("did this feed's language shift away from the
   * corpus?"). KL against the corpus-wide distribution is always finite
   * (a stratum's support is a subset of the corpus's), needs no
   * smoothing constant, and 0 means the stratum is distribution-
   * identical. `kl` rounds to 6 decimals before output (the d65/d77
   * precedent: per-term doubles have a fixed operation order; only the
   * final sum's accumulation order differs between engines, far below
   * 1e-6).
   *
   * 100 TB design: ONE tokenize pass reduces the corpus to compact
   * `(stratum, token, count)` rows (a combinable count — occurrences
   * never shuffle twice); the stratum totals, corpus-wide token totals,
   * and grand total all aggregate that compact table, and the final
   * per-token KL terms join back on it. Nothing rescans text.
   */
  def sourceDrift(df: DataFrame, strataCol: String, textCol: String): DataFrame = {
    // the deliberate isnotnull makes all four consumers' tokenize
    // subplans canonicalize EQUAL (the joins push it onto some branches
    // but not others), so the (stratum, token) exchange computes once
    // and the other three consumers are ReusedExchange — the d100 trick;
    // without it the corpus is tokenized four times (plan-asserted)
    val sc = df.where(col(strataCol).isNotNull)
      .select(col(strataCol).as("__s"),
        explode(TextOps.tokens(col(textCol))).as("__w"))
      .where(col("__w").isNotNull)
      .groupBy("__s", "__w").agg(count(lit(1)).as("__c"))
    val stot = sc.groupBy("__s")
      .agg(sum("__c").as("__n"), count(lit(1)).as("__types"))
    val wtot = sc.groupBy("__w").agg(sum("__c").as("__cw"))
    val tot = sc.agg(sum("__c").as("__grand"))
    val terms = sc
      .join(stot, Seq("__s"))
      .join(wtot, Seq("__w"))
      .crossJoin(broadcast(tot))
      .select(col("__s"), col("__n"), col("__types"),
        // p·ln(p/q) with p, q exact-integer ratios and a fixed per-row
        // operation order; p > 0 and q ≥ p/|corpus| > 0 by construction
        ((col("__c").cast("double") / col("__n").cast("double")) *
          log((col("__c").cast("double") / col("__n").cast("double")) /
            (col("__cw").cast("double") / col("__grand").cast("double"))))
          .as("__t"))
    terms.groupBy(col("__s").as(strataCol))
      .agg(first(col("__n")).as("n_tokens"),
        first(col("__types")).as("n_types"),
        round(sum(col("__t")), 6).as("kl"))
  }

  /**
   * Deterministic train/val/test assignment: every row gets a named
   * split from its content hash ALONE — reproducible across engines,
   * runs, and layouts, and STABLE UNDER CORPUS GROWTH: a document's
   * split never changes when other documents arrive or depart (the
   * property rank/position-based splits lack, and the reason an eval
   * set stays fixed across dataset versions instead of silently
   * rotating into training). `fractions` are integer weights over a
   * 65,536-bucket hash space: bucket = first four md5 nibbles of `key`,
   * and split `i` wins if `bucket · Σw < 65536 · cum_i` — exact integer
   * arithmetic any engine replays (granularity 1/65536 ≈ 0.0015%).
   *
   * Content-keyed assignment (`key` = the text) sends verbatim
   * duplicates to the SAME split, so cross-split leakage through exact
   * dups is structurally impossible — pair with the near-dup
   * decontaminators for fuzzier leaks. Map-only, ZERO exchange; the
   * nibble arithmetic reuses [[shuffleShards]]'s leading-four-digit
   * read (an id-and-seed-keyed hash, so the two uses stay independent
   * when composed).
   *
   * Output: the input plus a `split` column.
   */
  def splitAssign(df: DataFrame, key: Column,
                  fractions: Seq[(String, Long)] =
                    Seq("train" -> 8L, "val" -> 1L, "test" -> 1L)): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      s"fractions must be positive integer weights, got $fractions")
    // loud, like the resamplers' reserved-column guards — withColumn
    // would otherwise silently REPLACE a pre-existing `split`
    require(!df.columns.contains("split"),
      "input already has a 'split' column — rename it before splitAssign")
    val total = fractions.map(_._2).sum
    val hex = md5(key.cast("binary"))
    val digits = "0123456789abcdef"
    val nib = (i: Int) => instr(lit(digits), substring(hex, i, 1)) - 1
    val bucket = ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
    val cums = fractions.map(_._2).scanLeft(0L)(_ + _).tail
    val split = fractions.zip(cums).init
      .foldLeft(when(lit(false), lit(""))) { case (acc, ((name, _), cum)) =>
        acc.when(bucket * total < lit(65536L) * cum, name)
      }
      .otherwise(fractions.last._1)
    df.withColumn("split", split)
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement per stratum —
   * Efraimidis–Spirakis exponential keys, RNG-free: row `i` gets
   * `key_i = ln(u_i) / w_i` where `u_i = (bk_i + 0.5) / 65536` is a
   * (seed, id)-keyed uniform from the first four md5 nibbles (never 0
   * or 1, and BIT-identical in any engine — integer nibble arithmetic,
   * an exact +0.5, and a power-of-two divide), and the k LARGEST keys
   * per stratum are the sample. Monotone-equivalent to the classic
   * `u^(1/w)` reservoir keys, so inclusion is tilted toward weight
   * exactly as ES define it; same corpus + same seed ⇒ same sample on
   * any layout, partitioning, or engine, and a new seed is a fresh
   * draw. This is the quality/length-weighted subsample step of a
   * curation pipeline made reproducible — where [[temperatureMix]]
   * takes the deterministic BEST rows per budget and [[resampleMix]]
   * re-weights whole strata, this draws a weight-proportional RANDOM
   * subset within each stratum.
   *
   * Rows with `weightCol <= 0` or null never enter the sample (an ES
   * weight must be positive). 100 TB shape: one map pass computes keys,
   * then ONE exchange of ≤ k pre-combined rows per stratum — the
   * [[graft.functions.GraftFunctions.top_k_by]] aggregate partial-
   * aggregates map-side, so the shuffle carries O(strata · k), never
   * the corpus; no window, no global sort. Output: (stratum, id, rank)
   * with rank 1..k by (key DESC, id ASC).
   */
  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
                     weight: Column, k: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val hex = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary"))
    val digits = "0123456789abcdef"
    val nib = (i: Int) => instr(lit(digits), substring(hex, i, 1)) - 1
    val bk = ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
    val u = (bk.cast("double") + lit(0.5d)) / lit(65536d)
    val key = log(u) / weight.cast("double")
    df.where(weight.isNotNull && (weight.cast("double") > 0d))
      .select(col(strataCol), col(idCol), key.as("__wskey"))
      .groupBy(strataCol)
      .agg(graft.functions.GraftFunctions.top_k_by(col("__wskey"), col(idCol), k).as("__topk"))
      .select(col(strataCol), posexplode(col("__topk")))
      .select(col(strataCol), col("col.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /**
   * Train a DSIR importance model (Xie et al., NeurIPS 2023 — "Data
   * Selection for Language Models via Importance Resampling",
   * arXiv:2302.03169): per hashed-bigram bucket, the quantized
   * log-likelihood ratio between a TARGET slice of the corpus and the
   * raw corpus. Returns the `buckets`-sized delta array
   * `Δ[b] = ln p̂(b) − ln q̂(b)` (add-1 smoothed, then floored to 16
   * fractional bits so per-document sums of `n_d[b]·Δ[b]` are exact
   * dyadic arithmetic in ANY summation order — the e49/e50 fixed-point
   * reproducibility trick applied to a trained model).
   *
   * 100 TB shape: ONE exploded tokenize pass feeding one 256-row
   * partial-aggregated histogram (both distributions counted in the
   * same aggregate — the target count is a conditional inside it, not
   * a second scan). The only driver materialization is the bounded
   * `buckets`-row model, the same envelope as [[SimilarityOps]]'
   * k-means centroids and PQ codebooks.
   */
  def dsirDeltas(df: DataFrame, textCol: String, isTarget: Column,
                 buckets: Int = 256): Array[Double] =
    dsirDeltasFromHistogram(
      dsirHistogram(df, textCol, isTarget, buckets), buckets)

  /** The DSIR model's PERSISTABLE form: the per-bucket raw/target gram
    * counts `(bucket, n_raw, n_target)`. Histograms are ADDITIVE —
    * incremental model maintenance is a union + per-bucket sum of
    * per-batch histograms, exactly equal to retraining on the combined
    * corpus (the d104/e53 incremental == rebuild contract; the log
    * ratios in [[dsirDeltasFromHistogram]] are nonlinear, so the
    * HISTOGRAM, not the delta array, is what a deployment persists and
    * folds). One exploded tokenize pass, 256-row partial-aggregated
    * output, nothing collected. */
  def dsirHistogram(df: DataFrame, textCol: String, isTarget: Column,
                    buckets: Int = 256): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    // per-doc bucket ints in one compiled loop (DsirBucketsExpr), then a
    // cheap int explode — the HOF form exploded interpreted bigram
    // STRINGS and md5'd them in a separate column; counts are integers,
    // so the histogram is bitwise-unchanged
    df.select(isTarget.as("__tgt"),
        explode(graft.functions.GraftFunctions
          .dsir_buckets(toks, buckets)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_raw"),
        count(when(col("__tgt"), 1)).as("n_target"))
  }

  /** Collapse a (possibly folded) [[dsirHistogram]] into the quantized
    * delta array — the bounded `buckets`-row driver materialization. */
  def dsirDeltasFromHistogram(hist: DataFrame,
                              buckets: Int): Array[Double] = {
    val cq = new Array[Long](buckets)
    val cp = new Array[Long](buckets)
    hist.select(col("bucket"), col("n_raw").cast("long"),
        col("n_target").cast("long"))
      .collect().foreach { r =>
        val b = r.getInt(0)
        require(b >= 0 && b < buckets,
          s"histogram bucket $b out of range for buckets=$buckets — " +
            "collapse with the same bucket count the histogram was trained with")
        // += so a unioned-but-not-yet-summed histogram (which the additive
        // contract invites) folds HERE instead of silently last-write-wins
        // losing all but one batch's counts per bucket (ADVICE r14)
        cq(b) += r.getLong(1); cp(b) += r.getLong(2)
      }
    val tq = cq.sum.toDouble
    val tp = cp.sum.toDouble
    Array.tabulate(buckets) { b =>
      val d = math.log((cp(b) + 1).toDouble / (tp + buckets)) -
        math.log((cq(b) + 1).toDouble / (tq + buckets))
      math.floor(d * 65536.0) / 65536.0
    }
  }

  /**
   * Score + resample a corpus against a trained DSIR model — phase 2 of
   * [[dsirSelect]], split out so a STREAM can run it map-only against a
   * batch-trained model (the s54 train-in-batch / score-in-flight
   * pattern). Each document's log importance weight is the fold
   * `Σ_grams Δ[bucket(gram)]` over its own bigram array (map-only, the
   * gram list never leaves its row; exact dyadic arithmetic, so DuckDB's
   * any-order per-doc sum replays it bitwise). Selection is Gumbel
   * top-k — THE importance-resampling step of the paper — made RNG-free:
   * `key = logw + (−ln(−ln(u)))` with `u` the (seed, id)-keyed md5-nibble
   * uniform of [[weightedSample]]; the k largest keys are a weighted
   * draw WITHOUT replacement from the softmax of the importance weights.
   * One exchange of ≤ k pre-combined (key, id) pairs ends the plan —
   * top_k_by partial-aggregates map-side, so the corpus never shuffles.
   *
   * Output: (id, logw rounded to 6, rank 1..k by key DESC, id ASC).
   */
  def dsirSelectWith(df: DataFrame, idCol: String, textCol: String,
                     deltas: Array[Double], k: Int,
                     seed: String = "dsir1"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = TextOps.tokens(col(textCol))
    // one compiled loop per document (DsirScoreExpr) — the aggregate-HOF
    // fold this replaces ran md5/conv/substring INTERPRETED per bigram
    // (HOF lambdas are CodegenFallback); same arithmetic bitwise, and
    // this is the map-only pass a 100 TB selection run pays corpus-wide
    val logw = graft.functions.GraftFunctions.dsir_score(toks, deltas)
    val digits = "0123456789abcdef"
    val hexId =
      md5(concat(lit(seed), lit(":"), col("__id").cast("string")).cast("binary"))
    val nib = (i: Int) => instr(lit(digits), substring(hexId, i, 1)) - 1
    val bk = ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
    val u = (bk.cast("double") + lit(0.5d)) / lit(65536d)
    val gumbel = -log(-log(u))
    // two selects on purpose: the fold over the gram array is the
    // dominant per-row cost and HOFs are CodegenFallback (no CSE), so
    // __lw must be materialized ONCE and referenced twice — a single
    // select would tokenize + hash every document twice
    df.select(col(idCol).as("__id"), logw.as("__lw"))
      .select(
        struct(col("__id").as("id"),
          (round(col("__lw"), 6) + lit(0.0d)).as("logw")).as("__sid"),
        (col("__lw") + gumbel).as("__key"))
      .agg(graft.functions.GraftFunctions
        .top_k_by(col("__key"), col("__sid"), k).as("__topk"))
      .select(posexplode(col("__topk")))
      .select(col("col.id.id").as(idCol), col("col.id.logw").as("logw"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /**
   * Train byte-pair-encoding merges over the corpus — the real
   * tokenizer-training step (Sennrich et al. 2016, ACL — "Neural
   * Machine Translation of Rare Words with Subword Units"): iteratively
   * count adjacent symbol pairs over the VOCABULARY (word types
   * weighted by frequency) and merge the most frequent pair, ties
   * broken on the pair text. Output: one row per learned merge,
   * `(iter, sym_a, sym_b, pair_count)` — exact integers and strings
   * only, so the oracle (iterations unrolled in SQL, the d83/d84
   * pattern) replays it hash-exact with no float anywhere.
   *
   * Words are restricted to `[a-z]+` — the pre-tokenized lowercase
   * class ('(' and ')' are the symbol delimiters, and grapheme
   * splitting outside ASCII differs across engines). Encoding: each
   * symbol individually wrapped, `(b)(a)(n)(a)(n)(a)`, so a merge
   * applies as ONE literal string replace of `(a)(b)` with `(ab)` —
   * adjacent matches share NO characters (unlike a single-delimiter
   * chain, where the shared '|' makes back-to-back occurrences
   * under-merge: 'banana' + (a,n) must yield `b an an a`), so
   * left-to-right non-overlapping replace — identical in Spark and
   * DuckDB — EQUALS the greedy BPE merge scan: `(a)(a)(a)` merges the
   * first pair only (the merged symbol no longer matches), while
   * non-overlapping repeats all merge. Full wrapping on both pattern
   * ends makes cross-symbol false matches impossible.
   *
   * 100 TB shape: the corpus tokenizes ONCE into the frequency-
   * weighted types table (one exchange of O(|vocab|) rows — the
   * classic trainer property: iterations never re-touch the corpus);
   * each iteration is one partial-aggregated pair-count exchange over
   * the persisted vocabulary leaf plus ONE bounded driver action (a
   * TakeOrdered of ≤ 4·`maxMergesPerRound` candidate rows — the
   * kmeans/centroid envelope), and merge application is a map-only
   * expression layer over that leaf, so every round's plan stays
   * O(|vocab|).
   *
   * `maxMergesPerRound` is the SCALE path to a real vocabulary (r14
   * verdict item 3): a 32k-merge tokenizer cannot afford one driver
   * round trip per merge, so each round accepts up to M merges from
   * the count-ordered candidate list, greedily skipping any pair that
   * shares a symbol with — or whose merged symbol collides with —
   * one already accepted this round. Accepted merges are mutually
   * independent by construction (a merge only perturbs pair counts
   * and string occurrences involving its own or its merged symbol),
   * so they commute and applying all of them as ONE chained-replace
   * expression layer over the pre-round leaf equals applying each to
   * the pre-round state; `pair_count` is each pair's pre-round count.
   * M=1 IS Sennrich exactly (greedy-accept of 1 = the argmax); M>1 is
   * the standard batched-trainer variant — a round's later merges can
   * outrank a pair the round's earlier merges would have newly
   * created, which a merge-at-a-time recount would have seen first.
   * A round with conflicts may accept fewer than M (the candidate
   * list is bounded at 4·M rows); a round accepting zero ends
   * training. 64 rounds × M=64 = a 4096-merge budget on 64 driver
   * actions.
   */
  def bpeTrainMerges(df: DataFrame, textCol: String,
                     iters: Int = 3,
                     maxMergesPerRound: Int = 1): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    require(maxMergesPerRound >= 1 && maxMergesPerRound <= 1024,
      s"maxMergesPerRound must be in [1, 1024], got $maxMergesPerRound")
    val spark = df.sparkSession
    val base = IterPlan.persistedLeaf(
      df.select(explode(TextOps.tokens(col(textCol))).as("__w"))
        .where(col("__w").rlike("^[a-z]+$"))
        .groupBy("__w").agg(count(lit(1)).as("__n"))
        .select(regexp_replace(col("__w"), "(.)", "($1)").as("__enc"),
          col("__n")),
      eager = false)
    val leaves = scala.collection.mutable.ArrayBuffer(base)
    try {
      var types = base
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      var ordinal = 1L
      var round = 1
      var pendingLayers = 0
      var done = false
      while (round <= iters && !done) {
        val syms = filter(split(col("__enc"), "[()]+"), x => x =!= "")
        val pairs = types
          .select(col("__n"), syms.as("__s"))
          .select(col("__n"), explode(zip_with(
            slice(col("__s"), lit(1), greatest(size(col("__s")) - 1, lit(0))),
            slice(col("__s"), lit(2), greatest(size(col("__s")) - 1, lit(0))),
            (a, b) => struct(a.as("a"), b.as("b")))).as("__p"))
          .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
          .agg(sum("__n").as("cnt"))
        val top = pairs.orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(4 * maxMergesPerRound).collect()
        // greedy count-order scan, skip-on-conflict: `touched` holds every
        // symbol an accepted merge consumes AND creates, so no two merges
        // in a round read or write the same symbol — the independence that
        // makes the chained replaces below order-free (a later pattern can
        // neither match inside nor be destroyed by an earlier replacement,
        // and no replace targets a symbol another replace mints)
        val touched = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        val it0 = top.iterator
        while (it0.hasNext && accepted.size < maxMergesPerRound) {
          val r = it0.next()
          val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
          if (!touched(a) && !touched(b) && !touched(a + b)) {
            accepted += ((a, b, cnt))
            touched += a; touched += b; touched += (a + b)
          }
        }
        if (accepted.isEmpty) done = true
        else {
          accepted.foreach { case (a, b, cnt) =>
            merges += ((ordinal, a, b, cnt)); ordinal += 1
          }
          // the whole round's merges are ONE expression layer
          types = types.withColumn("__enc",
            accepted.foldLeft(col("__enc")) { case (e, (a, b, _)) =>
              replace(e, lit(s"($a)($b)"), lit(s"($a$b)"))
            })
          pendingLayers += accepted.size
          // the replace layers accumulate over the leaf; without a
          // periodic collapse round i re-executes all prior rounds'
          // replaces per vocabulary row — O(merges²) at the allowed cap.
          // The collapse must cut RDD LINEAGE too, not just the plan: at
          // the full 64-round budget the chained per-round RDDs overflow
          // the task stack on deserialization (found by the rich-fixture
          // probe, BpeScaleProbe — the synthetic vocab saturates in ~2
          // effective rounds and never reached the depth)
          if (pendingLayers >= 8) {
            types = IterPlan.localCheckpointLeaf(types, eager = false)
            leaves += types
            pendingLayers = 0
          }
          round += 1
        }
      }
      import spark.implicits._
      merges.result().toDF("iter", "sym_a", "sym_b", "pair_count")
    } finally leaves.foreach(_.unpersist())
  }

  /**
   * Apply trained BPE merges ([[bpeTrainMerges]]) to the corpus and
   * report per-group tokenizer FERTILITY — symbols emitted per word —
   * the tokenizer-QA number a multilingual corpus is gated on (a
   * tokenizer trained on one language's statistics over-fragments the
   * others; fertility per language is how that shows up before any
   * model runs). Merges apply IN LEARNED ORDER, each as the same
   * delimiter-bracketed literal replace the trainer used, so
   * segmentation here is exactly the trained tokenizer's greedy merge
   * application. Only `[a-z]+` words count (the trainer's eligibility
   * class).
   *
   * 100 TB shape: map-only over the exploded word stream (the merge
   * chain is a fixed expression layer, no joins — the merges ride the
   * plan as literals), then ONE partial-aggregated exchange of
   * per-group counter rows. Output: (group, n_words, n_symbols,
   * fertility rounded to 6 — one correctly-rounded division of exact
   * integer sums).
   */
  def bpeSegmentStats(df: DataFrame, groupCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val words = df
      .select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("__w"))
      .where(col("__w").rlike("^[a-z]+$"))
    val enc0 = regexp_replace(col("__w"), "(.)", "($1)")
    val encN = merges.foldLeft(enc0) { case (e, (a, b)) =>
      replace(e, lit(s"($a)($b)"), lit(s"($a$b)"))
    }
    words
      .select(col(groupCol),
        size(filter(split(encN, "[()]+"), x => x =!= "")).cast("long").as("__ns"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_words"), sum("__ns").as("n_symbols"))
      .select(col(groupCol), col("n_words"), col("n_symbols"),
        round(col("n_symbols").cast("double") / col("n_words").cast("double"),
          6).as("fertility"))
  }

  /**
   * DSIR data selection end-to-end: train the hashed-bigram importance
   * model on the corpus itself ([[dsirDeltas]] — target slice vs raw),
   * then score and Gumbel-resample `k` documents ([[dsirSelectWith]]).
   * The published method for "make 100 TB of raw crawl look like the
   * target domain": importance weights from an n-gram likelihood ratio,
   * then sampling proportional to the weights rather than top-k
   * cherry-picking (which would collapse diversity). Two corpus passes
   * total — one histogram scan to train, one map-only scan + bounded
   * top-k exchange to select.
   */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int, buckets: Int = 256,
                 seed: String = "dsir1"): DataFrame =
    dsirSelectWith(df, idCol, textCol,
      dsirDeltas(df, textCol, isTarget, buckets), k, seed)

  /**
   * Repair cross-split near-duplicate leakage — the FIX for what the
   * leakage audit (ngramOverlap over a split assignment) detects:
   * content-hash splitting co-locates verbatim duplicates by
   * construction, but NEAR-duplicates hash apart and can straddle the
   * split, quietly promoting test answers into train. Given the split
   * assignment and the near-dup connected components, every member of a
   * cluster is forced into ONE split: the split its REPRESENTATIVE (the
   * component label, i.e. the minimum id — [[graft.ops.DedupOps
   * .connectedComponents]]'s convention) was content-hash-assigned.
   * Deterministic (no RNG, no rank), stable under corpus growth exactly
   * like [[splitAssign]] — a cluster's split can only change if its
   * minimum id changes — and idempotent: re-running on the repaired
   * assignment moves nothing.
   *
   * 100 TB shape: `components` covers only documents that appear in a
   * near-dup pair — typically a small fraction of the corpus, so both
   * joins (member → component, component → representative split)
   * auto-broadcast and the corpus itself stays map-only. The broadcast
   * is deliberately NOT forced: a pathologically duplicated corpus can
   * make the component table corpus-sized, and a forced broadcast
   * would OOM the driver where the planner's size-based choice simply
   * degrades to a hash join. Output: the input with `split` replaced
   * by the repaired value, plus `split_before` and a `moved` flag
   * (BIGINT 0/1) for auditing.
   */
  def splitRepair(assigned: DataFrame, idCol: String, splitCol: String,
                  components: DataFrame): DataFrame = {
    require(assigned.columns.contains(splitCol),
      s"assigned must carry the '$splitCol' column (run splitAssign first)")
    val comp = components.select(col("id").as("__rid"),
      col("component").as("__comp"))
    val repSplit = comp.where(col("__rid") === col("__comp"))
      .join(assigned.select(col(idCol).as("__rid"),
        col(splitCol).as("__rep_split")), Seq("__rid"))
      .select(col("__comp"), col("__rep_split"))
    // member → rep_split resolves SMALL × SMALL first, so the corpus
    // stream pays ONE join against one (id → rep_split) table instead of
    // two chained ones (member, then repSplit) — one less broadcast build
    // and one less operator on the hot path (r15 audit of the r14
    // verdict's d108 cost item). Inner join: a component whose rep is
    // absent from `assigned` resolves to no row, and the left join +
    // coalesce below keeps those members on their original split —
    // exactly the prior chained-join semantics.
    val memberRep = comp.join(repSplit, Seq("__comp"))
      .select(col("__rid").as(idCol), col("__rep_split"))
    assigned
      .withColumnRenamed(splitCol, "split_before")
      .join(memberRep, Seq(idCol), "left")
      .withColumn(splitCol, coalesce(col("__rep_split"), col("split_before")))
      .withColumn("moved",
        when(col(splitCol) =!= col("split_before"), 1L).otherwise(0L))
      .drop("__rep_split")
  }

  /**
   * Deterministic global shuffle into training shards — the "shuffle the
   * corpus before writing tfrecord/parquet shards" step. Every document
   * gets a pseudorandom but reproducible position derived ONLY from
   * `(seed, id)`: shard = first two hex nibbles of `md5(seed:id)` mod
   * `numShards`, position = rank of the full hash inside the shard. Same
   * seed ⇒ same layout on any engine, cluster, or run; a new seed is a
   * fresh permutation.
   *
   * 100 TB design: sharding is a hash partition (one shuffle); ordering
   * is per-shard (window inside each hash partition), never a global
   * sort. `numShards` scales with the corpus — shards are the unit of
   * training-file output, so they are sized to fit an executor: the
   * four-nibble key space supports up to 65,536 shards (~1.5 GB/shard at
   * 100 TB). The leading four hex digits are the shard key;
   * [[resampleMix]] deliberately reads digits 9-16, so the two hash uses
   * stay independent.
   */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
                    numShards: Int): DataFrame = {
    require(numShards >= 1 && numShards <= 65536,
      "numShards must be in [1, 65536]")
    val hex = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary"))
    val digits = "0123456789abcdef"
    val nib = (i: Int) => instr(lit(digits), substring(hex, i, 1)) - 1
    val shard = pmod(((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4),
      lit(numShards)).cast("int").as("shard")
    val w = Window.partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", hex)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("shuffle_key")
  }

  /**
   * Deterministic mix resampling: hit a target per-stratum sampling WEIGHT
   * (not just a keep/drop rate) — `weight = 2.25` emits each document 2 or
   * 3 times (a 1/4 of them, chosen by hash, get the 3rd copy), `0.5`
   * keeps half. This is the "epochs per source" knob of a training mix
   * (upsample wiki 3x, downsample crawl to 0.7x) made exact and
   * reproducible: the copy count of a document depends only on
   * `(seed, id)`, so reruns and backfills produce the identical corpus.
   *
   * Map-only then explode — no shuffle at all: each row independently
   * computes `copies = floor(w) + (md5_{64..32}(seed:id) < frac(w) ? 1 : 0)`
   * (the hash-fraction compare is done on the hex STRING against a
   * precomputed 8-hex-digit threshold, so any engine with md5 agrees
   * bit-for-bit), then emits `copy = 0..copies-1`. Output adds `copy`.
   */
  def resampleMix(df: DataFrame, idCol: String, strataCol: String,
                  weights: Map[String, Double], defaultWeight: Double,
                  seed: String): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w < 128),
      "weights must be in [0, 128)")
    def copiesFor(w: Double): Column = {
      val whole = math.floor(w).toLong
      val fracHex = f"${math.rint((w - whole) * 4294967296.0).toLong}%08x"
      // second 8 hex digits: independent of shuffleShards' leading nibbles
      lit(whole) + when(
        substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
          .cast("binary")), 9, 8) < lit(fracHex), 1L).otherwise(0L)
    }
    val copies = weights.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (stratum, w)) => acc.when(col(strataCol) === stratum, copiesFor(w))
    }.otherwise(copiesFor(defaultWeight))
    df.withColumn("copies", copies)
      .where(col("copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("copies") - 1)))
      .drop("copies")
  }

  /**
   * Per-document TF-IDF keyword extraction: the top `k` tokens of each
   * document ranked frequent-in-doc, rare-in-corpus. The RANKING key is
   * exact integer arithmetic — `(tf DESC, doc_freq ASC, token ASC)` — so
   * every engine agrees on the keyword set bit-for-bit; the reported
   * `tfidf = tf * ln(n_docs / doc_freq)` is the standard score for
   * consumers (rounded, since `ln` is the only non-rational step).
   *
   * 100 TB design: tf is per-document, computed by one compiled
   * term_counts loop per row (map-only — the r17 change; the former
   * `explode → groupBy(doc, token)` shuffled every token occurrence);
   * document frequency is one combinable count per distinct token
   * (partial aggs map-side); the corpus-wide doc count joins as a
   * broadcast single row; scoring joins the tf rows to the (bounded,
   * vocabulary-sized) DF table and the top-k is a per-document window —
   * shuffles are on token then id, both necessary, none global.
   */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val tf = df.select(col(idCol),
        explode(graft.functions.GraftFunctions.term_counts(
          TextOps.tokens(col(textCol)))).as("__tc"))
      .select(col(idCol), col("__tc.term").as("token"), col("__tc.tf").as("tf"))
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val ranked = tf.join(docFreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("doc_freq")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(idCol)
          .orderBy(col("tf").desc, col("doc_freq").asc, col("token").asc)))
      .where(col("rank") <= k)
    ranked.select(col(idCol), col("rank"), col("token"), col("tf"),
      col("doc_freq"), col("tfidf"))
  }

  /**
   * Positional inverted index — the retrieval-side complement of the
   * corpus stats above: one posting row per `(term, document)` with term
   * frequency, 1-based token positions (phrase/proximity queries need
   * them), and the term's document frequency. `minDf`/`maxDf` bound the
   * vocabulary at both ends: hapaxes below `minDf` are index bloat,
   * stopwords above `maxDf` are scan bloat.
   *
   * 100 TB design: the posting build is MAP-ONLY — tf and the ascending
   * position list are per-document quantities computed by one compiled
   * [[graft.functions.TermPostings]] loop per row (the r17 change; the
   * former `posexplode → groupBy(term, doc)` shape shuffled every token
   * occurrence, positions and all, for row-local arithmetic). Document
   * frequency is a map-side-combinable count per term (a
   * vocabulary-sized table, shrunk FURTHER by the df filters before it
   * joins), and the final join keys on `term`, where AQE broadcast-joins
   * the df table when the surviving vocabulary is small. No windows: a
   * `count over (partition by term)` window would sort every posting of
   * the hottest stopword in one task — exactly the skew `maxDf` exists
   * to cut, created by the operator that implements it.
   */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf,
      s"need 1 <= minDf <= maxDf, got ($minDf, $maxDf)")
    // tf and the (ascending, 1-based) position list are PER-DOCUMENT:
    // one compiled term_postings loop per row replaces the former
    // `posexplode → groupBy(term, doc) → collect_list` shape, whose
    // exchange carried every token occurrence (collect_list ships all
    // positions through the shuffle). Same rows, same integers; only the
    // per-term df count still shuffles — combinable (term, 1) partials.
    val postings = df
      .select(col(idCol),
        explode(graft.functions.GraftFunctions.term_postings(
          TextOps.tokens(col(textCol)))).as("__tp"))
      .select(col(idCol), col("__tp.term").as("term"),
        col("__tp.tf").as("tf"), col("__tp.positions").as("positions"))
    val docFreq = postings.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf && col("df") <= maxDf)
    postings.join(docFreq, "term")
      .select(col("term"), col("df"), col(idCol), col("tf"), col("positions"))
  }

  /**
   * Corpus snapshot diff — the incremental-pipeline primitive: compare
   * two generations of a corpus by id and content hash, classifying every
   * id as `added` (new only), `removed` (old only), `changed` (both, text
   * differs), or `unchanged`. Downstream stages re-run on
   * `added ∪ changed` and retract `removed` instead of reprocessing the
   * corpus.
   *
   * 100 TB design: both sides project to `(id, md5(text))` BEFORE the
   * full-outer join, so the shuffle carries 16-byte hashes, never
   * documents; the join is a plain hash equi-join on id (AQE-split on
   * skew). Emitting `unchanged` rows is optional — at pipeline scale the
   * unchanged class is ~the whole corpus, so the default drops it and
   * the diff's output is O(churn), not O(corpus).
   */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
                 idCol: String, textCol: String,
                 includeUnchanged: Boolean = false): DataFrame = {
    val o = oldDf.select(col(idCol).as("__old_id"),
      md5(col(textCol).cast("binary")).as("__old_h"))
    val n = newDf.select(col(idCol).as("__new_id"),
      md5(col(textCol).cast("binary")).as("__new_h"))
    val joined = o.join(n, col("__old_id") === col("__new_id"), "full_outer")
      .select(coalesce(col("__new_id"), col("__old_id")).as(idCol),
        when(col("__old_id").isNull, lit("added"))
          .when(col("__new_id").isNull, lit("removed"))
          .when(col("__old_h") =!= col("__new_h"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
    if (includeUnchanged) joined else joined.where(col("status") =!= "unchanged")
  }

  /** Global token vocabulary, top `k` by frequency (ties broken by token
    * text for determinism). Partial aggregation combines per-partition
    * counts map-side; the final top-k is TakeOrderedAndProject — no global
    * sort materializes the full vocabulary. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)

  /**
   * Zipf-slope audit: per stratum, the least-squares slope (and
   * intercept) of `ln freq` on `ln rank` over the top-`k` vocabulary —
   * natural language sits near −1; template spam and OCR noise bend it
   * (the quantitative counterpart of [[frequencySpectrum]]'s counts).
   *
   * Replayable end to end: ranks come from a per-stratum `top_k_by`
   * (count DESC, token tie-break — map-side k-bounded heaps, never a
   * per-stratum vocabulary sort), every regression TERM (`ln r`,
   * `ln c`, their product, `ln²r`) is floored to 2^-24 before summing
   * (integer sums, any order), and the closed-form OLS arithmetic on
   * the descaled sums is written identically in both engines.
   */
  def zipfSlope(df: DataFrame, strataCol: String, textCol: String,
                k: Int = 500): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val scale = lit(16777216.0) // 2^24
    val counts = df.select(col(strataCol),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(strataCol, "tok").agg(count(lit(1)).as("c"))
    val ranked = counts.groupBy(strataCol)
      .agg(graft.functions.GraftFunctions
        .top_k_by(col("c").cast("double"), col("tok"), k).as("__tk"))
      .select(col(strataCol), posexplode(col("__tk")))
      .select(col(strataCol), (col("pos") + 1).cast("double").as("r"),
        col("col.score").as("c"))
    val x = log(col("r"))
    val y = log(col("c"))
    val agg = ranked.select(col(strataCol),
        floor(x * scale).cast("long").as("fx"),
        floor(y * scale).cast("long").as("fy"),
        floor((x * y) * scale).cast("long").as("fxy"),
        floor((x * x) * scale).cast("long").as("fxx"))
      .groupBy(strataCol)
      .agg(count(lit(1)).as("n_terms"),
        (sum(col("fx")).cast("double") / scale).as("sx"),
        (sum(col("fy")).cast("double") / scale).as("sy"),
        (sum(col("fxy")).cast("double") / scale).as("sxy"),
        (sum(col("fxx")).cast("double") / scale).as("sxx"))
      // a single-type stratum has a 0/0 OLS denominator (all ranks equal):
      // Spark yields NaN while other engines' division semantics differ —
      // drop it rather than emit an engine-dependent row (mirrored in the
      // d124 oracle's HAVING)
      .where(col("n_terms") >= 2)
    val n = col("n_terms").cast("double")
    val slope = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    agg.select(col(strataCol), col("n_terms"),
      round(slope, 6).as("slope"),
      round((col("sy") - slope * col("sx")) / n, 6).as("intercept"))
  }

  /**
   * Frequency-spectrum report: per stratum, total tokens, distinct
   * types, hapax legomena (types seen once), and the type-token ratio —
   * the Zipf-shape audit that separates natural language from template
   * spam (machine-generated boilerplate collapses the type inventory;
   * OCR noise explodes the hapax share). One exploded-token shuffle into
   * a (stratum, token) count — partial-aggregated, so the exchange
   * carries distinct (stratum, token) pairs, not token occurrences —
   * then a per-stratum fold over that spectrum. All counts integer;
   * the ratio is one deterministic double division.
   */
  def frequencySpectrum(df: DataFrame, strataCol: String,
                        textCol: String): DataFrame =
    df.select(col(strataCol).as("__grp"),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .groupBy("__grp", "__tok").agg(count(lit(1)).as("__c"))
      .groupBy("__grp").agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("__c") === 1, 1)).as("n_hapax"))
      .withColumn("type_token_ratio",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumnRenamed("__grp", strataCol)

  /**
   * Vocabulary coverage / OOV-rate report: per stratum, how much of the
   * corpus a token vocabulary actually covers — `(strataCol, n_tokens,
   * n_oov, oov_rate)`. The tokenizer-QA gate run before committing to a
   * vocabulary: a vocab that covers 99% of English but 60% of a
   * low-resource language is a data bug surfaced HERE, not after a
   * training run.
   *
   * One exploded-token pass: tokens left-join the vocabulary (vocab side
   * is V rows — broadcast when small, a token-keyed shuffle when not;
   * left to the optimizer), then one partial-aggregated count per
   * stratum. `oov_rate` is a plain integer ratio (n_oov / n_tokens as
   * doubles), deterministic in any engine. Composes with [[vocabTopK]]
   * as the trainer.
   */
  def vocabCoverage(df: DataFrame, strataCol: String, textCol: String,
                    vocab: DataFrame, vocabTokenCol: String): DataFrame = {
    val toks = df.select(col(strataCol).as("__grp"),
      explode(TextOps.tokens(col(textCol))).as("__tok"))
    // dedup defensively: a repeated vocab token would fan out the join
    // and silently inflate every count
    val v = vocab.select(col(vocabTokenCol).as("__tok")).distinct()
      .withColumn("__in_vocab", lit(true))
    toks.join(v, Seq("__tok"), "left")
      .groupBy("__grp").agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("__in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .withColumnRenamed("__grp", strataCol)
  }

  /** Intra-document repetition score — the standard boilerplate/spam
    * quality signal: the fraction of a document's word `n`-grams that are
    * duplicates (1 − distinct/total; 0 for docs shorter than `n` tokens).
    * Map-only: the gram list never leaves its row. */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    // native one-pass grams (the HOF form re-tokenized per position);
    // distinct-over-16-byte-hashes == distinct-over-gram-text
    val grams = transform(
      graft.functions.GraftFunctions.positional_gram_hashes(col(textCol), n),
      g => g.getField("h"))
    df.select(col(idCol), grams.as("__g"))
      .select(col(idCol),
        size(col("__g")).cast("long").as("n_grams"),
        when(size(col("__g")) === 0, lit(0.0))
          .otherwise(lit(1.0) -
            size(array_distinct(col("__g"))).cast("double") / size(col("__g")))
          .as("dup_fraction"))
  }

  /** Gopher-style intra-document repetition signals (Rae et al. 2021,
    * §A1.1): the fraction of a document's non-blank lines that are
    * duplicates, the fraction of its line CHARACTERS inside duplicated
    * lines (a 500-char disclaimer repeated twice weighs its length, not
    * 2 lines), and the share of word-`n`-gram occurrences claimed by the
    * single most frequent gram (template/spam pages repeat one phrase).
    * Complements [[repetitionScore]] (which folds all duplication into
    * one number) with the per-signal thresholds the Gopher/FineWeb
    * filter stacks actually gate on.
    *
    * Scale shape: ONE codegen map pass per document
    * ([[graft.functions.RepetitionStats]]) — zero exchanges at any
    * corpus size; every signal depends only on the row's own text, so
    * the operator is trivially streaming-safe. Per-task memory is
    * bounded by a single document's distinct lines/grams — the same
    * per-row bound any gram-array materialization already pays. (A
    * first cut exploded lines/grams into `(doc, 8-byte hash)` partial
    * aggregates; that shuffled O(tokens) keys per document for stats a
    * single pass computes locally, and was replaced.) Counting is by
    * exact line/gram text, so there is no hash-collision caveat. Docs
    * with no non-blank lines (or fewer than `n` tokens) keep their row
    * with zero counts and NULL fractions.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2): DataFrame = {
    val r = graft.functions.GraftFunctions.repetition_stats(col(textCol), n)
    df.select(col(idCol), r.as("__r"))
      .select(col(idCol),
        coalesce(col("__r.n_lines"), lit(0L)).as("n_lines"),
        col("__r.dup_line_frac").as("dup_line_frac"),
        col("__r.dup_line_char_frac").as("dup_line_char_frac"),
        coalesce(col("__r.n_grams"), lit(0L)).as("n_grams"),
        col("__r.top_gram_frac").as("top_gram_frac"))
  }

  /** RAG-style chunking: fixed `chunkTokens`-token windows every
    * `strideTokens` tokens (overlap = chunk − stride), one output row per
    * chunk. Map-only explode — each document's chunks are produced where
    * the document lives, no shuffle; empty documents yield no chunks. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0, "chunk and stride must be positive")
    val toks = TextOps.tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1), size(col("__toks")), lit(strideTokens))).as("__start"))
      .select(col(idCol),
        floor((col("__start") - 1) / lit(strideTokens.toDouble)).cast("long").as("chunk_idx"),
        least(lit(chunkTokens), size(col("__toks")) - col("__start") + 1)
          .cast("long").as("n_chunk_tokens"),
        md5(array_join(slice(col("__toks"), col("__start"), lit(chunkTokens)), " ")
          .cast("binary")).as("chunk_hash"))
  }

  /**
   * Build a BM25 index — `(postings, stats)` DataFrames to persist
   * (ideally as graft tables, the [[SimilarityOps.buildIvfIndex]]
   * pattern): `postings(doc_id, term, tf, dl)` carries the per-document
   * length ON the posting row so search never joins a separate length
   * table, and `stats` is one row `(n, avgdl)`.
   *
   * 100 TB design: the postings pass is MAP-ONLY — tf and dl are
   * per-document quantities computed by one compiled
   * [[graft.functions.TermCounts]] loop per row (r17; the former
   * `explode → groupBy(doc, term) → window(doc)` shape paid two
   * corpus-volume exchanges for row-local arithmetic). `stats` is a
   * single map-only pass (count + token-count
   * sum, both combinable). The build reads the corpus exactly twice
   * (postings, stats); persisting the result makes every subsequent
   * query batch scan the compact index instead of the corpus — the same
   * amortization as the persisted IVF index.
   */
  def bm25Index(corpus: DataFrame, idCol: String,
                textCol: String): (DataFrame, DataFrame) = {
    // tf and dl are PER-DOCUMENT quantities: one compiled term_counts
    // loop per row computes both map-only, where the former
    // `explode → groupBy(doc, term) → window(doc)` shape paid TWO
    // corpus-volume exchanges (token occurrences, then postings) for
    // row-local arithmetic. Same rows, same exact integers.
    val toked = corpus.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val postings = toked.select(col("doc_id"),
        size(col("__toks")).cast("long").as("dl"),
        explode(graft.functions.GraftFunctions.term_counts(col("__toks")))
          .as("__tc"))
      .select(col("doc_id"), col("__tc.term").as("term"),
        col("__tc.tf").as("tf"), col("dl"))
    // N counts ALL documents (empty ones have no postings but still dilute
    // avgdl); token totals stay exact integers until the one double
    // division both engines perform identically. The INTEGER totals ride
    // along on the stats row so [[appendToBm25Index]] can merge a delta
    // exactly (double n/avgdl alone cannot be un-divided bitwise).
    val stats = corpus
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol))).cast("long")).as("tot_tokens"))
      .select(col("n_docs"),
        coalesce(col("tot_tokens"), lit(0L)).as("tot_tokens"),
        col("n_docs").cast("double").as("n"),
        (coalesce(col("tot_tokens"), lit(0L)).cast("double") /
          col("n_docs").cast("double")).as("avgdl"))
    (postings, stats)
  }

  /**
   * Incremental maintenance for a persisted BM25 index: fold a batch of
   * NEW documents into an existing `(postings, stats)` pair WITHOUT
   * re-reading the already-indexed corpus. Returns
   * `(deltaPostings, mergedStats)` — append `deltaPostings` to the
   * postings table (posting rows are per-document, so new documents are
   * strictly new rows) and OVERWRITE the one-row stats table with
   * `mergedStats` (a snapshot-versioned overwrite on a graft table).
   *
   * Exactness: `dl` rides each posting row and depends only on its own
   * document, and the merged stats re-derive `n`/`avgdl` from the SUM of
   * the exact integer totals both sides carry — the identical integers a
   * full rebuild aggregates, hence the identical double division,
   * bitwise. Search over base+delta therefore equals search over a
   * from-scratch rebuild (oracle-graded as d104).
   *
   * 100 TB design: the delta pass reads ONLY the delta (two scans, same
   * as [[bm25Index]]); the base index contributes one broadcast-size
   * stats row. The optional disjointness guard is the only base-side
   * work — a semi-join of base postings against the delta's doc ids
   * (compact index rows, term-IN-unprunable but column-pruned to
   * doc_id) — because a document indexed TWICE corrupts df counts
   * silently; callers that know ids are fresh (e.g. monotonic ingest)
   * can skip it.
   */
  def appendToBm25Index(basePostings: DataFrame, baseStats: DataFrame,
                        deltaDocs: DataFrame, idCol: String, textCol: String,
                        checkDisjoint: Boolean = true): (DataFrame, DataFrame) = {
    val (deltaPostings, deltaStats) = bm25Index(deltaDocs, idCol, textCol)
    if (checkDisjoint) {
      val dup = basePostings.select("doc_id").
        join(deltaDocs.select(col(idCol).as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi").limit(1).collect()
      if (dup.nonEmpty)
        throw new graft.InvalidDataError(
          s"appendToBm25Index: document ${dup.head.get(0)} is already " +
            "indexed — incremental append is for NEW documents only " +
            "(re-indexing a document would double-count its postings)")
    }
    val merged = baseStats.select("n_docs", "tot_tokens")
      .unionByName(deltaStats.select("n_docs", "tot_tokens"))
      .agg(sum("n_docs").as("n_docs"), sum("tot_tokens").as("tot_tokens"))
      .select(col("n_docs"), col("tot_tokens"),
        col("n_docs").cast("double").as("n"),
        (col("tot_tokens").cast("double") /
          col("n_docs").cast("double")).as("avgdl"))
    (deltaPostings, merged)
  }

  /**
   * BM25 search over a built (ideally persisted) index: for each query,
   * the `k` highest-BM25 documents (Robertson idf
   * `ln(1 + (N - df + 0.5)/(df + 0.5))`, tf saturation `k1`, length
   * normalization `b`). The standard lexical-retrieval baseline for RAG
   * corpus curation and hard-negative mining.
   *
   * 100 TB design: the query term set is tiny by construction and
   * BROADCAST, so candidate generation is a map-side semi-join — only
   * postings whose term appears in some query survive, and per-term
   * document frequency is counted over exactly those postings (the
   * index's two scans are of the COMPACT postings table, with the term
   * filter pushable to its scan when persisted). Per-query top-k goes
   * through the map-side-combining `top_k_by` aggregate — the exchange
   * carries queries×k pairs, not the candidate set. Scores are rounded
   * to 6 decimals BEFORE ranking so the rank is reproducible across
   * engines and partitionings (ties break on document id).
   *
   * `maxDf` is the query-time stopword cut — THE candidate-volume lever
   * at scale: candidates = Σ_{query terms} df(term), so one term the
   * whole corpus contains drags |corpus| rows into the score no matter
   * how tiny its idf (`ln(1 + ~0.5/df)` ≈ 0). Terms with `df > maxDf`
   * are dropped from scoring entirely (measured at sf1: 59% of the
   * postings table matched some query term unpruned; see SCALE.md).
   */
  def bm25Search(postings: DataFrame, stats: DataFrame,
                 queries: DataFrame, queryIdCol: String, queryTextCol: String,
                 k: Int, k1: Double = 1.2, b: Double = 0.75,
                 maxDf: Long = Long.MaxValue,
                 rekeyScoreByDoc: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"need k1 > 0 and b in [0,1], got ($k1, $b)")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val qterms = queries.select(col(queryIdCol).as("query_id"),
        explode(TextOps.tokens(col(queryTextCol))).as("term"))
      .distinct()
    val qvocab = qterms.select("term").distinct()
    // df per query term: every posting containing the term survives the
    // vocabulary semi-join, so a per-term count IS the document frequency.
    // Deliberately computed from the UN-re-keyed postings: this branch
    // aggregates BY TERM, so a term-major index stream is the best case
    // for its map-side partial agg, and the exchange it pays is
    // vocabulary-sized — re-keying it by doc (the r12-r17 shape, where
    // bm25SearchIndexed repartitioned before handing the postings over)
    // paid a full pruned-postings exchange for nothing (r18: one
    // REPARTITION_BY_COL Exchange gone from the search leg).
    val dfreq = postings.join(broadcast(qvocab), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    // the SCORE side is where doc-major locality matters (the
    // (query_id, doc_id) aggregate's partial-agg hash map, SCALE.md r12)
    // — integer counts in dfreq are partitioning-invariant, and the
    // score aggregate's input partitioning is exactly what it was, so
    // scores are bitwise unchanged
    val scoreSide =
      if (rekeyScoreByDoc) postings.repartition(col("doc_id")) else postings
    // dfreq joins FIRST: the inner join against the (already df-pruned)
    // term list is what cuts candidate volume before per-query fan-out
    val termScore = scoreSide
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("__s"))
    val scored = termScore.groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("__s")), 6).as("score"))
    SimilarityOps.topKBy(scored, "query_id", "doc_id", "score", k)
  }

  /**
   * EXACT heavy hitters without a full-vocabulary shuffle: every value of
   * `termCol` whose exact count satisfies `cnt·den ≥ n·num` (frequency
   * ≥ num/den of the non-null rows) with its exact count — the corpus
   * stopword/boilerplate/hot-key detector.
   *
   * Two passes, the sketch-then-verify shape:
   *  1. CANDIDATES: one [[graft.functions.MisraGries]] aggregate — each
   *     map partition reduces to ≤ `capacity` entries BEFORE the
   *     exchange, so the shuffle carries ≤ capacity·partitions tiny
   *     rows, never the vocabulary. MG guarantees every term with
   *     frequency > n/(capacity+1) survives; `capacity ≥ den/num` makes
   *     false negatives impossible AT the threshold. The ≤ capacity
   *     candidates (bounded by construction) come to the driver.
   *  2. EXACT RECOUNT: one combinable count over rows matching the
   *     candidate set — an `isin` literal filter, PUSHABLE to the scan —
   *     then the exact integer threshold `cnt·den ≥ n·num` (no float
   *     frequency compare). Output is exact and deterministic, so a
   *     plain GROUP BY/HAVING oracle grades it.
   */
  def heavyHitters(df: DataFrame, termCol: String,
                   num: Long = 1L, den: Long = 100L,
                   capacity: Int = 0): DataFrame = {
    require(num >= 1 && den >= num,
      s"threshold must satisfy 1 <= num <= den, got $num/$den")
    val k =
      if (capacity > 0) capacity
      else math.max(16, math.ceil(den.toDouble / num).toInt)
    require(k >= den / num,
      s"capacity $k cannot guarantee threshold $num/$den (need >= ${den / num})")
    val row = df.agg(graft.functions.GraftFunctions
      .misra_gries(col(termCol), k).as("s")).head()
    val s = row.getStruct(0)
    val n = s.getLong(0)
    val cands = s.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    if (n == 0 || cands.isEmpty)
      return df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(termCol,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType))))
    df.where(col(termCol).isin(cands: _*))
      .groupBy(termCol).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(den) >= lit(n) * lit(num))
  }

  /**
   * [[bm25Search]] against a PERSISTED index with the query vocabulary
   * pushed into the postings SCAN — the e47 treatment for lexical
   * retrieval: the distinct query terms (tiny by construction — they
   * come from the query batch, and the guard is LOUD, not truncating)
   * become an explicit `term IN (...)` filter, so on a term-bucketed
   * graft postings table manifest pruning skips every bucket partition
   * no query term hashes into BEFORE a byte of the index is read. The
   * semi-join inside [[bm25Search]] did the same pruning logically, but
   * a join key restriction never reaches file planning — the literal
   * filter does. Results are identical: per-term document frequencies
   * count postings CONTAINING the term, which the vocabulary filter
   * never touches.
   */
  def bm25SearchIndexed(postings: DataFrame, stats: DataFrame,
                        queries: DataFrame, queryIdCol: String,
                        queryTextCol: String,
                        k: Int, k1: Double = 1.2, b: Double = 0.75,
                        maxDf: Long = Long.MaxValue,
                        maxQueryTerms: Int = 1 << 16): DataFrame = {
    require(maxQueryTerms >= 1, s"maxQueryTerms must be >= 1, got $maxQueryTerms")
    val vocab = queries
      .select(explode(TextOps.tokens(col(queryTextCol))).as("term"))
      .distinct().limit(maxQueryTerms + 1)
      .collect().map(_.getString(0)).sorted
    if (vocab.length > maxQueryTerms)
      throw new graft.InvalidDataError(
        s"query batch exceeds $maxQueryTerms distinct terms; split the " +
          "batch or use bm25Search without scan pushdown")
    // re-key the pruned postings by doc BEFORE scoring: the persisted
    // table streams TERM-major (that is what bucket pruning needs), but
    // the (query_id, doc_id) score aggregate wants DOC-major locality —
    // term-major input scatters each group across the whole stream, the
    // partial-agg hash map overflows, and the exchange carries the
    // candidate volume instead of the group count (measured 2x at sf1
    // with stopword-heavy queries, SCALE.md r12). The repartition
    // shuffles the COMPACT pruned index — O(matched postings), always
    // <= the candidate stream it tames — and since r18 applies to the
    // SCORE branch only (rekeyScoreByDoc): the df-count branch is
    // by-term and was paying the doc re-key exchange for nothing.
    val pruned = postings.where(col("term").isin(vocab.toSeq: _*))
    bm25Search(pruned, stats, queries, queryIdCol, queryTextCol, k, k1, b,
      maxDf, rekeyScoreByDoc = true)
  }

  /** One-shot convenience: [[bm25Index]] + [[bm25Search]]. Fine for a
    * single query batch; repeated batches should persist the index. */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, queryIdCol: String, queryTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = Long.MaxValue): DataFrame = {
    val (postings, stats) = bm25Index(corpus, idCol, textCol)
    bm25Search(postings, stats, queries, queryIdCol, queryTextCol, k, k1, b,
      maxDf)
  }

  /**
   * EXACT per-group percentiles of an integer-valued metric (token
   * counts, char lengths, chunk counts — the length-distribution report
   * every corpus curation round starts from), computed WITHOUT sorting
   * the corpus: the values are first folded into a per-group HISTOGRAM
   * (one partial-aggregated shuffle of O(distinct (group, value)) rows —
   * token counts at any corpus size occupy a few thousand distinct
   * values), and the percentile is then read off the histogram's running
   * count with a window over those few rows. `approx_percentile` trades
   * accuracy for exactly this shape; a small integer value domain makes
   * the exact form just as cheap, and integer-exact semantics let a SQL
   * oracle replay it bitwise.
   *
   * Percentile definition (the inverted-CDF / `quantile_disc` lower
   * convention): `p`-th percentile = smallest value whose cumulative
   * count reaches `ceil(total·p/100)`, evaluated in integer arithmetic
   * (`cum·100 >= total·p`) so no float division enters the comparison.
   *
   * Returns one row per group: (`groupCol`, n_rows, p<p1>, p<p2>, ...).
   * NULL values are excluded from both the histogram and the total.
   */
  def groupQuantiles(df: DataFrame, groupCol: String, value: Column,
                     percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val hist = df.select(col(groupCol).as("__grp"), value.cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy("__grp", "__v").agg(count(lit(1)).as("__cnt"))
    quantilesFromHistogram(hist, "__grp", "__v", "__cnt", percentiles)
      .withColumnRenamed("__grp", groupCol)
  }

  /**
   * Temperature-flattened source sampling — the multilingual mixing rule
   * (sample stratum `s` proportional to `n_s^(1/T)`): T = 1 reproduces
   * the natural distribution, larger T flattens it toward uniform so
   * low-resource strata keep presence against a dominant head. Returns
   * the selected rows (schema unchanged).
   *
   * Engine-exact by construction:
   *
   *  - per-stratum weights are INTEGER `floor(n^(1/T))` and the budget
   *    split `totalBudget · w_s / Σw` is integer multiply-then-divide —
   *    no float sum whose result depends on accumulation order (Σw is an
   *    integer), and for the T = 2 default the weight goes through
   *    `sqrt`, which IEEE requires correctly rounded, so any engine
   *    computes the identical budgets;
   *  - selection within a stratum takes the budget's smallest rows by
   *    `(md5(text), id)` — a content-keyed deterministic draw (the d43
   *    rule) that any engine replays.
   *
   * Scale shape: NO corpus sort. The md5 order is realized two-phase —
   * a 256-bucket histogram on the hash's first byte (tiny: strata × 256
   * rows, broadcast back), whole buckets kept below the budget boundary,
   * and an exact `row_number` only inside each stratum's one straddling
   * bucket (~n_s/256 rows behind the window). Budgets larger than a
   * stratum keep the whole stratum (no redistribution of the shortfall).
   * NULL-text rows are excluded before counting, so budgets and
   * selection see the same corpus.
   */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     textCol: String, totalBudget: Long,
                     temperature: Double = 2.0): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    require(temperature >= 1.0, s"temperature must be >= 1, got $temperature")
    val reserved = Seq("__tm_s", "__tm_h", "__tm_b", "__tm_n", "__tm_w",
      "__tm_tw", "__tm_budget", "__tm_c", "__tm_cum", "__tm_cum_before",
      "__tm_rk")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input must not contain reserved working columns: ${clash.mkString(", ")}")
    val outCols = df.columns.toSeq.map(col)
    val base = df.where(col(textCol).isNotNull)
      .withColumn("__tm_s", struct(col(strataCol))) // null-safe stratum key
      .withColumn("__tm_h", md5(col(textCol).cast("binary")))
      // first hash byte as the histogram bucket: lowercase-hex
      // lexicographic order == numeric prefix order, so whole-bucket
      // cuts agree with the full (md5, id) rank
      .withColumn("__tm_b", conv(substring(col("__tm_h"), 1, 2), 16, 10)
        .cast("long"))
    // integer weights; sqrt for the default T=2 (correctly rounded per
    // IEEE — pow carries no such guarantee, so non-default temperatures
    // are property-tested rather than oracle-replayed)
    val nD = col("__tm_n").cast("double")
    val wExpr = if (temperature == 2.0) floor(sqrt(nD))
      else floor(pow(nD, lit(1.0 / temperature)))
    val weights = base.groupBy(col("__tm_s"))
      .agg(count(lit(1)).as("__tm_n"))
      .withColumn("__tm_w", wExpr.cast("long"))
    val tw = weights.agg(sum(col("__tm_w")).as("__tm_tw"))
    val budgets = weights.crossJoin(broadcast(tw))
      .withColumn("__tm_budget",
        when(col("__tm_tw") > 0,
          expr(s"(${totalBudget}L * __tm_w) div __tm_tw"))
          .otherwise(lit(0L)))
      .select(col("__tm_s"), col("__tm_budget"))
    val cumW = Window.partitionBy(col("__tm_s")).orderBy(col("__tm_b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = base.groupBy(col("__tm_s"), col("__tm_b"))
      .agg(count(lit(1)).as("__tm_c"))
      .withColumn("__tm_cum", sum(col("__tm_c")).over(cumW))
      .withColumn("__tm_cum_before", col("__tm_cum") - col("__tm_c"))
      .drop("__tm_c")
    val tagged = base.join(broadcast(stats), Seq("__tm_s", "__tm_b"))
      .join(broadcast(budgets), Seq("__tm_s"))
    val keepAll = tagged.where(col("__tm_cum") <= col("__tm_budget"))
    val straddle = tagged.where(col("__tm_cum") > col("__tm_budget") &&
      col("__tm_cum_before") < col("__tm_budget"))
    val w = Window.partitionBy(col("__tm_s"), col("__tm_b"))
      .orderBy(col("__tm_h").asc, col(idCol).asc)
    val straddleKept = straddle
      .withColumn("__tm_rk", row_number().over(w))
      .where(col("__tm_cum_before") + col("__tm_rk") <= col("__tm_budget"))
    keepAll.select(outCols: _*).unionByName(straddleKept.select(outCols: _*))
  }

  /**
   * Corpus card: the per-language dataset-statistics report a corpus
   * release ships with — doc count, total tokens, exact token-count
   * percentiles, and the exact-duplicate overhead — in ONE DataFrame:
   * `(langCol, n_docs, p<p1>, p<p2>, ..., n_tokens, n_dup_docs)`.
   *
   * Two corpus passes, each one shuffle, neither corpus-keyed on the
   * output side:
   *
   *  1. the [[groupQuantiles]] token-count HISTOGRAM (partial-aggregated
   *     to O(distinct (lang, ntok)) rows) — n_docs, n_tokens, and every
   *     percentile all read off the same histogram (`Σcnt`, `Σ v·cnt`,
   *     inverted CDF), so the totals cost nothing extra;
   *  2. a digest pass for the duplicate rate — `n_docs −
   *     count(distinct md5(text))` per language, the only stat that
   *     genuinely needs corpus-cardinality state (Spark's two-phase
   *     distinct keeps it partial-aggregated).
   *
   * The join reuniting them is #languages rows. Every stat is
   * integer-exact, so a SQL oracle replays the card bitwise.
   */
  def corpusCard(df: DataFrame, langCol: String, textCol: String,
                 percentiles: Seq[Int] = Seq(50, 95)): DataFrame = {
    val hist = df.select(col(langCol).as("__grp"),
        TextOps.tokenCount(col(textCol)).cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy("__grp", "__v").agg(count(lit(1)).as("__cnt"))
    val quant = quantilesFromHistogram(hist, "__grp", "__v", "__cnt",
      percentiles).withColumnRenamed("n_rows", "n_docs")
    val toks = hist.groupBy("__grp")
      .agg(sum(col("__v") * col("__cnt")).as("n_tokens"))
    val dups = df.where(col(textCol).isNotNull)
      .select(col(langCol).as("__grp"),
        md5(col(textCol).cast("binary")).as("__dig"))
      .groupBy("__grp").agg(
        (count(lit(1)) - countDistinct(col("__dig"))).as("n_dup_docs"))
    quant.join(toks, Seq("__grp")).join(dups, Seq("__grp"))
      .withColumnRenamed("__grp", langCol)
  }

  /**
   * C4-style boilerplate removal at sentence granularity: a sentence
   * appearing in MORE THAN `maxDocs` distinct documents is boilerplate
   * (navigation text, footers, cookie banners — content no single
   * author wrote for this page) and is dropped from EVERY document;
   * each document's surviving sentences re-join in order. Documents
   * whose sentences are all boilerplate survive with empty text (the
   * caller's length filter is the right place to drop them).
   *
   * Scale shape: sentence TEXT shuffles only inside its own document's
   * rebuild group (bounded by the document); the cross-corpus frequency
   * count rides 8-byte sentence hashes — (hash, doc) distinct, then one
   * partial-agg count. The boilerplate set joins back by hash (a plain
   * equi-join: its size is bounded by |sentences|/maxDocs, so no
   * broadcast assumption), and the verdict never touches rows outside
   * the flagged hashes.
   *
   * Returns (`idCol`, text_clean, n_dropped) — one row per input doc.
   */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        maxDocs: Long): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val sents = df.select(col(idCol), posexplode(TextOps.sentences(col(textCol))))
      .select(col(idCol), col("pos"), col("col").as("__sent"),
        xxhash64(col("col")).as("__h"))
    val boiler = sents.select(col("__h"), col(idCol)).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") > maxDocs)
      .select("__h")
    val kept = sents.join(boiler, Seq("__h"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__sent")))),
          x => x.getField("__sent")), " ").as("text_clean"),
        count(lit(1)).as("__n_kept"))
    df.select(col(idCol),
        size(TextOps.sentences(col(textCol))).cast("long").as("__n_sents"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        (col("__n_sents") - coalesce(col("__n_kept"), lit(0L))).as("n_dropped"))
  }

  /** The percentile-readoff stage of [[groupQuantiles]], exposed so a
    * histogram maintained ELSEWHERE (a streaming `groupBy(group, value)`
    * count — whose state is the histogram itself, bounded by the value
    * domain rather than the corpus — or a persisted stats table) grades
    * through the identical arithmetic. Input: one row per (group, value)
    * with its count. */
  def quantilesFromHistogram(hist: DataFrame, groupCol: String,
                             valueCol: String, countCol: String,
                             percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $percentiles")
    // both windows share the exchange on the group; they run over the
    // HISTOGRAM (distinct values per group), never the input rows
    val wCum = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("__cum", sum(countCol).over(wCum))
      .withColumn("__total", sum(countCol).over(wAll))
    val pAggs = percentiles.map(p =>
      min(when(col("__cum") * 100 >= col("__total") * p, col(valueCol))).as(s"p$p"))
    cum.groupBy(col(groupCol))
      .agg(max("__total").as("n_rows"), pAggs: _*)
  }

  /**
   * PMI collocation mining: the top-`k` adjacent token pairs by
   * pointwise mutual information `ln(c_xy·W / (c_x·c_y))` (Church &
   * Hanks association ratio, W = total token count) among pairs seen at
   * least `minCount` times — the corpus-statistics pass that surfaces
   * multiword units ("new york", "machine learning") ahead of tokenizer
   * merge design, and flags template spam (boilerplate bigrams saturate
   * the top of the list).
   *
   * Three partial-aggregated passes, all shuffling COUNTS, never text:
   * bigram counts (adjacent pairs via one zip of the token array with
   * its own tail — map-only, no self-join), unigram counts, and a
   * one-row total that rides a broadcast cross join. `minCount` prunes
   * the bigram tail BEFORE the unigram joins — the candidate-volume
   * lever: the Zipf tail (hapax bigrams are the overwhelming majority)
   * never reaches an exchange twice. Final top-k is
   * TakeOrderedAndProject on the exact integer ratio
   * `c_xy·W / (c_x·c_y)` (ONE correctly-rounded double division of
   * exact-integer products, so ranking replays bitwise in any IEEE
   * engine; `ln` — whose last ulp is engine-specific — is applied to
   * the ROUNDED output only, never the ranking).
   */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long = 5L,
                      k: Int = 30): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val docs = df.select(TextOps.tokens(col(textCol)).as("__t"))
    val nBi = greatest(size(col("__t")) - 1, lit(0))
    val big = docs
      .select(explode(zip_with(
        slice(col("__t"), lit(1), nBi), slice(col("__t"), lit(2), nBi),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    // the explicit isnotnull (vacuous — tokens() never yields null
    // elements) makes this subplan canonicalize equal to the join sides,
    // so ALL THREE unigram consumers (both join builds and the W total)
    // share ONE shuffle via exchange reuse — without it the total pays a
    // full extra tokenize+count pass over the corpus
    val uni = docs.select(explode(col("__t")).as("__w"))
      .where(col("__w").isNotNull)
      .groupBy("__w").agg(count(lit(1)).as("__c"))
    val total = uni.agg(sum("__c").as("__w_total"))
    big
      .join(uni.select(col("__w").as("w1"), col("__c").as("__cx")), Seq("w1"))
      .join(uni.select(col("__w").as("w2"), col("__c").as("__cy")), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("__ratio",
        (col("c_xy") * col("__w_total")).cast("double") /
          (col("__cx") * col("__cy")).cast("double"))
      .orderBy(col("__ratio").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c_xy"),
        round(log(col("__ratio")), 6).as("pmi"))
  }
}
