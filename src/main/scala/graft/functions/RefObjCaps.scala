package graft.functions

/** Hard caps for plan-embedded codegen reference objects (`addReferenceObj`
  * payloads), enforced by `require` at expression CONSTRUCTION.
  *
  * The rule (learned structurally at r15's sf3 probe, where a
  * plan-embedded multi-million-gram set OOM'd inside
  * `ObjectInputStream.readString` before one row was probed):
  *
  *  - **user-data-sized state ⇒ Broadcast** (one deserialized copy per
  *    executor JVM, shared by all tasks) — [[AnyInSet]]/[[CountInSet]];
  *  - **model-sized state ⇒ plan reference object, ONLY with an enforced
  *    cap** — a reference object is re-deserialized per serialized-plan
  *    copy, so its size must be bounded by the MODEL's construction
  *    (centroid counts, codebook geometry, merge-table length), never by
  *    the corpus.
  *
  * Every constant below is asserted by `ReferenceObjCapSpec`, which also
  * source-scans for `addReferenceObj` call sites: a new expression that
  * embeds a payload without registering here (and without a `require`)
  * fails the suite. The cap table is documented in SCALE.md. */
object RefObjCaps {
  /** Max vector dimensionality for per-dimension model arrays
    * ([[Sq8Dot]] mins/steps, centroid rows, hyperplane rows). */
  val MaxDim: Int = 16384
  /** Max linear-model vocabulary ([[TokenWeightSum]]). */
  val MaxLinearVocab: Int = 1 << 20
  /** Max trigram-LM vocabulary ([[LmAvgLogP]]) — matches the train-side
    * `maxModelRows` default (TextOps.trainLmModel, 1 << 22): a model over
    * the cap must be pruned at train time, not embedded. */
  val MaxLmVocab: Int = 1 << 22
  /** Max flattened PQ codebook floats ([[PqEncode]]/[[PqLut]]):
    * m·ksub·dsub — 16 MiB of float32. */
  val MaxCodebookFloats: Int = 1 << 22
  /** Max total stopwords across lists ([[TextProfile]]). */
  val MaxStopWords: Int = 4096
  /** Max hyperplanes ([[HyperplaneSig]]): the signature packs into a
    * non-negative Int, bit j = sign of dot j. */
  val MaxHyperplanes: Int = 30
  /** Max IVF centroids ([[NearestCentroid]]/[[NearestCentroids]]). */
  val MaxCentroids: Int = 1 << 16
  /** Max Bloom sketch bits ([[BloomMightContain]]): 2^28 bits = 32 MiB.
    * A Bloom is sketch-BOUNDED by construction (expectedItems · bits-per-
    * item at build), so it may summarize user data — the cap bounds the
    * copy cost, not the item count. */
  val MaxBloomBits: Long = 1L << 28
  /** Max trained BPE merges ([[BpeEncode]]). */
  val MaxBpeMerges: Int = 1 << 17
  /** Max planted bump cells (graft.ops.SyntheticBmpBumpedExpr — fixture
    * configuration, not a model). */
  val MaxBumpCells: Int = 4096
}
