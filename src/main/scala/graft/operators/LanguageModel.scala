package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level unigram language-model quality scoring — the CCNet/KenLM
  * filtering step of a training-data pipeline, reduced to its Spark-native
  * core: train a unigram LM on the corpus itself (token counts, add-one
  * smoothing), then score every document by its average token log-probability.
  * Low-probability documents (gibberish, OCR noise, wrong-language text) rank
  * at the bottom; fluent text near the corpus distribution ranks at the top.
  *
  * Scale shape: the "model" is one `groupBy(token).count` — partial
  * aggregation combines map-side, so the shuffle carries one row per DISTINCT
  * token per task, not one per occurrence. Scoring is a join on the token key
  * between per-doc term frequencies and the vocab counts; at 100 TB both
  * sides are already aggregated (|vocab| and Σ|doc vocab| rows, not token
  * occurrences), and AQE broadcasts the vocab side when it fits (natural-
  * language vocabularies are heavy-tailed: even web-scale corpora have
  * ~10^7–10^8 distinct tokens — far below the fact side).
  *
  * Determinism: per-token log-probabilities are floored to integer
  * MICRO-nats (`floor(1e6·ln p)` — floor, not round: identical semantics in
  * Java and C math libraries away from exact-integer arguments) and summed as
  * BIGINT, so the cross-row sum is integer arithmetic — immune to
  * floating-point summation-order differences between partitionings, runs,
  * and engines. The only float ops are one `ln` per DISTINCT (doc, token)
  * pair and one final division of two exact integers.
  */
object LanguageModel {

  /** Unigram counts: token → occurrence count over the whole corpus. */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Per-document average unigram log-probability, add-one smoothed over the
    * training vocab: p(t) = (cnt(t) + 1) / (N + V). Tokens unseen in
    * `model` (possible when scoring a different corpus than the one trained
    * on) get cnt = 0 — the smoothing keeps p > 0.
    *
    * Output per document: `n_tokens`, `logprob_micro` (Σ tf·⌊10⁶·ln p⌋,
    * BIGINT) and `avg_logprob_micro` (DOUBLE — one division at the end).
    */
  def scoreDocs(docs: DataFrame, model: DataFrame,
                idCol: String, textCol: String): DataFrame = {
    val totals = model.agg(
      sum("cnt").cast("long").as("n_total"),
      count(lit(1)).cast("long").as("v_size"))
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    tf.join(model, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lp_micro",
        floor(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("n_total") + col("v_size")).cast("double")) * lit(1e6)).cast("long"))
      .groupBy(idCol)
      .agg(
        sum("tf").cast("long").as("n_tokens"),
        sum(col("tf") * col("lp_micro")).cast("long").as("logprob_micro"))
      .withColumn("avg_logprob_micro",
        col("logprob_micro").cast("double") / col("n_tokens").cast("double"))
  }

  /** Train-on-self scoring: the common single-corpus form. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreDocs(docs, unigramCounts(docs, textCol), idCol, textCol)

  /** Distribution drift per stratum: how far each source/language/snapshot
    * slice's unigram distribution sits from the corpus-wide one, as the
    * average per-token log-likelihood ratio
    *
    *   drift(s) = (1/N_s)·Σ_t tf_s(t)·[ln p̂_s(t) − ln q̂(t)]
    *
    * with both distributions add-one smoothed over the corpus vocabulary —
    * the empirical KL(P̂_s ‖ Q̂) restricted to observed tokens. This is the
    * mixture-monitoring number a corpus pipeline tracks: a source whose
    * drift jumps between snapshots changed its content distribution
    * (crawler drift, spam injection, template change) even when volume and
    * quality scores look flat.
    *
    * Same determinism discipline as [[scoreDocs]]: each log is floored to
    * integer micro-nats, the cross-row sum is BIGINT — order-independent
    * and engine-replayable. Plan shape: two partial-combined aggregates
    * (corpus model |V| rows, per-stratum tf Σ|stratum vocab| rows), the
    * stratum totals (k rows) broadcast, the vocab join AQE-broadcast when
    * it fits — the token-occurrence fact stream is aggregated map-side
    * before anything shuffles.
    */
  def sourceDrift(docs: DataFrame, strataCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(strataCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val model = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val totals = model.agg(
      sum("cnt").cast("long").as("n_total"),
      count(lit(1)).cast("long").as("v_size"))
    val tf = toks.groupBy(strataCol, "token").agg(count(lit(1)).as("tf"))
    val strataTotals = tf.groupBy(strataCol).agg(sum("tf").cast("long").as("n_s"))
    tf.join(broadcast(strataTotals), strataCol)
      .join(model, "token")
      .crossJoin(broadcast(totals))
      .withColumn("lp_s_micro",
        floor(log((col("tf") + 1).cast("double") /
          (col("n_s") + col("v_size")).cast("double")) * lit(1e6)).cast("long"))
      .withColumn("lp_q_micro",
        floor(log((col("cnt") + 1).cast("double") /
          (col("n_total") + col("v_size")).cast("double")) * lit(1e6)).cast("long"))
      .groupBy(strataCol)
      .agg(
        sum("tf").cast("long").as("n_tokens"),
        sum(col("tf") * (col("lp_s_micro") - col("lp_q_micro"))).cast("long").as("drift_micro"))
      .withColumn("avg_drift_micro",
        col("drift_micro").cast("double") / col("n_tokens").cast("double"))
  }

  /** Weak-label naive-Bayes token classifier — the fastText-style quality /
    * domain filter of the CCNet/LLaMA-class data pipelines (train a cheap
    * linear text classifier on weak labels, score the whole corpus, keep
    * what the model likes), in its exact multinomial-NB form: `labelExpr`
    * (any boolean Spark SQL expression — a heuristic, a trusted-source
    * marker, a language tag) weak-labels the corpus; per-class add-one
    * smoothed token likelihoods train from one census; every document then
    * scores `prior + Σ_t tf·[ln p(t|pos) − ln p(t|neg)]` — a linear model
    * whose weights are the NB log-odds.
    *
    * Scale shape: ONE token census carries both class counts (a conditional
    * sum each — no second pass); the weight table is vocab-sized and joins
    * the per-doc tf exactly like [[scoreDocs]] (AQE broadcasts it when it
    * fits); priors/totals are 1-row broadcasts. Integer micro-nat
    * discipline throughout: each log floors to BIGINT separately, sums are
    * exact, the prediction threshold compares integers — order-independent
    * and engine-replayable.
    *
    * Output: (id, n_tokens, score_micro, predicted_pos).
    */
  def nbTokenClassifier(docs: DataFrame, idCol: String, textCol: String,
                        labelExpr: String): DataFrame = {
    val labeled = docs.select(col(idCol), col(textCol),
      expr(labelExpr).cast("boolean").as("__pos"))
    val toks = labeled.select(col(idCol), col("__pos"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val classCounts = toks.groupBy("token").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).cast("long").as("cg"),
      sum(when(col("__pos"), 0L).otherwise(1L)).cast("long").as("cb"))
    val totals = classCounts.agg(
      sum("cg").cast("long").as("ng"),
      sum("cb").cast("long").as("nb_"),
      count(lit(1)).cast("long").as("vs"))
    // smoothed doc-count prior, each log floored separately so the oracle
    // can replay the exact integer
    val prior = labeled.agg(
      (floor(log((sum(when(col("__pos"), 1L).otherwise(0L)) + 1).cast("double")) * lit(1e6)).cast("long") -
        floor(log((sum(when(col("__pos"), 0L).otherwise(1L)) + 1).cast("double")) * lit(1e6)).cast("long"))
        .as("prior_micro"))
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    tf.join(classCounts, "token")
      .crossJoin(broadcast(totals))
      .withColumn("wg",
        floor(log((col("cg") + 1).cast("double") /
          (col("ng") + col("vs")).cast("double")) * lit(1e6)).cast("long"))
      .withColumn("wb",
        floor(log((col("cb") + 1).cast("double") /
          (col("nb_") + col("vs")).cast("double")) * lit(1e6)).cast("long"))
      .groupBy(col(idCol))
      .agg(sum("tf").cast("long").as("n_tokens"),
        sum(col("tf") * (col("wg") - col("wb"))).cast("long").as("llr_micro"))
      .crossJoin(broadcast(prior))
      .withColumn("score_micro", col("llr_micro") + col("prior_micro"))
      .withColumn("predicted_pos", col("score_micro") > 0)
      .select(col(idCol), col("n_tokens"), col("score_micro"), col("predicted_pos"))
  }

  /** Bigram LM scoring (extension; one order up from [[selfScore]] — the
    * step that separates fluent word ORDER from a good word multiset, which
    * a unigram model can't see: shuffled text keeps its unigram score but
    * craters here): add-one smoothed conditionals
    * `p(w₂|w₁) = (c₂(w₁,w₂)+1)/(c₁(w₁)+V)`, per-document average over its
    * `n_tokens − 1` transitions, trained on the corpus itself.
    *
    * The pair stream is a NARROW array transform (`tokens zip tokens.drop 1`
    * via `transform(sequence…)`) — no window sort, no per-position shuffle;
    * after it, everything aggregates map-side exactly like the unigram path
    * (bigram vocab rows, not occurrences, cross the wire). Docs with <2
    * tokens have no transitions and drop out (same contract both engines).
    * Integer micro-nat discipline as everywhere in this file.
    */
  /** (id, w1, w2) adjacent-token transitions of `textCol`, one row per
    * transition. The token array is SPLIT ONCE into a materialized column
    * before the pair lambda: a higher-order function's lambda body is
    * re-evaluated per element with no loop-invariant hoisting, so spelling
    * `split(text)[i]` inside the transform re-tokenizes the whole document
    * for EVERY transition — O(len²) per doc. Binding the array to an
    * attribute makes each element access O(1) (and CollapseProject keeps
    * the multi-referenced non-cheap alias un-inlined).
    *
    * <2-token docs have no transitions — and must be FILTERED before the
    * pair transform: sequence(1, 0) DESCENDS in Spark, so an unguarded
    * transform indexes [-1] and throws under ANSI (latent until a 1-token
    * doc arrived; the DSIR spec caught it).
    */
  private[operators] def bigramPairs(docs: DataFrame, idCol: String,
                                     textCol: String): DataFrame =
    docs.select(col(idCol), split(col(textCol), " ").as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol),
        explode(expr(
          """transform(sequence(1, size(__ws) - 1),
            |  i -> struct(__ws[i - 1] AS w1, __ws[i] AS w2))""".stripMargin))
          .as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.w2").as("w2"))

  def bigramSelfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = bigramPairs(docs, idCol, textCol)
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
    // c1 feeds BOTH the vocab-size aggregate and the scoring join — persist
    // the vocab-bounded census so the corpus tokenize+explode runs once.
    // Cleanup: session owner drops persisted blocks between queries.
    val c1 = toks.groupBy("w").agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = c1.agg(count(lit(1)).cast("long").as("vs"))
    // ONE bigram explode over the corpus: the per-doc term frequencies are
    // the finer statistic and the corpus bigram census is their exact
    // second-level sum (Σ_id tf = c2 by construction) — persisted because
    // tf feeds both that census and the scoring join (bounded: distinct
    // (doc, bigram) rows, the same thing the join already shuffles).
    // Cleanup: session owner drops persisted blocks between queries.
    val tf = pairs.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c2 = tf.groupBy("w1", "w2").agg(sum("tf").cast("long").as("c2"))
    tf.join(c2, Seq("w1", "w2"))
      .join(c1.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(v))
      .withColumn("lpm",
        floor(log((col("c2") + 1).cast("double") /
          (col("c1") + col("vs")).cast("double")) * lit(1e6)).cast("long"))
      .groupBy(col(idCol))
      .agg(
        sum("tf").cast("long").as("n_bigrams"),
        sum(col("tf") * col("lpm")).cast("long").as("logprob_micro"))
      .withColumn("avg_logprob_micro",
        col("logprob_micro").cast("double") / col("n_bigrams").cast("double"))
  }

  /** CCNet perplexity buckets (Wenzek et al. 2020 "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data" §4.3 — the
    * head/middle/tail split every CommonCrawl pipeline reuses): score
    * every document under a language model trained on a CLEAN reference
    * corpus (CCNet: KenLM on Wikipedia; here: the add-one-smoothed bigram
    * LM of [[bigramSelfScore]], trained on `reference` instead of the
    * corpus itself), then cut the corpus into equal thirds by perplexity —
    * `head` (lowest third, most Wikipedia-like), `middle`, `tail`.
    *
    * Scoring is CROSS-corpus, so unlike [[bigramSelfScore]] the count
    * joins are LEFT (an unseen bigram contributes the smoothed floor
    * `ln(1/(c₁+V))`, an unseen history the floor `ln(1/V)`) — integer
    * micro-nat discipline throughout, so the oracle replays bit-for-bit.
    * The perplexity proxy is `−logprob_micro/n_bigrams` (monotone in true
    * bigram perplexity; exponentiating adds nothing to the ORDER the cut
    * needs). Cuts are exact nearest-rank terciles (value at rank ⌈n/3⌉ /
    * ⌈2n/3⌉ — the [[Sketches.percentilesByGroup]] convention, same
    * single-pass rank window and the same documented 100 TB caveat: the
    * window sorts doc-count rows of three narrow columns). `approxCuts`
    * is the scale path — the cut values come from the mergeable
    * `percentile_approx` sketch instead (map-side partials, no global
    * sort, the [[Sketches.approxPercentilesByGroup]] twin relationship);
    * bucketing itself is unchanged, and the twins' agreement is spec'd at
    * test scale. Docs with <2 tokens carry no transitions and drop out
    * (the [[bigramSelfScore]] contract).
    *
    * Returns (id, n_bigrams, logprob_micro, ppl_micro, bucket).
    */
  def ccnetBuckets(reference: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, approxCuts: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def pairs(df: DataFrame) = bigramPairs(df, idCol, textCol)
    val refToks = reference.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
    // c1 feeds BOTH the vocab-size aggregate and the scoring join — persist
    // the vocab-bounded census so the reference tokenize+explode runs once.
    // Cleanup: session owner drops persisted blocks between queries.
    val c1 = refToks.groupBy("w").agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = c1.agg(count(lit(1)).cast("long").as("vs"))
    val c2 = pairs(reference).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val tf = pairs(docs).groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("lpm",
        floor(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("vs")).cast("double")) * lit(1e6))
          .cast("long"))
      .groupBy(col(idCol))
      .agg(sum("tf").cast("long").as("n_bigrams"),
        sum(col("tf") * col("lpm")).cast("long").as("logprob_micro"))
      .withColumn("ppl_micro",
        -col("logprob_micro").cast("double") / col("n_bigrams").cast("double"))
    // exact nearest-rank tercile cuts: value at rank ceil(n/3) / ceil(2n/3)
    // (ties on ppl are cut-safe — the cut is a VALUE, identical whichever
    // tied row holds the rank). All three windows run in the ONE
    // single-partition sort the rank already needs, and the bucket CASE is
    // computed in place — the scored frame's lineage (the bigram joins) is
    // evaluated exactly once, no join-back. approxCuts swaps in the
    // mergeable quantile sketch instead: no global sort, one broadcast of
    // two doubles, scored still evaluated once per consumer.
    if (approxCuts) {
      val cuts = scored.agg(
        percentile_approx(col("ppl_micro"), lit(1.0 / 3), lit(10000))
          .as("__cut1"),
        percentile_approx(col("ppl_micro"), lit(2.0 / 3), lit(10000))
          .as("__cut2"))
      scored.crossJoin(broadcast(cuts))
        .select(col(idCol), col("n_bigrams"), col("logprob_micro"),
          col("ppl_micro"),
          when(col("ppl_micro") <= col("__cut1"), "head")
            .when(col("ppl_micro") <= col("__cut2"), "middle")
            .otherwise("tail").as("bucket"))
    } else {
      val whole = Window.partitionBy(lit(1))
      scored
        .withColumn("__rn", row_number().over(
          Window.orderBy(col("ppl_micro"), col(idCol))))
        .withColumn("__n", count(lit(1)).over(whole))
        .withColumn("__cut1",
          max(when(expr("__rn = (__n + 2) div 3"), col("ppl_micro")))
            .over(whole))
        .withColumn("__cut2",
          max(when(expr("__rn = (2 * __n + 2) div 3"), col("ppl_micro")))
            .over(whole))
        .select(col(idCol), col("n_bigrams"), col("logprob_micro"),
          col("ppl_micro"),
          when(col("ppl_micro") <= col("__cut1"), "head")
            .when(col("ppl_micro") <= col("__cut2"), "middle")
            .otherwise("tail").as("bucket"))
    }
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): log w(x) =
    * log p_target(x) − log p_raw(x) under two add-one-smoothed
    * multinomials over HASHED bigram features — the paper's trick that
    * makes the estimator corpus-scale: the feature space is a fixed
    * `nBuckets` (hash of the bigram), so BOTH count tables are
    * bucket-sized broadcasts no matter how large either corpus grows, and
    * the per-document work is one narrow pair transform + one
    * map-side-combined (doc, bucket) aggregate. No corpus self-join
    * anywhere.
    *
    * Resampling is the Gumbel-top-k trick, made deterministic the way
    * everything here is: the Gumbel variate comes from the document-id
    * hash (`u = (hash28(id)+0.5)/2²⁸`, `g = −ln(−ln u)`) — zero RNG state,
    * same selection every run/engine/partitioning, and sampling WITHOUT
    * replacement ∝ w(x) exactly (Gumbel-max argument). Integer micro-nat
    * discipline: each log floors to BIGINT separately (the
    * [[nbTokenClassifier]] oracle contract), the selection key is
    * `llr_micro + gumbel_micro` — an integer compare.
    *
    * Documents with <2 tokens have no bigram features: weight ratio 1
    * (log 0) by definition, kept with llr_micro = 0 rather than dropped.
    *
    * Returns (id, n_bigrams, llr_micro, key_micro).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    def buckets(df: DataFrame): DataFrame =
      bigramPairs(df, idCol, textCol)
        .select(col(idCol),
          (graft.operators.Curation.hash28(
            concat(col("w1"), lit("_"), col("w2"))) % nBuckets)
            .as("bucket"))
    // the raw corpus is bigram-exploded ONCE — and with explode_outer, so
    // a featureless doc (<2 tokens) survives as a single NULL-bucket row
    // with tf 0 instead of being re-attached later: the old shape scanned
    // `raw` a THIRD time for the id universe and LEFT-joined it back onto
    // the per-doc scores (corpus-sized ⋈ corpus-sized — a shuffle join at
    // scale). Per-doc term frequencies are the finer statistic and the
    // per-bucket raw census is their exact second-level sum —
    // Σ_id tf(id, b) = cr(b) by construction — so the census pass also
    // folds into one keyed aggregate over the (already tiny) tf frame.
    // tf is persisted because it feeds BOTH the broadcast cr census and
    // the main scored aggregate. Bounded: ≤ |raw docs| × nBuckets rows of
    // three integers. Cleanup: the session owner drops persisted blocks
    // between queries (the bench does; library callers own unpersist).
    val tf = raw.select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), explode_outer(expr(
        """CASE WHEN size(__ws) >= 2
          |THEN transform(sequence(1, size(__ws) - 1),
          |               i -> concat(__ws[i - 1], '_', __ws[i]))
          |ELSE array() END""".stripMargin)).as("__g"))
      .select(col(idCol),
        when(col("__g").isNotNull,
          graft.operators.Curation.hash28(col("__g")) % nBuckets)
          .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(when(col("bucket").isNotNull, 1L).otherwise(0L)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cr = tf.filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(sum("tf").cast("long").as("cr"))
    val ct = buckets(target).select("bucket")
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val totals = cr.agg(coalesce(sum("cr"), lit(0L)).as("nr"))
      .crossJoin(broadcast(ct.agg(coalesce(sum("ct"), lit(0L)).as("nt"))))
    // per-bucket log-ratio in integer micro-nats, buckets unseen in either
    // corpus smoothed to count 0 (+1) over the FIXED nBuckets space
    val scored = tf
      .join(broadcast(cr), Seq("bucket"), "left")
      .join(broadcast(ct), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("wb",
        floor(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
          (col("nt") + nBuckets).cast("double")) * lit(1e6)).cast("long") -
          floor(log((coalesce(col("cr"), lit(0L)) + 1).cast("double") /
            (col("nr") + nBuckets).cast("double")) * lit(1e6)).cast("long"))
      .groupBy(col(idCol))
      .agg(sum("tf").cast("long").as("n_bigrams"),
        sum(col("tf") * col("wb")).cast("long").as("llr_micro"))
    // featureless docs are already in `scored` with n_bigrams = llr = 0
    // (their NULL-bucket tf-0 row rides the same aggregates) — no id
    // universe re-scan, no corpus-sized join-back
    val u = (graft.operators.Curation.hash28(col(idCol).cast("string"))
      .cast("double") + lit(0.5)) / lit((1L << 28).toDouble)
    scored
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("llr_micro"), lit(0L)).as("llr_micro"))
      .withColumn("key_micro",
        col("llr_micro") +
          floor(-log(-log(u)) * lit(1e6)).cast("long"))
  }

  /** DSIR selection: the `k` raw documents Gumbel-top-k sampled without
    * replacement with probability ∝ their importance weight — ONE global
    * top-k (TakeOrdered, no full sort materialized), integer key, id
    * tie-break. The training-data-mixing front door: `target` is the
    * trusted domain sample, `raw` the web-scale pool.
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, nBuckets: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    dsirWeights(raw, target, idCol, textCol, nBuckets)
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
  }
}
