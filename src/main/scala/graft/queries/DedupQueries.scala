package graft.queries

import graft.functions.{GapParser, TextFunctions, VectorFunctions}
import graft.operators._
import graft.pipeline.{F1Staging, F1Synthetic}
import graft.sources.{BloomStore, Bucketed, Tables, TxLog}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.QueryShared._

/** Document/text deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard, chunk/span, connected components, fuzzy joins, decontamination, bloom anti-joins.
  *
  * Split from the original single-file registry; each entry keeps its
  * Scaladoc mapping to SURVEY.md §2 / the reference files. The driver
  * surface remains [[graft.SparkEntry.queries]]/[[graft.SparkEntry.oracleSql]],
  * which merge the per-family maps.
  */
private[graft] object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** Exact dedup: hash-groupBy keyed on content (extension; SURVEY §7.5). */
    "q21_exact_dedup" -> ((s, dir) => docs(s, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))),

    /** Document fingerprinting + token counting (extension): whitespace
      * tokens, distinct tokens, and a BPE-ish greedy ≤4-char subword count.
      */
    "q22_fingerprint" -> ((s, dir) => docs(s, dir).select(
      col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.distinctTokenCount(col("text")).as("n_distinct_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]{1,4}', 0))").cast("long").as("n_subwords"),
      col("n_chars"))),

    /** Near-dup: exact n-gram Jaccard, quadratic oracle baseline (capped at
      * doc_id < 5000 so cost is bounded at any sf; the uncapped scale path is
      * q26's MinHash-LSH). */
    "q25_ngram_jaccard" -> ((s, dir) => TextDedup.jaccardPairs(
      TextDedup.wordShingles(docsCapped(s, dir), "doc_id", "text", 3), 0.8)),

    /** Near-dup scale path: MinHash(k=8) + LSH banding (4 bands × 2 rows) +
      * exact Jaccard verify on candidates only; full corpus, no cap. */
    "q26_minhash_lsh" -> ((s, dir) => TextDedup.minhashNearDupes(
      docs(s, dir), "doc_id", "text", n = 3, k = 8, bands = 4, minJaccard = 0.7)),

    /** SimHash fingerprints over the md5-derived 28-bit base hash —
      * bit-replicated by the DuckDB oracle.
      */
    "q29_simhash" -> ((s, dir) => TextDedup.simhash(docs(s, dir), "doc_id", "text")),

    /** Dedup as a pipeline stage (not just pair-finding): greedy keep-lowest-id
      * — a document survives unless it has a near-duplicate with a smaller id
      * (Jaccard >= 0.8 on word-3-gram shingles). Runs the sub-quadratic
      * MinHash-LSH path UNCAPPED, banded for ≈1.0 candidate recall at the 0.8
      * threshold (k=16, 8 bands × 2 rows: a j=0.8 pair is missed with
      * probability (1-0.8²)⁸ ≈ 2.8e-4, and real near-dup pairs sit well above
      * the threshold where the miss rate is far lower); candidates are
      * exact-verified, so precision is exact. Spec-proven equal to the
      * all-pairs path on the sf0.01 corpus.
      */
    "q42_dedup_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = TextDedup.minhashNearDupes(
        d, "doc_id", "text", n = 3, k = 16, bands = 8, minJaccard = 0.8)
      val dropped = pairs.select(col("b_id").as("doc_id")).distinct()
      d.join(dropped, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
    }),

    /** Near-dup CLUSTERS (extension): MinHash-LSH pairs →
      * [[graft.operators.Dedup.connectedComponents]] → one canonical doc
      * (the component minimum) per cluster — corpus dedup the way the
      * literature does it (Lee et al. 2022 §4.1), transitively correct where
      * q42's drop-the-larger-of-each-pair policy is per-edge. The oracle
      * replays the component closure as a DuckDB recursive CTE.
      */
    "q48_dedup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = TextDedup.minhashNearDupes(
        d, "doc_id", "text", n = 3, k = 16, bands = 8, minJaccard = 0.8)
      val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
        .withColumnRenamed("node", "doc_id")
      d.join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"),
          (coalesce(col("component"), col("doc_id")) === col("doc_id"))
            .as("is_canonical"))
    }),

    /** Benchmark decontamination (extension; GPT-3-appendix-C-style n-gram
      * overlap): the "benchmark" is every 17th document truncated to its
      * first 40 words (an eval prompt extracted from a source page — the
      * realistic contamination shape), the corpus is the full table; a
      * corpus document is flagged iff it shares ≥1 word-5-gram with any
      * benchmark doc. The benchmark shingle set broadcasts; the corpus
      * never shuffles ([[graft.operators.Decontamination]]).
      */
    "q52_decontamination" -> ((s, dir) => {
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 17 === 0).select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 40)).as("text"))
      Decontamination.contaminatedDocs(d, bench, "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"), col("n_shared_ngrams"), col("n_bench_docs"))
    }),

    /** Incremental dedup (extension; continuous-crawl shape): every 3rd doc
      * plays the incoming batch, the rest the accepted corpus; the batch's
      * MinHash band rows broadcast onto the corpus bucket table and matches
      * are exact-verified ([[graft.operators.TextDedup
      * .minhashNearDupesAgainst]]). Intra-batch pairs are intentionally
      * absent — that is the semantic difference from q26's self-join.
      */
    "q57_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      TextDedup.minhashNearDupesAgainst(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", n = 3, k = 16, bands = 8, minJaccard = 0.8)
    }),

    /** Exact duplicate-span report (extension; Lee et al. 2022 exact-substring
      * dedup at chunk granularity): 16-token windows every 8 tokens, md5
      * fingerprints, spans fingerprinted ≥2 times reported with occurrence/
      * document counts ([[graft.operators.Curation.duplicateSpans]]). Catches
      * repeated boilerplate inside otherwise-different documents — the case
      * document-level MinHash (q26) is blind to.
      */
    "q66_duplicate_spans" -> ((s, dir) => Curation.duplicateSpans(
      docs(s, dir), "doc_id", "text", k = 16, stride = 8)),

    /** Bloom-accelerated idempotent append (extension; the scale form of
      * J3/S7): a batch that is ⅔ new keys is anti-joined against the corpus,
      * but the codegen'd bloom probe ([[graft.operators.Dedup.bloomAntiJoin]],
      * Spark's own `BloomFilterMightContain`) admits the definitely-new rows
      * without them ever reaching the join — the anti-join's shuffle carries
      * only true dups + the fpp sliver. No false negatives ⇒ exact, so the
      * oracle is the plain `NOT EXISTS`.
      */
    "q70_bloom_antijoin" -> ((s, dir) => {
      val base = orders(s, dir)
      val batch = base.select(
        when(col("o_orderkey") % 3 === 0, col("o_orderkey"))
          .otherwise(col("o_orderkey") + 7777777L).as("o_orderkey"),
        col("o_totalprice"))
      Dedup.bloomAntiJoin(batch, base, "o_orderkey", expectedItems = 100000)
    }),

    /** Edit-distance fuzzy join (extension; entity resolution —
      * [[graft.operators.FuzzyJoin.editDistanceJoin]], the PassJoin segment
      * blocking): distinct document prefixes against a deterministically-
      * perturbed copy (first character dropped — every perturbed string sits
      * at distance 1 from its origin, plus whatever incidental matches
      * exist). Both sides dedupe to DISTINCT strings first — the canonical
      * entity-resolution shape: match the string universe, then map matches
      * back to rows; joining raw rows multiplies every match by both sides'
      * duplication counts (the part-name fixture at sf0.1 is 20000 rows over
      * 64 distinct names — a quadratic output no blocking can save). The
      * equi-join on (length, segment-index, segment-text) + exact verify is
      * provably the same pair set as the quadratic levenshtein scan the
      * oracle runs.
      */
    "q93_fuzzy_join" -> ((s, dir) => {
      val names = docs(s, dir)
        .select(expr("substring(text, 1, 40)").as("l_name"), col("doc_id"))
        .groupBy(col("l_name")).agg(min(col("doc_id")).as("l_key"))
      val perturbed = names.filter(col("l_key") % 2 === 0)
        .select((col("l_key") + 1000000L).as("r_key"),
          expr("substring(l_name, 2)").as("r_name"))
      FuzzyJoin.editDistanceJoin(
        names, "l_key", "l_name", perturbed, "r_key", "r_name", maxDist = 1)
        .select(col("l_id"), col("r_id"), col("dist"))
    }),

    /** Corpus-level duplicated-chunk removal (extension;
      * [[graft.operators.TextDedup.dropDuplicatedChunks]] — the C4
      * boilerplate-line filter at chunk granularity): every 10-word chunk
      * occurring >= 2 times corpus-wide is dropped from EVERY document; the
      * surviving text is re-assembled in order. The duplicated dictionary
      * joins back UNHINTED (duplication-proportional — AQE broadcasts only
      * when the runtime census is small); the corpus shuffles once more,
      * for the per-doc re-assembly.
      */
    "q101_chunk_dedup" -> ((s, dir) =>
      TextDedup.dropDuplicatedChunks(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_kept"),
          col("clean_text"))),

    /** Duplicate-span coverage (extension;
      * [[graft.operators.TextDedup.duplicateSpanCoverage]] — the Lee et al.
      * 2022 exact-substring-dedup statistic at word granularity): per doc,
      * how many sliding 10-word windows recur corpus-wide and how many word
      * positions their span-union covers. No self-join anywhere — census,
      * unhinted semi (AQE-sized), per-doc interval union.
      */
    "q102_dup_spans" -> ((s, dir) =>
      TextDedup.duplicateSpanCoverage(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_words"), col("dup_windows"),
          col("covered_words"))),

    /** EXACT sub-quadratic set-similarity join (extension;
      * [[graft.operators.TextDedup.prefixJaccardJoin]] — PPJoin prefix
      * filtering): all document pairs with 3-gram-shingle Jaccard ≥ 7/10,
      * candidates only from shared rare-prefix shingles, every filter in
      * integer arithmetic. The oracle is the quadratic scan — same rows
      * proves the filter lost nothing.
      */
    "q112_prefix_jaccard" -> ((s, dir) =>
      TextDedup.prefixJaccardJoin(docs(s, dir), "doc_id", "text", 7, 10)),

    /** Blocked sorted-neighborhood entity resolution (extension;
      * [[graft.operators.FuzzyJoin.sortedNeighborhood]] — the merge/purge
      * complement to q93's PassJoin): the q93 string universe plus
      * end-perturbed variants (tail-char drop keeps the sort prefix stable
      * — the regime SN is built for), blocked on the 4-char prefix, window
      * of 5 successors, levenshtein ≤ 1 verify. The oracle replays the
      * ranked window as a rank-band self-join.
      */
    "q125_sorted_neighborhood" -> ((s, dir) => {
      val names = docs(s, dir)
        .select(expr("substring(text, 1, 40)").as("nm"), col("doc_id"))
        .groupBy(col("nm")).agg(min(col("doc_id")).as("id"))
      val perturbed = names.filter(col("id") % 2 === 0)
        .select((col("id") + 1000000L).as("id"),
          expr("substring(nm, 1, length(nm) - 1)").as("nm"))
      FuzzyJoin.sortedNeighborhood(names.unionByName(perturbed), "id", "nm",
        blockLen = 4, windowSize = 5, maxDist = 1)
    }),

    /** Asymmetric containment join (extension; [[graft.operators.TextDedup
      * .containmentJoin]] — Broder's containment, the quote-detection
      * predicate Jaccard can't express): 200-char excerpts cut from every
      * 7th document re-found in the corpus by requiring ≥ 4/5 of the
      * excerpt's 3-gram shingles to appear in the candidate document.
      */
    "q126_containment_join" -> ((s, dir) => {
      val d = docs(s, dir)
      val quotes = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          expr("substring(text, 20, 200)").as("text"))
      TextDedup.containmentJoin(quotes, d, "doc_id", "text", n = 3,
        minNum = 4, minDen = 5)
    }),

    /** MinHash estimator calibration (extension; [[graft.operators.TextDedup
      * .minhashEstimatePairs]]): for every LSH candidate pair, the
      * signature-agreement Jaccard estimate (`n_agree/k` — what a
      * corpus-scale pipeline thresholds on before paying the exact verify)
      * emitted BESIDE the exact shingle Jaccard — the q124 honesty pattern
      * for the near-dup family.
      */
    "q131_minhash_estimate" -> ((s, dir) =>
      TextDedup.minhashEstimatePairs(docs(s, dir), "doc_id", "text",
        n = 3, k = 8, bands = 4)),

    /** Best-of-cluster dedup representative (extension; the curation rule
      * layered on q48's components): within every near-dup cluster KEEP the
      * highest-quality member (longest text, ties to the lower id) instead
      * of the arbitrary min-id canonical — what a real pipeline ships to
      * training. One row_number window over the clustered frame; cluster
      * ids come from the same HashMin components as q48.
      */
    "q181_cluster_rep" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = TextDedup.minhashNearDupes(
        d, "doc_id", "text", n = 3, k = 16, bands = 8, minJaccard = 0.8)
      val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
        .withColumnRenamed("node", "doc_id")
      val clustered = d.join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("doc_id"), coalesce(col("component"), col("doc_id")))
            .as("cluster_id"),
          col("n_chars").cast("long").as("n_chars"))
      clustered
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("cluster_id"))
            .orderBy(col("n_chars").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("cluster_id"), col("n_chars"),
          (col("rn") === 1).as("keep"))
    }),

    /** End-to-end ENTITY RESOLUTION (extension — the capability the blocks
      * compose into): noisy mentions (names + a drop-first-char family + an
      * append-char family) → PassJoin edit-distance blocking
      * ([[graft.operators.FuzzyJoin.editDistanceJoin]], exact, no nested
      * loop) → dist≤1 match edges → HashMin connected components
      * ([[graft.operators.Dedup.connectedComponents]]) → one entity id per
      * mention cluster with its member count. The oracle replays blocking
      * as levenshtein + length filter and the components as a recursive
      * reach closure. Scale posture: the only quadratic work is inside
      * segment blocks; everything else is the q48 component machinery.
      */
    "q186_entity_resolution" -> ((s, dir) => {
      val names = docs(s, dir)
        .select(expr("substring(text, 1, 40)").as("name"), col("doc_id"))
        .groupBy(col("name")).agg(min(col("doc_id")).as("id"))
      // referenced FIVE times in the final plan (PassJoin's two legs on each
      // side + the final entity join): persist the ~1.5×distinct-prefix-row
      // frame so the docs scan + name groupBy run once per execution — and
      // fan the 1.5× mention universe out with ONE in-row explode (same
      // multiset as the old three-leg self-union, which re-ran the groupBy
      // per leg even inside a single materialization). Cleanup: session
      // owner drops persisted blocks between queries.
      val mentions = names.select(explode(
          when(col("id") % 2 === 0, array(
            struct(col("id"), col("name")),
            struct((col("id") + 1000000L).as("id"),
              expr("substring(name, 2)").as("name"))))
          .otherwise(array(
            struct(col("id"), col("name")),
            struct((col("id") + 2000000L).as("id"),
              concat(col("name"), lit("~")).as("name"))))).as("__m"))
        .select(col("__m.id").as("id"), col("__m.name").as("name"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = FuzzyJoin.editDistanceJoin(mentions, "id", "name",
        mentions, "id", "name", maxDist = 1)
        .filter(col("l_id") < col("r_id"))
      val cc = Dedup.connectedComponents(pairs, "l_id", "r_id")
        .withColumnRenamed("node", "id")
      mentions.join(cc, Seq("id"), "left")
        .select(col("id").as("mention_id"),
          least(col("id"), coalesce(col("component"), col("id")))
            .as("entity_id"))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("entity_id"))))
    }),

    /** Fellegi–Sunter probabilistic record linkage (extension; [[graft
      * .operators.FuzzyJoin.fellegiSunter]] — Fellegi & Sunter 1969):
      * q186's mention universe re-scored probabilistically. Candidate
      * pairs from cheap (first-char, length-bucket) blocking carry four
      * field-agreement booleans (4-char prefix, length, 3-char suffix,
      * exact) and a PARTIAL ground-truth label (pairs whose base-id sum
      * ≡ 0 mod 3 — the labeled review sample); m/u rates are estimated
      * from the labeled subset with add-one smoothing and every pair gets
      * the composite log₂-likelihood weight and a match/review/nonmatch
      * decision. The m/u estimate folds to ONE broadcast row; scoring is
      * a fixed-order 4-term expression per candidate pair.
      */
    "q262_fellegi_sunter" -> ((s, dir) =>
      FuzzyJoin.fellegiSunter(fsCandidatePairs(s, dir),
        Seq("f_prefix", "f_len", "f_suffix", "f_exact"),
        "is_match_label", upper = 3.0, lower = -3.0)),

    /** UNSUPERVISED Fellegi–Sunter via EM (extension; [[graft.operators
      * .FuzzyJoin.fellegiSunterEm]] — Winkler 1988): q262's candidate
      * universe with the labeled subset IGNORED — m/u and the match
      * proportion come from 5 fixed EM iterations over the ≤2⁴-row
      * agreement-pattern census, the E-step posterior quantized to integer
      * millionths so every M-step sum is exact BIGINT and the oracle
      * replays the unrolled iterations bit-comparably. Adds the posterior
      * match probability beside the composite log₂ weight;
      * FellegiSunterEmSpec pins convergence against the labeled-subset
      * estimates on this fixture.
      */
    "q265_fellegi_sunter_em" -> ((s, dir) =>
      FuzzyJoin.fellegiSunterEm(fsCandidatePairs(s, dir),
        Seq("f_prefix", "f_len", "f_suffix", "f_exact"),
        iters = 5, upper = 3.0, lower = -3.0)),

    /** Content-defined chunk dedup (extension; [[graft.operators.TextDedup
      * .cdcDupCoverage]] — the Rabin/gear boundary idea at token
      * granularity): chunk boundaries fall where a token's hash ≡ 0 mod 8,
      * so boundaries travel WITH content and an early edit reflows one
      * chunk instead of shifting every fixed window after it (the q101/q102
      * weakness under insertions; edit-localization is spec'd). Per doc:
      * how many of its variable-length chunks appear verbatim in another
      * document. One explode + one running-sum window + one census groupBy
      * — O(total tokens), nothing self-joins.
      */
    "q192_cdc_chunks" -> ((s, dir) =>
      TextDedup.cdcDupCoverage(docs(s, dir), "doc_id", "text", avgTokens = 8)
        .select(col("id").as("doc_id"), col("n_chunks"), col("n_dup_chunks"))),

    /** Soft dedup: inverse-cluster-size loss weights (extension;
      * [[graft.operators.Dedup.clusterWeights]] over q48's MinHash+LSH
      * components): a document scraped n times contributes weight 1/n each
      * instead of being dropped — over-representation is corrected, unique
      * information is kept. The weights sum to the number of DISTINCT
      * documents, which is what the training-loss normalization wants.
      */
    "q212_dedup_weights" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = TextDedup.minhashNearDupes(
        d, "doc_id", "text", n = 3, k = 16, bands = 8, minJaccard = 0.8)
      val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
        .withColumnRenamed("node", "doc_id")
      val clustered = d.join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"))
      Dedup.clusterWeights(clustered, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("weight"))
    }),

    /** Leakage-safe split assignment (extension; [[graft.operators.Curation
      * .leakageSafeSplit]] — eval contamination PREVENTED at split time,
      * the complement of q52's after-the-fact decontamination scan):
      * train/val/test hashed from the near-dup CLUSTER representative, so a
      * duplicated document can never sit in train while its twin sits in
      * test. Components bounded by the LSH edge list (q48's machinery);
      * singletons degrade to plain q45 splitAssign.
      */
    "q223_leakage_safe_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = TextDedup.minhashNearDupes(
        d, "doc_id", "text", n = 3, k = 16, bands = 8, minJaccard = 0.8)
      Curation.leakageSafeSplit(d.select(col("doc_id")), "doc_id", pairs,
        "a_id", "b_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    }),

    /** EXACT substring duplicate spans (extension;
      * [[graft.operators.TextDedup.exactSubstringSpans]] — the Lee et al.
      * 2022 ExactSubstr staple at the paper's canonical 50-token
      * threshold): every maximal duplicated region ≥ 50 tokens as a
      * (doc, span) row. Gram census + unhinted semi (AQE-sized) + per-doc
      * gaps-and-islands — never a suffix array's global sort, never
      * all-pairs; catches SHIFTED copies that q101's fixed chunking
      * misses (spec'd).
      */
    "q235_exact_substring_spans" -> ((s, dir) =>
      TextDedup.exactSubstringSpans(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
          col("span_tokens"), col("n_windows"))),

    /** Removal twin of q235 (extension; [[graft.operators.TextDedup
      * .stripDuplicateSpans]]): strip every corpus-duplicated ≥50-token
      * span from every document and re-assemble survivors in order —
      * conservative all-occurrences removal, duplicate-free by
      * construction at this granularity.
      */
    "q236_strip_dup_spans" -> ((s, dir) =>
      TextDedup.stripDuplicateSpans(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          col("removed_tokens"), col("clean_text"))),

    /** INCREMENTAL exact-substring spans (extension; [[graft.operators
      * .TextDedup.exactSubstringSpansAgainst]] — q235's against-corpus
      * sibling, q57's split convention): spans of the incoming third of
      * the corpus duplicated against the full union, computed without
      * re-processing the existing docs — the corpus contributes only its
      * gram census, the batch side is O(batch tokens). Provably equal to
      * running q235 on the union and keeping incoming ids (spec'd; the
      * oracle replays exactly that).
      */
    "q240_incremental_substring" -> ((s, dir) => {
      val d = docs(s, dir)
      TextDedup.exactSubstringSpansAgainst(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0),
        "doc_id", "text")
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
          col("span_tokens"), col("n_windows"))
    }),

    /** Persisted gram-census probe (extension; [[graft.sources.GramStore]]
      * — q240's store-served form, the AnnStore pattern for exact-substring
      * dedup): the existing corpus is fingerprinted ONCE into a TxLog
      * census table (32-hex-char gram md5s, hash-bucketed partitions,
      * minTokens frozen as table state); the incoming batch probes it by
      * gram equi-join — the corpus text never reshuffles. Bit-identical to
      * the re-fingerprinted q240 (same oracle).
      */
    "q241_gram_store_probe" -> ((s, dir) => {
      val path = fixture("gramstore", dir) { root =>
        graft.sources.GramStore.create(
          docs(s, dir).filter(col("doc_id") % 3 =!= 0), "doc_id", "text",
          root + "/census", minTokens = 50)
      } + "/census"
      graft.sources.GramStore.probeSpans(s, path,
        docs(s, dir).filter(col("doc_id") % 3 === 0), "doc_id", "text")
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
          col("span_tokens"), col("n_windows"))
    }),

    /** SQL surface for exact substring duplicate spans (extension;
      * [[graft.GraftExtensions]] `graft_dup_spans` TVF — q235's engine from
      * `spark.sql`, the spelling a dbt-style curation model would use):
      * the TVF splices [[graft.operators.TextDedup.exactSubstringSpans]]'s
      * analyzed plan; one physical plan both routes (shared oracle).
      */
    "q242_sql_dup_spans" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      docs(s, dir).createOrReplaceTempView("graft_docs_spans_tvf")
      s.sql("""SELECT id AS doc_id, span_start, span_end, span_tokens,
              |       n_windows
              |FROM graft_dup_spans('graft_docs_spans_tvf', 'doc_id',
              |                     'text', 50)""".stripMargin)
    }),

    /** SQL surface for MinHash-LSH near-dup pairs (extension;
      * [[graft.GraftExtensions]] `graft_minhash_pairs` TVF — the dbt-shaped
      * spelling of q42's engine): the TVF resolves its literal arguments at
      * analysis time and splices in [[graft.operators.TextDedup
      * .minhashNearDupes]]'s ANALYZED plan, so the SQL route and the
      * DataFrame route share one physical plan (hash-equal by
      * construction, proven by the shared oracle).
      */
    "q237_sql_minhash_pairs" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      docs(s, dir).createOrReplaceTempView("graft_docs_tvf")
      s.sql("""SELECT a_id, b_id, jaccard
              |FROM graft_minhash_pairs('graft_docs_tvf', 'doc_id', 'text',
              |                         3, 16, 8, 0.8)""".stripMargin)
    }),

    /** CCNet-style LINE-LEVEL dedup (extension; [[graft.operators.TextDedup
      * .dropDuplicatedLines]] — Wenzek et al. 2020 §4.2, the boilerplate
      * staple): the harness corpus carries no newlines, so the query first
      * RESTRUCTURES each document into lines — a per-source boilerplate
      * header line plus the text in 6-word lines (deterministically
      * replayed by the oracle) — then drops every line whose normalized
      * hash recurs ≥2 times corpus-wide. The header line (4 tokens) sits
      * far below q235's 50-token substring floor and survives q101's
      * 10-word chunking only by alignment luck — this granularity is why
      * CCNet runs line-level FIRST. Line-hash equi-joins only; the
      * duplicated-line dictionary joins back unhinted (AQE-sized).
      */
    "q247_line_dedup" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val lined = docs(s, dir).select(col("doc_id"),
        concat(
          lit("boilerplate header for "), col("source"), lit("\n"),
          array_join(
            transform(sequence(lit(0), floor((size(ws) - 1) / 6).cast("int")),
              i => concat_ws(" ", slice(ws, i * 6 + 1, lit(6)))),
            "\n")).as("text"))
      TextDedup.dropDuplicatedLines(lined, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          col("clean_text"))
    }),

    /** SQL surface for line-level dedup (extension; [[graft.GraftExtensions]]
      * `graft_drop_dup_lines` TVF — q247's engine from `spark.sql`, the
      * spelling a SQL-first curation model would use): the TVF splices
      * [[graft.operators.TextDedup.dropDuplicatedLines]]'s analyzed plan,
      * so both routes share one physical plan (shared oracle with q247,
      * route equality spec'd).
      */
    "q251_sql_line_dedup" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      val ws = split(col("text"), " ")
      docs(s, dir).select(col("doc_id"),
        concat(
          lit("boilerplate header for "), col("source"), lit("\n"),
          array_join(
            transform(sequence(lit(0), floor((size(ws) - 1) / 6).cast("int")),
              i => concat_ws(" ", slice(ws, i * 6 + 1, lit(6)))),
            "\n")).as("text"))
        .createOrReplaceTempView("graft_docs_lined_tvf")
      s.sql("""SELECT id AS doc_id, n_lines, n_kept, clean_text
              |FROM graft_drop_dup_lines('graft_docs_lined_tvf', 'doc_id',
              |                          'text', 2)""".stripMargin)
    }),

    /** INCREMENTAL line-level dedup (extension; [[graft.operators.TextDedup
      * .dropDuplicatedLinesAgainst]] — q247's against-corpus sibling,
      * q240's split convention): the incoming third of the lined corpus is
      * cleaned against the full union, with the existing corpus
      * contributing only its line-hash census. Provably equal to running
      * q247 on the union and keeping incoming ids (spec'd; the oracle
      * replays exactly that).
      */
    "q252_incremental_line_dedup" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val lined = docs(s, dir).select(col("doc_id"),
        concat(
          lit("boilerplate header for "), col("source"), lit("\n"),
          array_join(
            transform(sequence(lit(0), floor((size(ws) - 1) / 6).cast("int")),
              i => concat_ws(" ", slice(ws, i * 6 + 1, lit(6)))),
            "\n")).as("text"))
      TextDedup.dropDuplicatedLinesAgainst(
        lined.filter(col("doc_id") % 3 =!= 0),
        lined.filter(col("doc_id") % 3 === 0),
        "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          col("clean_text"))
    }),

    /** Persisted line-census probe (extension; [[graft.sources.LineStore]]
      * — q252's store-served form, the GramStore pattern at line
      * granularity): the existing corpus slice's normalized-line counts
      * are built ONCE into a TxLog census table (hash-bucketed, minCount
      * and the unit pattern frozen as table state); the incoming batch is
      * cleaned by line-hash equi-join against it — the corpus text never
      * re-explodes. Bit-identical to the re-exploded q252 (same oracle).
      */
    "q253_line_store_probe" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val lined = docs(s, dir).select(col("doc_id"),
        concat(
          lit("boilerplate header for "), col("source"), lit("\n"),
          array_join(
            transform(sequence(lit(0), floor((size(ws) - 1) / 6).cast("int")),
              i => concat_ws(" ", slice(ws, i * 6 + 1, lit(6)))),
            "\n")).as("text"))
      val path = fixture("linestore", dir) { root =>
        graft.sources.LineStore.create(
          lined.filter(col("doc_id") % 3 =!= 0), "doc_id", "text",
          root + "/census")
      } + "/census"
      graft.sources.LineStore.probeClean(s, path,
        lined.filter(col("doc_id") % 3 === 0), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          col("clean_text"))
    }),

    /** URL canonicalization + dedup (extension; [[graft.functions
      * .TextFunctions.normalizeUrl]] — RefinedWeb stage 1, Penedo et al.
      * 2023: dedupe by normalized URL BEFORE any content pass, because the
      * key is free): the fixture derives crawl-record URLs with every
      * normalization hazard — scheme/host case, default vs non-default
      * ports, duplicate and trailing path slashes, tracking parameters,
      * parameter order, fragments — and groups by the canonical form.
      * Pure string/array expressions; one hash shuffle on the normalized
      * key at any scale, exactly [[Dedup.exactDedup]]'s shape.
      */
    "q269_url_dedup" -> ((s, dir) => {
      val m3 = col("doc_id") % 3
      val m2 = col("doc_id") % 2
      val m4 = col("doc_id") % 4
      val m5 = col("doc_id") % 5
      val url = concat(
        when(m3 === 0, "HTTP").when(m3 === 1, "https").otherwise("HtTpS"),
        lit("://"),
        when(m2 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".Example.COM"),
        when(m4 === 0, when(m3 === 0, ":80").otherwise(":443"))
          .when(m4 === 1, ":8080").otherwise(""),
        when(m5 === 0, "/Docs//").otherwise("/Docs/"),
        (col("doc_id") % 40).cast("string"),
        when(m2 === 0, "/").otherwise(""),
        when(m3 === 0,
            concat(lit("?utm_source=feed&ref=r"), m5.cast("string")))
          .when(m3 === 1,
            concat(lit("?ref=r"), m5.cast("string"), lit("&utm_campaign=x")))
          .otherwise(""),
        when(m5 === 0, concat(lit("#sec"), (col("doc_id") % 7)
          .cast("string"))).otherwise(""))
      docs(s, dir).select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          TextFunctions.normalizeUrl(col("url")).as("url_norm"))
        .groupBy("url_norm")
        .agg(min(col("doc_id")).as("keeper_doc_id"),
          count(lit(1)).as("n_variants"),
          countDistinct(col("url")).as("n_distinct_raw"))
    })
  )

  // shared by q235 (DataFrame) and q242 (SQL TVF): the same gram
  // construction as the Spark side (1-based starts, md5 of the
  // space-joined 50-token slice), then gaps-and-islands in window
  // functions — one oracle text proves the two routes
  // shared by q247 (DataFrame) and q251 (SQL TVF): the same deterministic
  // line restructuring (per-source header + 6-word lines, chr(10)-joined),
  // then the CCNet line census — normalized-line md5, corpus-wide count,
  // drop lines at count >= 2, re-assemble in order
  /** q262/q265's shared candidate universe: the q186 mention fixture under
    * cheap (first-char, length-bucket) blocking, four field-agreement
    * booleans per pair, and the PARTIAL ground-truth label (pairs whose
    * base-id sum ≡ 0 mod 3) the supervised estimator consumes and the EM
    * one ignores.
    */
  private def fsCandidatePairs(s: SparkSession, dir: String): DataFrame = {
    val names = docsCapped(s, dir)
      .select(expr("substring(text, 1, 40)").as("name"), col("doc_id"))
      .groupBy(col("name")).agg(min(col("doc_id")).as("base"))
    // the 1.5× mention universe fans out with ONE in-row explode — the old
    // three-leg self-union re-ran the docs scan + name groupBy per leg
    val mentions = names.select(col("base"), explode(
        when(col("base") % 2 === 0, array(
          struct(col("base").as("id"), col("name")),
          struct((col("base") + 1000000L).as("id"),
            expr("substring(name, 2)").as("name"))))
        .otherwise(array(
          struct(col("base").as("id"), col("name")),
          struct((col("base") + 2000000L).as("id"),
            concat(col("name"), lit("~")).as("name"))))).as("__m"))
      .select(col("base"), col("__m.id").as("id"), col("__m.name").as("name"))
    // both sides of the self-join are THIS frame: persist it so the docs
    // scan + name groupBy run once per execution, not once per join leg
    // (bounded: one row per distinct 40-char prefix, ×1.5 mention fan-out).
    // Cleanup: session owner drops persisted blocks between queries.
    val blk = mentions.withColumn("__blk",
      concat(expr("substring(name, 1, 1)"), lit("|"),
        floor(length(col("name")) / 8).cast("long").cast("string")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blk.as("x").join(blk.as("y"),
        col("x.__blk") === col("y.__blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        (expr("substring(x.name, 1, 4)") ===
          expr("substring(y.name, 1, 4)")).as("f_prefix"),
        (length(col("x.name")) === length(col("y.name"))).as("f_len"),
        (expr("right(x.name, 3)") === expr("right(y.name, 3)"))
          .as("f_suffix"),
        (col("x.name") === col("y.name")).as("f_exact"),
        when((col("x.base") + col("y.base")) % 3 === 0,
          col("x.base") === col("y.base")).as("is_match_label"))
  }

  private val lineDedupSql =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
      |           FROM documents),
      |lined AS (
      |  SELECT doc_id,
      |         'boilerplate header for ' || source || chr(10) ||
      |         array_to_string(list_transform(
      |           range((len(ws) - 1) // 6 + 1),
      |           i -> array_to_string(ws[(i*6+1):(i*6+6)], ' ')), chr(10))
      |           AS text
      |  FROM w),
      |ls AS (SELECT doc_id, string_split(text, chr(10)) AS lns FROM lined),
      |lines AS (
      |  SELECT doc_id, i - 1 AS line_no, lns[i] AS line
      |  FROM ls, unnest(generate_series(1, len(lns))) AS t(i)),
      |census AS (SELECT md5(lower(trim(line))) AS h, count(*) AS cnt
      |           FROM lines WHERE trim(line) <> '' GROUP BY 1),
      |dup AS (SELECT h FROM census WHERE cnt >= 2),
      |kept AS (SELECT doc_id, line_no, line FROM lines
      |         WHERE md5(lower(trim(line))) NOT IN (SELECT h FROM dup)),
      |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
      |        FROM lines GROUP BY 1),
      |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |              string_agg(line, chr(10) ORDER BY line_no) AS clean_text
      |       FROM kept GROUP BY 1)
      |SELECT t.doc_id, t.n_lines,
      |       coalesce(ka.n_kept, 0) AS n_kept,
      |       coalesce(ka.clean_text, '') AS clean_text
      |FROM tot t LEFT JOIN ka ON ka.doc_id = t.doc_id""".stripMargin

  // the incremental line-dedup oracle replays the EQUIVALENCE contract
  // directly: the full-union line census, output restricted to incoming
  // (doc_id % 3 = 0) ids — the against-corpus path must land on exactly
  // these rows
  private val incrementalLineDedupSql =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
      |           FROM documents),
      |lined AS (
      |  SELECT doc_id,
      |         'boilerplate header for ' || source || chr(10) ||
      |         array_to_string(list_transform(
      |           range((len(ws) - 1) // 6 + 1),
      |           i -> array_to_string(ws[(i*6+1):(i*6+6)], ' ')), chr(10))
      |           AS text
      |  FROM w),
      |ls AS (SELECT doc_id, string_split(text, chr(10)) AS lns FROM lined),
      |lines AS (
      |  SELECT doc_id, i - 1 AS line_no, lns[i] AS line
      |  FROM ls, unnest(generate_series(1, len(lns))) AS t(i)),
      |census AS (SELECT md5(lower(trim(line))) AS h, count(*) AS cnt
      |           FROM lines WHERE trim(line) <> '' GROUP BY 1),
      |dup AS (SELECT h FROM census WHERE cnt >= 2),
      |inc AS (SELECT * FROM lines WHERE doc_id % 3 = 0),
      |kept AS (SELECT doc_id, line_no, line FROM inc
      |         WHERE md5(lower(trim(line))) NOT IN (SELECT h FROM dup)),
      |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
      |        FROM inc GROUP BY 1),
      |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |              string_agg(line, chr(10) ORDER BY line_no) AS clean_text
      |       FROM kept GROUP BY 1)
      |SELECT t.doc_id, t.n_lines,
      |       coalesce(ka.n_kept, 0) AS n_kept,
      |       coalesce(ka.clean_text, '') AS clean_text
      |FROM tot t LEFT JOIN ka ON ka.doc_id = t.doc_id""".stripMargin

  private val exactSubstringSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |base AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words FROM w),
      |wins AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS start,
      |         md5(array_to_string(ws[i:(i+49)], ' ')) AS h
      |  FROM base, unnest(range(1, n_words - 48)) AS t(i)
      |  WHERE n_words >= 50),
      |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
      |spans AS (
      |  SELECT doc_id, start, start + 50 AS e
      |  FROM wins WHERE h IN (SELECT h FROM dup)),
      |mk AS (
      |  SELECT doc_id, start, e,
      |         CASE WHEN coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY start
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |              < start THEN 1 ELSE 0 END AS ni
      |  FROM spans),
      |isl AS (
      |  SELECT doc_id, start, e,
      |         sum(ni) OVER (PARTITION BY doc_id ORDER BY start) AS island
      |  FROM mk)
      |SELECT doc_id, CAST(min(start) AS BIGINT) AS span_start,
      |       CAST(max(e) AS BIGINT) AS span_end,
      |       CAST(max(e) - min(start) AS BIGINT) AS span_tokens,
      |       CAST(count(*) AS BIGINT) AS n_windows
      |FROM isl GROUP BY doc_id, island""".stripMargin

  // shared by q240 (re-fingerprinted) and q241 (store-served): one
  // oracle text proves the two routes compute the same spans
  private val incrementalSubstringSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |base AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words FROM w),
        |wins AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS start,
        |         md5(array_to_string(ws[i:(i+49)], ' ')) AS h
        |  FROM base, unnest(range(1, n_words - 48)) AS t(i)
        |  WHERE n_words >= 50),
        |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |spans AS (
        |  SELECT doc_id, start, start + 50 AS e
        |  FROM wins WHERE h IN (SELECT h FROM dup) AND doc_id % 3 = 0),
        |mk AS (
        |  SELECT doc_id, start, e,
        |         CASE WHEN coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY start
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |              < start THEN 1 ELSE 0 END AS ni
        |  FROM spans),
        |isl AS (
        |  SELECT doc_id, start, e,
        |         sum(ni) OVER (PARTITION BY doc_id ORDER BY start) AS island
        |  FROM mk)
        |SELECT doc_id, CAST(min(start) AS BIGINT) AS span_start,
        |       CAST(max(e) AS BIGINT) AS span_end,
        |       CAST(max(e) - min(start) AS BIGINT) AS span_tokens,
        |       CAST(count(*) AS BIGINT) AS n_windows
        |FROM isl GROUP BY doc_id, island""".stripMargin

  // the q262/q265 candidate-universe replay: q186's mention fixture,
  // (first-char, length-bucket) blocking, four agreement booleans, the
  // partial label — ends in `pr`
  private val fsPairsCte =
    """nm0 AS (SELECT substring(text, 1, 40) AS name,
      |              min(doc_id) AS base
      |            FROM documents WHERE doc_id < 5000 GROUP BY 1),
      |mn AS (
      |  SELECT base, base AS id, name FROM nm0
      |  UNION ALL SELECT base, base + 1000000, substring(name, 2)
      |    FROM nm0 WHERE base % 2 = 0
      |  UNION ALL SELECT base, base + 2000000, name || '~'
      |    FROM nm0 WHERE base % 2 = 1),
      |bl AS (SELECT *, substring(name, 1, 1) || '|' ||
      |         CAST(length(name) // 8 AS VARCHAR) AS blk
      |       FROM mn),
      |pr AS (SELECT x.id AS a_id, y.id AS b_id,
      |         substring(x.name, 1, 4) = substring(y.name, 1, 4) AS f_prefix,
      |         length(x.name) = length(y.name) AS f_len,
      |         right(x.name, 3) = right(y.name, 3) AS f_suffix,
      |         x.name = y.name AS f_exact,
      |         CASE WHEN (x.base + y.base) % 3 = 0
      |              THEN x.base = y.base END AS lab
      |       FROM bl x JOIN bl y ON x.blk = y.blk AND x.id < y.id)"""
      .stripMargin

  private val fsEmFields = Seq("f_prefix", "f_len", "f_suffix", "f_exact")

  /** One unrolled EM iteration for the q265 replay: E-step posterior per
    * agreement pattern quantized to integer millionths (`g`), M-step
    * parameter updates as IEEE divisions of exact integer sums — the
    * engine's [[graft.operators.FuzzyJoin.fellegiSunterEm]] arithmetic
    * term for term, fixed field order.
    */
  private def fsEmIterCte(i: Int, prev: String): String = {
    val pm = fsEmFields.zipWithIndex.map { case (f, j) =>
      s"(CASE WHEN $f THEN q.m$j ELSE 1.0 - q.m$j END)" }.mkString(" * ")
    val pu = fsEmFields.zipWithIndex.map { case (f, j) =>
      s"(CASE WHEN $f THEN q.u$j ELSE 1.0 - q.u$j END)" }.mkString(" * ")
    val mu = fsEmFields.zipWithIndex.map { case (f, j) =>
      s"""    (sum(CASE WHEN $f THEN n * g ELSE 0 END) + 1000000)::DOUBLE
         |      / (sum(n * g) + 2000000)::DOUBLE AS m$j,
         |    (sum(CASE WHEN $f THEN n * (1000000 - g) ELSE 0 END) + 1000000)::DOUBLE
         |      / (sum(n * (1000000 - g)) + 2000000)::DOUBLE AS u$j"""
        .stripMargin
    }.mkString(",\n")
    s"""e$i AS (
       |  SELECT *, CAST(floor(pm / (pm + pu) * 1000000 + 0.5) AS BIGINT) AS g
       |  FROM (SELECT pat.*,
       |          q.p * $pm AS pm,
       |          (1.0 - q.p) * $pu AS pu
       |        FROM pat, $prev q)),
       |p$i AS (
       |  SELECT
       |    (sum(n * g) + 1000000)::DOUBLE
       |      / ((SELECT t FROM tot) * 1000000 + 2000000)::DOUBLE AS p,
       |$mu
       |  FROM e$i)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q192_cdc_chunks" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
        |               FROM documents),
        |t AS (SELECT doc_id, unnest(w) AS token,
        |             unnest(range(1, len(w) + 1)) AS ord
        |      FROM words),
        |b AS (SELECT doc_id, token, ord,
        |        coalesce(sum(CASE WHEN ('0x' || substr(md5(token), 1, 7))::BIGINT
        |                               % 8 = 0 THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY doc_id ORDER BY ord
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS chunk_no
        |      FROM t),
        |c AS (SELECT doc_id, chunk_no, string_agg(token, ' ' ORDER BY ord) AS chunk
        |      FROM b GROUP BY 1, 2),
        |dup AS (SELECT chunk FROM c GROUP BY chunk
        |        HAVING count(DISTINCT doc_id) >= 2)
        |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE c.chunk IN (SELECT chunk FROM dup))
        |    AS BIGINT) AS n_dup_chunks
        |FROM c GROUP BY 1""".stripMargin,

    "q186_entity_resolution" ->
      """WITH RECURSIVE
        |names AS (SELECT min(doc_id) AS id, substring(text, 1, 40) AS name
        |          FROM documents GROUP BY 2),
        |mentions AS (
        |  SELECT id, name FROM names
        |  UNION ALL
        |  SELECT id + 1000000, substring(name, 2) FROM names WHERE id % 2 = 0
        |  UNION ALL
        |  SELECT id + 2000000, name || '~' FROM names WHERE id % 2 = 1),
        |pairs AS (
        |  SELECT a.id AS l_id, b.id AS r_id
        |  FROM mentions a JOIN mentions b
        |    ON a.id < b.id AND abs(length(a.name) - length(b.name)) <= 1
        |  WHERE levenshtein(a.name, b.name) <= 1),
        |edges AS (SELECT l_id AS a, r_id AS b FROM pairs
        |          UNION ALL SELECT r_id, l_id FROM pairs),
        |reach(node, lab) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab),
        |comp AS (SELECT node, min(lab) AS m FROM reach GROUP BY node),
        |resolved AS (
        |  SELECT m.id AS mention_id,
        |         least(m.id, coalesce(c.m, m.id)) AS entity_id
        |  FROM mentions m LEFT JOIN comp c ON c.node = m.id)
        |SELECT mention_id, entity_id,
        |       count(*) OVER (PARTITION BY entity_id) AS n_members
        |FROM resolved""".stripMargin,

    // Fellegi-Sunter replay: same blocking, same four agreement fields,
    // same add-one m/u estimate from the labeled subset, weight as
    // ln-ratio sums in the FIXED field order, decisions on the rounded
    // weight. ln(x)/ln(2) mirrors the engine's log(2, x) computation.
    "q262_fellegi_sunter" ->
      s"""WITH $fsPairsCte,
        |est AS (SELECT
        |    CAST(sum(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS nmm,
        |    CAST(sum(CASE WHEN NOT lab THEN 1 ELSE 0 END) AS BIGINT) AS nuu,
        |    CAST(sum(CASE WHEN lab AND f_prefix THEN 1 ELSE 0 END) AS BIGINT) AS am0,
        |    CAST(sum(CASE WHEN NOT lab AND f_prefix THEN 1 ELSE 0 END) AS BIGINT) AS au0,
        |    CAST(sum(CASE WHEN lab AND f_len THEN 1 ELSE 0 END) AS BIGINT) AS am1,
        |    CAST(sum(CASE WHEN NOT lab AND f_len THEN 1 ELSE 0 END) AS BIGINT) AS au1,
        |    CAST(sum(CASE WHEN lab AND f_suffix THEN 1 ELSE 0 END) AS BIGINT) AS am2,
        |    CAST(sum(CASE WHEN NOT lab AND f_suffix THEN 1 ELSE 0 END) AS BIGINT) AS au2,
        |    CAST(sum(CASE WHEN lab AND f_exact THEN 1 ELSE 0 END) AS BIGINT) AS am3,
        |    CAST(sum(CASE WHEN NOT lab AND f_exact THEN 1 ELSE 0 END) AS BIGINT) AS au3
        |  FROM pr WHERE lab IS NOT NULL),
        |sc AS (SELECT pr.a_id, pr.b_id, pr.f_prefix, pr.f_len,
        |         pr.f_suffix, pr.f_exact, pr.lab,
        |         round(
        |           (CASE WHEN f_prefix
        |             THEN ln(((am0 + 1.0) / (nmm + 2)) / ((au0 + 1.0) / (nuu + 2))) / ln(2.0)
        |             ELSE ln((1.0 - (am0 + 1.0) / (nmm + 2)) / (1.0 - (au0 + 1.0) / (nuu + 2))) / ln(2.0) END)
        |         + (CASE WHEN f_len
        |             THEN ln(((am1 + 1.0) / (nmm + 2)) / ((au1 + 1.0) / (nuu + 2))) / ln(2.0)
        |             ELSE ln((1.0 - (am1 + 1.0) / (nmm + 2)) / (1.0 - (au1 + 1.0) / (nuu + 2))) / ln(2.0) END)
        |         + (CASE WHEN f_suffix
        |             THEN ln(((am2 + 1.0) / (nmm + 2)) / ((au2 + 1.0) / (nuu + 2))) / ln(2.0)
        |             ELSE ln((1.0 - (am2 + 1.0) / (nmm + 2)) / (1.0 - (au2 + 1.0) / (nuu + 2))) / ln(2.0) END)
        |         + (CASE WHEN f_exact
        |             THEN ln(((am3 + 1.0) / (nmm + 2)) / ((au3 + 1.0) / (nuu + 2))) / ln(2.0)
        |             ELSE ln((1.0 - (am3 + 1.0) / (nmm + 2)) / (1.0 - (au3 + 1.0) / (nuu + 2))) / ln(2.0) END)
        |         , 6) AS weight
        |       FROM pr, est)
        |SELECT a_id, b_id, f_prefix, f_len, f_suffix, f_exact,
        |       lab AS is_match_label, weight,
        |       CASE WHEN weight >= 3.0 THEN 'match'
        |            WHEN weight <= -3.0 THEN 'nonmatch'
        |            ELSE 'review' END AS decision
        |FROM sc""".stripMargin,

    // unsupervised Fellegi-Sunter replay: pattern census -> 5 unrolled EM
    // iterations (integer-millionth posteriors, exact BIGINT sums, IEEE
    // divisions — the engine's arithmetic term for term) -> weights and
    // posteriors under the converged parameters
    "q265_fellegi_sunter_em" -> {
      val wTerms = fsEmFields.zipWithIndex.map { case (f, j) =>
        s"""(CASE WHEN $f THEN ln(q.m$j / q.u$j) / ln(2.0)
           |             ELSE ln((1.0 - q.m$j) / (1.0 - q.u$j)) / ln(2.0) END)"""
          .stripMargin
      }.mkString("\n         + ")
      val pmFinal = fsEmFields.zipWithIndex.map { case (f, j) =>
        s"(CASE WHEN $f THEN q.m$j ELSE 1.0 - q.m$j END)" }.mkString(" * ")
      val puFinal = fsEmFields.zipWithIndex.map { case (f, j) =>
        s"(CASE WHEN $f THEN q.u$j ELSE 1.0 - q.u$j END)" }.mkString(" * ")
      s"""WITH $fsPairsCte,
        |pat AS (SELECT f_prefix, f_len, f_suffix, f_exact,
        |          CAST(count(*) AS BIGINT) AS n
        |        FROM pr GROUP BY 1, 2, 3, 4),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM pat),
        |p0 AS (SELECT 0.1::DOUBLE AS p,
        |         0.9::DOUBLE AS m0, 0.9::DOUBLE AS m1,
        |         0.9::DOUBLE AS m2, 0.9::DOUBLE AS m3,
        |         0.1::DOUBLE AS u0, 0.1::DOUBLE AS u1,
        |         0.1::DOUBLE AS u2, 0.1::DOUBLE AS u3),
        |${fsEmIterCte(1, "p0")},
        |${fsEmIterCte(2, "p1")},
        |${fsEmIterCte(3, "p2")},
        |${fsEmIterCte(4, "p3")},
        |${fsEmIterCte(5, "p4")},
        |sc AS (SELECT pr.*,
        |         q.p * $pmFinal AS pm,
        |         (1.0 - q.p) * $puFinal AS pu,
        |         round(
        |           $wTerms
        |         , 6) AS weight
        |       FROM pr, p5 q)
        |SELECT a_id, b_id, f_prefix, f_len, f_suffix, f_exact,
        |       lab AS is_match_label,
        |       round(pm / (pm + pu), 6) AS match_prob, weight,
        |       CASE WHEN weight >= 3.0 THEN 'match'
        |            WHEN weight <= -3.0 THEN 'nonmatch'
        |            ELSE 'review' END AS decision
        |FROM sc""".stripMargin
    },

    "q181_cluster_rep" ->
      s"""WITH RECURSIVE ${minhashPairsCte(k = 16, bands = 8, minJaccard = 0.8, capped = false)},
         |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(node, lab) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab),
         |comp AS (SELECT node, min(lab) AS m FROM reach GROUP BY node),
         |cl AS (SELECT d.doc_id,
         |         least(d.doc_id, coalesce(c.m, d.doc_id)) AS cluster_id,
         |         CAST(d.n_chars AS BIGINT) AS n_chars
         |       FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
         |SELECT doc_id, cluster_id, n_chars,
         |       row_number() OVER (PARTITION BY cluster_id
         |         ORDER BY n_chars DESC, doc_id) = 1 AS keep
         |FROM cl""".stripMargin,

    "q21_exact_dedup" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q22_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS n_subwords,
        |  n_chars
        |FROM documents""".stripMargin,

    "q25_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         |pairs AS (
         |  SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS common
         |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT p.a_id, p.b_id,
         |  CAST(p.common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - p.common AS DOUBLE) AS jaccard
         |FROM pairs p
         |JOIN cnt ca ON ca.doc_id = p.a_id
         |JOIN cnt cb ON cb.doc_id = p.b_id
         |WHERE CAST(p.common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - p.common AS DOUBLE) >= 0.8""".stripMargin,

    "q26_minhash_lsh" ->
      s"""WITH ${minhashPairsCte(k = 8, bands = 4, minJaccard = 0.7, capped = false)}
         |SELECT a_id, b_id, jaccard FROM pairs""".stripMargin,

    "q29_simhash" -> {
      val voteCols = (0 until 16).map(p =>
        s"CAST(sum(CASE WHEN (h >> $p) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v$p")
        .mkString(",\n        |    ".stripMargin)
      val bitSum = (0 until 16).map(p =>
        s"CASE WHEN v$p > 0 THEN CAST(${1L << p} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 7))::BIGINT AS h FROM tok),
         |votes AS (
         |  SELECT doc_id,
         |    $voteCols
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id AS id, $bitSum AS simhash
         |FROM votes""".stripMargin
    },

    "q42_dedup_corpus" ->
      s"""WITH ${minhashPairsCte(k = 16, bands = 8, minJaccard = 0.8, capped = false)},
         |dropped AS (SELECT DISTINCT b_id AS doc_id FROM pairs)
         |SELECT d.doc_id, md5(d.text) AS text_hash
         |FROM docs d
         |WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = d.doc_id)""".stripMargin,

    "q48_dedup_clusters" ->
      s"""WITH RECURSIVE ${minhashPairsCte(k = 16, bands = 8, minJaccard = 0.8, capped = false)},
         |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(node, lab) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab),
         |comp AS (SELECT node, min(lab) AS m FROM reach GROUP BY node)
         |SELECT d.doc_id,
         |  least(d.doc_id, coalesce(c.m, d.doc_id)) AS cluster_id,
         |  least(d.doc_id, coalesce(c.m, d.doc_id)) = d.doc_id AS is_canonical
         |FROM docs d LEFT JOIN comp c ON c.node = d.doc_id""".stripMargin,

    "q52_decontamination" -> {
      val g5 = "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]"
      s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |bw AS (SELECT doc_id, w[1:40] AS w FROM words WHERE doc_id % 17 = 0),
         |bsh AS (SELECT DISTINCT doc_id AS bench_id,
         |          unnest(list_transform(generate_series(1, len(w) - 4), i -> $g5)) AS s
         |        FROM bw WHERE len(w) >= 5),
         |csh AS (SELECT DISTINCT doc_id,
         |          unnest(list_transform(generate_series(1, len(w) - 4), i -> $g5)) AS s
         |        FROM words WHERE len(w) >= 5)
         |SELECT c.doc_id,
         |  count(DISTINCT c.s) AS n_shared_ngrams,
         |  count(DISTINCT b.bench_id) AS n_bench_docs
         |FROM csh c JOIN bsh b ON b.s = c.s
         |GROUP BY 1""".stripMargin
    },

    "q57_incremental_dedup" -> {
      val k = 16; val bands = 8; val r = k / bands
      val sigCols = graft.operators.TextDedup.hashParams(k).zipWithIndex.map {
        case (p, i) => s"min((${p.a} * h + ${p.b}) % ${graft.operators.TextDedup.MinhashP}) AS m$i"
      }.mkString(",\n       |    ".stripMargin)
      val bandCols = (0 until bands).map { b =>
        val ms = (b * r until (b + 1) * r).map(i => s"m$i").mkString(", ")
        s"concat_ws('_', $b, $ms) AS b$b"
      }.mkString(",\n       |         ".stripMargin)
      val candUnion = (0 until bands).map { b =>
        s"""SELECT x.doc_id AS in_id, y.doc_id AS ex_id FROM banded x
           |      JOIN banded y ON x.b$b = y.b$b
           |      WHERE x.doc_id % 3 = 0 AND y.doc_id % 3 <> 0""".stripMargin
      }.mkString("\n       |    UNION ALL\n       |    ".stripMargin)
      s"""WITH ${shinglesCteFor(capped = false)},
         |sig AS (
         |  SELECT doc_id,
         |    $sigCols
         |  FROM (SELECT doc_id, ('0x' || substr(md5(s), 1, 7))::BIGINT AS h FROM sh) hsh
         |  GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, $bandCols
         |  FROM sig),
         |cand AS (
         |  SELECT DISTINCT in_id, ex_id FROM (
         |    $candUnion)),
         |common AS (
         |  SELECT c.in_id, c.ex_id, count(*) AS common
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.in_id
         |  JOIN sh sb ON sb.doc_id = c.ex_id AND sa.s = sb.s
         |  GROUP BY 1, 2)
         |SELECT m.in_id, m.ex_id,
         |  CAST(m.common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - m.common AS DOUBLE) AS jaccard
         |FROM common m
         |JOIN cnt ca ON ca.doc_id = m.in_id
         |JOIN cnt cb ON cb.doc_id = m.ex_id
         |WHERE CAST(m.common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - m.common AS DOUBLE) >= 0.8""".stripMargin
    },

    // per-token log-probs floored to integer micro-nats then summed as
    // BIGINT: the cross-row sum is integer arithmetic, immune to FP
    // summation order; the single final division of two exact integers is
    // deterministic at the checker's 9 significant digits,

    "q66_duplicate_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |chunks AS (
        |  SELECT doc_id,
        |    md5(array_to_string(w[i * 8 + 1 : i * 8 + 16], ' ')) AS span_md5
        |  FROM toks, (SELECT unnest(range(0, 2000)) AS i)
        |  WHERE len(w) >= 16 AND i <= (len(w) - 16) // 8)
        |SELECT span_md5,
        |  CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  min(doc_id) AS first_doc
        |FROM chunks
        |GROUP BY 1
        |HAVING count(*) >= 2""".stripMargin,

    "q70_bloom_antijoin" ->
      """WITH batch AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey
        |              ELSE o_orderkey + 7777777 END AS o_orderkey,
        |         o_totalprice
        |  FROM orders)
        |SELECT b.o_orderkey, b.o_totalprice
        |FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM orders c WHERE c.o_orderkey = b.o_orderkey)""".stripMargin,

    "q93_fuzzy_join" ->
      """WITH l AS (SELECT min(doc_id) AS l_id, substring(text, 1, 40) AS l_name
        |           FROM documents GROUP BY 2),
        |r AS (SELECT l_id + 1000000 AS r_id, substring(l_name, 2) AS r_name
        |      FROM l WHERE l_id % 2 = 0)
        |SELECT l.l_id, r.r_id, CAST(levenshtein(l.l_name, r.r_name) AS BIGINT) AS dist
        |FROM l JOIN r ON abs(length(l.l_name) - length(r.r_name)) <= 1
        |WHERE levenshtein(l.l_name, r.r_name) <= 1""".stripMargin,

    "q101_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |chunks AS (
        |  SELECT doc_id, i AS chunk_idx,
        |         array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS chunk
        |  FROM w, unnest(range((len(ws) - 1) // 10 + 1)) AS t(i)),
        |h AS (SELECT doc_id, chunk_idx, chunk, md5(chunk) AS h FROM chunks),
        |dup AS (SELECT h FROM h GROUP BY h HAVING count(*) >= 2),
        |kept AS (SELECT * FROM h WHERE h NOT IN (SELECT h FROM dup)),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM h GROUP BY 1),
        |ka AS (SELECT doc_id, count(*) AS n_kept,
        |              string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
        |       FROM kept GROUP BY 1)
        |SELECT t.doc_id, t.n_chunks,
        |       coalesce(ka.n_kept, 0) AS n_kept,
        |       coalesce(ka.clean_text, '') AS clean_text
        |FROM tot t LEFT JOIN ka ON ka.doc_id = t.doc_id""".stripMargin,

    // the SAME deterministic line restructuring (header + 6-word lines,
    // chr(10)-joined), then the CCNet line census: normalized-line md5,
    // corpus-wide count, drop lines at count >= 2, re-assemble in order.
    // SHARED with q251: the TVF splices this exact operator plan, so one
    // oracle text proves the SQL and DataFrame routes.
    "q247_line_dedup" -> lineDedupSql,

    "q251_sql_line_dedup" -> lineDedupSql,

    "q252_incremental_line_dedup" -> incrementalLineDedupSql,

    // the store-served probe is the same operator with the existing side
    // persisted — one oracle text proves both routes
    "q253_line_store_probe" -> incrementalLineDedupSql,

    "q102_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |base AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words FROM w),
        |wins AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS start,
        |         md5(array_to_string(ws[i:(i+9)], ' ')) AS h
        |  FROM base, unnest(range(1, n_words - 8)) AS t(i)
        |  WHERE n_words >= 10),
        |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |spans AS (
        |  SELECT doc_id, start, start + 10 AS e
        |  FROM wins WHERE h IN (SELECT h FROM dup)),
        |cov AS (
        |  SELECT doc_id, start, e,
        |         max(e) OVER (PARTITION BY doc_id ORDER BY start
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_max
        |  FROM spans),
        |agg AS (
        |  SELECT doc_id, count(*) AS dup_windows,
        |         CAST(sum(greatest(0, e - greatest(start, coalesce(prev_max, start))))
        |              AS BIGINT) AS covered_words
        |  FROM cov GROUP BY 1)
        |SELECT b.doc_id, b.n_words,
        |       coalesce(a.dup_windows, 0) AS dup_windows,
        |       coalesce(a.covered_words, 0) AS covered_words
        |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id""".stripMargin,

    // the same gram construction as the Spark side (1-based starts,
    // md5 of the space-joined 50-token slice), then gaps-and-islands in
    // window functions — both engines replay identical interval merges.
    // SHARED with q242: the TVF splices this exact operator plan, so one
    // oracle text proves the SQL and DataFrame routes.
    "q235_exact_substring_spans" -> exactSubstringSql,

    "q242_sql_dup_spans" -> exactSubstringSql,

    // the oracle replays the EQUIVALENCE contract directly: full-union
    // grams, duplicated census, spans restricted to incoming ids — the
    // incremental path must land on exactly these rows. SHARED with q241:
    // the store-served probe is the same operator with the existing side
    // persisted, so one oracle text proves both routes.
    "q240_incremental_substring" -> incrementalSubstringSql,

    "q241_gram_store_probe" -> incrementalSubstringSql,

    

    // token-level NOT EXISTS against the (unmerged) duplicated spans —
    // identical coverage to the merged islands, and removed = n − kept
    // is computed the same way both sides
    "q236_strip_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |base AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words FROM w),
        |wins AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS start,
        |         md5(array_to_string(ws[i:(i+49)], ' ')) AS h
        |  FROM base, unnest(range(1, n_words - 48)) AS t(i)
        |  WHERE n_words >= 50),
        |dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
        |spans AS (
        |  SELECT doc_id, start, start + 50 AS e
        |  FROM wins WHERE h IN (SELECT h FROM dup)),
        |tok AS (SELECT doc_id, unnest(ws) AS tk,
        |               CAST(generate_subscripts(ws, 1) AS BIGINT) AS p
        |        FROM base),
        |clean AS (
        |  SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS clean_text,
        |         CAST(count(*) AS BIGINT) AS kept
        |  FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |                    WHERE s.doc_id = tok.doc_id
        |                      AND tok.p >= s.start AND tok.p < s.e)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, b.n_words AS n_tokens,
        |       b.n_words - coalesce(c.kept, 0) AS removed_tokens,
        |       coalesce(c.clean_text, '') AS clean_text
        |FROM base b LEFT JOIN clean c ON c.doc_id = b.doc_id""".stripMargin,

    "q237_sql_minhash_pairs" ->
      s"""WITH ${minhashPairsCte(k = 16, bands = 8, minJaccard = 0.8, capped = false)}
         |SELECT a_id, b_id, jaccard FROM pairs""".stripMargin,

    "q112_prefix_jaccard" ->
      s"""WITH ${shinglesCteFor(capped = false)},
         |pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS common
         |          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT p.a_id, p.b_id,
         |       CAST(p.common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - p.common AS DOUBLE)
         |         AS jaccard
         |FROM pairs p
         |JOIN cnt ca ON ca.doc_id = p.a_id
         |JOIN cnt cb ON cb.doc_id = p.b_id
         |WHERE p.common * 10 >= 7 * (ca.n_sh + cb.n_sh - p.common)""".stripMargin,

    "q125_sorted_neighborhood" ->
      """WITH n AS (SELECT min(doc_id) AS id, substring(text, 1, 40) AS nm
        |           FROM documents GROUP BY 2),
        |u AS (SELECT id, nm FROM n
        |      UNION ALL
        |      SELECT id + 1000000, substring(nm, 1, length(nm) - 1)
        |      FROM n WHERE id % 2 = 0),
        |r AS (SELECT id, nm, substring(nm, 1, 4) AS blk,
        |        row_number() OVER (PARTITION BY substring(nm, 1, 4)
        |                           ORDER BY nm, id) AS rn
        |      FROM u)
        |SELECT a.id AS l_id, b.id AS r_id,
        |       CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        |FROM r a JOIN r b
        |  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 5
        |WHERE levenshtein(a.nm, b.nm) <= 1""".stripMargin,

    "q126_containment_join" -> {
      val g3 = "w[i] || ' ' || w[i+1] || ' ' || w[i+2]"
      s"""WITH cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |qw AS (SELECT doc_id + 2000000 AS doc_id,
         |         string_split(substring(text, 20, 200), ' ') AS w
         |       FROM documents WHERE doc_id % 7 = 0),
         |qsh AS (SELECT DISTINCT doc_id AS q_id,
         |          unnest(list_transform(generate_series(1, len(w) - 2), i -> $g3)) AS s
         |        FROM qw WHERE len(w) >= 3),
         |qs AS (SELECT q_id, CAST(count(*) AS BIGINT) AS q_size
         |       FROM qsh GROUP BY 1),
         |csh AS (SELECT DISTINCT doc_id AS d_id,
         |          unnest(list_transform(generate_series(1, len(w) - 2), i -> $g3)) AS s
         |        FROM cw WHERE len(w) >= 3),
         |j AS (SELECT q.q_id, c.d_id, CAST(count(*) AS BIGINT) AS n_shared
         |      FROM qsh q JOIN csh c ON c.s = q.s GROUP BY 1, 2)
         |SELECT j.q_id, j.d_id, j.n_shared, qs.q_size,
         |       CAST(j.n_shared AS DOUBLE) / CAST(qs.q_size AS DOUBLE) AS containment
         |FROM j JOIN qs USING (q_id)
         |WHERE j.n_shared * 5 >= qs.q_size * 4""".stripMargin
    },

    "q131_minhash_estimate" -> {
      val k = 8; val bands = 4; val r = k / bands
      val sigCols = graft.operators.TextDedup.hashParams(k).zipWithIndex.map {
        case (p, i) =>
          s"min((${p.a} * h + ${p.b}) % ${graft.operators.TextDedup.MinhashP}) AS m$i"
      }.mkString(", ")
      val bandCols = (0 until bands).map { b =>
        val ms = (b * r until (b + 1) * r).map(i => s"m$i").mkString(", ")
        s"concat_ws('_', $b, $ms) AS b$b"
      }.mkString(", ")
      val candUnion = (0 until bands).map { b =>
        s"""SELECT x.doc_id AS a_id, y.doc_id AS b_id FROM banded x
           |      JOIN banded y ON x.b$b = y.b$b AND x.doc_id < y.doc_id""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      val agreeSum = (0 until k)
        .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH ${shinglesCteFor(capped = false)},
         |sig AS (
         |  SELECT doc_id, $sigCols
         |  FROM (SELECT doc_id, ('0x' || substr(md5(s), 1, 7))::BIGINT AS h FROM sh) hsh
         |  GROUP BY doc_id),
         |banded AS (SELECT doc_id, $bandCols FROM sig),
         |cand AS (SELECT DISTINCT a_id, b_id FROM (
         |    $candUnion)),
         |agree AS (
         |  SELECT c.a_id, c.b_id, CAST($agreeSum AS BIGINT) AS n_agree
         |  FROM cand c JOIN sig a ON a.doc_id = c.a_id
         |  JOIN sig b ON b.doc_id = c.b_id),
         |common AS (
         |  SELECT c.a_id, c.b_id, CAST(count(*) AS BIGINT) AS common
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a_id
         |  JOIN sh sb ON sb.doc_id = c.b_id AND sa.s = sb.s
         |  GROUP BY 1, 2)
         |SELECT g.a_id, g.b_id, g.n_agree,
         |       CAST(g.n_agree AS DOUBLE) / $k AS est_jaccard,
         |       COALESCE(m.common, 0) AS common,
         |       CAST(COALESCE(m.common, 0) AS DOUBLE)
         |         / CAST(ca.n_sh + cb.n_sh - COALESCE(m.common, 0) AS DOUBLE) AS jaccard
         |FROM agree g
         |LEFT JOIN common m ON m.a_id = g.a_id AND m.b_id = g.b_id
         |JOIN cnt ca ON ca.doc_id = g.a_id
         |JOIN cnt cb ON cb.doc_id = g.b_id""".stripMargin
    },

    // q48's component closure + one count per cluster; weight is the same
    // single 1.0/count division in both engines
    "q212_dedup_weights" ->
      s"""WITH RECURSIVE ${minhashPairsCte(k = 16, bands = 8, minJaccard = 0.8, capped = false)},
         |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(node, lab) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab),
         |comp AS (SELECT node, min(lab) AS m FROM reach GROUP BY node),
         |cl AS (SELECT d.doc_id,
         |         least(d.doc_id, coalesce(c.m, d.doc_id)) AS cluster_id
         |       FROM docs d LEFT JOIN comp c ON c.node = d.doc_id),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size
         |       FROM cl GROUP BY 1)
         |SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
         |       1.0 / sz.cluster_size AS weight
         |FROM cl JOIN sz USING (cluster_id)""".stripMargin,

    // q48's component closure, then q45's md5 split arithmetic keyed on the
    // cluster representative instead of the document
    "q223_leakage_safe_split" ->
      s"""WITH RECURSIVE ${minhashPairsCte(k = 16, bands = 8, minJaccard = 0.8, capped = false)},
         |edges AS (SELECT a_id AS a, b_id AS b FROM pairs
         |          UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(node, lab) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.lab),
         |comp AS (SELECT node, min(lab) AS m FROM reach GROUP BY node),
         |cl AS (SELECT d.doc_id,
         |         least(d.doc_id, coalesce(c.m, d.doc_id)) AS cluster_rep
         |       FROM docs d LEFT JOIN comp c ON c.node = d.doc_id),
         |h AS (SELECT doc_id, cluster_rep,
         |        ('0x' || substr(md5(CAST(cluster_rep AS VARCHAR)), 1, 7))::BIGINT AS hk
         |      FROM cl)
         |SELECT doc_id, cluster_rep,
         |  CASE WHEN hk < 214748364 THEN 'train'
         |       WHEN hk < 241591910 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h""".stripMargin,

    // the same fixture arithmetic, then the normalization steps replayed
    // one for one (DuckDB regexp_replace needs the explicit 'g' flag where
    // Spark replaces globally)
    "q269_url_dedup" ->
      """WITH raw AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP'
        |          WHEN doc_id % 3 = 1 THEN 'https' ELSE 'HtTpS' END)
        |    || '://'
        |    || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
        |    || '.Example.COM'
        |    || (CASE WHEN doc_id % 4 = 0 THEN
        |              (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE ':443' END)
        |             WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
        |    || (CASE WHEN doc_id % 5 = 0 THEN '/Docs//' ELSE '/Docs/' END)
        |    || CAST(doc_id % 40 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 3 = 0
        |             THEN '?utm_source=feed&ref=r' || CAST(doc_id % 5 AS VARCHAR)
        |             WHEN doc_id % 3 = 1
        |             THEN '?ref=r' || CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=x'
        |             ELSE '' END)
        |    || (CASE WHEN doc_id % 5 = 0
        |             THEN '#sec' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END)
        |      AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, url,
        |         regexp_replace(url, '#.*$', '') AS nofrag,
        |         strpos(regexp_replace(url, '#.*$', ''), '?') AS qpos
        |       FROM raw),
        |s2 AS (SELECT doc_id, url,
        |         CASE WHEN qpos > 0 THEN substring(nofrag, 1, qpos - 1)
        |              ELSE nofrag END AS head,
        |         CASE WHEN qpos > 0 THEN substring(nofrag, qpos + 1)
        |              ELSE '' END AS q
        |       FROM s1),
        |s3 AS (SELECT doc_id, url, q,
        |         lower(split_part(head, '://', 1)) AS scheme,
        |         -- after the FIRST '://' by offset (split_part field 2
        |         -- would truncate an embedded unencoded URL in the path)
        |         substring(head, length(split_part(head, '://', 1)) + 4)
        |           AS aft
        |       FROM s2),
        |s4 AS (SELECT doc_id, url, q, scheme,
        |         lower(split_part(aft, '/', 1)) AS hostport,
        |         substring(aft, length(split_part(aft, '/', 1)) + 1)
        |           AS rawpath
        |       FROM s3),
        |s5 AS (SELECT doc_id, url, q, scheme,
        |         CASE WHEN scheme = 'http'
        |                THEN regexp_replace(hostport, ':80$', '')
        |              WHEN scheme = 'https'
        |                THEN regexp_replace(hostport, ':443$', '')
        |              ELSE hostport END AS host,
        |         regexp_replace(
        |           regexp_replace(rawpath, '/{2,}', '/', 'g'),
        |           '/+$', '', 'g') AS path
        |       FROM s4),
        |s6 AS (SELECT doc_id, url, scheme, host, path,
        |         -- DuckDB's list_sort([]) is NULL where Spark's
        |         -- array_join([]) is '' — coalesce aligns the two
        |         coalesce(array_to_string(list_sort(list_filter(
        |           string_split(q, '&'),
        |           p -> p <> '' AND NOT regexp_matches(p,
        |             '^(utm_[a-z]+|fbclid|gclid)='))), '&'), '') AS params
        |       FROM s5),
        |norm AS (SELECT doc_id, url,
        |    scheme || '://' || host || path ||
        |      CASE WHEN params = '' THEN '' ELSE '?' || params END
        |      AS url_norm
        |  FROM s6)
        |SELECT url_norm, min(doc_id) AS keeper_doc_id,
        |  CAST(count(*) AS BIGINT) AS n_variants,
        |  CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw
        |FROM norm GROUP BY 1""".stripMargin
  )
}
