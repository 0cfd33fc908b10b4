package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM scoring, sliding-window chunking, and corpus top-k n-grams
  * (q58–q60) against hand-computed expectations.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("unigram selfScore: hand-computed micro-nat log-probs") {
    // corpus: "a a b" and "a c" -> counts a=3, b=1, c=1; N=5, V=3 -> N+V=8
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = LanguageModel.selfScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def lp(c: Long): Long = math.floor(math.log((c + 1.0) / 8.0) * 1e6).toLong
    // doc 1: 2*lp(a=3) + 1*lp(b=1); 3 tokens
    val d1 = 2 * lp(3) + lp(1)
    // doc 2: lp(3) + lp(1); 2 tokens
    val d2 = lp(3) + lp(1)
    assert(out(1L) == ((3L, d1, d1.toDouble / 3.0)))
    assert(out(2L) == ((2L, d2, d2.toDouble / 2.0)))
  }

  test("scoreDocs: OOV tokens get the cnt=0 smoothed probability") {
    val model = Seq(("a", 3L), ("b", 1L)).toDF("token", "cnt") // N=4, V=2
    val docs = Seq((1L, "a z")).toDF("doc_id", "text")
    val out = LanguageModel.scoreDocs(docs, model, "doc_id", "text").collect().head
    def lp(c: Long): Long = math.floor(math.log((c + 1.0) / 6.0) * 1e6).toLong
    assert(out.getAs[Long]("logprob_micro") == lp(3) + lp(0))
  }

  test("chunkDocs: starts every stride, len capped at doc end") {
    val docs = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = Curation.chunkDocs(docs, "doc_id", "text", size = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_start", "chunk_len", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 6L, 4L, "t6 t7 t8 t9"),
      (3L, 9L, 1L, "t9")))
  }

  test("chunkDocs: disjoint when stride == size; short doc -> one chunk") {
    val docs = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val out = Curation.chunkDocs(docs, "doc_id", "text", size = 2, stride = 2)
    assert(rowsOf(out, "doc_id", "chunk_start", "chunk_text") == Set(
      Seq[Any](1L, 0L, "a b"), Seq[Any](1L, 2L, "c"), Seq[Any](2L, 0L, "x")))
  }

  test("ngramTopK: counts, deterministic tie-break, rank after cut") {
    // "a b c" appears in docs 1,2; "b c d" in doc 2 only; tie between
    // "b c a"(doc3) and "c a b"(doc3) broken lexicographically
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b c d"),
      (3L, "b c a b")).toDF("doc_id", "text")
    val out = Curation.ngramTopK(docs, "text", n = 3, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("ngram"), r.getAs[Long]("cnt"), r.getAs[Long]("rank")))
    assert(out.toSeq == Seq(("a b c", 2L, 1L), ("b c a", 1L, 2L), ("b c d", 1L, 3L)))
  }

  test("ngramTopK: docs shorter than n contribute nothing") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Curation.ngramTopK(docs, "text", n = 3, k = 10).collect()
    assert(out.map(_.getAs[String]("ngram")).toSeq == Seq("a b c"))
  }

  test("sourceDrift: hand-computed micro-nat likelihood ratios") {
    // corpus: src A = "a a b", src B = "c c" → model a=2, b=1, c=2;
    // N=5, V=3; A: n_s=3, B: n_s=2
    val docs = Seq((1L, "A", "a a b"), (2L, "B", "c c")).toDF("doc_id", "source", "text")
    val out = LanguageModel.sourceDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def m(num: Double, den: Double): Long = math.floor(math.log(num / den) * 1e6).toLong
    // A: a → tf=2: 2·[m(3/6)−m(3/8)]; b → tf=1: m(2/6)−m(2/8)
    val dA = 2 * (m(3, 6) - m(3, 8)) + (m(2, 6) - m(2, 8))
    // B: c → tf=2: 2·[m(3/5)−m(3/8)]
    val dB = 2 * (m(3, 5) - m(3, 8))
    assert(out("A") == ((3L, dA, dA.toDouble / 3.0)))
    assert(out("B") == ((2L, dB, dB.toDouble / 2.0)))
    // a stratum matching the corpus distribution drifts less per token than
    // one concentrated on its own tokens: B is maximally concentrated
    assert(out("B")._3 > out("A")._3)
  }

  test("sourceDrift: a single-source corpus has the minimal self-drift") {
    // one stratum: p_s and q differ only via smoothing denominators
    // (n_s = N), so the drift contribution is exactly 0 for every token
    val docs = Seq((1L, "X", "a b a"), (2L, "X", "b c")).toDF("doc_id", "source", "text")
    val out = LanguageModel.sourceDrift(docs, "source", "text").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("drift_micro") == 0L)
  }

  test("nbTokenClassifier: class-exclusive vocabulary separates; shared tokens stay neutral") {
    // positive docs speak {aa,bb}, negative docs speak {xx,yy}; doc 9/10 are
    // unlabeled-looking mixtures dominated by one side's vocabulary
    val docs = Seq(
      (1L, 1, "aa bb aa"), (2L, 1, "bb aa bb"), (3L, 1, "aa aa"),
      (4L, 0, "xx yy xx"), (5L, 0, "yy xx yy"), (6L, 0, "xx xx"),
      (7L, 1, "aa bb zz"), (8L, 0, "xx yy zz")
    ).toDF("doc_id", "grp", "text")
    val out = LanguageModel.nbTokenClassifier(docs, "doc_id", "text", "grp = 1")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("score_micro"), r.getAs[Boolean]("predicted_pos"))).toMap
    assert(out.size == 8)
    Seq(1L, 2L, 3L).foreach(d => assert(out(d)._2, s"doc $d should classify positive: $out"))
    Seq(4L, 5L, 6L).foreach(d => assert(!out(d)._2, s"doc $d should classify negative: $out"))
    // the mixed docs land on their dominant side
    assert(out(7L)._1 > out(8L)._1)
  }

  test("bigramSelfScore: word order matters — a shuffled doc scores lower") {
    // corpus dominated by the pattern "a b"; doc 9 has the same unigram
    // multiset as the pattern docs but reversed transitions
    val docs = (1L to 8L).map(i => (i, "a b a b a b"))
      .toDF("doc_id", "text")
      .unionByName(Seq((9L, "b a b a b a")).toDF("doc_id", "text"))
    val out = LanguageModel.bigramSelfScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob_micro")).toMap
    assert(out.size == 9)
    assert(out(9L) < out(1L), s"reversed doc must score below the pattern: $out")
    // unigram scoring is blind to the same difference
    val uni = LanguageModel.selfScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("logprob_micro")).toMap
    assert(uni(9L) == uni(1L))
    // transitions count = tokens - 1
    val nb = LanguageModel.bigramSelfScore(docs, "doc_id", "text")
      .filter($"doc_id" === 1L).head().getAs[Long]("n_bigrams")
    assert(nb == 5L)
  }

  test("ccnetBuckets: reference-fluent docs land in head, alien text in tail, thirds exact") {
    // reference teaches the transition "a b"; nine corpus docs span three
    // fluency levels — reference-like, half-shuffled, fully alien vocab
    val ref = (1L to 5L).map(i => (100L + i, "a b a b a b a b"))
      .toDF("doc_id", "text")
    val corpus = (
      (1L to 3L).map(i => (i, "a b a b a b")) ++        // fluent
      (4L to 6L).map(i => (i, "b a b a b a")) ++        // reversed transitions
      (7L to 9L).map(i => (i, "zz qq zz qq zz qq"))     // unseen vocabulary
    ).toDF("doc_id", "text")
    val got = LanguageModel.ccnetBuckets(ref, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("bucket")).toMap
    assert(got.size == 9)
    (1L to 3L).foreach(i => assert(got(i) == "head", s"$i: $got"))
    (4L to 6L).foreach(i => assert(got(i) == "middle", s"$i: $got"))
    (7L to 9L).foreach(i => assert(got(i) == "tail", s"$i: $got"))
    // a doc below the transition floor drops out, everything else bucketed
    val withShort = corpus.unionByName(Seq((10L, "solo")).toDF("doc_id", "text"))
    assert(LanguageModel.ccnetBuckets(ref, withShort, "doc_id", "text")
      .count() == 9)
    // the no-global-sort scale path (approx_percentile cuts) agrees with
    // the exact nearest-rank cuts at test scale
    val approx = LanguageModel.ccnetBuckets(ref, corpus, "doc_id", "text",
      approxCuts = true)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("bucket")).toMap
    assert(approx == got, s"approx twin diverged: $approx vs $got")
  }

  test("DSIR: in-domain pool docs out-select off-domain by importance weight; deterministic; featureless kept") {
    // target speaks (alpha, beta); half the pool shares that domain, half
    // is disjoint (zz, qq) — the weight ratio separates them by ~1e8
    // micro-nats, far beyond the Gumbel noise band (~2e7)
    val domain = Seq.fill(40)("alpha beta").mkString(" ")
    val off = Seq.fill(40)("zz qq").mkString(" ")
    val target = (100L to 104L).map(i => (i, domain)).toDF("doc_id", "text")
    val pool = ((1L to 5L).map(i => (i, domain)) ++
      (11L to 15L).map(i => (i, off)) :+ ((21L, "solo"))) // featureless
      .toDF("doc_id", "text")
    val w = LanguageModel.dsirWeights(pool, target, "doc_id", "text",
      nBuckets = 256).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // in-domain llr strongly positive, off-domain strongly negative
    (1L to 5L).foreach(i => assert(w(i)._2 > 10000000L, s"doc $i: ${w(i)}"))
    (11L to 15L).foreach(i => assert(w(i)._2 < -10000000L, s"doc $i: ${w(i)}"))
    // the featureless doc is kept with weight ratio 1 (llr 0)
    assert(w(21L) == ((0L, 0L)))
    // selection: the 5 in-domain docs ARE the top 5
    val picked = LanguageModel.dsirSelect(pool, target, "doc_id", "text",
      nBuckets = 256, k = 5).collect().map(_.getLong(0)).toSet
    assert(picked == (1L to 5L).toSet)
    // zero RNG: byte-identical across runs
    val again = LanguageModel.dsirSelect(pool, target, "doc_id", "text",
      nBuckets = 256, k = 5).collect().map(_.toSeq).toSet
    val first = LanguageModel.dsirSelect(pool, target, "doc_id", "text",
      nBuckets = 256, k = 5).collect().map(_.toSeq).toSet
    assert(again == first)
  }
}
