package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dataset-curation operators: deterministic sampling, stratified sampling,
  * split assignment, PII redaction, repetition stats.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 400L)
    .map(i => (i, s"w${i % 7} w${i % 7} w${i % 3} tail$i", if (i % 4 == 0) "de" else "en"))
    .toDF("doc_id", "text", "lang")

  test("deterministicSample: stable membership, fraction approximately honored") {
    val a = Curation.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.deterministicSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b) // no RNG state: same sample on every run
    assert(a.size > 400 * 0.15 && a.size < 400 * 0.35)
    // monotone: a smaller fraction draws a SUBSET (hash thresholds nest),
    // so growing a sample never re-deals previously selected rows
    val small = Curation.deterministicSample(docs, "doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("stratifiedSample: exactly k per stratum (or the whole stratum), ranks dense") {
    val s = Curation.stratifiedSample(docs, "lang", "doc_id", 20)
    val sizes = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("de" -> 20L, "en" -> 20L))
    val ranks = s.filter(col("lang") === "de")
      .select("__rank").as[Int].collect().sorted.toSeq
    assert(ranks == (1 to 20))
    // tiny stratum: returns every row instead of failing to fill k
    val tiny = Curation.stratifiedSample(docs.limit(3), "lang", "doc_id", 20)
    assert(tiny.count() == 3)
  }

  test("splitAssign: disjoint, exhaustive, leakage-safe under corpus growth") {
    val assigned = docs.withColumn("split",
      Curation.splitAssign(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 400)
    assert(counts("train") > 250) // ~80%
    // a doc's split is a pure function of its key: growing the corpus
    // can't move existing docs between splits
    val sub = docs.filter(col("doc_id") < 100).withColumn("split",
      Curation.splitAssign(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val full = assigned.filter(col("doc_id") < 100)
    assert(rowsOf(sub, "doc_id", "split") == rowsOf(full, "doc_id", "split"))
  }

  test("redactPii: emails, phones, ids replaced; order prevents partial eats") {
    val r = Seq(
      "mail bob.smith+x@mail.example.org now",
      "call +1 (555) 010-4242 or +44 (020) 555-1234",
      "ssn 123-45-6789 ok",
      "no pii here 12345").toDF("t")
      .select(Curation.redactPii(col("t")).as("r")).as[String].collect()
    assert(r(0) == "mail <EMAIL> now")
    assert(r(1) == "call <PHONE> or <PHONE>")
    assert(r(2) == "ssn <ID> ok")
    assert(r(3) == "no pii here 12345")
  }

  test("tokenRepetitionStats: counts and shares exact on a known doc") {
    val one = Seq((1L, "x x x y z")).toDF("doc_id", "text")
    val r = Curation.tokenRepetitionStats(one, "doc_id", "text").head()
    assert(r.getAs[Long]("top_token_count") == 3L)
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Double]("top_token_share") == 0.6)
    assert(r.getAs[Double]("dup_token_fraction") == 1.0 - 3.0 / 5.0)
  }

  test("kmvDistinct: exact below k, within KMV error above k") {
    // 5 groups × 40 distinct values, k=64 > 40 → exact
    val small = (0 until 400).map(i => (i % 5, i % 200)).toDF("g", "v")
    val exactSmall = Sketches.kmvDistinct(small, Seq("g"), "v", 64)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(exactSmall.values.forall(_ == 40.0))

    // one group, 20k distinct values, k=256 → estimate within ~5 std errors
    // (se ≈ 1/√(k−2) ≈ 6.3%)
    val big = (0 until 20000).map(i => (0, i)).toDF("g", "v")
    val est = Sketches.kmvDistinct(big, Seq("g"), "v", 256).head().getDouble(1)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.31, s"estimate $est")
  }

  test("HLL: estimate within sketch error; registers merge = union sketch") {
    // one group, 10k distinct: m=64 → se ≈ 1.04/√64 = 13%; allow ~4σ
    val big = (0 until 10000).map(i => (0, i)).toDF("g", "v")
    val est = Sketches.hllEstimates(
      Sketches.hllRegisters(big, Seq("g"), "v"), Seq("g"))
      .head().getAs[Double]("hll_est")
    assert(math.abs(est - 10000.0) / 10000.0 < 0.52, s"estimate $est")
    // mergeability: max-merge of two halves' registers ≡ whole-corpus sketch
    val a = big.filter($"v" % 2 === 0); val b = big.filter($"v" % 2 =!= 0)
    val merged = Sketches.hllRegisters(a, Seq("g"), "v")
      .unionByName(Sketches.hllRegisters(b, Seq("g"), "v"))
      .groupBy("g", "reg").agg(max("max_rho").as("max_rho"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    val whole = Sketches.hllRegisters(big, Seq("g"), "v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(merged == whole)
    // duplicates never move the sketch: registers are max of per-value ranks
    val dup = Sketches.hllRegisters(big.unionAll(big), Seq("g"), "v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(dup == whole)
  }

  test("HLL overlap: union/intersection estimates track the true overlap") {
    // A = [0,8000), B = [4000,12000): |A|=|B|=8000, |A∪B|=12000, |A∩B|=4000
    val df = ((0 until 8000).map(i => ("A", i)) ++
      (4000 until 12000).map(i => ("B", i))).toDF("g", "v")
    val r = Sketches.hllOverlap(Sketches.hllRegisters(df, Seq("g"), "v"), "g")
      .head()
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    val (union, inter) = (r.getAs[Double]("est_union"), r.getAs[Double]("est_inter"))
    // m=64 → se ≈ 13% per sketch; inclusion–exclusion compounds — allow wide
    assert(math.abs(union - 12000.0) / 12000.0 < 0.5, s"union $union")
    assert(inter > 0 && math.abs(inter - 4000.0) / 4000.0 < 1.5, s"inter $inter")
  }

  test("pageRank: path-graph symmetry, mass conservation, hub dominance") {
    import graft.operators.PageRank
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d") // path 1—2—3
    val pr = PageRank.pageRank(edges, "s", "d", rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr(1L) - pr(3L)) < 1e-12, "symmetric ends must tie")
    assert(pr(2L) > pr(1L), "the center dominates")
    // undirected connected graph: total mass stays ≈ 1 under power iteration
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, pr.toString)
  }

  test("bpeTrain: frequency-ranked merges; greedy LEFT-first fold; dry corpus stops early") {
    import graft.operators.Curation
    // "aaa": after merging (a,a) the greedy fold gives [aa, a] — left-first
    val m = Curation.bpeTrain(Seq("aaa aaa").toDF("text"), "text",
        rounds = 2, topWords = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == ((1, "a", "a", 4L)))
    assert(m(1) == ((2, "aa", "a", 2L)), "left-first: [aa,a], never [a,aa]")
    // a corpus that runs out of pairs stops short of `rounds`
    val m2 = Curation.bpeTrain(Seq("aa ab aa b").toDF("text"), "text",
        rounds = 3, topWords = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m2.toSeq == Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
  }

  test("islands: consecutive runs split on gaps, per partition") {
    import graft.operators.WindowFeatures
    val df = Seq(
      (1L, 3L), (1L, 4L), (1L, 5L), (1L, 9L), (1L, 10L), (1L, 4L), // dup day
      (2L, 7L)
    ).toDF("u", "day")
    val out = WindowFeatures.islands(df, Seq("u"), "day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 3L, 5L, 3L), (1L, 9L, 10L, 2L), (2L, 7L, 7L, 1L)))
  }

  test("bpeTokenCount splits numbers and punctuation off words") {
    import graft.functions.TextFunctions
    val r = Seq("Call me at 5pm, ok?").toDF("t")
      .select(TextFunctions.bpeTokenCount(col("t"))).head().getLong(0)
    // "Call"," me"," at"," 5","pm",","," ok","?" → 8
    assert(r == 8L)
  }

  test("duplicateSpans: finds aligned shared spans, ignores unique text") {
    // 20-token shared prefix between docs 1 and 2 (aligned at offset 0);
    // doc 3 is disjoint; doc 4 too short to chunk
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " u1 u2 u3 u4"),
      (2L, shared + " v1 v2 v3 v4"),
      (3L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val out = Curation.duplicateSpans(docs, "doc_id", "text", k = 16, stride = 8)
      .collect()
    // offsets 0 (s1..s16) of docs 1/2 share a fingerprint; offset 8 windows
    // (s9..s16 + unique tail) differ — exactly one duplicated span
    assert(out.length == 1, out.mkString(","))
    assert(out.head.getAs[Long]("n_occurrences") == 2L)
    assert(out.head.getAs[Long]("n_docs") == 2L)
    assert(out.head.getAs[Long]("first_doc") == 1L)
  }

  test("duplicateSpans: within-document repetition counts occurrences, not docs") {
    val span = (1 to 16).map(i => s"r$i").mkString(" ")
    // same 16-token span at aligned offsets 0 and 16 of ONE document
    val docs = Seq((7L, span + " " + span)).toDF("doc_id", "text")
    val out = Curation.duplicateSpans(docs, "doc_id", "text", k = 16, stride = 16)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_occurrences") == 2L)
    assert(out.head.getAs[Long]("n_docs") == 1L)
  }

  test("temperatureRebalance: kept size tracks the geometric mean, membership nests") {
    // strata 3600/900/400/100 docs: α=0.5 keep-rates √(100/cnt) →
    // expected kept ≈ √(100·cnt) = 600/300/200/100
    val rows = (0 until 5000).map { i =>
      val s = if (i < 3600) "a" else if (i < 4500) "b" else if (i < 4900) "c" else "d"
      (i.toLong, s)
    }
    val df = rows.toDF("doc_id", "stratum")
    val kept = Curation.temperatureRebalance(df, "stratum", "doc_id")
    val sizes = kept.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(sizes("d") == 100L, s"smallest stratum must survive whole: $sizes")
    // hash-uniform draw: each stratum within ±25% of its geometric-mean target
    Seq("a" -> 600.0, "b" -> 300.0, "c" -> 200.0).foreach { case (s, want) =>
      assert(math.abs(sizes(s) - want) / want < 0.25, s"$s: ${sizes(s)} vs $want")
    }
    // flattening, not equalizing: order preserved but range compressed
    assert(sizes("a") > sizes("b") && sizes("b") > sizes("c") && sizes("c") > sizes("d"))
    // deterministic: re-running draws the identical row set
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      Curation.temperatureRebalance(df, "stratum", "doc_id")
        .select("doc_id").as[Long].collect().toSet)
  }

  test("curationFunnel: first failing stage wins; census conserves the corpus") {
    val docs = Seq(
      (1L, "tiny"),                                       // fails length (< 3 tokens)
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 2
      (4L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    def census(minQ: Double): Map[String, Long] =
      Curation.curationFunnel(docs, "doc_id", "text", minTokens = 3, minQuality = minQ)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // quality gate disabled: 1 length-dropped, 1 duplicate, 2 kept
    val c = census(minQ = 0.0)
    assert(c == Map("1_length" -> 1L, "3_duplicate" -> 1L, "4_kept" -> 2L), c)
    // impossible quality bar: everything past the length gate dies there —
    // first-failing-stage semantics (the dup never reaches the dedup stage)
    val c2 = census(minQ = 2.0)
    assert(c2 == Map("1_length" -> 1L, "2_quality" -> 3L), c2)
    // census always conserves the corpus
    assert(c.values.sum == 4L && c2.values.sum == 4L)
  }

  test("countMin: never underestimates, stays depth×width rows, merges additively") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val terms = docs.select(explode(split(col("text"), " ")).as("term"))
    val (d, w) = (4, 8) // vocab is 31 words — 8 cells force collisions
    val cells = Sketches.countMinCells(terms, col("term"), d, w).cache()
    assert(cells.count() <= d.toLong * w) // fixed-size however large the stream
    // the defining guarantee: est ≥ exact for EVERY key, no exceptions
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
    val est = Sketches.countMinEstimates(cells, exact, "term", d, w)
    assert(est.filter(col("cms_est") < col("n_exact")).count() == 0)
    // and it genuinely sketches: some collision overestimates at this width
    assert(est.filter(col("cms_est") > col("n_exact")).count() > 0)
    // mergeability: cells(half1) + cells(half2) == cells(all), cell by cell
    val h1 = Sketches.countMinCells(
      docs.filter(col("doc_id") % 2 === 0)
        .select(explode(split(col("text"), " ")).as("term")), col("term"), d, w)
    val h2 = Sketches.countMinCells(
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(explode(split(col("text"), " ")).as("term")), col("term"), d, w)
    val merged = h1.unionByName(h2).groupBy("row", "cell")
      .agg(sum(col("cnt")).as("cnt"))
    assert(merged.join(cells, Seq("row", "cell"), "full")
      .filter(merged("cnt") =!= cells("cnt")
        || merged("cnt").isNull || cells("cnt").isNull).count() == 0)
    cells.unpersist()
  }

  test("tokenizer roundtrip: decode(encode(x)) = x with OOV replaced by <unk>") {
    val docs = Seq((1L, "aa bb aa cc"), (2L, "bb rare aa"), (3L, "aa"))
      .toDF("doc_id", "text")
    val v = Curation.buildVocab(docs, "text", minCount = 2L) // 'rare','cc' OOV
    val decoded = Curation.decodeDocs(
        Curation.encodeDocs(docs, "doc_id", "text", v),
        "doc_id", "token_ids", v)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decoded == Map(
      1L -> "aa bb aa <unk>", 2L -> "bb <unk> aa", 3L -> "aa"))
  }

  test("out-of-fold target encoding: no self-leakage, exact means, stable folds") {
    val df = (1L to 200L).map(k => (k, s"c${k % 3}", (k % 7 < 3)))
      .toDF("k", "cat", "y")
    val enc = Curation.targetEncodeOof(df, "k", "cat",
      when(col("y"), 1L).otherwise(0L), nFolds = 4)
      .select(col("k"), col("cat"), col("fold"), col("y"), col("oof_enc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))
    assert(enc.length == 200)
    // hand-replay: per (cat, fold) and per cat totals over the SAME rows
    val rows = enc.map { case (k, c, f, y, _) => (k, c, f, if (y) 1L else 0L) }
    val byFold = rows.groupBy(r => (r._2, r._3))
      .map { case (cf, rs) => cf -> (rs.map(_._4).sum, rs.size.toLong) }
    val byCat = rows.groupBy(_._2)
      .map { case (c, rs) => c -> (rs.map(_._4).sum, rs.size.toLong) }
    enc.foreach { case (_, c, f, _, e) =>
      val (fs, fc) = byFold((c, f)); val (ts, tc) = byCat(c)
      assert(math.abs(e - (ts - fs).toDouble / (tc - fc).toDouble) < 1e-12)
    }
    // a row's own label must NOT move its own encoding: flip one row's y and
    // every encoding in a DIFFERENT fold of that cat shifts, its own doesn't
    val flipped = df.withColumn("y", when(col("k") === 1L, !col("y")).otherwise(col("y")))
    val enc2 = Curation.targetEncodeOof(flipped, "k", "cat",
      when(col("y"), 1L).otherwise(0L), nFolds = 4)
      .select(col("k"), col("fold"), col("oof_enc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val base = enc.map { case (k, _, f, _, e) => k -> (f, e) }.toMap
    val (f1, e1) = base(1L)
    assert(enc2(1L)._2 == e1, "row 1's own encoding moved with its own label")
    val catOf1 = "c1"
    enc.filter { case (_, c, f, _, _) => c == catOf1 && f != f1 }.take(5)
      .foreach { case (k, _, _, _, e) => assert(enc2(k)._2 != e) }
    // folds are the deterministic hash — rerun gives identical assignment
    assert(enc2.view.mapValues(_._1).toMap ==
      base.view.mapValues(_._1).toMap)
  }

  test("k-anonymity: report lists exactly the under-k classes; suppression spares the rest") {
    val df = (Seq.fill(5)(("US", "A")) ++ Seq.fill(2)(("US", "B")) ++
      Seq.fill(3)(("DE", "A")) ++ Seq(("DE", "B")))
      .zipWithIndex.map { case ((n, s), i) => (i.toLong, n, s) }
      .toDF("id", "nation", "segment")
    val report = Curation.kAnonymityReport(df, Seq("nation", "segment"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(report == Map(("US", "B") -> 2L, ("DE", "B") -> 1L))
    val anon = Curation.kAnonymize(df, Seq("nation", "segment"), k = 3)
      .select("id", "nation", "segment")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(anon.size == 11)
    assert(anon.values.count(_ == ("*", "*")) == 3) // the 2 US/B + 1 DE/B rows
    assert(anon(0L) == ("US", "A")) // k-anonymous class untouched
  }

  test("k-anonymity: NULL quasi-identifiers form classes and get suppressed too") {
    // 2 rows with (NULL, "A") and 1 with (NULL, NULL): both under k=3 and
    // both must be suppressed — a plain-equality join would let them escape
    val df = (Seq.fill(4)((Some("US"), Some("A"))) ++
      Seq.fill(2)((None, Some("A"))) ++ Seq((None, None)))
      .zipWithIndex.map { case ((n, s), i) => (i.toLong, n.orNull, s.orNull) }
      .toDF("id", "nation", "segment")
    val report = Curation.kAnonymityReport(df, Seq("nation", "segment"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(report == Map((null, "A") -> 2L, (null, null) -> 1L))
    val anon = Curation.kAnonymize(df, Seq("nation", "segment"), k = 3)
      .select("id", "nation", "segment")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(anon.size == 7)
    // enforcement matches the report: every NULL-quasi row suppressed
    assert((4L to 6L).forall(anon(_) == ("*", "*")))
    assert((0L to 3L).forall(anon(_) == ("US", "A")))
  }

  test("targetEncodeOof: NULL targets leave the denominator; fractional targets exact") {
    // cat "a": fold assignment is hash-driven; rows with NULL target must
    // count in NEITHER numerator nor denominator of anyone's encoding
    val df = (1L to 100L).map { k =>
      val t: java.lang.Double = if (k % 5 == 0) null else (k % 4) * 0.25
      (k, "a", t)
    }.toDF("k", "cat", "t")
    val enc = Curation.targetEncodeOof(df, "k", "cat", col("t"), nFolds = 4)
      .select(col("k"), col("fold"), col("t"), col("oof_enc"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3)))
    val byFold = enc.groupBy(_._2).map { case (f, rs) =>
      val labeled = rs.flatMap(r => r._3)
      f -> (labeled.sum, labeled.size.toLong)
    }
    val (ts, tc) = (byFold.values.map(_._1).sum, byFold.values.map(_._2).sum)
    enc.foreach { case (_, f, _, e) =>
      val (fs, fc) = byFold(f)
      assert(math.abs(e - (ts - fs) / (tc - fc).toDouble) < 1e-9)
    }
  }

  test("quantileNormalize: per-stratum percent ranks, scale-free, threshold calibrated") {
    // two strata on wildly different score scales — the calibration target
    val df = ((0L until 100L).map(i => (i, "web", (i * 7 % 100).toDouble)) ++
      (100L until 140L).map(i => (i, "books", 1e6 + (i * 13 % 40).toDouble)))
      .toDF("doc_id", "stratum", "score")
    val q = Curation.quantileNormalize(df, "stratum", col("score"), "doc_id")
    val rows = q.select("doc_id", "stratum", "qscore")
      .as[(Long, String, Double)].collect()
    // percent_rank spans [0, 1] within every stratum regardless of scale
    Seq("web", "books").foreach { st =>
      val vs = rows.filter(_._2 == st).map(_._3)
      assert(math.abs(vs.min) < 1e-12 && math.abs(vs.max - 1.0) < 1e-12)
    }
    // one global threshold keeps the same FRACTION of each stratum
    val kept = rows.filter(_._3 >= 0.5)
    assert(kept.count(_._2 == "web") == 50)
    assert(kept.count(_._2 == "books") == 20)
    // rank normalization is invariant under any monotone score transform
    val qLog = Curation.quantileNormalize(
      df.withColumn("score", log1p(col("score"))), "stratum", col("score"), "doc_id")
    assertSameRows(q.drop("score"), qLog.drop("score"))
  }

  test("clusterWeights: inverse-cluster-size weights sum to the distinct-doc count") {
    // clusters of size 1, 2 and 5
    val df = Seq((0L, 100L), (1L, 101L), (2L, 101L),
      (3L, 102L), (4L, 102L), (5L, 102L), (6L, 102L), (7L, 102L))
      .toDF("doc_id", "cluster_id")
    val w = Dedup.clusterWeights(df, "cluster_id")
      .select("doc_id", "cluster_size", "weight")
      .as[(Long, Long, Double)].collect()
    assert(w.length == 8) // every row kept — soft dedup drops nothing
    assert(w.find(_._1 == 0L).get._2 == 1L && w.find(_._1 == 3L).get._2 == 5L)
    w.foreach { case (_, n, wt) => assert(wt == 1.0 / n) }
    // Σ weights = number of distinct documents (3 clusters)
    assert(math.abs(w.map(_._3).sum - 3.0) < 1e-12)
  }

  test("bpeEncode ≡ driver-side greedy left-first merge fold") {
    val corpus = Seq((1L, "low lower lowest low"), (2L, "newer new low"),
      (3L, "wider low lower")).toDF("doc_id", "text")
    val merges = Curation.bpeTrain(corpus, "text", rounds = 3, topWords = 100)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length == 3)
    def refEncode(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString)) { case (seq, (a, b)) =>
        seq.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b)
            acc.init :+ (a + b)
          else acc :+ x
        }
      }.toSeq
    val got = Curation.bpeEncode(corpus, "doc_id", "text", merges)
      .select("doc_id", "word_pos", "tok_pos", "token")
      .as[(Long, Int, Int, String)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, ts) => k -> ts.sortBy(_._3).map(_._4).toSeq }
    corpus.as[(Long, String)].collect().foreach { case (id, text) =>
      text.split(" ").zipWithIndex.filter(_._1.nonEmpty).foreach {
        case (w, i) =>
          assert(got((id, i + 1)) == refEncode(w),
            s"doc $id word '$w': ${got((id, i + 1))} vs ${refEncode(w)}")
      }
    }
    // merged symbols actually appear: at least one emitted token is multi-char
    assert(got.values.flatten.exists(_.length > 1))
  }

  test("negativeSample: positives excluded, k per query, bucket-bounded, rerun-stable") {
    val corpus = (0L until 400L).toDF("doc")
    val queries = Seq(1L, 2L, 3L).toDF("q")
    // every doc ≡ q (mod 7) is a known positive of q
    val positives = Seq(1L, 2L, 3L).toDF("q")
      .crossJoin(corpus).filter(col("doc") % 7 === col("q") % 7)
      .select(col("q"), col("doc"))
    val neg = Curation.negativeSample(corpus, "doc", queries, "q",
      positives, nBuckets = 16, nProbes = 4, k = 10)
    val rows = neg.select("q", "doc", "rank").as[(Long, Long, Int)].collect()
    // no positive (and never the query itself) is ever sampled
    rows.foreach { case (q, d, _) =>
      assert(d % 7 != q % 7 && d != q, s"positive/self sampled: ($q, $d)")
    }
    // exactly k per query (the probed 1/4 of a 400-doc corpus has plenty)
    assert(rows.groupBy(_._1).forall(_._2.length == 10))
    // every sampled doc sits in one of the query's probed buckets
    val byQ = neg.select(col("q"), col("doc"),
      (Curation.hash28(col("doc")) % 16).as("db"))
      .as[(Long, Long, Long)].collect()
    byQ.groupBy(_._1).foreach { case (q, rs) =>
      val pb = spark.range(1).select((1 to 4).map(j =>
        (Curation.hash28(lit(s"$q:$j")) % 16).as(s"b$j")): _*)
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toSet
      rs.foreach { case (_, d, db) =>
        assert(pb.contains(db), s"doc $d of q $q from unprobed bucket $db")
      }
    }
    // deterministic: a second run returns the identical set
    val again = Curation.negativeSample(corpus.repartition(7), "doc",
      queries, "q", positives, 16, 4, 10)
      .select("q", "doc", "rank").as[(Long, Long, Int)].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("leakageSafeSplit: near-dup pairs never straddle splits; singletons = plain splitAssign") {
    val df = (0L until 300L).toDF("id")
    // chains 0-1-2, 10-11, 20-21-22-23 — plus 290+ singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("a", "b")
    val out = Curation.leakageSafeSplit(df, "id", pairs, "a", "b",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "cluster_rep", "split")
      .as[(Long, Long, String)].collect()
    val split = out.map(r => r._1 -> r._3).toMap
    val rep = out.map(r => r._1 -> r._2).toMap
    // every component member shares the representative's split
    Seq(Seq(0L, 1L, 2L), Seq(10L, 11L), Seq(20L, 21L, 22L, 23L)).foreach {
      comp =>
        assert(comp.map(split).distinct.size == 1, s"component $comp straddles")
        assert(comp.map(rep).distinct == Seq(comp.min))
    }
    // a singleton's assignment is exactly splitAssign on its own id
    val plain = df.filter(col("id") >= 100)
      .select(col("id"), Curation.splitAssign(col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
      .as[(Long, String)].collect().toMap
    plain.foreach { case (id, s) => assert(split(id) == s) }
    // the corpus is conserved
    assert(out.length == 300)
  }

  test("lDiversify: a large-but-homogeneous class is suppressed (homogeneity attack)") {
    // class A: 10 members, ONE sensitive value — k-anonymous at k=10, yet
    // l-diverse fails; class B: 4 members, 3 sensitive values — passes l=3
    val df = ((1L to 10L).map(i => (i, "A", "zip1", 50L)) ++
      Seq((11L, "B", "zip2", 10L), (12L, "B", "zip2", 20L),
        (13L, "B", "zip2", 30L), (14L, "B", "zip2", 30L)))
      .toDF("id", "grp", "zip", "salary")
    val report = Curation.lDiversityReport(df, Seq("grp", "zip"),
      col("salary"), l = 3).collect()
    assert(report.length == 1 && report(0).getString(0) == "A")
    assert(report(0).getLong(2) == 10L && report(0).getLong(3) == 1L)
    val out = Curation.lDiversify(df, Seq("grp", "zip"), col("salary"), l = 3)
      .select("id", "grp", "zip").as[(Long, String, String)].collect()
    out.foreach { case (id, g, z) =>
      if (id <= 10L) assert(g == "*" && z == "*", s"row $id not suppressed")
      else assert(g == "B" && z == "zip2", s"row $id wrongly suppressed")
    }
    // k-anonymity at k=5 would have PASSED class A — the attack l fixes
    assert(Curation.kAnonymityReport(df, Seq("grp", "zip"), 5)
      .filter(col("grp") === "A").count() == 0)
  }

  test("gopherQualityReport: each rule fires on its own violation, keep is the conjunction") {
    def words(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    val good = "the quick brown fox jumps over many lazy dogs and " +
      words("word", 15) // 25 words, stopwords {the, and}, mean len 3..10
    val docs = Seq(
      (1L, good),
      (2L, "the and tiny doc"), // 4 words -> r_word_count
      (3L, "the and " + words("a", 23)), // mean len < 3 -> r_word_len
      (4L, "the and " + words("word#", 10) + " " + words("fine", 13)), // symbols
      (5L, "the and " + words("12345", 23)), // alpha frac 2/25 -> r_alpha
      (6L, words("word", 25))) // no stopwords -> r_stopwords
      .toDF("doc_id", "text")
    val got = Curation.gopherQualityReport(docs, "doc_id", "text",
      minWords = 20L).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"))
    def failsOnly(id: Long, rule: String): Unit = {
      val r = got(id)
      assert(!r.getAs[Boolean](rule), s"doc $id should fail $rule")
      assert(!r.getAs[Boolean]("keep"))
      Seq("r_word_count", "r_word_len", "r_symbol", "r_alpha",
        "r_stopwords").filterNot(_ == rule).foreach { other =>
        assert(r.getAs[Boolean](other), s"doc $id should pass $other: $r")
      }
    }
    failsOnly(2L, "r_word_count")
    failsOnly(3L, "r_word_len")
    failsOnly(4L, "r_symbol")
    failsOnly(5L, "r_alpha")
    failsOnly(6L, "r_stopwords")
  }

  test("gopher line rules: bullet, ellipsis and duplicate-line each fires on its own violation") {
    def words(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    def doc(lines: String*) = lines.mkString("\n")
    // 5 lines, every document passes the 5 doc rules (>=20 words, stopwords
    // the/and present, clean symbols); only the named line rule differs
    val plain = words("word", 5)
    val good = doc("the and fox runs far", plain, plain + " extra",
      words("more", 5), words("other", 5))
    val bullets = doc("- the and fox runs far", "- " + plain,
      "- " + plain + " extra", "- " + words("more", 5),
      "- " + words("other", 5)) // 5/5 bullet starts > 90%
    val ellipses = doc("the and fox runs far", plain + " ...",
      plain + " more ...", words("wide", 5), words("other", 5)) // 2/5 > 30%
    val dups = doc("the and fox runs far", plain, plain,
      words("more", 5), words("more", 5).toUpperCase) // 2/5 dup > 30%
    val got = Curation.gopherQualityReport(
      Seq((1L, good), (2L, bullets), (3L, ellipses), (4L, dups))
        .toDF("doc_id", "text"),
      "doc_id", "text", minWords = 20L, lineRules = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"), got(1L).toString)
    def failsOnlyLine(id: Long, rule: String): Unit = {
      val r = got(id)
      assert(!r.getAs[Boolean](rule), s"doc $id should fail $rule: $r")
      assert(!r.getAs[Boolean]("keep"))
      Seq("r_word_count", "r_word_len", "r_symbol", "r_alpha", "r_stopwords",
        "r_bullet_lines", "r_ellipsis_lines", "r_dup_lines")
        .filterNot(_ == rule).foreach { other =>
          assert(r.getAs[Boolean](other), s"doc $id should pass $other: $r")
        }
    }
    failsOnlyLine(2L, "r_bullet_lines")
    failsOnlyLine(3L, "r_ellipsis_lines")
    failsOnlyLine(4L, "r_dup_lines")
    // dup-line normalization is lower+trim: the upper-cased twin counted
    assert(got(4L).getAs[Double]("dup_line_frac") == 0.4, got(4L).toString)
  }

  test("gopherQualityReport: stopwords count case-insensitively and through edge punctuation") {
    def words(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    // 'The' capitalized and 'and,' with a trailing comma must BOTH count —
    // real prose capitalizes sentence starts and punctuates (r9 advisory)
    val prose = "The dog ran far, and, then it sat. " + words("word", 18)
    val got = Curation.gopherQualityReport(
      Seq((1L, prose)).toDF("doc_id", "text"), "doc_id", "text",
      minWords = 20L).head()
    assert(got.getAs[Long]("n_stopwords") >= 2L, got.toString)
    assert(got.getAs[Boolean]("r_stopwords"), got.toString)
  }

  test("leakageSafeSplit: string ids fail loudly instead of degrading to a leaky split") {
    // components run on LONG nodes: a string id would cast to NULL edges,
    // match nothing, and SILENTLY fall back to plain splitAssign — the one
    // failure mode this operator exists to prevent
    val df = Seq("a", "b", "c").toDF("id")
    val pairs = Seq(("a", "b")).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Curation.leakageSafeSplit(df, "id", pairs, "x", "y",
        Seq("train" -> 0.9, "test" -> 0.1))
    }
    assert(e.getMessage.contains("integral ids"))
  }

  test("uniMaxAllocation: water-filling caps the tail, splits the leftover equally") {
    // A:10, B:10, C:100 docs; cap 2 epochs; budget 60
    // caps (20, 20, 200): A and B cap at 20 each, C takes the equal-share
    // leftover 20 → 0.2 epochs
    val df = (Seq.fill(10)("A") ++ Seq.fill(10)("B") ++ Seq.fill(100)("C"))
      .toDF("lang")
    val rows = Curation.uniMaxAllocation(df, "lang", budget = 60L,
        epochCap = 2.0)
      .orderBy("lang").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(3),
      r.getBoolean(5))).toSeq ==
      Seq(("A", 20.0, true), ("B", 20.0, true), ("C", 20.0, false)))
    assert(rows(2).getDouble(4) == 0.2) // C epochs
    assert(rows.map(_.getDouble(3)).sum == 60.0)
  }

  test("uniMaxAllocation: surplus budget caps everyone; scarce budget caps no one") {
    val df = (Seq.fill(3)("a") ++ Seq.fill(7)("b")).toDF("g")
    val surplus = Curation.uniMaxAllocation(df, "g", budget = 1000L,
      epochCap = 1.5).orderBy("g").collect()
    assert(surplus.forall(_.getBoolean(5)))
    assert(surplus.map(_.getDouble(3)).toSeq == Seq(4.5, 10.5))
    assert(surplus.forall(_.getDouble(4) == 1.5))
    // budget 4 below every cap·share crossing: equal shares, nobody capped
    val scarce = Curation.uniMaxAllocation(df, "g", budget = 4L,
      epochCap = 1.5).orderBy("g").collect()
    assert(scarce.forall(!_.getBoolean(5)))
    assert(scarce.map(_.getDouble(3)).toSeq == Seq(2.0, 2.0))
  }

  test("vocabularyCoverage: hand count-of-counts; chao1 NULL without doubletons") {
    // "a a b c": N=4, V=3, hapax {b,c}=2, doubletons {a}=1 →
    // p_unseen = 0.5, chao1 = 3 + 2²/(2·1) = 5
    val df = Seq(("s1", "a a b c"), ("s2", "a a a b")).toDF("src", "text")
    val rows = Curation.vocabularyCoverage(df, "src", "text")
      .orderBy("src").collect()
    val s1 = rows(0)
    assert(s1.getLong(1) == 4L && s1.getLong(2) == 3L &&
      s1.getLong(3) == 2L && s1.getLong(4) == 1L)
    assert(s1.getDouble(5) == 0.5 && s1.getDouble(6) == 5.0)
    // "a a a b": no doubletons → the classic Chao1 is undefined → NULL
    assert(rows(1).isNullAt(6) && rows(1).getDouble(5) == 0.25)
  }

  test("blocklistFilter: case-insensitive hits, distinct entries, integer keep threshold") {
    val df = Seq(
      (1L, "The the DATA x y z u v w p q r s t a1 b1 c1 d1 e1 f1 g1 h1 i1 j1 k1"),
      (2L, "clean text with no listed words at all today")
    ).toDF("id", "text")
    val rows = Curation.blocklistFilter(df, "id", "text",
      words = Seq("the", "data"), maxPct = 8).orderBy("id").collect()
    // doc 1: 25 tokens, hits (The, the, DATA) = 3, distinct 2;
    // 3·100 > 8·25 = 200 → dropped
    assert(rows(0).getLong(1) == 25L && rows(0).getLong(2) == 3L &&
      rows(0).getLong(3) == 2L && !rows(0).getBoolean(4))
    assert(rows(1).getLong(2) == 0L && rows(1).getBoolean(4))
    // exact boundary: 2 hits in 25 tokens → 200 ≤ 200 → kept
    val edge = Seq((3L, "the data x y z u v w p q r s t a1 b1 c1 d1 e1 f1 g1 h1 i1 j1 k1 l1"))
      .toDF("id", "text")
    assert(Curation.blocklistFilter(edge, "id", "text",
      Seq("the", "data"), 8).collect().head.getBoolean(4))
  }

  test("blocklistFilter: NULL text propagates NULL counts and keep (the DuckDB twin's semantics)") {
    val df = Seq((1L, Some("the cat")), (2L, None))
      .toDF("id", "text")
    val rows = Curation.blocklistFilter(df, "id", "text",
      Seq("the"), maxPct = 50).orderBy("id").collect()
    assert(rows(0).getLong(1) == 2L && rows(0).getBoolean(4))
    // ANSI size(NULL) is NULL (not legacy -1) — counts and the keep
    // decision must be NULL, never keep=true from garbage arithmetic
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(4))
  }

  test("uniMaxFromCensus: cap decisions survive counts whose Long product would wrap") {
    // capu = n·epochCap·1e6 = 5e11·10·1e6 = 5e18 per group (fits a long);
    // with L = 3 groups the old Long prefix test computed capu·3 = 1.5e19
    // > Long.MaxValue and wrapped NEGATIVE, flipping the cap decision to
    // "capped" under any budget. Decimal(38,0) keeps it exact
    // (round-12 advice).
    val census = Seq(("a", 500000000000L), ("b", 500000000000L),
      ("c", 500000000000L)).toDF("g", "n")
    // budget 1e12 tokens: well under any cap (each cap = 5e12 units), so
    // NOBODY is capped and the equal share is budget/3
    val rows = Curation.uniMaxFromCensus(census, "g", "n",
      budget = 1000000000000L, epochCap = 10.0).orderBy("g").collect()
    assert(rows.forall(!_.getBoolean(5)),
      "overflow flipped a cap decision: " + rows.mkString(", "))
    val share = 1000000000000L / 3.0
    rows.foreach(r => assert(math.abs(r.getDouble(3) - share) < 1.0))
    // and the census route agrees with the row-count route on small data
    val df = (Seq.fill(10)("A") ++ Seq.fill(100)("C")).toDF("lang")
    val viaRows = Curation.uniMaxAllocation(df, "lang", 60L, 2.0)
      .orderBy("lang").collect()
    val viaCensus = Curation.uniMaxFromCensus(
      Seq(("A", 10L), ("C", 100L)).toDF("lang", "n"), "lang", "n", 60L, 2.0)
      .orderBy("lang").collect()
    assert(viaRows.toSeq == viaCensus.toSeq)
  }

  test("uniMaxAllocation: allocations sum to min(budget, total capacity)") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(13)("y") ++ Seq.fill(40)("z"))
      .toDF("g")
    val partial = Curation.uniMaxAllocation(df, "g", budget = 50L,
      epochCap = 3.0).collect().map(_.getDouble(3)).sum
    assert(math.abs(partial - 50.0) < 1e-6)
    val capped = Curation.uniMaxAllocation(df, "g", budget = 10000L,
      epochCap = 3.0).collect().map(_.getDouble(3)).sum
    assert(math.abs(capped - 3.0 * 58) < 1e-6)
  }
}
