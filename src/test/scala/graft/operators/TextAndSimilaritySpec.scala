package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions, VectorFunctions, VectorMean}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Extension-operator unit tests: text analysis, shingle/Jaccard/MinHash
  * dedup, SimHash, vector similarity, multimodal plumbing.
  */
class TextAndSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("tokenization and occurrence counting") {
    val df = Seq((1L, "the cat and the hat"), (2L, "a b  c")).toDF("id", "text")
    val out = df.select($"id",
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.occurrences($"text", "the").as("nthe")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (5L, 2L))
    assert(out(2L) == (4L, 0L)) // double space → empty token, same as DuckDB
  }

  test("batched BM25 join matches per-query bm25Search; self-retrieval ranks first") {
    val d = Tables.load(spark, dir, "documents")
    val p = InvertedIndex.postings(d, "doc_id", "text")
    val queries = d.filter($"doc_id" % 100 === 0) // 5 queries at sf0.001
      .select($"doc_id".as("q_id"),
        explode(slice(split($"text", " "), 1, 8)).as("term")).distinct()
    val batched = InvertedIndex.bm25JoinTopK(p, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    assert(batched.nonEmpty)
    val qids = queries.select("q_id").distinct().as[Long].collect()
    qids.foreach { qid =>
      val terms = queries.filter($"q_id" === qid).select("term").as[String].collect().toSeq
      val single = InvertedIndex.bm25Search(p, terms)
        .orderBy($"bm25".desc, $"doc_id".asc).limit(5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val mine = batched.collect { case ((q, doc), (s, _)) if q == qid => doc -> s }
      assert(mine.keySet == single.keySet, s"q$qid candidate sets differ")
      mine.foreach { case (doc, s) =>
        assert(math.abs(s - single(doc)) < 1e-9, s"q$qid doc$doc score drift") }
    }
    // NOTE deliberately absent: self-retrieval-at-rank-1. BM25's length
    // normalization can rank a SHORTER near-dup twin above the source doc
    // (it does, for doc 200 on this corpus) — a data property, not an
    // operator defect; the equivalence check above is the contract.
  }

  test("bm25JoinTopK corpus-scale switch: shuffle path == broadcast path") {
    val d = Tables.load(spark, dir, "documents")
    val p = InvertedIndex.postings(d, "doc_id", "text")
    val queries = d.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("q_id"),
        explode(slice(split($"text", " "), 1, 8)).as("term")).distinct()
    val bcast = InvertedIndex.bm25JoinTopK(p, queries, k = 5)
    // threshold 0 forces the corpus-sized-query-set plan: retrieval joins
    // keyed on term as pinned sort-merge, no query-frame broadcast
    val shuffled = InvertedIndex.bm25JoinTopK(p, queries, k = 5,
      broadcastMaxQueryTerms = Some(0L))
    assert(shuffled.queryExecution.sparkPlan.toString
      .contains("SortMergeJoin"), "large path must not plan a broadcast")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val b = pairs(bcast)
    val s = pairs(shuffled)
    assert(b.keySet == s.keySet, "candidate sets must match across paths")
    b.foreach { case (k, v) =>
      assert(math.abs(v - s(k)) < 1e-9, s"$k score drift across join plans") }
    // probed-but-under-threshold keeps the broadcast plan; the default
    // (None) path never runs the probe job at all — builder stays lazy
    val probed = InvertedIndex.bm25JoinTopK(p, queries, k = 5,
      broadcastMaxQueryTerms = Some(Long.MaxValue))
    assert(probed.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"), "under-threshold probe must broadcast")
  }

  test("content-defined chunks: partition property and edit localization") {
    val doc = (1 to 120).map(i => s"w${i % 37}").mkString(" ")
    val base = Seq((1L, doc)).toDF("doc_id", "text")
    val chunks = TextDedup.contentDefinedChunks(base, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    // chunks partition the token stream: sizes sum to 120, re-assembly = doc
    assert(chunks.map(_._2).sum == 120)
    assert(chunks.sortBy(_._1).map(_._3).mkString(" ") == doc)

    // EDIT LOCALIZATION: insert one token near the front; the chunk
    // multiset differs in at most 3 chunks (the edited one, possibly split)
    // while fixed windows would shift at every position after the edit
    val tokens = doc.split(" ").toVector
    val edited = (tokens.take(10) ++ Vector("INSERTED") ++ tokens.drop(10)).mkString(" ")
    val editedChunks = TextDedup.contentDefinedChunks(
        Seq((2L, edited)).toDF("doc_id", "text"), "doc_id", "text", 8)
      .collect().map(_.getString(3))
    def multiset(xs: Iterable[String]) =
      xs.groupBy(identity).view.mapValues(_.size).toMap
    val a = multiset(chunks.map(_._3)); val b = multiset(editedChunks)
    val symDiff = (a.keySet ++ b.keySet).toSeq
      .map(k => math.abs(a.getOrElse(k, 0) - b.getOrElse(k, 0))).sum
    assert(symDiff <= 3, s"edit was not localized: $symDiff chunks differ")

    // contrast: fixed 8-token windows after the same edit share almost
    // nothing (every window after position 10 shifts by one)
    def fixed(ts: Vector[String]) = ts.grouped(8).map(_.mkString(" ")).toVector
    val fa = multiset(fixed(tokens))
    val fb = multiset(fixed(tokens.take(10) ++ Vector("INSERTED") ++ tokens.drop(10)))
    val fixedShared = fa.keySet.intersect(fb.keySet).size
    assert(fixedShared <= 2, s"premise broken: fixed windows shared $fixedShared")
  }

  test("word shingles: count and content") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val sh = TextDedup.wordShingles(df, "doc_id", "text", 3).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d"))) // doc 2 too short → no rows
  }

  test("jaccard: identical docs = 1.0, planted near-dups found by LSH") {
    val df = Seq(
      (1L, "spark runs fast on big data clusters every day"),
      (2L, "spark runs fast on big data clusters every day"),      // exact dup
      (3L, "spark runs fast on big data clusters every night"),    // near dup
      (4L, "completely different words appear in this one here")).toDF("doc_id", "text")
    val sh = TextDedup.wordShingles(df, "doc_id", "text", 3)
    val exact = TextDedup.jaccardPairs(sh, 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L)))
    val near = TextDedup.minhashNearDupes(df, "doc_id", "text", 3, 8, 4, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((1L, 2L)) && near.contains((1L, 3L)))
    assert(!near.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("q42 banding (k=16, 8 bands × 2 rows) reaches recall 1 at j≥0.8 on the corpus") {
    // the uncapped corpus-dedup stage runs the LSH path; this pins that its
    // pair set — and therefore the kept set — equals the exact all-pairs
    // baseline on the real sf0.01 documents table
    val d = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val exact = TextDedup.jaccardPairs(
        TextDedup.wordShingles(d, "doc_id", "text", 3), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashNearDupes(d, "doc_id", "text", n = 3, k = 16,
        bands = 8, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    spark.catalog.clearCache() // minhashNearDupes persists shingles/signature
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val df = Seq(
      (1L, "spark runs fast on big data clusters every day and more and more"),
      (2L, "spark runs fast on big data clusters every day and more and less"),
      (3L, "completely unrelated vocabulary fills the entire final document")).toDF("doc_id", "text")
    val sims = TextDedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(2L)) < ham(sims(1L), sims(3L)))
  }

  test("cosine similarity: hand values + self-similarity = 1") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("id", "v")
    val sims = df.crossJoin(df.select($"id".as("id2"), $"v".as("v2")))
      .select($"id", $"id2", VectorFunctions.cosine($"v", $"v2").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(sims((1L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(sims((1L, 2L))) < 1e-12)
    assert(math.abs(sims((1L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("codegen CosineSimilarity ≡ higher-order cosine, bit-for-bit") {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val both = emb.crossJoin(q).select(
      VectorFunctions.cosine($"embedding", $"qv").as("slow"),
      VectorFunctions.cosineFast($"embedding", $"qv").as("fast"))
    assert(both.filter($"slow" =!= $"fast").count() == 0)
    // interpreted path too (nullSafeEval): collect through a non-codegen barrier
    val vals = both.collect()
    vals.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("brute-force top-k is ordered and excludes the query row") {
    val top = Similarity.bruteForceTopK(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", 0L, 5).collect()
    assert(top.length == 5)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("LSH bucket path returns a subset consistent with brute force") {
    val emb = Tables.load(spark, dir, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 10, 4, 64).collect()
    // every LSH result's similarity must equal the brute-force value
    lsh.foreach { r =>
      brute.get(r.getLong(0)).foreach(b => assert(math.abs(b - r.getDouble(1)) < 1e-12))
    }
  }

  test("filtered top-k: every result satisfies the predicate with brute-force similarity") {
    val emb = Tables.load(spark, dir, "embeddings")
    val filtered = Similarity.filteredTopK(
      emb, "vec_id", "embedding", "label = 3", 0L, 10).collect()
    assert(filtered.length == 10)
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    filtered.foreach(r => assert(labels(r.getLong(0)) == 3))
    // similarities agree with the unfiltered exact ranking's values
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 5000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    filtered.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
  }

  test("kNN join with full probe ≡ per-query brute force") {
    val emb = Tables.load(spark, dir, "embeddings")
    val joined = Similarity.ivfKnnJoin(emb, "vec_id", "embedding",
      nQueries = 4, k = 5, nClusters = 8, nProbe = 8, iters = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    (0L until 4L).foreach { q =>
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
        .collect().map(r => (q, r.getLong(0), r.getDouble(1))).toSeq
      assert(joined(q).toSeq.sortBy(t => (-t._3, t._2)) == brute,
        s"query $q: full-probe kNN join diverged from brute force")
    }
    spark.catalog.clearCache()
  }

  test("knnRecall: full probe → recall exactly 1; bounded in [0,1] otherwise") {
    val emb = Tables.load(spark, dir, "embeddings")
    val full = Similarity.knnRecall(emb, "vec_id", "embedding",
      nQueries = 4, k = 5, nClusters = 8, nProbe = 8, iters = 1).collect()
    assert(full.length == 4)
    full.foreach(r => assert(r.getLong(1) == 5 && r.getDouble(2) == 1.0,
      s"query ${r.getLong(0)}: full probe must recover the exact top-k"))
    val partial = Similarity.knnRecall(emb, "vec_id", "embedding",
      nQueries = 4, k = 5, nClusters = 8, nProbe = 1, iters = 1).collect()
    assert(partial.length == 4)
    partial.foreach(r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    spark.catalog.clearCache()
  }

  test("VectorMean aggregator ≡ posexplode+avg formulation") {
    val emb = Tables.load(spark, dir, "embeddings").limit(200)
    val vecMean = udaf(new VectorMean(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val viaAgg = emb.groupBy($"label").agg(vecMean($"embedding").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = emb
      .select($"label", posexplode($"embedding").as(Seq("d", "v")))
      .groupBy("label", "d").agg(avg($"v").as("m")).collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    viaAgg.foreach { case (l, m) =>
      m.zip(viaExplode(l)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("cosine_similarity is SQL-callable after extension registration") {
    graft.GraftExtensions.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT e.vec_id, cosine_similarity(e.embedding, q.embedding) AS c
        |FROM emb_sql e JOIN emb_sql q ON q.vec_id = 0
        |WHERE e.vec_id IN (1, 2, 3)""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaApi = Tables.load(spark, dir, "embeddings").as("e")
      .join(Tables.load(spark, dir, "embeddings").filter($"vec_id" === 0).as("q"))
      .filter($"e.vec_id".isin(1L, 2L, 3L))
      .select($"e.vec_id",
        VectorFunctions.cosineFast($"e.embedding", $"q.embedding").as("c")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaApi)
  }

  test("graft_zvalue is SQL-callable and matches the Column form") {
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_zvalue(x, y, 8) AS z FROM VALUES (3L, 5L), (200L, 17L) AS t(x, y)")
      .collect().map(_.getLong(0)).toSeq
    val viaApi = Seq((3L, 5L), (200L, 17L)).toDF("x", "y")
      .select(graft.functions.ZOrder.zValue($"x", $"y", 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaApi)
    // bits must be a literal: a column reference there is an analysis error
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_zvalue(x, y, x) FROM VALUES (3L, 5L) AS t(x, y)")
        .collect()
    }
  }

  test("IVF+SQ8: deterministic, and the shortlist rerank recovers brute-force top-k") {
    val emb = Tables.load(spark, dir, "embeddings")
    def run() = Similarity.ivfSq8TopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, nClusters = 8, nProbe = 8, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run()
    assert(a == run()) // deterministic end-to-end
    // with every cluster probed and a wide shortlist, the int8 detour must
    // still land on the exact answer: rerank is full-precision
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val got = a.map(_._1).toSet
    val recall = got.intersect(brute).size / 10.0
    assert(recall >= 0.9, s"recall $recall: $got vs $brute")
    spark.catalog.clearCache()
  }

  test("IVF+PQ: deterministic; full probe + full shortlist is exactly brute force") {
    val emb = Tables.load(spark, dir, "embeddings")
    def run(rerank: Int) = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, nClusters = 8, nProbe = 8,
      m = 4, subDim = 16, ksub = 8, rerank = rerank, coarseIters = 2, pqIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run(150)
    assert(a == run(150)) // deterministic end-to-end
    // 12-bit codes misrank individual candidates (measured: a 100-of-499
    // shortlist drops to 0.8), but a 150-of-499 ADC shortlist +
    // full-precision rerank must still find ≥9 of the 10 true neighbors
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = a.map(_._1).toSet.intersect(brute).size / 10.0
    assert(recall >= 0.9, s"recall $recall: ${a.map(_._1).toSet} vs $brute")
    // shortlist = whole corpus ⇒ the ADC detour cannot lose anything: the
    // rerank IS brute force (approximation lives only in probe + shortlist)
    assert(run(500).map(_._1).toSet == brute)
    spark.catalog.clearCache()
  }

  test("LSH cross-corpus: plants all found, every pair true, subset of exact") {
    val e = Tables.load(spark, dir, "embeddings")
    val a = e.filter(col("vec_id") % 2 === 0)
    // the "batch": every reference vector re-labeled odd — an exact
    // duplicate across sides, which shares every bucket (recall 1 on dups)
    val b = a.withColumn("vec_id", col("vec_id") + 1)
    val got = Similarity.lshCrossCorpusPairs(a, b, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision: every emitted pair is cross-side and ≥ threshold
    assert(got.forall { case (x, y, c) => x % 2 == 0 && y % 2 != 0 && c >= 0.9 })
    // every planted duplicate is found
    val planted = a.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val selfPairs = got.collect { case (x, y, _) if y == x + 1 => x }.toSet
    assert(selfPairs == planted, s"missed ${planted diff selfPairs}")
    // and nothing outside the exact cross join sneaks in
    val exact = a.select(col("vec_id").as("a_id"), col("embedding").as("__va"))
      .crossJoin(b.select(col("vec_id").as("b_id"), col("embedding").as("__vb")))
      .select(col("a_id"), col("b_id"),
        graft.functions.VectorFunctions.cosineFast(col("__va"), col("__vb")).as("c"))
      .filter(col("c") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)).toSet.subsetOf(exact))
  }

  test("int8 quantization: codes in range, error bounded by half a step per dim") {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = Similarity.int8QuantizationErrors(emb, "vec_id", "embedding")
    assert(q.filter(col("code") < 0 || col("code") > 255).count() == 0)
    // linear 0..255 quantization error ≤ (mx-mn)/255/2 + float slack per dim
    val steps = Similarity.int8QuantizationErrors(emb, "vec_id", "embedding")
      .groupBy("dim").agg(max("err").as("worst"))
    val scales = emb.select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"), col("v").cast("double").as("v"))
      .groupBy("dim").agg(((max("v") - min("v")) / 255 / 2 * 1.0000001).as("bound"))
    assert(steps.join(scales, "dim").filter(col("worst") > col("bound")).count() == 0)
  }

  test("IVF: deterministic centroids, high recall vs brute force at nProbe=8") {
    val emb = Tables.load(spark, dir, "embeddings")
    val c1 = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8, 2)
    val c2 = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8, 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    // probing ALL clusters must reproduce brute force exactly
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, 8, 8, iters = 2)
      .collect().map(_.getLong(0)).toSet
    assert(full == brute)
    // partial probe: a valid subset of the corpus ranking (recall may dip)
    val part = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, 8, 2, iters = 2)
      .collect()
    assert(part.length == 10)
    val sims = part.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("IVF bounded training (trainFraction): recall unchanged on the fixture, sample is deterministic") {
    val emb = Tables.load(spark, dir, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    def recall(tf: Double): Double = {
      val got = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, 8, 8,
        iters = 2, trainFraction = tf).collect().map(_.getLong(0)).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    // full probe reproduces brute force whatever the quantizer trained on:
    // the training budget moves WHERE cluster boundaries fall, not what a
    // full probe can see
    assert(recall(1.0) == 1.0)
    assert(recall(0.5) == 1.0)
    // and the sampled quantizer itself is deterministic across runs
    val c1 = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8, 2, 0.5)
    val c2 = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8, 2, 0.5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // partial probe over the sampled quantizer still ranks correctly
    val part = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, 8, 2,
      iters = 2, trainFraction = 0.5).collect()
    assert(part.length == 10)
    val sims = part.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    // a sample too thin to seed k centroids fails loudly, never silently
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfCentroids(emb.limit(40), "vec_id", "embedding",
        k = 32, iters = 1, trainFraction = 0.01)
    }
    assert(e.getMessage.contains("trainFraction"))
  }

  test("LSH near-dup pairs ⊆ brute-force pairs; full recall on planted near-dups") {
    // subset property on the harness corpus (precision 1 by construction:
    // every candidate is exact-verified)
    val emb = Tables.load(spark, dir, "embeddings")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val brute = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .collect().map(key).toSet
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .collect().map(key).toSet
    assert(lsh.subsetOf(brute))

    // planted clusters at a REAL near-dup threshold (s≈0.99): 20 base
    // vectors, 3 deterministic tiny-noise copies each — recall must be 1.0
    // (per-pair miss probability < 1e-4 at r=6, T=6)
    // seeded java.util.Random per cluster/copy: deterministic AND decorrelated
    // across seeds (a raw index-linear LCG left adjacent clusters as near-
    // translations of each other — accidental cross-cluster matches)
    def stream(seed: Long): Array[Float] = {
      val r = new java.util.Random(seed)
      Array.fill(64)(r.nextFloat() - 0.5f)
    }
    val planted = (0 until 60).map { j =>
      val base = stream(j / 3)
      val noise = stream(1000L + j)
      (j.toLong, base.zip(noise).map { case (x, n) => x + 0.001f * n }.toSeq)
    }
    val pdf = planted.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val pBrute = Similarity.cosineNearDupPairs(pdf, "vec_id", "embedding", 0.9)
      .collect().map(key).toSet
    val pLsh = Similarity.lshNearDupPairs(pdf, "vec_id", "embedding", 0.9)
      .collect().map(key).toSet
    assert(pBrute.size == 60) // 20 clusters × C(3,2)
    assert(pLsh == pBrute)
  }

  test("codegen NearestCentroid is bit-identical to the HOF argmin form") {
    val emb = Tables.load(spark, dir, "embeddings")
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 8, 2)
    val both = emb.select($"vec_id",
        Similarity.assignCluster($"embedding", cents).as("cg"),
        Similarity.assignClusterHof($"embedding", cents).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(1) == r.getInt(2), s"vec ${r.getLong(0)}"))
  }

  test("multimodal: real BMP headers are parsed; junk falls back to the stub") {
    // minimal 26-byte BMP header prefix: "BM" + 16 filler + w=640 + h=-480 (top-down)
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putI32(o: Int, v: Int): Unit = (0 until 4).foreach(i => bmp(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    putI32(18, 640); putI32(22, -480)
    val d = Multimodal.decodeStub(1L, "image", bmp)
    assert(d.width == 640 && d.height == 480)
    val junk = Multimodal.decodeStub(2L, "image", "not a bmp".getBytes)
    assert(junk.width >= 64 && junk.height >= 64) // stub path
  }

  test("multimodal: WAV roundtrip — real RIFF bytes, chunk walk, malformed handling") {
    // roundtrip through genuine bytes
    val bytes = Multimodal.wavBytes(16000, 2, 16, 123)
    assert(Multimodal.parseWavMeta(bytes).contains((16000, 2, 16, 123L)))
    // an extra LIST chunk between fmt and data parses fine (chunk walk)
    val fmtAndHeader = bytes.take(36) // RIFF..WAVE + fmt chunk
    val data = bytes.drop(36)         // "data" + size + samples
    val list = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII")).array()
    val withList = fmtAndHeader ++ list ++ data
    assert(Multimodal.parseWavMeta(withList).contains((16000, 2, 16, 123L)))
    // malformed: junk, truncation, and a lying chunk size all reject
    assert(Multimodal.parseWavMeta("not audio at all bytes!!".getBytes ++
      new Array[Byte](40)).isEmpty)
    assert(Multimodal.parseWavMeta(bytes.take(20)).isEmpty)
    val lying = bytes.clone()
    lying(40) = 0x7f.toByte; lying(41) = 0x7f.toByte
    lying(42) = 0x7f.toByte; lying(43) = 0x7f.toByte // data size > remaining
    assert(Multimodal.parseWavMeta(lying).isEmpty)
    // distributed batch decode with a junk row dropped
    val media = Seq(
      (1L, Multimodal.wavBytes(8000, 1, 16, 100)),
      (2L, Multimodal.wavBytes(44100, 2, 16, 441)),
      (3L, "junk".getBytes)).toDF("media_id", "content")
    val out = Multimodal.audioMeta(media).collect()
      .map(w => w.media_id -> w).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).duration_ms == 12.5)
    assert(out(2L).sample_rate == 44100 && out(2L).n_samples == 441L)
    assert(math.abs(out(2L).duration_ms - 10.0) < 1e-9)
  }

  test("multimodal: real ImageIO decode — PNG/GIF/BMP dims, pixel features, resize") {
    import java.awt.image.BufferedImage
    def mkImage(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // true header dims across formats, not pseudo-dims
    val d1 = Multimodal.decode(1L, "image", mkImage(37, 21, 0xff0000, "png"))
    assert(d1.width == 37 && d1.height == 21 && d1.format == "png")
    val d2 = Multimodal.decode(2L, "image", mkImage(8, 5, 0x00ff00, "gif"))
    assert(d2.width == 8 && d2.height == 5 && d2.format == "gif")
    val d3 = Multimodal.decode(3L, "image", mkImage(16, 4, 0x0000ff, "bmp"))
    assert(d3.width == 16 && d3.height == 4 && d3.format == "bmp")
    // distributed decode over a media table of real images
    val rows = (1 to 12).map(i => (i.toLong, mkImage(10 + i, 7, 0x336699, "png"), "image"))
    val media = rows.toDF("media_id", "content", "kind")
    val dec = Multimodal.decodeAll(media).collect()
    assert(dec.length == 12)
    dec.foreach(d => assert(d.format == "png" && d.height == 7 && d.width == 10 + d.media_id.toInt))
    // full pixel decode: solid 0x336699 → exact channel means
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.length == 12)
    feats.foreach { f =>
      assert(f.mean_r == 0x33.toDouble && f.mean_g == 0x66.toDouble && f.mean_b == 0x99.toDouble)
    }
    // resize then re-decode: dims must be the target, content still PNG
    val rs = Multimodal.resizeImages(media, 5, 4).collect()
    assert(rs.length == 12)
    rs.foreach { r =>
      val d = Multimodal.decode(r.getLong(0), "image", r.getAs[Array[Byte]](1))
      assert(d.width == 5 && d.height == 4 && d.format == "png")
    }
    // non-image bytes are dropped by the image-only stages, not errored
    val junk = Seq((99L, "definitely not an image".getBytes, "audio")).toDF("media_id", "content", "kind")
    assert(Multimodal.imageFeatures(junk).count() == 0)
    assert(Multimodal.resizeImages(junk, 5, 4).count() == 0)
  }

  test("multimodal: decode stub is deterministic, frame sampling chunks") {
    val docs = Tables.load(spark, dir, "documents").limit(20)
    val media = Multimodal.fromDocuments(docs)
    val decoded = Multimodal.decodeAll(media).collect()
    assert(decoded.length == 20)
    assert(decoded.forall(d => d.n_bytes > 0 && d.width >= 64 && d.height >= 64))
    val again = Multimodal.decodeAll(media).collect().map(d => d.media_id -> d.checksum).toMap
    decoded.foreach(d => assert(again(d.media_id) == d.checksum))
    val frames = Multimodal.sampleFrames(media, chunkBytes = 60, everyK = 2)
    assert(frames.count() > 0)
    assert(frames.select(max("frame_no")).head().getInt(0) % 2 == 0)
  }

  test("SemDeDup: within-cluster pairs ⊆ all-pairs; planted same-cluster dups found") {
    val emb = Tables.load(spark, dir, "embeddings")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val brute = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .collect().map(key).toSet
    val sem = Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
      nClusters = 8, minSim = 0.45, iters = 2)
    val semPairs = sem.collect()
    // subset of the quadratic baseline (cluster bounding can only DROP pairs)
    assert(semPairs.map(key).toSet.subsetOf(brute))
    // both members of a pair carry the same cluster by construction
    assert(sem.columns.toSeq == Seq("a_id", "b_id", "cluster", "cos_sim"))
    // planted exact duplicates (cos = 1) always share a cluster -> found
    val dup = emb.limit(5).select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val withDups = emb.select($"vec_id", $"embedding").unionByName(dup)
    val found = Similarity.semanticDedupPairs(withDups, "vec_id", "embedding",
      nClusters = 8, minSim = 0.999, iters = 2)
      .collect().map(key).toSet
    (0L until 5L).foreach(i => assert(found.contains((i, i + 10000L)),
      s"planted dup $i missing"))
  }

  test("corpusCard: hand-computed stratum stats incl. exact-dup fraction") {
    val docs = Seq(
      (1L, "a b", "en", "web"), (2L, "a b", "en", "web"), (3L, "c", "en", "web"),
      (4L, "d e f", "de", "web")).toDF("doc_id", "text", "lang", "source")
    val out = Curation.corpusCard(docs, "text", Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val web_en = out(("web", "en"))
    assert(web_en.getAs[Long]("n_docs") == 3L)
    assert(web_en.getAs[Long]("n_tokens") == 5L) // "a b" x2 + "c"
    assert(web_en.getAs[Long]("n_chars") == 7L)
    assert(web_en.getAs[Long]("n_distinct_texts") == 2L)
    assert(math.abs(web_en.getAs[Double]("exact_dup_fraction") - 1.0 / 3.0) < 1e-12)
    assert(out(("web", "de")).getAs[Long]("n_tokens") == 3L)
  }

  test("language id + quality are deterministic and bounded") {
    val docs = Tables.load(spark, dir, "documents")
    val out = docs.select(
      TextFunctions.predictLang($"text").as("lang"),
      TextFunctions.qualityScore($"text").as("q"))
    assert(out.filter($"q" < 0 || $"q" > 1.0).count() == 0)
    assert(out.filter($"lang".isin("en", "de", "fr", "es", "zh")).count() == docs.count())
  }

  test("prefixJaccardJoin ≡ exact quadratic jaccardPairs on the real corpus (recall 1, precision 1)") {
    val docs = Tables.load(spark, dir, "documents")
    val exact = TextDedup.jaccardPairs(
        TextDedup.wordShingles(docs, "doc_id", "text", 3), 0.7)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pj = TextDedup.prefixJaccardJoin(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pj == exact, s"prefix join ${pj.size} pairs vs exact ${exact.size}")
    assert(exact.nonEmpty) // the corpus plants near-dups; an empty check proves nothing
  }

  test("buildVocab ids are deterministic (count desc, token asc); encodeDocs maps OOV to 0") {
    val docs = Seq((1L, "b b a a c"), (2L, "b a rare")).toDF("doc_id", "text")
    val v = Curation.buildVocab(docs, "text", minCount = 2L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // counts: b=3, a=3, c=1, rare=1 → vocab {a, b}; tie broken lexically
    assert(v == Map("a" -> ((1L, 3L)), "b" -> ((2L, 3L))))
    val enc = Curation.encodeDocs(docs, "doc_id", "text",
        Curation.buildVocab(docs, "text", 2L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(enc(1L) == Seq(2L, 2L, 1L, 1L, 0L)) // c → OOV 0, order preserved
    assert(enc(2L) == Seq(2L, 1L, 0L))
  }

  test("countMinJoinSize: ≥ exact always, 0 on disjoint keys, tight on small domains") {
    import graft.operators.Sketches
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 9L).toDF("k")
    val cellsA = Sketches.countMinCells(a, col("k"), 4, 1024)
    val cellsB = Sketches.countMinCells(b, col("k"), 4, 1024)
    val est = Sketches.countMinJoinSize(spark, cellsA, cellsB, 4)
      .head().getLong(0)
    // exact: k=1 → 2·1, k=2 → 1·2 ⇒ 4; tiny domain in a wide grid → exact
    assert(est == 4L)
    val disjoint = Sketches.countMinCells(Seq(100L, 101L).toDF("k"), col("k"), 4, 1024)
    assert(Sketches.countMinJoinSize(spark, cellsA, disjoint, 4)
      .head().getLong(0) == 0L)
  }

  test("dropDuplicatedChunks: corpus-wide dup chunks removed, text reassembled in order") {
    val docs = Seq(
      (1L, "a b c d e f"), // chunks(2): "a b" "c d" "e f"
      (2L, "a b x y"),     // "a b" duplicated corpus-wide → dropped from both
      (3L, "z z z")        // trailing partial chunk "z" kept
    ).toDF("doc_id", "text")
    val out = TextDedup.dropDuplicatedChunks(docs, "doc_id", "text",
      chunkWords = 2, minCount = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 2L, "c d e f")))
    assert(out(2L) == ((2L, 1L, "x y")))
    assert(out(3L) == ((2L, 2L, "z z z")))
  }

  test("duplicateSpanCoverage: overlapping spans union; short docs report zero") {
    val docs = Seq(
      (1L, "p q r s t u"), // shares windows "p q r" and "q r s" with doc 2
      (2L, "p q r s x y"),
      (3L, "aa bb")        // < w words → no windows
    ).toDF("doc_id", "text")
    val out = TextDedup.duplicateSpanCoverage(docs, "doc_id", "text", w = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // spans [1,4) ∪ [2,5) merge to [1,5): 4 covered words out of 6
    assert(out(1L) == ((6L, 2L, 4L)))
    assert(out(2L) == ((6L, 2L, 4L)))
    assert(out(3L) == ((2L, 0L, 0L)))
  }

  test("meanPool averages element-wise; normalize yields a unit vector") {
    import graft.functions.VectorFunctions
    val df = Seq((Seq(Seq(1.0f, 2.0f), Seq(3.0f, 6.0f)))).toDF("vs")
    val r = df.select(
      VectorFunctions.meanPool(col("vs")).as("m"),
      VectorFunctions.l2Norm(VectorFunctions.normalize(
        VectorFunctions.meanPool(col("vs")))).as("n")).head()
    assert(r.getSeq[Double](0) == Seq(2.0, 4.0))
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    // zero vector → normalize is NULL, not a divide-by-zero
    val z = Seq(Seq(Seq(0.0f, 0.0f))).toDF("vs")
      .select(VectorFunctions.normalize(VectorFunctions.meanPool(col("vs"))))
      .head()
    assert(z.isNullAt(0))
  }

  test("binarySig packs sign bits exactly; hamming counts flipped planes") {
    // dim 4 in a 64-bit word: bits 0 and 2 set (v > 0 strictly — 0f is OFF)
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 3.0f, 0.0f)),
      (2L, Seq(-1.0f, 2.0f, 3.0f, -4.0f))).toDF("id", "v")
    val sigs = df.select(col("id"),
      element_at(Similarity.binarySig("v", 4), 1).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == ((1L << 0) | (1L << 2)))
    assert(sigs(2L) == ((1L << 1) | (1L << 2)))
    val h = df.as[(Long, Seq[Float])].collect()
    val hd = Seq(Seq(1.0f, -2.0f, 3.0f, 0.0f), Seq(-1.0f, 2.0f, 3.0f, -4.0f))
    // signatures differ in bits 0 and 1 → hamming 2
    val got = Seq((hd(0), hd(1))).toDF("a", "b")
      .select(Similarity.hamming(
        Similarity.binarySig("a", 4), Similarity.binarySig("b", 4)))
      .head().getLong(0)
    assert(got == 2L)
    assert(h.length == 2) // fixture sanity
  }

  test("hardNegatives: positives excluded, ranks dense, hardest-first = similarity order") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") % 29 === 0)
    val positives = queries
      .select(col("vec_id").as("q_id"), col("label").as("__ql"))
      .join(e.select(col("vec_id"), col("label")), col("label") === col("__ql"))
      .select(col("q_id"), col("vec_id"))
    val posSet = positives.as[(Long, Long)].collect().toSet
    val got = Similarity.hardNegatives(e, "vec_id", "embedding", queries,
      "vec_id", positives, pool = 30, k = 5)
      .select("q_id", "vec_id", "cos_sim", "hard_rank")
      .as[(Long, Long, Double, Int)].collect()
    got.foreach { case (q, d, _, _) =>
      assert(!posSet.contains((q, d)), s"positive ($q, $d) mined as negative")
      assert(q != d)
    }
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length), s"ranks not dense for $q")
      // hardest-first: cosine non-increasing along hard_rank
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      assert(rs.length == 5, s"query $q: pool too shallow after positives")
    }
  }

  test("binaryHammingTopK: sign bit 63 survives (two's complement) and the shortlist reranks exactly") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    // at least one corpus signature must set bit 63 for the sign-bit claim
    val negSigs = emb.select(element_at(
      Similarity.binarySig("embedding", 64), 1).as("s"))
      .filter(col("s") < 0L).count()
    assert(negSigs > 0, "no signature exercises the BIGINT sign bit")
    val got = Similarity.binaryHammingTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, shortlist = 50, dim = 64)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect()
    assert(got.length == 10)
    // with a corpus-half shortlist the exact top-1 must be recovered
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 1).select("vec_id")
      .head().getLong(0)
    val wide = Similarity.binaryHammingTopK(emb, "vec_id", "embedding",
      0L, 10, shortlist = emb.count().toInt / 2, dim = 64)
      .select("vec_id").as[Long].collect()
    assert(wide.contains(exact))
  }
}
