package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decontamination, sequence packing, and percentile operators (the round-3
  * training-data additions).
  */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contaminatedDocs: flags docs sharing a 5-gram, skips clean docs") {
    val corpus = Seq(
      (1L, "a b c d e f g"),   // shares "a b c d e"
      (2L, "q r s t u v w"),   // clean
      (3L, "x a b c d e zz"),  // shares "a b c d e"
      (4L, "a b c d")          // < 5 tokens: no shingles at all
    ).toDF("doc_id", "text")
    val bench = Seq((10L, "a b c d e")).toDF("doc_id", "text")

    val r = Decontamination.contaminatedDocs(corpus, bench, "doc_id", "text", 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set((1L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("contaminatedDocs: counts distinct shared shingles and bench docs hit") {
    val corpus = Seq((1L, "a b c d e f a b c d e f")).toDF("doc_id", "text")
    // doc 1 shares "a b c d e" and "b c d e f" (each appears twice — counted
    // once), and two bench docs both carry the first shingle
    val bench = Seq((10L, "a b c d e"), (11L, "z a b c d e"), (12L, "b c d e f"))
      .toDF("doc_id", "text")
    val r = Decontamination.contaminatedDocs(corpus, bench, "doc_id", "text", 5).head()
    assert(r.getAs[Long]("n_shared_ngrams") == 2L)
    assert(r.getAs[Long]("n_bench_docs") == 3L)
  }

  test("sequencePack: offsets contiguous in id order, chunk spans exact") {
    val d = Seq((1L, 10L), (2L, 20L), (3L, 2048L), (4L, 5L)).toDF("doc_id", "n_tok")
    val r = Curation.sequencePack(d, "doc_id", "n_tok", nShards = 1, ctxLen = 2048)
      .orderBy("doc_id").collect()
    val starts = r.map(_.getAs[Long]("start_off")).toSeq
    val ends = r.map(_.getAs[Long]("end_off")).toSeq
    assert(starts == Seq(0L, 10L, 30L, 2078L))
    assert(ends == Seq(10L, 30L, 2078L, 2083L))
    // doc 3 spans tokens [30, 2078) → straddles the chunk-0/chunk-1 boundary
    val doc3 = r(2)
    assert(doc3.getAs[Long]("first_chunk") == 0L)
    assert(doc3.getAs[Long]("last_chunk") == 1L)
    assert(doc3.getAs[Long]("n_chunks") == 2L)
    assert(r.forall(_.getAs[Long]("n_chunks") >= 1L))
  }

  test("sequencePack: per-shard streams are independently contiguous") {
    val d = (1L to 200L).map(i => (i, 7L + i % 5)).toDF("doc_id", "n_tok")
    val packed = Curation.sequencePack(d, "doc_id", "n_tok", nShards = 4, ctxLen = 64)
    // within each shard, sorted by doc_id, every start equals the previous end
    val byShard = packed.collect().groupBy(_.getAs[Long]("shard"))
    assert(byShard.size == 4)
    byShard.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      assert(sorted.head.getAs[Long]("start_off") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_off") == a.getAs[Long]("end_off"))
        case _ =>
      }
    }
  }

  test("percentilesByGroup: nearest-rank on a known distribution") {
    val d = (1L to 10L).map(v => (v, "g", v)).toDF("id", "g", "v")
    val r = Sketches.percentilesByGroup(d, "g", "v", "id",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))).head()
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("p50") == 5L)  // ceil(0.5·10) = rank 5
    assert(r.getAs[Long]("p90") == 9L)  // ceil(0.9·10) = rank 9
    assert(r.getAs[Long]("p99") == 10L) // ceil(0.99·10) = rank 10
  }

  test("minhashNearDupesAgainst: flags batch-vs-corpus dups, never intra-batch") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val existing = Seq(
      (1L, base),
      (2L, "completely different words entirely unrelated content goes right here now")
    ).toDF("doc_id", "text")
    val incoming = Seq((10L, base + " x"), (11L, base + " y")).toDF("doc_id", "text")
    val pairs = TextDedup.minhashNearDupesAgainst(
      existing, incoming, "doc_id", "text", n = 3, k = 16, bands = 8, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both incoming docs near-dup existing doc 1 (j = 11/12); doc 2 is clean,
    // and the intra-batch pair (10, 11) is deliberately not produced
    assert(pairs == Set((10L, 1L), (11L, 1L)))
  }

  test("rebalanceStrata: uniform mix in expectation, smallest stratum kept whole") {
    val d = ((1L to 600L).map(i => (i, "big")) ++ (601L to 700L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val kept = Curation.rebalanceStrata(d, "source", "doc_id")
    val sizes = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    // threshold for the smallest stratum is min_cnt·2^28 div min_cnt = 2^28
    // → every row's 28-bit hash passes: kept in full, by construction
    assert(sizes("small") == 100L)
    // the big stratum downsamples to ~min_cnt (hash-uniform draw, ±sampling noise)
    assert(sizes("big") > 60L && sizes("big") < 140L, s"big=${sizes("big")}")
    // deterministic: same subset on a rerun
    assert(rowsOf(kept, "doc_id") == rowsOf(Curation.rebalanceStrata(d, "source", "doc_id"), "doc_id"))
  }

  test("curriculumBins: equal-frequency deciles per group, best scores in bin 1") {
    val d = (1L to 100L).map(i => (i, "g", i.toDouble)).toDF("doc_id", "g", "score")
    val binned = Curation.curriculumBins(d, "g", col("score"), "doc_id", 10)
    val sizes = binned.groupBy("bin").count().as[(Int, Long)].collect().toMap
    assert(sizes.values.toSet == Set(10L) && sizes.keySet == (1 to 10).toSet)
    // ordering is score DESC: the highest scores land in bin 1
    val bin1 = binned.filter(col("bin") === 1).select("doc_id").as[Long].collect().toSet
    assert(bin1 == (91L to 100L).toSet)
  }

  test("approxPercentilesByGroup agrees with the exact form at test scale") {
    val d = (1L to 500L).map(v => (v, (v % 3).toString, v % 97)).toDF("id", "g", "v")
    val exact = Sketches.percentilesByGroup(d, "g", "v", "id",
      Seq(("p50", 1, 2), ("p90", 9, 10)))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("p50"), r.getAs[Long]("p90"))).toMap
    val approx = Sketches.approxPercentilesByGroup(d, "g", "v",
      Seq(("p50", 0.5), ("p90", 0.9)))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("p50"), r.getAs[Long]("p90"))).toMap
    exact.keySet.foreach { g =>
      // the sketch returns an element of the data within ±1 of the exact
      // nearest-rank order statistic (float rank rounding can shift one rank)
      assert(math.abs(exact(g)._1 - approx(g)._1) <= 1L, s"$g p50")
      assert(math.abs(exact(g)._2 - approx(g)._2) <= 1L, s"$g p90")
    }
  }

  test("containmentJoin: full inclusion scores 1 where Jaccard would vanish") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (2L, "completely different words with nothing shared here at all")
    ).toDF("doc_id", "text")
    val quotes = Seq((100L, "d e f g h")).toDF("doc_id", "text") // ⊂ doc 1
    val out = TextDedup.containmentJoin(quotes, corpus, "doc_id", "text",
        n = 3, minNum = 4, minDen = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("q_id") == 100L && r.getAs[Long]("d_id") == 1L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the symmetric score for the same true inclusion: 3 shared shingles
    // over 24 in the union ⇒ 0.125 — below any useful Jaccard threshold
    assert(r.getAs[Long]("q_size") == 3L)
  }
}
