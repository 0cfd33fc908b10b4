package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over a text corpus (extension scope): word-n-gram
  * shingling, exact Jaccard, MinHash signatures, and LSH banding for
  * sub-quadratic candidate generation.
  *
  * Design for 100 TB: the quadratic shingle self-join ([[jaccardPairs]]) is
  * the oracle-checkable baseline; the production path is
  * [[minhashNearDupes]] — signatures shrink each document to k hashes, band
  * buckets bound the join fan-out, and the exact Jaccard verify runs only on
  * candidate pairs.
  *
  * MinHash uses a universal hash family over a single md5-derived base hash
  * per shingle: h(s) = first 28 bits of md5(s), then h_i(s) = (a_i·h + b_i)
  * mod (2^61-1). md5 is deliberately chosen over the faster xxhash64 because
  * it is bit-identical in ANSI SQL engines, making the whole pipeline
  * oracle-checkable — and only ONE md5 is computed per shingle regardless of
  * k. Swap [[shingleBaseHash]] for `xxhash64`-based hashing when oracle
  * parity is not needed.
  */
object TextDedup {

  /** Distinct word n-gram shingles, one row per (id, shingle). Documents with
    * fewer than n tokens produce no rows (mirrors the SQL `len(w) >= n`
    * guard; also keeps `sequence()` bounds valid under ANSI).
    */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    // the explode + hashing downstream is CPU-bound and narrow; spread a
    // LOW-parallelism input (the single-file harness parquet) across the
    // cluster first. An input that already has enough partitions must pass
    // through untouched — [[Decontamination]]'s contract is that the corpus
    // side never shuffles, and at 100 TB the corpus scan is always parallel.
    val want = df.sparkSession.sparkContext.defaultParallelism
    val base =
      if (df.rdd.getNumPartitions >= want) df
      else df.repartition(want, col(idCol))
    base
      .select(col(idCol).as("id"), words.as("w"))
      .filter(size(col("w")) >= n)
      .select(col("id"), explode(
        transform(
          sequence(lit(1), size(col("w")) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("w"), i + lit(j))): _*))
      ).as("s"))
      .distinct()
  }

  /** Exact all-pairs Jaccard over shared shingles (quadratic baseline).
    * Returns (a_id, b_id, jaccard) for pairs with jaccard >= minJaccard.
    */
  def jaccardPairs(sh0: DataFrame, minJaccard: Double): DataFrame = {
    // consumed three times (self-join ×2 + counts) — compute the shingle set once
    val sh = sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.select(col("id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(counts.select(col("id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
  }

  /** Modulus of the universal hash family: 2^31 - 1 (Mersenne prime).
    *
    * The modulus must sit BELOW max(a)·max(h) ≈ 2^59 so `(a·h + b) mod p`
    * actually wraps: with a larger prime (2^61-1 was round 1's choice) the
    * mod is a no-op, every `h_i` becomes an order-preserving affine map, all
    * k "permutations" pick the same argmin shingle, and the whole signature
    * degenerates to one permutation's worth of information — caught by the
    * recall spec when a j=0.9 pair shared zero signature slots. With p=2^31-1
    * the map wraps ~2^28 times, giving genuinely rank-shuffling universal
    * hashes, while `a·h + b < 2^59` keeps the arithmetic exact int64 in any
    * ANSI SQL engine.
    */
  val MinhashP: Long = 2147483647L

  /** Deterministic per-permutation multipliers/offsets. `a`,`b` < 2^31 and the
    * base hash < 2^28, so `a*h + b` stays well inside signed 64-bit — the
    * arithmetic is exact (and identical) in any ANSI SQL engine.
    */
  final case class HashParam(a: Long, b: Long)
  def hashParams(k: Int): Seq[HashParam] = (0 until k).map { i =>
    val a = ((1103515245L * (i + 1) + 12345L) % 2147483647L) | 1L
    val b = (2654435761L * (i + 7)) % 2147483647L
    HashParam(a, b)
  }

  /** Base shingle hash: first 7 hex digits of md5 → 28-bit int. ONE md5 per
    * shingle row regardless of k — the k permutations are pure integer
    * arithmetic on top (classic universal hashing), an 8× hash-work reduction
    * vs hashing per permutation. Mirrorable in the DuckDB oracle as
    * `('0x' || substr(md5(s),1,7))::BIGINT`.
    */
  def shingleBaseHash(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** MinHash signature: k independent min-hashes per document, columns
    * m0..m{k-1}.
    */
  def minhashSignature(sh: DataFrame, k: Int): DataFrame = {
    val h = shingleBaseHash(col("s"))
    val aggs = hashParams(k).zipWithIndex.map { case (p, i) =>
      min((lit(p.a) * h + lit(p.b)) % lit(MinhashP)).as(s"m$i")
    }
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: concatenate r=k/bands consecutive minhashes per band; docs
    * sharing any band bucket become candidates. Returns distinct
    * (a_id, b_id) with a_id < b_id.
    *
    * The band dimension is EXPLODED into rows so one self-join on
    * (band_index, band_value) covers all bands — one shuffle instead of one
    * join per band, and the prefixed band index keeps buckets from different
    * bands from colliding.
    */
  def lshCandidates(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val bandCols = (0 until bands).map(b =>
      concat_ws("_", lit(b) +: (b * r until (b + 1) * r).map(i => col(s"m$i")): _*))
    val exploded = sig.select(col("id"), explode(array(bandCols: _*)).as("bv"))
    exploded.as("x").join(exploded.as("y"),
        col("x.bv") === col("y.bv") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
  }

  /** Full near-dup pipeline: shingle → sign → band → candidate pairs → exact
    * Jaccard verify restricted to candidates.
    */
  def minhashNearDupes(df: DataFrame, idCol: String, textCol: String,
                       n: Int, k: Int, bands: Int, minJaccard: Double): DataFrame = {
    // the shingle set feeds three consumers (signature, candidate verify ×2) —
    // persist it so the explode+distinct shuffle runs once
    val sh = wordShingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // signature is tiny (one row per doc) but feeds both sides of the
    // candidate self-join — persist it so the 8-agg groupBy runs once
    val sig = minhashSignature(sh, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidates(sig, k, bands)
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = cand
      .join(sh.as("sa"), col("sa.id") === col("a_id"))
      .join(sh.as("sb"), col("sb.id") === col("b_id") && col("sa.s") === col("sb.s"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("common"))
    common
      .join(counts.select(col("id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(counts.select(col("id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
  }

  /** Incremental near-dup: flag INCOMING documents that near-duplicate the
    * EXISTING corpus — the continuous-crawl ingestion shape, where each new
    * batch is deduped against everything already accepted rather than
    * re-running the self-join over the whole corpus. Returns
    * (in_id, ex_id, jaccard); intra-batch pairs are deliberately NOT
    * produced (run [[minhashNearDupes]] on the batch for those).
    *
    * Scale shape: the batch is tiny relative to the corpus, so the batch's
    * band rows BROADCAST onto the existing band-bucket table — the corpus
    * side never shuffles for candidate generation, and at rest the
    * existing signatures/band buckets are computed once per doc at accept
    * time and stored, not recomputed per batch (here both are derived from
    * the input frames; persist/extract `minhashSignature` to materialize).
    */
  def minhashNearDupesAgainst(existing: DataFrame, incoming: DataFrame,
                              idCol: String, textCol: String,
                              n: Int, k: Int, bands: Int,
                              minJaccard: Double): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shEx = wordShingles(existing, idCol, textCol, n).persist(mem)
    val shIn = wordShingles(incoming, idCol, textCol, n).persist(mem)
    val r = k / bands
    def bandRows(sig: DataFrame): DataFrame = {
      val bandCols = (0 until bands).map(b =>
        concat_ws("_", lit(b) +: (b * r until (b + 1) * r).map(i => col(s"m$i")): _*))
      sig.select(col("id"), explode(array(bandCols: _*)).as("bv"))
    }
    val cand = bandRows(minhashSignature(shEx, k)).as("y")
      .join(broadcast(bandRows(minhashSignature(shIn, k)).as("x")),
        col("x.bv") === col("y.bv"))
      .select(col("x.id").as("in_id"), col("y.id").as("ex_id"))
      .distinct()
    val common = cand
      .join(shIn.as("sa"), col("sa.id") === col("in_id"))
      .join(shEx.as("sb"), col("sb.id") === col("ex_id") && col("sa.s") === col("sb.s"))
      .groupBy("in_id", "ex_id")
      .agg(count(lit(1)).as("common"))
    common
      .join(shIn.groupBy("id").agg(count(lit(1)).as("na"))
        .select(col("id").as("in_id"), col("na")), "in_id")
      .join(shEx.groupBy("id").agg(count(lit(1)).as("nb"))
        .select(col("id").as("ex_id"), col("nb")), "ex_id")
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("in_id", "ex_id", "jaccard")
  }

  /** SimHash (Charikar): per-token hash, per-bit ±1 vote weighted by token
    * frequency, sign → bit. The base hash is the same md5-derived 28-bit
    * integer as MinHash ([[shingleBaseHash]]) so the whole fingerprint is
    * bit-replicable in ANSI SQL engines and oracle-checkable; pass
    * `baseHash = xxhash64(_)` (and nBits ≤ 64) to trade oracle parity for a
    * faster Spark-native hash.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, nBits: Int = 16,
              baseHash: Column => Column = shingleBaseHash): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("t"))
      .withColumn("h", baseHash(col("t")))
    val votes = (0 until nBits).map(p =>
      sum(when((shiftright(col("h"), p).bitwiseAND(1)) === 1, 1).otherwise(-1)).as(s"v$p"))
    tok.groupBy("id")
      .agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until nBits).map(p =>
          when(col(s"v$p") > 0, lit(1L << p)).otherwise(lit(0L))
        ).reduce(_ + _).as("simhash"))
  }
}
