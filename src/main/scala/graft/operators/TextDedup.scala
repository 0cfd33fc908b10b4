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
  * MinHash here uses md5 hex strings as the hash family (`min` over the
  * fixed-width hex encoding ≡ min over the 128-bit value), seeded per
  * permutation by prefixing `"i:"`. md5 is deliberately chosen over the faster
  * xxhash64 because it is bit-identical in ANSI SQL engines, making the whole
  * pipeline oracle-checkable; swap [[shingleHash]] for `xxhash64` when oracle
  * parity is not needed.
  */
object TextDedup {

  /** Distinct word n-gram shingles, one row per (id, shingle). Documents with
    * fewer than n tokens produce no rows (mirrors the SQL `len(w) >= n`
    * guard; also keeps `sequence()` bounds valid under ANSI).
    */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    df.select(col(idCol).as("id"), words.as("w"))
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
  def jaccardPairs(sh: DataFrame, minJaccard: Double): DataFrame = {
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

  def shingleHash(seed: Int): Column => Column =
    s => md5(concat(lit(s"$seed:"), s))

  /** MinHash signature: k independent min-hashes per document, columns
    * m0..m{k-1}.
    */
  def minhashSignature(sh: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(i => min(shingleHash(i)(col("s"))).as(s"m$i"))
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: concatenate r=k/bands consecutive minhashes per band and
    * hash; docs sharing any band bucket become candidates. Returns distinct
    * (a_id, b_id) with a_id < b_id.
    */
  def lshCandidates(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val banded = sig.select(col("id") +:
      (0 until bands).map(b =>
        md5(concat((b * r until (b + 1) * r).map(i => col(s"m$i")): _*)).as(s"b$b")): _*)
    (0 until bands).map { b =>
      banded.as("x").join(banded.as("y"),
          col(s"x.b$b") === col(s"y.b$b") && col("x.id") < col("y.id"))
        .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
    }.reduce(_ unionByName _).distinct()
  }

  /** Full near-dup pipeline: shingle → sign → band → candidate pairs → exact
    * Jaccard verify restricted to candidates.
    */
  def minhashNearDupes(df: DataFrame, idCol: String, textCol: String,
                       n: Int, k: Int, bands: Int, minJaccard: Double): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, n)
    val cand = lshCandidates(minhashSignature(sh, k), k, bands)
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

  /** SimHash (Charikar): per-token 64-bit hash, per-bit ±1 vote weighted by
    * token frequency, sign → bit. Implemented over `nBits` low bits of
    * xxhash64 — a Spark-native hash, fast but not oracle-replicable (the
    * harness records a rows-only check for this one).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, nBits: Int = 16): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("t"))
      .withColumn("h", xxhash64(col("t")))
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
