package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (extension scope): flag
  * corpus documents that share word-n-gram content with an evaluation /
  * benchmark set, the standard "n-gram overlap" decontamination used for LLM
  * training data (GPT-3 appendix C / PaLM-style 8-13-gram overlap; here the
  * n is a parameter).
  *
  * Distributed shape, designed for the 100 TB corpus case:
  *   - both sides reduce to DISTINCT (id, shingle) rows
  *     ([[TextDedup.wordShingles]] — explode + distinct, partial-aggregated);
  *   - the benchmark side is tiny relative to the corpus (eval suites are
  *     thousands of documents, the corpus is billions), so the shingle join
  *     broadcasts the benchmark shingle set — the corpus never shuffles;
  *   - the per-document hit aggregation partial-combines map-side, keyed on
  *     the corpus document id.
  *
  * Contamination is an n-gram OVERLAP COUNT, not a similarity score: a
  * single shared n-gram marks the document (threshold configurable by
  * filtering on `n_shared_ngrams`).
  */
object Decontamination {

  /** Corpus documents sharing at least one word-n-gram with the benchmark
    * set. Returns one row per contaminated corpus document:
    * (id, n_shared_ngrams = distinct shared shingles,
    * n_bench_docs = distinct benchmark documents hit).
    */
  def contaminatedDocs(corpus: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusSh = TextDedup.wordShingles(corpus, idCol, textCol, n)
    val benchSh = TextDedup.wordShingles(bench, idCol, textCol, n)
      .select(col("id").as("bench_id"), col("s"))
    corpusSh
      .join(broadcast(benchSh), "s")
      .groupBy(col("id"))
      .agg(countDistinct(col("s")).as("n_shared_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}
