package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index search over a document corpus (extension scope): the
  * posting-list relation `(term, doc_id, tf)` and conjunctive queries over
  * it — the retrieval primitive behind corpus exploration and
  * training-data audits ("every document mentioning all of X, Y, Z").
  *
  * Scale shape: the posting build is one narrow explode + one aggregation
  * (map-side combined); at 100 TB the postings are materialized ONCE,
  * bucketed/partitioned BY TERM, so a query's `term IN (...)` prunes to the
  * query terms' partitions before anything is listed or scanned — the
  * manifest/partition layer does what a search engine's dictionary does.
  * Queries then shuffle only the matching postings (|docs containing a
  * query term|, not |corpus|), and the conjunctive AND is a count-match
  * aggregate, never a self-join chain (k-way intersection as one groupBy —
  * associative, skew-tolerant, k-independent).
  */
object InvertedIndex {

  /** The posting-list relation: one row per (term, doc) with the term
    * frequency. Whitespace tokenization to match the corpus conventions.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Documents containing ALL `terms`, scored by summed term frequency —
    * `(doc_id, score)`. The filter pushes to the posting scan; the AND is
    * `count(DISTINCT matched term) = |terms|` in one aggregate.
    */
  def conjunctiveSearch(postings: DataFrame, terms: Seq[String]): DataFrame =
    postings.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("__n"), sum(col("tf")).as("score"))
      .filter(col("__n") === terms.length)
      .select(col("doc_id"), col("score"))
}
