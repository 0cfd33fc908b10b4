package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact substring-level dedup (Lee et al. 2022 ExactSubstr at word
  * granularity): the span matcher must catch SHIFTED copies that
  * fixed-boundary chunking structurally misses, emit maximal disjoint
  * spans with exact boundaries, and the strip twin must remove exactly
  * the duplicated positions.
  */
class ExactSubstringSpec extends SparkSpec {
  import spark.implicits._

  // a 60-token run duplicated across two docs at DIFFERENT offsets (8 vs
  // 4, relative shift 4 — not a multiple of the chunk width), unique
  // filler everywhere else
  private val run = (1 to 60).map(i => s"r$i").mkString(" ")
  private val docA = ((1 to 7).map(i => s"a$i") :+ run).mkString(" ") +
    " a8 a9 a10"
  private val docB = ((1 to 3).map(i => s"b$i") :+ run).mkString(" ") +
    " " + (4 to 40).map(i => s"b$i").mkString(" ")

  test("a shifted 60-token duplicate: fixed chunking (q101) misses it, exactSubstringSpans catches it") {
    val df = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    // q101's operator: 10-word fixed chunks — the shift misaligns every
    // chunk, so NOTHING is flagged as duplicated
    val chunks = TextDedup.dropDuplicatedChunks(df, "doc_id", "text")
      .select("id", "n_chunks", "n_kept").as[(Long, Long, Long)].collect()
    chunks.foreach { case (_, n, kept) => assert(kept == n,
      "fixed chunking should miss the shifted duplicate entirely") }
    // the exact matcher finds the maximal span — exact boundaries, both docs
    val spans = TextDedup.exactSubstringSpans(df, "doc_id", "text",
      minTokens = 50)
      .select("id", "span_start", "span_end", "span_tokens", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(spans.toSeq == Seq(
      (1L, 8L, 68L, 60L, 11L), // run at positions 8..67 in doc A
      (2L, 4L, 64L, 60L, 11L))) // run at positions 4..63 in doc B
  }

  test("two separate duplicated regions stay two maximal disjoint spans") {
    val r2 = (1 to 55).map(i => s"s$i").mkString(" ")
    val d1 = run + " " + (1 to 20).map(i => s"x$i").mkString(" ") + " " + r2
    val d2 = run + " " + (1 to 20).map(i => s"y$i").mkString(" ") + " " + r2
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val spans = TextDedup.exactSubstringSpans(df, "doc_id", "text",
      minTokens = 50)
      .select("id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect()
    // per doc: [1, 61) for the 60-run and [81, 136) for the 55-run
    assert(spans.toSet == Set(
      (1L, 1L, 61L, 60L), (1L, 81L, 136L, 55L),
      (2L, 1L, 61L, 60L), (2L, 81L, 136L, 55L)))
    // disjoint + each >= minTokens
    spans.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(p._3 <= n._2, "spans overlap")
        case _ =>
      }
      ss.foreach(s => assert(s._4 >= 50))
    }
  }

  test("incremental against-corpus spans equal the full-union run restricted to incoming ids") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.load(spark, dir, "documents")
    val existing = d.filter(col("doc_id") % 3 =!= 0)
    val incoming = d.filter(col("doc_id") % 3 === 0)
    val incremental = TextDedup.exactSubstringSpansAgainst(
      existing, incoming, "doc_id", "text", minTokens = 30)
    val full = TextDedup.exactSubstringSpans(d, "doc_id", "text",
      minTokens = 30).filter(col("id") % 3 === 0)
    assertSameRows(incremental, full)
    assert(incremental.count() > 0) // the fixture plants >=30-token dups
    // batch-internal duplicates (absent from existing) must also be caught
    val run = (1 to 40).map(i => s"z$i").mkString(" ")
    val ex = Seq((7L, (1 to 60).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val in2 = Seq((3L, run + " a1 a2"), (6L, "b1 b2 " + run))
      .toDF("doc_id", "text")
    val got = TextDedup.exactSubstringSpansAgainst(ex, in2, "doc_id", "text",
      minTokens = 40)
      .select("id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((3L, 1L, 41L), (6L, 3L, 43L)))
  }

  test("stripDuplicateSpans removes exactly the duplicated positions, reassembles in order") {
    val df = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val got = TextDedup.stripDuplicateSpans(df, "doc_id", "text",
      minTokens = 50)
      .select("id", "n_tokens", "removed_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val (a, b) = (got(0), got(1))
    assert(a == ((1L, 70L, 60L, (1 to 10).map(i => s"a$i").mkString(" "))))
    assert(b._2 == 40L + 60L && b._3 == 60L)
    assert(b._4 == (1 to 40).map(i => s"b$i").mkString(" "))
    // clean corpus is duplicate-free at this granularity by construction
    val clean = TextDedup.stripDuplicateSpans(df, "doc_id", "text", 50)
      .select(col("id").as("doc_id"), col("clean_text").as("text"))
    assert(TextDedup.exactSubstringSpans(clean, "doc_id", "text", 50)
      .count() == 0)
  }

  test("line-level dedup drops a short boilerplate line the substring matcher cannot see") {
    // a 5-token nav-bar line repeated across docs: far below the 50-token
    // substring floor (q235 sees nothing), but exactly what CCNet's
    // line-level census exists to kill
    val header = "Subscribe To Our Newsletter Today"
    val d1 = header + "\n" + (1 to 60).map(i => s"alpha$i").mkString(" ")
    // the twin carries the header lower-cased with trailing punctuation —
    // normalization (lower + trim) must still census them together
    val d2 = (1 to 60).map(i => s"beta$i").mkString(" ") + "\n" +
      "  subscribe to our newsletter today  "
    val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    assert(TextDedup.exactSubstringSpans(df, "doc_id", "text", 50)
      .count() == 0, "substring matcher should be blind at this granularity")
    val got = TextDedup.dropDuplicatedLines(df, "doc_id", "text")
      .select("id", "n_lines", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 1L, (1 to 60).map(i => s"alpha$i").mkString(" "))))
    assert(got(1) == ((2L, 2L, 1L, (1 to 60).map(i => s"beta$i").mkString(" "))))
  }

  test("line-level dedup: blank lines are structure, never censused, always kept") {
    val df = Seq(
      (1L, "unique one\n\nshared line here"),
      (2L, "unique two\n\nshared line here")).toDF("doc_id", "text")
    val got = TextDedup.dropDuplicatedLines(df, "doc_id", "text")
      .select("id", "n_lines", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // the empty middle line repeats corpus-wide but must survive; only
    // the shared content line dies
    assert(got(0) == ((1L, 3L, 2L, "unique one\n")))
    assert(got(1) == ((2L, 3L, 2L, "unique two\n")))
  }

  test("incremental line dedup equals the union form restricted to incoming ids") {
    val shared = "this exact banner repeats everywhere"
    val existing = Seq(
      (1L, shared + "\nexisting body one"),
      (2L, shared + "\nexisting body two"),          // banner dup in existing
      (3L, "an existing-only repeated line\nfiller")).toDF("doc_id", "text")
    val incoming = Seq(
      // banner already ≥2 in existing: dies on existing counts alone
      (10L, shared + "\nfresh body ten"),
      // crosses the threshold only via existing(1) + batch(1)
      (11L, "an existing-only repeated line\nfresh body eleven"),
      // within-batch duplicate pair: dies on batch counts alone
      (12L, "batch twin line\nfresh body twelve"),
      (13L, "batch twin line\nfresh body thirteen")).toDF("doc_id", "text")
    val got = TextDedup.dropDuplicatedLinesAgainst(
      existing, incoming, "doc_id", "text")
    val expect = TextDedup.dropDuplicatedLines(
      existing.unionByName(incoming), "doc_id", "text")
      .filter(col("id") >= 10L)
    assertSameRows(got, expect)
    // and each incoming doc kept exactly its unique body line
    val m = got.select("id", "clean_text").as[(Long, String)].collect().toMap
    assert(m == Map(10L -> "fresh body ten", 11L -> "fresh body eleven",
      12L -> "fresh body twelve", 13L -> "fresh body thirteen"))
  }

  test("paragraph mode: a multi-line paragraph dedups as ONE unit") {
    // the shared two-line paragraph repeats across docs; in line mode its
    // two lines die separately, in paragraph mode ("\n\n+") the whole
    // block is one census unit and the docs' unique paragraphs survive
    val para = "shared first line\nshared second line"
    val df = Seq(
      (1L, "unique alpha\n\n" + para),
      (2L, para + "\n\nunique beta")).toDF("doc_id", "text")
    val got = TextDedup.dropDuplicatedLines(df, "doc_id", "text",
      minCount = 2, unitPattern = "\n\n+")
      .select("id", "n_lines", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 1L, "unique alpha")))
    assert(got(1) == ((2L, 2L, 1L, "unique beta")))
  }
}
