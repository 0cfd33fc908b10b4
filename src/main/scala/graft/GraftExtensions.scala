package graft

import graft.functions.CosineSimilarity
import graft.sources.TxLog
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session extension surface: makes the engine's custom Catalyst expressions
  * callable from SQL. Two entry points:
  *
  *   - configure at launch: `--conf spark.sql.extensions=graft.GraftExtensions`
  *   - or register into a live session: `GraftExtensions.register(spark)`
  *
  * After either, `spark.sql("SELECT cosine_similarity(a, b) ...")` plans the
  * codegen'd [[CosineSimilarity]] expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineEntry)
    e.injectFunction(GraftExtensions.zvalueEntry)
    e.injectFunction(GraftExtensions.normalizeEntry)
    e.injectTableFunction(GraftExtensions.tableEntry)
    e.injectTableFunction(GraftExtensions.tableAtEntry)
    e.injectTableFunction(GraftExtensions.tableChangesEntry)
    e.injectTableFunction(GraftExtensions.tableKeyEntry)
    e.injectTableFunction(GraftExtensions.tableRangeEntry)
    e.injectTableFunction(GraftExtensions.minhashPairsEntry)
    e.injectTableFunction(GraftExtensions.knnEntry)
    e.injectTableFunction(GraftExtensions.bm25TopKEntry)
    e.injectTableFunction(GraftExtensions.dupSpansEntry)
    e.injectTableFunction(GraftExtensions.dropDupLinesEntry)
    e.injectTableFunction(GraftExtensions.dsirSelectEntry)
    e.injectTableFunction(GraftExtensions.langIdEntry)
    e.injectTableFunction(GraftExtensions.rocAucEntry)
  }
}

object GraftExtensions {
  private def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) {
      // surface the same error class built-in functions raise, with SQL
      // error-class metadata, instead of a bare runtime exception
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`cosine_similarity`",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    CosineSimilarity(exprs.head, exprs(1))
  }

  private val cosineEntry = (
    new FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (exprs: Seq[Expression]) => build(exprs))

  /** `graft_zvalue(x, y, bits)` — the Morton interleave as a SQL function.
    * `bits` must be a foldable integer literal (it shapes the expression
    * tree, exactly like the window-frame sizes built-ins take literally).
    */
  private def buildZ(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.GraftColumnBridge
    if (exprs.length != 3) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_zvalue`",
          "expectedNum" -> "3",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    val bits = exprs(2) match {
      case e if e.foldable && e.eval() != null =>
        e.eval().toString.toInt
      case _ => invalidParam("graft_zvalue", "bits",
        s"must be a foldable non-null integer literal, got ${exprs(2).sql}")
    }
    // built from raw Catalyst nodes (not the Column API): a function builder
    // must return a tree the analyzer can resolve in place — Column-built
    // trees arrive as unresolvable ColumnNode wrappers here
    import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Literal, ShiftLeft, ShiftRight}
    import org.apache.spark.sql.types.LongType
    val xs = Cast(exprs.head, LongType)
    val ys = Cast(exprs(1), LongType)
    (0 until bits).map { b =>
      val xb = ShiftLeft(BitwiseAnd(ShiftRight(xs, Literal(b)), Literal(1L)), Literal(2 * b))
      val yb = ShiftLeft(BitwiseAnd(ShiftRight(ys, Literal(b)), Literal(1L)), Literal(2 * b + 1))
      Add(xb, yb)
    }.reduce[Expression]((a, b) => Add(a, b))
  }

  private val zvalueEntry = (
    new FunctionIdentifier("graft_zvalue"),
    new ExpressionInfo(graft.functions.ZOrder.getClass.getName, "graft_zvalue"),
    (exprs: Seq[Expression]) => buildZ(exprs))

  /** `graft_normalize_text(s)` — NFC + casefold + diacritic strip
    * ([[graft.functions.NormalizeText]]). */
  private def buildNormalize(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) wrongArgs("graft_normalize_text", "1", exprs.length)
    graft.functions.NormalizeText(exprs.head)
  }

  private val normalizeEntry = (
    new FunctionIdentifier("graft_normalize_text"),
    new ExpressionInfo(classOf[graft.functions.NormalizeText].getName,
      "graft_normalize_text"),
    (exprs: Seq[Expression]) => buildNormalize(exprs))

  // ------------------------------------------------- table-valued functions
  //
  // The TxLog table format's SQL surface (Delta's `delta.`/`table_changes`
  // equivalents, expressed through the public `injectTableFunction` hook):
  //
  //   graft_table('/path')              — current snapshot (DVs applied)
  //   graft_table('/path', 3)           — time travel by version
  //   graft_table_at('/path', epochMs)  — time travel by commit timestamp
  //   graft_table_changes('/path', from[, to]) — row-level CDF, rows tagged
  //                                       change ∈ {insert, delete}
  //   graft_table_key('/path', 'col', v) — manifest-pruned point read: only
  //                                       files whose partition path (or
  //                                       pre-partition era) can hold the
  //                                       key reach the reader
  //   graft_table_range('/path', 'col', lo, hi) — per-file min/max stats
  //                                       skipping + inclusive residual;
  //                                       string bounds take the lexical
  //                                       (ISO-date) route
  //
  // Each builder resolves its literal arguments at analysis time and splices
  // in the ANALYZED plan of the corresponding [[graft.sources.TxLog]] read —
  // the same substitution view resolution performs. Because the spliced plan
  // is an ordinary parquet relation (plus the deletion-vector anti-join),
  // Catalyst's filter pushdown, column pruning and manifest-driven file
  // pruning all survive the SQL route: `SELECT k FROM graft_table(p) WHERE
  // k < 10` reads pruned parquet with PushedFilters, not a materialized
  // table. Cf. reference warehouse tables queried by the dbt models
  // (`dbt/models/staging/*.sql`) — this is the engine-side catalog binding.

  private def foldArg(fn: String, e: Expression): Any = {
    if (!e.foldable || e.eval() == null) {
      invalidParam(fn, "argument",
        s"must be a foldable non-null literal, got ${e.sql}")
    }
    e.eval()
  }
  private def argString(fn: String, e: Expression): String =
    foldArg(fn, e).toString
  private def argLong(fn: String, e: Expression): Long =
    foldArg(fn, e) match {
      case n: java.lang.Number => n.longValue()
      case other => other.toString.toLong
    }

  private def wrongArgs(fn: String, expected: String, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$fn`",
        "expectedNum" -> expected,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Wrong-VALUE argument errors (vs wrong-COUNT above): renders as "The
    * value of parameter(s) `param` in `fn` is invalid: reason." — the
    * generic invalid-parameter condition, so a bad literal never surfaces
    * as an unrelated 'seed expression' diagnostic.
    */
  private def invalidParam(fn: String, param: String, reason: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
      messageParameters = Map(
        "parameter" -> s"`$param`",
        "functionName" -> s"`$fn`",
        "value" -> reason))

  private def buildTable(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.isEmpty || exprs.length > 2) wrongArgs("graft_table", "[1, 2]", exprs.length)
    val path = argString("graft_table", exprs.head)
    val version = if (exprs.length == 2) argLong("graft_table", exprs(1)) else -1L
    GraftColumnBridge.analyzedPlan(TxLog.read(SparkSession.active, path, version))
  }

  private def buildTableAt(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 2) wrongArgs("graft_table_at", "2", exprs.length)
    val fn = "graft_table_at"
    val path = argString(fn, exprs.head)
    val tsMs = argLong(fn, exprs(1))
    val spark = SparkSession.active
    val v = TxLog.versionAsOf(spark, path, tsMs).getOrElse {
      throw new IllegalArgumentException(
        s"graft_table_at: no commit at or before timestamp $tsMs ms on $path")
    }
    GraftColumnBridge.analyzedPlan(TxLog.read(spark, path, v))
  }

  private def buildTableChanges(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length < 2 || exprs.length > 3) wrongArgs("graft_table_changes", "[2, 3]", exprs.length)
    val fn = "graft_table_changes"
    val path = argString(fn, exprs.head)
    val from = argLong(fn, exprs(1))
    val to = if (exprs.length == 3) argLong(fn, exprs(2)) else -1L
    GraftColumnBridge.analyzedPlan(
      TxLog.rowChanges(SparkSession.active, path, from, to))
  }

  private def buildTableKey(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 3) wrongArgs("graft_table_key", "3", exprs.length)
    val fn = "graft_table_key"
    val path = argString(fn, exprs.head)
    val keyCol = argString(fn, exprs(1))
    val value = foldArg(fn, exprs(2))
    GraftColumnBridge.analyzedPlan(
      TxLog.readKey(SparkSession.active, path, keyCol, value))
  }

  private def buildTableRange(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 4) wrongArgs("graft_table_range", "4", exprs.length)
    val fn = "graft_table_range"
    val path = argString(fn, exprs.head)
    val rangeCol = argString(fn, exprs(1))
    val spark = SparkSession.active
    (foldArg(fn, exprs(2)), foldArg(fn, exprs(3))) match {
      // string bounds route to the lexical twin (ISO dates, padded ids)
      case (lo: org.apache.spark.unsafe.types.UTF8String,
            hi: org.apache.spark.unsafe.types.UTF8String) =>
        GraftColumnBridge.analyzedPlan(
          TxLog.readRangeString(spark, path, rangeCol, lo.toString, hi.toString))
      case (lo, hi) =>
        GraftColumnBridge.analyzedPlan(
          TxLog.readRange(spark, path, rangeCol,
            BigDecimal(lo.toString), BigDecimal(hi.toString)))
    }
  }

  // --------------------------------- operator TVFs (dedup / similarity)
  //
  // The reference's users speak SQL (dbt models); the dedup/similarity
  // operators get the same treatment as the tx-log reads — a table-valued
  // function that resolves its literal arguments at analysis time, runs
  // the EXISTING operator against a catalog-resolved table, and splices in
  // the analyzed plan. Nothing is reimplemented: the SQL route and the
  // DataFrame route share one physical plan (hash-equal, spec'd + oracle'd).
  //
  //   graft_minhash_pairs(tbl, idCol, textCol, n, k, bands, minJaccard)
  //       — MinHash-LSH near-dup pairs (TextDedup.minhashNearDupes)
  //   graft_knn(tbl, idCol, vecCol, queryId, k)
  //       — brute-force cosine top-k (Similarity.bruteForceTopK)
  //   graft_bm25_topk(tbl, idCol, textCol, 'space separated query', k)
  //       — BM25 retrieval over postings built from the table, top-k with
  //         deterministic id tie-break (InvertedIndex.postings + bm25Search)
  //   graft_dup_spans(tbl, idCol, textCol, minTokens)
  //       — exact substring duplicate spans (TextDedup.exactSubstringSpans)
  //   graft_dsir_select(rawTbl, targetTbl, idCol, textCol, nBuckets, k)
  //       — DSIR importance resampling (LanguageModel.dsirSelect)
  //   graft_roc_auc(tbl, groupCol, labelCol, scoreCol)
  //       — per-group Mann-Whitney ROC-AUC (Evaluation.rocAuc)

  private def argInt(fn: String, e: Expression): Int =
    argLong(fn, e).toInt
  private def argDouble(fn: String, e: Expression): Double =
    foldArg(fn, e) match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => other.toString.toDouble
    }

  private def buildMinhashPairs(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 7) wrongArgs("graft_minhash_pairs", "7", exprs.length)
    val fn = "graft_minhash_pairs"
    val df = SparkSession.active.table(argString(fn, exprs.head))
    GraftColumnBridge.analyzedPlan(graft.operators.TextDedup.minhashNearDupes(
      df, argString(fn, exprs(1)), argString(fn, exprs(2)),
      n = argInt(fn, exprs(3)), k = argInt(fn, exprs(4)),
      bands = argInt(fn, exprs(5)), minJaccard = argDouble(fn, exprs(6))))
  }

  private def buildKnn(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 5) wrongArgs("graft_knn", "5", exprs.length)
    val fn = "graft_knn"
    GraftColumnBridge.analyzedPlan(graft.operators.Similarity.bruteForceTopK(
      SparkSession.active.table(argString(fn, exprs.head)),
      argString(fn, exprs(1)), argString(fn, exprs(2)),
      argLong(fn, exprs(3)), argInt(fn, exprs(4))))
  }

  private def buildBm25TopK(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 5) wrongArgs("graft_bm25_topk", "5", exprs.length)
    val fn = "graft_bm25_topk"
    import org.apache.spark.sql.functions.col
    val docsDf = SparkSession.active.table(argString(fn, exprs.head))
    val terms = argString(fn, exprs(3)).split(' ').toSeq.filter(_.nonEmpty)
    if (terms.isEmpty) {
      invalidParam(fn, "query",
        "the query string must contain at least one whitespace-delimited term")
    }
    val p = graft.operators.InvertedIndex.postings(docsDf,
      argString(fn, exprs(1)), argString(fn, exprs(2)))
    GraftColumnBridge.analyzedPlan(
      graft.operators.InvertedIndex.bm25Search(p, terms)
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(argInt(fn, exprs(4))))
  }

  private def buildDupSpans(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 4) wrongArgs("graft_dup_spans", "4", exprs.length)
    val fn = "graft_dup_spans"
    GraftColumnBridge.analyzedPlan(
      graft.operators.TextDedup.exactSubstringSpans(
        SparkSession.active.table(argString(fn, exprs.head)),
        argString(fn, exprs(1)), argString(fn, exprs(2)),
        argInt(fn, exprs(3))))
  }

  private def buildDropDupLines(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 4) wrongArgs("graft_drop_dup_lines", "4", exprs.length)
    val fn = "graft_drop_dup_lines"
    GraftColumnBridge.analyzedPlan(
      graft.operators.TextDedup.dropDuplicatedLines(
        SparkSession.active.table(argString(fn, exprs.head)),
        argString(fn, exprs(1)), argString(fn, exprs(2)),
        argInt(fn, exprs(3))))
  }

  private def buildDsirSelect(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 6) wrongArgs("graft_dsir_select", "6", exprs.length)
    val fn = "graft_dsir_select"
    val spark = SparkSession.active
    GraftColumnBridge.analyzedPlan(
      graft.operators.LanguageModel.dsirSelect(
        spark.table(argString(fn, exprs.head)),
        spark.table(argString(fn, exprs(1))),
        argString(fn, exprs(2)), argString(fn, exprs(3)),
        argInt(fn, exprs(4)), argInt(fn, exprs(5))))
  }

  private val dsirSelectEntry = (
    new FunctionIdentifier("graft_dsir_select"),
    new ExpressionInfo(graft.operators.LanguageModel.getClass.getName,
      "graft_dsir_select"),
    (exprs: Seq[Expression]) => buildDsirSelect(exprs))

  /** `graft_langid(labeledTable, docsTable, langCol, textCol, idCol,
    * buckets)` — CCNet stage-1 language identification from SQL: trains
    * the [[graft.operators.LangId]] trigram profiles on the labeled
    * catalog table and splices the classify plan over the docs table —
    * one physical plan with the DataFrame route (q255 ≡ q258's engine).
    */
  private def buildLangId(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 6) wrongArgs("graft_langid", "6", exprs.length)
    val fn = "graft_langid"
    val spark = SparkSession.active
    val profiles = graft.operators.LangId.trigramProfiles(
      spark.table(argString(fn, exprs.head)),
      argString(fn, exprs(2)), argString(fn, exprs(3)),
      argInt(fn, exprs(5)))
    GraftColumnBridge.analyzedPlan(graft.operators.LangId.classify(
      spark.table(argString(fn, exprs(1))),
      argString(fn, exprs(4)), argString(fn, exprs(3)),
      profiles, argInt(fn, exprs(5))))
  }

  private def buildRocAuc(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length != 4) wrongArgs("graft_roc_auc", "4", exprs.length)
    val fn = "graft_roc_auc"
    GraftColumnBridge.analyzedPlan(graft.operators.Evaluation.rocAuc(
      SparkSession.active.table(argString(fn, exprs.head)),
      argString(fn, exprs(1)), argString(fn, exprs(2)),
      argString(fn, exprs(3))))
  }

  private val rocAucEntry = (
    new FunctionIdentifier("graft_roc_auc"),
    new ExpressionInfo(graft.operators.Evaluation.getClass.getName,
      "graft_roc_auc"),
    (exprs: Seq[Expression]) => buildRocAuc(exprs))

  private val langIdEntry = (
    new FunctionIdentifier("graft_langid"),
    new ExpressionInfo(graft.operators.LangId.getClass.getName,
      "graft_langid"),
    (exprs: Seq[Expression]) => buildLangId(exprs))

  private val dupSpansEntry = (
    new FunctionIdentifier("graft_dup_spans"),
    new ExpressionInfo(graft.operators.TextDedup.getClass.getName,
      "graft_dup_spans"),
    (exprs: Seq[Expression]) => buildDupSpans(exprs))

  private val dropDupLinesEntry = (
    new FunctionIdentifier("graft_drop_dup_lines"),
    new ExpressionInfo(graft.operators.TextDedup.getClass.getName,
      "graft_drop_dup_lines"),
    (exprs: Seq[Expression]) => buildDropDupLines(exprs))

  private val minhashPairsEntry = (
    new FunctionIdentifier("graft_minhash_pairs"),
    new ExpressionInfo(graft.operators.TextDedup.getClass.getName,
      "graft_minhash_pairs"),
    (exprs: Seq[Expression]) => buildMinhashPairs(exprs))
  private val knnEntry = (
    new FunctionIdentifier("graft_knn"),
    new ExpressionInfo(graft.operators.Similarity.getClass.getName,
      "graft_knn"),
    (exprs: Seq[Expression]) => buildKnn(exprs))
  private val bm25TopKEntry = (
    new FunctionIdentifier("graft_bm25_topk"),
    new ExpressionInfo(graft.operators.InvertedIndex.getClass.getName,
      "graft_bm25_topk"),
    (exprs: Seq[Expression]) => buildBm25TopK(exprs))

  private val tableEntry = (
    new FunctionIdentifier("graft_table"),
    new ExpressionInfo(TxLog.getClass.getName, "graft_table"),
    (exprs: Seq[Expression]) => buildTable(exprs))
  private val tableAtEntry = (
    new FunctionIdentifier("graft_table_at"),
    new ExpressionInfo(TxLog.getClass.getName, "graft_table_at"),
    (exprs: Seq[Expression]) => buildTableAt(exprs))
  private val tableChangesEntry = (
    new FunctionIdentifier("graft_table_changes"),
    new ExpressionInfo(TxLog.getClass.getName, "graft_table_changes"),
    (exprs: Seq[Expression]) => buildTableChanges(exprs))
  private val tableKeyEntry = (
    new FunctionIdentifier("graft_table_key"),
    new ExpressionInfo(TxLog.getClass.getName, "graft_table_key"),
    (exprs: Seq[Expression]) => buildTableKey(exprs))
  private val tableRangeEntry = (
    new FunctionIdentifier("graft_table_range"),
    new ExpressionInfo(TxLog.getClass.getName, "graft_table_range"),
    (exprs: Seq[Expression]) => buildTableRange(exprs))

  /** Runtime registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zvalue", buildZ, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize_text", buildNormalize, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_table", buildTable, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_table_at", buildTableAt, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_table_changes", buildTableChanges, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_table_key", buildTableKey, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_table_range", buildTableRange, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_minhash_pairs", buildMinhashPairs, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_knn", buildKnn, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_bm25_topk", buildBm25TopK, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_dup_spans", buildDupSpans, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_drop_dup_lines", buildDropDupLines, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_dsir_select", buildDsirSelect, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_langid", buildLangId, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_roc_auc", buildRocAuc, "built-in")
  }
}
