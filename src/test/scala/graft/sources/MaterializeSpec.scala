package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: delta-only refresh on
  * append-only growth, honest recompute on removals, exactly-once versioning
  * carried inside the materialization commit.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def batch(ids: Range) =
    ids.map(i => (i.toLong, i.toLong % 3, i.toDouble)).toDF("id", "k", "v")

  private def matRows(matPath: String): Map[Long, (Long, Double)] =
    Materialize.read(spark, matPath).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private def expected(src: String): Map[Long, (Long, Double)] =
    TxLog.read(spark, src).groupBy("k")
      .agg(count(lit(1)).as("c"), sum("v").as("s")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("append-only growth refreshes incrementally and matches full recompute") {
    val src = tmp("matsrc"); val mat = tmp("mat")
    TxLog.append(batch(0 until 90), src, "k")
    val r0 = Materialize.refresh(spark, src, mat, Seq("k"), Seq("v"))
    assert(!r0.incremental) // first build is a full compute
    assert(matRows(mat) == expected(src))

    TxLog.append(batch(90 until 200), src, "k")
    val r1 = Materialize.refresh(spark, src, mat, Seq("k"), Seq("v"))
    assert(r1.incremental, "append-only delta must merge, not recompute")
    assert(matRows(mat) == expected(src))
    assert(Materialize.sourceVersion(spark, mat) == TxLog.currentVersion(spark, src))

    // already current → no-op, still incremental
    val r2 = Materialize.refresh(spark, src, mat, Seq("k"), Seq("v"))
    assert(r2.incremental && r2.srcVersion == r1.srcVersion)
  }

  test("refreshViaCdf stays incremental across replace and DV delete; keys drain") {
    val src = tmp("cdfsrc"); val mat = tmp("cdfmat")
    def up() = Materialize.refreshViaCdf(spark, src, mat, Seq("k"), Seq("v"))
    TxLog.append(batch(0 until 90), src, "k")
    assert(!up().incremental) // first build
    assert(matRows(mat) == expected(src))
    TxLog.append(batch(90 until 150), src, "k")
    assert(up().incremental)
    assert(matRows(mat) == expected(src))
    // key-scoped replace: refresh() would recompute; the CDF path merges
    TxLog.replaceKeys(batch(0 until 150).filter($"k" === 1)
      .withColumn("v", $"v" * 3), src, "k")
    assert(up().incremental)
    assert(matRows(mat) == expected(src))
    // row-level DV delete
    TxLog.deleteWhere(spark, src, "id % 10 = 3")
    assert(up().incremental)
    assert(matRows(mat) == expected(src))
    // drain one key entirely — it must LEAVE the state, not linger at zero
    TxLog.deleteWhere(spark, src, "k = 2")
    assert(up().incremental)
    assert(matRows(mat) == expected(src))
    assert(!matRows(mat).contains(2L))
    // exactly-once: re-refresh is a no-op at the same version
    val again = up()
    assert(again.incremental &&
      again.srcVersion == TxLog.currentVersion(spark, src))
  }

  test("a non-append-only source change (replace) triggers full recompute") {
    val src = tmp("matsrc2"); val mat = tmp("mat2")
    TxLog.append(batch(0 until 100), src, "k")
    Materialize.refresh(spark, src, mat, Seq("k"), Seq("v"))
    // replace partition k=1 with different content — files REMOVED
    TxLog.replaceKeys(
      Seq((1000L, 1L, 5.0), (1001L, 1L, 7.0)).toDF("id", "k", "v"), src, "k")
    val r = Materialize.refresh(spark, src, mat, Seq("k"), Seq("v"))
    assert(!r.incremental, "removed files must force recompute")
    assert(matRows(mat) == expected(src))
  }

  test("refreshJoin: delta-only append on growth; DV delete forces join rebuild") {
    val src = tmp("jvsrc"); val mat = tmp("jv")
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("dk", "name")
    def viewRows() = Materialize.read(spark, mat)
      .select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    def expectedRows() = TxLog.read(spark, src)
      .join(dim, col("k") === col("dk")).select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    def refresh() = Materialize.refreshJoin(spark, src, mat, dim, "k", "dk")

    TxLog.append(batch(0 until 90), src, "k")
    assert(!refresh().incremental) // first build
    assert(viewRows() == expectedRows())

    TxLog.append(batch(90 until 200), src, "k")
    val filesBefore = TxLog.snapshot(spark, mat).files.toSet
    val r1 = refresh()
    assert(r1.incremental, "append-only growth must use the delta rule")
    // delta appended: every pre-existing view file survives untouched
    assert(TxLog.snapshot(spark, mat).files.toSet.subsetOf(filesBefore)
      == false && filesBefore.subsetOf(TxLog.snapshot(spark, mat).files.toSet))
    assert(viewRows() == expectedRows())

    // already current → no-op
    val r2 = refresh()
    assert(r2.incremental && r2.srcVersion == r1.srcVersion)

    // a DV delete on the source voids ΔS⋈D → honest rebuild, still equal
    TxLog.deleteWhere(spark, src, "id >= 150")
    val r3 = refresh()
    assert(!r3.incremental, "a source delete must force the join rebuild")
    assert(viewRows() == expectedRows())
  }

  test("maxCols: incremental max-merge matches full recompute; DV delete forces rebuild") {
    import graft.operators.Sketches
    val src = tmp("matmaxsrc"); val mat = tmp("matmax")
    def fromScratch() = Sketches
      .hllRegisters(TxLog.read(spark, src).select("k", "id"), Seq("k"), "id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    def maintained() = Sketches.hllRead(spark, mat, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    def refresh() = Sketches.hllRefresh(spark, src, mat,
      df => df.select("k", "id"), Seq("k"), "id")
    TxLog.append(batch(0 until 90), src, "k")
    refresh()
    TxLog.append(batch(90 until 200), src, "k")
    val r = refresh()
    assert(r.incremental)
    assert(maintained() == fromScratch())
    // a deletion-vector delete is non-append-only (entry diff) → max has no
    // inverse, so the refresh must recompute — and does so correctly
    TxLog.deleteWhere(spark, src, "id >= 150")
    val r2 = refresh()
    assert(!r2.incremental, "a DV delete must force the max rebuild")
    assert(maintained() == fromScratch())
  }

  test("streaming HLL maintenance: per-micro-batch foreachBatch refresh equals the batch sketch") {
    import graft.operators.Sketches
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("hllstream").toString
    val in = s"$base/in"; val src = s"$base/src/t"; val mat = s"$base/mat/t"
    batch(0 until 100).coalesce(1).write.parquet(in)
    batch(100 until 260).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(batch(0 until 1).schema)
      .option("maxFilesPerTrigger", "1").parquet(in) // force ≥2 micro-batches
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        // exactly-once across batches: the landing append and the sketch
        // refresh both commit through the tx log's versioned machinery
        TxLog.appendFlat(b, src)
        Sketches.hllRefresh(spark, src, mat,
          df => df.select("k", "id"), Seq("k"), "id")
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    val got = Sketches.hllRead(spark, mat, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val want = Sketches
      .hllRegisters(TxLog.read(spark, src).select("k", "id"), Seq("k"), "id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("countMinRefresh: the maintained grid equals the from-scratch sketch") {
    import graft.operators.Sketches
    val src = tmp("cmssrc"); val mat = tmp("cmsmat")
    val (d, w) = (4, 64)
    def docsDf(ids: Range) = ids.map(i =>
      (i.toLong, i.toLong % 5, s"alpha beta w$i gamma w${i % 7}"))
      .toDF("doc_id", "k", "text")
    val keys = (df: org.apache.spark.sql.DataFrame) =>
      df.select(explode(split(col("text"), " ")).as("term"))
    def grid(p: String) = Sketches.countMinRead(spark, p).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def scratch() = Sketches.countMinCells(
      keys(TxLog.read(spark, src)), col("term"), d, w).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    TxLog.append(docsDf(0 until 40), src, "k")
    val r0 = Sketches.countMinRefresh(spark, src, mat, keys, "term", d, w)
    assert(!r0.incremental && grid(mat) == scratch())
    // append-only growth: delta grid merges additively into the state
    TxLog.append(docsDf(40 until 100), src, "k")
    val r1 = Sketches.countMinRefresh(spark, src, mat, keys, "term", d, w)
    assert(r1.incremental, "append-only sketch refresh must be delta-only")
    assert(grid(mat) == scratch())
    // a replace (files removed) downgrades honestly to a rebuild — and the
    // rebuilt grid must FORGET the replaced occurrences (sketch = live rows)
    TxLog.replaceKeys(docsDf(1000 until 1002)
      .withColumn("k", lit(2L)), src, "k")
    val r2 = Sketches.countMinRefresh(spark, src, mat, keys, "term", d, w)
    assert(!r2.incremental && grid(mat) == scratch())
  }

  test("refreshPostings: the maintained index equals the from-scratch postings") {
    import graft.operators.InvertedIndex
    val src = tmp("idxsrc"); val mat = tmp("idxmat")
    def docsDf(ids: Range) = ids.map(i =>
      (i.toLong, i.toLong % 4, s"alpha w$i beta w${i % 3} alpha"))
      .toDF("doc_id", "k", "text")
    def index(p: String) = InvertedIndex.readPostings(spark, p).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    def scratch() = InvertedIndex.postings(
      TxLog.read(spark, src), "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    TxLog.append(docsDf(0 until 30), src, "k")
    InvertedIndex.refreshPostings(spark, src, mat, "doc_id", "text")
    assert(index(mat) == scratch())
    TxLog.append(docsDf(30 until 80), src, "k")
    val r = InvertedIndex.refreshPostings(spark, src, mat, "doc_id", "text")
    assert(r.incremental && index(mat) == scratch())
  }

  test("fastCount answers COUNT(*) from the manifest alone; mixed logs decline") {
    val path = tmp("fastcount")
    TxLog.append(batch(0 until 70).coalesce(1), path, "k", statsCols = Seq("id"))
    TxLog.append(batch(70 until 100).coalesce(1), path, "k", statsCols = Seq("id"))
    assert(TxLog.fastCount(spark, path).contains(100L))
    // a stat-less commit makes the metadata answer unavailable, not wrong
    TxLog.append(batch(100 until 110).coalesce(1), path, "k")
    assert(TxLog.fastCount(spark, path).isEmpty)
    assert(TxLog.read(spark, path).count() == 110L)
  }
}
