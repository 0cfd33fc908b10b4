package graft.functions

import graft.SparkSpec
import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Z-order interleave correctness + the layout claim: a z-clustered table
  * prunes file-level min/max on EITHER dimension; a one-column sort layout
  * prunes on one and scans everything for the other.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave on the driver. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  test("zValue matches the bit-interleave reference on a dense sample") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 5), s"($x,$y)")
    }
    // z is a bijection on the square: all 1024 values distinct
    assert(got.values.toSet.size == 1024)
  }

  test("zValueN: n=2 matches zValue; n=3 is injective with per-axis monotonicity") {
    val pairs = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val two = pairs.toDF("x", "y").select(
      ZOrder.zValue(col("x"), col("y"), 4).as("a"),
      ZOrder.zValueN(Seq(col("x"), col("y")), 4).as("b"))
    assert(two.filter(col("a") =!= col("b")).count() == 0)
    val triples = for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield (x, y, z)
    val got = triples.toDF("x", "y", "z").select(col("x"), col("y"), col("z"),
      ZOrder.zValueN(Seq(col("x"), col("y"), col("z")), 3).as("m"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
    assert(got.map(_._2).toSet.size == 512) // bijection on the cube
    // fixing (y, z), m increases with x
    got.groupBy { case ((_, y, z), _) => (y, z) }.values.foreach { grp =>
      val sorted = grp.sortBy(_._1._1).map(_._2).toSeq
      assert(sorted == sorted.sorted)
    }
  }

  test("z-clustered layout prunes a 1-D range on either dimension; y-sorted does not") {
    val grid = (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y))
      .toDF("x", "y")
    val zPath = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val lPath = java.nio.file.Files.createTempDirectory("linear").toString + "/t"
    // repartitionByRange SAMPLES its boundaries (default 100 rows per
    // partition over 65536 rows) — under a loaded suite the jitter moved a
    // z-run across one more file boundary and flaked the pruning bound.
    // Pin the fixture, not the bound: a deep sample makes the range
    // boundaries deterministic-in-practice, keeping the assertion at the
    // tight 8 the layout actually produces (round-11 advice).
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prevSample = spark.conf.getOption(sampleKey)
    spark.conf.set(sampleKey, "4000")
    try {
      Sinks.writeZOrdered(grid, zPath, "x", "y", bits = 8, nFiles = 16)
      grid.repartitionByRange(16, col("y")).sortWithinPartitions("y")
        .write.parquet(lPath)
    } finally {
      prevSample match {
        case Some(v) => spark.conf.set(sampleKey, v)
        case None => spark.conf.unset(sampleKey)
      }
    }

    // files whose [min(x), max(x)] intersects x ∈ [0, 63]
    def intersecting(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("mn"), max("x").as("mx"))
      val total = stats.count()
      val hit = stats.filter(col("mx") >= 0 && col("mn") <= 63).count()
      (hit, total)
    }
    val (zHit, zTotal) = intersecting(zPath)
    val (lHit, lTotal) = intersecting(lPath)
    assert(zTotal == 16 && lTotal == 16, s"$zTotal/$lTotal")
    // z layout: the x ∈ [0,63] slab is one column of 64×64 tiles → 4
    // z-contiguous runs of ~4096 rows, one aligned file each.
    // repartitionByRange boundaries are not tile-aligned and a file is
    // itself ~4096 rows, so each run can straddle one boundary — up to 8
    // hits, deterministic now that the boundary sample is pinned deep.
    // Still O(√files) against the linear layout's 16/16.
    assert(zHit <= 8, s"z layout hit $zHit of $zTotal")
    // y-sorted layout: every file spans the full x domain
    assert(lHit == 16, s"linear layout hit $lHit of $lTotal")
    // and the data survives the layout intact
    assert(spark.read.parquet(zPath).count() == 65536)
    assert(spark.read.parquet(zPath).filter(col("x") <= 63).count() == 64L * 256L)
  }
}
