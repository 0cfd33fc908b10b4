package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GENERATED ALWAYS AS columns: fill-in on omitting batches (including as
  * the partition column), value validation on supplying batches, guards
  * against rename/drop of a generated name.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("omitted generated column is computed and can be the partition column") {
    val path = tmp("gen")
    TxLog.setGeneratedColumn(spark, path, "bucket", "id div 10")
    TxLog.append(Seq((1L, "a"), (11L, "b"), (21L, "c")).toDF("id", "payload"),
      path, "bucket")
    val out = TxLog.read(spark, path)
    assert(out.columns.toSet == Set("id", "payload", "bucket"))
    assert(out.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bucket"))
      .toMap == Map(1L -> 0L, 11L -> 1L, 21L -> 2L))
    // partition pruning works on the generated column
    val s = TxLog.snapshot(spark, path)
    assert(TxLog.keyFiles(s, "bucket", "1").size < s.files.size)
    assert(TxLog.readKey(spark, path, "bucket", 1L).count() == 1)
  }

  test("explicitly supplied values validate: match commits, mismatch aborts cleanly") {
    val path = tmp("gen2")
    TxLog.setGeneratedColumn(spark, path, "bucket", "id div 10")
    val v0 = TxLog.append(
      Seq((5L, "a", 0L)).toDF("id", "payload", "bucket"), path, "bucket")
    assert(v0 == 0)
    val before = TxLog.currentVersion(spark, path)
    intercept[TxLog.ConstraintViolation] {
      TxLog.append(Seq((7L, "x", 99L)).toDF("id", "payload", "bucket"),
        path, "bucket")
    }
    assert(TxLog.currentVersion(spark, path) == before) // nothing committed
    assert(TxLog.read(spark, path).count() == 1)
  }

  test("generated name blocks rename/drop until the definition is removed") {
    val path = tmp("gen3")
    TxLog.setGeneratedColumn(spark, path, "bucket", "id div 10")
    TxLog.append(Seq((1L, "a")).toDF("id", "payload"), path, "bucket")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, path, "bucket", "b2")
    }
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, path, "bucket")
    }
    TxLog.dropGeneratedColumn(spark, path, "bucket")
    TxLog.renameColumn(spark, path, "bucket", "b2")
    assert(TxLog.read(spark, path).columns.contains("b2"))
  }

  test("generation coexists with column mapping on OTHER columns") {
    val path = tmp("gen4")
    TxLog.setGeneratedColumn(spark, path, "bucket", "id div 10")
    TxLog.append(Seq((1L, "a")).toDF("id", "payload"), path, "bucket")
    TxLog.renameColumn(spark, path, "payload", "body")
    TxLog.append(Seq((12L, "b")).toDF("id", "body"), path, "bucket")
    val out = TxLog.read(spark, path)
    assert(out.columns.toSet == Set("id", "body", "bucket"))
    assert(out.filter(col("id") === 12L).select("bucket").head().getLong(0) == 1L)
  }
}
