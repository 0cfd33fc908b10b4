package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed catalog tables — the shuffle-free co-located join
  * (SURVEY §2.5's "pre-partition both sides" posture, realized with Spark's
  * native bucketing instead of a hand-rolled repartition that Catalyst
  * cannot see).
  *
  * Why this matters at 100 TB: a fact⋈fact join on a non-broadcastable side
  * pays a full shuffle of BOTH inputs every time it runs. Writing each table
  * bucketed by the join key (`bucketBy` + `sortBy` on a catalog table) makes
  * the hash-distribution a property OF THE DATA that the planner trusts:
  * every later join/aggregate on that key reads the buckets co-located and
  * skips the exchange entirely — amortizing one write-time shuffle across
  * every downstream query. Filters on the bucket key additionally prune to a
  * single bucket's files (`SelectedBucketsCount` in the scan), the
  * row-group-skipping analogue at file granularity. Both properties are
  * plan-asserted in PlanShapeSpec, not just claimed.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted parquet catalog table
    * (replacing any previous version). One shuffle now, zero on every
    * subsequent key-join/key-agg against any same-bucketed table.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    keyCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    // a managed table's location can outlive the (in-memory) catalog entry
    // across JVMs — clear both, or CREATE fails on the orphaned directory
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys. The `merge` hint
    * pins sort-merge (a broadcast would hide the point being demonstrated:
    * with matching bucket counts on both sides the SMJ's required
    * distribution is already satisfied by the scans — NO exchange appears
    * in the plan).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
