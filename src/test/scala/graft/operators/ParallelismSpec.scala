package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The plan-derived parallelism estimate behind the spread-before-explode
  * decision: broadcast joins must NOT read as shuffle boundaries (a
  * 1-partition probe frame broadcast-joined to a dimension still needs its
  * spread), while genuinely shuffling plans pin to the shuffle partition
  * count.
  */
class ParallelismSpec extends SparkSpec {
  import spark.implicits._

  private val shuffleN = spark.sessionState.conf.numShufflePartitions

  test("a broadcast-hinted join inherits the stream side's narrow estimate") {
    val probe = (1 to 50).map(i => (i.toLong, s"t $i")).toDF("id", "text")
      .coalesce(1)
    val dim = Seq((1L, "x"), (2L, "y")).toDF("id", "kind")
    val joined = probe.join(broadcast(dim), Seq("id"), "left")
    val est = Parallelism.estimate(joined)
    // the stream side is a coalesced-to-1 local frame: the estimate must
    // stay SMALL so the explode call sites still repartition it
    assert(est < spark.sparkContext.defaultParallelism,
      s"broadcast join read as a shuffle boundary: estimate $est")
  }

  test("a shuffling join and a keyed aggregate pin to spark.sql.shuffle.partitions") {
    // defeat the size-stats broadcast path: raise both sides above the
    // threshold by dropping it to 1 byte for the assertion window
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 100).map(i => (i.toLong, i)).toDF("id", "v")
      val b = (1 to 100).map(i => (i.toLong, i * 2)).toDF("id", "w")
      assert(Parallelism.estimate(a.join(b, "id")) == shuffleN)
      assert(Parallelism.estimate(
        a.groupBy("id").agg(sum("v"))) == shuffleN)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("a small side that is not a legal build side does not defeat the boundary") {
    // LEFT OUTER can only broadcast its RIGHT side: a broadcast-hinted
    // small LEFT side still plans a shuffle join, so the estimate must pin
    // to the shuffle partition count rather than inherit the right side
    // (round-12 advice — JoinSelection's canBuildBroadcastLeft/Right)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val small = Seq((1L, "x"), (2L, "y")).toDF("id", "kind")
      val big = (1 to 100).map(i => (i.toLong, i)).toDF("id", "v")
      assert(Parallelism.estimate(
        broadcast(small).join(big, Seq("id"), "left")) == shuffleN,
        "small left of LEFT OUTER must read as a shuffle boundary")
      assert(Parallelism.estimate(
        big.join(broadcast(small), Seq("id"), "full")) == shuffleN,
        "FULL OUTER broadcasts neither side")
      // the legal directions still pass through to the stream side
      assert(Parallelism.estimate(
        big.coalesce(1).join(broadcast(small), Seq("id"), "left")) == 1,
        "small right of LEFT OUTER is a legal build side")
      assert(Parallelism.estimate(
        broadcast(small).join(big.coalesce(1), Seq("id"), "right")) == 1,
        "small left of RIGHT OUTER is a legal build side")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("an explicit repartition reports its own count; a parquet scan reports split arithmetic") {
    val df = (1 to 10).map(i => (i.toLong, i)).toDF("id", "v")
    assert(Parallelism.estimate(df.repartition(7)) == 7)
    val scan = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val est = Parallelism.estimate(scan.select("doc_id"))
    assert(est >= 1, s"scan estimate $est")
  }
}
