package graft.sources

import graft.SparkSpec
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Model-based ACID property: a random sequence of append / replaceKeys /
  * mergeKeys commits must leave EVERY version of the log equal to an
  * in-memory reference model replaying the same semantics — so time travel
  * is checked at every intermediate version, not just the head, under op
  * interleavings no hand-written case covers.
  */
object TxLogProps extends Properties("graft.sources.TxLog") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private case class R(id: Long, k: Long, v: Long)

  private sealed trait Op
  private case class Append(rows: List[R]) extends Op
  private case class Replace(rows: List[R]) extends Op
  private case class Merge(rows: List[R]) extends Op
  private case object Compact extends Op
  private case class Once(rows: List[R], batch: Long) extends Op
  private case class Delete(m: Long) extends Op
  private case object RestoreHalf extends Op

  private val rowGen: Gen[R] = for {
    id <- Gen.choose(0L, 30L); k <- Gen.choose(0L, 2L); v <- Gen.choose(0L, 99L)
  } yield R(id, k, v)

  // merge requires unique keys per batch and stable key→partition mapping:
  // derive the partition from the id so a key never moves
  private def pin(r: R): R = r.copy(k = r.id % 3)

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.listOfN(4, rowGen).map(rs => Append(rs.map(pin))),
    2 -> Gen.listOfN(3, rowGen).map(rs => Replace(rs.map(pin))),
    2 -> Gen.listOfN(3, rowGen).map(rs =>
      Merge(rs.map(pin).groupBy(_.id).map(_._2.head).toList)),
    // maintenance interleaved with writers: a compact mints a version whose
    // CONTENTS are identical to its predecessor (pure layout change), and
    // every later version must still replay the model as if it wasn't there
    1 -> Gen.const(Compact),
    // idempotent appends with batch versions drawn from a SMALL range so
    // replays (and stale batches) happen often; the model lands a batch
    // only when it advances the per-app watermark
    2 -> (for { rs <- Gen.listOfN(3, rowGen); b <- Gen.choose(0L, 2L) }
      yield Once(rs.map(pin), b)),
    // row-level DV deletes (no-match predicates mint nothing — the replay
    // keys on versions actually minted, so that's covered by construction)
    1 -> Gen.choose(0L, 4L).map(Delete),
    // RESTORE to the middle of the history: state AND the idempotent-append
    // watermark must rewind together (the fence covers data that no longer
    // exists after the rewind)
    1 -> Gen.const(RestoreHalf))

  // (model txn watermark rides outside the row state)
  private var modelTxn = -1L

  private def applyModel(state: Vector[R], op: Op): Vector[R] = op match {
    case Append(rows) => state ++ rows
    case Once(rows, b) =>
      if (b > modelTxn) { modelTxn = b; state ++ rows } else state
    case Delete(m) => state.filterNot(_.id % 5 == m)
    case RestoreHalf => state // handled in the fold (needs the history)
    case Replace(rows) =>
      val touched = rows.map(_.k).toSet
      state.filterNot(r => touched.contains(r.k)) ++ rows
    case Merge(rows) =>
      val touched = rows.map(_.k).toSet
      val ids = rows.map(_.id).toSet
      // within touched partitions: matched keys replaced, unmatched inserted;
      // untouched partitions keep their rows
      state.filterNot(r => touched.contains(r.k) && ids.contains(r.id)) ++ rows
    case Compact => state
  }

  private def df(rows: List[R]) =
    rows.map(r => (r.id, r.k, r.v)).toDF("id", "k", "v")

  private def applyLog(path: String, op: Op): Unit = op match {
    case Append(rows) => TxLog.append(df(rows), path, "k")
    case Replace(rows) => TxLog.replaceKeys(df(rows), path, "k")
    case Merge(rows) =>
      TxLog.mergeKeys(df(rows), path, "k", keyCols = Seq("id"))
    case Once(rows, b) =>
      TxLog.appendOnce(df(rows), path, appId = "prop", batchVersion = b,
        partitionCol = Some("k")): Unit
    case Delete(m) =>
      // a delete on an empty table (or one matching nothing) mints nothing
      if (TxLog.currentVersion(SparkSpec.spark, path) >= 0)
        TxLog.deleteWhere(SparkSpec.spark, path, s"id % 5 = $m"): Unit
    case RestoreHalf => () // handled in the fold
    case Compact =>
      // a compact on an empty table is a no-version no-op; the model's
      // state-preserving contract only applies once a commit exists
      if (TxLog.currentVersion(SparkSpec.spark, path) >= 0)
        TxLog.compact(SparkSpec.spark, path, "k"): Unit
  }

  property("any op sequence: every version equals the model (time travel incl.)") =
    forAll(Gen.listOfN(7, opGen)) { ops =>
      val path = java.nio.file.Files.createTempDirectory("txprop").toString + "/t"
      modelTxn = -1L
      // multisets matter for append duplicates — track counts via a tag.
      // States are keyed by the version ACTUALLY minted (a compact before
      // the first commit mints nothing), so the replay follows the log's
      // own version chain rather than assuming one version per op.
      var byVersion = Map.empty[Long, Vector[R]]
      var txnByVersion = Map.empty[Long, Long]
      var state = Vector.empty[R]
      ops.foreach { op =>
        op match {
          case RestoreHalf =>
            val cur = TxLog.currentVersion(spark, path)
            if (cur >= 1) {
              val target = cur / 2
              TxLog.restore(spark, path, target)
              state = byVersion(target)
              modelTxn = txnByVersion(target)
            }
          case _ =>
            applyLog(path, op)
            state = applyModel(state, op)
        }
        val v = TxLog.currentVersion(spark, path)
        if (v >= 0) { byVersion += (v -> state); txnByVersion += (v -> modelTxn) }
      }
      byVersion.forall { case (v, expected) =>
        // compare as multisets: group-count both sides
        val exp = expected.groupBy(identity).view.mapValues(_.size).toMap
        val gotRows = TxLog.read(spark, path, v).collect()
          .map(r => R(r.getAs[Long]("id"), r.getAs[Long]("k"), r.getAs[Long]("v")))
        val got = gotRows.groupBy(identity).view.mapValues(_.length).toMap
        got == exp
      }
    }
}
