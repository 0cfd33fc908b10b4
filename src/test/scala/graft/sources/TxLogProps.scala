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
      Merge(rs.map(pin).groupBy(_.id).map(_._2.head).toList)))

  private def applyModel(state: Vector[R], op: Op): Vector[R] = op match {
    case Append(rows) => state ++ rows
    case Replace(rows) =>
      val touched = rows.map(_.k).toSet
      state.filterNot(r => touched.contains(r.k)) ++ rows
    case Merge(rows) =>
      val touched = rows.map(_.k).toSet
      val ids = rows.map(_.id).toSet
      // within touched partitions: matched keys replaced, unmatched inserted;
      // untouched partitions keep their rows
      state.filterNot(r => touched.contains(r.k) && ids.contains(r.id)) ++ rows
  }

  private def df(rows: List[R]) =
    rows.map(r => (r.id, r.k, r.v)).toDF("id", "k", "v")

  private def applyLog(path: String, op: Op): Unit = op match {
    case Append(rows) => TxLog.append(df(rows), path, "k")
    case Replace(rows) => TxLog.replaceKeys(df(rows), path, "k")
    case Merge(rows) =>
      TxLog.mergeKeys(df(rows), path, "k", keyCols = Seq("id"))
  }

  property("any op sequence: every version equals the model (time travel incl.)") =
    forAll(Gen.listOfN(5, opGen)) { ops =>
      val path = java.nio.file.Files.createTempDirectory("txprop").toString + "/t"
      // multisets matter for append duplicates — track counts via a tag
      var states = Vector.empty[Vector[R]]
      var state = Vector.empty[R]
      ops.foreach { op =>
        applyLog(path, op)
        state = applyModel(state, op)
        states = states :+ state
      }
      states.zipWithIndex.forall { case (expected, v) =>
        // compare as multisets: group-count both sides
        val exp = expected.groupBy(identity).view.mapValues(_.size).toMap
        val gotRows = TxLog.read(spark, path, v.toLong).collect()
          .map(r => R(r.getAs[Long]("id"), r.getAs[Long]("k"), r.getAs[Long]("v")))
        val got = gotRows.groupBy(identity).view.mapValues(_.length).toMap
        got == exp
      }
    }
}
