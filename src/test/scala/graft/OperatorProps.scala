package graft

import graft.functions.GapParser
import graft.operators.{AsOfJoin, Dedup}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based invariants (SURVEY §5.4): dedup idempotence/commutativity,
  * as-of formulation equivalence on random histories, gap-parser totality.
  * Sample counts are small — every sample runs Spark jobs.
  */
object OperatorProps extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0, 4); o <- Gen.choose(0, 9); v <- Gen.choose(0, 99)
    } yield (k, o, v))

  property("latestPerKey is idempotent") = forAll(rowsGen) { rows =>
    rows.nonEmpty ==> {
      val df = rows.toDF("k", "o", "v")
      val ord = Seq(col("o").desc, col("v").desc)
      val once = Dedup.latestPerKey(df, Seq("k"), ord)
      val twice = Dedup.latestPerKey(once, Seq("k"), ord)
      once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet
    }
  }

  property("latestPerKey ≡ latestPerKeyAgg under a total order") = forAll(rowsGen) { rows =>
    rows.nonEmpty ==> {
      // make (o, v) a total order per key by deduping exact duplicates first
      val df = rows.distinct.toDF("k", "o", "v")
      val a = Dedup.latestPerKey(df, Seq("k"), Seq(col("o").desc, col("v").desc))
      val b = Dedup.latestPerKeyAgg(df, Seq("k"), Seq("o", "v"))
      a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet
    }
  }

  private val historyGen: Gen[(List[(Int, Int, Int)], List[(Int, Int, Int)])] =
    for {
      left <- Gen.listOfN(12, for {
        u <- Gen.choose(0, 3); t <- Gen.choose(0, 50); id <- Gen.choose(1000, 1999)
      } yield (u, t, id))
      right <- Gen.listOfN(20, for {
        u <- Gen.choose(0, 3); t <- Gen.choose(0, 50); id <- Gen.choose(0, 999)
      } yield (u, t, id))
    } yield (left, right.distinctBy(r => (r._1, r._2, r._3)))

  property("as-of join ≡ union-merge on random histories") = forAll(historyGen) {
    case (l, r) =>
      (l.nonEmpty && r.nonEmpty) ==> {
        val left = l.distinctBy(_._3).toDF("u", "t", "lid")
        val right = r.toDF("ru", "rt", "rid")
        val args = (Seq("u" -> "ru"), "t", "rt")
        val a = AsOfJoin.joinFormulation(left, right, args._1, args._2, args._3,
          leftRowKey = Seq("lid"), rightTieBreak = Seq("rid"),
          leftSelect = Seq("lid" -> "lid", "u" -> "u", "t" -> "t"),
          rightSelect = Seq("rid" -> "rid", "rt" -> "rt"))
        val b = AsOfJoin.unionMergeFormulation(left, right, args._1, args._2, args._3,
          rightTieBreak = Seq("rid"),
          leftSelect = Seq("lid" -> "lid", "u" -> "u", "t" -> "t"),
          rightSelect = Seq("rid" -> "rid", "rt" -> "rt"))
        a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet
      }
  }

  private val gapGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.choose(-1000.0, 1000.0).map(d => f"+$d%.3f"),
    Gen.choose(0, 60).map(n => s"+$n LAP"),
    Gen.choose(0, 60).map(n => s"$n LAPS"),
    Gen.const(""), Gen.const("LAP"), Gen.const("1.2.3"),
    Gen.numStr.map(s => s" $s "))

  property("gap parser is total and shape-correct") = forAll(gapGen) { s =>
    val out = Seq(s).toDF("v").select(GapParser.parseGap(col("v"))).head()
    out.isNullAt(0) || {
      val v = out.getString(0)
      v.matches("[0-9]+") || v.matches("-?[0-9]+\\.[0-9Ee+-]+|-?[0-9]+\\.[0-9]*")
    }
  }

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L)
    } yield (a, b)).map(_.filter { case (a, b) => a != b })

  property("connectedComponents matches driver-side union-find") = forAll(edgesGen) { es =>
    es.nonEmpty ==> {
      // reference: textbook union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = nodes.groupBy(find).flatMap { case (_, members) =>
        val m = members.min; members.map(_ -> m)
      }.toMap
      val got = Dedup.connectedComponents(es.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
  }

  private val ptsIvsGen: Gen[(List[Long], List[(Long, Long)], Long)] = for {
    pts <- Gen.listOfN(20, Gen.choose(-500L, 500L))
    ivs <- Gen.listOfN(8, for {
      lo <- Gen.choose(-500L, 500L); len <- Gen.choose(0L, 300L)
    } yield (lo, lo + len))
    w <- Gen.oneOf(1L, 13L, 128L, 1024L)
  } yield (pts, ivs, w)

  property("binnedRangeJoin ≡ naive BETWEEN join for any bin width") =
    forAll(ptsIvsGen) { case (pts, ivs, w) =>
      (pts.nonEmpty && ivs.nonEmpty) ==> {
        val p = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "pt")
        val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("iid", "lo", "hi")
        val naive = p.join(iv, col("pt") >= col("lo") && col("pt") <= col("hi"))
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val binned = graft.operators.RangeJoin
          .binnedRangeJoin(p, iv, "pt", "lo", "hi", w)
          .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        naive == binned
      }
    }

  private val zGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, for {
      x <- Gen.choose(0L, 255L); y <- Gen.choose(0L, 255L)
    } yield (x, y))

  property("zValue is injective and monotone on each axis slice") = forAll(zGen) { xs =>
    xs.nonEmpty ==> {
      val rows = xs.distinct
      val got = rows.toDF("x", "y")
        .select(col("x"), col("y"),
          graft.functions.ZOrder.zValue(col("x"), col("y"), 8).as("z"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      // injective on distinct (x, y)
      got.values.toSet.size == rows.size &&
      // fixing y, z is strictly increasing in x (and symmetrically in y):
      // interleaving preserves per-axis order
      rows.groupBy(_._2).forall { case (_, grp) =>
        grp.map(_._1).sorted.map(x1 => got((x1, grp.head._2))) ==
          grp.map(_._1).sorted.map(x1 => got((x1, grp.head._2))).sorted
      }
    }
  }

  private val bloomGen: Gen[(List[Long], List[Long])] = for {
    corpus <- Gen.listOfN(60, Gen.choose(0L, 200L))
    batch <- Gen.listOfN(40, Gen.choose(0L, 400L))
  } yield (corpus, batch)

  property("bloomAntiJoin ≡ left_anti on random overlaps") = forAll(bloomGen) {
    case (corpus, batch) =>
      (corpus.nonEmpty && batch.nonEmpty) ==> {
        val c = corpus.toDF("k")
        val b = batch.toDF("k")
        val plain = b.join(c.distinct(), Seq("k"), "left_anti")
          .collect().map(_.getLong(0)).sorted.toSeq
        val bloomed = Dedup.bloomAntiJoin(b, c, "k", expectedItems = 1000)
          .collect().map(_.getLong(0)).sorted.toSeq
        plain == bloomed
      }
  }
}
