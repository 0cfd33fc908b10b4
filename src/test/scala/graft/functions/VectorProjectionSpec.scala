package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection ([[VectorFunctions.randomProject]]):
  * norm unbiasedness under the uniform-[-0.5,0.5) plane family's 1/12
  * variance correction, pairwise-distance concentration at moderate m, and
  * the no-shuffle plan shape that justifies projecting BEFORE heavy stages.
  */
class VectorProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  // deterministic pseudo-random vectors from an LCG LATTICE family — the
  // adversarial input class for a lattice plane family, which is exactly
  // why randomProject's planes must be splitmix-mixed (jlPlanes), not the
  // LSH hyperplane lattice
  private def vec(seed: Int): Array[Float] =
    (0 until dim).map { j =>
      val x = (1103515245L * (seed.toLong * 7919L + j * 104729L) + 12345L) % 1048576L
      (x.toDouble / 1048576.0 - 0.5).toFloat
    }.toArray

  private lazy val df = (0 until 200).map(i => (i.toLong, vec(i)))
    .toDF("id", "v")

  test("output has m components and is deterministic across evaluations") {
    val planes = VectorFunctions.jlPlanes(42L, 8, dim)
    val p = df.select(col("id"), VectorFunctions.randomProject(col("v"), planes).as("p"))
    assert(p.select(size(col("p"))).distinct().as[Int].collect().toSeq == Seq(8))
    val a = p.orderBy("id").as[(Long, Seq[Double])].collect()
    val b = p.orderBy("id").as[(Long, Seq[Double])].collect()
    assert(a.sameElements(b))
  }

  test("norms are unbiased: mean projected/original squared-norm ratio near 1") {
    val planes = VectorFunctions.jlPlanes(42L, 16, dim)
    val ratios = df.select(
      (VectorFunctions.dot(VectorFunctions.randomProject(col("v"), planes),
        VectorFunctions.randomProject(col("v"), planes)) /
        VectorFunctions.dot(col("v"), col("v"))).as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    // E[r] = 1 by construction; at m=16 over 200 vectors the sample mean
    // concentrates well inside ±15% (deterministic planes+vectors: this is
    // a fixed number, asserted with margin against plane-family changes)
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio $mean")
  }

  test("pairwise distances concentrate: m=32 keeps most distortions within 60%") {
    val planes = VectorFunctions.jlPlanes(42L, 32, dim)
    val proj = df.select(col("id"), col("v"),
      VectorFunctions.randomProject(col("v"), planes).as("p"))
    val a = proj.as("a"); val b = proj.as("b")
    val d = a.join(b, col("a.id") + 7 === col("b.id")) // 193 fixed pairs
      .select((VectorFunctions.dot(col("a.p"), col("a.p")) +
        VectorFunctions.dot(col("b.p"), col("b.p")) -
        lit(2.0) * VectorFunctions.dot(col("a.p"), col("b.p"))).as("dp"),
        (VectorFunctions.dot(col("a.v"), col("a.v")) +
          VectorFunctions.dot(col("b.v"), col("b.v")) -
          lit(2.0) * VectorFunctions.dot(col("a.v"), col("b.v"))).as("dv"))
      .as[(Double, Double)].collect()
    val ratios = d.map { case (dp, dv) => dp / dv }
    val within = ratios.count(r => r > 0.4 && r < 1.6)
    assert(within.toDouble / ratios.length > 0.9,
      s"only $within/${ratios.length} pairs within 60% distortion")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"mean distance ratio $mean")
  }

  test("projection is map-only: no exchange in the plan") {
    val planes = VectorFunctions.jlPlanes(42L, 8, dim)
    val plan = df.select(col("id"),
      VectorFunctions.randomProject(col("v"), planes).as("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection should not shuffle:\n$plan")
  }
}
