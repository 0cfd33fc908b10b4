package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Self-enforcing twin of `tools/check_shuffle_regression.py`: compares two
  * Bench JSON lines (the committed `SHUFFLE_BASELINE.json` vs the bench's
  * persisted `target/bench_last.json`) and flags any query whose shuffle
  * WRITE bytes grew more than [[Ratio]]× beyond a [[NoiseMb]] floor, or
  * that spills where the baseline didn't. The comparison is a pure
  * function so the test suite can both (a) prove it goes red on an
  * injected regression and (b) gate the real artifacts on every
  * `sbt test` run that follows a bench (ShuffleGuardSpec).
  */
object ShuffleGuard {

  val NoiseMb = 1.0
  val Ratio = 2.0

  /** Flag strings, empty = within budget. Queries absent from the baseline
    * (new this round) are skipped — they become the next baseline.
    */
  def flags(baseWrite: Map[String, Double], curWrite: Map[String, Double],
            baseSpill: Map[String, Double], curSpill: Map[String, Double]): Seq[String] =
    curWrite.toSeq.sortBy(_._1).flatMap { case (q, cw) =>
      baseWrite.get(q).toSeq.flatMap { bw =>
        val w =
          if (cw > NoiseMb && cw > Ratio * math.max(bw, NoiseMb))
            Seq(f"$q: shuffle write $bw%.1f -> $cw%.1f MB " +
              f"(${cw / math.max(bw, NoiseMb)}%.1fx)")
          else Nil
        val s =
          if (curSpill.getOrElse(q, 0.0) > NoiseMb &&
              baseSpill.getOrElse(q, 0.0) <= NoiseMb)
            Seq(f"$q: NEW SPILL ${curSpill(q)}%.1f MB")
          else Nil
        w ++ s
      }
    }

  /** The per-query double map under `field`, empty when absent (pre-r5
    * bench lines had no shuffle columns).
    */
  def mapOf(node: JsonNode, field: String): Map[String, Double] =
    Option(node.get(field)).map { m =>
      m.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
    }.getOrElse(Map.empty)

  def checkFiles(basePath: String, curPath: String): Seq[String] = {
    val om = new ObjectMapper()
    val base = om.readTree(new java.io.File(basePath))
    val cur = om.readTree(new java.io.File(curPath))
    // different scale factors aren't comparable — a bench run at sf1 would
    // read as a 10x "regression" against the sf0.1 baseline
    val sameSf = (for { b <- Option(base.get("sf")); c <- Option(cur.get("sf")) }
      yield b.asText() == c.asText()).getOrElse(true)
    if (!base.has("shuffle_write_mb") || !sameSf) Nil
    else flags(mapOf(base, "shuffle_write_mb"), mapOf(cur, "shuffle_write_mb"),
      mapOf(base, "spill_mb"), mapOf(cur, "spill_mb"))
  }

  def main(args: Array[String]): Unit = {
    val fs = checkFiles(args(0), args(1))
    fs.foreach(f => println(s"  x $f"))
    println(s"== ${fs.length} flagged ==")
    if (fs.nonEmpty) sys.exit(1)
  }
}
