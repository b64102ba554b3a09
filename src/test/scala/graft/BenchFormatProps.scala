package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property coverage for the bench tail-line ladder, beyond
  * BenchFormatSpec's fixed fixtures: ANY wall map up to 260 queries
  * must emit a ≤-budget line that decodes back to every query at ≤0.1 s
  * resolution with the counts intact — the degradation choice is the
  * format's business, the CONTRACT is resolution + completeness.
  */
object BenchFormatProps extends Properties("BenchFormat") {

  private val wallGen: Gen[Double] =
    Gen.frequency(
      (6, Gen.choose(0.05, 0.95)), // the bulk of the real suite
      (3, Gen.choose(1.0, 9.9)),
      (1, Gen.choose(10.0, 99.9))) // the heavy tail

  private val suiteGen: Gen[Map[String, Double]] = for {
    n <- Gen.choose(1, 260)
    walls <- Gen.listOfN(n, wallGen)
  } yield walls.zipWithIndex.map { case (w, i) =>
    f"q${i + 1}%d_some_operator" -> w
  }.toMap

  property("any suite <= 260 queries: under budget, counts intact, " +
      "every query decodes at <= 0.1 s resolution") =
    forAll(suiteGen) { wall =>
      val names = wall.keys.toSeq
      val line = BenchFormat.tailLine(names, wall, wall.values.sum,
        nAll = names.size + 1, sfName = "sf0.1")
      val (n, nErr, decoded) = BenchFormat.decodeTail(line)
      line.length <= BenchFormat.Budget &&
        n == names.size && nErr == 1 && decoded.size == names.size &&
        names.forall { name =>
          // decoded keys are either full names or the qNNN short form
          val got = decoded.getOrElse(name,
            decoded(name.takeWhile(_ != '_')))
          math.abs(got - wall(name)) <= 0.05 + 1e-9
        }
    }

  property("range packing round-trips any sorted distinct id set") =
    forAll(Gen.listOf(Gen.choose(1L, 999L))) { ids0 =>
      val ids = ids0.distinct.sorted
      BenchFormat.unpackRanges(BenchFormat.packRanges(ids)) == ids
    }

  /** The r15 cpu/load contract: with ANY cpu map + a load block riding
    * along, the line stays under budget, walls STILL decode complete
    * at ≤0.1 s (cpu must never displace wall fidelity), and whenever
    * the chosen tier kept cpu, it decodes at ≤0.1 s too.
    */
  property("any suite with cpu + load: under budget, walls whole, " +
      "cpu exact-at-ds whenever present") =
    forAll(suiteGen, Gen.choose(1.0, 32.0)) { (wall, cpuFactor) =>
      val names = wall.keys.toSeq
      val cpu = wall.map { case (k, v) => k -> v * cpuFactor }
      val load = """{"avg_start":2.15,"avg_end":6.80,"wall_sec":97.30,""" +
        """"proc_cpu_sec":532.67,"cpus":32,"runs":3}"""
      val line = BenchFormat.tailLine(names, wall, wall.values.sum,
        nAll = names.size + 1, sfName = "sf0.1", cpu = cpu, load = load)
      val (n, nErr, decoded) = BenchFormat.decodeTail(line)
      val decodedCpu = BenchFormat.decodeTailCpu(line)
      def key(name: String): String =
        if (decoded.contains(name)) name else name.takeWhile(_ != '_')
      line.length <= BenchFormat.Budget &&
        n == names.size && nErr == 1 && decoded.size == names.size &&
        names.forall(nm =>
          math.abs(decoded(key(nm)) - wall(nm)) <= 0.05 + 1e-9) &&
        (decodedCpu.isEmpty ||
          (decodedCpu.size == names.size && names.forall(nm =>
            math.abs(decodedCpu(key(nm)) - cpu(nm)) <= 0.05 + 1e-9)))
    }
}
