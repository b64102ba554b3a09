package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r12 verdict's task 1: the bench tail line must stay inside the
  * driver's capture budget at 260 queries WITHOUT degrading per-query
  * values below 0.1 s resolution, and must carry n/n_err in every tier
  * (the r12 ladder dropped both exactly on the largest runs). Pure
  * string logic — no Spark session.
  */
class BenchFormatSpec extends AnyFunSuite {

  /** Deterministic synthetic walls: mixes sub-second (most of the real
    * suite), couple-of-seconds, and two-digit-seconds queries.
    */
  private def synthetic(n: Int): (Seq[String], Map[String, Double]) = {
    val names = (1 to n).map(i => f"q${i}%d_synthetic_operator_name")
    val wall = names.zipWithIndex.map { case (name, i) =>
      val w = (i % 40) match {
        case j if j < 30 => 0.1 + (i % 9) * 0.1 // 0.1–0.9 s: the bulk
        case j if j < 38 => 1.0 + (i % 70) * 0.1 // 1–8 s
        case _ => 10.0 + (i % 300) * 0.1 // 10–40 s: the heavy tail
      }
      name -> w
    }.toMap
    (names, wall)
  }

  test("260 queries fit the 1840-char budget at <= 0.1 s resolution " +
      "with n/n_err present") {
    val (names, wall) = synthetic(260)
    val line = BenchFormat.tailLine(names, wall, wall.values.sum,
      nAll = 262, sfName = "sf0.1")
    assert(line.length <= BenchFormat.Budget,
      s"line is ${line.length} chars: ${line.take(200)}…")
    val (n, nErr, decoded) = BenchFormat.decodeTail(line)
    assert(n == 260 && nErr == 2, s"counts lost: n=$n n_err=$nErr")
    assert(decoded.size == 260)
    for (name <- names) {
      val got = decoded(name.takeWhile(_ != '_')) // qNNN key form
      assert(math.abs(got - wall(name)) <= 0.05 + 1e-9,
        s"$name: decoded $got vs ${wall(name)} — coarser than deciseconds")
    }
  }

  test("every ladder tier keeps n and n_err (ADVICE r12: the error count " +
      "must survive to the coarsest tiers)") {
    // walk the ladder by growing the query count: each size lands on a
    // different tier; all must decode the counts
    for (size <- Seq(5, 60, 120, 170, 200, 230, 260)) {
      val (names, wall) = synthetic(size)
      val line = BenchFormat.tailLine(names, wall, wall.values.sum,
        nAll = size + 3, sfName = "sf0.1")
      val (n, nErr, decoded) = BenchFormat.decodeTail(line)
      assert(n == size && nErr == 3, s"size $size: n=$n n_err=$nErr")
      assert(decoded.size == size, s"size $size: map incomplete")
      assert(line.length <= BenchFormat.Budget, s"size $size over budget")
    }
  }

  test("small suites keep 4-dp values and un-stripped qNNN keys (tier 1)") {
    val (names, wall) = synthetic(20)
    val line = BenchFormat.tailLine(names, wall, wall.values.sum, 20, "sf0.1")
    assert(line.contains("\"q1\":") && !line.contains("key_prefix"),
      "tier 1 keeps the q prefix inline")
    val (_, _, decoded) = BenchFormat.decodeTail(line)
    for (name <- names)
      assert(math.abs(decoded(name.takeWhile(_ != '_')) - wall(name))
        <= 0.00005 + 1e-9)
  }

  test("packed tier survives non-contiguous ids and round-trips ranges") {
    assert(BenchFormat.packRanges(Seq(1L, 2L, 3L, 7L, 9L, 10L)) == "1-3,7,9-10")
    assert(BenchFormat.unpackRanges("1-3,7,9-10") == Seq(1L, 2L, 3L, 7L, 9L, 10L))
    // a 260-query suite with every third id missing still packs + decodes
    val names = (1 to 390).filter(_ % 3 != 0).map(i => f"q${i}%d_op")
    val wall = names.map(n => n -> 0.4).toMap
    val line = BenchFormat.tailLine(names, wall, names.size * 0.4,
      names.size, "sf0.1")
    assert(line.length <= BenchFormat.Budget)
    val (_, _, decoded) = BenchFormat.decodeTail(line)
    assert(decoded.size == names.size)
    assert(decoded.values.forall(v => math.abs(v - 0.4) < 1e-9))
  }

  private val loadBlock =
    """{"avg_start":4.75,"avg_end":2.76,"wall_sec":2904.08,""" +
      """"proc_cpu_sec":8800.16,"cpus":32,"runs":3}"""

  test("the 209-query reality: per-query CPU map + load block ride the " +
      "tail inside budget and decode at <= 0.1 s (r14 verdict task 1)") {
    val (names, wall) = synthetic(209)
    val cpu = names.map(n => n -> wall(n) * 7.3).toMap
    val line = BenchFormat.tailLine(names, wall, wall.values.sum,
      nAll = 209, sfName = "sf0.1", cpu = cpu, load = loadBlock)
    assert(line.length <= BenchFormat.Budget, s"line is ${line.length} chars")
    assert(line.contains(""""load":{"""), "load block must survive to the tail")
    assert(line.contains("proc_cpu_sec"), "run-wide CPU must survive")
    val (n, _, decodedWall) = BenchFormat.decodeTail(line)
    val decodedCpu = BenchFormat.decodeTailCpu(line)
    assert(n == 209 && decodedWall.size == 209)
    assert(decodedCpu.size == 209, "per-query cpu map lost")
    for (name <- names) {
      val k = name.takeWhile(_ != '_')
      assert(math.abs(decodedWall(k) - wall(name)) <= 0.05 + 1e-9)
      assert(math.abs(decodedCpu(k) - cpu(name)) <= 0.05 + 1e-9,
        s"$name: cpu ${decodedCpu(k)} vs ${cpu(name)} — coarser than ds")
    }
  }

  test("small suites carry full-precision walls AND an object cpu map") {
    val (names, wall) = synthetic(20)
    val cpu = names.map(n => n -> wall(n) * 3.7).toMap
    val line = BenchFormat.tailLine(names, wall, wall.values.sum, 20,
      "sf0.1", cpu, loadBlock)
    assert(line.contains(""""cpu":{"""), "tier 1 carries the cpu object")
    val decodedCpu = BenchFormat.decodeTailCpu(line)
    for (name <- names)
      assert(math.abs(decodedCpu(name.takeWhile(_ != '_')) - cpu(name))
        <= 0.005 + 1e-9)
  }

  test("cpu drops LAST: an oversized suite sacrifices the cpu map before " +
      "any wall resolution, and the wall map stays whole") {
    val (names, wall) = synthetic(350)
    val cpu = names.map(n => n -> wall(n) * 31.0).toMap
    val line = BenchFormat.tailLine(names, wall, wall.values.sum, 350,
      "sf0.1", cpu, loadBlock)
    assert(line.length <= BenchFormat.Budget, s"line is ${line.length} chars")
    val (n, _, decodedWall) = BenchFormat.decodeTail(line)
    assert(n == 350 && decodedWall.size == 350, "wall map must never shrink")
    for (name <- names)
      assert(math.abs(decodedWall(name.takeWhile(_ != '_')) - wall(name))
        <= 0.05 + 1e-9)
    // whether cpu fit is size-dependent; what is PINNED is that walls
    // survive whole and the load block still rides when cpu drops
    assert(line.contains(""""load":{"""))
  }

  test("non-numeric keys with cpu: whichever object tier fits, both maps " +
      "round-trip at their unit (the c_unit path)") {
    // duplicate qNNN prefixes force full keys — the packed tier is
    // unavailable, so cpu must ride an object form or drop cleanly
    val names = (1 to 70).map(i => s"qx${i}_alpha") :+ "qx1_beta"
    val wall = names.map(n => n -> 7.77).toMap
    val cpu = names.map(n => n -> 24.6).toMap
    val line = BenchFormat.tailLine(names, wall, 0.0, names.size, "sf0.1",
      cpu, loadBlock)
    assert(line.length <= BenchFormat.Budget, s"line is ${line.length} chars")
    val (_, _, decodedWall) = BenchFormat.decodeTail(line)
    assert(decodedWall.size == names.size)
    assert(decodedWall.values.forall(v => math.abs(v - 7.77) <= 0.05 + 1e-9))
    val decodedCpu = BenchFormat.decodeTailCpu(line)
    if (decodedCpu.nonEmpty) // fits at this size; walls never depend on it
      assert(decodedCpu.values.forall(v => math.abs(v - 24.6) <= 0.1 + 1e-9),
        s"cpu decoded ${decodedCpu.values.head}")
  }

  test("a tail WITHOUT cpu/load (pre-r15 artifact) still decodes; " +
      "decodeTailCpu reads empty, not an error") {
    val (names, wall) = synthetic(100)
    val line = BenchFormat.tailLine(names, wall, wall.values.sum, 100, "sf0.1")
    assert(BenchFormat.decodeTailCpu(line).isEmpty)
    assert(BenchFormat.decodeTail(line)._3.size == 100)
  }

  test("non-numeric key residue falls back to the object ds tier, " +
      "never integer seconds") {
    // duplicate qNNN prefixes force full keys; the coarsest object tier
    // must still be deciseconds (unit-tagged), not integer seconds
    val names = (1 to 240).map(i => s"qx${i}_alpha") :+ "qx1_beta"
    val wall = names.map(n => n -> 12.34).toMap
    val line = BenchFormat.tailLine(names, wall, 0.0, names.size, "sf0.1")
    val (_, _, decoded) = BenchFormat.decodeTail(line)
    assert(decoded.values.forall(v => math.abs(v - 12.3) < 1e-9),
      "ds tier must preserve the first decimal")
  }
}
