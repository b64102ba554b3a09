package graft.control

import org.scalatest.funsuite.AnyFunSuite

class SessionDefaultsSpec extends AnyFunSuite {

  private def partitions(cores: Int, gb: Long): Long =
    SessionDefaults.settings(cores, gb)("spark.sql.shuffle.partitions").toLong

  test("cores dominate for small data; size dominates at scale") {
    assert(partitions(cores = 64, gb = 1) == 128)        // 2x cores
    // 100 TB table: 102400 GB / 200 MB-target => ~524k, capped at 200k
    assert(partitions(cores = 4000, gb = 102400) == 200000)
    // 10 TB: 10240 GB * 1024 / 200 = ~52k > 2*4000
    assert(partitions(cores = 4000, gb = 10240) == 10240L * 1024 / 200)
  }
}
