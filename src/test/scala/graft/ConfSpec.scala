package graft

import org.scalatest.funsuite.AnyFunSuite

class ConfSpec extends AnyFunSuite {

  test("parseDouble accepts finite numbers") {
    assert(Conf.parseDouble("k", "2.5") == 2.5)
    assert(Conf.parseDouble("k", " 4 ") == 4.0)
  }

  test("parseDouble rejects NaN/Infinity/garbage with the conf key named") {
    Seq("NaN", "Infinity", "-Infinity", "abc").foreach { bad =>
      val e = intercept[IllegalArgumentException](
        Conf.parseDouble("spark.graft.sq8KFactor", bad))
      assert(e.getMessage.contains("spark.graft.sq8KFactor"))
      assert(e.getMessage.contains(bad))
    }
  }

  test("parseInt / parseLong reject malformed input with the key named") {
    val e = intercept[IllegalArgumentException](Conf.parseInt("k", "1.5"))
    assert(e.getMessage.contains("k"))
    val e2 = intercept[IllegalArgumentException](Conf.parseLong("k", "nope"))
    assert(e2.getMessage.contains("nope"))
  }
}
