package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(String, String)], k: Int) =
    GraphRank.kCore(edges.toDF("u", "v"), k)
      .select("node", "in_core", "core_deg")
      .as[(String, Boolean, Long)].collect()
      .map { case (n, b, d) => n -> ((b, d)) }.toMap

  test("pendant peels at k=2; the triangle survives") {
    val out = core(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")), k = 2)
    assert(out("a") === ((true, 2L)))
    assert(out("b") === ((true, 2L)))
    assert(out("c") === ((true, 2L)), "c's degree drops after d peels")
    assert(out("d") === ((false, 0L)))
  }

  test("cascading peel empties a path graph at k=2") {
    val out = core(Seq(("a", "b"), ("b", "c"), ("c", "d")), k = 2)
    assert(out.values.forall(_ == ((false, 0L))),
      "endpoints peel, exposing the middle, until nothing remains")
  }

  test("K4 is intact at k=3, empty at k=4") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b
    } yield (a, b)
    val at3 = core(k4, k = 3)
    assert(at3.values.forall(_ == ((true, 3L))))
    val at4 = core(k4, k = 4)
    assert(at4.values.forall(_ == ((false, 0L))))
  }

  test("two cores: the dense block survives while the fringe peels") {
    val block = for {
      a <- Seq("p", "q", "r", "s"); b <- Seq("p", "q", "r", "s") if a < b
    } yield (a, b)
    val fringe = Seq(("p", "x"), ("x", "y"))
    val out = core(block ++ fringe, k = 3)
    assert(Seq("p", "q", "r", "s").forall(n => out(n)._1))
    assert(!out("x")._1 && !out("y")._1)
  }
}
