package graft.similarity

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Objective-law check for v16: re-run the MMR greedy in plain Scala
  * (same sequential-fold dot, same rel − max-sim objective, same
  * vec_id tie-break) over the same top-20 shortlist and require the
  * engine's HOF fold to pick the identical sequence — i.e. the deep
  * nested-lambda expression really computes Carbonell-Goldstein MMR,
  * not something that merely looks ordered. */
class MmrSpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  private val d = SparkTestBase.sfDir

  test("v16: engine picks match a driver-side greedy MMR replay") {
    val out = SimilarityQueries.v16MmrRerank.fn(s, d).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val e = graft.Tables.t(s, d, "embeddings")
    val pv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0).toArray
    val cand = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1).toArray))
      .map { case (id, v) => (id, v, dot(v, pv)) }
      .sortBy { case (id, _, rel) => (-rel, id) }
      .take(20)
    var selected = Vector.empty[(Long, Array[Double])]
    val expected = (1 to 5).map { _ =>
      val (id, v, _) = cand
        .filterNot { case (id, _, _) => selected.exists(_._1 == id) }
        .map { case (id, v, rel) =>
          val pen = if (selected.isEmpty) 0.0
            else selected.map(sv => dot(v, sv._2)).max
          (id, v, rel - pen)
        }
        .minBy { case (id, _, sc) => (-sc, id) }
      selected :+= ((id, v))
      id
    }
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == expected,
      "engine MMR sequence diverges from the driver replay")
  }
}
