package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Basket

/** Hand-computed market-basket math on a toy basket set. */
class BasketSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  // baskets: 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b,c} 5:{a,b} — item ids
  // a=1 b=2 c=3; duplicate line rows must not inflate supports
  private def lines = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 2L),
    (3L, 1L), (3L, 3L), (4L, 2L), (4L, 3L), (5L, 1L), (5L, 2L))
    .toDF("l_orderkey", "l_partkey")

  test("associationRules: exact supports, confidence and lift both directions") {
    val r = Basket.associationRules(lines, 2L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5),
          x.getDouble(6)))).toMap
    // supp: a=4 b=4 c=3; ab=3 ac=2 bc=2; N=5
    assert(r((1L, 2L)) === ((3L, 4L, 4L, 0.75, 0.9375)))      // a→b
    assert(r((2L, 1L)) === ((3L, 4L, 4L, 0.75, 0.9375)))      // b→a
    assert(r((1L, 3L)) === ((2L, 4L, 3L, 0.5, 0.833333)))     // a→c
    assert(r((3L, 1L)) === ((2L, 3L, 4L, 0.666667, 0.833333)))// c→a
    assert(r.size === 6)
  }

  test("itemJaccardTopK: ranked desc with id tiebreak, k bound holds") {
    // jac(a,b)=3/(4+4-3)=0.6, jac(a,c)=2/(4+3-2)=0.4, jac(b,c)=0.4
    val out = Basket.itemJaccardTopK(lines, 2L, 1)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getDouble(2))))
      .toMap
    assert(out(1L) === ((2L, 0.6)))
    assert(out(2L) === ((1L, 0.6)))
    assert(out(3L) === ((1L, 0.4))) // ties 0.4 with both a,b → min id wins
  }
}
