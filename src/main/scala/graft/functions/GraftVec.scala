package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector kernels over Catalyst ArrayData (float arrays) —
  * called from generated code so the embedding hot path stays inside
  * whole-stage codegen with primitive access (no Array[Float] boxing).
  * At 100 TB the dot product is the innermost loop of similarity
  * search; this is why it is not a `zip_with`+`aggregate` composite.
  */
object GraftVec {

  /** Dot product, accumulated in double, left-to-right (deterministic). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }
}
