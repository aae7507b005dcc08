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

  /** Jaccard similarity of two long-array sets (sort+merge, no
    * boxing). Inputs are distinct-by-construction hash sets.
    */
  def jaccardLongs(a: ArrayData, b: ArrayData): Double = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0
    var j = 0
    var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    val union = x.length + y.length - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }
}
