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

  /** Deterministic hyperplane component for random-hyperplane LSH:
    * two Wang-style integer mix rounds of (plane*64 + dim), top 11
    * bits mapped to multiples of 2^-11 in [-0.5, 0.5). Hash-derived
    * instead of RNG-derived so the DuckDB oracle can recompute the
    * planes exactly in SQL; every value is exactly
    * float-representable and all intermediates stay below 2^58 (safe
    * in signed 64-bit on both engines).
    */
  def planeComponent(p: Int, j: Int): Double = {
    val M = 4294967296L
    val x0 = ((p * 64 + j).toLong * 2654435761L) % M
    val x1 = ((x0 ^ (x0 >> 16)) * 73244475L) % M
    val x2 = ((x1 ^ (x1 >> 16)) * 73244475L) % M
    (x2 >> 21).toDouble / 2048.0 - 0.5
  }

  // plane matrices are tiny (planes x dim doubles) and derived from
  // constants, so each executor materializes its own copy on first
  // use — no broadcast, no closure capture
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  private def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((numPlanes.toLong << 32) | dim,
      _ => Array.tabulate(numPlanes)(p => Array.tabulate(dim)(j => planeComponent(p, j))))

  /** 0-based index of the first position where two long arrays agree,
    * -1 if none — the dedup predicate of OR-ed multi-table LSH: a
    * candidate pair is emitted only from its FIRST colliding table,
    * so no global distinct() of the multiplied candidate stream is
    * needed. One fused loop, no allocation (vs zip_with +
    * array_position composites). */
  def firstMatch(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }

  /** All `tables` banded-LSH bucket keys of a float vector in ONE
    * pass: table t's key packs the sign bits of the dots with
    * hyperplanes [t*bits, (t+1)*bits). OR-ed multi-table LSH — a pair
    * is a candidate if ANY table key collides — so recall is
    * 1-(1-p^bits)^tables per pair (p = 1 - angle/pi), dialable to 1,
    * while each table's bucket count 2^bits bounds per-bucket
    * quadratic work. One kernel call per row keeps the 100 TB index
    * build inside whole-stage codegen (tables*bits dot products of
    * dim mults each), embarrassingly parallel, zero shuffle.
    */
  def lshKeys(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val h = planes(tables * bits, dim)
    val keys = new Array[Long](tables)
    var t = 0
    var p = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bits) {
        val row = h(p)
        var s = 0.0
        var i = 0
        while (i < dim) { s += v.getFloat(i).toDouble * row(i); i += 1 }
        if (s > 0) key |= (1L << b)
        b += 1
        p += 1
      }
      keys(t) = key
      t += 1
    }
    ArrayData.toArrayData(keys)
  }

  /** y = M·x for a row-major d×d matrix — the OPQ rotation apply
    * (one codegen pass per row; at 100 TB rotation is a d² multiply
    * fused into the index-build scan, never a shuffle). Float or
    * double input (`isDouble`), double output so the residual-path PQ
    * kernels chain directly. Row-major accumulation left-to-right in
    * dimension order (deterministic).
    */
  def matVec(v: ArrayData, mat: Array[Double], d: Int, isDouble: Boolean): ArrayData = {
    val x = new Array[Double](d)
    var j = 0
    while (j < d) {
      x(j) = if (isDouble) v.getDouble(j) else v.getFloat(j).toDouble
      j += 1
    }
    val out = new Array[Double](d)
    var r = 0
    while (r < d) {
      val off = r * d
      var s = 0.0
      var i = 0
      while (i < d) { s += mat(off + i) * x(i); i += 1 }
      out(r) = s
      r += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Product-quantization assignment: per subspace s of m, the argmin
    * centroid over k codebook entries (L2, accumulated left-to-right
    * in dimension order — the float chain the SQL oracle replays;
    * ties keep the smallest centroid id via strict <) plus the total
    * reconstruction error summed in subspace order. `cb` is the
    * flattened j-major codebook (k rows × dim doubles). One primitive
    * loop per row replaces an m×k lattice of slice/zip_with/aggregate
    * higher-order expressions (interpreted lambdas, ~5× slower and
    * allocation-heavy) — this is the 100 TB index-build inner loop.
    * Returns [codes: array<long> (m), recon_err: double].
    */
  def pqAssign(emb: ArrayData, cb: Array[Double], m: Int, k: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val dim = emb.numElements()
    // fail fast on layout mismatch — integer division would otherwise
    // silently drop tail dimensions or read wrong codebook rows
    require(dim % m == 0 && cb.length == k * dim,
      s"pqAssign: dim=$dim not divisible by m=$m or codebook length ${cb.length} != k*dim=${k * dim}")
    val sub = dim / m
    val codes = new Array[Long](m)
    var err = 0.0
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var bestJ = -1L
      var j = 0
      while (j < k) {
        var dsum = 0.0
        var t = 0
        while (t < sub) {
          val diff = emb.getFloat(s * sub + t).toDouble - cb(j * dim + s * sub + t)
          dsum += diff * diff
          t += 1
        }
        if (dsum < bestD) { bestD = dsum; bestJ = j.toLong }
        j += 1
      }
      codes(s) = bestJ
      err += bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ArrayData.toArrayData(codes), err))
  }

  /** Codes-only PQ assignment, packed as m BYTES — the stored-index
    * layout (Jégou TPAMI'11): at 100 TB the search scan reads these m
    * bytes per vector instead of 4·dim of raw floats. Same argmin
    * chains and tie-break as [[pqAssign]]; requires k <= 256.
    */
  def pqCodesBytes(emb: ArrayData, cb: Array[Double], m: Int, k: Int,
      asDouble: Boolean): Array[Byte] = {
    val dim = emb.numElements()
    require(k <= 256, s"byte-packed PQ codes need k<=256, got $k")
    require(dim % m == 0 && cb.length == k * dim,
      s"pqCodesBytes: dim=$dim not divisible by m=$m or codebook length ${cb.length} != k*dim=${k * dim}")
    val sub = dim / m
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < k) {
        var dsum = 0.0
        var t = 0
        while (t < sub) {
          val x = if (asDouble) emb.getDouble(s * sub + t) else emb.getFloat(s * sub + t).toDouble
          val diff = x - cb(j * dim + s * sub + t)
          dsum += diff * diff
          t += 1
        }
        if (dsum < bestD) { bestD = dsum; bestJ = j }
        j += 1
      }
      out(s) = bestJ.toByte
      s += 1
    }
    out
  }

  /** Asymmetric-distance (ADC) lookup over STORED byte codes: slot
    * selects which probed cell's m×k LUT applies (slot-major flat
    * `luts`), then one table lookup per subspace summed in subspace
    * order — the same left-to-right chain the inline search and the
    * SQL oracle use. The per-row cost of the 100 TB search scan: m
    * loads + m adds over m stored bytes.
    */
  def adcLookup(codes: Array[Byte], slot: Int, luts: Array[Double],
      m: Int, k: Int): Double = {
    require(codes.length == m, s"adcLookup: expected $m code bytes, got ${codes.length}")
    require(slot >= 0 && (slot + 1) * m * k <= luts.length,
      s"adcLookup: slot=$slot out of range for luts of ${luts.length}")
    val base = slot * m * k
    var s = 0
    var sum = 0.0
    while (s < m) {
      sum += luts(base + s * k + (codes(s) & 0xff))
      s += 1
    }
    sum
  }

  /** [[pqAssign]] over an array<double> column (residual vectors in
    * IVF-PQ are centroid-subtracted doubles, not raw floats). Same
    * in-order L2 chains and strict-< tie-break.
    */
  def pqAssignD(emb: ArrayData, cb: Array[Double], m: Int, k: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val dim = emb.numElements()
    require(dim % m == 0 && cb.length == k * dim,
      s"pqAssignD: dim=$dim not divisible by m=$m or codebook length ${cb.length} != k*dim=${k * dim}")
    val sub = dim / m
    val codes = new Array[Long](m)
    var err = 0.0
    var s = 0
    while (s < m) {
      var bestD = Double.PositiveInfinity
      var bestJ = -1L
      var j = 0
      while (j < k) {
        var dsum = 0.0
        var t = 0
        while (t < sub) {
          val diff = emb.getDouble(s * sub + t) - cb(j * dim + s * sub + t)
          dsum += diff * diff
          t += 1
        }
        if (dsum < bestD) { bestD = dsum; bestJ = j.toLong }
        j += 1
      }
      codes(s) = bestJ
      err += bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ArrayData.toArrayData(codes), err))
  }
}
