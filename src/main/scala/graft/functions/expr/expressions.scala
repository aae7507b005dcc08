package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for graft's hot paths. Each emits a
  * direct static call in whole-stage codegen (preference order from
  * the build notes: compose built-ins > custom Expression > custom
  * plan > mapPartitions). Scalar-function surface mirrors the
  * reference's function registry idea
  * (/root/reference/src/operators/scalar/funcs.rs:9) extended with
  * the pipeline hashes the reference lacks.
  */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftHash.fnv64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.fnv64($c)")
  override protected def withNewChildInternal(c: Expression): Fnv64 = copy(child = c)
}

case class PolyFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftHash.polyFingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.polyFingerprint($c)")
  override protected def withNewChildInternal(c: Expression): PolyFingerprint = copy(child = c)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftHash.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Distinct word n-gram shingle hashes in one pass — replaces the
  * split→sequence→transform→array_distinct→explode→hash composite
  * with a single byte-level kernel (no intermediate string arrays).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftHash.shingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** Morton/Z-order code of two long columns (low 32 bits each). */
case class ZOrder(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftHash.mortonInterleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.mortonInterleave($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder =
    copy(left = l, right = r)
}

case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}

case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftVec.norm(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.norm($c)")
  override protected def withNewChildInternal(c: Expression): VectorNorm = copy(child = c)
}

/** Fused set-Jaccard over long-hash arrays; the FuseJaccard optimizer
  * rule rewrites size(array_intersect)/size(array_union) composites
  * into this (one sort-merge pass instead of two hash-set builds).
  */
case class JaccardHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftVec.jaccardLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.jaccardLongs($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardHashes =
    copy(left = l, right = r)
}

/** `yyyy-MM-dd HH:mm:ss` UTC rendering of a timestamp column via the
  * integer-math kernel — replaces date_format's DateTimeFormatter on
  * string-timestamp hot paths (bit-identical in a UTC session).
  */
case class FormatTimestamp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftHash.fmtTimestamp(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.fmtTimestamp($c)")
  override protected def withNewChildInternal(c: Expression): FormatTimestamp = copy(child = c)
}

/** Banded-LSH bucket keys (one array<long> of `tables` keys) of a
  * float-vector column in one codegen pass — the index-build kernel
  * for OR-ed multi-table random-hyperplane LSH.
  */
case class LshBucketKeys(child: Expression, tables: Int, bits: Int) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftVec.lshKeys(v.asInstanceOf[ArrayData], tables, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.lshKeys($c, $tables, $bits)")
  override protected def withNewChildInternal(c: Expression): LshBucketKeys = copy(child = c)
}

/** PQ assignment over a float-vector column: argmin centroid per
  * subspace + total reconstruction error, one primitive pass (see
  * GraftVec.pqAssign). The codebook rides along as a referenced
  * object so generated code calls the kernel with a plain double[].
  * The constructor takes an IndexedSeq (not Array) so the case-class
  * equals/hashCode compare codebook CONTENTS — an Array field would
  * compare by reference identity and defeat canonicalization /
  * common-subexpression elimination across separately-built but
  * identical codebooks.
  */
case class PqAssign(child: Expression, cb: IndexedSeq[Double], m: Int, k: Int)
    extends UnaryExpression {
  require(cb.length % k == 0 && (cb.length / k) % m == 0,
    s"codebook length ${cb.length} must be k=$k rows of a dim divisible by m=$m")
  @transient private lazy val cbArr: Array[Double] = cb.toArray
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("codes",
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
      nullable = false),
    org.apache.spark.sql.types.StructField("recon_err", DoubleType,
      nullable = false)))
  // float input = raw embeddings; double input = residual vectors
  private def isDouble: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def kernel: String = if (isDouble) "pqAssignD" else "pqAssign"
  override protected def nullSafeEval(v: Any): Any =
    if (isDouble) graft.functions.GraftVec.pqAssignD(v.asInstanceOf[ArrayData], cbArr, m, k)
    else graft.functions.GraftVec.pqAssign(v.asInstanceOf[ArrayData], cbArr, m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.$kernel($c, $cbRef, $m, $k)")
  }
  override protected def withNewChildInternal(c: Expression): PqAssign = copy(child = c)
}

/** y = R·x against a row-major d×d matrix rider (the OPQ rotation
  * apply): one codegen kernel call per row, double output so the
  * PqAssign/PqCodes residual (double-input) kernels chain directly.
  * Matrix as IndexedSeq for content-equality — same canonicalization
  * rationale as [[PqAssign]]'s codebook.
  */
case class MatVec(child: Expression, mat: IndexedSeq[Double], d: Int)
    extends UnaryExpression {
  require(mat.length == d * d, s"matrix length ${mat.length} != $d x $d")
  @transient private lazy val matArr: Array[Double] = mat.toArray
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  private def isDouble: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftVec.matVec(v.asInstanceOf[ArrayData], matArr, d, isDouble)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("opqRotation", matArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftVec.matVec($c, $mRef, $d, $isDouble)")
  }
  override protected def withNewChildInternal(c: Expression): MatVec = copy(child = c)
}

/** Codes-only PQ assignment of a vector column to m BYTES (binary) —
  * the stored-index write kernel. Same codebook-as-IndexedSeq
  * contract as [[PqAssign]]; float input = raw embeddings, double
  * input = residual vectors.
  */
case class PqCodes(child: Expression, cb: IndexedSeq[Double], m: Int, k: Int)
    extends UnaryExpression {
  require(k <= 256 && cb.length % k == 0 && (cb.length / k) % m == 0,
    s"codebook length ${cb.length} must be k=$k (<=256) rows of a dim divisible by m=$m")
  @transient private lazy val cbArr: Array[Double] = cb.toArray
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  private def isDouble: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(v: Any): Any =
    graft.functions.GraftVec.pqCodesBytes(v.asInstanceOf[ArrayData], cbArr, m, k, isDouble)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftVec.pqCodesBytes($c, $cbRef, $m, $k, $isDouble)")
  }
  override protected def withNewChildInternal(c: Expression): PqCodes = copy(child = c)
}

/** ADC distance of stored byte codes against the slot-major flat LUT
  * table (`slot` picks the probed cell's m×k block) — the search-scan
  * kernel over the codes table: m loads + m adds per row, whole-stage
  * codegen, the embedding column never read.
  */
case class AdcDist(left: Expression, right: Expression, luts: IndexedSeq[Double],
    m: Int, k: Int) extends BinaryExpression {
  require(luts.length % (m * k) == 0,
    s"luts length ${luts.length} must be a multiple of m*k=${m * k}")
  @transient private lazy val lutArr: Array[Double] = luts.toArray
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(codes: Any, slot: Any): Any =
    graft.functions.GraftVec.adcLookup(codes.asInstanceOf[Array[Byte]],
      slot.asInstanceOf[Int], lutArr, m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("adcLuts", lutArr, "double[]")
    defineCodeGen(ctx, ev,
      (c, s) => s"graft.functions.GraftVec.adcLookup($c, $s, $lutRef, $m, $k)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcDist =
    copy(left = l, right = r)
}

/** Banded edit distance with early abandon — exact when ≤ bound,
  * else bound+1 (see GraftHash.boundedLevenshtein). The ER candidate
  * join's inner kernel: builtin levenshtein fills the full n×m
  * lattice for pairs the band rejects after one row. */
case class BoundedLevenshtein(left: Expression, right: Expression,
    bound: Int) extends BinaryExpression {
  // validated HERE (bound is a plan-time constant), not per row in
  // the kernel: negative bounds would silently return 0 for every
  // pair, and the kernel's cell updates compute (bound+1)+1, so the
  // bound must leave headroom below Int.MaxValue — capped at 2^20
  // (far past any real edit budget; matches the kernel's own guard)
  require(bound >= 0 && bound <= graft.functions.GraftHash.LevenshteinBoundMax,
    s"need 0 <= bound <= ${graft.functions.GraftHash.LevenshteinBoundMax}, got $bound")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftHash.boundedLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], bound)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHash.boundedLevenshtein($a, $b, $bound)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BoundedLevenshtein =
    copy(left = l, right = r)
}

/** Textbook Jaro-Winkler similarity — the standard record-linkage
  * name scorer (see GraftHash.jaroWinkler: UTF-8 byte-level like
  * DuckDB's jaro_winkler_similarity, bit-identical to it on all
  * input, zero per-row String allocation). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftHash.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHash.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

/** TRUE (unrestricted) Damerau-Levenshtein distance — see
  * GraftHash.damerauLevenshtein: UTF-8 byte-level like DuckDB's
  * damerau_levenshtein, bit-identical to it; transposition-aware
  * edit distance for the most common human typo class. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftHash.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftHash.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

/** First index where two long-array columns agree (-1 if none) — the
  * per-row dedup predicate of multi-table LSH candidate generation.
  */
case class FirstMatch(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftVec.firstMatch(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.firstMatch($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FirstMatch =
    copy(left = l, right = r)
}

/** d16's span surgery as one codegen byte pass: cut sorted disjoint
  * word-index spans out of a text column — see GraftHash.spanCut.
  * struct(clean_text, n_words, n_removed) out.
  */
case class SpanCut(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("clean_text",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_words", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_removed", LongType, nullable = false)))
  override protected def nullSafeEval(t: Any, s: Any, e: Any): Any =
    graft.functions.GraftHash.spanCut(t.asInstanceOf[UTF8String],
      s.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, e) => s"graft.functions.GraftHash.spanCut($t, $s, $e)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SpanCut = copy(first = f, second = s, third = t)
}

case class VectorCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.GraftVec.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorCosine =
    copy(left = l, right = r)
}
