package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_max_multiplicity(array<string>) -> int`: the count of the most
  * frequent element, in ONE hash-counting pass. Replaces the
  * `array_max(transform(array_distinct(bg), b -> size(filter(bg, _ = b))))`
  * composition — interpreted higher-order functions with O(distinct x n)
  * string comparisons per row (the doc_repetition top-bigram share was
  * 3.6 s at sf0.1 for what is a linear scan). NULL elements are skipped,
  * matching the SQL composition (x = b is never true for NULL); an
  * empty/all-NULL array yields 0.
  */
case class MaxMultiplicity(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = IntegerType

  // Analysis-time type check: the kernel reads UTF8String slots from the
  // UnsafeArrayData buffer; on any other element type it would
  // reinterpret raw bytes. SQL-registered, so misuse must fail early.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(a: Any): Any =
    MaxMultiplicity.maxCount(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MaxMultiplicity.maxCount($a);")

  override protected def withNewChildInternal(
      newChild: Expression): MaxMultiplicity = copy(child = newChild)

  override def prettyName: String = "graft_max_multiplicity"
}

object MaxMultiplicity {
  def maxCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val m = new java.util.HashMap[UTF8String, Int](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val c = m.merge(k, 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  def column(c: Column): Column =
    GraftSqlBridge.column(MaxMultiplicity(GraftSqlBridge.expression(c)))
}

/** `graft_sorted_intersect_size(array<string>, array<string>) -> int`:
  * intersection cardinality of two DISTINCT, ASCENDING-SORTED string
  * arrays (i.e. `array_sort(array_distinct(...))` outputs — the same
  * binary UTF8 order array_sort uses) by a single merge pass. Replaces
  * `size(array_intersect(a, b))` in the set-similarity verify join,
  * where the built-in's per-row hash-set build was ~100x the cost of
  * the merge (dedup_prefix_jaccard spent 33 of its 41 s there at
  * sf0.1). Contract: inputs sorted + distinct; NULL elements are
  * skipped; a NULL array yields NULL.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = IntegerType

  // SQL-registered with a confusable `_long` twin: declare the element
  // type so calling this on array<bigint> (which would reinterpret the
  // UnsafeArrayData buffer via getUTF8String) is an analysis error.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.interSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectSize.interSize($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_size"
}

object SortedIntersectSize {
  def interSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectSize(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `graft_sorted_intersect_size_long(array<bigint>, array<bigint>) -> int`:
  * the [[SortedIntersectSize]] merge pass over ASCENDING-SORTED long
  * arrays — the hash-prescreen variant. dedup_prefix_jaccard's verify
  * prescreens candidate pairs on sorted xxhash64 gram arrays (8 bytes
  * per element instead of a ~20-byte string, primitive compares
  * instead of UTF8 memcmp) and only exact-verifies the survivors; the
  * MULTISET hash intersection can only ever OVERcount the true string
  * intersection (each shared gram occupies one matching hash slot on
  * both sides), so the prescreen admits every true pair by
  * construction. Contract: inputs numerically sorted; duplicates
  * (hash collisions) are counted multiset-style — that is exactly the
  * property the ≥-bound needs. Null elements are not expected (grams
  * are non-null) and count as smallest via getLong's 0 default only
  * if a caller violates that contract.
  */
case class SortedIntersectSizeLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = IntegerType

  // Twin of SortedIntersectSize's guard: getLong on array<string> slots
  // would read garbage; make the mismatch an analysis-time error.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSizeLong.interSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectSizeLong.interSize($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_size_long"
}

object SortedIntersectSizeLong {
  def interSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectSizeLong(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `graft_gram_count_sig(array<string>) -> binary(256)`: a 256-bucket
  * byte histogram of xxhash64(gram) — the per-doc SUFFIX-FILTER
  * signature of dedup_prefix_jaccard (the distributed adaptation of
  * PPJoin+ suffix filtering, Xiao et al. WWW'08 §4: instead of a
  * per-pair binary-search partition of the suffix — which would need
  * the gram arrays shipped into the pair join — each doc carries a
  * fixed-width count sketch and the pair join bounds the overlap by
  * the histogram-intersection Σ_k min(cA[k], cB[k])). Soundness: grams
  * in A∩B occupy the same bucket on both sides, so the Σ-min bound can
  * only OVERcount the true set intersection — a `bound >= alpha` cut
  * admits every true pair by construction (the same one-sided-error
  * contract as the xxhash64 verify prescreen). Counters saturate at
  * 255; [[SigOverlapBound]] treats a both-saturated bucket as
  * unbounded, so saturation can never flip the bound below truth.
  * NULL elements are skipped (posting-list semantics: a null gram
  * never equi-joins).
  */
case class GramCountSig(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType))

  override def nullSafeEval(a: Any): Any =
    GramCountSig.build(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramCountSig.build($a);")

  override protected def withNewChildInternal(
      newChild: Expression): GramCountSig = copy(child = newChild)

  override def prettyName: String = "graft_gram_count_sig"
}

object GramCountSig {
  /** bucket count; a power of two so the bucket index is a mask. 256
    * sizes the collision noise E[extra] ~ nA*nB/256 well under the
    * J>=0.5 overlap bound alpha = (nA+nB)/3 for gram sets up to ~160
    * elements — beyond that the filter degrades to pass-through
    * (never to false negatives).
    */
  val Buckets = 256

  def build(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val sig = new Array[Byte](Buckets)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
        val k = (h & (Buckets - 1)).toInt
        if (sig(k) != -1) sig(k) = (sig(k) + 1).toByte // saturate at 0xFF
      }
      i += 1
    }
    sig
  }

  def column(c: Column): Column =
    GraftSqlBridge.column(GramCountSig(GraftSqlBridge.expression(c)))
}

/** `graft_sig_overlap_bound(binary, binary) -> int`: the histogram-
  * intersection upper bound Σ_k min(cA[k], cB[k]) over two
  * [[GramCountSig]] signatures. Returns Int.MaxValue when any bucket is
  * saturated on BOTH sides (the only case where the stored min could
  * undercount the true one) — the filter then passes the pair through
  * to the exact verify rather than risk a false negative.
  */
case class SigOverlapBound(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = IntegerType

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.BinaryType,
      org.apache.spark.sql.types.BinaryType)

  override def nullSafeEval(a: Any, b: Any): Any =
    SigOverlapBound.bound(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigOverlapBound.bound($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigOverlapBound =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sig_overlap_bound"
}

object SigOverlapBound {
  def bound(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var acc = 0
    var k = 0
    while (k < n) {
      val va = a(k) & 0xFF
      val vb = b(k) & 0xFF
      if (va == 255 && vb == 255) return Int.MaxValue
      acc += math.min(va, vb)
      k += 1
    }
    acc
  }

  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(SigOverlapBound(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
