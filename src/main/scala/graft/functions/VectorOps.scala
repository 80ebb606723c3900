package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for the embedding dot product — the hot
 * kernel of `graft.similarity` (every candidate pair in ANN / near-dup
 * costs exactly one of these).
 *
 * Why a custom `Expression` (extension tier (b) of the build brief):
 *  - `aggregate`/`zip_with` HOFs are CodegenFallback — interpreted per
 *    element AND they eject the enclosing projection from whole-stage
 *    codegen (measured 61%-per-core regressions elsewhere in this repo);
 *  - the round-1 workaround (a left-associated chain of `element_at`
 *    products) stays codegen'd but materializes `dim` expression nodes
 *    per dot — 64-wide plans per pair column, duplicated at every
 *    reference, pushing wide plans toward the 64KB codegen cliff.
 * This expression is ONE node; its `doGenCode` emits a tight primitive
 * loop (`s += a[i]*b[i]`) inside whole-stage codegen.
 *
 * Semantics match the chain exactly: left-to-right in-order double
 * accumulation (bit-identical to DuckDB's `list_reduce` replay in the
 * oracle), null array -> null, null ELEMENT -> null (as a chain of
 * `element_at` sums would yield), length mismatch -> min length (arrays
 * are fixed-dim in practice).
 */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vector_dot"
  override def dataType: DataType = DoubleType

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other // rejected by checkInputDataTypes
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // null element => null result, mirroring the element_at-chain semantics
  override def nullable: Boolean = super.nullable ||
    left.dataType.asInstanceOf[ArrayType].containsNull ||
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemOf(left) == FloatType
    val rf = elemOf(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val lGet = if (elemOf(left) == FloatType) s"(double) $a.getFloat($i)"
                 else s"$a.getDouble($i)"
      val rGet = if (elemOf(right) == FloatType) s"(double) $b.getFloat($i)"
                 else s"$b.getDouble($i)"
      val nullChecks =
        if (left.dataType.asInstanceOf[ArrayType].containsNull ||
            right.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullChecks
         |  $s += $lGet * $rGet;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/**
 * Native Catalyst expression for IVF cell selection: the `nprobe` nearest
 * centroid ids of a vector, by squared-L2, ties broken toward the smaller
 * centroid id.
 *
 * Why: the Column-tree form (`Similarity.ivfAssign`/`ivfProbes`) builds
 * k·dim subtract/multiply/add nodes (8 cells × 64 dims ≈ 2k nodes) per
 * reference — big enough that Janino ICEs on the enclosing sort stage and
 * the whole stage falls back to interpreted eval. This is ONE node whose
 * `doGenCode` is a k×dim primitive loop over a referenced centroid matrix.
 *
 * Semantics are bit-identical to the chain form (pinned by
 * StatefulAndIvfSpec): per-cell d2 is the in-order left fold of
 * `(v[i]-c[i])²` with float->double casts; selection is lexicographic
 * (d2, cid) under Spark's SQL double ordering (`Double.compare`: NaN
 * sorts above everything and equal to itself, so an all-NaN row yields
 * cids 0..nprobe-1 exactly like `array_sort` in the chain and `ORDER BY`
 * in the DuckDB oracle). Null array, null element, or an array SHORTER
 * than the centroid dim (the ANSI chain would THROW there; the oracle's
 * list indexing yields all-NULL d2) -> null;
 * [[graft.similarity.Similarity.ivfAssign]] coalesces that to the
 * oracle's all-ties result. Returns `array<int>` of length
 * `min(nprobe, k)` in (d2, cid) order.
 */
case class VectorNearestCells(child: Expression,
                              centroids: Seq[Seq[Double]],
                              nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty && nprobe >= 1)

  override def prettyName: String = "vector_nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> input, got " +
        other.catalogString)
  }

  override def nullable: Boolean = super.nullable ||
    child.dataType.asInstanceOf[ArrayType].containsNull

  private val k = centroids.length
  private val dim = centroids.head.length
  // flat row-major copy — also the object referenced from generated code
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      val cv = centroids(c)
      var i = 0
      while (i < dim) { a(c * dim + i) = cv(i); i += 1 }
      c += 1
    }
    a
  }
  private val np = math.min(nprobe, k)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    if (v.numElements() < dim) return null // chain: past-end element_at -> null d2
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        val d = x - flat(c * dim + i)
        s += d * d
        i += 1
      }
      d2(c) = s
      c += 1
    }
    // np rounds of argmin under Double.compare (NaN == NaN, NaN > finite),
    // ascending-cid scan => ties keep the smaller cid — exactly the
    // chain's array_sort((d2, cid)) order
    val out = new Array[Int](np)
    val used = new Array[Boolean](k)
    var slot = 0
    while (slot < np) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) &&
            (best < 0 || java.lang.Double.compare(d2(c2), d2(best)) < 0))
          best = c2
        c2 += 1
      }
      used(best) = true; out(slot) = best
      slot += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cents = ctx.addReferenceObj("centroids", flat, "double[]")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val out = ctx.freshName("out")
      val used = ctx.freshName("used")
      val slot = ctx.freshName("slot")
      val best = ctx.freshName("best")
      val get = if (elemIsFloat) s"(double) $v.getFloat($i)"
                else s"$v.getDouble($i)"
      val nullCheck =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($v.numElements() < $dim) { ${ev.isNull} = true; }
         |double[] $d2 = new double[$k];
         |for (int $c = 0; $c < $k && !${ev.isNull}; $c++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $nullCheck
         |    double $d = $get - $cents[$c * $dim + $i];
         |    $s += $d * $d;
         |  }
         |  $d2[$c] = $s;
         |}
         |int[] $out = new int[$np];
         |if (!${ev.isNull}) {
         |  boolean[] $used = new boolean[$k];
         |  for (int $slot = 0; $slot < $np; $slot++) {
         |    int $best = -1;
         |    for (int $c = 0; $c < $k; $c++) {
         |      if (!$used[$c] && ($best < 0 ||
         |          java.lang.Double.compare($d2[$c], $d2[$best]) < 0)) $best = $c;
         |    }
         |    $used[$best] = true; $out[$slot] = $best;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNearestCells =
    copy(child = newChild)
}

/**
 * Native Catalyst expression for the LSH bucket signature: bit p is set
 * iff the in-order dot of the vector with hyperplane p is > 0.
 *
 * Why: the Column-chain form (`Similarity.lshBucketChain`) is ~dim·3
 * nodes PER PLANE (a 24-plane multi-table signature ≈ 4.6k nodes per
 * reference) — plan analysis/codegen dominated s_ann_multi. This is ONE
 * node; `doGenCode` is a planes×dim primitive loop over a referenced
 * plane matrix.
 *
 * Semantics are bit-identical to the chain (pinned by a spec test): each
 * plane's dot is the in-order left fold of `v[i]·plane[i]` with
 * float->double casts; a NULL array, any NULL element, or an array
 * SHORTER than the plane dim (the ANSI chain would THROW there; the
 * oracle's list indexing yields NULL) makes every dot NULL, so no bit is
 * set — bucket 0, exactly like the chain's
 * `when(d > 0, bit).otherwise(0)` and the DuckDB oracle's
 * `CASE WHEN d > 0 THEN bit ELSE 0 END`.
 */
case class VectorLshBucket(child: Expression, planes: Seq[Seq[Int]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63)

  override def prettyName: String = "vector_lsh_bucket"
  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float>/array<double> input, got " +
        other.catalogString)
  }

  // NULL in -> bucket 0 (chain semantics), so the result itself never nulls
  // beyond what eval returns; keep default nullability plumbing simple.
  override def nullable: Boolean = false

  private val np = planes.length
  private val dim = planes.head.length
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](np * dim)
    var p = 0
    while (p < np) {
      val pv = planes(p)
      var i = 0
      while (i < dim) { a(p * dim + i) = pv(i).toDouble; i += 1 }
      p += 1
    }
    a
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return 0L
    val v = raw.asInstanceOf[ArrayData]
    if (v.numElements() < dim) return 0L // chain: past-end element_at -> null dot
    val isF = elemIsFloat
    var bucket = 0L
    var p = 0
    while (p < np) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return 0L // null element -> every dot NULL
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * flat(p * dim + i)
        i += 1
      }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val pls = ctx.addReferenceObj("planes", flat, "double[]")
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val p = ctx.freshName("p")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val bkt = ctx.freshName("bucket")
    val nn = ctx.freshName("nullElem")
    val get = if (elemIsFloat) s"(double) $v.getFloat($i)"
              else s"$v.getDouble($i)"
    val body =
      s"""
         |long $bkt = 0L;
         |if (!${childGen.isNull} && $v.numElements() >= $dim) {
         |  boolean $nn = false;
         |  for (int $p = 0; $p < $np && !$nn; $p++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($v.isNullAt($i)) { $nn = true; break; }
         |      $s += $get * $pls[$p * $dim + $i];
         |    }
         |    if (!$nn && $s > 0) $bkt |= 1L << $p;
         |  }
         |  if ($nn) $bkt = 0L;
         |}
       """.stripMargin
    ev.copy(
      code = childGen.code + code"$body" +
        code"long ${ev.value} = $bkt;",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VectorLshBucket =
    copy(child = newChild)
}

/** Column-API surface for the native vector expressions. */
object VectorOps {

  /** In-order dot product of two float/double array columns as a single
   * codegen'd Catalyst expression node (see [[VectorDot]]). */
  def vectorDot(a: Column, b: Column): Column =
    ColumnShim.column(VectorDot(ColumnShim.expression(a),
      ColumnShim.expression(b)))

  /** The `nprobe` nearest IVF centroid ids of a vector column as a single
   * codegen'd node (see [[VectorNearestCells]]). */
  def nearestCells(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    ColumnShim.column(VectorNearestCells(ColumnShim.expression(vec),
      centroids, nprobe))

  /** The LSH bucket signature of a vector column as a single codegen'd
   * node (see [[VectorLshBucket]]). */
  def lshBucket(vec: Column, planes: Seq[Seq[Int]]): Column =
    ColumnShim.column(VectorLshBucket(ColumnShim.expression(vec), planes))
}
