package graft.tjk.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Random-hyperplane (sign-LSH) signature over an `array<float>` embedding:
  * for each hyperplane p, emits '1' if Σᵢ e[i]·w[p][i] ≥ 0 else '0', as a
  * single nPlanes-char string — the LSH key material for embedding near-dup
  * bucketing (VectorOps.cosineNearDupPairsLsh).
  *
  * Same escalation rationale as [[CosineSimilarity]]: the composable HOF form
  * (`transform(planes, w -> aggregate(zip_with(e, w, *), 0d, +))`) evaluates
  * interpreted with one boxed lambda call per element per plane — 64 planes ×
  * 64 dims = 4096 boxed ops per ROW on the hot path. This expression fuses
  * all plane dots into one primitive loop nest inside WholeStageCodegen.
  * Arithmetic is per-element float→double promotion and sequential
  * index-order sums — the same convention the DuckDB oracle replicates.
  *
  * `planes` must be a foldable literal of `array<array<float>>` (the
  * deterministic Rademacher matrix from [[VectorOps.hyperplanes]]); it is
  * materialized once at construction/codegen, never per row.
  *
  * Null semantics: null array → null; any null element → null; dimension
  * mismatch vs the plane matrix → error (dimension bug, fail loudly).
  */
case class HyperplaneSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val okChild = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val okPlanes = right.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => right.foldable
      case _ => false
    }
    if (okChild && okPlanes) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, literal array<array<float>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "tjk_hyperplane_sig"

  /** The plane matrix, materialized once from the foldable literal. */
  @transient private lazy val mat: Array[Array[Float]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(p => ad.getArray(p).toFloatArray())
  }

  private def compute(arr: ArrayData, planes: Array[Array[Float]]): UTF8String = {
    val dim = planes(0).length
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"tjk_hyperplane_sig: dimension mismatch ${arr.numElements()} vs $dim")
    val out = new Array[Byte](planes.length)
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var d = 0.0
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) return null
        d += arr.getFloat(i).toDouble * w(i).toDouble
        i += 1
      }
      out(p) = if (d >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromBytes(out)
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) null else compute(a.asInstanceOf[ArrayData], mat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val planesRef = ctx.addReferenceObj("planes", mat, "float[][]")
    val childGen = left.genCode(ctx)
    val arr = childGen.value
    val p = ctx.freshName("p")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    val w = ctx.freshName("w")
    val dim = ctx.freshName("dim")
    val out = ctx.freshName("out")
    val bad = ctx.freshName("bad")
    ev.copy(code =
      code"""
           |${childGen.code}
           |boolean ${ev.isNull} = ${childGen.isNull};
           |UTF8String ${ev.value} = null;
           |if (!${ev.isNull}) {
           |  final int $dim = $planesRef[0].length;
           |  if ($arr.numElements() != $dim) {
           |    throw new IllegalArgumentException(
           |      "tjk_hyperplane_sig: dimension mismatch " + $arr.numElements() + " vs " + $dim);
           |  }
           |  final byte[] $out = new byte[$planesRef.length];
           |  boolean $bad = false;
           |  for (int $p = 0; $p < $planesRef.length && !$bad; $p++) {
           |    final float[] $w = $planesRef[$p];
           |    double $d = 0.0;
           |    for (int $i = 0; $i < $dim; $i++) {
           |      if ($arr.isNullAt($i)) { $bad = true; break; }
           |      $d += ((double) $arr.getFloat($i)) * ((double) $w[$i]);
           |    }
           |    if (!$bad) { $out[$p] = $d >= 0 ? (byte) '1' : (byte) '0'; }
           |  }
           |  if ($bad) { ${ev.isNull} = true; }
           |  else { ${ev.value} = UTF8String.fromBytes($out); }
           |}
         """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneSignature =
    copy(left = newLeft, right = newRight)
}
