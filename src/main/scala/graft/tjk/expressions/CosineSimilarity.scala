package graft.tjk.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native cosine similarity over two `array<float>` columns, with
  * whole-stage codegen (SURVEY.md §4.3 escalation path (b): a custom scalar
  * Expression where the built-ins can't express the op efficiently).
  *
  * The composable form — `aggregate(zip_with(a,b,*), 0d, +)` — is evaluated
  * interpreted, one boxed lambda call per element (~200µs per 64-dim pair
  * measured on this image); this expression fuses dot + both norms into one
  * primitive loop inside WholeStageCodegen (~0.1µs). Arithmetic is identical
  * (per-element float→double promotion, sequential index-order sums,
  * `dot/(sqrt(na)*sqrt(nb))`), so results are bit-equal to the reference
  * form and the DuckDB oracle.
  *
  * Null semantics: null array → null; any null element → null; mismatched
  * lengths → error (dimension bug, fail loudly).
  *
  * Zero-norm semantics (stated — every cosine path in the library follows
  * the SAME convention): an all-zero vector has no direction, so its
  * similarity to anything is defined as 0.0. Without the guard the three
  * implementations would disagree three ways on the same input: this
  * expression would emit NaN (which Spark sorts ABOVE every real value —
  * a zero vector would rank as everyone's #1 neighbor), the HOF form
  * would throw DIVIDE_BY_ZERO under Spark 4's default ANSI mode, and the
  * primitive test path would silently drop the pair.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes needs private[sql] AbstractDataType — check manually.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tjk_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"tjk_cosine: dimension mismatch $n vs ${y.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "tjk_cosine: dimension mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (!${ev.isNull}) {
         |  final double ${dot}_den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ${dot}_den == 0.0 ? 0.0 : $dot / ${dot}_den;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration so the expression is reachable from the
  * public Column API (and SQL) without a Catalyst fork: the same injection
  * point `SparkSessionExtensions.injectFunction` uses.
  */
object NativeFunctions {
  val cosineName = "tjk_cosine"
  val hyperplaneSigName = "tjk_hyperplane_sig"
  val windowNUniqueName = "tjk_window_nunique"
  val minhashSigName = "tjk_minhash_sig"
  val simhashName = "tjk_simhash"

  @volatile private var registeredIn: SparkSession = null

  def register(spark: SparkSession): Unit = {
    // Idempotence guard: re-registration is harmless but logs a WARN per
    // call; skip when this session already holds the functions.
    if (registeredIn eq spark) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      cosineName,
      { exprs: Seq[Expression] => CosineSimilarity(exprs(0), exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      hyperplaneSigName,
      { exprs: Seq[Expression] => HyperplaneSignature(exprs(0), exprs(1)) },
      "built-in")
    // Aggregate functions are returned bare; the analyzer wraps them in an
    // AggregateExpression at resolution (same as the builtin registry).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      windowNUniqueName,
      { exprs: Seq[Expression] => WindowNUnique(exprs(0)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      minhashSigName,
      { exprs: Seq[Expression] => MinHashSig(exprs(0), exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      simhashName,
      { exprs: Seq[Expression] => SimHashAgg(exprs(0)) },
      "built-in")
    registeredIn = spark
  }

  /** Column-API handle: cosineNative($"a", $"b") (requires register()). */
  def cosineNative(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function => cf}
    cf(cosineName, a, b)
  }

  /** Column-API handle for the sign-LSH signature: the plane matrix is
    * passed as a typed literal so the expression sees a foldable constant.
    */
  def hyperplaneSigNative(
      spark: SparkSession, e: Column, planes: Seq[Seq[Float]]): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function => cf, typedlit}
    cf(hyperplaneSigName, e, typedlit(planes))
  }

  /** Column-API handle for the whole-signature MinHash aggregate:
    * element j of minhashSigNative($"g", k) over a group ≡
    * min(md5(concat(s"$j:", $"g"))) over that group's grams.
    */
  def minhashSigNative(spark: SparkSession, g: Column, k: Int): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function => cf, lit}
    cf(minhashSigName, g, lit(k))
  }

  /** Column-API handle for the SimHash fold aggregate over 64-bit token
    * hashes: bit i of simhashNative($"h") ≡ (Σ ((h>>i)&1 ? 1 : −1)) > 0.
    */
  def simhashNative(spark: SparkSession, h: Column): Column = {
    register(spark)
    import org.apache.spark.sql.functions.{call_function => cf}
    cf(simhashName, h)
  }
}
