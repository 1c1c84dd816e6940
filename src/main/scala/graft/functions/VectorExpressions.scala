package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the similarity-search hot loop.
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` is
  * semantically right but executes as interpreted lambdas — per-element
  * closure calls and a materialized product array per pair. At corpus x query
  * scale the dot product IS the workload, so it gets the preference-order (b)
  * treatment from the build brief: a custom `Expression` with `doGenCode`,
  * compiled into whole-stage codegen as a tight primitive loop (no
  * allocation, no virtual calls).
  *
  * Accumulation is sequential in element order, in double precision —
  * bit-identical to the higher-order-function formulation and to the DuckDB
  * oracle's ordered list fold, so swapping implementations never moves a
  * hash-compared result. Null handling also matches the HOF formulation: any
  * null element poisons the result to null (acc + null = null).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** 60-bit md5-based hash: numerically identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)::long` (TextHash's portable
  * composition and the DuckDB oracle's `CAST('0x'||substr(md5(s),1,15) AS
  * BIGINT)`) but computed straight from the digest bytes — no hex string, no
  * radix-conversion allocation. The portable interpreted chain costs ~40 us
  * per value; dedup signatures evaluate it per shingle, so it IS the
  * fingerprinting workload. First 15 hex digits = first 7.5 bytes:
  * 7 whole bytes then the high nibble of byte 7.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(input: Any): Any =
    Hash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes of s), big-endian — see class doc. */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** Cardinality of the set intersection of two string arrays — the Jaccard
  * verify's hot term. `size(array_intersect(a, b))` is semantically right
  * but materializes the intersection ArrayData per pair (and the built-in
  * walks generic element comparators); candidate-verify stages evaluate it
  * per candidate pair over ~50-element shingle arrays, so it gets the same
  * preference-order (b) treatment as the dot product: a codegen'd primitive
  * that counts matches through one hash set and allocates no output array.
  *
  * Exactly `size(array_intersect(a, b))` for every input, including
  * duplicate elements (left duplicates counted once — a seen-set guards
  * them) and null elements (counted once when present on BOTH sides,
  * matching the built-in's null semantics). Asserted in FunctionsSpec.
  */
case class IntersectCard(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_intersect_card"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectCard.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCard =
    copy(left = newLeft, right = newRight)
}

object IntersectCard {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val nb = b.numElements()
    val setB = new java.util.HashSet[UTF8String](math.max(16, nb * 2))
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else setB.add(b.getUTF8String(i))
      i += 1
    }
    val na = a.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, na * 2))
    var aNullCounted = false
    var count = 0
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !aNullCounted) { count += 1; aNullCounted = true }
      } else {
        val v = a.getUTF8String(i)
        if (setB.contains(v) && seen.add(v)) count += 1
      }
      i += 1
    }
    count
  }
}

object GraftFunctions {

  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_vec_dot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_vec_dot takes exactly 2 arguments")
      FloatVectorDot(exprs.head, exprs(1))
    })

  val hash60: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hash60"),
    new ExpressionInfo(classOf[Hash60].getName, "graft_hash60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_hash60 takes exactly 1 argument")
      Hash60(exprs.head)
    })

  val intersectCard: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_intersect_card"),
    new ExpressionInfo(classOf[IntersectCard].getName, "graft_intersect_card"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_intersect_card takes exactly 2 arguments")
      IntersectCard(exprs.head, exprs(1))
    })

  private val all = Seq(vecDot, hash60, intersectCard)

  /** Idempotently register the graft functions into an existing session (for
    * sessions not built with `spark.sql.extensions=graft.GraftExtensions`).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
    // The library's full Catalyst surface rides along: the window-rank-filter
    // -> heap-top-k optimizer rewrite plus its planner strategy.
    graft.plans.TopKRankInstall.ensureInstalled(spark)
  }
}
