package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.TextFunctions

/** Native Catalyst expressions for the dedup signature hot loops.
  *
  * The same math is expressible with `aggregate`/`transform` higher-order
  * functions, but Spark's HOFs evaluate interpreted (no codegen) with a
  * boxed lambda call per element — for SimHash that is 60 × |tokens|
  * lambda invocations per row. These expressions generate flat Java loops
  * inside whole-stage codegen instead, keeping the array scan primitive
  * and allocation-free; outputs are bit-identical to the HOF forms (the
  * DuckDB oracles verify that every round).
  */

/** 60-bit SimHash over an array of 60-bit token hashes: bit b of the
  * output is set when strictly more than half… precisely, when
  * Σ_tokens (2·bit_b(h) − 1) > 0 (ties → 0). Null input → null; null
  * array elements are not expected (token hashes are never null).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < 60) {
      var bal = 0L
      var i = 0
      while (i < n) {
        bal += ((arr.getLong(i) >> b) & 1L) * 2L - 1L
        i += 1
      }
      if (bal > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val bal = ctx.freshName("bal")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $arr.numElements();
         |long $sig = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  long $bal = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $bal += (($arr.getLong($i) >> $b) & 1L) * 2L - 1L;
         |  }
         |  if ($bal > 0) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** MinHash signature over 32-bit base hashes: output[i] =
  * min_h (a_i·h + b_i) mod P for the affine family of
  * [[TextFunctions.minHashCoeffs]]. Empty input → empty signature;
  * null input → null.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got $other")
  }

  private val (aCoeffs, bCoeffs) = {
    val (as, bs) = TextFunctions.minHashCoeffs(k).unzip
    (as.toArray, bs.toArray)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = aCoeffs(i)
      val b = bCoeffs(i)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * arr.getLong(j) + b) % TextFunctions.MinHashP
        if (v < min) min = v
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCoeffs", aCoeffs, "long[]")
    val bRef = ctx.addReferenceObj("bCoeffs", bCoeffs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val min = ctx.freshName("min")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  long $min = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $v = ($aRef[$i] * $arr.getLong($j) + $bRef[$i])
         |      % ${TextFunctions.MinHashP}L;
         |    if ($v < $min) $min = $v;
         |  }
         |  $out[$i] = $min;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
