package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Per-band byte sums of a binary payload — the integer core of the media
  * perceptual hash ([[graft.operators.Multimodal.withAHash]]): band `b` of
  * `bands` covers bytes `[b·n/bands, (b+1)·n/bands)` (floor divisions, so
  * the bands partition the payload exactly; short payloads leave trailing
  * bands empty) and `out[b] = Σ unsigned(byte)` over that range. Sums are
  * exact BIGINTs (≤ 255·n, far inside int64 for any realistic blob), so
  * every downstream comparison — the band-mean-vs-global-mean hash bit —
  * is integer cross-multiplication with no float anywhere, the property
  * that lets the DuckDB oracle replay the hash bit-for-bit from
  * `ascii(substring(text, …))` on the all-ASCII corpus.
  *
  * One flat primitive loop inside whole-stage codegen (the
  * [[CharClassHistogram]] pattern), one pass per payload regardless of
  * `bands`. Null input → null.
  */
case class ByteBandSums(child: Expression, bands: Int) extends UnaryExpression {
  require(bands >= 1, "bands must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_band_sums requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length.toLong
    val sums = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val lo = (n * b / bands).toInt
      val hi = (n * (b + 1) / bands).toInt
      var i = lo
      var s = 0L
      while (i < hi) { s += (bytes(i) & 0xff).toLong; i += 1 }
      sums(b) = s
      b += 1
    }
    new GenericArrayData(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val b = ctx.freshName("b")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final long $n = (long) $bin.length;
         |final long[] $sums = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  final int $lo = (int) ($n * $b / $bands);
         |  final int $hi = (int) ($n * ($b + 1) / $bands);
         |  long $s = 0L;
         |  for (int $i = $lo; $i < $hi; $i++) {
         |    $s += (long) ($bin[$i] & 0xff);
         |  }
         |  $sums[$b] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sums);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteBandSums =
    copy(child = newChild)
}
