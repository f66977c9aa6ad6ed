package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the edit-distance content filter.
  *
  * ED-Join's content-based mismatch filter (Xiao et al., VLDB'08 §5)
  * lower-bounds edit distance by character-frequency disagreement: a
  * single edit operation removes at most one code point from a string's
  * character multiset and inserts at most one, so it perturbs the
  * frequency vector's L1 norm by at most 2 — after e edits,
  * Σ_c |freq_a(c) − freq_b(c)| ≤ 2e, i.e. ED(a,b) ≥ ⌈L1/2⌉. Folding
  * characters into k classes (code point mod k) only merges coordinates,
  * and |Σx| ≤ Σ|x| per merged group, so the class-histogram L1 is ≤ the
  * exact character L1 — the bound survives bucketing and the filter
  * `classL1 ≤ 2d` can never drop a true ≤ d pair.
  *
  * Both expressions are one flat primitive loop inside whole-stage
  * codegen: the histogram is computed once per DOCUMENT (corpus-sized
  * pass), the L1 once per CANDIDATE PAIR over two k-int arrays — orders
  * of magnitude cheaper than the banded O(d·len) verify DP it gates.
  */

/** Per-class code-point counts of a string: out[k] = |{i : cp_i ≡ k (mod
  * classes)}|. Iterates CODE POINTS (not UTF-16 units), matching the
  * unit `levenshtein` edits operate on, so the L1-bound argument above
  * holds for any input, not just ASCII. Null input → null.
  */
case class CharClassHistogram(child: Expression, classes: Int) extends UnaryExpression {
  require(classes >= 1, "classes must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_class_histogram requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](classes)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts(cp % classes) += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |final java.lang.String $s = $str.toString();
         |final int[] $counts = new int[$classes];
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $counts[$cp % $classes]++;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharClassHistogram =
    copy(child = newChild)
}

/** Occurrence-tagged positional q-grams as a single per-row pass:
  * out[i] = (gram starting at code point i, 1-based count of that gram
  * so far). Value-identical to the declarative form
  * `posexplode(transform(sequence(...), i -> substring(text, i, q)))`
  * followed by `row_number() OVER (PARTITION BY doc, gram ORDER BY
  * pos)` — but the window form shuffles and sorts one row per GRAM
  * (corpus × avg-length rows) just to number repeats within a single
  * document, while this computes the numbering where the data already
  * is: one hash map over one document's grams, zero shuffle. Gram
  * boundaries are CODE POINTS, matching `substring`/`length` semantics.
  * Strings shorter than q yield an empty array; null input → null.
  */
case class TaggedQGrams(child: Expression, q: Int) extends UnaryExpression {
  require(q >= 1, "q must be positive")

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("gram", StringType, nullable = false),
      StructField("occ", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tagged_qgrams requires string, got $other")
  }

  /** Public so the generated code can call it: the per-document loop. */
  def build(input: UTF8String): ArrayData = {
    val s = input.toString
    // UTF-16 offsets of each code point start (+ end sentinel), so gram
    // slicing is by code point like SQL substring
    val offs = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < s.length) { offs.add(i); i += Character.charCount(s.codePointAt(i)) }
    offs.add(s.length)
    val n = offs.size - 1
    if (n < q) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashMap[String, Integer]()
    val out = new Array[Any](n - q + 1)
    var p = 0
    while (p <= n - q) {
      val gram = s.substring(offs.get(p), offs.get(p + q))
      val occ = seen.merge(gram, 1, (a, b) => a + b)
      out(p) = InternalRow(UTF8String.fromString(gram), occ.intValue())
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = build(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per ROW (document) — the per-gram loop stays in
    // compiled Scala, and the surrounding projection keeps whole-stage
    // codegen
    val ref = ctx.addReferenceObj("tqg", this, classOf[TaggedQGrams].getName)
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.build($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): TaggedQGrams =
    copy(child = newChild)
}

/** L1 distance Σ|a[i] − b[i]| between two int arrays (the class
  * histograms above). Accumulates in long so the result is exact for any
  * string lengths. Mismatched lengths → null (histograms of equal
  * `classes` never mismatch; a partial L1 would silently under-filter).
  * Nullable ELEMENTS are rejected at analysis time: `getInt` on a null
  * slot would read 0 and return a silently wrong L1 — as a filter bound
  * that's an under-filter, the worst failure mode — and every intended
  * producer ([[CharClassHistogram]]) is containsNull=false, so a nullable
  * input is a wiring bug, not data.
  */
case class L1IntDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, false), ArrayType(IntegerType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckFailure(
        "l1_int_distance requires non-nullable array elements " +
          "(containsNull=false): a null element would fold to 0 and " +
          "silently under-filter")
    case other => TypeCheckResult.TypeCheckFailure(
      s"l1_int_distance requires two array<int> inputs, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.abs(a.getInt(i).toLong - b.getInt(i).toLong)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = (long) $a.getInt($i) - (long) $b.getInt($i);
         |    $acc += ($d < 0L) ? -$d : $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1IntDistance =
    copy(left = newLeft, right = newRight)
}
