package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over embedding arrays.
  *
  * The similarity operators' hot loop is `Σ a[i]·b[i]` over 64-dim vectors,
  * executed corpus×queries (brute-force top-k) or corpus×planes (SRP
  * quantization). The HOF form (`aggregate` over `zip_with`) evaluates
  * interpreted — one boxed lambda call and a materialized product array per
  * element — so at bench scale it dominates the similarity queries. This
  * expression generates a flat fused multiply-add Java loop inside
  * whole-stage codegen.
  *
  * Semantics are bit-identical to the HOF form it replaces: elements widen
  * to double (exact for float), products accumulate strictly left-to-right
  * from 0.0 — the DuckDB oracle (`list_dot_product` on `::DOUBLE[]`)
  * reproduces the same IEEE sequence. Assumes equal-length arrays with no
  * null elements (embedding vectors; enforced upstream by construction).
  */
case class DotFold(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) && (rt == FloatType || rt == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_fold requires two array<float|double> inputs, got $other")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // dimension mismatch → null, like the zip_with/aggregate form this
    // replaces (a partial dot product would silently rank wrong)
    if (n != b.numElements()) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      def get(arr: String, e: Expression) =
        if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** All-subspace PQ code assignment in ONE compact expression.
  *
  * Replaces the `array(nearestCode(books(0), slice(emb, …)), …)` form —
  * m·ksub inline struct/`array_max` trees whose generated source embeds
  * every codeword's −‖c‖²/2 bias as a SCALAR literal. Two costs of that
  * form, both fixed here:
  *
  *   - the fused whole-stage method is enormous (m·ksub unrolled dot
  *     loops), which rides the C2 JIT cliff (build notes: minutes of
  *     background compilation, 30-50× interpreted until it lands);
  *   - the scalar biases make the generated SOURCE different for every
  *     freshly trained codebook, so no codegen cache can ever hit across
  *     invocations — every train/retrain/serve re-janino-compiles.
  *
  * Here the codebooks travel as one reference object (`references[…]`),
  * so the generated source is byte-identical across codebook values and
  * the per-row work is a small nested loop.
  *
  * Bit-exact contract with the form it replaces: per subspace s the score
  * of codeword c is `Σ_d book[s][c][d]·v[s·sub+d] − 0.5·Σ_d book[s][c][d]²`
  * with the dot accumulated strictly left-to-right from 0.0 (DotFold
  * order) and the bias computed at construction exactly as the literal
  * was (`0.5 * c.map(x => x*x).sum`); ties go to the LARGER code (the
  * struct `array_max` rule). Assumes no NaN scores (finite embeddings —
  * the DotFold assumption). A row whose vector length differs from
  * m·sub yields null, like a mismatched DotFold.
  */
case class NearestCodes(books: Array[Array[Array[Double]]], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.IntegerType

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_codes requires an array<float|double> input, got $other")
  }

  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** −‖c‖²/2 per codeword, exactly as the literal form computed it. */
  @transient private lazy val biases: Array[Array[Double]] =
    books.map(_.map(c => 0.5 * c.map(x => x * x).sum))

  private val sub: Int = books.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = books.length
    if (v.numElements() != m * sub) return null
    val isF = elemIsFloat
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val bias = biases(s)
      var best = 0.0
      var bi = 0
      var c = 0
      while (c < book.length) {
        val cb = book(c)
        var acc = 0.0
        var d = 0
        val off = s * sub
        while (d < sub) {
          val x = if (isF) v.getFloat(off + d).toDouble else v.getDouble(off + d)
          acc += cb(d) * x
          d += 1
        }
        val score = acc - bias(c)
        if (c == 0 || score >= best) { best = score; bi = c }
        c += 1
      }
      out(s) = bi
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
      val biasesRef = ctx.addReferenceObj("biases", biases, "double[][]")
      val get = if (elemIsFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val book = ctx.freshName("book")
      val bias = ctx.freshName("bias")
      val cb = ctx.freshName("cb")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val score = ctx.freshName("score")
      s"""
         |final int $m = $booksRef.length;
         |if ($v.numElements() != $m * $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $out = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    final double[][] $book = $booksRef[$s];
         |    final double[] $bias = $biasesRef[$s];
         |    final int $off = $s * $sub;
         |    double $best = 0.0; int $bi = 0;
         |    for (int $c = 0; $c < $book.length; $c++) {
         |      final double[] $cb = $book[$c];
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $sub; $d++) {
         |        $acc += $cb[$d] * $get($off + $d);
         |      }
         |      final double $score = $acc - $bias[$c];
         |      if ($c == 0 || $score >= $best) { $best = $score; $bi = $c; }
         |    }
         |    $out[$s] = $bi;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCodes =
    copy(child = newChild)
}

/** Argmax IVF cell of one embedding against the centroid table, returned
  * as the winning struct `(s: best dot, i: cell)`.
  *
  * Replaces `array_max(array(struct(dot(typedLit(c), emb), lit(i)) …))`
  * — numCells inline literal vectors whose generated source differs for
  * every centroid set, so the kmeans Lloyd loop re-janino-compiled its
  * assignment stage EVERY iteration and every retrain/serve against a
  * fresh quantizer missed the codegen cache (the same two costs
  * [[NearestCodes]] fixed for PQ). The centroids travel as one reference
  * object, so the generated source is byte-identical across centroid
  * values and the fused method is a small nested loop instead of a
  * numCells-way unrolled struct tree riding the C2 JIT cliff.
  *
  * Bit-exact contract with the form it replaces: score of cell i is
  * `Σ_d cents[i][d]·v[d]` accumulated strictly left-to-right from 0.0
  * (DotFold order); the winner is the struct-`array_max` rule — greatest
  * score, ties to the LARGER cell id. Assumes finite embeddings (no NaN
  * scores — the DotFold assumption; a left-fold dot from 0.0 can also
  * never produce -0.0, so primitive comparisons match Spark's ordering).
  * A row whose vector length differs from the centroid dimensionality
  * yields null, like a mismatched DotFold.
  */
case class NearestCellScore(cents: Array[Array[Double]], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  require(cents.nonEmpty, "centroids must be non-empty")

  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("i", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires an array<float|double> input, got $other")
  }

  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val dim: Int = cents.head.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val isF = elemIsFloat
    var best = 0.0
    var bi = 0
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
        acc += ct(d) * x
        d += 1
      }
      if (c == 0 || acc >= best) { best = acc; bi = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bi))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val get = if (elemIsFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val ct = ctx.freshName("ct")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val acc = ctx.freshName("acc")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = 0.0; int $bi = 0;
         |  for (int $c = 0; $c < $centsRef.length; $c++) {
         |    final double[] $ct = $centsRef[$c];
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $ct[$d] * $get($d);
         |    }
         |    if ($c == 0 || $acc >= $best) { $best = $acc; $bi = $c; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ java.lang.Double.valueOf($best), java.lang.Integer.valueOf($bi) });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellScore =
    copy(child = newChild)
}

/** Top-k probe cells of one embedding, ordered by (score desc, cell desc).
  *
  * Replaces `transform(slice(reverse(array_sort(cellScores(…))), 1, k),
  * s -> s.i)` — the multi-probe cell list — with one bounded
  * insertion-select loop whose centroids ride as a reference object (same
  * cache/JIT rationale as [[NearestCellScore]]). Order contract is the
  * reversed ascending struct sort it replaces: descending score, ties to
  * the LARGER cell id first. Scores are DotFold-order left folds; same
  * finite-embedding assumptions as [[NearestCellScore]]; length mismatch
  * yields null.
  */
case class TopCells(cents: Array[Array[Double]], k: Int, child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.IntegerType

  require(cents.nonEmpty, "centroids must be non-empty")
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_cells requires an array<float|double> input, got $other")
  }

  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val dim: Int = cents.head.length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val isF = elemIsFloat
    val cap = math.min(k, cents.length)
    val topS = new Array[Double](cap)
    val topI = new Array[Int](cap)
    var cnt = 0
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
        acc += ct(d) * x
        d += 1
      }
      // insertion position: before every entry with score <= acc (equal
      // scores — this candidate has the larger cell id, so it goes first)
      var pos = cnt
      while (pos > 0 && acc >= topS(pos - 1)) pos -= 1
      if (pos < cap) {
        var j = math.min(cnt, cap - 1)
        while (j > pos) { topS(j) = topS(j - 1); topI(j) = topI(j - 1); j -= 1 }
        topS(pos) = acc
        topI(pos) = c
        if (cnt < cap) cnt += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topI, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
      val get = if (elemIsFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val cap = ctx.freshName("cap")
      val topS = ctx.freshName("topS")
      val topI = ctx.freshName("topI")
      val cnt = ctx.freshName("cnt")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val ct = ctx.freshName("ct")
      val acc = ctx.freshName("acc")
      val pos = ctx.freshName("pos")
      val j = ctx.freshName("j")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $cap = java.lang.Math.min($k, $centsRef.length);
         |  final double[] $topS = new double[$cap];
         |  final int[] $topI = new int[$cap];
         |  int $cnt = 0;
         |  for (int $c = 0; $c < $centsRef.length; $c++) {
         |    final double[] $ct = $centsRef[$c];
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $ct[$d] * $get($d);
         |    }
         |    int $pos = $cnt;
         |    while ($pos > 0 && $acc >= $topS[$pos - 1]) $pos--;
         |    if ($pos < $cap) {
         |      for (int $j = java.lang.Math.min($cnt, $cap - 1); $j > $pos; $j--) {
         |        $topS[$j] = $topS[$j - 1]; $topI[$j] = $topI[$j - 1];
         |      }
         |      $topS[$pos] = $acc;
         |      $topI[$pos] = $c;
         |      if ($cnt < $cap) $cnt++;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($topI, $cnt));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

/** Constant-weight linear combination `Σ w_i · f_i` over feature columns.
  *
  * Replaces `feats.zip(w).map{ (f, wi) => f * lit(wi) }.reduce(_ + _)`:
  * the scalar `lit(wi)` weights inline into the generated source, so
  * every logistic-regression training iteration (weights change per
  * step) produced a DIFFERENT whole-stage source and re-janino-compiled
  * the gradient aggregation — 16 compiles per q_quality_classifier
  * invocation. The weights ride as one reference object here, making
  * the source identical across iterations (one compile, cached).
  *
  * Bit-exact: products `f_i * w_i` in declaration order, summed strictly
  * left-to-right (the `reduce` association); any null feature nulls the
  * result (Multiply/Add null propagation).
  */
case class WeightedSum(weights: Array[Double], children: Seq[Expression])
    extends Expression {
  require(weights.length == children.size, "one weight per feature")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"weighted_sum requires double inputs, got ${children.map(_.dataType)}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var acc = 0.0
    var i = 0
    while (i < weights.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      val p = v.asInstanceOf[Double] * weights(i)
      acc = if (i == 0) p else acc + p
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    val evals = children.map(_.genCode(ctx))
    val nullFlag = ctx.freshName("wsNull")
    val acc = ctx.freshName("wsAcc")
    val terms = evals.zipWithIndex.map { case (e, i) =>
      val assign = s"$acc ${if (i == 0) "=" else "+="} ${e.value} * $wRef[$i];"
      s"""
         |${e.code}
         |if (${e.isNull}) { $nullFlag = true; } else { $assign }
       """.stripMargin
    }.mkString("\n")
    val body =
      s"""
         |boolean $nullFlag = false;
         |double $acc = 0.0;
         |$terms
       """.stripMargin
    if (nullable) {
      ev.copy(code =
        code"""
          |$body
          |boolean ${ev.isNull} = $nullFlag;
          |double ${ev.value} = $acc;
        """.stripMargin)
    } else {
      ev.copy(code =
        code"""
          |$body
          |double ${ev.value} = $acc;
        """.stripMargin, isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedSum =
    copy(children = newChildren)
}

/** Asymmetric-distance (ADC) PQ score of a query embedding against one
  * row's code vector: `Σ_s Σ_d emb[s·sub+d] · books[s][codes[s]][d]`.
  *
  * Replaces the `Σ_s dot(slice(emb, …), element_at(typedLit(books(s)), …))`
  * chain — m inline literal codebook TABLES in the generated source, so
  * every freshly trained codebook produced different whole-stage source
  * (codegen cache could never hit across train/serve invocations) and the
  * fused method carried m·ksub·sub literal doubles (the C2 JIT cliff).
  * The codebooks ride as one reference object; source is byte-identical
  * across codebook values.
  *
  * Bit-exact contract with the chain it replaces: per subspace s the
  * partial is a DotFold left fold from 0.0 over the s-th slice (products
  * commute bit-exactly, so `emb·book ≡ book·emb`); subspace partials sum
  * strictly left-to-right (the `reduce(_ + _)` association). Null if
  * either input is null; a vector whose length differs from m·sub yields
  * null, like a mismatched DotFold (embeddings are fixed-Dim by
  * construction). Codes must index inside the codebook (they come from
  * [[NearestCodes]] by construction).
  */
case class AdcScore(
    books: Array[Array[Array[Double]]], left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.IntegerType

  require(books.nonEmpty, "codebooks must be non-empty")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(IntegerType, _))
        if lt == FloatType || lt == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adc_score requires (array<float|double>, array<int>) inputs, got $other")
  }

  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val sub: Int = books.head.head.length

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cs = r.asInstanceOf[ArrayData]
    val m = books.length
    if (v.numElements() != m * sub || cs.numElements() != m) return null
    val isF = elemIsFloat
    var acc = 0.0
    var s = 0
    while (s < m) {
      val row = books(s)(cs.getInt(s))
      var part = 0.0
      var d = 0
      val off = s * sub
      while (d < sub) {
        val x = if (isF) v.getFloat(off + d).toDouble else v.getDouble(off + d)
        part += x * row(d)
        d += 1
      }
      acc = if (s == 0) part else acc + part
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
      val get = if (elemIsFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val part = ctx.freshName("part")
      val off = ctx.freshName("off")
      s"""
         |final int $m = $booksRef.length;
         |if ($v.numElements() != $m * $sub || $cs.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $s = 0; $s < $m; $s++) {
         |    final double[] $row = $booksRef[$s][$cs.getInt($s)];
         |    final int $off = $s * $sub;
         |    double $part = 0.0;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      $part += $get($off + $d) * $row[$d];
         |    }
         |    $acc = ($s == 0) ? $part : $acc + $part;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED distinct string arrays, by merge scan.
  *
  * `array_intersect` builds a hash set per invocation — at millions of
  * candidate pairs (n-gram Jaccard verification) the per-row allocation
  * dominates the whole query. With both sides sorted ascending (the caller
  * sorts ONCE per document, not per pair) the count is a single
  * allocation-free merge loop over binary string comparisons. Result is
  * identical to `size(array_intersect(a, b))` on distinct arrays for any
  * element order. Assumes no null elements (shingle sets never carry them).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StringType}

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<string> inputs, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
