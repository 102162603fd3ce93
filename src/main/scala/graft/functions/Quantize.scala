package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Symmetric per-vector int8 scalar quantization (SQ8) of a double
  * vector: q_i = round(x_i * 127 / max|x|), the standard
  * memory-footprint path for billion-vector ANN — the quantized
  * corpus is 8× smaller than float64 (4× vs float32), so the scan
  * side of a top-k fits in memory at corpus sizes where full vectors
  * do not. Cosine under symmetric quantization is SCALE-FREE
  * (the per-vector scale cancels in q·q′/‖q‖‖q′‖), so the quantized
  * relation alone supports approximate scoring; exact re-ranking
  * fetches full vectors for the few candidates only
  * ([[graft.operators.Similarity.sq8TopK]]).
  *
  * Deterministic: round-half-up on the scaled magnitude (Math.round),
  * all-zero vectors quantize to all zeros, and a null ELEMENT yields
  * NULL for the row (the [[SortedJaccard]] contract — parquet-read
  * embeddings carry containsNull=true). One primitive pass per row. */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var absMax = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val a = math.abs(v.getDouble(i))
      if (a > absMax) absMax = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (absMax > 0.0) {
      val s = 127.0 / absMax
      i = 0
      while (i < n) {
        out(i) = Math.round(v.getDouble(i) * s).toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeExpr", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData r = $ref.compute($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)

  override def prettyName: String = "quantize_int8"
}

/** Cosine similarity of two SQ8-quantized vectors: Σ qa·qb /
  * (‖qa‖·‖qb‖) over the int8 codes — an integer dot product plus two
  * integer norms in one primitive pass (the per-vector quantization
  * scales cancel, see [[QuantizeInt8]]). NULL when either norm is
  * zero (cosine undefined — the all-zero vector) or on a null
  * element; raises on a length mismatch like [[DotProduct]]. */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<tinyint>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"quantized_cosine length mismatch: $n vs ${b.numElements()}")
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // single sqrt of the norm product: self-cosine is exactly 1.0
    // (na² is an exact double for any realistic dim), and one sqrt
    // beats two on the corpus-scan hot path. No long overflow:
    // na·nb ≤ (127²·n)² stays under 2⁶³ for n up to ~20M elements.
    if (na == 0L || nb == 0L) null
    else dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qcosExpr", this, classOf[QuantizedCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = $ref.compute($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) r).doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantized_cosine"
}

object Quantize {
  /** Column API: int8 codes of an array<double> vector. */
  def int8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))

  /** Column API: cosine of two int8 code arrays. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedCosine(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
