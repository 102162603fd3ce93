package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed element-wise vector-sum aggregation — the custom `Aggregator`
  * extension point (SURVEY §7.3): sums `array<double>` columns
  * per group with a primitive-double buffer. The idiomatic Spark shape
  * for embedding centroids: map-side partial sums (one buffer per
  * group per task), one shuffle of dim-length arrays — versus
  * posexplode + groupBy, which shuffles dim× the row count. */
object VectorAgg {

  val vectorSum: Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      def zero: Array[Double] = Array.empty

      private def addInto(buf: Array[Double], v: Seq[Double]): Array[Double] =
        if (v == null || v.isEmpty) buf
        else if (buf.isEmpty) v.toArray
        else {
          require(buf.length == v.length,
            s"vector length mismatch: ${buf.length} vs ${v.length}")
          var i = 0
          while (i < buf.length) { buf(i) += v(i); i += 1 }
          buf
        }

      def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] =
        addInto(buf, v)

      def merge(a: Array[Double], b: Array[Double]): Array[Double] =
        if (a.isEmpty) b else if (b.isEmpty) a else addInto(a, b.toSeq)

      def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

      def bufferEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Column-API form: `vector_sum(array<double>)`. */
  val vector_sum = udaf(vectorSum,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
}
