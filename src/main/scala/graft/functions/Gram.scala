package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One embedding row entering the Gram accumulation. */
case class GramIn(embedding: Seq[Float])

/** Exact-integer Gram (uncentered second-moment) matrix as ONE typed
  * [[Aggregator]] pass: each partition folds its vectors into a d²-long
  * accumulator (quantize once per row, then a tight d×d multiply-add loop),
  * partials merge elementwise, and the single output row carries the
  * row-major d² sums. Catalyst plans it partial+final ObjectHashAggregate,
  * so the corpus contributes ONE map-side pass and the exchange moves
  * |partitions| fixed-size arrays — no row expansion at all. This replaces
  * the in-row pair-explode formulation, whose nested higher-order functions
  * ran INTERPRETED (no whole-stage codegen for lambda functions) and
  * materialized d² structs per row: measured 9.2 s → sub-second at sf0.1
  * for the same sums.
  *
  * Quantization matches the SQL twin bit-for-bit:
  * `CAST(round(CAST(x AS DOUBLE) * scale) AS BIGINT)` rounds HALF_UP via
  * BigDecimal — `Math.round`/`rint` would diverge on half-way and
  * pathological-double cases. */
class GramAgg(qScale: Long) extends Aggregator[GramIn, Array[Long], Seq[Long]] {

  private def quant(x: Float): Long =
    java.math.BigDecimal.valueOf(x.toDouble * qScale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: GramIn): Array[Long] = {
    val e = in.embedding
    val d = e.length
    val acc = if (buf.isEmpty) new Array[Long](d * d) else buf
    require(acc.length == d * d, s"ragged embedding width: $d vs ${acc.length}")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) { q(i) = quant(e(i)); i += 1 }
    i = 0
    while (i < d) {
      val qi = q(i)
      val off = i * d
      var j = 0
      while (j < d) { acc(off + j) += qi * q(j); j += 1 }
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, "merging Gram partials of different widths")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
