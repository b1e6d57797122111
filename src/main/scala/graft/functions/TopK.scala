package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, explode, udaf}

/** One (score, id) candidate entering the top-k reduction. */
case class Scored(score: Double, id: Long)

/** One emitted neighbor with its 1-based rank. */
case class RankedId(neighbor_id: Long, rnk: Long)

/** Bounded-heap top-k as a typed [[Aggregator]] (registered via `udaf`, so
  * Catalyst plans it as a partial + final ObjectHashAggregate): each map-side
  * partition reduces its candidates to at most k before the exchange, so the
  * shuffle moves O(k × partitions × groups) rows instead of the full scored
  * set — the difference between a per-query `row_number` window (which
  * shuffles ALL N×Q scored rows into per-query partitions) and a scalable
  * top-k at 100 TB.
  *
  * Total order: score DESC, id ASC — identical to
  * `row_number() OVER (ORDER BY score DESC, neighbor_id ASC)`, so results are
  * deterministic and bit-equal to the window-function formulation (and the
  * DuckDB oracle) as long as scores themselves are deterministic. The
  * comparator follows Spark SQL's DOUBLE ordering, not Scala's: NaN ranks
  * greatest (first under DESC — e.g. a zero-norm vector's 0/0 cosine), and
  * -0.0 equals 0.0 so their tie breaks on id.
  *
  * The buffer is a plain array compacted geometrically: appends are O(1), and
  * whenever it reaches 4k the buffer is sorted and truncated to k, keeping
  * state bounded at 4k entries while averaging O(n) work per partition.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[RankedId]] {

  private val sqlDescOrdering: Ordering[Scored] = new Ordering[Scored] {
    // Spark SQL double semantics: NaN is greatest, -0.0 == 0.0.
    private def norm(x: Double): Double = if (x == 0.0) 0.0 else x
    override def compare(a: Scored, b: Scored): Int = {
      val c = java.lang.Double.compare(norm(b.score), norm(a.score))
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  private def best(buf: Seq[Scored]): Seq[Scored] =
    buf.sorted(sqlDescOrdering).take(k)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = {
    val appended = buf :+ in
    if (appended.length >= 4 * k) best(appended) else appended
  }

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = best(a ++ b)

  override def finish(buf: Seq[Scored]): Seq[RankedId] =
    best(buf).zipWithIndex.map { case (s, i) => RankedId(s.id, i + 1L) }

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[RankedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[RankedId]]()
}

object TopK {

  /** Reduce `scored(groupCol, scoreCol, idCol)` to its per-group top-k:
    * output columns (groupCol, neighbor_id, rnk) with rnk 1-based in
    * (score DESC, id ASC) order. */
  def topK(scored: DataFrame, groupCol: String, scoreCol: String, idCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored
      .groupBy(col(groupCol))
      .agg(agg(col(scoreCol), col(idCol)).as("top"))
      .select(col(groupCol), explode(col("top")).as("t"))
      .select(col(groupCol), col("t.neighbor_id").as("neighbor_id"), col("t.rnk").as("rnk"))
  }

  /** Column form for composition in ad-hoc aggregations. */
  def topKColumn(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAgg(k), Encoders.product[Scored])(score, id)
}
