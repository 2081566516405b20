package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: a bottom-k sketch as an `Aggregator` — keeps the
  * k smallest values seen, with an associative+commutative merge, so it
  * runs as a partial+final aggregate like any builtin (map-side
  * combine; O(k) state per group).
  *
  * This is the blessed custom-aggregation API (`Aggregator` +
  * `functions.udaf`) a user of the engine extends when composition of
  * builtins can't express their statistic. It is deliberately NOT part
  * of the harness query surface: the query surface stays
  * builtin/codegen-only (SURVEY §2.4, README GPU posture) — the bottom-k
  * HARNESS query (`sample_bottomk`) is the windowed-builtin form of the
  * same sketch, and the spec proves this Aggregator agrees with it.
  *
  * The reduce keeps a sorted k-buffer (insertion into an Array — k is
  * small); merge concatenates and re-trims. State is a plain
  * Array[Long] so Spark's ExpressionEncoder serializes it natively.
  */
class BottomKAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0)

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length < k) (buf :+ v).sorted
    else if (v < buf.last) { val b = buf.clone(); b(k - 1) = v; b.sorted }
    else buf

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).sorted.take(k)

  override def finish(buf: Array[Long]): Array[Long] = buf

  private val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def bufferEncoder: Encoder[Array[Long]] = enc
  override def outputEncoder: Encoder[Array[Long]] = enc
}
