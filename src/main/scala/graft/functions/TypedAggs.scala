package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the Dataset-typed aggregation surface (compile-time
  * field checks), complementing the Column-based API. Used where a case
  * class models the row and the aggregation state is richer than a column
  * expression: here, a numerically-stable mean/variance accumulator
  * (Welford) usable as both a typed fold and a SQL UDAF.
  */
object TypedAggs {

  /** Welford running mean/variance state. */
  case class MomentState(n: Long, mean: Double, m2: Double) {
    def add(x: Double): MomentState = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      MomentState(n1, mean1, m2 + d * (x - mean1))
    }
    def merge(o: MomentState): MomentState = {
      if (n == 0) return o
      if (o.n == 0) return this
      val tot = n + o.n
      val d = o.mean - mean
      MomentState(tot, mean + d * o.n / tot,
        m2 + o.m2 + d * d * n * o.n / tot)
    }
    def variance: Double = if (n < 2) 0.0 else m2 / (n - 1)
  }

  /** mean + sample variance of a Double field, in one pass. */
  class MeanVariance[IN](f: IN => Double)
      extends Aggregator[IN, MomentState, (Double, Double)] {
    override def zero: MomentState = MomentState(0L, 0.0, 0.0)
    override def reduce(b: MomentState, a: IN): MomentState = b.add(f(a))
    override def merge(a: MomentState, b: MomentState): MomentState = a.merge(b)
    override def finish(r: MomentState): (Double, Double) = (r.mean, r.variance)
    override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
    override def outputEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** Column-usable variant over a Double column (for SQL/udaf registration). */
  object MeanVarianceOfDouble extends Aggregator[Double, MomentState, (Double, Double)] {
    override def zero: MomentState = MomentState(0L, 0.0, 0.0)
    override def reduce(b: MomentState, a: Double): MomentState = b.add(a)
    override def merge(a: MomentState, b: MomentState): MomentState = a.merge(b)
    override def finish(r: MomentState): (Double, Double) = (r.mean, r.variance)
    override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
    override def outputEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  }
}
