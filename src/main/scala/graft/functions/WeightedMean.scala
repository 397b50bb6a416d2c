package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator (SURVEY §2.6 A6 / §2.11: the reference
  * resolves aggregators by FQDN in `quantities`,
  * fitting/basic.py:292–345 — here the registry entry is a Spark
  * `Aggregator` usable via `udaf`). Weighted mean with map-side
  * partial aggregation (merge is associative+commutative). */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) 0.0 else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Name-resolved aggregator registry (the reference's FQDN dynamic
  * import surface, basic.py:336–343). */
object Aggregators {
  val registry: Map[String, Aggregator[(Double, Double), _, Double]] = Map(
    "weighted_mean" -> WeightedMean)
}
