package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog as a typed `Aggregator` — the custom-aggregation leg of
  * the extension surface (next to the codegen expressions and the
  * optimizer rule): 64 six-bit registers in a 64-byte buffer, mergeable
  * by elementwise max, so it drops into any `groupBy.agg`, windowed
  * streaming aggregation (state = the constant-size buffer), or
  * `Dataset.select` via [[column]].
  *
  * Bit-for-bit identical to the relational [[Sketches.hllDistinct]]:
  * same md5-derived 60-bit hash split (6-bit register index, 54-bit
  * suffix), same rho, same raw-estimate constant and linear-counting
  * branch, same HALF_UP 4 dp rounding — so the SAME DuckDB oracle
  * covers both forms (q112 the relational, q145 this one).
  */
object HllAggregator extends Aggregator[String, Array[Byte], Double] {

  override def zero: Array[Byte] = new Array[Byte](64)

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"$b%02x"))
    sb.toString
  }

  override def reduce(b: Array[Byte], key: String): Array[Byte] = {
    val h = java.lang.Long.parseLong(md5Hex(key).substring(0, 15), 16)
    val idx = (h >>> 54).toInt
    val w = h & ((1L << 54) - 1)
    val rho =
      if (w == 0) 55
      else 54 - (63 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > b(idx)) b(idx) = rho.toByte
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 64) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Byte]): Double = {
    var s = 0L
    var nz = 0
    r.foreach { rho =>
      s += 1L << (55 - rho)
      if (rho == 0) nz += 1
    }
    val er = 0.709 * 4096.0 * math.pow(2.0, 55) / s.toDouble
    val est =
      if (er <= 160.0 && nz > 0) 64.0 * math.log(64.0 / nz) else er
    // Spark's round(): decimal-text BigDecimal, HALF_UP
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form for untyped `groupBy.agg` use. */
  def column(c: Column): Column = udaf(HllAggregator).apply(c)
}
