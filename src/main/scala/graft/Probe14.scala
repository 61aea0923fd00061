package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}

/** Round-14 scratch probe (deleted before close). */
object Probe14 {
  def main(args: Array[String]): Unit = {
    def part(b: Long, c: Long): Int = {
      val h = Murmur3Hash(Seq(Literal(b * c)), 42).eval(null).asInstanceOf[Int]
      val m = h % 8; if (m < 0) m + 8 else m
    }
    val cs = (1L to 100000L).filter { c =>
      (0L until 8L).map(b => part(b, c)).toSet.size == 8
    }.take(5)
    println("PROBE perfect-hash multipliers: " + cs.mkString(", "))
    cs.headOption.foreach { c =>
      println("PROBE mapping for C=" + c + ": " +
        (0L until 8L).map(b => s"$b->${part(b, c)}").mkString(" "))
    }
  }
}
