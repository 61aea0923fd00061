package graft

import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.unsafe.types.UTF8String

/** Round-14 scratch probe (deleted before close). */
object Probe14 {
  def main(args: Array[String]): Unit = {
    val combos = Seq("Fa", "Fb", "Oa", "Ob", "Pa", "Pb")
    def part(s: String, c: Long): Int = {
      val h = Murmur3Hash(Seq(Literal.create(UTF8String.fromString(s + c),
        org.apache.spark.sql.types.StringType)), 42).eval(null).asInstanceOf[Int]
      val m = h % 6; if (m < 0) m + 6 else m
    }
    val cs = (0L to 100000L).filter { c =>
      combos.map(part(_, c)).toSet.size == 6
    }.take(5)
    println("PROBE suffixes: " + cs.mkString(", "))
    cs.headOption.foreach { c =>
      println("PROBE mapping for suffix " + c + ": " +
        combos.map(s => s"$s->${part(s, c)}").mkString(" "))
    }
  }
}
