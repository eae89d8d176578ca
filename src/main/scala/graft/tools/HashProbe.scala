package graft.tools

import graft.functions.Multimodal

/** Dev probe: aHash Hamming distances across the q171 fixture. */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val rows = Multimodal.imageFixtureRows
      .flatMap { case (k, b) => Option(Multimodal.aHash64(b)).map(k -> _.longValue) }
    for ((ka, ha) <- rows; (kb, hb) <- rows if ka < kb) {
      val d = java.lang.Long.bitCount(ha ^ hb)
      val bands = (0 until 4).count(i => ((ha >> (16 * i)) & 65535L) == ((hb >> (16 * i)) & 65535L))
      if (d <= 20 || ka.take(4) == kb.take(4))
        println(f"$ka%-14s $kb%-14s ham=$d%2d sharedBands=$bands")
    }
  }
}
