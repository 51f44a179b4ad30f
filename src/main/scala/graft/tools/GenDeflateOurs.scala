package graft.tools

import graft.sources.Rfc6455

/** Prints the `ours msg=<i> <hex>` lines of the permessage-deflate
  * golden corpus (src/test/resources/deflate_golden.txt): our
  * [[Rfc6455.PmdDeflater]]'s exact bytes for the fixed interop message
  * sequence, context takeover on. Pipe the hex column through
  * `python3 tools/gen_deflate_golden.py verify-ours` to confirm a
  * foreign decompressor (Python zlib, -15) inflates them before
  * checking the lines in. The message sequence must stay in sync with
  * tools/gen_deflate_golden.py and PropertySpec's reconstruction.
  */
object GenDeflateOurs {

  /** 36 KB md5-chain filler + six 64-byte copies at back distances
    * 700..24000 (one per (2^k, 2^(k+1)] band, k=9..14), so each legal
    * server window resolves a different subset of matches and the
    * per-wb streams are pairwise distinct. Same construction as the
    * Python generator's `far_ref_message`.
    */
  def farRefMessage(): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new StringBuilder(36000 + 6 * 64)
    for (i <- 0 until 1125) {
      md.reset()
      sb.append(md.digest(s"pmd-far-$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString)
    }
    for (d <- Seq(700, 1500, 3000, 6000, 12000, 24000)) {
      val p = sb.length - d
      sb.append(sb.substring(p, p + 64))
    }
    sb.toString.getBytes("UTF-8")
  }

  def messages(): Seq[Array[Byte]] = {
    val m1 = ("the quick brown fox jumps over the lazy dog " * 40).getBytes("UTF-8")
    Seq(m1, Array.empty[Byte],
      (("the quick brown fox jumps over the lazy dog " * 40) + "tail").getBytes("UTF-8"),
      Array.empty[Byte], ("the lazy dog naps " * 100).getBytes("UTF-8"),
      farRefMessage())
  }

  def main(args: Array[String]): Unit = {
    val defl = new Rfc6455.PmdDeflater()
    messages().zipWithIndex.foreach { case (m, i) =>
      val hex = defl(m).map(b => f"$b%02x").mkString
      println(s"ours msg=$i ${if (hex.isEmpty) "empty" else hex}")
    }
  }
}
