package graft.multimodal

/** The shared frame-fingerprint identity: md5 of the UPPERCASE hex
  * rendering of the bytes. One definition for every modality — the
  * DuckDB oracles can only md5 strings
  * (`md5(substr(hex(content), 2*off+1, 2*len))`), and Spark's `hex()`
  * produces the identical uppercase rendering, so audio and video
  * frames MUST hash through this exact identity or the oracles (and
  * cross-modality joins on fingerprints) silently diverge.
  */
private[multimodal] object BlobHex {

  def hexUpper(b: Array[Byte], off: Int, len: Int): String = {
    val sb = new java.lang.StringBuilder(len * 2)
    var i = 0
    while (i < len) { sb.append(f"${b(off + i) & 0xff}%02X"); i += 1 }
    sb.toString
  }

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .map(x => f"${x & 0xff}%02x").mkString

  /** md5-of-uppercase-hex of a byte range — the fingerprint itself. */
  def fingerprint(b: Array[Byte], off: Int, len: Int): String =
    md5Hex(hexUpper(b, off, len))
}
