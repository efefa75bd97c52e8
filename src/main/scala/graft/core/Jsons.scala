package graft.core

/** Shared JSON string escaping for the hand-assembled JSON the CLI and
  * store tooling emit. One definition, because the two ad-hoc copies it
  * replaces escaped only backslash and quote — and the verify/fsck
  * surfaces embed exception messages (Spark AnalysisException text is
  * routinely multi-line), so `store --verify-tree` / `store --health`
  * emitted malformed JSON precisely when a store was damaged — breaking
  * the monitoring loop those commands exist to feed.
  */
object Jsons {

  /** JSON-quote `s`: backslash, quote, and EVERY control character
    * (< 0x20, including \n \r \t) escaped per RFC 8259. */
  def str(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }.mkString("\"", "", "\"")
}
