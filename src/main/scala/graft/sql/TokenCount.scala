package graft.sql

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for whitespace token counting — the
  * codegen'd replacement for `size(split(trim(text), "\\s+"))` on the
  * corpus hot paths (quality rules, token stats, curation budgets, mix
  * planning all start from a token count). The split form allocates a
  * regex matcher plus a full token ARRAY per row just to take its
  * length; this expression counts maximal non-whitespace runs in one
  * zero-copy scan over the UTF8String's bytes.
  *
  * Exact-equivalence argument (pinned by a PropertySpec case): Java's
  * `\s` without UNICODE_CHARACTER_CLASS matches exactly the six ASCII
  * whitespace bytes [ \t\n\x0B\f\r]; in UTF-8 no multi-byte character
  * contains an ASCII byte, so byte-level run counting is Unicode-safe.
  * The split form has two edge quirks this expression REPLICATES
  * rather than fixes (the DuckDB oracle twins mirror them too):
  * Spark's `split` runs Java split with limit −1 — trailing empties
  * are KEPT, unlike Java's default — and `trim` strips only ASCII
  * SPACES. So after space-stripping, a string that still STARTS with
  * whitespace (tab, newline…) contributes one leading empty token and
  * one that still ENDS with whitespace contributes one trailing empty
  * token ("\t" → ["",""] → 2). Hence: strip spaces from both ends; if
  * nothing remains → 0; else count non-whitespace runs, +1 per
  * still-whitespace boundary byte. Null propagates null.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  // Caller contract (as for CosineSim): the child is a string column;
  // graft call sites guarantee it, SQL callers go through the
  // GraftExtensions registration which casts.
  override def dataType: DataType = IntegerType

  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var i = 0
    while (i < n && s.getByte(i) == 32) i += 1
    var e = n
    while (e > i && s.getByte(e - 1) == 32) e -= 1
    if (i >= e) 0
    else {
      def otherWs(b: Byte): Boolean = b >= 9 && b <= 13
      var cnt = (if (otherWs(s.getByte(i))) 1 else 0) +
        (if (otherWs(s.getByte(e - 1))) 1 else 0)
      var in = false
      while (i < e) {
        val b = s.getByte(i)
        val ws = b == 32 || (b >= 9 && b <= 13)
        if (ws) in = false
        else if (!in) { cnt += 1; in = true }
        i += 1
      }
      cnt
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      val in = ctx.freshName("in")
      val b = ctx.freshName("b")
      val ws = ctx.freshName("ws")
      s"""
         |int $n = $a.numBytes();
         |int $i = 0;
         |while ($i < $n && $a.getByte($i) == 32) { $i++; }
         |int $e = $n;
         |while ($e > $i && $a.getByte($e - 1) == 32) { $e--; }
         |int $cnt = 0;
         |if ($i < $e) {
         |  byte $b = $a.getByte($i);
         |  if ($b >= 9 && $b <= 13) { $cnt++; }
         |  $b = $a.getByte($e - 1);
         |  if ($b >= 9 && $b <= 13) { $cnt++; }
         |  boolean $in = false;
         |  for (; $i < $e; $i++) {
         |    $b = $a.getByte($i);
         |    boolean $ws = ($b == 32) || ($b >= 9 && $b <= 13);
         |    if ($ws) { $in = false; }
         |    else if (!$in) { $cnt++; $in = true; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
