package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `k`-token-window rolling hashes of a token array in ONE generated
  * loop: element `i` equals
  * [[graft.ops.TextOps.fingerprint]]'s polynomial
  * (`fold(codepoints, 0, (acc, cp) -> (acc*31 + cp) mod 1e9+7)`) of the
  * SPACE-JOINED window `tokens[i..i+k)` — bit-identical to the
  * `transform(sequence(...), i -> fingerprint(concat_ws(' ', slice(...))))`
  * higher-order formulation (differential-pinned in DedupOpsSpec), which
  * evaluates its lambda INTERPRETED per window and re-hashes every
  * window's characters from scratch (O(n·k·len), measured ~4 s/query at
  * sf0.1 for the substring-dedup pass).
  *
  * This expression instead computes a prefix hash over the joined stream
  * once and extracts each window as
  * `(H[b] − H[a]·31^(b−a)) mod p` — exact modular algebra, O(total
  * chars) per row, inside whole-stage codegen. Same output contract as
  * the HOF form: `n − k + 1` hashes, empty array when the document has
  * fewer than `k` tokens, NULL in → NULL out; a NULL token element
  * yields NULL (corrupt input surfaces, not a silent skip).
  */
case class TokenWindowHashes(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, s"window must be >= 1 token, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes needs ARRAY<STRING>, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = TokenWindowHashes.hashWindows(arr, k)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("twOut")
      s"""
         |long[] $out = graft.expr.TokenWindowHashes.hashWindows($c, $k);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
  override def prettyName: String = "token_window_hashes"
}

object TokenWindowHashes {

  private val P = 1000000007L

  /** Shared kernel (eval + generated code): prefix polynomial over the
    * space-joined token stream, windows extracted by modular algebra.
    * Returns null when the array or any token is NULL. */
  def hashWindows(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    val nw = n - k + 1
    if (nw <= 0) return Array.emptyLongArray
    // code points of the joined stream + per-token boundaries
    val toks = new Array[UTF8String](n)
    var total = 0
    var t = 0
    while (t < n) {
      if (arr.isNullAt(t)) return null
      val s = arr.getUTF8String(t)
      toks(t) = s
      total += s.numChars()
      t += 1
    }
    total += n - 1 // single-space joiners
    // prefix[i] = hash of the first i chars; pow(i) = 31^i mod p
    val prefix = new Array[Long](total + 1)
    val pow = new Array[Long](total + 1)
    pow(0) = 1L
    // char start offset of token t in the joined stream
    val starts = new Array[Int](n + 1)
    var pos = 0
    t = 0
    while (t < n) {
      starts(t) = pos
      val s = toks(t).toString
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        prefix(pos + 1) = (prefix(pos) * 31 + cp) % P
        pow(pos + 1) = (pow(pos) * 31) % P
        pos += 1
        i += Character.charCount(cp)
      }
      if (t < n - 1) { // the joining space
        prefix(pos + 1) = (prefix(pos) * 31 + ' '.toInt) % P
        pow(pos + 1) = (pow(pos) * 31) % P
        pos += 1
      }
      t += 1
    }
    val out = new Array[Long](nw)
    var g = 0
    while (g < nw) {
      val a = starts(g)
      // window ends right BEFORE the joiner that follows token g+k-1
      val b = if (g + k < n) starts(g + k) - 1 else pos
      val h = (prefix(b) - (prefix(a) * pow(b - a)) % P) % P
      out(g) = if (h < 0) h + P else h
      g += 1
    }
    out
  }
}

object TokenWindowExprs {
  /** All k-token-window rolling hashes (see [[TokenWindowHashes]]). */
  def tokenWindowHashes(tokens: Column, k: Int): Column =
    Bridge.column(TokenWindowHashes(Bridge.expression(tokens), k))
}
