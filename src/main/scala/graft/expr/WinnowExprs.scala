package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD'03 —
  * the MOSS algorithm): hash every `k`-gram of the (pre-normalized) string
  * with the same `(acc*31 + cp) mod 1e9+7` polynomial as
  * [[RollingFingerprint]], slide a window of `w` consecutive gram hashes,
  * select the minimum hash VALUE in each window, and return the distinct
  * selected values sorted ascending.
  *
  * Unlike the whole-document [[RollingFingerprint]], the selected set is a
  * LOCAL fingerprint: any substring of length >= `w + k - 1` shared by two
  * documents contributes at least one common window, hence at least one
  * shared fingerprint — the winnowing guarantee that makes partial-overlap
  * detection (plagiarism / near-boilerplate reuse) a fingerprint equi-join
  * instead of an all-pairs alignment.
  *
  * Selection is by min VALUE (position-free), so the set is identical no
  * matter how the engine enumerates windows; ties inside a window pick the
  * same value by definition. Documents shorter than `k` grams yield an
  * empty array; documents with fewer than `w` grams yield the single min
  * of all grams (the clamped final window — same clamping as a SQL list
  * slice past the end).
  *
  * The whole selection runs as one tight generated-Java loop per row
  * (O(n*w) with w small — the deque variant saves nothing at w <= 16),
  * keeping corpus scans inside whole-stage codegen; the DuckDB oracle
  * replays the identical arithmetic with list comprehensions.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 2, s"k-gram length must be >= 2, got $k")
  require(w >= 2, s"window must be >= 2, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs STRING, got $t")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // code points (normalization upstream guarantees BMP ASCII here, but
    // iterate by code point like RollingFingerprint for full generality)
    val cps = new Array[Int](s.length)
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    val nG = n - k + 1
    if (nG <= 0) return new GenericArrayData(Array.emptyLongArray)
    val grams = new Array[Long](nG)
    var g = 0
    while (g < nG) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31 + cps(g + j)) % 1000000007L; j += 1 }
      grams(g) = acc
      g += 1
    }
    val nWin = math.max(nG - w + 1, 1)
    val sel = new Array[Long](nWin)
    var p = 0
    while (p < nWin) {
      var mn = grams(p)
      var q = p + 1
      val end = math.min(p + w, nG)
      while (q < end) { if (grams(q) < mn) mn = grams(q); q += 1 }
      sel(p) = mn
      p += 1
    }
    java.util.Arrays.sort(sel)
    var u = 0
    var t = 0
    while (t < nWin) {
      if (t == 0 || sel(t) != sel(t - 1)) { sel(u) = sel(t); u += 1 }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, u))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("wfStr")
      val cps = ctx.freshName("wfCps")
      val nCp = ctx.freshName("wfN")
      val i = ctx.freshName("wfI")
      val cp = ctx.freshName("wfCp")
      val grams = ctx.freshName("wfGrams")
      val nG = ctx.freshName("wfNg")
      val g = ctx.freshName("wfG")
      val acc = ctx.freshName("wfAcc")
      val j = ctx.freshName("wfJ")
      val nWin = ctx.freshName("wfNw")
      val sel = ctx.freshName("wfSel")
      val p = ctx.freshName("wfP")
      val mn = ctx.freshName("wfMn")
      val q = ctx.freshName("wfQ")
      val end = ctx.freshName("wfEnd")
      val u = ctx.freshName("wfU")
      val t = ctx.freshName("wfT")
      s"""
         |String $s = $c.toString();
         |int[] $cps = new int[$s.length()];
         |int $nCp = 0;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $cps[$nCp++] = $cp;
         |  $i += Character.charCount($cp);
         |}
         |int $nG = $nCp - $k + 1;
         |if ($nG <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $grams = new long[$nG];
         |  for (int $g = 0; $g < $nG; $g++) {
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      $acc = ($acc * 31L + $cps[$g + $j]) % 1000000007L;
         |    }
         |    $grams[$g] = $acc;
         |  }
         |  int $nWin = java.lang.Math.max($nG - $w + 1, 1);
         |  long[] $sel = new long[$nWin];
         |  for (int $p = 0; $p < $nWin; $p++) {
         |    long $mn = $grams[$p];
         |    int $end = java.lang.Math.min($p + $w, $nG);
         |    for (int $q = $p + 1; $q < $end; $q++) {
         |      if ($grams[$q] < $mn) $mn = $grams[$q];
         |    }
         |    $sel[$p] = $mn;
         |  }
         |  java.util.Arrays.sort($sel);
         |  int $u = 0;
         |  for (int $t = 0; $t < $nWin; $t++) {
         |    if ($t == 0 || $sel[$t] != $sel[$t - 1]) $sel[$u++] = $sel[$t];
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($sel, $u));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

object WinnowExprs {
  /** Distinct winnowing fingerprints of `s` (sorted ascending; see
    * [[WinnowFingerprints]]). Normalize upstream — the expression hashes
    * the string verbatim.
    */
  def winnowFingerprints(s: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(s), k, w))
}
