package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Forces actual Janino compilation of every custom expression's
  * `doGenCode` — no interpreted fallback. Production code paths log a
  * CodeGenerator ERROR and silently fall back to `nullSafeEval` when the
  * generated Java is invalid (which is how a wrong class reference in a
  * codegen string shipped unnoticed: scalac never sees inside the string).
  * `GenerateMutableProjection.generate` throws instead, and evaluating the
  * compiled projection pins generated-vs-interpreted result equality.
  */
class CodegenCompileSpec extends AnyFunSuite {

  private val toks: ArrayData = new GenericArrayData(
    Array[Any](UTF8String.fromString("a"), UTF8String.fromString("b"),
      UTF8String.fromString("a"), UTF8String.fromString("c")))
  private val strArr = ArrayType(StringType)

  test("ShingleMinHash generated code compiles and matches eval") {
    val e = ShingleMinHash(BoundReference(0, strArr, nullable = true), k = 2, numHashes = 8)
    val proj = GenerateMutableProjection.generate(Seq(e)) // throws on bad codegen
    val row = InternalRow(toks)
    val got = proj(row).getArray(0).toLongArray().toSeq
    val want = e.eval(row).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(got == want)
  }

  test("ShingleHashes generated code compiles and matches eval") {
    val e = ShingleHashes(BoundReference(0, strArr, nullable = true), k = 2)
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(toks)
    val got = proj(row).getArray(0).toLongArray().toSeq
    val want = e.eval(row).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(got == want)
    assert(got == got.sorted && got.distinct == got, "contract: sorted distinct")
  }

  test("SortedIntersectCount generated code compiles and matches eval") {
    val longArr = ArrayType(LongType)
    val e = SortedIntersectCount(
      BoundReference(0, longArr, nullable = true),
      BoundReference(1, longArr, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(
      new GenericArrayData(Array[Any](1L, 3L, 7L, 9L)),
      new GenericArrayData(Array[Any](3L, 4L, 9L)))
    assert(proj(row).getLong(0) == 2L)
    assert(e.eval(row) == 2L)
  }

  test("VecDot generated code compiles and matches eval") {
    val dblArr = ArrayType(DoubleType)
    val e = VecDot(
      BoundReference(0, dblArr, nullable = true),
      BoundReference(1, dblArr, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(
      new GenericArrayData(Array[Any](1.0, 2.0, 3.0)),
      new GenericArrayData(Array[Any](4.0, 0.5, 2.0)))
    assert(proj(row).getDouble(0) == 11.0)
    assert(e.eval(row) == 11.0)
  }

  test("RollingFingerprint generated code compiles and matches eval") {
    val e = RollingFingerprint(BoundReference(0, StringType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val s = "the quick brown fox"
    val row = InternalRow(UTF8String.fromString(s))
    // reference fold: the spec the HOF formulation implemented
    val want = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    assert(proj(row).getLong(0) == want)
    assert(e.eval(row) == want)
    // empty string -> 0; code-point walk survives astral chars
    assert(e.eval(InternalRow(UTF8String.fromString(""))) == 0L)
    val astral = InternalRow(UTF8String.fromString("a😀b"))
    assert(proj(astral).getLong(0) == e.eval(astral))
  }

  test("TokenSetHits generated code compiles and matches eval") {
    val e = TokenSetHits(BoundReference(0, strArr, nullable = true), Seq("a", "c", "z"))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(toks) // [a, b, a, c] -> a, a, c hit
    assert(proj(row).getInt(0) == 3)
    assert(e.eval(row) == 3)
    assert(e.eval(InternalRow(new GenericArrayData(Array[Any]()))) == 0)
  }

  test("SubwordEstimate generated code compiles and matches eval") {
    val words = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("abcd"),
      UTF8String.fromString("abcde"), UTF8String.fromString("abcdefgh")))
    val e = SubwordEstimate(BoundReference(0, strArr, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(words) // ceil: 1 + 1 + 2 + 2 = 6
    assert(proj(row).getLong(0) == 6L)
    assert(e.eval(row) == 6L)
  }

  test("TokenLengthSum generated code compiles and matches eval") {
    val words = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("abcd"),
      UTF8String.fromString("a😀b")))
    val e = TokenLengthSum(BoundReference(0, strArr, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(words) // numChars (code points): 1 + 4 + 3 = 8
    assert(proj(row).getLong(0) == 8L)
    assert(e.eval(row) == 8L)
    assert(e.eval(InternalRow(new GenericArrayData(Array[Any]()))) == 0L)
  }

  test("TokenWeightSum generated code compiles and matches eval") {
    val e = TokenWeightSum(BoundReference(0, strArr, nullable = true),
      Seq("a", "c"), Seq(5L, -2L))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(toks) // [a, b, a, c] -> 5 + 0 + 5 - 2 = 8
    assert(proj(row).getLong(0) == 8L)
    assert(e.eval(row) == 8L)
    assert(e.eval(InternalRow(new GenericArrayData(Array[Any]()))) == 0L)
  }

  test("CharBigramWeightSum generated code compiles and matches eval") {
    val e = CharBigramWeightSum(BoundReference(0, StringType, nullable = true),
      Seq("ab", "ba"), Seq(3L, 7L))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(UTF8String.fromString("abab")) // ab ba ab -> 3+7+3
    assert(proj(row).getLong(0) == 13L)
    assert(e.eval(row) == 13L)
    // single char -> no bigrams; empty -> no bigrams
    assert(e.eval(InternalRow(UTF8String.fromString("a"))) == 0L)
    assert(e.eval(InternalRow(UTF8String.fromString(""))) == 0L)
    // astral chars count as one char each (code-point walk)
    val astral = InternalRow(UTF8String.fromString("a😀b"))
    assert(proj(astral).getLong(0) == e.eval(astral))
  }

  test("CharBigrams generated code compiles and matches eval") {
    val e = CharBigrams(BoundReference(0, StringType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    def strs(a: ArrayData): Seq[String] =
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    val row = InternalRow(UTF8String.fromString("abc_"))
    assert(strs(proj(row).getArray(0)) == Seq("ab", "bc", "c_"))
    assert(strs(e.eval(row).asInstanceOf[ArrayData]) == Seq("ab", "bc", "c_"))
    assert(strs(e.eval(InternalRow(UTF8String.fromString("a"))).asInstanceOf[ArrayData]).isEmpty)
    assert(strs(e.eval(InternalRow(UTF8String.fromString(""))).asInstanceOf[ArrayData]).isEmpty)
  }

  test("PunctCount generated code compiles and matches eval") {
    val e = PunctCount(BoundReference(0, StringType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(UTF8String.fromString("a, b! ç 😀\t1"))
    // ',' '!' 'ç' '😀' -> 4 (tab+space+alnum excluded)
    assert(proj(row).getInt(0) == 4)
    assert(e.eval(row) == 4)
    assert(e.eval(InternalRow(UTF8String.fromString(""))) == 0)
  }

  test("BpeEncode generated code compiles and matches eval") {
    val e = BpeEncode(BoundReference(0, strArr, nullable = true),
      Seq("a", "a"), Seq("a", "b"))
    val proj = GenerateMutableProjection.generate(Seq(e))
    def strs(a: ArrayData): Seq[String] =
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    val row = InternalRow(new GenericArrayData(Array[Any](
      UTF8String.fromString("aaab"), UTF8String.fromString("ba"))))
    val want = Seq("aa", "ab", "b", "a") // aaab -> aa|ab ; ba -> b|a
    assert(strs(proj(row).getArray(0)) == want)
    assert(strs(e.eval(row).asInstanceOf[ArrayData]) == want)
  }

  test("LshPlanesBucket generated code compiles and matches eval") {
    val fltArr = ArrayType(FloatType)
    val e = LshPlanesBucket(
      BoundReference(0, fltArr, nullable = true),
      planeOffset = 8, planes = 8, dims = 4)
    val proj = GenerateMutableProjection.generate(Seq(e))
    val vec = new GenericArrayData(Array[Any](1.0f, -2.0f, 0.5f, 3.0f))
    val row = InternalRow(vec)
    assert(proj(row).getLong(0) == e.eval(row).asInstanceOf[Long])
    // null vector / wrong length / null element -> all bits 0 (never NULL)
    assert(e.eval(InternalRow(null)) == 0L)
    assert(e.eval(InternalRow(new GenericArrayData(Array[Any](1.0f)))) == 0L)
    val withNull = new GenericArrayData(Array[Any](1.0f, null, 0.5f, 3.0f))
    assert(e.eval(InternalRow(withNull)) == 0L)
    assert(proj(InternalRow(withNull)).getLong(0) == 0L)
  }

  test("LshAllBuckets generated code compiles, matches eval and the per-table form") {
    val fltArr = ArrayType(FloatType)
    val all = LshAllBuckets(BoundReference(0, fltArr, nullable = true),
      planes = 8, dims = 4, tables = 3)
    val proj = GenerateMutableProjection.generate(Seq(all))
    val vec = new GenericArrayData(Array[Any](1.0f, -2.0f, 0.5f, 3.0f))
    val row = InternalRow(vec)
    val gen = proj(row).getArray(0)
    val ev = all.eval(row).asInstanceOf[ArrayData]
    assert(gen.numElements() == 3 && ev.numElements() == 3)
    for (t <- 0 until 3) {
      val single = LshPlanesBucket(BoundReference(0, fltArr, nullable = true),
        planeOffset = t * 8, planes = 8, dims = 4)
      val want = single.eval(row).asInstanceOf[Long]
      assert(gen.getLong(t) == want, s"codegen table $t")
      assert(ev.getLong(t) == want, s"eval table $t")
    }
    // degenerate inputs -> all-zero buckets (never NULL), matching the
    // per-table expressions' parity rule
    def zeros(r: InternalRow): Unit = {
      val a = all.eval(r).asInstanceOf[ArrayData]
      assert((0 until 3).forall(t => a.getLong(t) == 0L))
      val g = proj(r).getArray(0)
      assert((0 until 3).forall(t => g.getLong(t) == 0L))
    }
    zeros(InternalRow(null))
    zeros(InternalRow(new GenericArrayData(Array[Any](1.0f))))
    zeros(InternalRow(new GenericArrayData(Array[Any](1.0f, null, 0.5f, 3.0f))))
  }

  // shared reference chain for the splitmix family expressions
  private def refMix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("BloomBitPos generated code compiles and matches eval + reference") {
    val e = BloomBitPos(BoundReference(0, LongType, nullable = true),
      salt = 2, mBits = 4096)
    val proj = GenerateMutableProjection.generate(Seq(e))
    // keys beyond 2^32 exercise the deliberate wrap of key * 2654435761
    for (key <- Seq(0L, 1L, 42L, 1L << 33, Long.MaxValue / 3)) {
      val want = ((refMix(key * 2654435761L + 2) >>> 1) % 4096).toInt
      assert(e.eval(InternalRow(key)) == want, s"eval at $key")
      assert(proj(InternalRow(key)).getInt(0) == want, s"codegen at $key")
    }
  }

  test("SplitmixHash generated code compiles and matches eval + reference") {
    val e = SplitmixHash(BoundReference(0, LongType, nullable = true), salt = 0)
    val proj = GenerateMutableProjection.generate(Seq(e))
    for (key <- Seq(0L, 7L, 1000000007L, 1L << 40)) {
      val want = refMix(key * 2654435761L)
      assert(e.eval(InternalRow(key)) == want, s"eval at $key")
      assert(proj(InternalRow(key)).getLong(0) == want, s"codegen at $key")
    }
  }

  test("TokenWindowHashes generated code compiles and matches eval") {
    val e = TokenWindowHashes(BoundReference(0, strArr, nullable = true), k = 2)
    val proj = GenerateMutableProjection.generate(Seq(e))
    val row = InternalRow(toks)
    val got = proj(row).getArray(0).toLongArray().toSeq
    val want = e.eval(row).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(got == want && got.size == 3)
    // hand value: window "a b" = fold of 'a',' ','b'
    val h = ((97L * 31 + 32) % 1000000007L * 31 + 98) % 1000000007L
    assert(got.head == h)
  }

  test("Log2Fixed generated code compiles, matches eval and the driver kernel") {
    val e = Log2Fixed(BoundReference(0, LongType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(e))
    for (v <- Seq(1L, 2L, 3L, 7L, 1000L, 999999937L, 1L << 40, (1L << 62) - 1)) {
      val want = Log2Fixed.eval(v)
      assert(e.eval(InternalRow(v)) == want, s"eval at $v")
      assert(proj(InternalRow(v)).getLong(0) == want, s"codegen at $v")
      if ((v & (v - 1)) == 0) // power of two: exact
        assert(want == (63 - java.lang.Long.numberOfLeadingZeros(v)).toLong << 20)
    }
    // below-domain inputs are NULL, not garbage
    assert(e.eval(InternalRow(0L)) == null)
    assert(proj(InternalRow(-5L)).isNullAt(0))
  }
}
