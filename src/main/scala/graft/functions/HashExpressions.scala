package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text/dedup operators (SURVEY.md §4:
  * custom Catalyst work only where built-ins can't express the semantics —
  * rolling hashes and signature computation are per-row loops that a chain
  * of HOF lambdas would evaluate orders of magnitude slower).
  *
  * All hashes are classic public algorithms (polynomial mod-prime rolling
  * hash; FNV-1a 64-bit) — deterministic, seedable, engine-independent.
  */
object Hashing {
  final val PolyMod = 1000000007L
  final val PolyBase = 31L
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** murmur3's fmix64 finalizer (Appleby, public domain) — full-avalanche
    * mix of a 64-bit value. FNV-1a alone is NOT min-uniform over
    * structured sequential preimages ('orderkey:1..N' differs only in
    * trailing digits, and the final xor gets just one multiply of
    * diffusion), which skewed KMV τ statistics 5× at small SFs; fmix64
    * restores uniformity in every bit range (measured in q253's
    * scaladoc). */
  def fmix64(h0: Long): Long = {
    var h = h0
    h = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
    h = (h ^ (h >>> 33)) * 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** splitmix64 — used to derive per-plane/per-hash constants from an index. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Rolling polynomial hash over a string's Unicode CODE POINTS:
  * `acc = (acc*31 + cp) mod 1e9+7`. Document fingerprinting primitive
  * (north-star text analysis); whole-stage-codegen'd.
  *
  * Code points, not UTF-16 code units, because the DuckDB oracle twins
  * (q205/q206/q209) replay this as a `list_reduce` over `unicode(ch)`
  * per character — which is per codepoint. Iterating codepoints here
  * makes the two hash domains match BY CONSTRUCTION (surrogate pairs
  * included), not merely on the fixtures' current BMP/ASCII content. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * Hashing.PolyBase + cp) % Hashing.PolyMod
      i += Character.charCount(cp)
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * ${Hashing.PolyBase}L + $cp) % ${Hashing.PolyMod}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** FNV-1a 64-bit of a string's UTF-8 bytes, as a column. */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Hashing.fnv1a64(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = ${Hashing.FnvOffset}L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h ^= ($b[$i] & 0xffL);
         |  $h *= ${Hashing.FnvPrime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** [[Hashing.fmix64]] as a codegen'd long→long column — wrapping 64-bit
  * arithmetic must live INSIDE an expression because Spark 4's ANSI mode
  * makes SQL-level long multiplication throw on overflow rather than
  * wrap mod 2⁶⁴. */
case class Fmix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Hashing.fmix64(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.freshName("h")
      s"""
         |long $h = $c;
         |$h = ($h ^ ($h >>> 33)) * ${0xff51afd7ed558ccdL}L;
         |$h = ($h ^ ($h >>> 33)) * ${0xc4ceb9fe1a85ec53L}L;
         |${ev.value} = $h ^ ($h >>> 33);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Fmix64 =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of tokens: per-token FNV-1a, each bit
  * votes ±1, sign of the vote is the output bit. Near-dup fingerprint
  * whose Hamming distance tracks token-multiset similarity. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val h = Hashing.fnv1a64(arr.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val t = ctx.freshName("t")
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |for (int $t = 0; $t < $c.numElements(); $t++) {
         |  if (!$c.isNullAt($t)) {
         |    byte[] $bytes = $c.getUTF8String($t).getBytes();
         |    long $h = ${Hashing.FnvOffset}L;
         |    for (int $j = 0; $j < $bytes.length; $j++) {
         |      $h ^= ($bytes[$j] & 0xffL);
         |      $h *= ${Hashing.FnvPrime}L;
         |    }
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature of a token/shingle set: `numHashes` universal-hash
  * minima over per-element FNV-1a values, h_i(x) = a_i·x + b_i (odd a_i
  * from splitmix64(i)). One pass over the set per row, O(|set|·H). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => Hashing.splitmix64(2L * i) | 1L)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => Hashing.splitmix64(2L * i + 1))
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < arr.numElements()) {
      if (!arr.isNullAt(t)) {
        val x = Hashing.fnv1a64(arr.getUTF8String(t).getBytes)
        var i = 0
        while (i < numHashes) {
          val v = as(i) * x + bs(i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val asRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      val mins = ctx.freshName("mins")
      val t = ctx.freshName("t")
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $t = 0; $t < $c.numElements(); $t++) {
         |  if (!$c.isNullAt($t)) {
         |    byte[] $bytes = $c.getUTF8String($t).getBytes();
         |    long $h = ${Hashing.FnvOffset}L;
         |    for (int $j = 0; $j < $bytes.length; $j++) {
         |      $h ^= ($bytes[$j] & 0xffL);
         |      $h *= ${Hashing.FnvPrime}L;
         |    }
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $v = $asRef[$i] * $h + $bsRef[$i];
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Per-row character-distribution stats in ONE compiled pass:
  * struct(n_chars, n_unique, ent_sum) where ent_sum = Σ p·log2(p) over
  * the char histogram (negate for Shannon entropy). Sort + run-length
  * scan, so contributions accumulate in sorted-char order — the same
  * IEEE summation order as a fold over the sorted distinct chars, which
  * is what the q167 DuckDB oracle replays. log2 is evaluated exactly as
  * Spark's `log(2.0, x)` (Math.log(x)/Math.log(2.0)).
  *
  * Exists because the HOF formulations are interpreted per element:
  * the nested per-distinct `filter(chars, _ === d)` count benched at
  * 117 s over the sf0.1 corpus (O(len·uniq) lambda evals), and even the
  * O(len) run-length `aggregate` with struct state took 78 s (a struct
  * allocation per char). This expression is the same run-length scan as
  * compiled Java. Chars are Unicode CODEPOINTS (`String.codePoints()`),
  * matching `length(text)`, `split(text, '')`, and the oracle's
  * per-codepoint split for ALL text, not just the BMP — an emoji is one
  * histogram entry, not a surrogate pair. */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_unique", IntegerType, nullable = false),
    StructField("ent_sum", DoubleType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    java.util.Arrays.sort(a)
    val n = a.length
    var uniq = 0
    var acc = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && a(j) == a(i)) j += 1
      uniq += 1
      val p = (j - i).toDouble / n.toDouble
      acc += p * (java.lang.Math.log(p) / java.lang.Math.log(2.0))
      i = j
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, uniq, acc))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val a = ctx.freshName("a")
      val n = ctx.freshName("n")
      val uniq = ctx.freshName("uniq")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      s"""
         |int[] $a = $c.toString().codePoints().toArray();
         |java.util.Arrays.sort($a);
         |int $n = $a.length;
         |int $uniq = 0;
         |double $acc = 0.0;
         |int $i = 0;
         |while ($i < $n) {
         |  int $j = $i;
         |  while ($j < $n && $a[$j] == $a[$i]) $j++;
         |  $uniq++;
         |  double $p = (double) ($j - $i) / (double) $n;
         |  $acc += $p * (java.lang.Math.log($p) / java.lang.Math.log(2.0));
         |  $i = $j;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$n, $uniq, $acc});
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)
}

/** Column-level API for the expressions above (Spark 4 wraps expressions
  * via the classic ExpressionUtils bridge). */
object HashFunctions {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def poly_hash(c: Column): Column = column(PolyHash(expression(c)))
  def fnv1a(c: Column): Column = column(Fnv1a64(expression(c)))
  def fmix64(c: Column): Column = column(Fmix64(expression(c)))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def minhash_signature(tokens: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(tokens), numHashes))
  def dot_d(a: Column, b: Column): Column =
    column(DotProductD(expression(a), expression(b)))
  def word_shingles(text: Column, k: Int): Column =
    column(WordShingles(expression(text), k))
  def argmin_sqdist(x: Column, cells: Array[Int], csq: Array[Double],
      ctrs: Array[Double], dim: Int): Column =
    column(ArgMinSqDist(expression(x), cells, csq, ctrs, dim))
  def top_k_longs(c: Column, k: Int): Column =
    column(TopKLongs(expression(c), k).toAggregateExpression())
  def k_min_distinct(c: Column, k: Int): Column =
    column(KMinDistinctLongs(expression(c), k).toAggregateExpression())
  def misra_gries(c: Column, m: Int): Column =
    column(MisraGriesStrings(expression(c), m).toAggregateExpression())
  def count_min_longs(c: Column, depth: Int, width: Int, seed: Int): Column =
    column(CountMinLongs(expression(c), depth, width, seed)
      .toAggregateExpression())
  def char_entropy_stats(c: Column): Column =
    column(CharEntropyStats(expression(c)))
}

/** Sequential-fold dot product of two double arrays, codegen'd. Bitwise
  * identical to `aggregate(zip_with(a,b,*), 0.0, +)` and to DuckDB's
  * `list_sum` over the element products — but one tight loop instead of
  * per-element HOF lambda dispatch (the similarity-search hot path). */
case class DotProductD(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductD = copy(left = newLeft, right = newRight)
}

/** Distinct k-token shingles of a string in one pass: whitespace-tokenize
  * (trim + runs of whitespace, the `split(trim(s), "\\s+")` semantics),
  * slide a k-window, join with single spaces, keep first occurrences.
  *
  * Replaces the HOF formulation `array_distinct(transform(sequence(...),
  * i => concat_ws(" ", slice(toks, i, k))))`, whose per-position slice
  * copies made shingling O(tokens²) per document — the profiled hot spot
  * of the dedup pipeline. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty)) {
      new GenericArrayData(Array.empty[Any])
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i + k <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
      new GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Argmin-cell assignment of a double vector against a driver-held
  * codebook: returns the cell id minimizing ‖c‖² − 2·x·c, ties to the
  * LOWER cell id (centroids iterate in ascending-cell order under a
  * strict `<`). The arithmetic is node-for-node the composed-expression
  * form the k-means oracles replicate (`csq` = the driver-folded Σc²,
  * the dot = [[DotProductD]]'s sequential fold, d = csq − dot·2), so
  * assignments are BIT-IDENTICAL to that form — but in one codegen'd
  * loop with O(1) Catalyst tree size. The composed form (k struct
  * literals + array_sort + HOF lambda) costs O(k·dim) tree nodes and
  * evaluates the lambda interpreted: measured ~70 µs/row at k=64 vs
  * ~1 µs/row here (the PQ fit's whole hot path). Codebook arrays ride
  * the generated code as reference objects — broadcast-by-closure, the
  * same discipline as centroid literals. */
case class ArgMinSqDist(child: Expression, cells: Array[Int],
    csq: Array[Double], ctrs: Array[Double], dim: Int)
    extends UnaryExpression {
  require(cells.length * dim == ctrs.length && cells.length == csq.length,
    "codebook shape mismatch")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    // fallback = the LOWEST live cell, matching the composed form's
    // tie-break even when every distance is NaN (strict < never fires)
    var best = cells(0)
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cells.length) {
      var dot = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { dot += x.getDouble(i) * ctrs(off + i); i += 1 }
      val d = csq(c) - dot * 2
      if (d < bestD) { bestD = d; best = cells(c) }
      c += 1
    }
    best
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
      val csqRef = ctx.addReferenceObj("csq", csq, "double[]")
      val ctrsRef = ctx.addReferenceObj("ctrs", ctrs, "double[]")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $dim);
         |int $best = $cellsRef[0];
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < ${cells.length}; $c++) {
         |  double $dot = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $x.getDouble($i) * $ctrsRef[$off + $i];
         |  }
         |  double $d = $csqRef[$c] - $dot * 2;
         |  if ($d < $bestD) { $bestD = $d; $best = $cellsRef[$c]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): ArgMinSqDist =
    copy(child = newChild)
}
