package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact k-shingle-set jaccard of two TOKEN arrays, evaluated as one
  * JVM pass per row (two hash sets, no per-element expression-tree
  * interpretation, no intermediate shingle arrays).
  *
  * Semantically identical to the interpreted higher-order-function form
  * the DuckDB oracle uses (and the minhash verify path used in round 1):
  *   sh(t) = list_distinct(list_transform(range(1, len(t)-k+2),
  *             i -> t[i] || ' ' || ... || t[i+k-1]))
  *   jac   = len(intersect) / (len(a) + len(b) - len(intersect))
  * Rows where either side has fewer than k tokens yield null (mirrors
  * array_intersect over an empty transform → 0/0 → null upstream; the
  * candidate generator never produces such rows — every candidate has a
  * minhash signature, which requires ≥ k tokens).
  */
case class ShingleJaccard(left: Expression, right: Expression, shingleK: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "shingle_jaccard"
  override def nullable: Boolean = true // both sides shingle-less ⇒ null

  /** Real codegen (not CodegenFallback): call into the JVM hash-set
    * loop, keep the enclosing stage fused. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleJaccard", this, classOf[ShingleJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = $ref.nullSafeEval($a, $b);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) r).doubleValue(); }
    """)
  }

  private def shingleSet(arr: ArrayData): java.util.HashSet[String] = {
    val n = arr.numElements()
    val out = new java.util.HashSet[String](Math.max(4, n * 2))
    if (n < shingleK) return out
    val toks = new Array[String](n)
    var t = 0
    while (t < n) {
      toks(t) = if (arr.isNullAt(t)) "" else arr.getUTF8String(t).toString
      t += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = n - shingleK
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < shingleK) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    out
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = shingleSet(a.asInstanceOf[ArrayData])
    val sb = shingleSet(b.asInstanceOf[ArrayData])
    // mirror the interpreted form: 0/0 → null, 0/|b| → 0.0
    if (sa.isEmpty && sb.isEmpty) return null
    if (sa.isEmpty || sb.isEmpty) return 0.0
    // iterate the smaller set against the larger one
    val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 16-bit SimHash of a TOKEN array in one JVM pass: one md5 per token,
  * bit b carries the majority vote of the parity of hex digit b+1
  * across tokens (multiset semantics — duplicate tokens vote once
  * each). Bit-identical to the pure-expression form the DuckDB oracle
  * mirrors (dedup.Dedup.simhash16):
  *   bit b = 1 iff 2 * Σ_t (hexdigit(md5(t), b+1) % 2) > |tokens|.
  * Hex digit b+1 of the digest = the high nibble of byte b/2 when b is
  * even, else the low nibble. Empty token arrays yield 0.
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"

  /** Real codegen: non-null input always yields a value, so the
    * generated call assigns directly. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash16", this, classOf[Simhash16].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    // null elements are ignored ENTIRELY — skipped in both the vote and
    // the majority denominator — matching the null-filtering interpreted
    // twin (split() inputs are null-free, so the forms only diverge on
    // hand-built arrays)
    var nn = 0
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        nn += 1
        md.reset()
        val d = md.digest(arr.getUTF8String(t).getBytes)
        var b = 0
        while (b < 16) {
          val byte = d(b >> 1) & 0xff
          val nibble = if ((b & 1) == 0) byte >> 4 else byte & 0xf
          ones(b) += nibble & 1
          b += 1
        }
      }
      t += 1
    }
    var sh = 0L
    var b = 0
    while (b < 16) {
      if (2 * ones(b) > nn) sh |= 1L << b
      b += 1
    }
    sh
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a TOKEN array in one JVM pass — the production
  * fingerprint for banded near-dup pair generation (Charikar simhash
  * as deployed for web-scale dedup: 64-bit fingerprints, hamming ≤ 3).
  * Bit b (0 ≤ b < 64) carries the majority vote, across per-token md5
  * hashes, of bit (b div 16) of hex digit (b mod 16) — four bits from
  * each of the first 16 hex digits, so the DuckDB oracle can mirror it
  * with string ops:
  *   bit b = 1 iff 2 * Σ_t ((hexval(md5(t)[p+1]) >> k) & 1) > |tokens|
  *   where p = b mod 16, k = b div 16.
  * The 16-bit [[Simhash16]] stays as the compact declared signature
  * artifact; THIS hash exists because banding needs entropy: 4-bit
  * bands of a 16-bit hash give a 16-value key space per band, so
  * accidental candidate pairs grow as n²/64 regardless of similarity —
  * measured super-linear at the third scaling decade. 16-bit bands of
  * this hash shrink the accidental-collision constant 4096×. Empty
  * token arrays yield 0.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash64", this, classOf[Simhash64].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    // null elements are ignored entirely (vote AND denominator) — same
    // contract as Simhash16 and the null-filtering interpreted twin
    var nn = 0
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        nn += 1
        md.reset()
        val d = md.digest(arr.getUTF8String(t).getBytes)
        var p = 0
        while (p < 16) {
          val byte = d(p >> 1) & 0xff
          val nibble = if ((p & 1) == 0) byte >> 4 else byte & 0xf
          var k = 0
          while (k < 4) {
            ones(p + (k << 4)) += (nibble >> k) & 1
            k += 1
          }
          p += 1
        }
      }
      t += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > nn) sh |= 1L << b
      b += 1
    }
    sh
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Windowed co-occurrence pair emission in one JVM pass: for every
  * offset 1..window and position i, emit `t(i) ++ \\u0001 ++ t(i+off)`.
  * Exactly the pair multiset the (doc_id, pos)-equi-join formulation
  * produces, without manufacturing and shuffling the positioned token
  * relation (the join form moved ~2·n rows per doc through an
  * Exchange; this is a narrow explode straight into the pair
  * aggregate). The \\u0001 separator sorts below every token byte, so
  * lexicographic order on the packed pair equals (term_a, term_b)
  * tuple order — top-k tie-breaks survive the packing.
  *
  * Contract: tokens must not contain \\u0001 (a token that did would
  * mis-split via substring_index downstream and silently corrupt pair
  * keys) — enforced here with a loud per-token check, not assumed.
  * Memory: the full per-doc pair array (≈ window·n entries) is built in
  * one row before explode; callers feed natural documents (≤ ~10⁴
  * tokens → ≤ ~10⁵ pairs/row). Do NOT point this at re-packed
  * mega-rows like CappedCollect's 2²¹-token packs — that is a
  * multi-million-element single-row allocation; pair-count those
  * upstream of packing. */
case class TokenPairs(child: Expression, window: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)
  override def prettyName: String = "token_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[String](n)
    var t = 0
    while (t < n) {
      val s = if (arr.isNullAt(t)) "" else arr.getUTF8String(t).toString
      if (s.indexOf('\u0001') >= 0)
        throw new IllegalArgumentException(
          "token_pairs: token contains the \\u0001 pair separator — " +
            "packed pair keys would corrupt; clean the tokenizer output")
      toks(t) = s
      t += 1
    }
    var total = 0
    var off = 1
    while (off <= window) { total += Math.max(0, n - off); off += 1 }
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder(48)
    var o = 0
    off = 1
    while (off <= window) {
      var i = 0
      val last = n - off
      while (i < last) {
        sb.setLength(0)
        sb.append(toks(i)).append('\u0001').append(toks(i + off))
        out(o) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        o += 1
        i += 1
      }
      off += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenPairs", this, classOf[TokenPairs].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word k-grams of a TOKEN array in one JVM pass (hash-set
  * dedup, no per-element expression interpretation) — semantically
  * identical to the HOF form the DuckDB oracle uses
  * (`TextOps.wordGrams`: array_distinct ∘ transform(sequence) ∘
  * concat_ws), pinned by spec. Fewer than k tokens ⇒ empty array. */
case class WordGrams(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val toks = new Array[String](n)
    var t = 0
    while (t < n) {
      toks(t) = if (arr.isNullAt(t)) "" else arr.getUTF8String(t).toString
      t += 1
    }
    val seen = new java.util.LinkedHashSet[String](n * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = n - k
    while (i <= last) {
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
    while (it.hasNext) {
      out(o) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next()); o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGrams", this, classOf[WordGrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-language-group stopword occurrence counts over a TOKEN array in
  * ONE pass (one hash-map probe per token), replacing N interpreted
  * `size(filter(toks, isin(...)))` higher-order passes. A token that
  * belongs to several groups (e.g. "de" is Spanish and French, "la"
  * Spanish and French) increments each of them — exactly the semantics
  * of the per-group filter form the DuckDB oracle mirrors. Occurrences
  * count multiplicity (no dedup). */
case class StopwordHits(child: Expression, groups: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_hits"

  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    groups.zipWithIndex.foreach { case (ws, g) =>
      // distinct: a word listed twice in ONE group must not double-count
      // (filter-form semantics count each token occurrence once per group)
      ws.distinct.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(g) else prev :+ g)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](groups.size)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val gs = lookup.get(arr.getUTF8String(i).toString)
        if (gs != null) {
          var j = 0
          while (j < gs.length) { counts(gs(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(_.asInstanceOf[Any]))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordHits", this, classOf[StopwordHits].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole language-ID decision in ONE pass over the raw text: CJK
  * code-point scan, whitespace tokenization, per-group stopword
  * counting, and the priority argmax — a single expression because the
  * Column-composed form re-evaluates its [[StopwordHits]] subtree at
  * EVERY `when`-branch reference (subexpression elimination does not
  * hoist into conditionally-evaluated CASE branches): ~10 redundant
  * tokenize+scan walks per row, measured 20 s at sf10 for a per-row
  * kernel. Decision semantics identical to the composed form
  * ([[graft.text.TextOps.langGuessComposed]], spec-pinned): zh on any
  * char in [0x4e00, 0x9fff], then en ≥ all & > 0, es ≥ rest & > 0,
  * de ≥ fr & > 0, fr > 0, else "und". */
case class LangGuess(child: Expression, groups: Seq[Seq[String]],
    labels: Seq[String]) extends UnaryExpression {
  require(groups.size == 4 && labels.size == 4,
    "decision chain is the fixed en/es/de/fr priority argmax")

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "lang_guess"

  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    groups.zipWithIndex.foreach { case (ws, g) =>
      ws.distinct.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(g) else prev :+ g)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff)
        return UTF8String.fromString("zh")
      i += 1
    }
    val counts = new Array[Int](groups.size)
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        val gs = lookup.get(text.substring(start, i))
        if (gs != null) {
          var j = 0
          while (j < gs.length) { counts(gs(j)) += 1; j += 1 }
        }
        start = i + 1
      }
      i += 1
    }
    val en = counts(0); val es = counts(1); val de = counts(2); val fr = counts(3)
    val lang =
      if (en >= es && en >= de && en >= fr && en > 0) labels(0)
      else if (es >= de && es >= fr && es > 0) labels(1)
      else if (de >= fr && de > 0) labels(2)
      else if (fr > 0) labels(3)
      else "und"
    UTF8String.fromString(lang)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langGuess", this, classOf[LangGuess].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL k-grams of a token array (multiset, order preserved, NOT
  * deduplicated — [[WordGrams]]'s set form serves membership tests;
  * this form serves frequency sketches, where collapsing duplicates
  * would corrupt the counts), one JVM pass. Same gram strings as the
  * interpreted `transform(sequence(...))` + `concat_ws` HOF chain it
  * replaces on hot paths (spec-pinned equal). */
case class WordGramsAll(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)
  override def prettyName: String = "word_grams_all"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val toks = new Array[String](n)
    var t = 0
    while (t < n) {
      toks(t) = if (arr.isNullAt(t)) "" else arr.getUTF8String(t).toString
      t += 1
    }
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGramsAll", this, classOf[WordGramsAll].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Token-boundary-aligned occurrence counts of a FIXED set of phrases
  * in raw text, one pass (array<bigint>, element i = token positions
  * where the word window equals phrase i) — the phrase-match kernel
  * behind [[graft.text.TextOps.qPhraseSearch]]. A k-token window IS a
  * space-delimited substring of the text, so each phrase reduces to
  * `indexOf` scans with boundary checks (preceding char space-or-start,
  * following char space-or-end) — no tokenization, no allocation, no
  * posexplode (the position-join form ran 3 corpus-scale Generates for
  * 16.4 s at sf10). The phrase set is a tiny runtime-collected
  * artifact riding the expression, like the BPE merge table and the
  * Lloyd centroids. */
case class PhraseCounts(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "phrase_counts"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val n = text.length
    val counts = new Array[Long](phrases.size)
    var p = 0
    while (p < phrases.length) {
      val ph = phrases(p)
      val m = ph.length
      var from = 0
      var c = 0L
      while (from >= 0 && from + m <= n) {
        val at = text.indexOf(ph, from)
        if (at < 0) from = -1
        else {
          val okL = at == 0 || text.charAt(at - 1) == ' '
          val okR = at + m == n || text.charAt(at + m) == ' '
          if (okL && okR) c += 1L
          from = at + 1
        }
      }
      counts(p) = c
      p += 1
    }
    new GenericArrayData(counts.map(c => java.lang.Long.valueOf(c)).toArray[Any])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseCounts", this, classOf[PhraseCounts].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** POSITIONED k-gram md5 hex digests of a token array, one JVM pass:
  * element i is md5 of tokens i..i+k-1 joined by a single space — the
  * anchor stream for exact-substring (verbatim-run) detection, where
  * gram POSITION must survive (unlike [[WordGrams]], which dedups).
  * md5 lowercase hex mirrors DuckDB's `md5(array_to_string(...))`
  * bit-for-bit, so the oracle can re-derive identical anchors. Arrays
  * shorter than k yield an empty array. */
case class PositionedGramMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType,
      containsNull = false)
  override def prettyName: String = "positioned_gram_md5"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val toks = new Array[String](n)
    var t = 0
    while (t < n) {
      toks(t) = if (arr.isNullAt(t)) "" else arr.getUTF8String(t).toString
      t += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new java.lang.StringBuilder(32)
      var b = 0
      while (b < d.length) {
        hex.append(Character.forDigit((d(b) >> 4) & 0xf, 16))
        hex.append(Character.forDigit(d(b) & 0xf, 16))
        b += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(hex.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("positionedGramMd5", this, classOf[PositionedGramMd5].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit positioned k-gram hashes (array<bigint>, element i = the
  * first 15 hex chars of [[PositionedGramMd5]]'s digest at position i,
  * parsed as an integer — i.e. big-endian bytes 0..7 of the md5,
  * unsigned-shifted right 4). The anchor join carries 8-byte longs
  * instead of 40-byte hex strings, and the digest is fed token bytes
  * INCREMENTALLY (no per-gram string build): the gram pass dropped
  * 16.1 → (see PERF) at sf10. DuckDB mirrors the value exactly via
  * `CAST(('0x' || substr(md5(...), 1, 15)) AS BIGINT)`; a truncation
  * collision would be introduced identically in both engines, so
  * oracle parity is unaffected. Spec-pinned equal to the md5-prefix of
  * the string form. */
case class PositionedGramHash60(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positioned_gram_hash60"

  @transient private lazy val sp = Array[Byte](' '.toByte)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) {
      toks(t) = if (arr.isNullAt(t)) Array.emptyByteArray
        else arr.getUTF8String(t).getBytes
      t += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(sp)
        md.update(toks(i + j))
        j += 1
      }
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = java.lang.Long.valueOf(h >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("positionedGramHash60", this, classOf[PositionedGramHash60].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashes {
  import org.apache.spark.sql.GraftSqlBridge

  /** Exact k-shingle-set jaccard of two token-array columns. */
  def shingleJaccard(toksA: Column, toksB: Column, shingleK: Int = 3): Column =
    GraftSqlBridge.column(ShingleJaccard(
      GraftSqlBridge.expression(toksA), GraftSqlBridge.expression(toksB), shingleK))

  /** 16-bit SimHash of a token-array column. */
  def simhash16(toks: Column): Column =
    GraftSqlBridge.column(Simhash16(GraftSqlBridge.expression(toks)))

  /** 64-bit SimHash of a token-array column (the banding fingerprint). */
  def simhash64(toks: Column): Column =
    GraftSqlBridge.column(Simhash64(GraftSqlBridge.expression(toks)))

  /** Per-group stopword occurrence counts (array<int>, one slot per
    * group) of a token-array column, in one pass. */
  def stopwordHits(toks: Column, groups: Seq[Seq[String]]): Column =
    GraftSqlBridge.column(StopwordHits(GraftSqlBridge.expression(toks), groups))

  /** Distinct word k-grams of a token-array column, in one pass. */
  def wordGrams(toks: Column, k: Int): Column =
    GraftSqlBridge.column(WordGrams(GraftSqlBridge.expression(toks), k))

  /** ALL word k-grams (multiset, for frequency sketches), in one pass. */
  def wordGramsAll(toks: Column, k: Int): Column =
    GraftSqlBridge.column(WordGramsAll(GraftSqlBridge.expression(toks), k))

  /** Positioned k-gram md5 anchors of a token-array column. */
  def positionedGramMd5(toks: Column, k: Int): Column =
    GraftSqlBridge.column(PositionedGramMd5(GraftSqlBridge.expression(toks), k))

  /** Positioned 60-bit k-gram hash anchors (md5-prefix longs). */
  def positionedGramHash60(toks: Column, k: Int): Column =
    GraftSqlBridge.column(PositionedGramHash60(GraftSqlBridge.expression(toks), k))

  /** One-pass language-ID decision over a raw text column. */
  def langGuess(text: Column, groups: Seq[Seq[String]], labels: Seq[String]): Column =
    GraftSqlBridge.column(LangGuess(GraftSqlBridge.expression(text), groups, labels))

  /** Per-phrase token-aligned occurrence counts over raw text, one pass. */
  def phraseCounts(text: Column, phrases: Seq[String]): Column =
    GraftSqlBridge.column(PhraseCounts(GraftSqlBridge.expression(text), phrases))

  /** Windowed co-occurrence pairs of a token-array column, in one pass
    * (see [[TokenPairs]]). */
  def tokenPairs(toks: Column, window: Int): Column =
    GraftSqlBridge.column(TokenPairs(GraftSqlBridge.expression(toks), window))
}
