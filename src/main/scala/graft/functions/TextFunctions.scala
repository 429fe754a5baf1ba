package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable text-analysis column functions for LLM-data pipelines
  * (SURVEY.md §2.9 X1/X2/X4). All are composed from codegen'd Spark
  * built-ins (no UDFs): at 100 TB each stays inside WholeStageCodegen and
  * the only shuffles are the aggregations the caller adds.
  *
  * Hashing is md5 throughout — deterministic and portable across engines,
  * which is what makes signature-based dedup reproducible between runs and
  * verifiable against external oracles.
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped — ALL whitespace (space, tab,
    * newline, formfeed, CR), not just the space character: a multi-line
    * document must not fuse "hello\nworld" into one token, or every token
    * count, quality ratio and signature silently diverges between space-
    * and newline-separated but otherwise identical texts. Implemented as a
    * codegen'd byte-scan kernel ([[graft.operators.WhitespaceTokens]]) —
    * regex split + a filter lambda measured ~1.5× slower on the
    * tokenization-heavy gates. DuckDB twin:
    * regexp_split_to_array(text, '\s+') (see Extensions.toksSql).
    */
  def tokens(text: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.WhitespaceTokens(
      org.apache.spark.sql.GraftSqlShim.expression(text)))

  /** BPE-ish segmentation: word runs + punctuation runs. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]+"), lit(0))

  /** Exact-dedup content fingerprint. */
  def fingerprint(text: Column): Column = md5(text)

  /** Order/multiplicity-insensitive content signature: md5 of the sorted
    * distinct token set. Groups token-set-identical docs (Jaccard == 1).
    */
  def bagOfWordsSignature(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** MinHash signature over an arbitrary item array: per-seed minimum of
    * md5(seed || item) over the distinct items, collapsed to one md5.
    * Items sharing the full signature are near-dup candidates; at scale the
    * signature is the LSH shuffle key. Empty item arrays yield NULL, which
    * drops degenerate rows from candidacy (NULL joins nothing).
    */
  /** All `n` per-slice minima in ONE pass over the item hashes: a fold whose
    * accumulator is the running elementwise minimum of the `len`-hex digest
    * slices. Higher-order-function expressions are interpreted with NO
    * common-subexpression sharing — every *reference* to a
    * `transform(_, md5)` subtree re-hashes the whole array — so the k
    * "independent hash functions" must come out of a single traversal.
    * ("g" sorts above every hex character, so it is the fold's +infinity.)
    *
    * COST MODEL (measured at sf0.1): the fold's per-item accumulator — a
    * `transform(sequence(..))` + `zip_with` allocation per item — only pays
    * off when it replaces MANY redundant digest passes (8-slice banded:
    * 42.5s -> 10.4s). For k<=4 single-digest signatures the allocations cost
    * MORE than the redundant md5 passes they avoid (0.8s -> 5.8s) — those
    * use [[minhashFromHashes]] direct slice minima instead.
    */
  private def sliceMinima(items: Column, n: Int, len: Int): Column = {
    // Slice width is a statistics knob, not a convenience: minima of ~10^2+
    // item hashes concentrate near hexSpace/|items|, so narrow slices (e.g.
    // 16-bit) collide across unrelated docs and explode the candidate set
    // (measured 52k candidate pairs vs ~250 at sf0.1). Keep 8-hex (32-bit)
    // slices; when n·len exceeds one digest, chain a second independent md5
    // — still a single traversal of the items.
    val width = n * len
    require(width <= 64, "at most two md5 digests of slices")
    val hashOf: Column => Column =
      if (width <= 32) t => md5(t)
      else t => concat(md5(t), md5(concat(t, lit("#"))))
    aggregate(
      transform(array_distinct(items), hashOf),
      array(Seq.fill(n)(lit("g")): _*),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(n - 1)), i => h.substr(i * len + 1, lit(len))),
        (a, s) => least(a, s)))
  }

  /** Step 1 of the two-step MinHash pipeline: one md5 digest per distinct
    * item. Materialize this behind a Project/Generate boundary (e.g.
    * `select(explode(array(itemHashes(..))))`) before [[minhashFromHashes]]
    * — as a materialized column the array is hashed once per row, while an
    * inlined reference re-runs the md5 pass once per slice minimum (no CSE
    * in interpreted HOFs).
    */
  def itemHashes(items: Column): Column =
    transform(array_distinct(array_compact(items)), t => md5(t))

  /** Step 2: the k-slice MinHash signature from materialized per-item
    * digests — k direct `array_min` passes over cheap substrings. NULL for
    * item-less rows, which drops degenerate docs from candidacy (NULL joins
    * and groups to nothing that survives a bucket-size cut).
    */
  def minhashFromHashes(hashes: Column, k: Int): Column = {
    require(k >= 1 && k <= 4, "md5 yields 4 independent 8-hex slices")
    val minima = (0 until k).map(i =>
      array_min(transform(hashes, h => substring(h, 1 + i * 8, 8))))
    when(size(hashes) > 0, md5(concat(minima: _*)))
  }

  /** One-expression convenience form: correct anywhere, but each slice
    * minimum re-hashes the items (no CSE in interpreted HOFs) — in hot paths
    * materialize [[itemHashes]] first and call [[minhashFromHashes]].
    */
  def minhashSignatureOf(items: Column, k: Int): Column =
    minhashFromHashes(itemHashes(items), k)

  /** MinHash over raw tokens. NOTE: for small vocabularies token-level minima
    * collide heavily (buckets grow with corpus size — a skew bomb in the
    * candidate join); prefer [[minhashSignatureOf]] over [[shingles]], whose
    * k-gram universe is |vocab|^k, for the near-dup candidate key.
    */
  def minhashSignature(text: Column, k: Int = 4): Column =
    minhashSignatureOf(tokens(text), k)

  /** Banded MinHash (the OR-of-ANDs LSH construction): `bands` signatures,
    * each the md5 of `rowsPerBand` per-band digest slices. Docs sharing ANY
    * band signature are candidates — recall rises with `bands`, precision
    * with `rowsPerBand` (the classic S-curve). Returns an array; candidate
    * generation is `explode` + self-join on (band_index, band_sig):
    * {{{
    * df.select($"id", posexplode(minhashBands($"text", 4, 2)))  // -> pos, col
    *   .join(other side on pos + col)
    * }}}
    * The bands·rows "hash functions" are disjoint 8-hex (32-bit) slices of
    * two chained md5 digests per item — the hash is the hot loop at corpus
    * scale, and a per-band seeded digest would multiply it by `bands`.
    */
  def minhashBands(items: Column, bands: Int, rowsPerBand: Int): Column =
    bandsFromMinima(bandMinima(items, bands, rowsPerBand), bands, rowsPerBand)

  /** Step 1 of the two-step banded pipeline: the bands·rows slice minima in
    * one traversal. Materialize this as its OWN column before calling
    * [[bandsFromMinima]] — as a column attribute it is computed once per
    * row, whereas inlining it into the bands array would re-run the md5
    * pass once per band (no CSE in interpreted HOFs).
    */
  def bandMinima(items: Column, bands: Int, rowsPerBand: Int): Column = {
    require(bands >= 1 && rowsPerBand >= 1 && bands * rowsPerBand <= 8,
      "two md5 digests yield 8 independent 8-hex slices")
    sliceMinima(items, bands * rowsPerBand, 8)
  }

  /** FUSED text→shingle→band-minima hot path: bit-identical to
    * `bandMinima(shingles(text, shingleK), bands, rowsPerBand)` but one
    * codegen'd kernel call ([[graft.operators.ShingleSliceMinima]]) instead
    * of the interpreted distinct→hash→fold pipeline — the per-item
    * transform(sequence)+zip_with accumulator allocation was the measured
    * dominant cost of every banded-MinHash gate. Use this form wherever the
    * items ARE k-token shingles of a text column (the near-dup family);
    * [[bandMinima]] stays for arbitrary item arrays.
    */
  def shingleBandMinima(text: Column, shingleK: Int, bands: Int,
                        rowsPerBand: Int): Column = {
    require(bands >= 1 && rowsPerBand >= 1 && bands * rowsPerBand <= 8,
      "two md5 digests yield 8 independent 8-hex slices")
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.ShingleSliceMinima(
      org.apache.spark.sql.GraftSqlShim.expression(tokens(text)),
      shingleK, bands * rowsPerBand, 8))
  }

  /** Step 2: band signatures from materialized minima. NULL for item-less
    * rows — their fold never ran, so the first minimum is still the "g"
    * sentinel (impossible as a real hex slice) — and NULL band sigs fall
    * out of any candidate equi-join.
    */
  def bandsFromMinima(minima: Column, bands: Int, rowsPerBand: Int): Column =
    when(element_at(minima, 1) =!= "g",
      array((0 until bands).map(b =>
        md5(array_join(slice(minima, b * rowsPerBand + 1, rowsPerBand), ""))): _*))

  /** Per-shingle rolling hashes for winnowing (MOSS-style document
    * fingerprinting): 8-hex digest prefixes of the k-gram shingles.
    * Materialize as its OWN column before [[winnowFromHashes]] — the window
    * minima reference it once per window, and an inlined expression would
    * re-hash the document per window (no CSE in interpreted HOFs).
    */
  def shingleHashes(text: Column, k: Int): Column =
    transform(shingles(text, k), g => substring(md5(g), 1, 8))

  /** Winnowing: the distinct minima of every `w`-wide sliding window over
    * the rolling hashes — the classic robust fingerprint set (at least one
    * fingerprint survives any edit that leaves a w+k-1-token stretch
    * intact). Short docs keep all their hashes.
    */
  def winnowFromHashes(hashes: Column, w: Int): Column = {
    require(w >= 1)
    when(size(hashes) < w, array_distinct(hashes))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(hashes) - (w - 1)),
          i => array_min(slice(hashes, i, lit(w))))))
  }

  /** SimHash over `bits` hex positions of per-token md5s: majority vote per
    * position; near-dups differ in few bits. Returns a '0'/'1' string.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 32)
    val bitCols = (1 to bits).map { p =>
      val vote = aggregate(tokens(text), lit(0),
        (acc, t) => acc + when(substring(md5(t), p, 1) >= "8", 1).otherwise(-1))
      when(vote >= 0, "1").otherwise("0")
    }
    concat(bitCols: _*)
  }

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** k-token shingles ("n-grams of tokens"), the unit for n-gram Jaccard
    * near-dup detection. Returns an array of space-joined k-grams. A
    * codegen'd kernel ([[graft.operators.TokenShingles]]) — the previous
    * `transform(sequence(..), i -> array_join(slice(..)))` stack is
    * interpreted per shingle with a slice allocation each; output is
    * byte-identical (same positions, same ' ' join, empty below k).
    */
  def shingles(text: Column, k: Int): Column = {
    require(k >= 1)
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.TokenShingles(
      org.apache.spark.sql.GraftSqlShim.expression(tokens(text)), k))
  }

  /** Exact set Jaccard over two item arrays: |A∩B| / |A∪B|. Integer set
    * sizes + one double division — bit-identical across engines.
    */
  def jaccardOf(a: Column, b: Column): Column = {
    val union = size(array_union(a, b))
    // two empty sets are identical (1.0) by convention; the guard also
    // keeps the division ANSI-safe (DIVIDE_BY_ZERO aborts the whole job)
    when(union === 0, lit(1.0))
      .otherwise(
        size(array_intersect(array_distinct(a), array_distinct(b))).cast("double") / union)
  }

  /** Exact token-set Jaccard similarity between two texts. */
  def jaccardTokens(a: Column, b: Column): Column =
    jaccardOf(tokens(a), tokens(b))

  /** Stopword ratio given an inline stopword list. Token-less docs rate
    * 0.0 (ANSI-safe: an unguarded 0/0 aborts the job under Spark 4's
    * default ANSI mode; quality gates still fail such docs on the
    * token-count bound).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, c => c.isInCollection(stopwords))).cast("double") / size(t))
  }

  /** Marker-based language-ID heuristic: first matching marker set wins.
    * `markers` = (lang, tokens that indicate it), checked in order.
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])], default: String = "und"): Column = {
    val t = tokens(text)
    markers.foldRight(lit(default): Column) { case ((lang, words), els) =>
      val hit = words.map(w => array_contains(t, w)).reduce(_ && _)
      when(hit, lang).otherwise(els)
    }
  }

  /** Quality gate: token-count bounds + stopword-ratio cap. */
  def qualityPass(text: Column, minTokens: Long, maxTokens: Long,
                  stopwords: Seq[String], maxStopRatio: Double): Column =
    tokenCount(text).between(minTokens, maxTokens) &&
      stopwordRatio(text, stopwords) < maxStopRatio
}
