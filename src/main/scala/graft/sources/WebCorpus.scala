package graft.sources

import org.apache.spark.sql.DataFrame

/** Web-shaped fixture slice for the curation-chain queries (VERDICT r14
  * #1): the driver's synthetic `documents` are single-line word salad
  * with no terminal punctuation, so C4 drops 100% of pages and the
  * stitched chain's oracle run exercised stages 2–5 over EMPTY survivor
  * frames. This slice — a fixed, deterministic 40-document table
  * derived from nothing but compile-time constants — adds punctuated
  * multi-line pages engineered so every ledger state of
  * `Pipeline.curateWeb` fires on non-empty frames:
  *
  *   - doc 0  (id ≡ 0 mod 97): a clean page → `bench`;
  *   - doc 1: copies ONE line from doc 0 (shares its 4-token shingles,
  *     Jaccard ≪ 0.8 overall) → `contaminated`;
  *   - docs 2, 3: byte-identical pages → doc 3 `dup` (keep-min-id);
  *   - docs 4–9: 3 lines = 45 words < 50 → pass C4, fail the Gopher
  *     word-count rule → `gopher_dropped`;
  *   - docs ≥ [[DeltaSliceStart]] are the "latest crawl" half that
  *     q_pipeline_web_append treats as the increment, and repeat the
  *     same structure ACROSS the base/delta boundary: doc 31 is
  *     byte-identical to base docs 2/3 (`dup` found by probing the
  *     persisted band index), doc 33 copies doc 0's line
  *     (`contaminated` against the persisted benchmark shingles),
  *     doc 35 is 3 lines (`gopher_dropped` in the increment);
  *   - the remaining 8-line × 15-word pages pass every Gopher rule
  *     → `kept`;
  *   - every original fixture doc → `c4_dropped` (unchanged behavior).
  *
  * Anti-collision construction: every line interleaves per-(doc, line)
  * salt tokens (`n<id>x` — alphabetic-bearing, so the Gopher alpha rule
  * is untouched) at gaps ≤ 3 tokens, so no 4-token shingle is shared
  * across distinct pages except through the ONE deliberately copied
  * line — decontamination flags exactly doc 1 — and 3-shingle overlap
  * stays ≪ the J ≥ 0.8 near-dup bar except for the identical pair.
  *
  * The slice is INPUT, not computation: the same Scala-generated rows
  * feed the Spark engine (literal DataFrame) and the DuckDB oracle
  * (literal VALUES interpolated by SparkEntry from THIS generator), so
  * corpus drift between the engines is impossible by construction —
  * the fixture convention, same as both engines reading one parquet.
  * Ids sit at [[SliceOff]] (≫ any driver fixture id at every sf, and
  * ≡ 0 mod 97 so slice residues are stable), langs cycle through the
  * fixture's latin-script values, `n_chars` = length(text) (the
  * fixture invariant). */
object WebCorpus {

  /** Slice size — constant at every sf (the states it seeds are
    * corpus-independent; the fixture docs supply the scaling mass). */
  val SliceN = 40

  /** First slice id: above every driver fixture id (sf10-docs tops out
    * at 499 999) and ≡ 0 (mod 97), so doc i's bench residue is i mod
    * 97 regardless of the offset. */
  val SliceOff = 1000070L

  private val Langs = Seq("en", "de", "fr", "es")

  /** One salted line: 15 words, terminal period, ≥ 3 Gopher stopwords
    * (of/the/and), all-alphabetic-bearing tokens, salts at gaps ≤ 3. */
  private def line(i: Int, j: Int): String = {
    val a = i * 1000 + j * 20
    s"item n${a}x of the n${a + 1}x set has the n${a + 2}x mark " +
      s"and the n${a + 3}x tag now."
  }

  private def body(i: Int, nLines: Int): String =
    (0 until nLines).map(line(i, _)).mkString("\n")

  /** First slice index of the "latest crawl" increment — the delta
    * side of q_pipeline_web_append's base/batch split. */
  val DeltaSliceStart = 30

  private def textOf(i: Int): String = i match {
    // contaminated: doc 0's first line + 7 own lines
    case 1 => (line(0, 0) +: (1 until 8).map(line(1, _))).mkString("\n")
    // dup pair: doc 3 is byte-identical to doc 2
    case 3 => body(2, 8)
    // gopher_dropped: 3 clean lines = 45 words < 50
    case k if k >= 4 && k <= 9 => body(k, 3)
    // cross-increment structure (all ≥ DeltaSliceStart): a dup of the
    // BASE pair, a page contaminated by the BASE bench page, and an
    // in-increment Gopher violator
    case 31 => body(2, 8)
    case 33 => (line(0, 0) +: (1 until 8).map(line(33, _))).mkString("\n")
    case 35 => body(35, 3)
    case k => body(k, 8)
  }

  /** The slice rows (doc_id, text, lang, source, n_chars) — the ONE
    * generator both engines consume. */
  def sliceRows: Seq[(Long, String, String, String, Long)] =
    (0 until SliceN).map { i =>
      val t = textOf(i)
      (SliceOff + i, t, Langs(i % Langs.length), "web", t.length.toLong)
    }

  /** The enriched corpus: driver fixture ∪ slice. */
  def enriched(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.unionByName(
      sliceRows.toDF("doc_id", "text", "lang", "source", "n_chars"))
  }
}
