package graft.queries

import graft.GraftQuery
import graft.GraftQuery.nz
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** North-star text/LLM-pipeline operators over the `documents` table
  * (BASELINE.json north_star): exact dedup, text statistics, quality
  * scoring, fingerprinting. Near-dup (MinHash/SimHash) lives in
  * graft.functions + graft.operators (non-oracle, property-tested).
  *
  * Scale notes: exact dedup is a hash groupBy on the text hash — at 100 TB
  * group on a fingerprint (md5) instead of the full text so shuffle rows
  * carry 16 bytes, not documents. All stats are narrow per-row expressions;
  * the only shuffles are the final small aggregations.
  */
object TextQueries {

  val all: Seq[GraftQuery] = Seq(

    // Exact dedup with deterministic survivor (min doc_id per text group).
    GraftQuery(
      "q_dedup_exact",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("text")
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dups"))
          .select("keep_id", "dups")
          .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dups
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    // Exact dedup at scale: group on md5(text) — the shuffle key is a
    // 32-char fingerprint, not the document body.
    GraftQuery(
      "q_dedup_hash",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dups"))
          .select("keep_id", "dups")
          .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dups
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin)),

    // Per-language corpus statistics incl. whitespace token counts.
    GraftQuery(
      "q_text_stats",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n"),
            round(avg(col("n_chars")), 4).as("avg_chars"),
            round(avg(size(split(col("text"), " ")).cast("double")), 4).as("avg_tokens"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n,
             |       ROUND(AVG(n_chars), 4) AS avg_chars,
             |       ROUND(AVG(CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)), 4) AS avg_tokens
             |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin)),

    // Quality scoring signals: token count, vocabulary-uniqueness ratio,
    // stopword ratio — all codegen'd array expressions, no UDFs.
    GraftQuery(
      "q_text_quality",
      (s, d) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            round(size(array_distinct(toks)).cast("double") / size(toks), 4).as("uniq_ratio"),
            round(
              size(filter(toks, t => t.isin("the", "a"))).cast("double") / size(toks),
              4).as("stopword_ratio"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
             |  ROUND(CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
             |        / LEN(STRING_SPLIT(text, ' ')), 4) AS uniq_ratio,
             |  ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
             |                             t -> t IN ('the', 'a'))) AS DOUBLE)
             |        / LEN(STRING_SPLIT(text, ' ')), 4) AS stopword_ratio
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // BPE-ish token counting: letter runs / single digits / punctuation —
    // the pre-tokenizer shape GPT-style BPE uses (TextFunctions.bpeishTokens).
    GraftQuery(
      "q_token_count",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text")).as("n_bpeish"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT)
             |    AS n_bpeish
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Document fingerprinting (content-addressable id for dedup indexes).
    GraftQuery(
      "q_doc_fingerprint",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), md5(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // n-gram Jaccard near-dup with EXACT-threshold semantics: LSH banding
    // (128 hashes, 64 bands of 2) is only the blocking strategy; every
    // candidate pair is verified with exact shingle-set Jaccard. At
    // threshold 0.5 a qualifying pair escapes candidacy with probability
    // ≤ (1-0.5²)^64 ≈ 1e-8 (and the hashing is seeded-deterministic), so
    // the result EQUALS the exact oracle below — while the Spark plan
    // never materializes the quadratic pair space. The oracle's pair
    // stage is the PPJoin prefix-filter replay (PpjoinOracle — verified
    // cell-identical to the previous O(n²) CTE at sf0.01 and sf0.1, 65×
    // faster), with the verify formulation unchanged; note the ENGINE
    // here is LSH banding, a different algorithm from the oracle's
    // prefix filter, so the two sides share no blind spot.
    GraftQuery(
      "q_ngram_jaccard",
      (s, d) =>
        graft.operators.Dedup.ngramJaccardNearDup(
          Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, threshold = 0.5)
          .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
             |           FROM documents),
             |g AS (SELECT doc_id,
             |        CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
             |             ELSE list_distinct([array_to_string(w[i:i+2], ' ')
             |                                 FOR i IN range(1, len(w)-1)])
             |        END AS sh
             |      FROM t),
             |${PpjoinOracle.pairCtes("g", "sh", "0.5")}
             |SELECT id_a, id_b, ROUND(jc, 4) AS jaccard FROM (
             |  SELECT ia AS id_a, ib AS id_b,
             |         CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) /
             |           len(list_distinct(list_concat(ga.sh, gb.sh))) AS jc
             |  FROM ppj_cand JOIN g ga ON ga.doc_id = ppj_cand.ia
             |                JOIN g gb ON gb.doc_id = ppj_cand.ib) p
             |WHERE jc >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // The SAME exact-threshold pair contract computed by a COMPLETELY
    // DIFFERENT distributed algorithm: prefix filtering
    // (Dedup.prefixJaccardNearDup — SSJoin/PPJoin family) instead of
    // LSH banding. Candidates come from each doc's rarest-shingle
    // prefix (rarity = global document frequency), no signatures and
    // no recall argument — and this row shares q_ngram_jaccard's oracle
    // SQL VERBATIM. Since r13 that shared oracle's pair stage is itself
    // the PPJoin replay (sweep cost at sf0.1); the shared-theory risk —
    // engine and oracle both prefix-filtered — is covered two ways: the
    // replayed oracle was diffed cell-identical against the O(n²) CTE
    // at sf0.01 and sf0.1, and q_ngram_jaccard's LSH-banded engine
    // (prefix-free algorithm) must hash-match the same oracle.
    GraftQuery(
      "q_jaccard_prefix",
      (s, d) =>
        graft.operators.Dedup.prefixJaccardNearDup(
          Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, threshold = 0.5)
          .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
             |           FROM documents),
             |g AS (SELECT doc_id,
             |        CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
             |             ELSE list_distinct([array_to_string(w[i:i+2], ' ')
             |                                 FOR i IN range(1, len(w)-1)])
             |        END AS sh
             |      FROM t),
             |${PpjoinOracle.pairCtes("g", "sh", "0.5")}
             |SELECT id_a, id_b, ROUND(jc, 4) AS jaccard FROM (
             |  SELECT ia AS id_a, ib AS id_b,
             |         CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) /
             |           len(list_distinct(list_concat(ga.sh, gb.sh))) AS jc
             |  FROM ppj_cand JOIN g ga ON ga.doc_id = ppj_cand.ia
             |                JOIN g gb ON gb.doc_id = ppj_cand.ib) p
             |WHERE jc >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // Capped WEIGHTED shingle Jaccard pairs (r14, w-shingling with
    // multiplicity): unweighted shingle Jaccard reads a doc as a SET,
    // so repetition mass is invisible — the template-spam axis.
    // J_w = Σmin(w_a,w_b)/Σmax(...) with w = min(occurrences, 3) over
    // 3-gram shingles, computed EXACTLY by expanding each shingle into
    // w distinct (shingle, i) elements and running the verified PPJoin
    // prefix filter on the expanded sets (expanded-set Jaccard ≡
    // capped-weight Jaccard — see Dedup.weightedJaccardNearDup). The
    // oracle replays the identical expansion (shingle || chr(1) || i)
    // and the same PPJoin candidate algebra, so the whole operator is
    // hash-gated at every SF like the rest of the Jaccard family.
    GraftQuery(
      "q_weighted_jaccard",
      (s, d) =>
        graft.operators.Dedup.weightedJaccardNearDup(
          Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, cap = 3, threshold = 0.5)
          .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
             |           FROM documents),
             |sl AS (SELECT doc_id,
             |        CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
             |             ELSE [array_to_string(w[i:i+2], ' ')
             |                   FOR i IN range(1, len(w)-1)]
             |        END AS shl
             |       FROM t),
             |c AS (SELECT doc_id, tok, count(*) AS c
             |      FROM (SELECT doc_id, unnest(shl) AS tok FROM sl) q
             |      GROUP BY 1, 2),
             |g AS (SELECT doc_id, list(tok || chr(1) || CAST(i AS VARCHAR)) AS sh
             |      FROM c, UNNEST(range(1, least(c, 3) + 1)) AS r(i)
             |      GROUP BY doc_id),
             |${PpjoinOracle.pairCtes("g", "sh", "0.5")}
             |SELECT id_a, id_b, ROUND(jc, 4) AS jaccard FROM (
             |  SELECT ia AS id_a, ib AS id_b,
             |         CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) /
             |           len(list_distinct(list_concat(ga.sh, gb.sh))) AS jc
             |  FROM ppj_cand JOIN g ga ON ga.doc_id = ppj_cand.ia
             |                JOIN g gb ON gb.doc_id = ppj_cand.ib) p
             |WHERE jc >= 0.5 ORDER BY id_a, id_b""".stripMargin)),

    // Directional CONTAINMENT pairs (r14): C(A→B) = |A∩B|/|A| ≥ 0.8 over
    // 3-gram shingle sets — "doc a is mostly contained in doc b", the
    // quotation/excerpt axis the symmetric Jaccard family structurally
    // misses (a short doc inside a long one has Jaccard ≈ |A|/|B| → 0,
    // and PPJoin's size-ratio filter prunes exactly those pairs). Exact
    // asymmetric prefix filter: rarity-ordered probe prefixes joined
    // against FULL posting lists (no candidate-side prefix exists — a
    // huge container can hold a tiny probe); candidate volume is
    // df-bounded, never all-pairs. The oracle replays the identical
    // prefix algebra and verify.
    GraftQuery(
      "q_containment",
      (s, d) =>
        graft.operators.Dedup.containmentNearDup(
          Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, threshold = 0.8)
          .orderBy("id_a", "id_b"),
      Some(s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
             |           FROM documents),
             |g AS (SELECT doc_id,
             |        CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
             |             ELSE list_distinct([array_to_string(w[i:i+2], ' ')
             |                                 FOR i IN range(1, len(w)-1)])
             |        END AS sh
             |      FROM t),
             |tok AS (SELECT doc_id, unnest(sh) AS tok FROM g),
             |dfs AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
             |ord AS (SELECT tk.doc_id, tk.tok, d.df,
             |          row_number() OVER (PARTITION BY tk.doc_id
             |            ORDER BY d.df, tk.tok) AS pos,
             |          count(*) OVER (PARTITION BY tk.doc_id) AS sz
             |        FROM tok tk JOIN dfs d USING (tok)),
             |pr AS (SELECT * FROM ord
             |       WHERE pos <= sz - CEIL(0.8*sz - 1e-9) + 1 AND df >= 2),
             |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
             |         FROM pr a JOIN tok b
             |           ON a.tok = b.tok AND a.doc_id <> b.doc_id)
             |SELECT id_a, id_b, ROUND(cm, 4) AS containment FROM (
             |  SELECT ia AS id_a, ib AS id_b,
             |         CAST(len(list_intersect(ga.sh, gb.sh)) AS DOUBLE) /
             |           len(ga.sh) AS cm
             |  FROM cand JOIN g ga ON ga.doc_id = cand.ia
             |            JOIN g gb ON gb.doc_id = cand.ib) p
             |WHERE cm >= 0.8 ORDER BY id_a, id_b""".stripMargin)),

    // Cross-corpus directional containment (Dedup.containmentAgainst —
    // the frozen-reference batch ground truth behind
    // StreamOps.containmentAgainstStream): admit probe docs NOT mostly
    // contained in any reference doc. Same exact asymmetric prefix
    // algebra as q_containment, but ordered by REFERENCE df (unseen
    // probe shingles sort first and prune: no postings, no candidates).
    // The oracle replays it brute-force (the q_dedup_against precedent)
    // — the quadratic plan this operator exists to avoid at scale.
    GraftQuery(
      "q_containment_against",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.containmentAgainst(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", shingleN = 3, threshold = 0.8)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
             |           FROM documents),
             |g AS (SELECT doc_id,
             |        CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
             |             ELSE list_distinct([array_to_string(w[i:i+2], ' ')
             |                                 FOR i IN range(1, len(w)-1)])
             |        END AS sh
             |      FROM t),
             |c AS (SELECT * FROM g WHERE doc_id % 3 <> 0),
             |r AS (SELECT * FROM g WHERE doc_id % 3 = 0),
             |dup AS (SELECT DISTINCT c.doc_id FROM c JOIN r ON
             |  CAST(len(list_intersect(c.sh, r.sh)) AS DOUBLE) /
             |    len(c.sh) >= 0.8)
             |SELECT * FROM documents
             |WHERE doc_id % 3 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dup)
             |ORDER BY doc_id""".stripMargin)),

    // Exact edit-distance pair join WITHOUT the O(n²) theta join
    // (EditDistanceJoin.editPairs — FastSS/SymSpell deletion-neighborhood
    // blocking): every pair within levenshtein 1 shares a ≤1-deletion
    // variant, so candidates come from an equi join on hashed variants
    // and only they pay the exact distance check. The oracle IS the
    // naive quadratic join — fine at sf0.01, the plan this operator
    // exists to avoid at scale — so the gate proves the blocking exact.
    GraftQuery(
      "q_edit_join",
      (s, d) =>
        graft.operators.EditDistanceJoin.editPairs(
          Tables.supplier(s, d), "s_suppkey", "s_name", maxDist = 1)
          .orderBy("id_a", "id_b"),
      Some("""SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
             |       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
             |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
             |WHERE levenshtein(a.s_name, b.s_name) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    // Rolling-hash content fingerprint (order-sensitive Karp-Rabin
    // polynomial: acc = (acc*131 + codepoint) mod 1e9+7). Deterministic
    // integer arithmetic, so the oracle computes the IDENTICAL polynomial
    // in DuckDB (list_reduce over the character stream). Split semantics
    // note: Spark splits UTF-16 code units, DuckDB codepoints — identical
    // over BMP text, and the fixtures are ASCII (verified); astral input
    // would diverge by construction on both engines' own terms.
    GraftQuery(
      "q_rolling_fingerprint",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.rollingHash(col("text")).as("rfp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split(text, ''),
             |                     x -> CAST(ascii(x) AS BIGINT))),
             |    (acc, x) -> (acc * 131 + x) % 1000000007) AS rfp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language ID heuristic — ORACLE-GATED (promoted from rows-only in
    // r11): the scorer is deterministic arithmetic over LITERAL marker
    // lists (argmax stopword hits over cleaned lowercase tokens, ties to
    // the lexicographically LAST language, zero hits → 'und'), so DuckDB
    // replays it exactly: unnest tokens → clean → join the marker VALUES
    // → per-doc argmax via row_number(hits DESC, lang DESC). The native
    // single-pass expression is thus pinned against its own SQL
    // definition, not just a row count. Split semantics note (the
    // q_rolling_fingerprint precedent): the native cleaner tests
    // UTF-16 units with Character.isLetter, RE2's \p{L} tests
    // codepoints — identical over BMP text, and the fixtures are
    // ASCII (verified); astral letters would diverge by construction
    // on both engines' own terms.
    GraftQuery(
      "q_lang_id",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), TextFunctions.langIdFast(col("text")).as("lang_pred"))
          .orderBy("doc_id"),
      Some {
        val markers = graft.functions.TextFunctions.languageMarkers.toSeq
          .sortBy(_._1)
          .flatMap { case (l, ms) => ms.map(m => s"('$l','$m')") }
          .mkString(", ")
        s"""WITH m(lang, marker) AS (VALUES $markers),
           |t AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS rawtok
           |      FROM documents),
           |c AS (SELECT doc_id,
           |        regexp_replace(lower(rawtok), '[^\\p{L}]', '', 'g') AS tok
           |      FROM t),
           |h AS (SELECT c.doc_id, m.lang, count(*) AS hits
           |      FROM c JOIN m ON c.tok = m.marker GROUP BY 1, 2),
           |best AS (SELECT doc_id, lang,
           |           row_number() OVER (PARTITION BY doc_id
           |             ORDER BY hits DESC, lang DESC) AS rk
           |         FROM h)
           |SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
           |FROM documents d LEFT JOIN
           |  (SELECT doc_id, lang FROM best WHERE rk = 1) b USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      }),

    // Token-entropy quality signal: Shannon entropy of each document's
    // token distribution — word-salad and boilerplate score LOW (few
    // distinct tokens dominate), natural prose scores near ln(vocab).
    // H = ln(n) − (Σ c·ln c)/n computed from ONE (doc, term) count
    // aggregate; the Σ c·ln c partial is quantized at 6 in the aggregate
    // (the determinism rule) before the division. Two shuffles both
    // keyed by doc_id — never a token-grain window.
    GraftQuery(
      "q_token_entropy",
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("graft_c"))
        tf.groupBy("doc_id")
          .agg(
            sum("graft_c").as("graft_n"),
            count(lit(1)).as("n_distinct"),
            round(sum(col("graft_c").cast("double") *
              log(col("graft_c").cast("double"))), 6).as("graft_clc"))
          .select(col("doc_id"), col("n_distinct"),
            // nz: entropy >= 0 mathematically but its ln(n) - clc/n fp
            // difference can dip below zero (hazard class 4)
            nz(round(log(col("graft_n").cast("double")) -
              col("graft_clc") / col("graft_n").cast("double"), 6))
              .as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH tf AS (SELECT doc_id, term, count(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |        FROM documents) t
             |  GROUP BY 1, 2),
             |agg AS (SELECT doc_id, sum(c) AS n, count(*) AS n_distinct,
             |          ROUND(sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))), 6)
             |            AS clc
             |        FROM tf GROUP BY 1)
             |SELECT doc_id, n_distinct,
             |       ROUND(ln(CAST(n AS DOUBLE)) - clc / CAST(n AS DOUBLE), 6)
             |         + 0.0 AS entropy
             |FROM agg ORDER BY doc_id""".stripMargin)),
  )
}
