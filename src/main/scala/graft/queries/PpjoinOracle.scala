package graft.queries

/** DuckDB replay of the PPJoin prefix filter
  * (graft.operators.Dedup.prefixJaccardNearDup — Chaudhuri et al. ICDE
  * 2006, Xiao et al. WWW 2008), shared by every oracle whose pair stage
  * was previously the O(n²) all-pairs CTE.
  *
  * Why this is still a valid ground truth: prefix filtering is pure
  * relational algebra — rarity order (document frequency asc, shingle
  * asc), per-doc prefix slice of p = |A| − ⌈t·|A|⌉ + 1 rarest shingles,
  * equi-join on prefix shingles with the PPJoin length and position
  * filters, then the EXACT Jaccard verify each caller writes verbatim
  * from its previous oracle. The candidate set provably contains every
  * pair with true Jaccard ≥ t (any such pair shares a shingle in both
  * prefixes), and the verify — unchanged — decides membership, so the
  * replayed relation is IDENTICAL to the all-pairs formulation. Checked
  * empirically, not just argued: the swapped oracles were diffed
  * cell-identical against their O(n²) predecessors at sf0.01 AND sf0.1
  * before the swap (dev note in NOTES_r13; 894 s → 14 s at sf0.1 for
  * the pair stage, which is what lets the 10×-scale sweep run the full
  * registry with no exclusion list).
  *
  * The −1e-9 epsilons mirror the engine (`Dedup.scala`): a last-ulp
  * overestimate of t·|A| may only LENGTHEN a prefix or WEAKEN a filter
  * (more candidates, still exact), never drop a qualifying pair.
  */
object PpjoinOracle {

  /** CTE chain `ppj_tok … ppj_cand(ia, ib)` over a prior CTE
    * `g(doc_id, <shCol>)` holding each doc's DISTINCT shingle list.
    * `threshold` is spliced textually so the SQL computes the same
    * double the engine's `lit(threshold)` does. Callers append their
    * own verify CTE on `ppj_cand` — taken verbatim from the previous
    * all-pairs oracle so the output values are bit-identical. */
  def pairCtes(g: String, shCol: String, threshold: String): String =
    s"""ppj_tok AS (SELECT doc_id, unnest($shCol) AS ptok, len($shCol) AS psz FROM $g),
ppj_df AS (SELECT ptok, count(*) AS pdf FROM ppj_tok GROUP BY 1),
ppj_ord AS (SELECT pt.doc_id, pt.ptok, pt.psz, pd.pdf,
        row_number() OVER (PARTITION BY pt.doc_id
          ORDER BY pd.pdf, pt.ptok) AS ppos
      FROM ppj_tok pt JOIN ppj_df pd USING (ptok)),
ppj_pr AS (SELECT * FROM ppj_ord
       WHERE ppos <= psz - CEIL($threshold*psz - 1e-9) + 1 AND pdf >= 2),
ppj_cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
   FROM ppj_pr a JOIN ppj_pr b
     ON a.ptok = b.ptok AND a.doc_id < b.doc_id
   WHERE a.psz >= $threshold*b.psz - 1e-9
     AND b.psz >= $threshold*a.psz - 1e-9
     AND 1 + least(a.psz - a.ppos, b.psz - b.ppos)
         >= CEIL($threshold/(1+$threshold)*(a.psz + b.psz) - 1e-9))"""
}
