package graft.operators

import graft.functions.TextHash

/** DuckDB-oracle SQL for the minhash/simhash dedup family.
  *
  * Every hash in the family is engine-neutral (charPoly31 character
  * fold + universal-hash permutation grids, see
  * functions/TextHash.scala) — so the ENTIRE pipeline, signatures →
  * LSH bands → candidate pairs → exact-Jaccard verify → connected
  * components → keep policy, is replayed verbatim inside DuckDB:
  * the permutation grids are embedded as VALUES literals (the a02/c02
  * fixed-seed approach), the character fold is a list_reduce, and the
  * transitive clustering is a recursive-CTE closure with
  * cluster = MIN(reachable id) — the same labeling contract as
  * DupClusters.connectedComponentsStar. This upgrades d02/d03/d04/
  * d07/d14/d15/x07 from rows-only checks to full row+schema+hash
  * oracles.
  *
  * NOTE for maintainers: these strings are flattened to one line by
  * SparkEntry.normalize — never add `--` comments inside them.
  */
private[graft] object DedupOracles {

  private val P = TextHash.P // 2147483647, Mersenne prime modulus

  /** charPoly31 replay: fold (acc·131 + codepoint) mod P over `x`. */
  private def poly(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(range(1, length($x) + 1),
         i -> CAST(ord(substr($x, CAST(i AS INT), 1)) AS BIGINT))),
       (a, c) -> (a * 131 + c) % $P)"""

  private def permRows(as: Seq[Long], bs: Seq[Long]): String =
    as.indices.map(i => s"(${i}, ${as(i)}, ${bs(i)})").mkString(", ")

  /** Shared minhash machinery over `documents`: the 64-row perm grid,
    * word-trigram shingles, charPoly31 shingle hashes, per-(doc, perm)
    * signature slots (docs with < 3 tokens get P in every slot — the
    * impossible min, matching TextHash.minhashSignature), 4-slot band
    * keys via the (acc·8191 + slot) mod P fold, and the banded
    * self-join candidate pairs.
    */
  private def minhashCtes(as: Seq[Long], bs: Seq[Long]): String = s"""
    mperm(i, a, b) AS (SELECT * FROM (VALUES ${permRows(as, bs)})),
    toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    sh AS (SELECT doc_id,
      CASE WHEN len(tk) >= 3 THEN
        list_transform(range(1, len(tk) - 1),
          i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
      ELSE CAST([] AS VARCHAR[]) END AS sg FROM toks),
    hh AS (SELECT doc_id, ${poly("s")} AS h
      FROM (SELECT doc_id, unnest(sg) AS s FROM sh)),
    slot AS (SELECT t.doc_id, p.i,
      COALESCE(MIN((p.a * q.h + p.b) % $P), $P) AS m
      FROM toks t CROSS JOIN mperm p LEFT JOIN hh q ON q.doc_id = t.doc_id
      GROUP BY t.doc_id, p.i),
    bands AS (SELECT doc_id, i // 4 AS band,
      list_reduce(list_prepend(CAST(0 AS BIGINT), list(m ORDER BY i)),
        (a, x) -> (a * 8191 + x) % $P) AS bkey
      FROM slot GROUP BY doc_id, i // 4),
    cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      COUNT(*) AS n_bands
      FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey
        AND x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id)"""

  /** Exact-duplicate star edges (min doc_id per md5(text) group → each
    * other member), the DupClusters.dupEdges exact half.
    */
  private val exactCte: String = """
    exact AS (SELECT a, b FROM (
      SELECT MIN(doc_id) OVER (PARTITION BY md5(text)) AS a, doc_id AS b
      FROM documents) e WHERE a <> b)"""

  /** Recursive-CTE connected components over an `edges(a, b)` CTE:
    * `lab(id, cluster)` with cluster = MIN id reachable — the
    * connectedComponentsStar labeling contract. Component sizes in the
    * dup graph are tiny, so the closure is bounded.
    */
  private val closureCtes: String = """
    und AS (SELECT a AS x, b AS y FROM edges
            UNION SELECT b AS x, a AS y FROM edges),
    verts AS (SELECT DISTINCT x FROM und),
    reach(x, y) AS (
      SELECT x, x AS y FROM verts
      UNION
      SELECT r.x, u.y FROM reach r JOIN und u ON r.y = u.x),
    lab AS (SELECT x AS id, MIN(y) AS cluster FROM reach GROUP BY x)"""

  /** Exact n-gram Jaccard over the candidate pairs (floor-grid rounded
    * to 6dp — pure IEEE ops, bit-identical across engines).
    */
  private val jaccardCtes: String = """
    dsh AS (SELECT doc_id, list_distinct(sg) AS ds FROM sh),
    jac AS (SELECT c.doc_a, c.doc_b,
      FLOOR(CAST(len(list_intersect(a.ds, b.ds)) AS DOUBLE)
        / (len(a.ds) + len(b.ds) - len(list_intersect(a.ds, b.ds)))
        * 1000000 + 0.5) / 1000000 AS jaccard
      FROM cand c JOIN dsh a ON a.doc_id = c.doc_a
                  JOIN dsh b ON b.doc_id = c.doc_b)"""

  private def mh: String = {
    val (as, bs) = (Dedup.permsA, Dedup.permsB)
    minhashCtes(as, bs)
  }

  /** d02: candidate pairs ranked by shared bands. */
  def d02: String = s"""
    WITH $mh
    SELECT doc_a, doc_b, n_bands FROM cand
    ORDER BY n_bands DESC, doc_a, doc_b LIMIT 500"""

  /** x07: same pairs from the SQL entry; bands compared as raw 4-slot
    * vectors (the text query joins on the slice itself, not the folded
    * key), no limit, id ordering.
    */
  def x07: String = s"""
    WITH $mh,
    bandsr AS (SELECT doc_id, i // 4 AS band, list(m ORDER BY i) AS bvec
      FROM slot GROUP BY doc_id, i // 4)
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_bands
    FROM bandsr x JOIN bandsr y ON x.band = y.band AND x.bvec = y.bvec
      AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
    ORDER BY doc_a, doc_b"""

  /** d04: exact n-gram Jaccard over the LSH candidates. */
  def d04: String = s"""
    WITH $mh,
    $jaccardCtes
    SELECT doc_a, doc_b, jaccard FROM jac
    ORDER BY jaccard DESC, doc_a, doc_b LIMIT 100"""

  /** d07: duplicate clusters over exact ∪ strong-minhash (≥4 bands)
    * edges; members listed ascending.
    */
  def d07: String = s"""
    WITH RECURSIVE $mh,
    $exactCte,
    edges AS (SELECT doc_a AS a, doc_b AS b FROM cand WHERE n_bands >= 4
              UNION SELECT a, b FROM exact),
    $closureCtes
    SELECT cluster, COUNT(*) AS cluster_size,
      string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
    FROM lab GROUP BY cluster ORDER BY cluster"""

  /** d14: the one-call pipeline — verified-Jaccard (θ ≥ 0.5) ∪ exact
    * edges, clusters, keep the min id of each cluster.
    */
  def d14: String = s"""
    WITH RECURSIVE $mh,
    $jaccardCtes,
    $exactCte,
    edges AS (SELECT doc_a AS a, doc_b AS b FROM jac WHERE jaccard >= 0.5
              UNION SELECT a, b FROM exact),
    $closureCtes
    SELECT d.doc_id, d.source, d.n_chars FROM documents d
    WHERE d.doc_id NOT IN (SELECT id FROM lab WHERE id <> cluster)
    ORDER BY d.doc_id"""

  /** d15: keep-BEST — d07's cluster structure, each cluster keeps its
    * longest text (ties to the smallest id); singletons survive.
    */
  def d15: String = s"""
    WITH RECURSIVE $mh,
    $exactCte,
    edges AS (SELECT doc_a AS a, doc_b AS b FROM cand WHERE n_bands >= 4
              UNION SELECT a, b FROM exact),
    $closureCtes,
    scored AS (SELECT l.cluster, d.doc_id, length(d.text) AS q
      FROM lab l JOIN documents d ON d.doc_id = l.id),
    best AS (SELECT doc_id FROM (
      SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster
        ORDER BY q DESC, doc_id) AS rn FROM scored) r WHERE rn = 1)
    SELECT d.doc_id, d.source, d.n_chars FROM documents d
    WHERE d.doc_id IN (SELECT doc_id FROM best)
       OR d.doc_id NOT IN (SELECT id FROM lab)
    ORDER BY d.doc_id"""

  /** d03: SimHash — per-token charPoly31 through the 64-row sign grid,
    * signatures compared as four 16-bit chunks (the banding), hamming
    * = Σ chunk popcounts of the XOR.
    */
  def d03: String = {
    val (sa, sb) = TextHash.simPerms
    s"""
    WITH sperm(j, a, b) AS (SELECT * FROM (VALUES ${permRows(sa, sb)})),
    th AS (SELECT doc_id, ${poly("t")} AS h
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents)),
    votes AS (SELECT doc_id, p.j,
      SUM(CASE WHEN (((p.a * q.h + p.b) % $P) & 1) = 1
               THEN 1 ELSE -1 END) AS v
      FROM th q CROSS JOIN sperm p GROUP BY doc_id, p.j),
    chunks AS (SELECT doc_id, j // 16 AS c,
      CAST(SUM(CASE WHEN v > 0
        THEN (CAST(1 AS BIGINT) << CAST(j % 16 AS INT))
        ELSE 0 END) AS BIGINT) AS chunk
      FROM votes GROUP BY doc_id, j // 16),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM chunks a JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk
        AND a.doc_id < b.doc_id),
    ham AS (SELECT p.doc_a, p.doc_b,
      CAST(SUM(bit_count(xor(x.chunk, y.chunk))) AS BIGINT) AS hamming
      FROM pairs p JOIN chunks x ON x.doc_id = p.doc_a
                   JOIN chunks y ON y.doc_id = p.doc_b AND y.c = x.c
      GROUP BY p.doc_a, p.doc_b)
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 24
    ORDER BY hamming, doc_a, doc_b LIMIT 500"""
  }
}
