package graft.queries

import graft.ext.TextHash

/** The DuckDB replicas of the engine's md5-derived formulas, defined
  * ONCE: every oracle that re-implements a hash/cosine/bucket must use
  * these fragments so a formula change lands in exactly two places (the
  * Scala implementation and its fragment here), never in per-query
  * copies that can drift.
  */
object OracleSql {

  /** Replica of TextHash.hash64 (md5-derived 60-bit), seed as SQL expr. */
  def hash64(seed: String, v: String): String =
    s"CAST('0x'||substr(md5($seed||':'||$v),1,15) AS BIGINT)"

  /** Seed-0 variant — TextHash.hash64(c) / hash64Local(s). */
  def hash64(v: String): String = hash64("'0'", v)

  /** Replica of TextHash.tokens (whitespace split, empties dropped). */
  def tokens(textCol: String): String =
    s"list_filter(string_split($textCol, ' '), x -> x <> '')"

  /** Replica of TextAnalysis.canonicalize: lower → collapse whitespace
    * → trim → NFC.
    */
  def canonical(textCol: String): String =
    s"nfc_normalize(trim(regexp_replace(lower($textCol), '\\s+', ' ', 'g')))"

  /** Replica of TextHash.wordShingles(text, 3): distinct word 3-grams. */
  def wordShingles3(textCol: String): String =
    s"""CASE WHEN len(${tokens(textCol)}) >= 3 THEN
       |  list_distinct(list_transform(range(1, len(${tokens(textCol)}) - 1),
       |    i -> array_to_string(list_slice(${tokens(textCol)}, i, i + 2), ' ')))
       |ELSE [] END""".stripMargin

  /** Replica of functions.WordShingleHashes(text, 3, MinhashPrime). */
  def hashedShingles3(textCol: String): String =
    s"""list_distinct(list_transform(${wordShingles3(textCol)},
       |  g -> ${hash64("g")} % ${TextHash.MinhashPrime}))""".stripMargin

  /** Replica of functions.WordShingleHashes(text, n, mod, distinct =
    * false): EVERY n-gram occurrence (multiplicity kept — the
    * bag-of-features censuses need counts, not sets), hashed into `mod`
    * buckets. range(1, L-(n-2)) is DuckDB's half-open [1, L-n+2) = the
    * L-n+1 shingle start positions.
    */
  def hashedShingleOccurrences(textCol: String, n: Int, mod: Long): String = {
    val toks = tokens(textCol)
    s"""CASE WHEN len($toks) >= $n THEN
       |  list_transform(range(1, len($toks) - ${n - 2}),
       |    i -> ${hash64(s"array_to_string(list_slice($toks, i, i + ${n - 1}), ' ')")} % $mod)
       |ELSE [] END""".stripMargin
  }

  /** Replica of functions.WordShingleHashes(text, 3, mod = 0): the full
    * 60-bit hash space (no modulus) — corpus-level document-frequency
    * operators use this so cross-doc collisions stay negligible.
    */
  def hashedShingles3Full(textCol: String): String =
    s"""list_distinct(list_transform(${wordShingles3(textCol)},
       |  g -> ${hash64("g")}))""".stripMargin

  /** Exact-decimal double sum: Spark's sum(cast(x as decimal(38,10)))
    * cast back to double. The VARCHAR round-trip matters — DuckDB's
    * direct decimal→double cast rounds differently from Spark's.
    */
  def dsum(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"

  /** Replica of the 0.0-seeded left-fold cosine (functions.CosineSim). */
  def cosine(a: String, b: String): String = s"""
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)
    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i])), (x, y) -> x + y))
       * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i])), (x, y) -> x + y)))"""

  /** Replica of ext.Similarity.kmeansCentroids: a CTE chain (assumes a
    * CTE `v(vec_id, vec)` of double lists exists) ending in
    * `cents(cent_id, cent_vec)`. Same determinism contract as the Scala
    * side: init = vec_id < k, assignment by max cosine with lowest-id
    * tiebreak, per-dimension mean via exact DECIMAL(38,10) sum (VARCHAR
    * round-trip — DuckDB's direct decimal→double cast rounds
    * differently) divided by the member count in one double division.
    */
  def kmeansCents(k: Int, iters: Int): String = kmeansCents(k.toString, iters)

  /** Same chain with `k` as a SQL scalar expression — lets the oracle
    * replicate [[graft.ext.Similarity.derivedCells]]'s corpus-derived
    * cell count (q141) instead of a fixed literal.
    */
  def kmeansCents(k: String, iters: Int): String = {
    val init = s"cents0 AS (SELECT vec_id AS cent_id, vec AS cent_vec FROM v WHERE vec_id < ($k))"
    val steps = (1 to iters).map { i =>
      val prev = s"cents${i - 1}"
      s"""assign$i AS (
         |  SELECT vid, vec, cell FROM (
         |    SELECT c.vec_id AS vid, c.vec AS vec, ct.cent_id AS cell,
         |           ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |             ORDER BY ${cosine("c.vec", "ct.cent_vec")} DESC, ct.cent_id) AS rn
         |    FROM v c CROSS JOIN $prev ct)
         |  WHERE rn = 1),
         |mean$i AS (
         |  SELECT cell, pos,
         |         CAST(CAST(SUM(CAST(val AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
         |           / COUNT(*) AS m
         |  FROM (SELECT cell, unnest(vec) AS val,
         |               unnest(range(1, len(vec) + 1)) AS pos
         |        FROM assign$i)
         |  GROUP BY cell, pos),
         |cents$i AS (
         |  SELECT cell AS cent_id, list(m ORDER BY pos) AS cent_vec
         |  FROM mean$i GROUP BY cell)""".stripMargin
    }
    ((init +: steps) :+ s"cents AS (SELECT * FROM cents$iters)").mkString(",\n")
  }

  /** Replica of functions.SignLshBuckets over the embeddings table:
    * CTEs `v` (vectors as double lists) and `buck` (one bucket key per
    * (vector, table)).
    */
  def embeddingBuckets(tables: Int, planes: Int): String = s"""
    v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
          FROM embeddings),
    buck AS (
      SELECT vec_id, vec, tb,
        CAST(tb AS VARCHAR) || '#' || CAST((
          SELECT SUM(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, len(vec) + 1),
                     i -> vec[i] * ((${hash64("(CAST(tb AS VARCHAR) || ':' || CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR))")} % 1000) / 1000.0 - 0.5))),
                   (a, x) -> a + x) > 0.0
               THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) ELSE 0 END)
          FROM (SELECT unnest(range(0, $planes)) AS p)) AS VARCHAR) AS bucket
      FROM v CROSS JOIN (SELECT unnest(range(0, $tables)) AS tb))"""
}
