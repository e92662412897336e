package graft.queries

import graft.functions.Hashing

/** Renders DuckDB SQL that reproduces [[graft.functions.Hashing]] BIT-FOR-BIT,
  * so the hash-sketch queries (rolling fingerprints, SimHash, MinHash+LSH)
  * get true cross-engine oracles instead of rows-only checks.
  *
  * Technique: model Java's signed-long wrap-around arithmetic in DuckDB
  * `HUGEINT` (128-bit) over the unsigned domain [0, 2^64):
  *   - xor / `>>>k` (logical shift) / `<<k`: `xor()`, `// 2^k`, `* 2^k % 2^64`
  *     — exact because values are non-negative and < 2^64;
  *   - wrapping multiply: 32-bit limb decomposition
  *     (lo·lo + ((lo·hi + hi·lo) mod 2^32)·2^32) mod 2^64 — every
  *     intermediate stays < 2^96, far inside hugeint range (a direct 64×64
  *     product can overflow even hugeint);
  *   - signed comparisons (Java `<` on longs, e.g. the MinHash signature
  *     min): map to signed via `u >= 2^63 ? u - 2^64 : u` first.
  *   - local bindings (DuckDB has no LET): `list_transform([e], v -> body)[1]`
  *     evaluates `e` once and binds it to `v`.
  *
  * Every constant is rendered from the [[Hashing]] vals — one source of
  * truth; a drifted constant turns the oracle red rather than silently
  * diverging.
  */
object DuckHashSql {
  private val M = "18446744073709551616::HUGEINT" // 2^64

  private def u(l: Long): String = java.lang.Long.toUnsignedString(l)
  private def uh(l: Long): String = u(l) + "::HUGEINT"

  /** let-binding: evaluate `e` once, name it `v` inside `body`. */
  private def let(e: String, v: String, body: String): String =
    s"list_transform([$e], $v -> $body)[1]"

  private def xor(a: String, b: String): String = s"xor($a, $b)"

  /** Wrapping 64-bit multiply; `a` is referenced 4 times so pass only cheap
    * expressions (lambda variables or literals). */
  private def mul(a: String, b: String): String =
    s"((($a % 4294967296) * ($b % 4294967296) + " +
      s"(((($a % 4294967296) * ($b // 4294967296)) + (($a // 4294967296) * ($b % 4294967296))) % 4294967296) * 4294967296) % $M)"

  /** rotateLeft(x, 31): disjoint bit ranges, so + == |. `x` must be a var. */
  private def rotl31(x: String): String =
    s"(($x * 2147483648::HUGEINT) % $M + ($x // 8589934592))"

  /** hash64 finalizer: two xorshift-33+multiply rounds + final xorshift-33.
    * `h` must be a var. */
  private def fin(h: String): String = {
    val core = s"list_reduce(list_prepend($h, [${uh(Hashing.Fin1)}, ${uh(Hashing.Fin2)}]), " +
      s"(fz, fk) -> ${mul(xor("fz", "fz // 8589934592"), "fk")})"
    let(core, "fw", xor("fw", "fw // 8589934592"))
  }

  /** [[Hashing.hash64]] of a varchar expression (UTF-16 == code point for the
    * BMP text this engine processes; `list_filter` drops the [''] that DuckDB
    * yields for an empty string, matching Java's zero-iteration loop). */
  def hash64Sql(s: String): String = {
    val codes = s"list_transform(list_filter(split($s, ''), hc -> hc != ''), hc2 -> ord(hc2)::HUGEINT)"
    val step = let(mul(xor("hh", "hcv"), uh(Hashing.StepMul)), "hm", rotl31("hm"))
    val core = s"list_reduce(list_prepend(${uh(Hashing.Golden)}, $codes), (hh, hcv) -> $step)"
    let(core, "hfv", fin("hfv"))
  }

  /** [[Hashing.mix64]] with the permutation index as a SQL expression
    * (`Golden * (i+1)` wraps in Java — replicate with an in-SQL mod). */
  def mix64Sql(h: String, iExpr: String): String = {
    val addc = s"((${uh(Hashing.Golden)} * (($iExpr) + 1)) % $M)"
    val z0 = s"(($h + $addc) % $M)"
    val body = let(mul(xor("mza", "mza // 1073741824"), uh(Hashing.Mix1)), "mzb",
      let(mul(xor("mzb", "mzb // 134217728"), uh(Hashing.Mix2)), "mzc",
        xor("mzc", "mzc // 2147483648")))
    let(z0, "mza", body)
  }

  /** Unsigned [0,2^64) hugeint -> Java signed long value. */
  def signedSql(e: String): String =
    let(e, "sgv", s"(CASE WHEN sgv >= 9223372036854775808::HUGEINT THEN sgv - $M ELSE sgv END)::BIGINT")

  /** [[Hashing.rollingHashOf]] of a varchar expression (unsigned domain). */
  def rollingHashSql(texpr: String): String = {
    val tokenHashes =
      s"list_transform(string_split_regex(trim($texpr), '\\s+'), rt -> ${hash64Sql("rt")})"
    s"list_reduce(list_prepend(0::HUGEINT, $tokenHashes), (racc, rth) -> ${mix64Sql(xor("racc", "rth"), "0")})"
  }

  /** Per-token hash64 list of a varchar expression — stage this in a CTE so
    * downstream per-bit work references the computed list column. */
  def tokenHashesSql(texpr: String): String =
    s"list_transform(string_split_regex(trim($texpr), '\\s+'), st -> ${hash64Sql("st")})"

  /** [[Hashing.simhashOf]] from a token-hash LIST COLUMN (cheap reference —
    * pass a CTE column name, not a recomputing expression). */
  def simhashFromTokenHashesSql(thCol: String): String = {
    val bit = s"CASE WHEN 2 * len(list_filter($thCol, sh -> (sh // (1::HUGEINT << sb)) % 2 = 1)) > len($thCol) " +
      s"THEN (1::HUGEINT << sb) ELSE 0::HUGEINT END"
    s"list_reduce(list_prepend(0::HUGEINT, list_transform(generate_series(0, 63), sb -> $bit)), (sa, sbv) -> sa + sbv)"
  }

  /** CTE prefix computing (doc_id, sig) SimHash signatures of `documents`
    * (unsigned hugeint sigs; Hamming distance is sign-agnostic). */
  def simhashSigsCte(whereClause: String): String =
    s"""WITH th AS (
       |  SELECT doc_id, ${tokenHashesSql("text")} AS th FROM documents $whereClause
       |), sigs AS (
       |  SELECT doc_id, ${simhashFromTokenHashesSql("th")} AS sig FROM th
       |)""".stripMargin

  /** Word n-gram (shingle) list from a token-list column `t` — distinct,
    * matching Dedup.shingles / Dedup.sketchOf. */
  def gramsSql(n: Int): String = {
    val concat = (0 until n).map(k => s"t[gi+$k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, len(t) - ${n - 1}), gi -> $concat))"
  }

  /** CTE chain (no leading WITH) computing `dups(id_a, id_b, jaccard)` —
    * the MinHash+LSH near-dup pipeline over `documents`, replicating
    * [[graft.operators.Dedup.minhashNearDups]] (sketchOf + band buckets +
    * candidate pairs + exact Jaccard over hashed shingles). The signature
    * minimum is Java's SIGNED long min — hence the signed detour. `bucketCap`
    * is omitted: callers guarantee it does not bind at oracle scale.
    *
    * Performance shape: the permutation stage is RELATIONAL, not lambda —
    * mix64 runs as staged vectorized columns over (distinct gram) ×
    * (permutation) rows, and per-doc signatures come from a join + GROUP BY
    * min. The lambda form (64 × |per-doc grams| interpreted let-bound evals)
    * took ~75 s at sf0.01; this takes ~1 s. Shingles repeat heavily across
    * documents, so hashing each DISTINCT gram once is also a big dedup win. */
  def minhashPairsCtes(shingleLen: Int, numHashes: Int, bands: Int, threshold: Double): String = {
    val rpb = numHashes / bands
    // mix64(gh, p) over COLUMNS gh/p, staged through CTE columns (each
    // stage's output is a plain column — no let-bindings, fully vectorized)
    val addc = s"((${uh(Hashing.Golden)} * (p + 1)) % $M)"
    val z0 = s"((gh + $addc) % $M)"
    val stage1 = mul(xor("mza", "mza // 1073741824"), uh(Hashing.Mix1))
    val stage2 = mul(xor("mzb", "mzb // 134217728"), uh(Hashing.Mix2))
    val stage3 = xor("mzc", "mzc // 2147483648")
    // band fold consumes the unsigned bit pattern of the signed sig values
    val usig = s"(CASE WHEN sgl < 0 THEN sgl + $M ELSE sgl END)"
    val binit = s"((${uh(Hashing.BandSeed)} + bb) % $M)"
    val bh = s"list_transform(generate_series(0, ${bands - 1}), bb -> " +
      s"list_reduce(list_prepend($binit, generate_series(0, ${rpb - 1})), " +
      s"(ba, br) -> ${mix64Sql(let(s"sig[cast(bb*$rpb+br+1 AS INT)]", "sgl", xor("ba", usig)), "br")}))"
    val jac = "round(cast(len(list_intersect(g_a, g_b)) AS DOUBLE) / " +
      "(len(g_a) + len(g_b) - len(list_intersect(g_a, g_b))), 6)"
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       |), g AS (
       |  SELECT doc_id, ${gramsSql(shingleLen)} AS grams FROM toks WHERE len(t) >= $shingleLen
       |), flat AS (
       |  SELECT doc_id, unnest(grams) AS gram FROM g
       |), ghm AS (
       |  SELECT gram, ${hash64Sql("gram")} AS gh FROM (SELECT DISTINCT gram FROM flat)
       |), pm0 AS (
       |  SELECT gh, p, $z0 AS mza
       |  FROM ghm CROSS JOIN (SELECT unnest(generate_series(0, ${numHashes - 1})) AS p)
       |), pm1 AS ( SELECT gh, p, $stage1 AS mzb FROM pm0
       |), pm2 AS ( SELECT gh, p, $stage2 AS mzc FROM pm1
       |), pm AS ( SELECT gh, p, ${signedSql(stage3)} AS ms FROM pm2
       |), sigrows AS (
       |  SELECT f.doc_id, pm.p, min(pm.ms) AS s
       |  FROM flat f JOIN ghm USING (gram) JOIN pm USING (gh)
       |  GROUP BY f.doc_id, pm.p
       |), sk AS (
       |  SELECT f.doc_id, list(m.gh) AS gh
       |  FROM flat f JOIN ghm m USING (gram) GROUP BY f.doc_id
       |), sg AS (
       |  SELECT doc_id, list(s ORDER BY p) AS sig FROM sigrows GROUP BY doc_id
       |), bh AS (
       |  SELECT sk.doc_id, sk.gh, $bh AS bh FROM sg JOIN sk USING (doc_id)
       |), banded AS (
       |  SELECT doc_id, gh, unnest(generate_series(0, ${bands - 1})) AS band_idx, unnest(bh) AS band_hash FROM bh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.gh AS g_a, b.gh AS g_b
       |  FROM banded a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
       |), jacs AS (
       |  SELECT id_a, id_b, $jac AS jaccard FROM cand
       |), dups AS (
       |  SELECT id_a, id_b, jaccard FROM jacs WHERE jaccard >= $threshold
       |)""".stripMargin
  }

  /** Standalone near-dup pair query (see [[minhashPairsCtes]]). */
  def minhashPairsSql(shingleLen: Int, numHashes: Int, bands: Int, threshold: Double): String =
    s"WITH ${minhashPairsCtes(shingleLen, numHashes, bands, threshold)}\n" +
      "SELECT id_a, id_b, jaccard FROM dups"

  /** End-to-end dedup pipeline twin of
    * [[graft.queries.DedupQueries.dedupPipeline]]: near-dup pairs (above) →
    * connected components (recursive CTE computing, per node, the minimum id
    * reachable through the pair graph — exactly the min-id components the
    * Spark side derives with large-star/small-star) → drop every non-minimum
    * member → count survivors per language. */
  def dedupPipelineSql(shingleLen: Int, numHashes: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${minhashPairsCtes(shingleLen, numHashes, bands, threshold)},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM dups
       |  UNION SELECT id_b, id_a FROM dups
       |), cc AS (
       |  SELECT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e.dst, c.label FROM cc c JOIN edges e ON c.node = e.src
       |), roots AS (
       |  SELECT node, min(label) AS root FROM cc GROUP BY node
       |), drops AS (
       |  SELECT node FROM roots WHERE root < node
       |)
       |SELECT lang, count(*) AS n_kept
       |FROM documents
       |WHERE doc_id NOT IN (SELECT node FROM drops)
       |GROUP BY lang ORDER BY lang""".stripMargin
}
