package graft.queries

/** DuckDB oracle SQL for the MinHash (d02) and SimHash (d03) near-dup
  * operators — an independent reimplementation of Spark's `xxhash64`
  * (catalyst XXH64, seed 42) as pure DuckDB SQL macros, so the band/bit
  * signatures can be checked EXACTLY by the driver's DuckDB gate instead
  * of rows-only.
  *
  * Design notes (hard-won):
  *  - 64-bit wrap arithmetic rides on HUGEINT with an explicit mod 2^64;
  *    the multiply is SPLIT (lo32 × b + ((hi32 × b) mod 2^32) << 32)
  *    because a full 64×64 product overflows even INT128.
  *  - Rotations are (x * 2^r) mod 2^64 | (x >> (64-r)) — DuckDB's `<<`
  *    throws on overflow rather than wrapping.
  *  - Every computed hash round lands in its OWN CTE column before reuse:
  *    DuckDB expands macros textually with no common-subexpression
  *    elimination, so composing rounds in one expression multiplies the
  *    work per nesting level (the naive composition ran minutes per 2400
  *    rows; the staged form runs the full oracle in seconds). The
  *    shingle-only rounds of `xxhash64(i, hb)` are hoisted out of the
  *    32-hash cross join for the same reason.
  *  - The string path implements XXH64's sub-32-byte tail (8-byte words,
  *    4-byte chunk, trailing bytes over `ord()`); the fixture vocabulary
  *    is ASCII with 3-gram shingles <= 26 bytes (checked across all SFs).
  *    A >= 32-byte or non-ASCII input would make gx_a64's NULL seed
  *    propagate / ord() exceed a byte and the compare would FAIL LOUDLY,
  *    never silently pass.
  *  - Spark's min() over signatures is over SIGNED longs, and band hashes
  *    chain `xxhash64(mh_a, .., mh_d)` = hashLong folded left with seed
  *    42 — gx_signed/gx_unsigned shuttle between orders.
  *
  * Validated bit-for-bit against `graft.Verify` dumps at sf0.001 AND
  * sf0.01 before being wired in (12/12 and 7/7 d02 pairs, 11/11 and 6/6
  * d03 pairs).
  */
object XxhOracle {

  /** XXH64 macro library (gx_ prefix; CREATE OR REPLACE is idempotent
    * across the driver's shared oracle connection).
    */
  val macros: String = """
CREATE OR REPLACE MACRO gx_m64(a, b) AS
  CAST(((CAST(a & 4294967295 AS HUGEINT) * CAST(b AS HUGEINT)) % 18446744073709551616
      + ((CAST(a >> 32 AS HUGEINT) * CAST(b AS HUGEINT)) % 4294967296) * 4294967296
       ) % 18446744073709551616 AS UBIGINT);
CREATE OR REPLACE MACRO gx_a64(a, b) AS
  CAST((CAST(a AS HUGEINT) + CAST(b AS HUGEINT)) % 18446744073709551616 AS UBIGINT);
CREATE OR REPLACE MACRO gx_r31(x) AS gx_m64(x, 2147483648) | (x >> 33);
CREATE OR REPLACE MACRO gx_r27(x) AS gx_m64(x, 134217728) | (x >> 37);
CREATE OR REPLACE MACRO gx_r23(x) AS gx_m64(x, 8388608) | (x >> 41);
CREATE OR REPLACE MACRO gx_r11(x) AS gx_m64(x, 2048) | (x >> 53);
CREATE OR REPLACE MACRO gx_fmix(h) AS
  xor(gx_m64(xor(gx_m64(xor(h, h >> 33), 14029467366897019727) , gx_m64(xor(h, h >> 33), 14029467366897019727) >> 29), 1609587929392839161),
      gx_m64(xor(gx_m64(xor(h, h >> 33), 14029467366897019727) , gx_m64(xor(h, h >> 33), 14029467366897019727) >> 29), 1609587929392839161) >> 32);
CREATE OR REPLACE MACRO gx_wstep(h, w) AS
  gx_a64(gx_m64(gx_r27(xor(h, gx_m64(gx_r31(gx_m64(w, 14029467366897019727)), 11400714785074694791))), 11400714785074694791), 9650029242287828579);
CREATE OR REPLACE MACRO gx_step4(h, w) AS
  gx_a64(gx_m64(gx_r23(xor(h, gx_m64(w, 11400714785074694791))), 14029467366897019727), 1609587929392839161);
CREATE OR REPLACE MACRO gx_bstep(h, b) AS
  gx_m64(gx_r11(xor(h, gx_m64(b, 2870177450012600261))), 11400714785074694791);
CREATE OR REPLACE MACRO gx_word(s, o, n) AS
  CAST(list_sum(list_transform(generate_series(0, n - 1),
    j -> CAST(ord(array_extract(s, CAST(o + j AS INT))) AS HUGEINT)
         * [1, 256, 65536, 16777216, 4294967296, 1099511627776, 281474976710656, 72057594037927936][CAST(j + 1 AS INT)])) AS UBIGINT);
CREATE OR REPLACE MACRO gx_hlong(l, s) AS
  gx_fmix(gx_wstep(gx_a64(s, 2870177450012600269), l));
CREATE OR REPLACE MACRO gx_hint(i, s) AS
  gx_fmix(gx_step4(gx_a64(s, 2870177450012600265), CAST(i AS UBIGINT) & 4294967295));
CREATE OR REPLACE MACRO gx_signed(u) AS
  CAST(CASE WHEN u >= 9223372036854775808 THEN CAST(u AS HUGEINT) - 18446744073709551616
            ELSE CAST(u AS HUGEINT) END AS BIGINT);
CREATE OR REPLACE MACRO gx_unsigned(l) AS
  CAST(CASE WHEN l < 0 THEN CAST(l AS HUGEINT) + 18446744073709551616
            ELSE CAST(l AS HUGEINT) END AS UBIGINT);
"""

  /** Shared prefix: distinct 3-word shingles of documents(doc_id < 300),
    * staged XXH64 string hash -> per-shingle 64-bit base hash `hb`
    * (mirrors Dedup.shingles + xxhash64(shingle)).
    */
  private val shinglesAndBaseHash: String = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE doc_id < 300
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i, i + 2), ' ') AS s
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i
        FROM t WHERE len(ws) >= 3)
),
s0 AS (SELECT doc_id, s, length(s) AS len FROM sh),
s1 AS (SELECT *, gx_a64(gx_a64(42, 2870177450012600261), len) AS h1 FROM s0),
s2 AS (SELECT *, CASE WHEN len >= 8 THEN list_reduce(
         list_prepend(h1, list_transform(generate_series(0, len // 8 - 1),
           k -> gx_word(s, 1 + 8 * k, 8))), (a, w) -> gx_wstep(a, w)) ELSE h1 END AS h2 FROM s1),
s3 AS (SELECT *, CASE WHEN len % 8 >= 4 THEN gx_step4(h2, gx_word(s, 1 + (len // 8) * 8, 4)) ELSE h2 END AS h3,
         (len // 8) * 8 + CASE WHEN len % 8 >= 4 THEN 4 ELSE 0 END AS done FROM s2),
s4 AS (SELECT *, CASE WHEN len > done THEN list_reduce(
         list_prepend(h3, list_transform(generate_series(CAST(done + 1 AS INT), CAST(len AS INT)),
           j -> CAST(ord(array_extract(s, CAST(j AS INT))) AS UBIGINT))),
         (a, b) -> gx_bstep(a, b)) ELSE h3 END AS h4 FROM s3),
sf1 AS (SELECT doc_id, gx_m64(xor(h4, h4 >> 33), 14029467366897019727) AS f1 FROM s4),
sf2 AS (SELECT doc_id, gx_m64(xor(f1, f1 >> 29), 1609587929392839161) AS f2 FROM sf1),
hb  AS (SELECT doc_id, xor(f2, f2 >> 32) AS hb FROM sf2),
"""

  /** d02: MinHash 32-hash signatures, 8-band LSH candidates, estimated
    * jaccard >= 0.5 — Dedup.minhashPairs defaults exactly.
    */
  val d02: String = macros + shinglesAndBaseHash + {
    val bandRounds = (1 to 4).map { r =>
      val p = if (r == 1) "b0" else s"b${r - 1}"
      s"""b${r}a AS (SELECT doc_id, sig, b, h, gx_m64(gx_unsigned(sig[4*b + $r]), 14029467366897019727) AS k FROM $p),
b${r}b AS (SELECT doc_id, sig, b, h, gx_m64(gx_r31(k), 11400714785074694791) AS k FROM b${r}a),
b${r}c AS (SELECT doc_id, sig, b, xor(gx_a64(h, 2870177450012600269), k) AS h FROM b${r}b),
b${r}d AS (SELECT doc_id, sig, b, gx_a64(gx_m64(gx_r27(h), 11400714785074694791), 9650029242287828579) AS h FROM b${r}c),
b${r}e AS (SELECT doc_id, sig, b, gx_m64(xor(h, h >> 33), 14029467366897019727) AS h FROM b${r}d),
b${r}f AS (SELECT doc_id, sig, b, gx_m64(xor(h, h >> 29), 1609587929392839161) AS h FROM b${r}e),
b$r  AS (SELECT doc_id, sig, b, xor(h, h >> 32) AS h FROM b${r}f),"""
    }.mkString("\n")
    s"""
k1 AS (SELECT doc_id, gx_m64(hb, 14029467366897019727) AS k FROM hb),
k2 AS (SELECT doc_id, gx_r31(k) AS k FROM k1),
k3 AS (SELECT doc_id, gx_m64(k, 11400714785074694791) AS k FROM k2),
iseeds AS (SELECT i, gx_hint(i, 42) AS hseed FROM (SELECT unnest(generate_series(0, 31)) AS i)),
x0 AS (SELECT doc_id, i, xor(gx_a64(hseed, 2870177450012600269), k) AS h FROM k3, iseeds),
x1 AS (SELECT doc_id, i, gx_a64(gx_m64(gx_r27(h), 11400714785074694791), 9650029242287828579) AS h FROM x0),
x2 AS (SELECT doc_id, i, gx_m64(xor(h, h >> 33), 14029467366897019727) AS h FROM x1),
x3 AS (SELECT doc_id, i, gx_m64(xor(h, h >> 29), 1609587929392839161) AS h FROM x2),
mh AS (SELECT doc_id, i, min(gx_signed(xor(h, h >> 32))) AS mh FROM x3 GROUP BY doc_id, i),
sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
b0 AS (SELECT doc_id, sig, b, CAST(42 AS UBIGINT) AS h
       FROM sig, (SELECT unnest(generate_series(0, 7)) AS b) bx),
$bandRounds
b4x AS (SELECT doc_id, b, h AS bh FROM b4),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM b4x a JOIN b4x b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
),
est AS (
  SELECT da, db,
    round(list_sum(list_transform(generate_series(1, 32),
      j -> CASE WHEN sa.sig[CAST(j AS INT)] = sb.sig[CAST(j AS INT)] THEN 1 ELSE 0 END)) / 32.0 * 10000) / 10000 AS est_jaccard
  FROM cand JOIN sig sa ON da = sa.doc_id JOIN sig sb ON db = sb.doc_id
)
SELECT da, db, est_jaccard FROM est WHERE est_jaccard >= 0.5
"""
  }

  /** q43: content-hash Bernoulli sample — keep rows where
    * `pmod(xxhash64(l_orderkey, l_linenumber), 10) = 0`. Spark's multi-arg
    * xxhash64 folds left from seed 42: h = hashLong(l_orderkey, 42) then
    * hashInt(l_linenumber, h) (l_orderkey is int64, l_linenumber int32 in
    * the parquet). Staged one round per CTE — the same no-CSE discipline
    * as d02/d03; pmod is over the SIGNED value, like Spark's.
    */
  val q43: String = macros + """
WITH h0 AS (SELECT l_quantity, l_linenumber,
    gx_wstep(gx_a64(42, 2870177450012600269), gx_unsigned(l_orderkey)) AS h
  FROM lineitem),
h1 AS (SELECT l_quantity, l_linenumber, gx_m64(xor(h, h >> 33), 14029467366897019727) AS h FROM h0),
h2 AS (SELECT l_quantity, l_linenumber, gx_m64(xor(h, h >> 29), 1609587929392839161) AS h FROM h1),
h3 AS (SELECT l_quantity, l_linenumber, xor(h, h >> 32) AS h FROM h2),
i0 AS (SELECT l_quantity, gx_step4(gx_a64(h, 2870177450012600265),
    CAST(l_linenumber AS UBIGINT) & 4294967295) AS h FROM h3),
i1 AS (SELECT l_quantity, gx_m64(xor(h, h >> 33), 14029467366897019727) AS h FROM i0),
i2 AS (SELECT l_quantity, gx_m64(xor(h, h >> 29), 1609587929392839161) AS h FROM i1),
i3 AS (SELECT l_quantity, xor(h, h >> 32) AS h FROM i2),
fin AS (SELECT l_quantity,
    CASE WHEN ((gx_signed(h) % 10) + 10) % 10 = 0 THEN 1 ELSE 0 END AS keep
  FROM i3)
SELECT CAST(sum(keep) AS BIGINT) AS n,
       round(sum(l_quantity * keep) / sum(keep), 2) AS avg_qty
FROM fin
"""

  /** d03: 64-bit SimHash from the same shingle hashes, 16-bit band
    * blocking, hamming <= 16 — Dedup.simhashPairs(maxHamming = 16).
    * 2^b stays exact through power(): every power of two is an exact
    * double.
    */
  val d03: String = macros + shinglesAndBaseHash + """
pow2 AS (
  SELECT b, CAST(power(CAST(2 AS HUGEINT), b) AS UBIGINT) AS v
  FROM (SELECT unnest(generate_series(0, 63)) AS b)
),
bitsum AS (
  SELECT doc_id, b, sum(CASE WHEN (hb >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hb, (SELECT unnest(generate_series(0, 63)) AS b) bs
  GROUP BY doc_id, b
),
sim AS (
  SELECT doc_id, CAST(coalesce(sum(CASE WHEN s > 0 THEN CAST(v AS HUGEINT) ELSE 0 END), 0) AS UBIGINT) AS sim
  FROM bitsum JOIN pow2 USING (b) GROUP BY doc_id
),
banded AS (
  SELECT doc_id, sim, b2, (sim >> (b2 * 16)) & 65535 AS bh
  FROM sim, (SELECT unnest(generate_series(0, 3)) AS b2) bx
),
pairs AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
    CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
  FROM banded a JOIN banded b
    ON a.b2 = b.b2 AND a.bh = b.bh AND a.doc_id < b.doc_id
)
SELECT da, db, hamming FROM pairs WHERE hamming <= 16
"""
}
