#!/usr/bin/env python3
"""Generate + test the hash-kernel DuckDB oracle SQL against the
Spark Verify dumps. Dev-side harness: `python3 scripts/gen_oracles.py
[sfDir] [verifyOut] [names...]` compares each generated oracle with
the corresponding Spark parquet dump (exact, full precision) and
prints the SQL for any requested name to stdout for embedding in
SparkEntry.oracleSql."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import duckdb
import pandas as pd
from oracle_frags import *

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3:])


def build():
    o = {}

    # ---- mm_features: FNV of the UTF-8 payload -> fake dims ----
    h = fnv_text("text")
    hs = to_signed(h)
    o["mm_features"] = f"""
SELECT doc_id,
 CASE CAST(doc_id % 3 AS BIGINT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      ELSE 'video' END AS modality,
 CAST(length(text) AS BIGINT) AS n_bytes,
 CAST(abs(({hs}) % 1024) + 1 AS INT) AS width,
 CAST((({h}) // 65536) % 1024 + 1 AS INT) AS height,
 CAST(CASE WHEN doc_id % 3 = 2 THEN (({h}) // {TWO32}) % 300 + 1 ELSE 1 END AS INT) AS n_frames
FROM documents"""

    # ---- mm_filter: reason-coded curation on the decoded features —
    # first-match verdict in a stable order, integer aspect test ----
    o["mm_filter"] = f"""
WITH f AS ({o['mm_features']})
SELECT doc_id, modality, width, height, n_bytes,
 CASE WHEN width < 64 OR height < 64 THEN 'too_small'
      WHEN least(width, height) * 3 < greatest(width, height)
        THEN 'bad_aspect'
      WHEN n_bytes < 64 THEN 'tiny_payload'
      ELSE 'keep' END AS verdict
FROM f"""

    # ---- mm_resize / mm_frame_sample: post-decode geometry plans on
    # the same FNV-derived fake dims ----
    feats = f"""
 SELECT doc_id,
  CASE CAST(doc_id % 3 AS BIGINT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS modality,
  CAST(abs(({hs}) % 1024) + 1 AS INT) AS width,
  CAST((({h}) // 65536) % 1024 + 1 AS INT) AS height,
  CAST(CASE WHEN doc_id % 3 = 2 THEN (({h}) // {TWO32}) % 300 + 1 ELSE 1 END AS INT) AS n_frames
 FROM documents"""
    o["mm_resize"] = f"""
WITH feats AS ({feats})
SELECT doc_id, modality, width, height,
 CASE WHEN width >= height THEN least(width, 256)
      ELSE greatest(1, CAST(floor((width * least(height, 256)) / height) AS INT))
 END AS out_w,
 CASE WHEN height > width THEN least(height, 256)
      ELSE greatest(1, CAST(floor((height * least(width, 256)) / width) AS INT))
 END AS out_h
FROM feats"""

    # the Spark side plants doc_id = -1: a REAL 5-frame animated GIF
    # decoded by javax.imageio (the non-stub codec arm); its geometry
    # is known by construction, so the oracle pins it as a constant
    o["mm_frame_sample"] = f"""
WITH feats AS ({feats})
SELECT doc_id, modality, n_frames,
 CASE WHEN modality = 'video'
      THEN array_to_string(range(0, n_frames,
             greatest(1, CAST(floor((n_frames + 7) / 8.0) AS INT))), ',')
      ELSE '0' END AS frames,
 CASE WHEN modality = 'video'
      THEN CAST(len(range(0, n_frames,
             greatest(1, CAST(floor((n_frames + 7) / 8.0) AS INT)))) AS BIGINT)
      ELSE CAST(1 AS BIGINT) END AS n_sampled
FROM feats
UNION ALL
SELECT CAST(-1 AS BIGINT) AS doc_id, 'video' AS modality,
 CAST(5 AS INT) AS n_frames, '0,1,2,3,4' AS frames,
 CAST(5 AS BIGINT) AS n_sampled
UNION ALL
SELECT CAST(-2 AS BIGINT) AS doc_id, 'video' AS modality,
 CAST(24 AS INT) AS n_frames, '0,3,6,9,12,15,18,21' AS frames,
 CAST(8 AS BIGINT) AS n_sampled
UNION ALL
SELECT CAST(-3 AS BIGINT) AS doc_id, 'audio' AS modality,
 CAST(88200 AS INT) AS n_frames, '0' AS frames,
 CAST(1 AS BIGINT) AS n_sampled"""

    # ---- mm_audio_decode: sample-level audio decode — corpus rows
    # are text bytes (not WAV) -> deterministic stub stats from the
    # payload FNV, unsigned-shift arithmetic as HUGEINT floor-divs;
    # the Spark side plants doc_id = -10/-11: REAL PCM16 WAVs decoded
    # sample-by-sample through javax.sound.sampled, whose frame/
    # channel/rate/peak values are known by construction (the
    # wavBytes ramp has peak |amplitude| exactly 617 for any n >= 1) ----
    o["mm_audio_decode"] = f"""
SELECT doc_id,
 CAST((({h}) // 256) % 100000 + 1 AS BIGINT) AS n_frames,
 CAST((({h}) // 65536) % 2 + 1 AS INT) AS channels,
 CAST(8000 * ((({h}) // 16777216) % 6 + 1) AS INT) AS rate,
 CAST((({h}) // 1099511627776) % 32768 AS INT) AS peak,
 false AS decoded
FROM documents
UNION ALL
SELECT CAST(-10 AS BIGINT) AS doc_id, CAST(441 AS BIGINT) AS n_frames,
 CAST(2 AS INT) AS channels, CAST(44100 AS INT) AS rate,
 CAST(617 AS INT) AS peak, true AS decoded
UNION ALL
SELECT CAST(-11 AS BIGINT) AS doc_id, CAST(100 AS BIGINT) AS n_frames,
 CAST(1 AS INT) AS channels, CAST(8000 AS INT) AS rate,
 CAST(617 AS INT) AS peak, true AS decoded"""

    # ---- txt_bpe_train / ds_pack_bpe: replay R rounds of word-level
    # BPE merge learning. Pair counts via a lead window over the
    # symbol sequence; the argmax merge uses the same total tie-break
    # (count DESC, pair ASC); greedy left-to-right application =
    # alternation within runs of consecutive hit positions (for a!=b
    # hits are never adjacent; for a==b runs, odd-indexed hits merge
    # and the following position is consumed). h{r} LEFT-JOINs best{r}
    # ON true (r9 advice): if pair exhaustion empties best{r} before
    # the last round, every hit is 0 and seq{r} = seq{r-1} — matching
    # the trainer's early-stop (keep the last vocab), where a CROSS
    # JOIN would empty every downstream CTE ----
    def bpe_apply(name, src, best):
        """One merge application over sequence CTE `src` against the
        1-row (possibly empty) pair CTE `best` -> sequence CTE `name`.
        LEFT JOIN ON true: an empty best leaves the sequence as-is
        (trainer early-stop / unfilled batch slot)."""
        return f"""pl_{name} AS MATERIALIZED (SELECT word, freq, pos, sym,
 lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM {src}),
h_{name} AS MATERIALIZED (SELECT p.word, p.freq, p.pos, p.sym, p.nxt,
 CASE WHEN p.nxt IS NOT NULL AND p.sym = b.a AND p.nxt = b.b
      THEN 1 ELSE 0 END AS hit
 FROM pl_{name} p LEFT JOIN {best} b ON true),
k_{name} AS MATERIALIZED (SELECT word, pos FROM (
  SELECT word, pos, row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
  FROM (SELECT word, pos,
    pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
   FROM h_{name} WHERE hit = 1))
 WHERE rn % 2 = 1),
{name} AS MATERIALIZED (
 SELECT h.word, h.freq,
  CAST(row_number() OVER (PARTITION BY h.word ORDER BY h.pos) AS BIGINT) AS pos,
  CASE WHEN k.pos IS NOT NULL THEN h.sym || h.nxt ELSE h.sym END AS sym
 FROM h_{name} h
 LEFT JOIN k_{name} k ON k.word = h.word AND k.pos = h.pos
 LEFT JOIN k_{name} kp ON kp.word = h.word AND kp.pos = h.pos - 1
 WHERE kp.pos IS NULL)"""

    def bpe_ctes(rounds, batch, fetch):
        """Replay `rounds` driver rounds of the r10 batched trainer:
        per round, rank pair counts once (count DESC, pair ASC, top
        `fetch`), greedily select up to `batch` conflict-free pairs
        in rank order skipping conflicts (the p{r}_{j} chain with an
        accumulating used set holding accepted SYMBOLS and
        CONCATENATIONS — r10 advice: a candidate whose symbol or
        concatenation collides with an accepted concatenation or
        symbol is skipped), then apply the selected merges one at a
        time to the sequence. Mirrors Bpe.train exactly."""
        parts = ["""words AS MATERIALIZED (
 SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
 WHERE word <> '' GROUP BY word),
seq0 AS MATERIALIZED (
 SELECT word, freq, CAST(t.i AS BIGINT) AS pos, substr(word, t.i, 1) AS sym
 FROM words CROSS JOIN
  (SELECT unnest(range(1, (SELECT max(length(word)) + 1 FROM words))) AS i) t
 WHERE t.i <= length(word))"""]
        prev_seq = "seq0"
        for r in range(1, rounds + 1):
            parts.append(f"""cand{r} AS MATERIALIZED (
 SELECT a, b, c, rn FROM (
  SELECT sym AS a, nxt AS b, CAST(sum(freq) AS BIGINT) AS c,
   row_number() OVER (ORDER BY CAST(sum(freq) AS BIGINT) DESC, sym, nxt) AS rn
  FROM (SELECT word, freq, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM {prev_seq})
  WHERE nxt IS NOT NULL GROUP BY sym, nxt) _c
 WHERE rn <= {fetch})""")
            for j in range(1, batch + 1):
                if j == 1:
                    parts.append(f"""p{r}_1 AS MATERIALIZED (
 SELECT a, b, c, rn FROM cand{r} ORDER BY rn LIMIT 1),
u{r}_1 AS (SELECT a AS s FROM p{r}_1 UNION SELECT b FROM p{r}_1
 UNION SELECT a || b FROM p{r}_1)""")
                else:
                    parts.append(f"""p{r}_{j} AS MATERIALIZED (
 SELECT a, b, c, rn FROM cand{r}
 WHERE a NOT IN (SELECT s FROM u{r}_{j-1})
   AND b NOT IN (SELECT s FROM u{r}_{j-1})
   AND a || b NOT IN (SELECT s FROM u{r}_{j-1})
 ORDER BY rn LIMIT 1),
u{r}_{j} AS (SELECT a AS s FROM p{r}_{j} UNION SELECT b FROM p{r}_{j}
 UNION SELECT a || b FROM p{r}_{j}
 UNION SELECT s FROM u{r}_{j-1})""")
                parts.append(bpe_apply(f"s{r}_{j}",
                                       prev_seq if j == 1 else f"s{r}_{j-1}",
                                       f"p{r}_{j}"))
            prev_seq = f"s{r}_{batch}"
        return ",\n".join(parts), prev_seq

    BPE_R, BPE_K, BPE_F = 6, 16, 64
    bpe_body, bpe_final = bpe_ctes(BPE_R, BPE_K, BPE_F)
    merge_rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS _r, {j} AS _j, a, b, c FROM p{r}_{j}"
        for r in range(1, BPE_R + 1) for j in range(1, BPE_K + 1))
    o["txt_bpe_train"] = f"""WITH {bpe_body}
SELECT CAST(row_number() OVER (ORDER BY _r, _j) AS BIGINT) AS "rank",
 a AS lhs, b AS rhs, c AS pair_count
FROM ({merge_rows})"""

    o["ds_pack_bpe"] = f"""WITH RECURSIVE {bpe_body},
vocab AS (SELECT word, CAST(count(*) AS BIGINT) AS toklen
          FROM {bpe_final} GROUP BY word),
dt AS (
 SELECT doc_id, source, CAST(sum(toklen) AS BIGINT) AS bpe_tokens
 FROM (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS word
       FROM documents) dw
 JOIN vocab USING (word)
 GROUP BY doc_id, source),
d AS (SELECT source, doc_id, bpe_tokens,
 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM dt),
pk AS (
 SELECT source, doc_id, bpe_tokens, rn, bpe_tokens AS acc, CAST(0 AS BIGINT) AS seq
 FROM d WHERE rn = 1
 UNION ALL
 SELECT d.source, d.doc_id, d.bpe_tokens, d.rn,
  CASE WHEN pk.acc + d.bpe_tokens > 512 THEN d.bpe_tokens
       ELSE pk.acc + d.bpe_tokens END,
  pk.seq + CASE WHEN pk.acc + d.bpe_tokens > 512 THEN 1 ELSE 0 END
 FROM pk JOIN d ON d.source = pk.source AND d.rn = pk.rn + 1)
SELECT source, seq AS seq_id, CAST(count(*) AS BIGINT) AS n_docs,
 CAST(sum(bpe_tokens) AS BIGINT) AS tokens
FROM pk GROUP BY source, seq"""

    # ---- txt_bpe_encode / ds_pack_ids: token-ID sequences under the
    # learned vocab (r11 verdict item 2). Id layout replicates
    # Bpe.encode: base alphabet (distinct chars of the distinct-word
    # frame, sorted — ASCII corpus, so DuckDB byte order == Scala
    # UTF-16 order) at ids 0..C-1; merge rank r defines lhs||rhs at
    # id C+r-1; a re-created token string takes its MIN id. Per-word
    # symbol sequences come from the final training CTE; docs
    # reassemble word ids in (word position, symbol position) order.
    encode_ctes = f"""{bpe_body},
alpha AS MATERIALIZED (SELECT DISTINCT sym FROM seq0),
cid AS MATERIALIZED (
 SELECT sym AS tok, CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS id
 FROM alpha),
mrg AS MATERIALIZED (
 SELECT a || b AS tok,
  (SELECT count(*) FROM alpha)
    + row_number() OVER (ORDER BY _r, _j) - 1 AS id
 FROM ({merge_rows})),
tok_ids AS MATERIALIZED (
 SELECT tok, CAST(min(id) AS BIGINT) AS id FROM (
  SELECT tok, id FROM cid UNION ALL SELECT tok, id FROM mrg)
 GROUP BY tok),
wids AS MATERIALIZED (
 SELECT f.word, f.pos, t.id FROM {bpe_final} f
 JOIN tok_ids t ON t.tok = f.sym),
dwp AS MATERIALIZED (
 SELECT doc_id, source, t.i AS wpos, ws[t.i] AS word
 FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS ws
       FROM documents) d
 CROSS JOIN (SELECT unnest(range(1,
   (SELECT max(len(string_split(lower(text), ' '))) + 1
    FROM documents))) AS i) t
 WHERE t.i <= len(ws) AND ws[t.i] <> ''),
enc AS MATERIALIZED (
 SELECT doc_id, any_value(source) AS source,
  CAST(count(*) AS BIGINT) AS n_tokens,
  string_agg(CAST(w.id AS VARCHAR), ',' ORDER BY dwp.wpos, w.pos) AS ids
 FROM dwp JOIN wids w ON w.word = dwp.word
 GROUP BY doc_id)"""

    o["txt_bpe_encode"] = f"""WITH {encode_ctes}
SELECT doc_id, n_tokens, ids FROM enc"""

    # ---- txt_bpe_drift: fertility (tokens per whitespace word) of a
    # base/delta split under the SAME frozen vocab, drift flagged as
    # the exact integer cross-product (delta > 9/8 x base) ----
    o["txt_bpe_drift"] = f"""WITH {encode_ctes},
w AS (SELECT doc_id, source,
  CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
       AS BIGINT) AS n_words,
  doc_id % 4 = 0 AS side
 FROM documents)
SELECT w.source AS grp,
 CAST(sum(CASE WHEN NOT side THEN 1 ELSE 0 END) AS BIGINT) AS docs_base,
 CAST(sum(CASE WHEN side THEN 1 ELSE 0 END) AS BIGINT) AS docs_delta,
 CAST(sum(CASE WHEN NOT side THEN n_words ELSE 0 END) AS BIGINT) AS words_base,
 CAST(sum(CASE WHEN side THEN n_words ELSE 0 END) AS BIGINT) AS words_delta,
 CAST(sum(CASE WHEN NOT side THEN e.n_tokens ELSE 0 END) AS BIGINT)
   AS tokens_base,
 CAST(sum(CASE WHEN side THEN e.n_tokens ELSE 0 END) AS BIGINT)
   AS tokens_delta,
 8 * sum(CASE WHEN side THEN e.n_tokens ELSE 0 END)
   * sum(CASE WHEN NOT side THEN n_words ELSE 0 END)
  > 9 * sum(CASE WHEN NOT side THEN e.n_tokens ELSE 0 END)
   * sum(CASE WHEN side THEN n_words ELSE 0 END) AS drifted
FROM enc e JOIN w ON w.doc_id = e.doc_id
GROUP BY 1"""

    o["ds_pack_ids"] = f"""WITH RECURSIVE {encode_ctes},
d AS (SELECT source, doc_id, n_tokens, ids,
 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM enc),
pk AS (
 SELECT source, doc_id, n_tokens, ids, rn, n_tokens AS acc,
  CAST(0 AS BIGINT) AS seq
 FROM d WHERE rn = 1
 UNION ALL
 SELECT d.source, d.doc_id, d.n_tokens, d.ids, d.rn,
  CASE WHEN pk.acc + d.n_tokens > 512 THEN d.n_tokens
       ELSE pk.acc + d.n_tokens END,
  pk.seq + CASE WHEN pk.acc + d.n_tokens > 512 THEN 1 ELSE 0 END
 FROM pk JOIN d ON d.source = pk.source AND d.rn = pk.rn + 1)
SELECT source, seq AS seq_id, CAST(count(*) AS BIGINT) AS n_docs,
 CAST(sum(n_tokens) AS BIGINT) AS tokens,
 string_agg(ids, ',' ORDER BY rn) AS ids
FROM pk GROUP BY source, seq"""

    # ---- q_approx_distinct: KMV bottom-k estimate, recomputed from
    # the k-th smallest biased splitmix hash (identical double ops) ----
    hu = splitmix("CAST(user_id AS HUGEINT)")
    o["q_approx_distinct"] = f"""
WITH h AS (
 SELECT DISTINCT event_type,
  CAST(({hu}) - 9223372036854775808 AS BIGINT) AS hb
 FROM events),
r AS (
 SELECT event_type, hb,
  row_number() OVER (PARTITION BY event_type ORDER BY hb) AS rn,
  count(*) OVER (PARTITION BY event_type) AS nd
 FROM h)
SELECT event_type,
 CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
      ELSE 63.0 * 1.8446744073709552E19
           / (CAST(hb AS DOUBLE) + 9.223372036854776E18) END AS est_users,
 CAST(nd AS BIGINT) AS exact_users
FROM r
WHERE rn = CASE WHEN nd < 64 THEN 1 ELSE 64 END"""

    # ---- q_kmv_set_ops: KMV sketch set algebra — bottom-64 biased
    # hashes per cohort, union estimate from the merged k-th hash,
    # Jaccard from the both-members fraction of the merged sketch ----
    o["q_kmv_set_ops"] = f"""
WITH ha AS (
 SELECT DISTINCT CAST(({hu}) - 9223372036854775808 AS BIGINT) AS h
 FROM events WHERE event_type = 'click'),
hb AS (
 SELECT DISTINCT CAST(({hu}) - 9223372036854775808 AS BIGINT) AS h
 FROM events WHERE event_type = 'purchase'),
ska AS (SELECT h FROM ha ORDER BY h LIMIT 64),
skb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
mg AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb) _u
       ORDER BY h LIMIT 64),
ms AS (SELECT count(*) AS msize, max(h) AS kth FROM mg),
ic AS (SELECT count(*) AS icnt FROM mg
       WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
fl AS (SELECT user_id,
        max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ia,
        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ib
       FROM events WHERE event_type IN ('click', 'purchase')
       GROUP BY user_id),
ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_union,
        CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS exact_intersect FROM fl)
SELECT
 CASE WHEN msize < 64 THEN CAST(msize AS DOUBLE)
      ELSE 63.0 * 1.8446744073709552E19
           / (CAST(kth AS DOUBLE) + 9.223372036854776E18) END AS est_union,
 CAST(icnt AS DOUBLE) / CAST(msize AS DOUBLE) AS jaccard_est,
 (CAST(icnt AS DOUBLE) / CAST(msize AS DOUBLE)) *
  (CASE WHEN msize < 64 THEN CAST(msize AS DOUBLE)
        ELSE 63.0 * 1.8446744073709552E19
             / (CAST(kth AS DOUBLE) + 9.223372036854776E18) END) AS est_intersect,
 exact_union, exact_intersect
FROM ms, ic, ex"""

    # ---- q_join_estimate: join-size estimation from per-side KMV
    # sketches — dint_est·(n_a/da_est)·(n_b/db_est); same biased hash
    # + (k−1)·2^64/u(k) estimator as q_kmv_set_ops; exact pairs from
    # per-key count products, never the join ----
    hk = splitmix("CAST(key AS HUGEINT)")
    kmv_est = (lambda cnt, kth:
               f"""CASE WHEN {cnt} < 64 THEN CAST({cnt} AS DOUBLE)
      ELSE 63.0 * 1.8446744073709552E19
           / (CAST({kth} AS DOUBLE) + 9.223372036854776E18) END""")
    o["q_join_estimate"] = f"""
WITH oa AS (SELECT o_custkey AS key FROM orders),
cb AS (SELECT c_custkey AS key FROM customer),
ha AS (SELECT DISTINCT CAST(({hk}) - 9223372036854775808 AS BIGINT) AS h FROM oa),
hb AS (SELECT DISTINCT CAST(({hk}) - 9223372036854775808 AS BIGINT) AS h FROM cb),
ska AS (SELECT h FROM ha ORDER BY h LIMIT 64),
skb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
sa AS (SELECT count(*) AS n, max(h) AS kth FROM ska),
sb AS (SELECT count(*) AS n, max(h) AS kth FROM skb),
mg AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb) _u
       ORDER BY h LIMIT 64),
ms AS (SELECT count(*) AS msize, max(h) AS kth FROM mg),
ic AS (SELECT count(*) AS icnt FROM mg
       WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM oa),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM cb),
ex AS (SELECT CAST(coalesce(sum(x.ca * y.cb), 0) AS BIGINT) AS exact_pairs
       FROM (SELECT key, count(*) AS ca FROM oa GROUP BY key) x
       JOIN (SELECT key, count(*) AS cb FROM cb GROUP BY key) y USING (key))
SELECT n_a, n_b,
 {kmv_est("sa.n", "sa.kth")} AS da_est,
 {kmv_est("sb.n", "sb.kth")} AS db_est,
 (CAST(icnt AS DOUBLE) / CAST(msize AS DOUBLE)) *
   ({kmv_est("msize", "ms.kth")}) AS dint_est,
 ((CAST(icnt AS DOUBLE) / CAST(msize AS DOUBLE)) *
   ({kmv_est("msize", "ms.kth")}))
  * (CAST(n_a AS DOUBLE) / ({kmv_est("sa.n", "sa.kth")}))
  * (CAST(n_b AS DOUBLE) / ({kmv_est("sb.n", "sb.kth")})) AS est_pairs,
 exact_pairs
FROM sa, sb, ms, ic, na, nb, ex"""

    # ---- q_sliding_distinct: per-wday KMV estimate over the raw
    # union (equals merged daily sketches by the bottom-k merge
    # property); same biased hash + estimator as q_approx_distinct ----
    o["q_sliding_distinct"] = f"""
WITH e AS (
 SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
  CAST(({hu}) - 9223372036854775808 AS BIGINT) AS h
 FROM events),
d AS (SELECT DISTINCT day FROM e),
wd AS (SELECT day + off AS wday, day FROM d CROSS JOIN range(0, 7) r(off)),
nd_days AS (SELECT wday, CAST(count(*) AS BIGINT) AS n_days FROM wd GROUP BY wday),
wh AS (SELECT DISTINCT w.wday, e.h FROM e JOIN wd w ON e.day = w.day),
r AS (
 SELECT wday, h,
  row_number() OVER (PARTITION BY wday ORDER BY h) AS rn,
  count(*) OVER (PARTITION BY wday) AS nd
 FROM wh)
SELECT r.wday, n_days,
 CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
      ELSE 63.0 * 1.8446744073709552E19
           / (CAST(h AS DOUBLE) + 9.223372036854776E18) END AS est_users
FROM r JOIN nd_days USING (wday)
WHERE rn = CASE WHEN nd < 64 THEN 1 ELSE 64 END"""

    # ---- q_cms_heavy_hitters: Count-Min counters recomputed as
    # sum-over-colliding-keys; est(key) = min over depth rows ----
    cms_b = splitmix(f"(({fnv_text('uid')}) + d) % {TWO64}")
    o["q_cms_heavy_hitters"] = f"""
WITH k AS (
 SELECT CAST(user_id AS VARCHAR) AS uid, count(*) AS n
 FROM events GROUP BY 1),
kb AS (
 SELECT uid, n, d, (({cms_b}) // 2) % 256 AS bk
 FROM k CROSS JOIN range(0, 4) r(d)),
c AS (SELECT d, bk, sum(n) AS cnt FROM kb GROUP BY d, bk)
SELECT uid, CAST(min(cnt) AS BIGINT) AS est_n,
 CAST(max(n) AS BIGINT) AS exact_n
FROM kb JOIN c USING (d, bk)
GROUP BY uid
ORDER BY est_n DESC, uid
LIMIT 10"""

    # ---- txt_decontaminate: training docs sharing any word 3-gram
    # with the doc_id%97==0 benchmark set; n_shared counts distinct
    # shared grams per doc ----
    grams3 = ("list_distinct(list_transform(range(1, len(toks)-3+2), "
              "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))")
    toks = ("list_filter(regexp_split_to_array(text, '[ \\n\\t\\r]+'), "
            "t -> t != '')")
    o["txt_decontaminate"] = f"""
WITH g AS (
 SELECT doc_id, unnest({grams3}) AS gram
 FROM (SELECT doc_id, {toks} AS toks FROM documents) _t
 WHERE len(toks) >= 3),
b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM g JOIN b USING (gram)
WHERE doc_id % 97 != 0
GROUP BY doc_id"""

    # ---- txt_cosine_pairs: exact all-pairs set cosine >= 3/5 over
    # distinct word 5-gram sets, brute-forced via the FULL shared-gram
    # self-join — independent of the engine's prefix-filtered plan;
    # the qualifying predicate is the same integer comparison
    # 25*c^2 >= 9*na*nb, the emitted cosine the same integer-exact
    # divide-by-sqrt ----
    grams5 = ("list_distinct(list_transform(range(1, len(toks)-5+2), "
              "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"
              " || ' ' || toks[i+3] || ' ' || toks[i+4]))")
    o["txt_cosine_pairs"] = f"""
WITH g AS (
 SELECT doc_id, unnest({grams5}) AS tok
 FROM (SELECT doc_id, {toks} AS toks FROM documents) _t
 WHERE len(toks) >= 5),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
c AS (
 SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
 FROM g a JOIN g b ON a.tok = b.tok AND a.doc_id < b.doc_id
 GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
 CAST(c.c AS DOUBLE) / sqrt(CAST(sa.n * sb.n AS DOUBLE)) AS cosine
FROM c
JOIN sz sa ON sa.doc_id = c.id_a
JOIN sz sb ON sb.doc_id = c.id_b
WHERE c.c * c.c * 25 >= 9 * sa.n * sb.n"""

    # ---- txt_cosine_stats: the prefix-filter funnel replayed — the
    # ENGINE's plan shape (collapse, df-ASC prefix, candidate
    # self-join, integer verify) re-derived in SQL so the candidate
    # volume (the quadratic-risk number) is oracle-checked, not
    # self-reported ----
    o["txt_cosine_stats"] = f"""
WITH dt AS (
 SELECT min(doc_id) AS rep, text FROM documents GROUP BY text),
g AS (
 SELECT rep, unnest({grams5}) AS tok
 FROM (SELECT rep, {toks} AS toks FROM dt) _t
 WHERE len(toks) >= 5),
dfr AS (SELECT tok, count(*) AS df FROM g GROUP BY tok),
pr AS (
 SELECT rep, g.tok,
  row_number() OVER (PARTITION BY rep ORDER BY df, g.tok) AS pos,
  count(*) OVER (PARTITION BY rep) AS nsz
 FROM g JOIN dfr ON dfr.tok = g.tok),
pf AS (SELECT * FROM pr WHERE pos <= nsz - (nsz * 9 + 24) // 25 + 1),
cand AS (
 SELECT DISTINCT a.rep AS ia, b.rep AS ib, a.nsz AS na, b.nsz AS nb
 FROM pf a JOIN pf b ON a.tok = b.tok AND a.rep < b.rep
 WHERE 9 * greatest(a.nsz, b.nsz) <= 25 * least(a.nsz, b.nsz)),
ver AS (
 SELECT c.ia, c.ib FROM cand c
 JOIN g a ON a.rep = c.ia
 JOIN g b ON b.rep = c.ib AND b.tok = a.tok
 GROUP BY c.ia, c.ib, c.na, c.nb
 HAVING count(*) * count(*) * 25 >= 9 * c.na * c.nb)
SELECT
 (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT rep FROM g)) AS n_classes,
 (SELECT CAST(count(*) AS BIGINT) FROM pf) AS n_prefix_rows,
 (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
 (SELECT CAST(count(*) AS BIGINT) FROM ver) AS n_verified"""

    # ---- txt_jaccard_pairs: exact all-pairs set JACCARD >= 1/3 over
    # distinct word 5-gram sets, brute-forced via the same FULL
    # shared-gram self-join as the cosine twin — independent of the
    # engine's prefix-filtered plan; verify c*(p+q) >= p*(na+nb) stays
    # integer, the emitted jaccard is one exact divide ----
    o["txt_jaccard_pairs"] = f"""
WITH g AS (
 SELECT doc_id, unnest({grams5}) AS tok
 FROM (SELECT doc_id, {toks} AS toks FROM documents) _t
 WHERE len(toks) >= 5),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
c AS (
 SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
 FROM g a JOIN g b ON a.tok = b.tok AND a.doc_id < b.doc_id
 GROUP BY 1, 2)
SELECT c.id_a, c.id_b,
 CAST(c.c AS DOUBLE) / CAST(sa.n + sb.n - c.c AS DOUBLE) AS jaccard
FROM c
JOIN sz sa ON sa.doc_id = c.id_a
JOIN sz sb ON sb.doc_id = c.id_b
WHERE c.c * 4 >= sa.n + sb.n"""

    # ---- txt_collocations: word2vec phrase score over adjacent
    # token bigrams — (n_xy - 5)*T / (n_x*n_y) for pairs seen >= 20
    # times; all counts integer, the score ONE exact double divide ----
    o["txt_collocations"] = f"""
WITH t AS (SELECT doc_id, {toks} AS w FROM documents),
bi AS (SELECT unnest(list_transform(range(1, len(w)),
        i -> struct_pack(x := w[i], y := w[i+1]))) AS p
       FROM t WHERE len(w) >= 2),
uni AS (SELECT unnest(w) AS tok FROM t),
ux AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM uni),
bc AS (SELECT p.x AS x, p.y AS y, CAST(count(*) AS BIGINT) AS n_xy
       FROM bi GROUP BY 1, 2 HAVING count(*) >= 20)
SELECT x, y, n_xy, nx.n AS n_x, ny.n AS n_y, tot.n_tokens,
 CAST((n_xy - 5) * tot.n_tokens AS DOUBLE)
   / CAST(nx.n * ny.n AS DOUBLE) AS score
FROM bc
JOIN ux nx ON nx.tok = x
JOIN ux ny ON ny.tok = y
CROSS JOIN tot"""

    # ---- q_seasonal: engine-exact additive decomposition — integer
    # RANGE-window sums, seasonal numerator sums the SCALED detrend
    # 7n - sum7 over full windows only, every double one exact divide
    # or a fixed-order subtraction of those ----
    o["q_seasonal"] = """
WITH daily AS (
 SELECT CAST(event_type AS VARCHAR) AS key,
  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS step,
  CAST(count(*) AS BIGINT) AS n
 FROM events GROUP BY 1, 2),
tr AS (
 SELECT key, step, n,
  CAST(sum(n) OVER w AS BIGINT) AS sum7,
  CAST(count(*) OVER w AS BIGINT) AS cnt7,
  CAST(step % 7 AS INT) AS dow
 FROM daily
 WINDOW w AS (PARTITION BY key ORDER BY step
              RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
se AS (
 SELECT key, dow, CAST(sum(n * 7 - sum7) AS BIGINT) AS s_num,
  CAST(count(*) AS BIGINT) AS s_cnt
 FROM tr WHERE cnt7 = 7 GROUP BY 1, 2)
SELECT tr.key AS event_type, tr.step, tr.dow, tr.n,
 CAST(sum7 AS DOUBLE) / CAST(cnt7 AS DOUBLE) AS trend,
 coalesce(CAST(s_num AS DOUBLE) / CAST(s_cnt * 7 AS DOUBLE), 0.0)
   AS seasonal,
 CAST(tr.n AS DOUBLE)
  - (CAST(sum7 AS DOUBLE) / CAST(cnt7 AS DOUBLE))
  - coalesce(CAST(s_num AS DOUBLE) / CAST(s_cnt * 7 AS DOUBLE), 0.0)
   AS residual
FROM tr LEFT JOIN se ON se.key = tr.key AND se.dow = tr.dow"""

    # ---- ds_*: deterministic sampling/splitting/mixing — the
    # per-mille bucket is (splitmix64(id+salt) >>> 1) % mod ----
    def bucket(id_expr, salt, mod):
        h = splitmix(f"CAST(({id_expr}) + {salt} AS HUGEINT)")
        return f"((({h}) // 2) % {mod})"

    o["ds_sample_stratified"] = f"""
SELECT doc_id, lang FROM documents
WHERE ({bucket('doc_id', 0, 1000)}) < CASE lang WHEN 'en' THEN 500 ELSE 250 END"""

    # ---- ds_alloc_budget: integer-exact Hamilton allocation of a
    # 301-doc budget across sources (floor quotas + largest-remainder
    # seats, ties by source ASC), then the smallest-(signed splitmix,
    # id) prefix per source — every seat replayed ----
    alloc_h = to_signed(splitmix("CAST(doc_id + 7 AS HUGEINT)"))
    o["ds_alloc_budget"] = f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY source),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
q0 AS (SELECT source, n, (301 * n) // tot AS fl, (301 * n) % tot AS rem
       FROM c CROSS JOIN t),
lo AS (SELECT 301 - sum(fl) AS leftover FROM q0),
rk AS (SELECT source, fl,
        row_number() OVER (ORDER BY rem DESC, source) AS r FROM q0),
q AS (SELECT source,
       fl + CASE WHEN r <= (SELECT leftover FROM lo) THEN 1 ELSE 0 END
         AS quota FROM rk),
d AS (SELECT doc_id, source,
       row_number() OVER (PARTITION BY source
         ORDER BY {alloc_h}, doc_id) AS drk
      FROM documents)
SELECT d.doc_id, d.source FROM d JOIN q USING (source)
WHERE d.drk <= q.quota"""

    # ---- ds_temperature_sample: τ=1/2 source rebalance — keep iff
    # u53 < min(1, 2/sqrt(n_src)); the uniform is the top-53-bit
    # splitmix fraction (exact double), sqrt/div are IEEE-exact ----
    u53 = (f"(CAST(({splitmix('CAST(doc_id + 19 AS HUGEINT)')}) // 2048 "
           f"AS DOUBLE) * 1.1102230246251565e-16)")
    o["ds_temperature_sample"] = f"""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY source)
SELECT doc_id, source FROM documents JOIN c USING (source)
WHERE {u53} < least(1.0, 2.0 / sqrt(CAST(n AS DOUBLE)))"""

    # ---- ds_bootstrap: deterministic Poisson(1) bootstrap — weight
    # of a row in replicate r = inverse-CDF lookup of the splitmix
    # uniform of (doc_id*16 + r + 29); replicate means are exact
    # integer sums divided once.  CDF literals = graft Sampling
    # .poissonCdf (truncated at weight 8). ----
    pcdf = ["0.36787944117144233", "0.7357588823428847",
            "0.9196986029286058", "0.9810118431238462",
            "0.9963401531726563", "0.9994058151824183",
            "0.999916758850712", "0.9999897508033253"]
    REPS = 16
    # replicate index r is unnested so the splitmix kernel appears
    # ONCE (16 inline copies exceed the JVM 64KB string-constant cap)
    boot_h = splitmix(f"CAST(doc_id * {REPS} + r + 29 AS HUGEINT)")
    boot_w = "8"
    for k in range(7, -1, -1):
        boot_w = f"CASE WHEN u < {pcdf[k]} THEN {k} ELSE {boot_w} END"
    o["ds_bootstrap"] = f"""
WITH ur AS (
 SELECT lang, n_chars, r,
  (CAST(({boot_h}) // 2048 AS DOUBLE) * 1.1102230246251565e-16) AS u
 FROM documents, unnest(range(0, {REPS})) AS t(r)),
a AS (
 SELECT lang, r, CAST(sum(({boot_w}) * n_chars) AS BIGINT) AS s,
  CAST(sum({boot_w}) AS BIGINT) AS c
 FROM ur GROUP BY lang, r),
m AS (SELECT lang, CAST(s AS DOUBLE) / CAST(c AS DOUBLE) AS mean_r FROM a),
base AS (
 SELECT lang, CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS tot
 FROM documents GROUP BY lang)
SELECT b.lang AS key, b.n, CAST(b.tot AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean,
 min(m.mean_r) AS boot_lo, max(m.mean_r) AS boot_hi
FROM base b JOIN m USING (lang) GROUP BY b.lang, b.n, b.tot"""

    # ---- ds_interleave: weighted interleave key — (53-bit splitmix
    # fraction as an integer) floor-div weight; sorting by ikey gives
    # every prefix the weight-proportional source mix ----
    o["ds_interleave"] = f"""
SELECT doc_id, source,
 CAST((({splitmix('CAST(doc_id + 23 AS HUGEINT)')}) // 2048)
  // (CASE WHEN source IN ('src0','src1','src2','src3','src4',
        'src5','src6','src7','src8','src9') THEN 1000 ELSE 250 END)
  AS BIGINT) AS ikey
FROM documents"""

    # ---- ds_correlated_sample: the SAME per-mille decision on the
    # shared custkey samples both tables -> referentially intact ----
    o["ds_correlated_sample"] = f"""
SELECT c_mktsegment, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
 CAST(count(*) AS BIGINT) AS n_orders,
 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE ({bucket('o_custkey', 21, 1000)}) < 100
  AND ({bucket('c_custkey', 21, 1000)}) < 100
GROUP BY c_mktsegment"""

    o["ds_split_assign"] = f"""
SELECT doc_id,
 CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, {bucket('doc_id', 42, 100)} AS b FROM documents) _s"""

    o["ds_mix_weighted"] = f"""
WITH m AS (
 SELECT source, doc_id,
  250 + (CAST(substring(source, 4) AS BIGINT) % 4) * 500 AS wpm,
  {bucket('doc_id', 7, 1000)} AS b
 FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
 CAST(sum((wpm // 1000) + CASE WHEN b < wpm % 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_emitted
FROM m GROUP BY source"""

    # ---- ds_epoch_plan: mix copies -> per-copy rows -> interleave
    # key on the per-copy id (doc_id*8 + copy_idx, salt 23) ----
    o["ds_epoch_plan"] = f"""
WITH m AS (
 SELECT source, doc_id,
  250 + (CAST(substring(source, 4) AS BIGINT) % 4) * 500 AS wpm,
  {bucket('doc_id', 7, 1000)} AS b
 FROM documents),
e AS (SELECT source, doc_id,
  (wpm // 1000) + CASE WHEN b < wpm % 1000 THEN 1 ELSE 0 END AS nc
 FROM m),
x AS (SELECT source, doc_id, unnest(range(0, nc)) AS copy_idx
      FROM e WHERE nc > 0)
SELECT doc_id, CAST(copy_idx AS BIGINT) AS copy_idx, source,
 CAST((({splitmix('CAST(doc_id * 8 + copy_idx + 23 AS HUGEINT)')}) // 2048)
  // (CASE WHEN source IN ('src0','src1','src2','src3','src4',
        'src5','src6','src7','src8','src9') THEN 1000 ELSE 250 END)
  AS BIGINT) AS ikey
FROM x"""

    # ---- ds_shuffle_order / ds_sample_fixed_k: signed splitmix hash
    # order (matches Spark's signed-long sort) ----
    def hsigned(salt):
        return to_signed(splitmix(f"CAST(doc_id + {salt} AS HUGEINT)"))

    o["ds_shuffle_order"] = f"""
SELECT doc_id, CAST(row_number() OVER (ORDER BY hs, doc_id) AS BIGINT) AS shuffle_pos
FROM (SELECT doc_id, {hsigned(13)} AS hs FROM documents) _h"""

    o["ds_sample_fixed_k"] = f"""
SELECT doc_id, lang FROM (
 SELECT doc_id, lang,
  row_number() OVER (PARTITION BY lang ORDER BY hs, doc_id) AS rk
 FROM (SELECT doc_id, lang, {hsigned(0)} AS hs FROM documents) _h) _r
WHERE rk <= 20"""

    # ---- ds_kfold: exact-size k-fold CV assignment — the same
    # signed-splitmix per-stratum rank, rotated mod k ----
    o["ds_kfold"] = f"""
SELECT doc_id, CAST(lang AS VARCHAR) AS stratum,
 CAST((row_number() OVER (PARTITION BY lang ORDER BY hs, doc_id) - 1)
      % 5 AS INT) AS fold
FROM (SELECT doc_id, lang, {hsigned(0)} AS hs FROM documents) _h"""

    # ---- q_target_encode: m-estimate smoothed target encoding —
    # integer counts/sums, fixed-order double ratio (prior first,
    # then numerator, one divide) for oracle parity ----
    o["q_target_encode"] = """
WITH g AS (
 SELECT CAST(l_partkey AS VARCHAR) AS category,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_y
 FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n,
        CAST(sum(sum_y) AS BIGINT) AS tot_s FROM g)
SELECT category, n, sum_y,
 (CAST(sum_y AS DOUBLE)
   + 10.0 * (CAST(tot_s AS DOUBLE) / CAST(tot_n AS DOUBLE)))
  / CAST(n + 10 AS DOUBLE) AS encoding
FROM g CROSS JOIN tot"""

    # ---- q_approx_quantiles: exact quantiles over the bottom-200-
    # by-signed-splitmix64(event_id+7) sample per event_type (same
    # keep rule as ds_sample_fixed_k, same interpolation kernel as
    # q_percentiles) ----
    he = to_signed(splitmix("CAST(event_id + 7 AS HUGEINT)"))
    o["q_approx_quantiles"] = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
 quantile_cont(value, 0.5) AS q50_est,
 quantile_cont(value, 0.9) AS q90_est
FROM (
 SELECT event_type, value,
  row_number() OVER (PARTITION BY event_type ORDER BY hs, event_id) AS rk
 FROM (SELECT event_type, event_id, value, {he} AS hs FROM events) _h) _r
WHERE rk <= 200
GROUP BY event_type"""

    # ---- txt_fingerprint: winnowing min rolling hash + simhash ----
    o["txt_fingerprint"] = f"""
SELECT doc_id,
 {rolling_min("text")} AS fp,
 {to_signed(simhash("text"))} AS simhash
FROM documents"""

    # ---- ann_brute_topk: exact cosine top-10, queries = vec_id < 5 ----
    o["ann_brute_topk"] = f"""
SELECT q_id, vec_id, cos, rnk FROM (
 SELECT q_id, vec_id, cos,
  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
 FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
   {cosine("q.embedding", "c.embedding")} AS cos
  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
  JOIN embeddings c ON c.vec_id != q.vec_id))
WHERE rnk <= 10"""

    # ---- ann_range_search: all corpus vectors with cos >= 0.2 ----
    o["ann_range_search"] = f"""
SELECT q_id, vec_id, cos FROM (
 SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
  {cosine("q.embedding", "c.embedding")} AS cos
 FROM (SELECT * FROM embeddings WHERE vec_id < 5) q
 JOIN embeddings c ON c.vec_id != q.vec_id)
WHERE cos >= 0.2"""

    # ---- dd_simhash / mm_phash_dedup: banded Hamming<=3 pairs.
    # Pigeonhole makes the 4x16-bit banding lossless for ham<=3 —
    # through buckets the [2, 256] size cap keeps, with the r10
    # sig-level collapse replicated: identical sigs collapse to their
    # min-id rep BEFORE banding (caps count distinct sigs), rep pairs
    # expand back through class membership, and sig-equal pairs are
    # Hamming 0 unconditionally. The piece VALUE is the bucket key
    # (no hash), so this is exact. ----
    def hamming_body(sig_src):
        """Shared collapse + banding + cap + expansion over a
        (doc_id, sig) CTE named `sig_src` — mirrors
        Dedup.hammingPairs operation-for-operation."""
        return f"""cls AS (
 SELECT doc_id, sig,
  min(doc_id) OVER (PARTITION BY sig) AS rep,
  count(*) OVER (PARTITION BY sig) AS n
 FROM {sig_src}),
reps AS (SELECT doc_id, sig FROM cls WHERE doc_id = rep),
pieces AS (
 SELECT doc_id, sig, piece,
  (CAST(sig AS HUGEINT) + CASE WHEN sig < 0 THEN {TWO64} ELSE 0 END)
    // ([1, 65536, 4294967296, 281474976710656])[piece+1] % 65536 AS pval
 FROM reps CROSS JOIN (SELECT unnest(range(0, 4)) AS piece) _p),
sized AS (SELECT piece, pval, count(*) AS bn FROM pieces GROUP BY 1, 2),
rp AS (
 SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
 FROM pieces a
 JOIN pieces b ON a.piece = b.piece AND a.pval = b.pval AND a.doc_id < b.doc_id
 JOIN sized s ON s.piece = a.piece AND s.pval = a.pval
 WHERE s.bn BETWEEN 2 AND 256
   AND bit_count(xor(a.sig, b.sig)) <= 3)
SELECT id_a, id_b, CAST(min(hamming) AS BIGINT) AS hamming FROM (
 SELECT least(ma.doc_id, mb.doc_id) AS id_a,
        greatest(ma.doc_id, mb.doc_id) AS id_b, rp.hamming
 FROM rp JOIN cls ma ON ma.rep = rp.id_a JOIN cls mb ON mb.rep = rp.id_b
 UNION ALL
 SELECT a.doc_id, b.doc_id, CAST(0 AS BIGINT)
 FROM cls a JOIN cls b ON a.rep = b.rep AND a.doc_id < b.doc_id) _x
GROUP BY id_a, id_b"""

    o["dd_simhash"] = f"""
WITH docs AS ({PLANTED_DOCS}),
sigs AS (SELECT doc_id, {to_signed(simhash("text"))} AS sig FROM docs),
{hamming_body("sigs")}"""

    ph = to_signed(splitmix(fnv_text("text")))
    flip = to_signed("(CAST(1 AS HUGEINT) << CAST(doc_id % 64 AS INT))")
    o["mm_phash_dedup"] = f"""
WITH base AS (SELECT doc_id, {ph} AS sig FROM documents),
pl AS (SELECT doc_id + 1000000 AS doc_id, xor(sig, {flip}) AS sig
       FROM base WHERE doc_id % 50 = 0),
sigs AS (SELECT doc_id, sig FROM base UNION ALL SELECT doc_id, sig FROM pl),
{hamming_body("sigs")}"""

    # ---- dd_lsh_stats: bucket-size histogram per band (raw-slice
    # bucket keys — engine-exact, no hash). r10: buckets count
    # DISTINCT content (the collapse pre-pass), mirroring what the
    # capped pair kernel actually faces ----
    o["dd_lsh_stats"] = f"""
WITH sigs AS (SELECT {minhash_sig("text")} AS sig
              FROM (SELECT DISTINCT text FROM documents) _d),
b AS (
 SELECT band, sig[band*4+1 : band*4+4] AS bkey
 FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) _b),
g AS (SELECT band, bkey, CAST(count(*) AS BIGINT) AS bucket_size
      FROM b GROUP BY band, bkey)
SELECT CAST(band AS BIGINT) AS band, bucket_size,
 CAST(count(*) AS BIGINT) AS n_buckets
FROM g GROUP BY band, bucket_size"""

    # ---- dd_minhash_lsh: full signature + banding pipeline with the
    # r10 content collapse replicated: identical texts collapse to
    # their min-id rep BEFORE signatures (caps count distinct
    # content), rep pairs share a (band, 4-long slice) bucket of
    # distinct-size in [2, maxBucket] with estimate = matching
    # signature positions / 64 >= 0.5, pairs expand back through
    # class membership, and text-equal pairs are est 1.0
    # unconditionally. (Spark buckets by hash(band, slice);
    # equality-on-slice is the same relation modulo 32-bit hash
    # collisions — none on this data.) ----
    est = ("list_sum(list_transform(range(1, 65), "
           "i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) / 64.0")
    # shared collapsed body: cls (membership), repdocs, sigs over
    # reps, banding + distinct-content cap, rp = rep-level pairs
    lsh_cls = f"""docs AS ({PLANTED_DOCS}),
cls AS (
 SELECT doc_id, text,
  min(doc_id) OVER (PARTITION BY text) AS rep,
  count(*) OVER (PARTITION BY text) AS n
 FROM docs),
repdocs AS (SELECT doc_id, text, n FROM cls WHERE doc_id = rep),
sigs AS (SELECT doc_id, {minhash_sig("text")} AS sig FROM repdocs),
banded AS (
 SELECT doc_id, sig, band, sig[band*4+1 : band*4+4] AS sl
 FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) _b),
sized AS (
 SELECT band, sl, count(*) AS bn FROM banded GROUP BY band, sl),
cand AS (
 SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
 FROM banded a
 JOIN banded b ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id
 JOIN sized s ON s.band = a.band AND s.sl = a.sl
 WHERE s.bn BETWEEN 2 AND 64),
rp AS MATERIALIZED (
 SELECT id_a, id_b, jaccard_est FROM (
  SELECT id_a, id_b, {est} AS jaccard_est
  FROM (SELECT c.id_a, c.id_b, x.sig AS sa, y.sig AS sb
        FROM cand c
        JOIN sigs x ON x.doc_id = c.id_a
        JOIN sigs y ON y.doc_id = c.id_b) _j) _e
 WHERE jaccard_est >= 0.5)"""
    o["dd_minhash_lsh"] = f"""
WITH {lsh_cls}
SELECT id_a, id_b, max(jaccard_est) AS jaccard_est FROM (
 SELECT least(ma.doc_id, mb.doc_id) AS id_a,
        greatest(ma.doc_id, mb.doc_id) AS id_b, rp.jaccard_est
 FROM rp JOIN cls ma ON ma.rep = rp.id_a JOIN cls mb ON mb.rep = rp.id_b
 UNION ALL
 SELECT a.doc_id, b.doc_id, CAST(1.0 AS DOUBLE)
 FROM cls a JOIN cls b ON a.rep = b.rep AND a.doc_id < b.doc_id) _x
GROUP BY id_a, id_b"""

    # ---- dd_minhash_classes: the representative-COMPRESSED form —
    # one row per distinct-content pair with class multiplicities
    # (linear in distinct content however duplicated the corpus) ----
    o["dd_minhash_classes"] = f"""
WITH {lsh_cls}
SELECT rp.id_a, rp.id_b, rp.jaccard_est,
 CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
FROM rp JOIN repdocs sa ON sa.doc_id = rp.id_a
JOIN repdocs sb ON sb.doc_id = rp.id_b"""

    # ---- dd_incremental_lsh: the UNCOLLAPSED full pipeline
    # restricted to pairs touching the delta (planted ids >= 1000000)
    # — the incremental operator probes delta-touched buckets of the
    # raw stream and must equal this exactly ----
    o["dd_incremental_lsh"] = f"""
WITH docs AS ({PLANTED_DOCS}),
sigs AS (SELECT doc_id, {minhash_sig("text")} AS sig FROM docs),
banded AS (
 SELECT doc_id, sig, band, sig[band*4+1 : band*4+4] AS sl
 FROM sigs CROSS JOIN (SELECT unnest(range(0, 16)) AS band) _b),
sized AS (
 SELECT band, sl, count(*) AS bn FROM banded GROUP BY band, sl),
cand AS (
 SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
 FROM banded a
 JOIN banded b ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id
 JOIN sized s ON s.band = a.band AND s.sl = a.sl
 WHERE s.bn BETWEEN 2 AND 64)
SELECT id_a, id_b, jaccard_est FROM (
 SELECT id_a, id_b, {est} AS jaccard_est
 FROM (SELECT c.id_a, c.id_b, x.sig AS sa, y.sig AS sb
       FROM cand c
       JOIN sigs x ON x.doc_id = c.id_a
       JOIN sigs y ON y.doc_id = c.id_b))
WHERE jaccard_est >= 0.5
 AND (id_a >= 1000000 OR id_b >= 1000000)"""

    # ---- dd_components: transitive closure over the REP pair graph,
    # members inherit their rep's component — provably equal to the
    # closure of the expanded pair graph (reps are class minima;
    # within-class edges interconnect every member) ----
    comp_ctes = f"""e AS MATERIALIZED (SELECT id_a AS x, id_b AS y FROM rp
      UNION SELECT id_b, id_a FROM rp),
r AS (SELECT x, y FROM e
      UNION SELECT r.x, e.y FROM r JOIN e ON r.y = e.x),
repcomp AS (SELECT x AS rep, least(x, min(y)) AS comp FROM r GROUP BY x)"""
    o["dd_components"] = f"""
WITH RECURSIVE {lsh_cls},
{comp_ctes}
SELECT m.doc_id, coalesce(rc.comp, m.rep) AS comp
FROM cls m LEFT JOIN repcomp rc ON rc.rep = m.rep
WHERE m.n >= 2 OR rc.comp IS NOT NULL"""

    # composite quality score (shared by dd_keep_best and
    # curate_pipeline; must stay operation-for-operation identical to
    # TextAnalysis.qualityScore for bit-exact doubles)
    quality_expr = """CAST(length(regexp_extract_all(lower(text), '\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS DOUBLE)
    / CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) * 0.4
  + (CASE WHEN CAST(length(text) AS DOUBLE) / CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) >= 3.0
           AND CAST(length(text) AS DOUBLE) / CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) <= 10.0
          THEN 0.3 ELSE 0.0 END)
  + (CASE WHEN CAST(length(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) <= 0.1
          THEN 0.2 ELSE 0.0 END)
  + (CASE WHEN CAST(length(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) <= 0.2
          THEN 0.1 ELSE 0.0 END)"""

    # ---- dd_keep_best: per-cluster canonical by quality argmax
    # (tie -> min doc_id) over the same rep-closure + membership
    # expansion as dd_components ----
    o["dd_keep_best"] = f"""
WITH RECURSIVE {lsh_cls},
{comp_ctes},
comp AS (
 SELECT m.doc_id, coalesce(rc.comp, m.rep) AS comp
 FROM cls m LEFT JOIN repcomp rc ON rc.rep = m.rep
 WHERE m.n >= 2 OR rc.comp IS NOT NULL),
scored AS (
 SELECT doc_id,
  {quality_expr} AS quality
 FROM docs),
cq AS (SELECT c.comp, c.doc_id, s.quality
       FROM comp c JOIN scored s USING (doc_id))
SELECT comp, n_members, doc_id AS keep_id, best_quality FROM (
 SELECT comp, doc_id,
  row_number() OVER (PARTITION BY comp ORDER BY quality DESC, doc_id) AS rn,
  CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS n_members,
  max(quality) OVER (PARTITION BY comp) AS best_quality
 FROM cq) _k
WHERE rn = 1"""

    # ---- ds_split_leakage_safe: 80/10/10 split keyed on the near-dup
    # COMPONENT (same rep-closure as dd_components; docs outside any
    # duplicate relation key on their own id), same splitmix bucket
    # rule as ds_split_assign (salt 42) ----
    o["ds_split_leakage_safe"] = f"""
WITH RECURSIVE {lsh_cls},
{comp_ctes},
comp AS (
 SELECT m.doc_id, coalesce(rc.comp, m.rep) AS comp
 FROM cls m LEFT JOIN repcomp rc ON rc.rep = m.rep
 WHERE m.n >= 2 OR rc.comp IS NOT NULL)
SELECT doc_id, comp,
 CASE WHEN ({bucket('comp', 42, 100)}) < 80 THEN 'train'
      WHEN ({bucket('comp', 42, 100)}) < 90 THEN 'val'
      ELSE 'test' END AS split
FROM (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
      FROM docs d LEFT JOIN comp c ON c.doc_id = d.doc_id) _c"""

    # ---- dd_embed_cosine: tiered exact — native float cosine as a
    # loose prefilter (error ~1e-6 << 0.01 margin), bit-exact double
    # formula decides at 0.98 ----
    o["dd_embed_cosine"] = f"""
WITH emb AS ({PLANTED_EMB})
SELECT id_a, id_b, cos FROM (
 SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  {cosine("a.embedding", "b.embedding")} AS cos
 FROM emb a JOIN emb b ON a.vec_id < b.vec_id
 WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.97)
WHERE cos >= 0.98"""

    # ---- integer-exact Lloyd k-means (Cluster.kmeans): init = k
    # smallest signed splitmix64(id); assignment = max(struct(cos,
    # cid)) (ties -> larger cid, like IVF); update = per-dim
    # fixed-point mean floorDiv(sum(floor(v*2^20)), n) / 2^20 —
    # integer sums are order-invariant, so this replicates Spark's
    # VectorSumLong bit-for-bit ----
    def kmeans_ctes(src, k=8, iters=2, train_permille=1000):
        sm = to_signed(splitmix("CAST(vec_id AS HUGEINT)"))
        # train_permille < 1000: Lloyd's init + update rounds run on a
        # deterministic splitmix id-sample (Cluster.kmeans's
        # trainPermille, salt 5); the FINAL assignment stays full-src
        tsrc = src if train_permille >= 1000 else (
            f"(SELECT * FROM {src} "
            f"WHERE ({bucket('vec_id', 5, 1000)}) < {train_permille})")
        def assign(name, cent, asrc):
            return f"""{name} AS (
 SELECT vec_id, embedding, cell FROM (
  SELECT c.vec_id, c.embedding, t.cid AS cell,
   row_number() OVER (PARTITION BY c.vec_id
     ORDER BY {cosine("c.embedding", "t.cent_vec")} DESC, t.cid DESC) AS rn
  FROM {asrc} c CROSS JOIN {cent} t)
 WHERE rn = 1)"""
        ctes = [f"""cent0 AS (
 SELECT vec_id AS cid, embedding AS cent_vec FROM {tsrc}
 ORDER BY {sm}, vec_id LIMIT {k})"""]
        cur = "cent0"
        for r in range(1, iters + 1):
            ctes.append(assign(f"a{r}", cur, tsrc))
            ctes.append(f"""q{r} AS (
 SELECT cell, i,
  SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0) AS BIGINT)) AS s,
  CAST(COUNT(*) AS BIGINT) AS n
 FROM a{r} CROSS JOIN range(1, 65) r(i)
 GROUP BY cell, i)""")
            ctes.append(f"""cent{r} AS (
 SELECT cell AS cid,
  list(CAST((s - ((s % n + n) % n)) // n AS DOUBLE) / 1048576.0 ORDER BY i)
    AS cent_vec
 FROM q{r} GROUP BY cell)""")
            cur = f"cent{r}"
        ctes.append(assign("afin", cur, src))
        return ",\n".join(ctes), cur

    km_ctes, km_cent = kmeans_ctes("emb")
    # dd_semantic trains on the 25% id-sample (the 100 TB shape);
    # q_kmeans_cells keeps full-corpus training (it checks kmeans
    # itself)
    km_ctes_s, _ = kmeans_ctes("emb", train_permille=250)
    # maxCell = 4096: semanticNearDupPairs drops cells outside
    # [2, 4096] BEFORE pair generation (the LSH maxBucket idiom) — the
    # r9 sf10 sweep caught this cap missing here (cells only exceed it
    # on the 100x replicated corpus, where the uncapped replica emitted
    # 10.5M pairs against Spark's exact empty result)
    # r10 collapse: identical vectors collapse to their min-id rep
    # after assignment (a class shares one cell); maxCell counts
    # DISTINCT vectors, cross-vector pairs come from capped cells,
    # vector-equal pairs are unconditional with the self-cosine
    # computed by the same double formula (cos(v,v) is 1.0 only up to
    # sqrt rounding)
    o["dd_semantic"] = f"""
WITH emb AS ({PLANTED_EMB}),
{km_ctes_s},
vcls AS (
 SELECT cell, vec_id, embedding,
  min(vec_id) OVER (PARTITION BY embedding) AS rep,
  count(*) OVER (PARTITION BY embedding) AS n
 FROM afin),
vreps AS (SELECT cell, vec_id, embedding FROM vcls WHERE vec_id = rep),
vcap AS (
 SELECT * FROM vreps WHERE cell IN (
  SELECT cell FROM vreps GROUP BY cell HAVING count(*) BETWEEN 2 AND 4096)),
srp AS (
 SELECT cell, id_a, id_b, cos FROM (
  SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
   {cosine("a.embedding", "b.embedding")} AS cos
  FROM vcap a JOIN vcap b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.97) _p
 WHERE cos >= 0.98),
selfcos AS (
 SELECT vec_id AS rep, cell, {cosine("embedding", "embedding")} AS cos
 FROM vreps)
SELECT p.cell, least(ma.vec_id, mb.vec_id) AS id_a,
 greatest(ma.vec_id, mb.vec_id) AS id_b, p.cos
FROM srp p JOIN vcls ma ON ma.rep = p.id_a JOIN vcls mb ON mb.rep = p.id_b
UNION ALL
SELECT w.cell, a.vec_id AS id_a, b.vec_id AS id_b, w.cos
FROM vcls a JOIN vcls b ON a.rep = b.rep AND a.vec_id < b.vec_id
JOIN selfcos w ON w.rep = a.rep
WHERE w.cos >= 0.98"""

    o["q_kmeans_cells"] = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
{km_ctes}
SELECT a.cell, CAST(count(*) AS BIGINT) AS n_members, t.cent_vec[1] AS c0
FROM afin a JOIN {km_cent} t ON t.cid = a.cell
GROUP BY a.cell, t.cent_vec[1]"""

    # ---- q_pagerank: scaled-integer PageRank, 3 unrolled rounds
    # (Graph.pageRank): rank0 = scale//N; contrib = rank//deg;
    # rank' = (3·scale//20)//N + (Σcontrib·17)//20 — all BIGINT floor
    # division on positives, order-invariant, bit-exact ----
    SCALE = "1000000000000"
    pr_iters = []
    prev = "r0"
    for i in range(1, 4):
        pr_iters.append(f"""c{i} AS (
 SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS m
 FROM e JOIN {prev} r ON r.node = e.src JOIN od d ON d.src = e.src
 GROUP BY e.dst),
r{i} AS (
 SELECT nd.node,
  CAST(bb.b + ((coalesce(c.m, 0) * 17) // 20) AS BIGINT) AS rank
 FROM nodes nd LEFT JOIN c{i} c ON c.node = nd.node CROSS JOIN basec bb)""")
        prev = f"r{i}"
    pr_body = ",\n".join(pr_iters)
    o["q_pagerank"] = f"""
WITH p AS (
 SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
e AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
basec AS (SELECT (({SCALE} * 3) // 20) // n AS b FROM nn),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
r0 AS (SELECT node, {SCALE} // n AS rank FROM nodes CROSS JOIN nn),
{pr_body}
SELECT node, rank FROM {prev}"""

    # ---- q_bfs_hops: multi-source BFS (Graph.hopDistance), 3 unrolled
    # frontier rounds on the same customer<->supplier graph; min-hop is
    # deterministic (a node appears in the FIRST frontier reaching it,
    # the anti-join removes it from later ones) ----
    bfs_rounds = []
    seen = "d0"
    for i in range(1, 4):
        prev_f = f"d{i-1}"
        bfs_rounds.append(f"""d{i} AS (
 SELECT DISTINCT e.dst AS node FROM e
 JOIN {prev_f} f ON f.node = e.src
 WHERE e.dst NOT IN (SELECT node FROM {seen})),
s{i} AS (SELECT node FROM {seen} UNION SELECT node FROM d{i})""")
        seen = f"s{i}"
    bfs_body = ",\n".join(bfs_rounds)
    bfs_out = "\nUNION ALL\n".join(
        f"SELECT node, CAST({i} AS BIGINT) AS hops FROM d{i}"
        for i in range(0, 4))
    o["q_bfs_hops"] = f"""
WITH p AS (
 SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
e AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
d0 AS (
 SELECT DISTINCT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node
 FROM supplier WHERE s_nationkey = 0),
{bfs_body}
{bfs_out}"""

    # ---- q_sssp: multi-source weighted shortest paths — 3 DENSE
    # Bellman-Ford rounds unrolled (min weight over <= 3-edge paths
    # from any nation-0 supplier; the engine's sparse frontier rounds
    # compute the identical iterate), edge weight = min shipment
    # quantity per customer<->supplier pair ----
    # MATERIALIZED on every w{i}: each round references the previous
    # round TWICE (carry + relax), so inlining doubles the plan per
    # round — 2^3 copies of the 60M-row edge build at sf10 spilled
    # 70+ GB of DuckDB temp before dying; materialized, the chain is
    # linear and the sf10 oracle runs in-memory
    sssp_rounds = []
    for i in range(1, 4):
        sssp_rounds.append(f"""w{i} AS MATERIALIZED (
 SELECT node, CAST(min(d) AS BIGINT) AS d FROM (
  SELECT node, d FROM w{i-1}
  UNION ALL
  SELECT e.dst AS node, f.d + e.w AS d
  FROM e JOIN w{i-1} f ON f.node = e.src) _u
 GROUP BY node)""")
    sssp_body = ",\n".join(sssp_rounds)
    o["q_sssp"] = f"""
WITH p AS MATERIALIZED (
 SELECT CAST(o_custkey * 2 AS BIGINT) AS src,
  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst,
  CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
 GROUP BY 1, 2),
e AS MATERIALIZED (
 SELECT src, dst, w FROM p UNION ALL SELECT dst, src, w FROM p),
w0 AS MATERIALIZED (
 SELECT DISTINCT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node,
  CAST(0 AS BIGINT) AS d
 FROM supplier WHERE s_nationkey = 0),
{sssp_body}
SELECT node, d AS dist FROM w3"""

    # ---- q_dp_counts: eps = ln 2 discrete-Laplace noisy group counts
    # (Privacy.dpCounts) — noise = G1 - G2, each G the TRAILING-ONES
    # count of the 53-bit splitmix draw seeded by (fnv1a(key), salt):
    # trailing-ones(v) = trailing-zeros(v+1) = bit_count((w & -w) - 1),
    # pure integer bit-ops both engines share ----
    def dp_geo(salt):
        u = splitmix(f"xor({fnv_text('key')}, {salt})")
        return (f"bit_count((CAST((({u}) // 2048) + 1 AS BIGINT) & "
                f"-CAST((({u}) // 2048) + 1 AS BIGINT)) - 1)")
    o["q_dp_counts"] = f"""
WITH c AS (
 SELECT CAST(event_type AS VARCHAR) AS key,
  CAST(count(*) AS BIGINT) AS n
 FROM events GROUP BY 1),
g AS (
 SELECT key, n,
  CAST({dp_geo(2026 * 2 + 1)} AS BIGINT) AS g1,
  CAST({dp_geo(2026 * 2 + 2)} AS BIGINT) AS g2
 FROM c)
SELECT key, n, g1 - g2 AS noise, n + g1 - g2 AS n_dp FROM g"""

    # ---- q_itemsets: pairwise frequent itemsets over order baskets
    # (Mining.pairCooccurrence) — pair support via the basket
    # self-join (the engine fans out C(k,2) pairs map-side from
    # per-basket arrays; counts are identical), confidence/lift as
    # single exact-integer divides ----
    o["q_itemsets"] = """
WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
           FROM lineitem),
tot AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
i AS (SELECT item, CAST(count(*) AS BIGINT) AS item_n FROM b GROUP BY item),
p AS (
 SELECT a.item AS item_a, c.item AS item_b,
  CAST(count(*) AS BIGINT) AS pair_n
 FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
 GROUP BY 1, 2
 HAVING count(*) >= 2)
SELECT item_a, item_b, pair_n, na.item_n AS n_a, nb.item_n AS n_b,
 tot.n_baskets,
 CAST(pair_n AS DOUBLE) / CAST(na.item_n AS DOUBLE) AS confidence,
 CAST(pair_n * tot.n_baskets AS DOUBLE)
   / CAST(na.item_n * nb.item_n AS DOUBLE) AS lift
FROM p
JOIN i na ON na.item = item_a
JOIN i nb ON nb.item = item_b
CROSS JOIN tot"""

    # ---- q_event_pattern: MATCH_RECOGNIZE-lite — per-user ordered
    # symbol stream, non-overlapping regex scan. The pattern is
    # SCAN-DETERMINISTIC (v[^vp]*p: the negated class pins each
    # match's end at the first terminal symbol), so leftmost-first
    # (JDK) and leftmost-longest (RE2) engines agree match-for-match
    sym = ("CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'"
           " WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'"
           " ELSE 'e' END")
    o["q_event_pattern"] = f"""
WITH s AS (
 SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
  string_agg({sym}, '' ORDER BY epoch_us(ts), event_id) AS str
 FROM events GROUP BY user_id)
SELECT user_id, n_events,
 CAST(len(regexp_extract_all(str, 'v[^vp]*p')) AS BIGINT) AS n_matches,
 CAST(coalesce(list_max(list_transform(
   regexp_extract_all(str, 'v[^vp]*p'), m -> len(m) - 2)), -1)
  AS BIGINT) AS max_gap
FROM s"""

    # ---- q_event_pattern_timed: the same automaton as a pure window
    # rule — a fire matches iff the LAST arm-or-fire before it is an
    # arm AND it fired within the tick budget ----
    o["q_event_pattern_timed"] = """
WITH e AS (
 SELECT user_id, epoch_us(ts) AS tus, event_id,
  CASE event_type WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
   ELSE 'o' END AS sym
 FROM events),
i AS (
 SELECT user_id, tus, event_id, sym,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id)
   AS BIGINT) AS idx
 FROM e),
p AS (
 SELECT user_id, tus, event_id, sym, idx,
  last_value(CASE WHEN sym IN ('v', 'p')
    THEN struct_pack(s := sym, t := tus, i := idx, b := event_id)
    END IGNORE NULLS)
   OVER (PARTITION BY user_id ORDER BY tus, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
 FROM i)
SELECT user_id, event_id AS end_id,
 idx - (prev).i - 1 AS gap_events,
 tus - (prev).t AS gap_ticks,
 (prev).b AS start_id
FROM p
WHERE sym = 'p' AND (prev).s = 'v' AND tus - (prev).t <= 3600000000"""

    # ---- q_event_pattern_rows: PER-MATCH rows for the batch CEP
    # surface (r12 item 7) — the window formulation of the same
    # v[^vp]*p automaton over the FULL 5-symbol alphabet, no time
    # bound, emitting each match's start/end anchors (q_event_pattern
    # aggregates to n_matches/max_gap; this is its row-level parity,
    # equal match-for-match to the regex scan) ----
    o["q_event_pattern_rows"] = """
WITH e AS (
 SELECT user_id, epoch_us(ts) AS tus, event_id,
  CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
   WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
   ELSE 'e' END AS sym
 FROM events),
i AS (
 SELECT user_id, tus, event_id, sym,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id)
   AS BIGINT) AS idx
 FROM e),
p AS (
 SELECT user_id, tus, event_id, sym, idx,
  last_value(CASE WHEN sym IN ('v', 'p')
    THEN struct_pack(s := sym, t := tus, i := idx, b := event_id)
    END IGNORE NULLS)
   OVER (PARTITION BY user_id ORDER BY tus, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
 FROM i)
SELECT user_id, event_id AS end_id,
 idx - (prev).i - 1 AS gap_events,
 tus - (prev).t AS gap_ticks,
 (prev).b AS start_id
FROM p
WHERE sym = 'p' AND (prev).s = 'v'"""

    # ---- q_event_pattern_steps: K-STEP timed CEP as CHAINED
    # IGNORE-NULLS windows (r12 item 4) — view -> click within 6 h ->
    # purchase within 12 h, last-predecessor (funnel last-touch)
    # semantics: step i completes from the most recent step-(i-1)
    # completion, which is sufficient as well as necessary because an
    # older completion only widens the gap ----
    o["q_event_pattern_steps"] = """
WITH e AS (
 SELECT user_id, epoch_us(ts) AS tus, event_id,
  CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
   WHEN 'purchase' THEN 'p' ELSE 'o' END AS sym
 FROM events),
s1 AS (
 SELECT user_id, tus, event_id, sym,
  CASE WHEN sym = 'v'
   THEN struct_pack(t := tus, t0 := tus, id0 := event_id) END AS m1
 FROM e),
s2 AS (
 SELECT *, last_value(m1 IGNORE NULLS) OVER
   (PARTITION BY user_id ORDER BY tus, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p2
 FROM s1),
s2m AS (
 SELECT *, CASE WHEN sym = 'c' AND tus - (p2).t <= 21600000000
   THEN struct_pack(t := tus, t0 := (p2).t0, id0 := (p2).id0) END AS m2
 FROM s2),
s3 AS (
 SELECT *, last_value(m2 IGNORE NULLS) OVER
   (PARTITION BY user_id ORDER BY tus, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p3
 FROM s2m)
SELECT user_id, event_id AS end_id, (p3).id0 AS start_id,
 tus - (p3).t0 AS total_ticks, tus - (p3).t AS last_gap_ticks
FROM s3
WHERE sym = 'p' AND tus - (p3).t <= 43200000000"""

    # ---- q_event_pattern_compiled: the pattern -> window compiler
    # (r14) — v[^vcps]*c[^vcps]*p with reset 's', per-transition
    # budgets 6 h / 12 h. The compiled rule: over SIGNIFICANT events
    # only, step i completes iff the IMMEDIATELY PRECEDING significant
    # event completed step i-1 within budget (lag, not ignore-nulls
    # last — the filter makes them equal and shrinks the window input)
    o["q_event_pattern_compiled"] = """
WITH e AS (
 SELECT user_id, epoch_us(ts) AS tus, event_id,
  CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
   WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END AS sym
 FROM events),
sig AS (SELECT * FROM e WHERE sym IN ('v', 'c', 'p', 's')),
s1 AS (
 SELECT *, CASE WHEN sym = 'v'
  THEN struct_pack(t := tus, t0 := tus, id0 := event_id) END AS m1
 FROM sig),
s2 AS (
 SELECT *, lag(m1) OVER
   (PARTITION BY user_id ORDER BY tus, event_id) AS p2
 FROM s1),
s2m AS (
 SELECT *, CASE WHEN sym = 'c' AND p2 IS NOT NULL
   AND tus - (p2).t <= 21600000000
  THEN struct_pack(t := tus, t0 := (p2).t0, id0 := (p2).id0) END AS m2
 FROM s2),
s3 AS (
 SELECT *, lag(m2) OVER
   (PARTITION BY user_id ORDER BY tus, event_id) AS p3
 FROM s2m)
SELECT user_id, event_id AS end_id, (p3).id0 AS start_id,
 tus - (p3).t0 AS total_ticks
FROM s3
WHERE sym = 'p' AND p3 IS NOT NULL AND tus - (p3).t <= 43200000000"""

    # ---- q_event_pattern_classes: PER-TRANSITION gap classes (r14)
    # — v[^s]*c[^sv]*p with budgets 6 h / 12 h. Last-predecessor rule
    # with blockers: step i completes iff the latest step-(i-1)
    # completion fits the budget AND no class-i symbol lies strictly
    # between it (completion row index < last blocker index fails) ----
    o["q_event_pattern_classes"] = """
WITH e AS (
 SELECT user_id, epoch_us(ts) AS tus, event_id,
  CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
   WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'o' END AS sym
 FROM events),
i AS (
 SELECT *, CAST(row_number() OVER
   (PARTITION BY user_id ORDER BY tus, event_id) AS BIGINT) AS idx
 FROM e),
s1 AS (
 SELECT *, CASE WHEN sym = 'v'
  THEN struct_pack(t := tus, i := idx, t0 := tus, id0 := event_id)
  END AS m1
 FROM i),
s2 AS (
 SELECT *,
  last_value(m1 IGNORE NULLS) OVER
   (PARTITION BY user_id ORDER BY tus, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p2,
  last_value(CASE WHEN sym = 's' THEN idx END IGNORE NULLS) OVER
   (PARTITION BY user_id ORDER BY tus, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b2
 FROM s1),
s2m AS (
 SELECT *, CASE WHEN sym = 'c' AND tus - (p2).t <= 21600000000
   AND (b2 IS NULL OR b2 <= (p2).i)
  THEN struct_pack(t := tus, i := idx, t0 := (p2).t0, id0 := (p2).id0)
  END AS m2
 FROM s2),
s3 AS (
 SELECT *,
  last_value(m2 IGNORE NULLS) OVER
   (PARTITION BY user_id ORDER BY tus, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p3,
  last_value(CASE WHEN sym IN ('s', 'v') THEN idx END IGNORE NULLS) OVER
   (PARTITION BY user_id ORDER BY tus, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS b3
 FROM s2m)
SELECT user_id, event_id AS end_id, (p3).id0 AS start_id,
 tus - (p3).t0 AS total_ticks, tus - (p3).t AS last_gap_ticks
FROM s3
WHERE sym = 'p' AND tus - (p3).t <= 43200000000
 AND (b3 IS NULL OR b3 <= (p3).i)"""

    # ---- dd_ngram_jaccard: brute-force exact 5-gram Jaccard >= 0.7;
    # size-ratio prefilter is sound (J <= min/max sizes) ----
    gr = ngrams("text", 5)
    o["dd_ngram_jaccard"] = f"""
WITH docs AS ({PLANTED_DOCS}),
grams AS (SELECT doc_id, {gr} AS g FROM docs)
SELECT id_a, id_b, jaccard FROM (
 SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(length(list_intersect(a.g, b.g)) AS DOUBLE)
    / length(list_distinct(list_concat(a.g, b.g))) AS jaccard
 FROM grams a JOIN grams b ON a.doc_id < b.doc_id
 WHERE least(len(a.g), len(b.g)) >= 0.7 * greatest(len(a.g), len(b.g)))
WHERE jaccard >= 0.7"""

    # ---- dd_containment: directed |A∩B|/|A| over discriminative
    # char 5-grams (df in [2, 50]); planted orig→dup pairs hit 1.0 ----
    o["dd_containment"] = f"""
WITH docs AS ({PLANTED_DOCS}),
g AS (SELECT doc_id, unnest({gr}) AS gram FROM docs),
b AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
r AS (SELECT doc_id, gram FROM g JOIN b USING (gram) WHERE df BETWEEN 2 AND 50),
nc AS (SELECT doc_id, count(*) AS n_rare FROM r GROUP BY doc_id),
p AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b, count(*) AS shared
      FROM r a JOIN r b2 USING (gram) WHERE a.doc_id != b2.doc_id
      GROUP BY 1, 2)
SELECT id_a, id_b, containment FROM (
 SELECT id_a, id_b,
  CAST(shared AS DOUBLE) / CAST(n_rare AS DOUBLE) AS containment
 FROM p JOIN nc ON nc.doc_id = p.id_a) _c
WHERE containment >= 0.8"""

    # ---- curate_pipeline: quality gate -> exact dedup keep-min-id ->
    # drop higher id of every exact-Jaccard>=0.8 pair ----
    o["curate_pipeline"] = f"""
WITH docs AS ({PLANTED_DOCS}),
scored AS (
 SELECT doc_id, text,
  {quality_expr} AS quality
 FROM docs),
qualified AS (SELECT doc_id, text FROM scored WHERE quality >= 0.4),
deduped AS (
 SELECT doc_id, text FROM (
  SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS keep
  FROM qualified)
 WHERE doc_id = keep),
grams AS (SELECT doc_id, {gr} AS g FROM deduped),
losers AS (
 SELECT DISTINCT id_b FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
   CAST(length(list_intersect(a.g, b.g)) AS DOUBLE)
     / length(list_distinct(list_concat(a.g, b.g))) AS jaccard
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE least(len(a.g), len(b.g)) >= 0.8 * greatest(len(a.g), len(b.g)))
 WHERE jaccard >= 0.8)
SELECT doc_id FROM deduped WHERE doc_id NOT IN (SELECT id_b FROM losers)"""

    # ---- ann_lsh_topk: SRP buckets with the 64x8 coefficient table
    # inlined as literals (same splitmix derivation as HashOps) ----
    def coef(i, j):
        return ((sm_py(i * 1315423911 + j) & 0xffff) / 32768.0) - 1.0

    planes, dim = 8, 64
    ctab = ("[" + ",".join(
        "[" + ",".join(repr(coef(i, j)) for i in range(dim)) + "]"
        for j in range(planes)) + "]")
    dot_j = ("list_sum(list_transform(range(1, len(embedding)+1), "
             "i -> CAST(embedding[i] AS DOUBLE) * ct[j+1][i]))")
    bucket = (f"list_sum(list_transform(range(0, {planes}), j -> "
              f"CASE WHEN ({dot_j}) > 0 THEN CAST(1 AS BIGINT) << j "
              f"ELSE CAST(0 AS BIGINT) END))")
    o["ann_lsh_topk"] = f"""
WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket
           FROM embeddings CROSS JOIN (SELECT {ctab} AS ct) _ct)
SELECT q_id, vec_id, cos, rnk FROM (
 SELECT q_id, vec_id, cos,
  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
 FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
   {cosine("q.embedding", "c.embedding")} AS cos
  FROM (SELECT * FROM b WHERE vec_id < 5) q
  JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.vec_id))
WHERE rnk <= 10"""

    # ---- ann_ivf_topk: centroids = 16 smallest signed splitmix64(id);
    # assignment/probing by exact cosine, ties like max(struct) ----
    o["ann_ivf_topk"] = f"""
WITH cent AS (
 SELECT vec_id AS cid, embedding AS cent_vec FROM embeddings
 ORDER BY {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id LIMIT 16),
assigned AS (
 SELECT vec_id, embedding, cell FROM (
  SELECT c.vec_id, c.embedding, t.cid AS cell,
   row_number() OVER (PARTITION BY c.vec_id
     ORDER BY {cosine("c.embedding", "t.cent_vec")} DESC, t.cid DESC) AS rn
  FROM embeddings c CROSS JOIN cent t)
 WHERE rn = 1),
probes AS (
 SELECT q_id, q_vec, cell FROM (
  SELECT q.vec_id AS q_id, q.embedding AS q_vec, t.cid AS cell,
   row_number() OVER (PARTITION BY q.vec_id
     ORDER BY {cosine("q.embedding", "t.cent_vec")} DESC, t.cid) AS rn
  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q CROSS JOIN cent t)
 WHERE rn <= 4)
SELECT q_id, vec_id, cos, rnk FROM (
 SELECT q_id, vec_id, cos,
  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
 FROM (
  SELECT p.q_id, a.vec_id, {cosine("p.q_vec", "a.embedding")} AS cos
  FROM assigned a JOIN probes p ON a.cell = p.cell AND p.q_id != a.vec_id))
WHERE rnk <= 10"""

    # ---- ann_ivf_delta: incremental IVF — codebook pinned on the
    # BASE slice, delta assigned under it, per-cell drift report with
    # the exact integer cross-product flag ----
    o["ann_ivf_delta"] = f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 < 8),
delta AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 >= 8),
cent AS (
 SELECT vec_id AS cid, embedding AS cent_vec FROM base
 ORDER BY {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id LIMIT 16),
ab AS (
 SELECT vec_id, cell FROM (
  SELECT c.vec_id, t.cid AS cell,
   row_number() OVER (PARTITION BY c.vec_id
     ORDER BY {cosine("c.embedding", "t.cent_vec")} DESC, t.cid DESC) AS rn
  FROM base c CROSS JOIN cent t) WHERE rn = 1),
ad AS (
 SELECT vec_id, cell FROM (
  SELECT c.vec_id, t.cid AS cell,
   row_number() OVER (PARTITION BY c.vec_id
     ORDER BY {cosine("c.embedding", "t.cent_vec")} DESC, t.cid DESC) AS rn
  FROM delta c CROSS JOIN cent t) WHERE rn = 1),
cells AS (
 SELECT cell,
  CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
  CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
 FROM (SELECT cell, 0 AS side FROM ab
       UNION ALL SELECT cell, 1 AS side FROM ad)
 GROUP BY cell),
tot AS (SELECT sum(n_base) AS t_base, sum(n_delta) AS t_delta FROM cells)
SELECT cell, n_base, n_delta,
 n_delta * t_base > 2 * n_base * t_delta AS drifted
FROM cells CROSS JOIN tot"""

    # ---- ann_pq_topk: PQ/ADC — codebook = 16 smallest signed
    # splitmix64(id) (same sample as IVF centroids); per subspace j of
    # 8 (8 dims each) the code minimizes squared L2 (double, ascending
    # dims, ties/NaN -> smallest index); ADC = dot(query,
    # reconstructed) ascending over the full 64 dims, identical to
    # HashOps.pqAdc's j-then-i accumulation ----
    sq_l2 = ("list_sum(list_transform(range(j*8+1, j*8+9), "
             "i -> (CAST(c.embedding[i] AS DOUBLE) - CAST(k.embedding[i] AS DOUBLE))"
             " * (CAST(c.embedding[i] AS DOUBLE) - CAST(k.embedding[i] AS DOUBLE))))")
    o["ann_pq_topk"] = f"""
WITH book AS (
 SELECT row_number() OVER (ORDER BY
   {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id) - 1 AS b, embedding
 FROM embeddings
 ORDER BY {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id LIMIT 16),
codes AS (
 SELECT vec_id, j, b FROM (
  SELECT c.vec_id, g.j, k.b,
   row_number() OVER (PARTITION BY c.vec_id, g.j
     ORDER BY {sq_l2}, k.b) AS rn
  FROM embeddings c CROSS JOIN range(0, 8) g(j) CROSS JOIN book k)
 WHERE rn = 1),
recon AS (
 SELECT c.vec_id,
  flatten(list(k.embedding[c.j*8+1:c.j*8+8] ORDER BY c.j)) AS rvec
 FROM codes c JOIN book k USING (b) GROUP BY c.vec_id)
SELECT q_id, vec_id, adc, rnk FROM (
 SELECT q_id, vec_id, adc,
  row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rnk
 FROM (
  SELECT q.vec_id AS q_id, r.vec_id, {dot_d("q.embedding", "r.rvec")} AS adc
  FROM (SELECT * FROM embeddings WHERE vec_id < 5) q CROSS JOIN recon r
  WHERE r.vec_id != q.vec_id))
WHERE rnk <= 10"""

    # ---- ann_pq_delta: incremental PQ (r14) — codebook pinned on the
    # BASE slice, both sides' subspace codewords computed under it,
    # drift report per (subspace, codeword) with the exact integer
    # cross-product flag (totals count nibbles = m x vectors; the
    # common factor m cancels in the inequality, so the flag equals
    # the per-vector-share test) ----
    o["ann_pq_delta"] = f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 < 8),
delta AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 >= 8),
book AS (
 SELECT row_number() OVER (ORDER BY
   {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id) - 1 AS b, embedding
 FROM base
 ORDER BY {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id LIMIT 16),
cbase AS (
 SELECT vec_id, j, b FROM (
  SELECT c.vec_id, g.j, k.b,
   row_number() OVER (PARTITION BY c.vec_id, g.j
     ORDER BY {sq_l2}, k.b) AS rn
  FROM base c CROSS JOIN range(0, 8) g(j) CROSS JOIN book k)
 WHERE rn = 1),
cdelta AS (
 SELECT vec_id, j, b FROM (
  SELECT c.vec_id, g.j, k.b,
   row_number() OVER (PARTITION BY c.vec_id, g.j
     ORDER BY {sq_l2}, k.b) AS rn
  FROM delta c CROSS JOIN range(0, 8) g(j) CROSS JOIN book k)
 WHERE rn = 1),
cells AS (
 SELECT sub, cb,
  CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
  CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
 FROM (SELECT j AS sub, b AS cb, 0 AS side FROM cbase
       UNION ALL SELECT j AS sub, b AS cb, 1 AS side FROM cdelta)
 GROUP BY sub, cb),
tot AS (SELECT sum(n_base) AS t_base, sum(n_delta) AS t_delta FROM cells)
SELECT sub, cb, n_base, n_delta,
 n_delta * t_base > 2 * n_base * t_delta AS drifted
FROM cells CROSS JOIN tot"""

    # ---- ann_refine_topk: the same PQ pipeline shortlists 50 by
    # ADC, then exact double cosine re-ranks to top-10 ----
    o["ann_refine_topk"] = f"""
WITH book AS (
 SELECT row_number() OVER (ORDER BY
   {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id) - 1 AS b, embedding
 FROM embeddings
 ORDER BY {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id LIMIT 16),
codes AS (
 SELECT vec_id, j, b FROM (
  SELECT c.vec_id, g.j, k.b,
   row_number() OVER (PARTITION BY c.vec_id, g.j
     ORDER BY {sq_l2}, k.b) AS rn
  FROM embeddings c CROSS JOIN range(0, 8) g(j) CROSS JOIN book k)
 WHERE rn = 1),
recon AS (
 SELECT c.vec_id,
  flatten(list(k.embedding[c.j*8+1:c.j*8+8] ORDER BY c.j)) AS rvec
 FROM codes c JOIN book k USING (b) GROUP BY c.vec_id),
cand AS (
 SELECT q_id, vec_id FROM (
  SELECT q_id, vec_id,
   row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rnk
  FROM (
   SELECT q.vec_id AS q_id, r.vec_id, {dot_d("q.embedding", "r.rvec")} AS adc
   FROM (SELECT * FROM embeddings WHERE vec_id < 5) q CROSS JOIN recon r
   WHERE r.vec_id != q.vec_id))
 WHERE rnk <= 50)
SELECT q_id, vec_id, cos, rnk FROM (
 SELECT c.q_id, c.vec_id,
  {cosine("qe.embedding", "ce.embedding")} AS cos,
  row_number() OVER (PARTITION BY c.q_id
    ORDER BY {cosine("qe.embedding", "ce.embedding")} DESC, c.vec_id) AS rnk
 FROM cand c
 JOIN embeddings ce ON ce.vec_id = c.vec_id
 JOIN embeddings qe ON qe.vec_id = c.q_id)
WHERE rnk <= 10"""

    # ---- ann_refine_delta: refine served from the MAINTAINED code
    # frame (r14) — same pipeline as ann_refine_topk but the codebook
    # is pinned on the BASE slice and the codes cover base ∪ delta
    # under it (== pqDeltaIngest's maintained frame) ----
    o["ann_refine_delta"] = f"""
WITH bse AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 < 8),
book AS (
 SELECT row_number() OVER (ORDER BY
   {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id) - 1 AS b, embedding
 FROM bse
 ORDER BY {to_signed(splitmix("CAST(vec_id AS HUGEINT)"))}, vec_id LIMIT 16),
codes AS (
 SELECT vec_id, j, b FROM (
  SELECT c.vec_id, g.j, k.b,
   row_number() OVER (PARTITION BY c.vec_id, g.j
     ORDER BY {sq_l2}, k.b) AS rn
  FROM embeddings c CROSS JOIN range(0, 8) g(j) CROSS JOIN book k)
 WHERE rn = 1),
recon AS (
 SELECT c.vec_id,
  flatten(list(k.embedding[c.j*8+1:c.j*8+8] ORDER BY c.j)) AS rvec
 FROM codes c JOIN book k USING (b) GROUP BY c.vec_id),
cand AS (
 SELECT q_id, vec_id FROM (
  SELECT q_id, vec_id,
   row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rnk
  FROM (
   SELECT q.vec_id AS q_id, r.vec_id, {dot_d("q.embedding", "r.rvec")} AS adc
   FROM (SELECT * FROM embeddings WHERE vec_id < 5) q CROSS JOIN recon r
   WHERE r.vec_id != q.vec_id))
 WHERE rnk <= 50)
SELECT q_id, vec_id, cos, rnk FROM (
 SELECT c.q_id, c.vec_id,
  {cosine("qe.embedding", "ce.embedding")} AS cos,
  row_number() OVER (PARTITION BY c.q_id
    ORDER BY {cosine("qe.embedding", "ce.embedding")} DESC, c.vec_id) AS rnk
 FROM cand c
 JOIN embeddings ce ON ce.vec_id = c.vec_id
 JOIN embeddings qe ON qe.vec_id = c.q_id)
WHERE rnk <= 10"""

    # ---- q_hll_distinct: HyperLogLog as a two-level aggregation —
    # register contribution 2^(44-rho) via the low-bit isolate
    # hu ^ (hu & (hu-1)); denominator an exact <= 2^53 integer ----
    hll_h = splitmix("CAST(user_id AS HUGEINT)")
    o["q_hll_distinct"] = f"""
WITH h AS (SELECT event_type AS key, {hll_h} AS hu FROM events),
r AS (
 SELECT key, hu // {2**55} AS idx,
  CASE WHEN hu = 0 THEN 1
       ELSE greatest({2**43} // xor(hu, hu & (hu - 1)), 1) END AS c
 FROM h),
regs AS (SELECT key, idx, min(c) AS mc FROM r GROUP BY key, idx),
a AS (
 SELECT key, CAST(count(*) AS BIGINT) AS n_nonzero,
  CAST(sum(mc) + (512 - count(*)) * {2**44} AS BIGINT) AS denominator
 FROM regs GROUP BY key)
SELECT key, n_nonzero, denominator,
 0.7197831133217303 * (4.611686018427388e18 / CAST(denominator AS DOUBLE))
   AS raw_est
FROM a"""

    # ---- q_hll_union: the Spark side computes per-cohort register
    # frames (event_id parity split) and min-merges them; merged
    # registers over a PARTITION of the stream equal the whole-stream
    # registers exactly, so the oracle is the direct computation —
    # the equality IS the mergeability proof ----
    o["q_hll_union"] = o["q_hll_distinct"]

    # ---- q_checksum: order-independent table fingerprint — XOR of
    # splitmix64(fnv1a(text) ^ doc_id) per source, with rollup total ----
    hck = splitmix(f"xor({fnv_text('text')}, CAST(doc_id AS HUGEINT))")
    o["q_checksum"] = f"""
SELECT grp, CAST(count(*) AS BIGINT) AS n_rows, bit_xor(hb) AS xor_hash
FROM (SELECT source AS grp, {to_signed(hck)} AS hb FROM documents)
GROUP BY ROLLUP(grp)"""

    return o


def emit_scala(path: str):
    """Write the generated oracles as a Scala Map source file."""
    o = build()
    entries = []
    for name in sorted(o):
        sql = o[name].strip()
        assert '"""' not in sql
        # JVM class-file string constants cap at 64 KiB of modified
        # UTF-8 — split long SQL into concatenated triple-quote chunks
        # (constant-folded at most into a StringBuilder chain, still a
        # plain String value)
        if len(sql) > 60000:
            # Seq(...).mkString, NOT literal +: scalac constant-folds
            # adjacent literal concatenation back into one oversized
            # constant
            chunks = [sql[i:i + 60000] for i in range(0, len(sql), 60000)]
            lit = ",\n      ".join(f'"""{c}"""' for c in chunks)
            entries.append(f'    "{name}" ->\n      Seq({lit}).mkString,')
        else:
            entries.append(f'    "{name}" ->\n      """{sql}""",')
    body = "\n".join(entries).rstrip(",")
    src = f"""package graft

/** GENERATED by scripts/gen_oracles.py — DO NOT EDIT BY HAND.
  *
  * DuckDB oracle SQL for the hash-kernel queries: brute-force,
  * engine-independent re-computations of the LSH / ANN / fingerprint
  * results. The 64-bit integer kernels (FNV-1a, SplitMix64, SimHash,
  * Rabin-Karp winnowing) are replicated in HUGEINT mod-2^64
  * arithmetic; doubles use the same ascending-index accumulation as
  * graft.functions.HashOps, so every value is bit-exact across
  * engines. Regenerate + re-verify with:
  *   python3 scripts/gen_oracles.py <sfDir> <verifyOut>
  *   python3 scripts/gen_oracles.py --emit
  */
object OracleSqlGen {{
  val sql: Map[String, String] = Map(
{body})
}}
"""
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path} ({len(o)} oracles)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--emit":
        emit_scala(sys.argv[2] if len(sys.argv) > 2
                   else "src/main/scala/graft/OracleSqlGen.scala")
        sys.exit(0)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = build()
    fails = 0
    import time
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: SQL error: {str(e).splitlines()[0][:200]}")
            fails += 1
            continue
        dt = time.time() - t0
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"SKIP {name}: no Spark dump at {d}")
            continue
        got = norm(pd.read_parquet(d))
        if got.equals(want):
            print(f"  ok {name}: {len(got)} rows ({dt:.1f}s oracle)")
        else:
            fails += 1
            print(f"FAIL {name}: shape {got.shape} vs {want.shape} ({dt:.1f}s)")
            if got.shape == want.shape and list(got.columns) == list(want.columns):
                diff = got.compare(want)
                print(diff.head(5))
            else:
                print("  got cols:", list(got.columns), "want cols:", list(want.columns))
                print("  got:", got.head(2).to_dict("records"))
                print("  want:", want.head(2).to_dict("records"))
    print("FAILURES:", fails)
