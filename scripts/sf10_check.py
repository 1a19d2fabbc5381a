#!/usr/bin/env python3
"""sf10 (100x the gate SF) targeted correctness sweep: the
bench-headline heavies + the recall-sensitive LSH family. Dev-only;
NOT part of the library.

At sf10 the corpus is sf0.1 replicated ~100x with identical texts, so
the near-dup family's bucket caps (minhashLsh maxBucket=64,
semanticNearDupPairs maxCell=4096) legitimately drop every bucket —
the exact result is EMPTY, and that is verified exactly (full sig +
bucket-size replication, not an assumption). The pair kernels whose
DuckDB replicas explode at this scale (the first attempt filled 75 GB
of spill before dying) are replicated in numpy instead, bit-exactly:

- "full"            : standard DuckDB oracle over the full sf10 tables
- "python_exact"    : numpy/python third-engine replication of the
                      deterministic kernels (minhash sigs + banded
                      buckets + caps, simhash bit votes, splitmix
                      phash + planted flips, integer PageRank,
                      bounded Levenshtein over sampled clean keys)

Usage: python3 scripts/sf10_check.py [sf10_dir] [verify_out] [json_out]
"""
import json
import os
import sys
import time
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_frags import norm

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-sf10"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf10"
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/CORRECTNESS_sf10.json"
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None


def selected(name):
    return ONLY is None or name in ONLY

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

M64 = (1 << 64) - 1
U64 = np.uint64
FNV_OFFSET = 0xcbf29ce484222325
FNV_PRIME = 0x100000001b3


def fnv1a(data: bytes) -> int:
    h = FNV_OFFSET
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & M64
    return h


def splitmix64(seed: int) -> int:
    z = (seed + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return (z ^ (z >> 31)) & M64


def signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def load_dump(name):
    return pd.read_parquet(os.path.join(OUT_DIR, name))


res = {}


def compare(name, got_df, want_df, method, note=""):
    got, want = norm(got_df), norm(want_df)
    if list(got.columns) != list(want.columns):
        res[name] = {"ok": False, "method": method,
                     "detail": f"columns {list(got.columns)} vs {list(want.columns)}"}
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}",
              flush=True)
        return
    if len(got) == 0 and len(want) == 0:
        # empty == empty: a DataFrame built from an empty row list has
        # object dtypes, which pandas .equals treats as != the dump's
        # typed empty frame — columns already matched above
        res[name] = {"ok": True, "rows": 0, "method": method}
        if note:
            res[name]["note"] = note
        print(f"  ok {name}: 0 rows (exact empty) [{method}] {note}", flush=True)
    elif got.equals(want):
        res[name] = {"ok": True, "rows": len(got), "method": method}
        if note:
            res[name]["note"] = note
        print(f"  ok {name}: {len(got)} rows [{method}] {note}", flush=True)
    else:
        res[name] = {"ok": False, "method": method,
                     "detail": f"shape {got.shape} vs {want.shape}"}
        print(f"FAIL {name}: shape {got.shape} vs {want.shape}", flush=True)
        if got.shape == want.shape:
            d = got.compare(want)
            if len(d):
                print(d.head(5), flush=True)
    # incremental artifact: a wall-clock kill loses at most one check
    json.dump({"partial": True, "queries": dict(sorted(res.items()))},
              open(JSON_OUT + ".partial", "w"), indent=1)


con = duckdb.connect()
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

# ------------------------------------------------------------ corpus
# texts with the planted near-dup rows every dd_* query unions in
docs = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").df()
doc_ids = docs["doc_id"].to_numpy()
texts = list(docs["text"])
all_rows = [(int(i), t) for i, t in zip(doc_ids, texts)]
all_rows += [(int(i) + 1000000, t + " near duplicate suffix")
             for i, t in zip(doc_ids, texts) if int(i) % 50 == 0]

# popcount LUT for 16-bit halves
_POP16 = np.array([bin(x).count("1") for x in range(1 << 16)], dtype=np.int64)


def popcount64(a):
    a = a.astype(np.uint64)
    r = _POP16[(a & U64(0xFFFF)).astype(np.int64)]
    r += _POP16[((a >> U64(16)) & U64(0xFFFF)).astype(np.int64)]
    r += _POP16[((a >> U64(32)) & U64(0xFFFF)).astype(np.int64)]
    r += _POP16[((a >> U64(48)) & U64(0xFFFF)).astype(np.int64)]
    return r


def gram_hashes(text: str, k: int) -> np.ndarray:
    """FNV-1a over every k-byte window (whole text if shorter),
    vectorized: 2k numpy ops per doc instead of len·k python ops."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(U64)
    n = len(b)
    if n < k:
        return np.array([fnv1a(text.encode("utf-8"))], dtype=U64)
    g = n - k + 1
    with np.errstate(over="ignore"):
        h = np.full(g, FNV_OFFSET, dtype=U64)
        for t in range(k):
            h = (h ^ b[t:t + g]) * U64(FNV_PRIME)
    return h


def check_minhash_and_components():
    """Full python replica of the r10 COLLAPSED minhashLsh (shingle 5,
    64 perms, 16 bands of 4, est >= 0.5, maxBucket 64): sigs + banding
    + cap over DISTINCT texts (class representatives), rep pairs
    expand back through class membership, text-equal pairs are est-1.0
    unconditionally. Pre-r10 every bucket on this replicated corpus
    exceeded the ID-level cap and the exact output was empty; the
    collapse is exactly what makes recall survive here."""
    t0 = time.time()
    pa = np.array([splitmix64(0x5eed0000 + i) | 1 for i in range(64)], dtype=U64)
    pb = np.array([splitmix64(0xbeef0000 + i) for i in range(64)], dtype=U64)
    sig_cache = {}
    text_ids = defaultdict(list)
    for i, t in all_rows:
        text_ids[t].append(i)
    for t in text_ids:
        text_ids[t].sort()
        hs = gram_hashes(t, 5)
        with np.errstate(over="ignore"):
            v = hs[:, None] * pa[None, :] + pb[None, :]
        sig_cache[t] = tuple(v.view(np.int64).min(axis=0))  # SIGNED min
    rep = {t: ids[0] for t, ids in text_ids.items()}
    # rep-level band buckets keyed by the raw 4-perm slice
    buckets = defaultdict(list)   # (band, slice) -> [text, ...]
    for t, sig in sig_cache.items():
        for band in range(16):
            buckets[(band, sig[band * 4:(band + 1) * 4])].append(t)
    rep_pairs = {}  # (text_a, text_b) ordered by rep id -> est
    capped = 0
    for members in buckets.values():
        if len(members) < 2:
            continue
        if len(members) > 64:
            capped += 1
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                ta, tb = members[x], members[y]
                if rep[ta] > rep[tb]:
                    ta, tb = tb, ta
                sa, sb = sig_cache[ta], sig_cache[tb]
                eq = sum(1 for k in range(64) if sa[k] == sb[k])
                est = eq / 64.0
                if est >= 0.5:
                    key = (ta, tb)
                    if key not in rep_pairs or est > rep_pairs[key]:
                        rep_pairs[key] = est
    # expansion: cross-class member pairs + within-class est-1.0 pairs
    frames = []
    for (ta, tb), est in rep_pairs.items():
        ia = np.array(text_ids[ta], dtype=np.int64)
        ib = np.array(text_ids[tb], dtype=np.int64)
        A = np.repeat(ia, len(ib))
        B = np.tile(ib, len(ia))
        lo, hi = np.minimum(A, B), np.maximum(A, B)
        frames.append(np.stack(
            [lo.astype(np.float64), hi.astype(np.float64),
             np.full(len(lo), est)], axis=1))
    for t, ids in text_ids.items():
        if len(ids) >= 2:
            arr = np.array(ids, dtype=np.int64)
            iu, ju = np.triu_indices(len(arr), k=1)
            frames.append(np.stack(
                [arr[iu].astype(np.float64), arr[ju].astype(np.float64),
                 np.ones(len(iu))], axis=1))
    if frames:
        allp = np.concatenate(frames)
        want = pd.DataFrame(
            {"id_a": allp[:, 0].astype(np.int64),
             "id_b": allp[:, 1].astype(np.int64),
             "jaccard_est": allp[:, 2]})
    else:
        want = pd.DataFrame(columns=["id_a", "id_b", "jaccard_est"])
    if selected("dd_minhash_lsh"):
        compare("dd_minhash_lsh", load_dump("dd_minhash_lsh"), want,
                "python_exact",
                note=f"{len(sig_cache)} distinct-text sigs (collapse pre-pass), "
                     f"{capped} rep buckets over the 64 cap, {len(rep_pairs)} "
                     f"rep pairs -> {len(want)} expanded, {time.time()-t0:.0f}s")
    # dd_minhash_classes: the compressed rep-pair form with class sizes
    want_k = pd.DataFrame(
        [(rep[ta], rep[tb], est, len(text_ids[ta]), len(text_ids[tb]))
         for (ta, tb), est in rep_pairs.items()],
        columns=["id_a", "id_b", "jaccard_est", "n_a", "n_b"])
    if selected("dd_minhash_classes"):
        compare("dd_minhash_classes", load_dump("dd_minhash_classes"), want_k,
                "python_exact",
                note=f"{len(want_k)} rep pairs with class sizes")
    # dd_ngram_jaccard (r10): its candidate tier IS this minhash pass
    # (shingle 5, est >= 0.5, same collapse), so verify the exact
    # 5-gram Jaccard once per rep pair and expand — text-equal pairs
    # are Jaccard exactly 1
    if selected("dd_ngram_jaccard"):
        t0 = time.time()

        def grams(t):
            return (frozenset(t[k:k + 5] for k in range(len(t) - 4))
                    if len(t) >= 5 else frozenset([t]))
        frames_j = []
        n_rep = 0
        for (ta, tb), est in rep_pairs.items():
            ga, gb = grams(ta), grams(tb)
            j = len(ga & gb) / len(ga | gb)
            if j >= 0.7:
                n_rep += 1
                ia = np.array(text_ids[ta], dtype=np.int64)
                ib = np.array(text_ids[tb], dtype=np.int64)
                A = np.repeat(ia, len(ib))
                B = np.tile(ib, len(ia))
                lo, hi = np.minimum(A, B), np.maximum(A, B)
                frames_j.append(np.stack(
                    [lo.astype(np.float64), hi.astype(np.float64),
                     np.full(len(lo), j)], axis=1))
        for t, ids in text_ids.items():
            if len(ids) >= 2:
                arr = np.array(ids, dtype=np.int64)
                iu, ju = np.triu_indices(len(arr), k=1)
                frames_j.append(np.stack(
                    [arr[iu].astype(np.float64), arr[ju].astype(np.float64),
                     np.ones(len(iu))], axis=1))
        if frames_j:
            allj = np.concatenate(frames_j)
            want_j = pd.DataFrame(
                {"id_a": allj[:, 0].astype(np.int64),
                 "id_b": allj[:, 1].astype(np.int64),
                 "jaccard": allj[:, 2]})
        else:
            want_j = pd.DataFrame(columns=["id_a", "id_b", "jaccard"])
        compare("dd_ngram_jaccard", load_dump("dd_ngram_jaccard"), want_j,
                "python_exact",
                note=f"exact Jaccard over {n_rep} verified rep pairs + "
                     f"class expansion -> {len(want_j)} rows, "
                     f"{time.time()-t0:.0f}s")

    # ---- r10 advice: INDEPENDENT textbook spot-check ----
    # The python replicas above mirror the implementation's own
    # collapse/rep-expansion algorithm, so a shared algorithmic error
    # would pass both engines. Independent arm: two texts share a band
    # bucket iff their sig SLICES are equal — bucket capping is the
    # only cross-text interaction in the whole operator. Restricting
    # to ids of texts NONE of whose band buckets exceed the cap, the
    # implementation's semantics provably reduce to TEXTBOOK per-ID
    # LSH: pair iff est >= 0.5 and some band slice matches (equal
    # texts match all bands at est 1.0). Recompute that from per-ID
    # signatures with no collapse, no caps and no expansion machinery,
    # and require bit-equality with the Spark dump restricted to the
    # sampled ids.
    if selected("dd_minhash_lsh") or selected("dd_ngram_jaccard"):
        t0 = time.time()
        overcap = set()
        for members in buckets.values():
            if len(members) > 64:
                overcap.update(members)
        id2text = dict(all_rows)
        safe = sorted(i for i, t in all_rows if t not in overcap)
        step = max(1, len(safe) // 800)
        sub = safe[::step][:800]
        S = set(sub)
        sig_m = np.array([sig_cache[id2text[i]] for i in sub], dtype=np.int64)
        n_sub = len(sub)
        pairs_tb = []
        for x in range(n_sub):
            eq = (sig_m[x + 1:] == sig_m[x][None, :])
            est = eq.sum(axis=1) / 64.0
            band_hit = eq.reshape(-1, 16, 4).all(axis=2).any(axis=1)
            for off in np.nonzero((est >= 0.5) & band_hit)[0]:
                a, b = sub[x], sub[x + 1 + int(off)]
                pairs_tb.append((min(a, b), max(a, b), float(est[off])))
        want_tb = (pd.DataFrame(pairs_tb,
                                columns=["id_a", "id_b", "jaccard_est"])
                   if pairs_tb else
                   pd.DataFrame(columns=["id_a", "id_b", "jaccard_est"]))
        if selected("dd_minhash_lsh"):
            dump = load_dump("dd_minhash_lsh")
            got_tb = dump[dump["id_a"].isin(S) & dump["id_b"].isin(S)]
            compare("dd_minhash_lsh_textbook_sub", got_tb, want_tb,
                    "python_textbook",
                    note=f"{n_sub} sampled ids of cap-free texts, "
                         f"{len(want_tb)} textbook pairs, no collapse/"
                         f"expansion machinery, {time.time()-t0:.0f}s")
        if selected("dd_ngram_jaccard"):
            def grams5(t):
                return (frozenset(t[k:k + 5] for k in range(len(t) - 4))
                        if len(t) >= 5 else frozenset([t]))
            rows_j = []
            for a, b, est in pairs_tb:
                ga, gb = grams5(id2text[a]), grams5(id2text[b])
                j = len(ga & gb) / len(ga | gb)
                if j >= 0.7:
                    rows_j.append((a, b, j))
            want_jtb = (pd.DataFrame(rows_j,
                                     columns=["id_a", "id_b", "jaccard"])
                        if rows_j else
                        pd.DataFrame(columns=["id_a", "id_b", "jaccard"]))
            dumpj = load_dump("dd_ngram_jaccard")
            got_jtb = dumpj[dumpj["id_a"].isin(S) & dumpj["id_b"].isin(S)]
            compare("dd_ngram_jaccard_textbook_sub", got_jtb, want_jtb,
                    "python_textbook",
                    note="exact 5-gram Jaccard over the textbook pair "
                         "set, no shared machinery")

    # components: union-find over the REP graph, members inherit —
    # equal to the closure of the expanded graph (reps are class
    # minima; within-class edges interconnect every member)
    t0 = time.time()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ta, tb in rep_pairs:
        a, b = rep[ta], rep[tb]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows_c = []
    for t, ids in text_ids.items():
        r = rep[t]
        if len(ids) >= 2 or r in parent:
            c = find(r) if r in parent else r
            rows_c.extend((i, c) for i in ids)
    want_c = pd.DataFrame(sorted(rows_c), columns=["doc_id", "comp"])
    if selected("dd_components"):
        compare("dd_components", load_dump("dd_components"), want_c,
                "python_exact",
                note=f"union-find over {len(rep_pairs)} rep pairs + membership "
                     f"expansion -> {len(want_c)} rows, {time.time()-t0:.0f}s")
    # the incremental base+delta maintenance must land on the IDENTICAL
    # frame (edge-set union is what connectivity depends on)
    if selected("dd_components_delta"):
        compare("dd_components_delta", load_dump("dd_components_delta"),
                want_c, "python_exact",
                note=f"same union-find referee as dd_components over "
                     f"{len(rep_pairs)} rep pairs")


def banded_hamming_pairs(sig_of_id, max_ham=3, max_bucket=256):
    """hammingPairs replica with the r10 sig-level collapse: identical
    sigs collapse to their min-id rep, 4x16-bit piece buckets + the
    [2, max_bucket] cap over DISTINCT sigs, numpy popcount pair kernel
    per bucket, min-hamming dedup across pieces, then expansion through
    sig-class membership plus within-class Hamming-0 pairs."""
    sig_ids = defaultdict(list)
    for i, s in sig_of_id.items():
        sig_ids[s].append(i)
    for s in sig_ids:
        sig_ids[s].sort()
    buckets = defaultdict(list)
    for s in sig_ids:
        for piece in range(4):
            buckets[(piece, (s >> (piece * 16)) & 0xFFFF)].append(s)
    rep_pairs = {}  # (sig_a, sig_b) ordered by rep id -> min hamming
    capped = 0
    for members in buckets.values():
        n = len(members)
        if n < 2:
            continue
        if n > max_bucket:
            capped += 1
            continue
        sigs = np.array(members, dtype=U64)
        iu, ju = np.triu_indices(n, k=1)
        ham = popcount64(sigs[iu] ^ sigs[ju])
        keep = ham <= max_ham
        for x, y, h in zip(iu[keep], ju[keep], ham[keep]):
            sa, sb = members[int(x)], members[int(y)]
            if sig_ids[sa][0] > sig_ids[sb][0]:
                sa, sb = sb, sa
            key = (sa, sb)
            if key not in rep_pairs or h < rep_pairs[key]:
                rep_pairs[key] = int(h)
    frames = []
    for (sa, sb), h in rep_pairs.items():
        ia = np.array(sig_ids[sa], dtype=np.int64)
        ib = np.array(sig_ids[sb], dtype=np.int64)
        A = np.repeat(ia, len(ib))
        B = np.tile(ib, len(ia))
        lo, hi = np.minimum(A, B), np.maximum(A, B)
        frames.append(np.stack([lo, hi, np.full(len(lo), h, dtype=np.int64)],
                               axis=1))
    for s, ids in sig_ids.items():
        if len(ids) >= 2:
            arr = np.array(ids, dtype=np.int64)
            iu, ju = np.triu_indices(len(arr), k=1)
            frames.append(np.stack(
                [arr[iu], arr[ju], np.zeros(len(iu), dtype=np.int64)], axis=1))
    if not frames:
        return pd.DataFrame(columns=["id_a", "id_b", "hamming"]), capped
    allp = np.concatenate(frames)
    df = pd.DataFrame(allp, columns=["id_a", "id_b", "hamming"])
    df = df.groupby(["id_a", "id_b"], as_index=False)["hamming"].min()
    return df, capped


def check_simhash():
    t0 = time.time()
    sig_text = {}
    for t in {t for _, t in all_rows}:
        votes = np.zeros(64, dtype=np.int64)
        for w in t.split():
            h = np.uint64(fnv1a(w.encode("utf-8")))
            bits = (h >> np.arange(64, dtype=U64)) & U64(1)
            votes += np.where(bits.astype(bool), 1, -1)
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= (1 << b)
        sig_text[t] = sig
    sig_of_id = {i: sig_text[t] for i, t in all_rows}
    want, capped = banded_hamming_pairs(sig_of_id)
    compare("dd_simhash", load_dump("dd_simhash"), want, "python_exact",
            note=f"{len(sig_text)} distinct-text sigs, {capped} capped "
                 f"buckets, {time.time()-t0:.0f}s")


def check_phash():
    t0 = time.time()
    text_sig = {}
    for t in set(texts):
        text_sig[t] = splitmix64(fnv1a(t.encode("utf-8")))
    sig_of_id = {int(i): text_sig[t] for i, t in zip(doc_ids, texts)}
    for i in doc_ids:
        i = int(i)
        if i % 50 == 0:
            sig_of_id[i + 1000000] = sig_of_id[i] ^ (1 << (i % 64))
    want, capped = banded_hamming_pairs(sig_of_id)
    compare("mm_phash_dedup", load_dump("mm_phash_dedup"), want,
            "python_exact",
            note=f"{len(sig_of_id)} signatures, {capped} capped buckets, "
                 f"{time.time()-t0:.0f}s")


def check_pagerank():
    """Integer-exact PageRank replica: same edge build (orders x
    lineitem, both directions, distinct), same scaled-integer
    arithmetic (floor div, damping 17/20), 3 rounds."""
    t0 = time.time()
    ol = con.sql("""
        SELECT CAST(o.o_custkey * 2 AS BIGINT) AS src,
               CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey""").df()
    src = ol["src"].to_numpy()
    dst = ol["dst"].to_numpy()
    e = np.unique(np.concatenate([
        (src.astype(np.int64) << 32) | dst.astype(np.int64),
        (dst.astype(np.int64) << 32) | src.astype(np.int64)]))
    es = (e >> 32).astype(np.int64)
    ed = (e & 0xFFFFFFFF).astype(np.int64)
    nodes = np.unique(np.concatenate([es, ed]))
    idx = {int(n): k for k, n in enumerate(nodes)}
    si = np.array([idx[int(x)] for x in es], dtype=np.int64)
    di = np.array([idx[int(x)] for x in ed], dtype=np.int64)
    n = len(nodes)
    scale = 1000000000000
    base = (scale * 3 // 20) // n
    deg = np.bincount(si, minlength=n).astype(np.int64)
    rank = np.full(n, scale // n, dtype=np.int64)
    for _ in range(3):
        contrib = rank[si] // np.maximum(deg[si], 1)
        in_mass = np.zeros(n, dtype=np.int64)
        np.add.at(in_mass, di, contrib)
        rank = base + (in_mass * 17) // 20
    want = pd.DataFrame({"node": nodes, "rank": rank})
    compare("q_pagerank", load_dump("q_pagerank"), want, "python_exact",
            note=f"{len(e)} distinct directed edges, {n} nodes, 3 integer "
                 f"rounds, {time.time()-t0:.0f}s")


def lev_leq(a, b, tau):
    la, lb = len(a), len(b)
    if abs(la - lb) > tau:
        return None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [tau + 1] * lb
        lo = max(1, i - tau)
        hi = min(lb, i + tau)
        if lo > 1:
            cur[lo - 1] = tau + 1
        best = tau + 1
        for j in range(lo, hi + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
            best = min(best, cur[j])
        if best > tau:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= tau else None


def check_fuzzy2():
    # identical to the sf1 method; the clean-key sample modulus scales
    # with the part count so the brute force stays ~500 keys
    t0 = time.time()
    parts = con.sql("SELECT p_partkey, lower(p_name) AS n FROM part").df()
    pk = parts["p_partkey"].to_numpy()
    names = list(parts["n"])
    clean = {int(k): n for k, n in zip(pk, names) if k % 4 == 0}
    dirty = {}
    for k, n in zip(pk, names):
        k = int(k)
        dirty[k + 1000000] = (n[:3] + n[4:7] + n[8:]) if k % 2 == 0 else n
    mod = 400 * max(1, len(clean) // 50000)
    SAMPLE = sorted(k for k in clean if k % mod == 0)
    alpha = sorted({c for n in names for c in n})
    aidx = {c: i for i, c in enumerate(alpha)}
    dkeys = np.array(sorted(dirty), dtype=np.int64)
    dmat = np.zeros((len(dkeys), len(alpha)), dtype=np.int16)
    dlen = np.zeros(len(dkeys), dtype=np.int32)
    for r, k in enumerate(dkeys):
        s = dirty[int(k)]
        dlen[r] = len(s)
        for ch in s:
            dmat[r, aidx[ch]] += 1
    rows = []
    for ka in SAMPLE:
        na = clean[ka]
        va = np.zeros(len(alpha), dtype=np.int16)
        for ch in na:
            va[aidx[ch]] += 1
        mask = (np.abs(dlen - len(na)) <= 2) & \
               (np.abs(dmat - va).sum(axis=1) <= 4)
        matches = []
        for r in np.nonzero(mask)[0]:
            d = lev_leq(na, dirty[int(dkeys[r])], 2)
            if d is not None:
                matches.append((int(dkeys[r]), d))
        if matches:
            best = min(d for _, d in matches)
            best_match = min(kb for kb, d in matches if d == best)
            rows.append((ka, len(matches), best, best_match))
    want = pd.DataFrame(rows, columns=["id_a", "n_match", "best_dist", "best_match"])
    got = load_dump("q_fuzzy_join2")
    got = got[got["id_a"] % mod == 0]
    compare("q_fuzzy_join2", got, want, "python_exact",
            note=f"{len(SAMPLE)} sampled clean keys (mod {mod}) vs ALL "
                 f"{len(dkeys)} dirty names, {time.time()-t0:.0f}s")


def check_full(name, views=None):
    t0 = time.time()
    want = con.sql(oracle[name]).df()
    compare(name, load_dump(name), want, "full",
            note=f"oracle {time.time()-t0:.0f}s")


def check_sampled(name):
    """Per-key-independent per-doc oracles (sf1_check's sampled_keys
    method at 100x): run the oracle over doc_id % 10 = 0 only and
    compare row-exactly against the dump restricted to those keys."""
    con_s = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            if t == "documents":
                con_s.sql(f"CREATE VIEW documents AS "
                          f"SELECT * FROM '{p}' WHERE doc_id % 10 = 0")
            else:
                con_s.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    t0 = time.time()
    want = con_s.sql(oracle[name]).df()
    got = load_dump(name)
    got = got[got["doc_id"] % 10 == 0]
    compare(name, got, want, "sampled_keys",
            note=f"doc_id % 10 = 0 sample, {len(want)} keys, "
                 f"oracle {time.time()-t0:.0f}s")


# fast first, the DuckDB long poles last
if selected("q_pagerank"):
    check_pagerank()
if selected("mm_phash_dedup"):
    check_phash()
if selected("dd_simhash"):
    check_simhash()
if (selected("dd_minhash_lsh") or selected("dd_components")
        or selected("dd_ngram_jaccard") or selected("dd_components_delta")):
    check_minhash_and_components()
if selected("q_fuzzy_join2"):
    check_fuzzy2()
if selected("dd_semantic"):
    check_full("dd_semantic")
if selected("curate_pipeline"):
    check_full("curate_pipeline")
# r10 additions: the compressed fuzzy form (distinct-string naive-join
# oracle — replication-invariant, cheap at any SF) and the batched BPE
# pair (vocab-sized replay, corpus size only enters the word-freq agg)
# ... plus a relational cross-section (agg / window / sessionize /
# salted+skew / rollup / HLL) whose DuckDB oracles stay tractable over
# the full 60M-row sf10 lineitem
for _name in ["q_fuzzy_classes", "txt_bpe_train", "ds_pack_bpe",
              "q_weighted_pct", "txt_boilerplate",
              "q_agg_pricing", "q_window_topk", "q_sessionize",
              "q_salted_agg", "q_hll_distinct", "q_rollup_agg",
              "q_skew_join"]:
    if selected(_name):
        check_full(_name)
# per-doc slow-tail ops at 100x via the sampled-key method
for _name in ["txt_char_stats", "txt_type_token"]:
    if selected(_name):
        check_sampled(_name)


def check_pairs_rep_level(name, sim_col, rep_sim, rep_where):
    """txt_cosine_pairs / txt_jaccard_pairs at 100x. The embedded
    brute-force oracles self-join RAW gram postings (df scales with
    replication — the 75 GB-spill shape), so this check brute-forces
    the rep level over DISTINCT texts instead (both measures are
    functions of the texts, so pairs(corpus) == expand(pairs(
    distinct)) is an identity, not an engine assumption; the rep
    kernel itself stays plan-independent — full shared-gram
    self-join, NO prefix filter) and expands to member pairs in SQL.
    The ~25M-row comparison runs entirely in DuckDB via EXCEPT ALL so
    pandas never materializes it. `rep_sim`/`rep_where` are the
    measure's emitted value and integer qualifying predicate over
    (c.c, sa.n, sb.n); within-class pairs are similarity exactly 1."""
    t0 = time.time()
    grams5 = ("list_distinct(list_transform(range(1, len(toks)-5+2), "
              "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"
              " || ' ' || toks[i+3] || ' ' || toks[i+4]))")
    toks_of = ("list_filter(regexp_split_to_array(text, "
               "'[ \\n\\t\\r]+'), t -> t != '')")
    con.sql(f"""
CREATE OR REPLACE VIEW cp_want AS
WITH dt0 AS (SELECT min(doc_id) AS rep, text FROM documents GROUP BY text),
dt AS (SELECT rep, text FROM
       (SELECT rep, text, {toks_of} AS toks FROM dt0) _q
       WHERE len(toks) >= 5),
mem AS (SELECT d.doc_id, dt.rep FROM documents d JOIN dt ON dt.text = d.text),
g AS (SELECT rep, unnest({grams5}) AS tok
      FROM (SELECT rep, {toks_of} AS toks FROM dt) _t),
sz AS (SELECT rep, count(*) AS n FROM g GROUP BY rep),
c AS (SELECT a.rep AS ra, b.rep AS rb, count(*) AS c
      FROM g a JOIN g b ON a.tok = b.tok AND a.rep < b.rep
      GROUP BY 1, 2),
rp AS (SELECT c.ra, c.rb, {rep_sim} AS sim
       FROM c JOIN sz sa ON sa.rep = c.ra JOIN sz sb ON sb.rep = c.rb
       WHERE {rep_where})
SELECT least(ma.doc_id, mb.doc_id) AS id_a,
       greatest(ma.doc_id, mb.doc_id) AS id_b, r.sim
FROM rp r JOIN mem ma ON ma.rep = r.ra JOIN mem mb ON mb.rep = r.rb
UNION ALL
SELECT ma.doc_id, mb.doc_id, 1.0
FROM mem ma JOIN mem mb ON ma.rep = mb.rep AND ma.doc_id < mb.doc_id""")
    con.sql(f"""CREATE OR REPLACE VIEW cp_got AS
SELECT id_a, id_b, {sim_col}
FROM read_parquet('{OUT_DIR}/{name}/*.parquet')""")
    n_want = con.sql("SELECT count(*) FROM cp_want").fetchone()[0]
    n_got = con.sql("SELECT count(*) FROM cp_got").fetchone()[0]
    d1 = con.sql(
        "SELECT count(*) FROM (SELECT * FROM cp_want EXCEPT ALL "
        "SELECT * FROM cp_got)").fetchone()[0]
    d2 = con.sql(
        "SELECT count(*) FROM (SELECT * FROM cp_got EXCEPT ALL "
        "SELECT * FROM cp_want)").fetchone()[0]
    ok = n_want == n_got and d1 == 0 and d2 == 0
    res[name] = {
        "ok": bool(ok), "rows": int(n_got), "method": "python_exact",
        "note": (f"rep-level brute force over distinct texts + SQL member "
                 f"expansion, EXCEPT-ALL compare in DuckDB "
                 f"(want {n_want}, got {n_got}, diffs {d1}/{d2}), "
                 f"{time.time()-t0:.0f}s")}
    print(f"  {'ok' if ok else 'FAIL'} {name}: {n_got} rows "
          f"[python_exact] want={n_want} diffs={d1}/{d2}", flush=True)
    json.dump({"partial": True, "queries": dict(sorted(res.items()))},
              open(JSON_OUT + ".partial", "w"), indent=1)


if selected("txt_cosine_pairs"):
    check_pairs_rep_level(
        "txt_cosine_pairs", "cosine",
        "CAST(c.c AS DOUBLE) / sqrt(CAST(sa.n * sb.n AS DOUBLE))",
        "c.c * c.c * 25 >= 9 * sa.n * sb.n")
if selected("txt_jaccard_pairs"):
    check_pairs_rep_level(
        "txt_jaccard_pairs", "jaccard",
        "CAST(c.c AS DOUBLE) / CAST(sa.n + sb.n - c.c AS DOUBLE)",
        "c.c * 4 >= sa.n + sb.n")
# the r12 funnel report and the component-keyed split: their embedded
# oracles collapse to distinct content FIRST, so they stay tractable
# at any replication factor
for _name in ["txt_cosine_stats", "ds_split_leakage_safe"]:
    if selected(_name):
        check_full(_name)
# r12 relational/graph additions whose full oracles stay tractable at
# 100x (group-agg / restricted join / 3 dense BF rounds / seat replay)
for _name in ["q_adaptive_join", "q_incremental_join", "q_sssp",
              "ds_alloc_budget",
              # basket self-join pair counts / per-user string_agg +
              # regex scan / bigram+unigram counts / stratum windows /
              # category aggs — all tractable at 100x
              "q_itemsets", "q_event_pattern", "q_event_pattern_timed",
              "txt_collocations", "ds_kfold", "q_target_encode",
              "q_seasonal"]:
    if selected(_name):
        check_full(_name)
# r13 additions whose full oracles stay tractable at 100x: Z-set
# retraction twins (filtered agg / restricted join), the window-CEP
# row surfaces (IGNORE-NULLS windows), and the IVF delta report
# (16-centroid cross join + cell counts)
for _name in ["q_incremental_agg_retract", "q_incremental_join_retract",
              "q_event_pattern_rows", "q_event_pattern_steps",
              "ann_ivf_delta", "ds_kfold2",
              "q_incremental_sum_retract", "ds_length_buckets2",
              "q_incremental_outer_retract", "q_incremental_full_retract"]:
    if selected(_name):
        check_full(_name)

# r14 additions whose full oracles stay tractable at 100x: the
# stateful IVM gates and the MV matrix (restricted join + group
# recomputes), the compiled/classed window CEP (chained windows over
# the event stream), and the PQ maintenance/serving paths
# (16-row codebook cross joins)
for _name in ["q_incremental_outer_state", "q_incremental_full_state",
              "q_incremental_apply", "q_event_pattern_compiled",
              "ann_pq_delta",
              "q_incremental_mv", "q_incremental_mv_outer",
              "q_incremental_mv_minmax", "q_event_pattern_classes",
              "ann_refine_delta", "ds_sample_delta",
              "q_incremental_scd2", "q_incremental_asof",
              "curate_delta"]:
    if selected(_name):
        check_full(_name)
# r15 additions whose full oracles stay tractable at 100x: the
# durable-state family (group/min-max recomputes from survivors, the
# SCD2 window over the corrected log, the one-shot quota)
for _name in ["q_incremental_durable", "q_incremental_durable_z",
              "q_scd2_durable", "ds_quota_durable"]:
    if selected(_name):
        check_full(_name)
# r16 additions, same family (router/atomic-bridge/serving land on
# the same survivor aggregates; recompute is the corrected-log SCD2)
for _name in ["q_durable_auto", "q_durable_atomic",
              "q_durable_serving", "q_durable_recompute",
              "q_durable_auto_batch", "q_durable_reshard",
              "q_scd2_retention", "q_scd2_serving"]:
    if selected(_name):
        check_full(_name)
# r17 additions, same family (snapshot/calibrated land on the same
# survivor aggregates, serving-delta/deploy-loop on the serving
# join, prune on the horizon-filtered corrected-log SCD2 window)
for _name in ["q_durable_snapshot", "q_durable_prune",
              "q_durable_serving_delta", "q_maintain_serve",
              "q_durable_calibrated", "q_durable_diff"]:
    if selected(_name):
        check_full(_name)
# txt_bpe_drift is NOT in this sweep: its oracle rides the full
# encode CTEs, which OOM DuckDB over the 500k-doc sf10 corpus (the
# same reason txt_bpe_encode itself is sf1-checked, not sf10) — the
# drift gate is full-checked at sf0.01 and sf1.

# cumulative artifact: a rerun of a subset merges over prior rows
if os.path.exists(JSON_OUT):
    try:
        prior = json.load(open(JSON_OUT)).get("queries", {})
        for k, v in prior.items():
            res.setdefault(k, v)
    except Exception:
        pass

n_fail = sum(1 for v in res.values() if not v.get("ok"))
methods = Counter(v.get("method") for v in res.values())
artifact = {
    "summary": {
        "sf": f"sf10 ({SF_DIR}: ~100x the sf0.01 gate; sf0.1 replicated, "
              "aligned key offsets, identical texts)",
        "queries": len(res),
        "failures": n_fail,
        "methods": dict(methods),
        "note": ("bench-headline heavies + recall-sensitive LSH family at "
                 "the top of the scaling curve. The near-dup bucket caps "
                 "legitimately empty minhash/components/semantic on this "
                 "replicated corpus — verified by full signature + "
                 "bucket-size replication, not assumed. DuckDB replicas "
                 "that explode at this scale (75 GB spill) are replaced "
                 "by bit-exact numpy third-engine replications."),
    },
    "queries": dict(sorted(res.items())),
}
json.dump(artifact, open(JSON_OUT, "w"), indent=1)
print(f"{JSON_OUT}: {len(res)} queries, {n_fail} failures, "
      f"methods={dict(methods)}", flush=True)
sys.exit(1 if n_fail else 0)
