#!/usr/bin/env python3
"""SQL fragment generators for the hash-kernel DuckDB oracles.

The Scala kernels (graft.functions.HashOps) are deterministic 64-bit
integer / IEEE-double math; these fragments replicate them in DuckDB
SQL using HUGEINT mod-2^64 arithmetic so the driver's oracle can
brute-force-check the LSH/ANN/fingerprint queries bit-exactly.
`scripts/gen_oracles.py` uses them to emit the final SQL embedded in
SparkEntry.oracleSql. Dev-side only; not part of the library.
"""

TWO64 = "CAST(18446744073709551616 AS HUGEINT)"
TWO32 = "4294967296"


def mulmod(a: str, c: int) -> str:
    """(a * c) mod 2^64 for a < 2^64 nonneg HUGEINT expr and 64-bit
    constant c, avoiding HUGEINT overflow via 32-bit split of c."""
    cH, cL = c >> 32, c & 0xFFFFFFFF
    if cH == 0:
        return f"((({a}) * {cL}) % {TWO64})"
    return (f"((({a}) * {cL} + ((({a}) * {cH}) % {TWO32}) * {TWO32})"
            f" % {TWO64})")


def splitmix(x: str) -> str:
    """SplitMix64 of a nonneg HUGEINT expr (< 2^64); logical shifts
    are integer division (operand is nonneg)."""
    z0 = f"((({x}) + 11400714819323198485) % {TWO64})"
    x1 = f"xor({z0}, ({z0} // 1073741824))"
    z1 = mulmod(x1, 0xBF58476D1CE4E5B9)
    x2 = f"xor({z1}, ({z1} // 134217728))"
    z2 = mulmod(x2, 0x94D049BB133111EB)
    return f"xor({z2}, ({z2} // 2147483648))"


def to_signed(u: str) -> str:
    """Unsigned HUGEINT (< 2^64) -> signed BIGINT (two's complement)."""
    return (f"CAST(CASE WHEN ({u}) >= 9223372036854775808 "
            f"THEN ({u}) - {TWO64} ELSE ({u}) END AS BIGINT)")


def fnv_bytes(list_expr: str) -> str:
    """FNV-1a 64 over a LIST of byte values (HUGEINT exprs)."""
    return (f"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
            f"{list_expr}), (h, b) -> (xor(h, b) * 1099511628211) % {TWO64})")


def chars(text_expr: str) -> str:
    """ASCII text -> LIST of byte values as HUGEINT."""
    return (f"list_transform(split({text_expr}, ''), "
            f"c -> CAST(unicode(c) AS HUGEINT))")


def fnv_text(text_expr: str) -> str:
    return fnv_bytes(chars(text_expr))


# powers of 257 mod 2^64 for the 16-byte Rabin-Karp window
POW257 = [pow(257, k, 1 << 64) for k in range(16)]


def dot_d(a: str, b: str) -> str:
    """Bit-exact double dot product of two float lists (ascending
    index, double accumulation — mirrors HashOps.cosine)."""
    return (f"list_sum(list_transform(range(1, len({a})+1), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))")


def cosine(a: str, b: str) -> str:
    """cos(a,b) as in HashOps.cosine (0.0 on zero norm)."""
    return (f"(CASE WHEN {dot_d(a, a)} = 0 OR {dot_d(b, b)} = 0 THEN 0.0 "
            f"ELSE {dot_d(a, b)} / (sqrt({dot_d(a, a)}) * sqrt({dot_d(b, b)})) END)")


def simhash(text_expr: str) -> str:
    """64-bit SimHash of whitespace tokens (HashOps.simhash64),
    unsigned HUGEINT result."""
    toks = (f"list_filter(regexp_split_to_array({text_expr}, '[ \\n\\t\\r]'), "
            f"t -> t != '')")
    hashes = f"list_transform({toks}, t -> {fnv_text('t')})"
    pow2 = "[" + ",".join(f"CAST({1 << b} AS HUGEINT)" for b in range(64)) + "]"
    # votes(b) > 0  <=>  2*count_set(b) > n_tokens
    return (f"(SELECT list_sum(list_transform(range(0, 64), b -> "
            f"CASE WHEN 2 * list_sum(list_transform(hs, h -> "
            f"CASE WHEN (h // ({pow2})[b+1]) % 2 = 1 THEN 1 ELSE 0 END)) "
            f"> len(hs) THEN ({pow2})[b+1] ELSE CAST(0 AS HUGEINT) END)) "
            f"FROM (SELECT {hashes} AS hs) _sh)")


def splitmix_list(list_expr: str, inner_alias: str) -> str:
    """Staged SplitMix64 over a LIST of nonneg HUGEINTs (< 2^64):
    each xorshift/multiply round is its own list_transform pass, so
    intermediates are bound once per element instead of the naive
    substitution blow-up. Yields a subquery producing column `sm`
    (LIST of signed BIGINT)."""
    z0 = f"list_transform({list_expr}, h -> (h + 11400714819323198485) % {TWO64})"
    z1 = f"list_transform(z0s, z0 -> {mulmod('xor(z0, z0 // 1073741824)', 0xBF58476D1CE4E5B9)})"
    z2 = f"list_transform(z1s, z1 -> {mulmod('xor(z1, z1 // 134217728)', 0x94D049BB133111EB)})"
    z3 = f"list_transform(z2s, z2 -> {to_signed('xor(z2, z2 // 2147483648)')})"
    return (f"(SELECT {z3} AS sm FROM "
            f"(SELECT {z2} AS z2s FROM "
            f"(SELECT {z1} AS z1s FROM "
            f"(SELECT {z0} AS z0s FROM {inner_alias}) _a) _b) _c)")


def rolling_min(text_expr: str, w: int = 16) -> str:
    """Winnowing fingerprint (HashOps.rollingMin) for ASCII text with
    length >= w, as signed BIGINT: min over signed splitmix64 of each
    w-byte Rabin-Karp window hash."""
    pows = "[" + ",".join(f"CAST({p} AS HUGEINT)" for p in reversed(POW257[:w])) + "]"
    win = (f"(list_sum(list_transform(range(0, {w}), "
           f"j -> cs[i+j] * pws[j+1])) % {TWO64})")
    wins = f"list_transform(range(1, len(cs)-{w}+2), i -> {win})"
    inner = (f"(SELECT {chars(text_expr)} AS cs, {pows} AS pws) _rm")
    return (f"(SELECT list_min(sm) FROM {splitmix_list(wins, inner)} _sm)")


def srp_bucket(vec: str, planes: int = 8) -> str:
    """Sign-random-projection bucket (HashOps.srpBucket) of a float
    list, as BIGINT. Coefficient c(i,j) derives from splitmix64 of
    (i*1315423911 + j), i 0-based element index."""
    coef = (f"(CAST(({splitmix('CAST((i-1) * 1315423911 + j AS HUGEINT)')}) % 65536 AS DOUBLE)"
            f" / 32768.0 - 1.0)")
    dot = (f"list_sum(list_transform(range(1, len({vec})+1), "
           f"i -> CAST({vec}[i] AS DOUBLE) * {coef}))")
    return (f"(SELECT list_sum(list_transform(range(0, {planes}), j -> "
            f"CASE WHEN ({dot}) > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END)) "
            f"FROM (SELECT 1) _srp)")


def ngrams(text_expr: str, n: int = 5) -> str:
    """Distinct character n-grams (HashOps.charNgrams); whole string
    when shorter than n."""
    return (f"(CASE WHEN length({text_expr}) < {n} THEN [{text_expr}] "
            f"ELSE list_distinct(list_transform("
            f"range(1, length({text_expr}) - {n} + 2), "
            f"i -> substring({text_expr}, CAST(i AS INT), {n}))) END)")


def norm(df):
    """THE normalization both dev gates share (column-name sort,
    str/int/float-repr casts, row sort) — self_check.py and
    gen_oracles.py must compare identically or one can pass what the
    other fails. Takes/returns a pandas DataFrame."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            # full round-trip precision: any cross-engine double drift
            # fails here exactly as it would fail the driver's hash
            df[c] = df[c].map(lambda v: repr(float(v)) if v == v else "nan")
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def mulmod_var(h: str, a: str) -> str:
    """(h * a) mod 2^64 for two variable nonneg HUGEINTs < 2^64:
    split h into 32-bit halves so no product exceeds 2^96."""
    return (f"((((({h}) // {TWO32}) * ({a})) % {TWO32}) * {TWO32} "
            f"+ (({h}) % {TWO32}) * ({a})) % {TWO64}")


def sm_py(seed):
    """Python reference SplitMix64 — the ONE copy every generator
    derives constants from (SQL twin: splitmix())."""
    M = 1 << 64
    z = (seed + 0x9e3779b97f4a7c15) % M
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) % M
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) % M
    return z ^ (z >> 31)


# MinHash permutation coefficients — replicates HashOps.coefsFor:
# a_i = splitmix64(0x5eed0000 + i) | 1, b_i = splitmix64(0xbeef0000 + i)
MINHASH_A = [(sm_py(0x5eed0000 + i) | 1) for i in range(64)]
MINHASH_B = [sm_py(0xbeef0000 + i) for i in range(64)]


def fnv_window(cs: str, i: str, k: int) -> str:
    """FNV-1a over the k bytes cs[i..i+k-1] (unrolled — the constant
    prime fits the overflow-safe direct multiply)."""
    h = "CAST(14695981039346656037 AS HUGEINT)"
    for j in range(k):
        h = f"((xor({h}, {cs}[{i}+{j}]) * 1099511628211) % {TWO64})"
    return h


def minhash_sig(text_expr: str, k: int = 5, perms: int = 64) -> str:
    """MinHash signature (HashOps.minhashSig) for ASCII text with
    length >= k, as LIST of signed BIGINT (signature order). Min is
    over SIGNED longs, as in the Scala kernel."""
    A = "[" + ",".join(f"CAST({a} AS HUGEINT)" for a in MINHASH_A[:perms]) + "]"
    B = "[" + ",".join(f"CAST({b} AS HUGEINT)" for b in MINHASH_B[:perms]) + "]"
    BIAS = "9223372036854775808"
    # signed order == unsigned order of (x XOR 2^63): bias inside the
    # hot loop (one xor), un-bias + sign-convert once per signature slot
    perm = f"(({mulmod_var('h', 'pa[p]')} + pb[p]) % {TWO64})"
    mins = (f"list_transform(range(1, {perms}+1), p -> "
            f"list_min(list_transform(hs, h -> xor({perm}, {BIAS}))))")
    sig = f"list_transform(ms, m -> {to_signed(f'xor(m, {BIAS})')})"
    hs = f"list_transform(range(1, len(cs)-{k}+2), i -> {fnv_window('cs', 'i', k)})"
    return (f"(SELECT {sig} FROM (SELECT {mins} AS ms "
            f"FROM (SELECT {hs} AS hs, {A} AS pa, {B} AS pb "
            f"FROM (SELECT {chars(text_expr)} AS cs) _c) _h) _s)")


PLANTED_DOCS = """
 SELECT doc_id, text FROM documents
 UNION ALL
 SELECT doc_id + 1000000 AS doc_id, text || ' near duplicate suffix' AS text
 FROM documents WHERE doc_id % 50 = 0
"""

PLANTED_EMB = """
 SELECT vec_id, embedding FROM embeddings
 UNION ALL
 SELECT vec_id + 1000000 AS vec_id,
        list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1.001 AS FLOAT)) AS embedding
 FROM embeddings WHERE vec_id % 50 = 0
"""
