"""Vectorized numpy kernels: shingling, MinHash, SimHash, LSH banding.

These kernels are the single source of truth shared by

* the Spark pandas/Arrow UDFs (``dedup_spark.functions.udfs``), and
* the single-process oracle (``dedup_spark.oracle``) used to measure
  dup-pair recall, mirroring the reference's datasketch-based MinHash
  (/root/reference/dedup/dedup.py:310-316) without the library.

Everything operates on uint64 with natural modulo-2^64 wraparound and is
fully vectorized (no per-element Python) — the north-star's "no per-row
Python" constraint applied at the numpy level too.

Spark's LongType is signed; kernels therefore RETURN int64 views of the
underlying uint64 values.  All order-sensitive math (MinHash min) is done
in uint64 space before the final view.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK = U64(0xFFFFFFFFFFFFFFFF)

# splitmix64 constants (public domain, Steele et al.)
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)

_POLY_BASE = U64(1099511628211)  # FNV-64 prime as polynomial base


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Bijective 64-bit finalizer; input/output uint64 arrays."""
    x = (x + _SM_GAMMA) & _MASK
    x = ((x ^ (x >> U64(30))) * _SM_M1) & _MASK
    x = ((x ^ (x >> U64(27))) * _SM_M2) & _MASK
    return x ^ (x >> U64(31))


def _poly_powers(k: int) -> np.ndarray:
    p = np.empty(k, dtype=U64)
    with np.errstate(over="ignore"):
        p[k - 1] = U64(1)
        for i in range(k - 2, -1, -1):
            p[i] = (p[i + 1] * _POLY_BASE) & _MASK
    return p


_POW_CACHE: dict[int, np.ndarray] = {}


def char_shingles(text: str, k: int) -> np.ndarray:
    """Distinct hashed k-character shingles of ``text`` → sorted int64[].

    Analog of KMC k-mer enumeration (reference kmer_utilities.py:89-120):
    every length-k byte window, polynomial-hashed then splitmix64-mixed.
    Texts shorter than k yield an empty array (empty-set guard analog,
    reference dedup.py:350).
    """
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = b.shape[0]
    if n < k:
        return np.empty(0, dtype=np.int64)
    if k not in _POW_CACHE:
        _POW_CACHE[k] = _poly_powers(k)
    pows = _POW_CACHE[k]
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(U64)
    h = (win * pows[None, :]).sum(axis=1, dtype=U64)
    return np.sort(np.unique(splitmix64(h)).view(np.int64))


def char_window_hashes(text: str | bytes, k: int) -> np.ndarray:
    """ALL hashed k-byte windows of ``text`` in position order
    (non-distinct) → int64[]. Index i is the window starting at byte
    offset i (0-based). Same hash family as :func:`char_shingles`, so
    ``unique(char_window_hashes(t, k)) == char_shingles(t, k)``.

    Accepts str (UTF-8-encoded first) or raw bytes — the byte form lets
    callers hash byte-sliced document fragments (scoring's span-range
    position classes) in the identical hash space as whole-doc
    shingling, which also enumerates every byte window."""
    raw = (
        text
        if isinstance(text, (bytes, bytearray))
        else text.encode("utf-8", "surrogatepass")
    )
    b = np.frombuffer(raw, dtype=np.uint8)
    n = b.shape[0]
    if n < k:
        return np.empty(0, dtype=np.int64)
    if k not in _POW_CACHE:
        _POW_CACHE[k] = _poly_powers(k)
    pows = _POW_CACHE[k]
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(U64)
    with np.errstate(over="ignore"):
        h = (win * pows[None, :]).sum(axis=1, dtype=U64)
        return splitmix64(h).view(np.int64)


def _poly_powers_asc(n: int) -> np.ndarray:
    """base^0 .. base^(n-1) (mod 2^64), ascending."""
    p = np.empty(max(n, 1), dtype=U64)
    p[0] = U64(1)
    with np.errstate(over="ignore"):
        for i in range(1, n):
            p[i] = (p[i - 1] * _POLY_BASE) & _MASK
    return p


_ASC_POW = _poly_powers_asc(0)


def hash_token_array(toks: list[str]) -> np.ndarray:
    """One uint64 polynomial+splitmix hash per token, vectorized over the
    concatenation of all tokens' surrogatepass-encoded bytes — an
    IN-REPO kernel, so (a) lone surrogates can't crash the executor UDF
    (``pd.util.hash_array`` raises UnicodeEncodeError on them) and
    (b) signatures can't silently drift with pandas versions while the
    config fingerprint stays the same (the fingerprint now carries
    ``hash_family``, see DedupConfig).

    Per-token hash = splitmix64(Σ byte[i] · base^(len−1−i) mod 2^64) —
    the same family as :func:`hash_bytes` (bit-identical, property-tested).
    The position→exponent map is computed for the whole concatenation at
    once; per-token sums come from one ``np.add.reduceat``.
    """
    global _ASC_POW
    n = len(toks)
    if n == 0:
        return np.empty(0, dtype=U64)
    enc = [t.encode("utf-8", "surrogatepass") for t in toks]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:  # all-empty tokens (can't happen via str.split)
        return splitmix64(np.zeros(n, dtype=U64))
    maxlen = int(lens.max())
    if _ASC_POW.shape[0] < maxlen:
        _ASC_POW = _poly_powers_asc(maxlen)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(U64)
    ends = np.cumsum(lens)
    # exponent of position p in token [start, end) is end-1-p
    exp_idx = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
    starts = ends - lens
    with np.errstate(over="ignore"):
        contrib = buf * _ASC_POW[exp_idx]
        sums = np.add.reduceat(contrib, starts)
    h = np.where(lens > 0, sums, U64(0)).astype(U64)
    return splitmix64(h)


def token_shingles(text: str, k: int) -> np.ndarray:
    """Distinct hashed k-token shingles (whitespace tokens) → sorted int64[].

    Token hashing is one vectorized :func:`hash_token_array` call — a
    per-token Python hash_bytes loop here measured ~20ms for a 500-token
    document, and the pandas ``hash_array`` alternative both crashes on
    lone surrogates and version-pins the hash space."""
    toks = text.split()
    if len(toks) < k:
        return np.empty(0, dtype=np.int64)
    th = hash_token_array(toks)
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    if k not in _POW_CACHE:
        _POW_CACHE[k] = _poly_powers(k)
    pows = _POW_CACHE[k]
    with np.errstate(over="ignore"):
        h = (win * pows[None, :]).sum(axis=1, dtype=U64)
    return np.sort(np.unique(splitmix64(h)).view(np.int64))


def hash_bytes(data: bytes) -> np.uint64:
    """Polynomial+splitmix hash of a byte string → uint64 scalar."""
    b = np.frombuffer(data, dtype=np.uint8).astype(U64)
    if b.shape[0] == 0:
        return splitmix64(np.array([U64(0)], dtype=U64))[0]
    acc = U64(0)
    # Horner, vectorized as powers dot product
    pows = _poly_powers(b.shape[0]) if b.shape[0] not in _POW_CACHE else _POW_CACHE[b.shape[0]]
    acc = (b * pows).sum(dtype=U64)
    return splitmix64(np.array([acc], dtype=U64))[0]


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiply-shift parameters; a forced odd."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | U64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """128-perm MinHash of a shingle set → int64[num_perm].

    h_i(x) = (a_i * x + b_i) mod 2^64, signature_i = min over the set.
    Analog of datasketch MinHash(num_perm=128), reference dedup.py:313-316.
    Empty set → all-ones sentinel (never collides with real minima in a
    band join because empty docs are filtered before banding).
    """
    num_perm = a.shape[0]
    if shingles.shape[0] == 0:
        return np.full(num_perm, -1, dtype=np.int64)
    # pre-mix so the family stays uniform even for structured inputs
    s = splitmix64(np.ascontiguousarray(shingles).view(U64))
    # chunk the shingle axis so the num_perm × chunk temporary stays
    # L2-resident (256 KB at 128 perms): an L3-sized temporary measured
    # 17% slower solo and 36% slower with 4 cores running the kernel
    # concurrently (shared-L3/DRAM contention — exactly the multi-core
    # executor case)
    chunk = max(1, 32_768 // num_perm)
    out = np.full(num_perm, _MASK, dtype=U64)
    for i in range(0, s.shape[0], chunk):
        block = s[i : i + chunk]
        hv = (a[:, None] * block[None, :] + b[:, None]) & _MASK
        np.minimum(out, hv.min(axis=1), out=out)
    return out.view(np.int64)


def simhash_signature(shingles: np.ndarray) -> int:
    """64-bit SimHash of a shingle set → python int (int64 range).

    Per-bit majority vote over the shingle hashes (north-star Hamming
    filter; no reference analog — new capability).
    """
    if shingles.shape[0] == 0:
        return 0
    # pre-mix so per-bit votes are unbiased even for structured inputs
    s = splitmix64(np.ascontiguousarray(shingles).view(U64))
    bits = np.unpackbits(s[:, None].view(np.uint8), axis=1, bitorder="little")
    votes = bits.sum(axis=0, dtype=np.int64)
    maj = (votes * 2 > s.shape[0]).astype(np.uint8)
    packed = np.packbits(maj, bitorder="little").view(U64)[0]
    return int(packed.view(np.int64))


def band_hashes(signature: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """LSH band hashes → int64[bands].

    band_hash_j = mix of the band's r signature values and the band id —
    the banding analog of MinHashLSHEnsemble bucketing (reference
    dedup.py:333-351).
    """
    sig = signature.view(U64).reshape(bands, rows_per_band)
    acc = np.full(bands, U64(0xCBF29CE484222325), dtype=U64)
    for r in range(rows_per_band):
        acc = splitmix64(acc ^ sig[:, r])
    acc = splitmix64(acc ^ np.arange(bands, dtype=U64))
    return acc.view(np.int64)


# ---------------------------------------------------------------- batch
# Batch-level kernels: one call per Arrow batch instead of one numpy
# call per row. Outputs are bit-identical to the per-row kernels above
# (same premix, same hash family) — the per-row forms remain the oracle
# reference and are property-tested against these.

def segment_offsets(lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row lengths → (starts, ends) offsets into the concatenation."""
    ends = np.cumsum(lens, dtype=np.int64)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1]
    return starts, ends


def minhash_batch(
    premixed: np.ndarray, starts: np.ndarray, ends: np.ndarray,
    a: np.ndarray, b: np.ndarray,
) -> np.ndarray:
    """Segment-min MinHash over a premixed concatenation → int64[n, perm].

    ``premixed`` is splitmix64 of ALL rows' shingles concatenated in row
    order; empty rows (start == end) get the all-(-1) sentinel exactly
    like :func:`minhash_signature`.

    The segment minimum is a per-row loop over contiguous slices with a
    SIMD ``min(axis=1)`` per slice — measured ~30× faster than the
    "fully batched" ``np.minimum.reduceat`` formulation (reduceat is a
    per-element ufunc dispatch loop, not vectorized). The shingle axis
    is chunked so the (perm × slice) temporary stays cache-resident."""
    num_perm = a.shape[0]
    n = starts.shape[0]
    out = np.full((n, num_perm), -1, dtype=np.int64)
    nonempty = np.nonzero(ends > starts)[0]
    if nonempty.size == 0:
        return out
    a2, b2 = a[:, None], b[:, None]
    # L2-resident chunk (see minhash_signature) — measured 26% faster
    # under 4-way core contention than the former L3-sized chunk
    chunk = max(1, 32_768 // num_perm)
    acc = np.empty(num_perm, dtype=U64)
    with np.errstate(over="ignore"):
        for i in nonempty:
            block = premixed[starts[i] : ends[i]]
            if block.shape[0] <= chunk:
                out[i] = ((a2 * block[None, :] + b2) & _MASK).min(axis=1).view(np.int64)
                continue
            acc.fill(_MASK)
            for j in range(0, block.shape[0], chunk):
                hv = (a2 * block[None, j : j + chunk] + b2) & _MASK
                np.minimum(acc, hv.min(axis=1), out=acc)
            out[i] = acc.view(np.int64)
    return out


def simhash_batch(
    premixed: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> np.ndarray:
    """Per-bit majority SimHash over a premixed concatenation → int64[n].

    Votes accumulate bit-by-bit ((x >> j) & 1 then segment-sum), BLOCK
    by block along the concatenation: the former whole-array bit loop
    re-streamed the entire concatenation from DRAM 64 times (tens of GB
    of traffic per Arrow batch — the dominant memory-bandwidth load when
    several executor cores run the kernel concurrently); a ~2 MB block
    stays cache-resident across all 64 bit passes, so the concatenation
    is read from DRAM once. Rows spanning block boundaries accumulate
    across iterations (integer sums — bit-identical to the unblocked
    form, property-tested)."""
    n = starts.shape[0]
    out = np.zeros(n, dtype=np.int64)
    nonempty = np.nonzero(ends > starts)[0]
    if nonempty.size == 0:
        return out
    counts = (ends - starts)[nonempty].astype(np.int64)
    votes = np.zeros((nonempty.size, 64), dtype=np.int64)
    ne_starts = starts[nonempty]
    ne_ends = ends[nonempty]
    one = U64(1)
    blk = 1 << 18  # 256K u64 = 2 MB per block
    total = int(ne_ends[-1])
    r_lo = 0
    for s0 in range(int(ne_starts[0]), total, blk):
        e0 = min(s0 + blk, total)
        block = premixed[s0:e0]
        # rows whose segment intersects [s0, e0): segments are contiguous
        # and sorted, so advance a cursor instead of searching
        while r_lo < nonempty.size and ne_ends[r_lo] <= s0:
            r_lo += 1
        r_hi = r_lo
        while r_hi < nonempty.size and ne_starts[r_hi] < e0:
            r_hi += 1
        if r_lo == r_hi:
            continue
        offs = np.maximum(ne_starts[r_lo:r_hi], s0) - s0
        for j in range(64):
            bit_j = (block >> U64(j)) & one
            votes[r_lo:r_hi, j] += np.add.reduceat(bit_j, offs).astype(np.int64)
    maj = (votes * 2 > counts[:, None]).astype(np.uint8)
    packed = np.packbits(maj, axis=1, bitorder="little").view(U64).ravel()
    out[nonempty] = packed.view(np.int64)
    return out


def band_hashes_batch(signatures: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """Row-batched :func:`band_hashes`: int64[n, perm] → int64[n, bands]."""
    sig = signatures.view(U64).reshape(signatures.shape[0], bands, rows_per_band)
    acc = np.full((signatures.shape[0], bands), U64(0xCBF29CE484222325), dtype=U64)
    with np.errstate(over="ignore"):
        for r in range(rows_per_band):
            acc = splitmix64(acc ^ sig[:, :, r])
        acc = splitmix64(acc ^ np.arange(bands, dtype=U64)[None, :])
    return acc.view(np.int64)


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two 64-bit signatures."""
    return int(bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1"))


def shingle_fn(unit: str):
    if unit == "char":
        return char_shingles
    if unit == "token":
        return token_shingles
    raise ValueError(f"bad shingle unit {unit!r}")
