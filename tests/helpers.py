"""Test oracles and synthetic data generators."""
from __future__ import annotations

import numpy as np

SEPARATOR = 2


def brute_multidoc_bwt(sx: np.ndarray) -> bytes:
    """Brute-force multi-document BWT of the collection string SX.

    Suffix comparison: separators sort below every real char and among
    themselves by document order (the reference assigns doc-end pseudo-heads
    ranks 1..D-1 in document order, CMS-BWT-functions.cpp:630-645). Realized
    by remapping the d-th separator to value d and real char c to
    n_seps + c, then plain suffix sorting. BWT char of suffix t is
    SX[(t-1) mod sn].
    """
    sn = len(sx)
    if sn == 0:
        return b""
    is_sep = sx == SEPARATOR
    n_seps = int(is_sep.sum())
    t = np.where(is_sep, np.cumsum(is_sep) - 1,
                 sx.astype(np.int64) + n_seps)
    # suffix sort via doubling (host, small inputs only)
    sa = suffix_array_ints(t)
    out = sx[(sa - 1) % sn]
    return out.tobytes()


def suffix_array_ints(t: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (no sentinel assumptions —
    shorter-suffix-is-smaller on exhaustion, std::sort semantics)."""
    n = len(t)
    rank = np.asarray(t, dtype=np.int64)
    # dense ranks
    order = np.argsort(rank, kind="stable")
    sr = rank[order]
    ch = np.ones(n, dtype=bool)
    ch[1:] = sr[1:] != sr[:-1]
    r = np.empty(n, dtype=np.int64)
    r[order] = np.cumsum(ch) - 1
    rank = r
    k = 1
    while rank[order[-1]] != n - 1:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        ch = np.ones(n, dtype=bool)
        ch[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.cumsum(ch) - 1
        k <<= 1
    return order


def random_dna(rng: np.random.Generator, n: int) -> bytes:
    return bytes(rng.choice([65, 67, 71, 84], size=n).astype(np.uint8))


def mutate(rng: np.random.Generator, seq: bytes, snp_rate: float,
           indel_rate: float = 0.0) -> bytes:
    arr = np.frombuffer(seq, dtype=np.uint8).copy()
    n = len(arr)
    nmut = rng.binomial(n, snp_rate)
    posns = rng.choice(n, size=nmut, replace=False) if nmut else []
    for p in posns:
        arr[p] = rng.choice([c for c in [65, 67, 71, 84] if c != arr[p]])
    out = arr
    if indel_rate > 0:
        keep = rng.random(n) >= indel_rate
        out = out[keep]
    return out.tobytes()


def make_fasta(docs: list[bytes], width: int = 60) -> bytes:
    """FASTA with '>' headers and wrapped lines + trailing newline."""
    parts = []
    for i, d in enumerate(docs):
        parts.append(b">doc" + str(i).encode())
        for j in range(0, len(d), width):
            parts.append(d[j: j + width])
    return b"\n".join(parts) + b"\n"


def make_inputs(tmp_path, ref: bytes, docs: list[bytes], ref_fasta=False,
                width: int = 60):
    """Write reference + collection + input-list files; return list path."""
    ref_path = tmp_path / "ref.txt"
    if ref_fasta:
        ref_path.write_bytes(make_fasta([ref], width))
    else:
        ref_path.write_bytes(ref)
    coll_path = tmp_path / "coll.fa"
    coll_path.write_bytes(make_fasta(docs, width))
    lst = tmp_path / "input.txt"
    lst.write_bytes(str(ref_path).encode() + b"\n" +
                    str(coll_path).encode() + b"\n")
    return lst, ref_path, coll_path
