"""Property-based completeness proofs for the candidate-generation
(blocking) schemes: the whole point of blocking is that the cheap
equi-join NEVER misses a pair the expensive verify would accept, so
completeness — not just parity on one fixture — is the contract.
Both properties run pure-Python (no Spark session needed): they test
the SCHEME the operators implement, with the key functions mirrored
exactly from the SQL/code.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_rag_server_spark.operators.multimodal import (
    PH_BANDS,
    PH_BW,
    fake_phash,
)


def _deletion_keys(tok: str) -> set[str]:
    """Mirror of ta_fuzzy_correct's key set: the token plus every
    single-character deletion (operators/textanalysis.py del_keys)."""
    return {tok} | {tok[:i] + tok[i + 1 :] for i in range(len(tok))}


_WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=12)


@settings(max_examples=300, deadline=None)
@given(
    base=_WORD,
    pos=st.integers(min_value=0, max_value=12),
    ch=st.sampled_from("abcdefgh"),
    op=st.sampled_from(["insert", "delete", "substitute"]),
)
def test_symspell_blocking_complete_at_distance_1(base, pos, ch, op):
    """ANY single edit (insert/delete/substitute) of a token shares a
    deletion key with the original — so ta_fuzzy_correct's equi-join
    candidate generator is complete for Levenshtein distance 1 and the
    post-join levenshtein()==1 verify never rescues a missed pair."""
    p = pos % (len(base) + (1 if op == "insert" else 0))
    if op == "insert":
        other = base[:p] + ch + base[p:]
    elif op == "delete":
        if len(base) == 1:
            return  # deletion would empty the token; out of domain
        p = pos % len(base)
        other = base[:p] + base[p + 1 :]
    else:
        p = pos % len(base)
        other = base[:p] + ch + base[p + 1 :]
    assert _deletion_keys(base) & _deletion_keys(other)


@settings(max_examples=300, deadline=None)
@given(
    blob=st.binary(min_size=64, max_size=400),
    flips=st.lists(
        st.integers(min_value=0, max_value=63),
        min_size=0,
        max_size=PH_BANDS - 1,
        unique=True,
    ),
)
def test_phash_banding_complete_below_band_count(blob, flips):
    """mm_phash_neardup's stated guarantee, executed: flip ANY
    < PH_BANDS of the 64 hash bits and at least one band stays
    identical, so the (band, value) bucket join cannot miss a pair at
    hamming <= PH_BANDS-1."""
    bands = fake_phash(blob)
    mutated = list(bands)
    for bit in flips:
        mutated[bit // PH_BW] ^= 1 << (bit % PH_BW)
    assert any(bands[j] == mutated[j] for j in range(PH_BANDS))


def test_phash_banding_boundary_counterexample():
    """And the guarantee is TIGHT: PH_BANDS flips placed one per band
    leave no clean band, so recall above PH_BANDS-1 is probabilistic —
    the docstring's claim boundary, pinned. (This construction
    falsified an earlier revision that claimed completeness at the
    verify threshold 6 with 4 bands.)"""
    bands = fake_phash(bytes(64))
    mutated = [bands[j] ^ 1 for j in range(PH_BANDS)]  # one flip per band
    assert all(bands[j] != mutated[j] for j in range(PH_BANDS))


def test_fake_phash_matches_oracle_arithmetic():
    """The Python fake decoder and the SQL twin must compute identical
    bands (the driver hash depends on it): re-derive the bands with the
    oracle's formula (1-based substr sampling, float mean compare) for
    a spread of lengths including the boundary n=64."""
    for n in (64, 65, 100, 297, 400):
        text = bytes((i * 37 + n) % 128 for i in range(n))
        v = [text[(i * n) // 64] for i in range(64)]
        mean = sum(v) / 64.0
        expect = []
        for j in range(PH_BANDS):
            acc = 0
            for k in range(PH_BW):
                if v[PH_BW * j + k] > mean:
                    acc |= 1 << k
            expect.append(acc)
        assert fake_phash(text) == expect, n


# ---- winnowing guarantee (ta_winnowing_fingerprint) ----------------

import hashlib as _hashlib

from mcp_rag_server_spark.operators.textanalysis import (
    WINNOW_K,
    WINNOW_POS_MOD,
    WINNOW_W,
)


def _winnow_hashes(tokens: list[str]) -> list[int]:
    """Mirror of _winnow_sql's k-gram fold: 32-bit int from the first 8
    hex digits of md5 over the space-joined k-gram."""
    out = []
    for i in range(len(tokens) - WINNOW_K + 1):
        kg = " ".join(tokens[i : i + WINNOW_K])
        out.append(int(_hashlib.md5(kg.encode()).hexdigest()[:8], 16))
    return out


def _winnow_select(tokens: list[str]) -> set[int]:
    """Mirror of the SQL selection: per full window of WINNOW_W packed
    hashes, the minimum of h*2^20+i; returns the selected HASH parts
    (the cross-doc-comparable fingerprint identity)."""
    hs = _winnow_hashes(tokens)
    sel = set()
    for end in range(WINNOW_W - 1, len(hs)):
        window = [
            hs[j] * WINNOW_POS_MOD + j
            for j in range(end - WINNOW_W + 1, end + 1)
        ]
        sel.add(min(window) // WINNOW_POS_MOD)
    return sel


_TOK = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
    min_size=0,
    max_size=10,
)


@settings(max_examples=300, deadline=None)
@given(prefix_a=_TOK, suffix_a=_TOK, prefix_b=_TOK, suffix_b=_TOK, run=st.lists(
    st.sampled_from(["pp", "qq", "rr", "ss", "tt", "uu"]),
    min_size=WINNOW_W + WINNOW_K - 1,
    max_size=WINNOW_W + WINNOW_K + 4,
))
def test_winnowing_guarantee_shared_run_shares_fingerprint(
    prefix_a, suffix_a, prefix_b, suffix_b, run
):
    """The winnowing contract (Schleimer et al. §2): any shared token
    run of length ≥ w+k-1 yields at least one COMMON selected
    fingerprint hash in both documents, wherever the run sits. The
    shared run contributes w identical consecutive k-gram hashes to
    both docs; the window ending at that run's last hash exists in
    both, its value sequence is identical, and the packed (hash, pos)
    min breaks ties at the same relative offset — so the selected
    hash agrees. Mirrored exactly from _winnow_sql's arithmetic."""
    doc_a = prefix_a + run + suffix_a
    doc_b = prefix_b + run + suffix_b
    assert _winnow_select(doc_a) & _winnow_select(doc_b)


# ---- KMV mergeability (agg_kmv_distinct_audit) ---------------------

from mcp_rag_server_spark.operators.sketches import KMV_K


@settings(max_examples=300, deadline=None)
@given(
    a=st.sets(st.integers(min_value=0, max_value=10**9), max_size=200),
    b=st.sets(st.integers(min_value=0, max_value=10**9), max_size=200),
)
def test_kmv_union_of_sketches_is_sketch_of_union(a, b):
    """The property agg_kmv_distinct_audit's pair stage relies on:
    taking the k smallest of (sketch(A) ∪ sketch(B)) equals the
    sketch of A ∪ B — so the pairwise union sketch built from the two
    per-type sketches is exactly what a direct pass over the combined
    set would produce, and the (k-1)/u_k estimate applies to it
    unchanged. This is what makes KMV sketches mergeable artifacts at
    100 TB (combine per-shard sketches, never re-scan)."""
    sk = lambda s: set(sorted(s)[:KMV_K])
    assert sk(sk(a) | sk(b)) == sk(a | b)


def test_ivf_cell_count_scales_with_corpus():
    """clustering.n_cells (r7 verdict item 4): the IVF cell count is
    COMPUTED from the corpus — floor CELL_SEEDS at every fixture SF
    (5 / 500 / 5000 vectors, so fixture hashes and recall contracts
    are unchanged), then ceil(N / TARGET_CELL_SIZE) above it, which
    keeps expected cell size — and per-cell quadratic candidate work —
    constant as the corpus grows."""
    from mcp_rag_server_spark.operators.clustering import (
        CELL_SEEDS,
        TARGET_CELL_SIZE,
        n_cells,
    )

    for fixture_n in (5, 500, 5000):
        assert n_cells(fixture_n) == CELL_SEEDS
    assert n_cells(CELL_SEEDS * TARGET_CELL_SIZE) == CELL_SEEDS
    assert n_cells(CELL_SEEDS * TARGET_CELL_SIZE + 1) == CELL_SEEDS + 1
    # 1B vectors -> ~1M cells, expected cell size stays TARGET_CELL_SIZE
    n = 1_000_000_000
    assert n_cells(n) == -(-n // TARGET_CELL_SIZE)
    assert n / n_cells(n) <= TARGET_CELL_SIZE


def test_winnowing_query_matches_python_mirror(spark):
    """Bridge the property mirror to the REGISTERED query: per doc at
    sf0.001, ta_winnowing_fingerprint's n_kgrams / n_fingerprints /
    fp_digest / density must equal a direct Python winnowing pass
    (same 32-bit md5 k-gram fold, packed h*2^20+i window minimum,
    distinct PACKED selections, sorted '|'-joined md5 digest). The
    guarantee test above checks the scheme; this checks the SQL
    implements the scheme."""
    import math

    import duckdb

    from mcp_rag_server_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: r
        for r in load_all()["ta_winnowing_fingerprint"]
        .spark_fn(spark, sf)
        .collect()
    }

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    assert len(got) == sum(
        1 for _, text in docs if len(text.split(" ")) >= WINNOW_K
    )
    for doc_id, text in docs:
        tokens = text.split(" ")
        hs = _winnow_hashes(tokens)
        if not hs:
            assert doc_id not in got
            continue
        packed = [h * WINNOW_POS_MOD + i for i, h in enumerate(hs)]
        sel = {
            min(packed[end - WINNOW_W + 1 : end + 1])
            for end in range(WINNOW_W - 1, len(packed))
        }
        digest = (
            _hashlib.md5(
                "|".join(str(c) for c in sorted(sel)).encode()
            ).hexdigest()
            if sel
            else ""
        )
        r = got[doc_id]
        assert r["n_kgrams"] == len(hs)
        assert r["n_fingerprints"] == len(sel)
        assert r["fp_digest"] == digest
        assert r["density"] == math.floor(
            len(sel) / len(hs) * 1e4 + 0.5
        ) / 1e4
