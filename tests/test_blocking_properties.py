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
