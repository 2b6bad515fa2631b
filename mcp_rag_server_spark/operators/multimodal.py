"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

No decoder libraries (PIL/librosa/av) exist in this container, so the
*decode* step is pluggable: production injects a real decoder; the
default here is a clearly-marked deterministic fake whose outputs are
pure arithmetic over the blob bytes — which makes the whole pipeline
relationally expressible and therefore oracle-checkable. The Spark-side
plumbing — binary column, mapInPandas schema/batch shape, explode of
per-frame rows — is the real production shape either way.

Scale shape: every stage is a narrow mapInPandas over the blob column —
no shuffle; executors stream Arrow record batches through Python
workers. Blob columns ride in Parquet as ``binary``; at 100 TB you
partition by content hash prefix and let ``maxPartitionBytes`` bound the
per-task batch memory (blobs >> metadata, so keep metadata in separate
pruned-scan-friendly columns — exactly the layout used here).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mcp_rag_server_spark.catalog import load_table
from mcp_rag_server_spark.registry import register

#: Deterministic fake-decoder geometry (pure functions of byte length,
#: mirrored in the SQL oracles below).
FAKE_W_MOD, FAKE_H_MOD, FAKE_FRAME_MOD = 640, 480, 100
FRAME_STRIDE = 7  # sample every 7th frame

ImageDecoder = Callable[[bytes], dict]


def fake_image_decoder(blob: bytes) -> dict:
    """STUB decoder (no image libs in this container): deterministic
    metadata from byte length. Real deployments inject a PIL-backed
    decoder with the same dict contract."""
    n = len(blob)
    return {
        "byte_len": n,
        "width": 1 + n % FAKE_W_MOD,
        "height": 1 + (n * 7) % FAKE_H_MOD,
        "channels": 3,
    }


def pil_image_decoder(blob: bytes) -> dict:  # pragma: no cover - env-dep
    """Real decode path, gated: raises NotImplementedError without PIL."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "PIL is not installed; inject a decoder or use fake_image_decoder"
        ) from e
    im = Image.open(io.BytesIO(blob))
    return {
        "byte_len": len(blob),
        "width": im.width,
        "height": im.height,
        "channels": len(im.getbands()),
    }


IMAGE_META_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, channels int"
)


def decode_image_meta(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    decoder: ImageDecoder = fake_image_decoder,
) -> DataFrame:
    """(id, binary) → typed image metadata via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            metas = [decoder(x) for x in b[blob_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", b[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


@register(
    "mm_image_meta",
    oracle=f"""
SELECT doc_id,
       -- encode(), not CAST AS BLOB: the cast REJECTS non-ASCII text
       -- in DuckDB while Spark's encode happily emits the UTF-8 bytes
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       CAST(1 + octet_length(encode(text)) % {FAKE_W_MOD} AS INTEGER) AS width,
       CAST(1 + (octet_length(encode(text)) * 7) % {FAKE_H_MOD} AS INTEGER) AS height,
       3 AS channels
FROM documents
-- a NULL blob cannot be decoded (len(None) in the Python worker)
WHERE text IS NOT NULL
ORDER BY doc_id
""",
    description="binary image column → typed metadata via mapInPandas"
    " (deterministic fake decoder with a SQL twin)",
    tags=("multimodal", "mapInPandas"),
)
def mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture blobs = utf-8 bytes of documents.text (no image files in
    the testdata); the decode stage is the production mapInPandas shape."""
    docs = (
        load_table(spark, sf_dir, "documents")
        # a NULL blob cannot be decoded — mirrors the oracle's WHERE
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    )
    return decode_image_meta(docs).orderBy("doc_id")


def sample_frames(
    meta: DataFrame, n_frames_col: str = "n_frames", stride: int = FRAME_STRIDE
) -> DataFrame:
    """Frame sampling plan: explode every ``stride``-th frame index —
    0, stride, 2*stride, … < n_frames. Pure SQL explode; the per-frame
    decode would be a downstream mapInPandas on (blob, frame_idx)."""
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col(n_frames_col) - 1,
                F.lit(stride),
            )
        ).alias("frame_idx"),
    )


@register(
    "mm_frame_sample",
    oracle=f"""
WITH v AS (
  -- encode(), not CAST AS BLOB: the cast rejects non-ASCII in DuckDB
  SELECT doc_id,
         1 + octet_length(encode(text)) % {FAKE_FRAME_MOD} AS n_frames
  FROM documents
)
SELECT doc_id, CAST(unnest(range(0, n_frames, {FRAME_STRIDE})) AS INTEGER) AS frame_idx
FROM v
ORDER BY doc_id, frame_idx
""",
    description="video frame-sampling plan: every k-th frame index exploded"
    " (fake frame count from blob bytes)",
    tags=("multimodal", "video"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = docs.select(
        "doc_id",
        (1 + F.octet_length(F.encode("text", "UTF-8")) % FAKE_FRAME_MOD).alias(
            "n_frames"
        ),
    )
    return (
        sample_frames(meta)
        .select("doc_id", F.col("frame_idx").cast("int").alias("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    )


#: Audio fake-decode geometry: blob bytes ARE the PCM samples (uint8),
#: windowed like the chunker (size/stride), features per window.
AUDIO_WIN = 64
AUDIO_HOP = 32


def audio_window_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """(id, binary) → per-window audio features via mapInPandas: RMS and
    peak over uint8 samples, windows of AUDIO_WIN every AUDIO_HOP (the
    short-time-energy shape used for VAD / silence trimming). Real
    deployments swap np.frombuffer for a librosa/soundfile decode with
    the same (doc_id, win_idx, n_samples, peak, rms) contract."""
    import math

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"doc_id": [], "win_idx": [], "n_samples": [], "peak": [], "rms": []}
            for doc_id, blob in zip(b[id_col], b[blob_col]):
                x = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
                n = len(x)
                for wi, st in enumerate(range(0, n, AUDIO_HOP)):
                    win = x[st : st + AUDIO_WIN]
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(wi)
                    out["n_samples"].append(len(win))
                    out["peak"].append(int(win.max()))
                    out["rms"].append(
                        round(math.sqrt(float((win * win).sum()) / len(win)), 4)
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        run, schema="doc_id bigint, win_idx int, n_samples int, peak int, rms double"
    )


@register(
    "mm_audio_windows",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> ascii(substring(text, CAST(i AS INT), 1))) AS samp
  FROM documents
  -- ASCII gate: the fake decoders read UTF-8 BYTES while the SQL
  -- twins read ascii() CODEPOINTS — identical only for pure-ASCII
  -- text, so the documented assumption is enforced, not assumed
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
),
w AS (
  SELECT doc_id, CAST(wi AS INT) AS win_idx,
         list_slice(samp, CAST(wi * {AUDIO_HOP} + 1 AS INT),
                    CAST(wi * {AUDIO_HOP} + {AUDIO_WIN} AS INT)) AS win
  FROM (SELECT doc_id, samp,
               unnest(range(0, CAST(floor((len(samp) - 1) / {AUDIO_HOP}) + 1
                                    AS BIGINT))) AS wi
        FROM s)
)
SELECT doc_id, win_idx,
       CAST(len(win) AS INT) AS n_samples,
       CAST(list_max(win) AS INT) AS peak,
       round(sqrt(CAST(list_sum(list_transform(win, v -> v * v)) AS DOUBLE)
                  / len(win)), 4) AS rms
FROM w
ORDER BY doc_id, win_idx
""",
    description="audio binary column → short-time energy features (windowed"
    " RMS/peak) via mapInPandas — the VAD/silence-trim primitive; fake"
    " decode reads blob bytes as uint8 PCM, mirrored exactly in SQL"
    " (fixture text is ASCII, so bytes == ascii codes)",
    tags=("multimodal", "audio", "mapInPandas"),
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window count = floor((n-1)/hop)+1 (same census as the text chunker
    with size=AUDIO_WIN, stride=AUDIO_HOP); RMS midpoint-rounding is safe
    because non-constant windows give irrational RMS and constant windows
    give exact small-denominator rationals, neither of which sits on a
    4-decimal rounding midpoint. Narrow end-to-end: scan → Arrow batches
    → explode inside Python — no shuffle before the presentation sort."""
    # ASCII gate — the fake PCM decode's contract (see the oracle note)
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
    )
    blobs = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return audio_window_features(blobs).orderBy("doc_id", "win_idx")


#: Perceptual-hash geometry: 64 sample points → 64-bit aHash carried as
#: PH_BANDS band values of PH_BW bits each. The banding IS the LSH, and
#: its pigeonhole guarantee is exact only below the band count: d <
#: PH_BANDS flipped bits cannot touch every band, so candidate recall
#: is COMPLETE for hamming ≤ PH_BANDS−1 = 3 and PROBABILISTIC for
#: 4..PH_HAMMING_MAX (a pair differing by exactly one bit per band is
#: missed — tests/test_blocking_properties.py pins both the guarantee
#: and that boundary counterexample). This is the standard
#: Hamming-LSH trade (cf. the SimHash dedup literature): more/narrower
#: bands widen the complete radius but coarsen the buckets — an 8×8
#: variant measured here blew candidate fan-in up 7× on this corpus —
#: and dd_lsh_band_audit measures exactly this dial for MinHash.
PH_POINTS = 64
PH_BANDS = 4
PH_BW = 16  # bits per band; PH_BANDS * PH_BW == PH_POINTS
PH_HAMMING_MAX = 6
PH_TOP = 15

_PH_COLS = [f"b{j}" for j in range(PH_BANDS)]
PHASH_SCHEMA = "doc_id bigint, " + ", ".join(f"{c} int" for c in _PH_COLS)


def fake_phash(blob: bytes) -> list[int]:
    """STUB perceptual hash (no image libs): average-hash over 64 bytes
    sampled evenly from the blob — bit_i = sample_i > mean(samples),
    packed into PH_BANDS little-endian PH_BW-bit bands. A real
    deployment decodes pixels, downsamples to 8x8 luma, and applies the
    identical bit = px > mean rule (the classic aHash); the arithmetic
    after 'decode' is byte-for-byte what runs here."""
    n = len(blob)
    v = [blob[(i * n) // PH_POINTS] for i in range(PH_POINTS)]
    mean = sum(v) / float(PH_POINTS)
    bands = []
    for j in range(PH_BANDS):
        acc = 0
        for k in range(PH_BW):
            if v[PH_BW * j + k] > mean:
                acc |= 1 << k
        bands.append(acc)
    return bands


def phash_bands(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """(id, binary) → (id, b0..b3) via mapInPandas (the decode stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [fake_phash(x) for x in b[blob_col]]
            out = pd.DataFrame(rows, columns=_PH_COLS)
            out.insert(0, "doc_id", b[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=PHASH_SCHEMA)


_PH_HAM_SQL = " + ".join(
    f"bit_count(xor(ba[{j + 1}], bb[{j + 1}]))" for j in range(PH_BANDS)
)


@register(
    "mm_phash_neardup",
    oracle=f"""
WITH samp AS (
  SELECT doc_id,
         list_transform(range(0, {PH_POINTS}),
           i -> ascii(substr(text,
                 1 + CAST(floor(i * length(text) / {PH_POINTS}.0) AS INT),
                 1))) AS v
  FROM documents
  -- ASCII gate: the fake decoders read UTF-8 BYTES while the SQL
  -- twins read ascii() CODEPOINTS — identical only for pure-ASCII
  -- text, so the documented assumption is enforced, not assumed
  WHERE length(text) >= {PH_POINTS}
    AND octet_length(encode(text)) = length(text)
),
ph AS (
  SELECT doc_id,
         list_transform(range(0, {PH_BANDS}), j ->
           CAST(list_sum(list_transform(range(0, {PH_BW}),
             k -> CASE WHEN v[{PH_BW}*j + k + 1] > list_sum(v) / {PH_POINTS}.0
                       THEN CAST(pow(2.0, k) AS BIGINT) ELSE 0 END))
                AS BIGINT)) AS b
  FROM samp
),
bands AS (
  SELECT doc_id, b, j, b[j+1] AS val FROM ph, unnest(range(0, {PH_BANDS})) AS t(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.b AS ba, b.b AS bb
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.val = b.val AND a.doc_id < b.doc_id
),
ham AS (
  SELECT da, db, {_PH_HAM_SQL} AS hamming
  FROM cand
)
SELECT da, db, CAST(hamming AS INT) AS hamming,
       hamming <= {PH_HAMMING_MAX} AS is_near
FROM ham
ORDER BY hamming ASC, da ASC, db ASC
LIMIT {PH_TOP}
""",
    description="perceptual-hash near-duplicate detection over binary"
    " blobs: 64-bit aHash computed in the mapInPandas decode stage"
    " (deterministic fake with a SQL twin), 4x16-bit Hamming-LSH"
    " banding (candidate recall complete for distance <= 3,"
    " probabilistic to the verify threshold 6 — property-tested with"
    " the boundary counterexample), bit_count XOR verify on"
    " bucket-mates only — image near-dup at corpus scale with no"
    " all-pairs stage",
    tags=("multimodal", "dedup", "mapInPandas", "lsh"),
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The content-level near-dup pass for media: dd_* families hash
    TEXT; this hashes the BLOB through the decode boundary. The recall
    contract is stated EXACTLY: hamming ≤ 3 < PH_BANDS flips cannot
    touch all 4 bands, so those pairs are caught with certainty; for
    distances 4..6 a pair spreading its differences one-per-band can be
    missed (the property suite constructs that counterexample — an
    earlier revision of this operator claimed completeness at 6 and was
    falsified by it). The same suite shows the complete-at-6
    alternatives and why they lose: 8×8-bit bands are complete to 7 but
    coarsen buckets ~7× on this corpus, band-PAIR keys are complete to
    6 but push real near-pairs past the threshold once the hash has
    honest entropy — probabilistic-above-a-floor with a cheap verify is
    the standard Hamming-LSH operating point (SimHash dedup
    literature), and dd_lsh_band_audit exists precisely to measure that
    dial. Scale: hash is a narrow Arrow pass; the join is keyed by
    (band, value) — fan-in is Σ bucket², controlled by band width;
    verify is integer XOR popcount. Spark computes bands in Python (the
    production decode shape); the oracle derives identical bands from
    the ASCII bytes, so the driver hash pins the decode arithmetic AND
    the LSH+verify plumbing."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") >= PH_POINTS)
        # ASCII gate — codepoint/byte identity the hash twin relies on
        & (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
    )
    blobs = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    ph = phash_bands(blobs)
    bands = ph.select(
        "doc_id",
        *_PH_COLS,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"), F.col(f"b{j}").alias("val")
                )
                for j in range(PH_BANDS)
            ])
        ).alias("bv"),
    ).select("doc_id", *_PH_COLS, "bv.j", "bv.val")
    right = bands.select(
        F.col("doc_id").alias("db"),
        *[F.col(f"b{j}").alias(f"c{j}") for j in range(PH_BANDS)],
        F.col("j").alias("rj"),
        F.col("val").alias("rval"),
    )
    cand = (
        bands.join(
            right,
            (F.col("j") == F.col("rj"))
            & (F.col("val") == F.col("rval"))
            & (F.col("doc_id") < F.col("db")),
        )
        .select(
            F.col("doc_id").alias("da"),
            "db",
            *_PH_COLS,
            *[f"c{j}" for j in range(PH_BANDS)],
        )
        .distinct()
    )
    hamming = sum(
        F.expr(f"bit_count(b{j} ^ c{j})") for j in range(PH_BANDS)
    )
    return (
        cand.select(
            "da",
            "db",
            hamming.cast("int").alias("hamming"),
        )
        .withColumn("is_near", F.col("hamming") <= PH_HAMMING_MAX)
        .orderBy(F.asc("hamming"), F.asc("da"), F.asc("db"))
        .limit(PH_TOP)
    )


#: Resize target: every image downsampled to a RS_T×RS_T thumbnail
#: (nearest-neighbor) regardless of source dimensions.
RS_T = 4


def fake_resize(blob: bytes) -> dict:
    """STUB resize (no image libs): the fake 'image' is byte_len-derived
    W×H with pixel(x, y) = blob[(y*W + x) % len] (the same
    byte-arithmetic family as fake_image_decoder); nearest-neighbor
    downsample to RS_T×RS_T and an exact integer checksum of the
    thumbnail. A PIL deployment swaps in Image.resize with the same
    dict contract — the Arrow plumbing, schema, and per-row shape are
    the production path either way."""
    n = len(blob)
    w = 1 + n % FAKE_W_MOD
    h = 1 + (n * 7) % FAKE_H_MOD
    acc = 0
    for ty in range(RS_T):
        for tx in range(RS_T):
            x = (tx * w) // RS_T
            y = (ty * h) // RS_T
            acc += blob[(y * w + x) % n]
    return {
        "orig_w": w,
        "orig_h": h,
        "new_w": RS_T,
        "new_h": RS_T,
        "thumb_sum": acc,
    }


RESIZE_SCHEMA = (
    "doc_id bigint, orig_w int, orig_h int, new_w int, new_h int,"
    " thumb_sum bigint"
)


def resize_images(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """(id, binary) → resize metadata + thumbnail checksum via
    mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [fake_resize(x) for x in b[blob_col]]
            out = pd.DataFrame(rows)
            out.insert(0, "doc_id", b[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=RESIZE_SCHEMA)


@register(
    "mm_image_resize",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, text,
         octet_length(encode(text)) AS n,
         1 + octet_length(encode(text)) % {FAKE_W_MOD} AS w,
         1 + (octet_length(encode(text)) * 7) % {FAKE_H_MOD} AS h
  FROM documents
  -- ASCII gate: the fake decoders read UTF-8 BYTES while the SQL
  -- twins read ascii() CODEPOINTS — identical only for pure-ASCII
  -- text, so the documented assumption is enforced, not assumed
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
)
SELECT doc_id,
       CAST(w AS INTEGER) AS orig_w,
       CAST(h AS INTEGER) AS orig_h,
       {RS_T} AS new_w,
       {RS_T} AS new_h,
       CAST(list_sum(list_transform(range(0, {RS_T * RS_T}), i ->
         ascii(substr(text,
           (((i // {RS_T}) * h // {RS_T}) * w
            + ((i % {RS_T}) * w // {RS_T})) % n + 1, 1))))
        AS BIGINT) AS thumb_sum
FROM dims
ORDER BY doc_id
""",
    description="image resize through the decode boundary: deterministic"
    f" fake W×H pixel grid nearest-neighbor downsampled to {RS_T}x{RS_T}"
    " in mapInPandas, with an exact thumbnail checksum the SQL twin"
    " re-derives byte-for-byte — the resize stage of every multimodal"
    " preprocessing pipeline (decode/feature/frame-sample siblings"
    " above), Arrow-batched and shuffle-free",
    tags=("multimodal", "mapInPandas", "resize"),
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize: thumb(tx, ty) = px(tx·W//T, ty·H//T) —
    integer-exact in both engines (the corpus is ASCII — checked by
    the phash oracle family too — so the oracle reads each sampled
    byte as ascii(substr(text, k+1, 1)), the char code being the
    byte). The checksum makes the WHOLE
    thumbnail hash-checked: any off-by-one in the sampling grid, the
    byte indexing, or the batch plumbing flips it. Plan: one narrow
    Arrow pass, no shuffle before the presentation sort — resizing a
    100 TB image corpus is exactly this plan with a PIL decoder
    injected."""
    # ASCII gate — the byte-indexed thumbnail sampling's contract
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
    )
    blobs = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return resize_images(blobs).orderBy("doc_id")


#: Scene-cut fake-decode geometry: blob bytes are uint8 "pixels",
#: FRAME_LEN consecutive bytes form a frame, frame energy is the mean
#: byte value. The jump threshold sits at ~p95 of the fixture's
#: frame-to-frame deltas (probed: p90 5.7 / p99 12.3 / max 29.6), so
#: cuts are rare-but-present — non-degenerate in both directions.
SCENE_FRAME_LEN = 32
SCENE_CUT_THRESHOLD = 8.0


def scene_cut_stats(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """(id, binary) → per-video scene-cut census via mapInPandas: frame
    energies (mean uint8 per FRAME_LEN block), absolute first
    differences, cuts where the jump exceeds SCENE_CUT_THRESHOLD.
    Real deployments swap the byte-block energy for a decoded-frame
    histogram/SSIM delta with the same contract. Energies are exact
    dyadic rationals (Σbytes / 32), so every derived value is
    bit-identical to the SQL twin regardless of summation order."""
    import math

    import numpy as np

    def r4(x: float) -> float:
        # SQL round() is half-AWAY-from-zero; Python round() is
        # half-even, and the dyadic energies here hit exact .xxxx5
        # boundaries constantly (k/32 values) — floor(x*1e4 + 0.5) is
        # the half-away form for the non-negative values in play.
        return math.floor(x * 10000.0 + 0.5) / 10000.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "doc_id": [],
                "n_frames": [],
                "n_cuts": [],
                "max_jump": [],
                "mean_energy": [],
            }
            for doc_id, blob in zip(b[id_col], b[blob_col]):
                x = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
                n_full = len(x) // SCENE_FRAME_LEN
                rem = len(x) % SCENE_FRAME_LEN
                energies = []
                for fi in range(n_full + (1 if rem else 0)):
                    blk = x[fi * SCENE_FRAME_LEN:(fi + 1) * SCENE_FRAME_LEN]
                    energies.append(float(blk.sum()) / len(blk))
                e = np.array(energies)
                jumps = np.abs(np.diff(e))
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(e))
                out["n_cuts"].append(int((jumps > SCENE_CUT_THRESHOLD).sum()))
                out["max_jump"].append(
                    r4(float(jumps.max())) if len(jumps) else None
                )
                out["mean_energy"].append(r4(float(e.mean())))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        run,
        schema="doc_id bigint, n_frames int, n_cuts int,"
        " max_jump double, mean_energy double",
    )


_SCENE_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> ascii(substring(text, CAST(i AS INT), 1))) AS samp
  FROM documents
  -- ASCII gate: the fake decoders read UTF-8 BYTES while the SQL
  -- twins read ascii() CODEPOINTS — identical only for pure-ASCII
  -- text, so the documented assumption is enforced, not assumed
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
),
fr AS (
  SELECT doc_id, fi,
         CAST(list_sum(list_slice(samp, CAST(fi * {SCENE_FRAME_LEN} + 1 AS INT),
                             CAST(fi * {SCENE_FRAME_LEN} + {SCENE_FRAME_LEN}
                                  AS INT))) AS DOUBLE)
           / len(list_slice(samp, CAST(fi * {SCENE_FRAME_LEN} + 1 AS INT),
                            CAST(fi * {SCENE_FRAME_LEN} + {SCENE_FRAME_LEN}
                                 AS INT))) AS e
  FROM (SELECT doc_id, samp,
               unnest(range(0, CAST(floor((len(samp) - 1)
                                          / {SCENE_FRAME_LEN}) + 1
                                    AS BIGINT))) AS fi
        FROM s)
),
d AS (
  SELECT doc_id, fi, e,
         abs(e - lag(e) OVER (PARTITION BY doc_id ORDER BY fi)) AS j
  FROM fr
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_frames,
       CAST(COUNT(CASE WHEN j > {SCENE_CUT_THRESHOLD} THEN 1 END) AS INT)
         AS n_cuts,
       round(MAX(j), 4) AS max_jump,
       round(CAST(SUM(e) AS DOUBLE) / COUNT(*), 4) AS mean_energy
FROM d
GROUP BY doc_id
ORDER BY doc_id
"""


@register(
    "mm_scene_cuts",
    oracle=_SCENE_ORACLE,
    description="video scene-cut detection census: per-blob frame"
    " energies (deterministic fake decode over byte blocks),"
    " frame-to-frame jumps, cuts above the ~p95 threshold — the"
    " frame-sampling-for-training preprocessing that picks which"
    " frames of 100 TB of video are worth embedding",
    tags=("multimodal", "video", "quality"),
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut sampling beats every-k-th-frame sampling for training
    data: frames inside a shot are near-duplicates, so the cut census
    is the dedup map of a video. The Spark side is the production
    plumbing — a narrow mapInPandas over the binary column (no
    shuffle; Arrow batches in, 5-column census out), real codec
    swappable behind the same contract. The byte-block energies are
    exact dyadics (Σ/32), making the numpy path and the DuckDB
    window-lag twin bit-identical without an ordering convention.
    The threshold sits at ~p95 of the fixture's jump distribution
    (probed before registration), so cuts exist without firing
    everywhere."""
    # ASCII gate — the fake byte-block energy's contract
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.octet_length(F.encode("text", "UTF-8")) == F.length("text"))
    )
    blobs = docs.select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    return scene_cut_stats(blobs).orderBy("doc_id")
