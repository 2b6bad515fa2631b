"""Capability-gated integration tests for the two real external
backends the container lacks: pypdf (PDF text extraction,
reference src/pdf-extractor.ts:160-199) and sentence-transformers
(model embeddings, reference src/embeddings.ts:62-67).

These SKIP (visibly, with a reason) when the library is absent —
documenting the container caveat — and run the real end-to-end path in
an environment that has it. The always-on tests for the same plumbing
use injected deterministic substitutes (tests/test_ingest.py,
tests/test_rag_end_to_end.py); these tests close the remaining gap:
the real library inside the same Arrow/mapInPandas machinery.
"""

from __future__ import annotations

import numpy as np
import pytest

try:
    import pypdf  # noqa: F401

    HAS_PYPDF = True
except ImportError:
    HAS_PYPDF = False

try:
    import sentence_transformers  # noqa: F401

    HAS_ST = True
except ImportError:
    HAS_ST = False


def _minimal_pdf(text: str | None) -> bytes:
    """Hand-assembled single-page PDF with one text op (or none), with a
    correct xref table (offsets computed, not hardcoded)."""
    stream = b"" if text is None else (
        b"BT /F1 12 Tf 72 720 Td (" + text.encode("ascii") + b") Tj ET"
    )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


FILES_SCHEMA = "rel_path string, file_size long, content binary"


@pytest.mark.skipif(
    not HAS_PYPDF,
    reason="pypdf not installed in this container (documented capability "
    "gate, sources/files.py:_default_pdf_extractor)",
)
def test_pdf_extraction_end_to_end(spark):
    """Real pypdf inside the mapInPandas extractor: generated 1-page PDF
    → extracted text → merged with the UTF-8 text branch."""
    from mcp_rag_server_spark.sources.files import decode_text

    pdf = _minimal_pdf("Hello Spark PDF")
    files = spark.createDataFrame(
        [
            ("docs/a.pdf", len(pdf), bytearray(pdf)),
            ("docs/b.txt", 5, bytearray(b"plain")),
        ],
        FILES_SCHEMA,
    )
    out = {r.rel_path: r.text for r in decode_text(files).collect()}
    assert "Hello Spark PDF" in out["docs/a.pdf"]
    assert out["docs/b.txt"] == "plain"


@pytest.mark.skipif(
    not HAS_PYPDF,
    reason="pypdf not installed in this container (documented capability "
    "gate, sources/files.py:_default_pdf_extractor)",
)
def test_pdf_empty_extraction_skips_row(spark):
    """A PDF whose pages yield no text must be dropped, matching the
    reference's empty→skip contract (src/pdf-extractor.ts:189-199,
    src/indexer.ts:267-269)."""
    from mcp_rag_server_spark.sources.files import decode_text

    pdf = _minimal_pdf(None)
    files = spark.createDataFrame(
        [("docs/empty.pdf", len(pdf), bytearray(pdf))], FILES_SCHEMA
    )
    assert decode_text(files).count() == 0


@pytest.mark.skipif(
    not HAS_ST,
    reason="sentence-transformers not installed in this container "
    "(documented capability gate, functions/embedding.py)",
)
def test_sentence_transformer_distributed_matches_direct(spark):
    """The real model through the Arrow pandas_udf path must reproduce a
    driver-side encode of the same 3-sentence golden: mean-pool +
    L2-normalize parity with reference src/embeddings.ts:65."""
    from sentence_transformers import SentenceTransformer

    from mcp_rag_server_spark.functions.embedding import (
        sentence_transformer_embedder,
        with_embedding,
    )

    sents = [
        "the quick brown fox jumps over the lazy dog",
        "distributed dataframes shuffle on their keys",
        "a minimal golden sentence for embedding parity",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sents)], "id long, text string"
    )
    rows = (
        with_embedding(df, embedder=sentence_transformer_embedder())
        .orderBy("id")
        .collect()
    )
    direct = SentenceTransformer(
        "sentence-transformers/all-MiniLM-L6-v2"
    ).encode(sents, normalize_embeddings=True)
    for row, exp in zip(rows, direct):
        v = np.asarray(row.embedding, dtype=np.float32)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3
        # cosine to the driver-side encode; float32 round-trip tolerance
        assert float(np.dot(v, exp)) > 0.999
