"""Generate scale-curve test data (documents + embeddings) at arbitrary SF.

The driver's testdata tops out at sf0.1 (5,000 documents), which can't
distinguish a near-linear pair-mine from a quadratic one — the whole
point of the 100 TB bar. This generator extends the SAME statistical
shape (measured from /root/testdata/sf0.1: vocabulary drawn from the
driver corpus, 10-100 words/doc, lang mix en 40% / 4×15%, source
src0..19, natural text collisions; embeddings 64-dim unit vectors in 10
label clusters at 0.4 vectors/doc) to larger SFs so the dedup /
similarity / clustering families can be benchmarked on a consistent
family of inputs and their empirical scaling exponents measured
(BENCH_SCALE.json; VERDICT r3 #7).

Deterministic: content is a pure function of (sf, row index) via
numpy PCG64 streams seeded per table — regeneration is byte-stable.
Output lives under .scaledata/ (gitignored): synthetic derived data,
never committed, never written outside the repo.

Usage: python tools/gen_scaledata.py 0.1 0.5 1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, ".scaledata")
DRIVER_SF01 = "/root/testdata/sf0.1"

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
DIM = 64
N_LABELS = 10


def driver_vocab() -> list[str]:
    """The driver corpus vocabulary (sorted for determinism)."""
    t = pq.read_table(
        os.path.join(DRIVER_SF01, "documents.parquet"), columns=["text"]
    )
    words: set[str] = set()
    for s in t["text"].to_pylist():
        words.update(s.split(" "))
    return sorted(w for w in words if w)


def gen_documents(sf: float, vocab: list[str]) -> pa.Table:
    n = int(round(50_000 * sf))
    rng = np.random.Generator(np.random.PCG64(42))
    lens = rng.integers(10, 101, size=n)
    lang = rng.choice(len(LANGS), size=n, p=LANG_P)
    source = rng.integers(0, 20, size=n)
    texts = []
    v = np.asarray(vocab, dtype=object)
    for ln in lens:
        texts.append(" ".join(v[rng.integers(0, len(v), size=ln)]))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i] for i in lang], pa.string()),
            "source": pa.array([f"src{i}" for i in source], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(sf: float) -> pa.Table:
    n = int(round(20_000 * sf))
    rng = np.random.Generator(np.random.PCG64(4242))
    centroids = rng.normal(size=(N_LABELS, DIM))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    vecs = centroids[labels] + 0.45 * rng.normal(size=(n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def main(sfs: list[float]) -> None:
    vocab = driver_vocab()
    for sf in sfs:
        d = os.path.join(OUT, f"sf{sf:g}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(gen_documents(sf, vocab), os.path.join(d, "documents.parquet"))
        pq.write_table(gen_embeddings(sf), os.path.join(d, "embeddings.parquet"))
        print(f"wrote {d}: {int(round(50_000 * sf))} docs, "
              f"{int(round(20_000 * sf))} embeddings")


if __name__ == "__main__":
    main([float(a) for a in sys.argv[1:]] or [0.1, 0.5, 1.0])
