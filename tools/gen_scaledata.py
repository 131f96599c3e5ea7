"""Generate scale-curve test data at arbitrary SF.

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
       python tools/gen_scaledata.py --vocab-grow 0.1 0.5 1.0 2

``--vocab-grow`` (VERDICT r9 #1) writes a SECOND documents family under
``.scaledata/zipf/sf{X}/`` whose vocabulary GROWS with SF — word types
drawn Zipf(s=1.07) from a universe scaled by Heaps' law (V ∝ √tokens) —
because the default fixed-vocabulary corpus densifies quadratically:
with the same 919 bigrams at every SF, every doc's TRUE near-duplicate
count grows linearly in SF and the dedup-family scale curves end up
measuring corpus physics, not the plan. On a growing vocabulary the
random cross-doc collision rate FALLS with SF, the planted exact-dup
signal (``_dup_corpus``'s id-shifted copy) stays linear, and a
shuffle-bounded miner should curve near exponent 1. The fixed-vocab
curves stay in BENCH_SCALE.json as the documented densification case;
the zipf curves land in BENCH_SCALE_ZIPF.json
(``tools/bench_scale.py --dir=zipf``).
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


def gen_documents_zipf(sf: float) -> pa.Table:
    """Documents with an SF-GROWING vocabulary (VERDICT r9 #1).

    Universe size follows Heaps' law with β = 0.5 against the corpus
    token count (V₀ = 20,000 types at sf0.1's ~275k tokens → ~89k types
    at sf2's ~5.5M), word draws follow Zipf s = 1.07 over that
    universe. Everything else matches ``gen_documents`` (50k docs/sf,
    10–100 words/doc, lang/source mix, same schema) so the two corpora
    differ ONLY in vocabulary growth — the variable under test."""
    import math

    n = int(round(50_000 * sf))
    rng = np.random.Generator(np.random.PCG64(777))
    v_types = int(round(20_000 * math.sqrt(n / 5_000)))
    ranks = np.arange(1, v_types + 1, dtype=np.float64)
    p = ranks ** -1.07
    p /= p.sum()
    words = np.array([f"w{i:06d}" for i in range(v_types)], dtype=object)
    lens = rng.integers(10, 101, size=n)
    flat = rng.choice(v_types, size=int(lens.sum()), p=p)
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [
        " ".join(words[flat[offs[i]:offs[i + 1]]]) for i in range(n)
    ]
    lang = rng.choice(len(LANGS), size=n, p=LANG_P)
    source = rng.integers(0, 20, size=n)
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


# ---- r5: relational family (same row-count ratios as the driver's
# testdata — customer 150k/sf, orders 1.5M/sf, lineitem ~6M/sf, part
# 200k/sf, supplier 10k/sf, events 1M/sf; nation/region copied from the
# driver, they are fixed dims). Exists so the quality/RFM/skew families
# can be curve-measured: distributions are workload-realistic (key
# cardinalities, FK match rates, date spans), not value-faithful —
# the curve measures TIME, correctness lives in the driver sweeps. ----

_TS0 = np.datetime64("2024-01-01T00:00:00", "us")
_SPAN_DAYS = 150


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, size=n), 2)


def gen_relational(sf: float, d: str) -> None:
    import shutil

    ratio = sf / 0.1
    C = int(round(15_000 * ratio))
    O = int(round(150_000 * ratio))
    P = int(round(20_000 * ratio))
    S = int(round(1_000 * ratio))
    E = int(round(100_000 * ratio))

    rng = np.random.Generator(np.random.PCG64(int(sf * 1000) + 7))

    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
                     "HOUSEHOLD"], dtype=object)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, C + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{k:09d}" for k in range(1, C + 1)]),
        "c_nationkey": pa.array(rng.integers(0, 25, C).astype(np.int32),
                                pa.int32()),
        "c_acctbal": pa.array(_money(rng, -999.99, 9999.99, C)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, C)]),
    }), os.path.join(d, "customer.parquet"))

    o_date = _TS0 + rng.integers(
        0, _SPAN_DAYS * 86_400_000_000, O
    ).astype("timedelta64[us]")
    o_custkey = rng.integers(1, C + 1, O)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, O + 1), pa.int64()),
        "o_custkey": pa.array(o_custkey, pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"], dtype=object)[rng.integers(0, 3, O)]),
        "o_totalprice": pa.array(_money(rng, 850.0, 600_000.0, O)),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            dtype=object)[rng.integers(0, 5, O)]),
    }), os.path.join(d, "orders.parquet"))

    lines = rng.integers(1, 8, O)
    L = int(lines.sum())
    l_orderkey = np.repeat(np.arange(1, O + 1), lines)
    l_linenumber = (np.arange(L)
                    - np.repeat(np.concatenate(([0], np.cumsum(lines)[:-1])),
                                lines) + 1)
    ship = np.repeat(o_date, lines) + rng.integers(
        86_400_000_000, 121 * 86_400_000_000, L
    ).astype("timedelta64[us]")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(1, P + 1, L), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, S + 1, L), pa.int64()),
        "l_linenumber": pa.array(l_linenumber.astype(np.int32), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, L).astype(np.float64)),
        "l_extendedprice": pa.array(_money(rng, 900.0, 100_000.0, L)),
        "l_discount": pa.array(np.round(rng.uniform(0.0, 0.10, L), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0.0, 0.08, L), 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"], dtype=object)[rng.integers(0, 3, L)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"], dtype=object)[rng.integers(0, 2, L)]),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))

    words = np.array(["lavender", "steel", "copper", "misty", "plum",
                      "ivory", "salmon", "azure", "linen", "rosy"],
                     dtype=object)
    types = np.array(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
                      "PROMO"], dtype=object)
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(1, P + 1), pa.int64()),
        "p_name": pa.array([
            f"{words[a]} {words[b]}" for a, b in
            zip(rng.integers(0, 10, P), rng.integers(0, 10, P))]),
        "p_brand": pa.array([
            f"Brand#{i}{j}" for i, j in
            zip(rng.integers(1, 6, P), rng.integers(1, 6, P))]),
        "p_type": pa.array([
            f"{types[a]} {words[b]}" for a, b in
            zip(rng.integers(0, 6, P), rng.integers(0, 10, P))]),
        "p_size": pa.array(rng.integers(1, 51, P).astype(np.int32),
                           pa.int32()),
        "p_retailprice": pa.array(_money(rng, 900.0, 2_000.0, P)),
    }), os.path.join(d, "part.parquet"))

    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(1, S + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{k:09d}" for k in range(1, S + 1)]),
        "s_nationkey": pa.array(rng.integers(0, 25, S).astype(np.int32),
                                pa.int32()),
        "s_acctbal": pa.array(_money(rng, -999.99, 9999.99, S)),
    }), os.path.join(d, "supplier.parquet"))

    U = max(1, int(round(5_000 * ratio)))
    ts = np.sort(rng.integers(0, _SPAN_DAYS * 86_400_000_000, E))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(E), pa.int64()),
        "ts": pa.array(_TS0 + ts.astype("timedelta64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, U, E), pa.int64()),
        "event_type": pa.array(np.array(
            ["view", "click", "signup", "purchase", "error"],
            dtype=object)[rng.integers(0, 5, E)]),
        "value": pa.array(np.round(rng.uniform(0.0, 200.0, E), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, E)]),
    }), os.path.join(d, "events.parquet"))

    for t in ("nation", "region"):
        shutil.copy(os.path.join(DRIVER_SF01, f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"))


def main(sfs: list[float], vocab_grow: bool = False) -> None:
    if vocab_grow:
        for sf in sfs:
            d = os.path.join(OUT, "zipf", f"sf{sf:g}")
            os.makedirs(d, exist_ok=True)
            t = gen_documents_zipf(sf)
            pq.write_table(t, os.path.join(d, "documents.parquet"))
            import math

            v = int(round(20_000 * math.sqrt(round(50_000 * sf) / 5_000)))
            print(f"wrote {d}: {t.num_rows} docs, zipf universe {v} types")
        return
    vocab = driver_vocab()
    for sf in sfs:
        d = os.path.join(OUT, f"sf{sf:g}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(gen_documents(sf, vocab), os.path.join(d, "documents.parquet"))
        pq.write_table(gen_embeddings(sf), os.path.join(d, "embeddings.parquet"))
        gen_relational(sf, d)
        print(f"wrote {d}: {int(round(50_000 * sf))} docs, "
              f"{int(round(20_000 * sf))} embeddings, relational family")


if __name__ == "__main__":
    _args = sys.argv[1:]
    _grow = "--vocab-grow" in _args
    _sfs = [float(a) for a in _args if not a.startswith("-")]
    main(_sfs or [0.1, 0.5, 1.0], vocab_grow=_grow)
