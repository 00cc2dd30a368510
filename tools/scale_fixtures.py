"""Synthesize a 10x (sf1-equivalent) documents + embeddings corpus for
the candidate-mass scale proof (VERDICT r11 ask #5).

The driver ships fixtures only up to sf0.1 (5,000 docs / 2,000 vectors),
so the 10x point is synthesized here with the SAME generative structure
observed in the driver fixtures (profiled 2026-08-16 against
/root/testdata/sf0.1):

- documents: 10-100 tokens/doc uniform over a 30-word vocabulary
  (uniform token draw — the fixture's top-29 tokens all sit within 1%
  of each other); lang 'en' ~40% / 4 others ~15% each; 20 sources;
  ~5% of docs are near-dup copies of an earlier doc (verbatim copy,
  half of them with a ' dup' marker suffix — matching the fixture's
  250 'dup'-carrying docs and 215 shared-15-token-prefix groups per
  5,000), a handful exact (8 exact-dup md5 groups per 5,000).
- embeddings: 64-dim unit vectors in 10 ~equal cells ('label'), each
  cell a weak Gaussian cluster (centroid direction norm ~0.07,
  per-component within-cluster std ~0.125 = 1/sqrt(64)).

Everything is seeded (numpy default_rng) — two runs produce identical
parquet.  Output lands OUTSIDE the repo (default /tmp/scale_sf1);
/root/testdata is read-only and never touched.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window", "zone",
]
LANGS = ["en", "zh", "es", "fr", "de"]


def gen_documents(n_docs: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for i in range(n_docs):
        # ~5% near-dup copies of an earlier doc (the fixture's planted
        # rate), only once a pool exists; 1 in 32 of the copies exact
        if i > 50 and rng.random() < 0.05:
            j = int(rng.integers(0, i))
            t = texts[j]
            if rng.random() < 0.5:
                t = t + " dup"
            texts.append(t)
        else:
            n = int(rng.integers(10, 101))
            toks = rng.choice(VOCAB, size=n)
            texts.append(" ".join(toks))
        langs.append("en" if rng.random() < 0.4 else LANGS[1 + int(rng.integers(0, 4))])
        sources.append(f"src{int(rng.integers(0, 20))}")
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n_vecs: int, dim: int = 64, n_cells: int = 10, seed: int = 43) -> pa.Table:
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents = 0.07 * cents / np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, n_cells, size=n_vecs)
    vecs = cents[labels] + 0.125 * rng.standard_normal((n_vecs, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def generate(out_dir: str, n_docs: int, n_vecs: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(gen_documents(n_docs), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs), os.path.join(out_dir, "embeddings.parquet"))


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    generate(out, n_docs=int(5000 * scale), n_vecs=int(2000 * scale))
    print(f"wrote {out} (docs={int(5000 * scale)}, vecs={int(2000 * scale)})")
