"""Benchmark dataset IO and generators.

Readers for the standard ANN benchmark formats (fvecs/ivecs/bvecs — the
formats SIFT-1M and GIST ship in) and seeded synthetic corpus generators
matching the benchmark configs in BASELINE.md (SIFT-like, GloVe-like,
Cohere-like).  The reference has no dataset loader of its own (benchmarks
run through Postgres), so this subsystem is new surface for the TPU build.
"""

from __future__ import annotations

import numpy as np


def read_fvecs(path: str, max_rows: int | None = None) -> np.ndarray:
    """Read an .fvecs file: [int32 dim, dim × float32] per row."""
    raw = np.fromfile(path, dtype=np.int32, count=-1)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.float32)
    d = int(raw[0])
    row_words = d + 1
    n = raw.size // row_words
    if max_rows is not None:
        n = min(n, max_rows)
    mat = raw[: n * row_words].reshape(n, row_words)
    if not (mat[:, 0] == d).all():
        raise ValueError(f"inconsistent dims in fvecs file {path}")
    return mat[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, max_rows: int | None = None) -> np.ndarray:
    """Read an .ivecs file (ground-truth neighbor ids)."""
    raw = np.fromfile(path, dtype=np.int32, count=-1)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.int32)
    d = int(raw[0])
    row_words = d + 1
    n = raw.size // row_words
    if max_rows is not None:
        n = min(n, max_rows)
    mat = raw[: n * row_words].reshape(n, row_words)
    return mat[:, 1:].copy()


def read_bvecs(path: str, max_rows: int | None = None) -> np.ndarray:
    """Read a .bvecs file: [int32 dim, dim × uint8] per row."""
    raw = np.fromfile(path, dtype=np.uint8, count=-1)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.float32)
    d = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
    row_bytes = 4 + d
    n = raw.size // row_bytes
    if max_rows is not None:
        n = min(n, max_rows)
    mat = raw[: n * row_bytes].reshape(n, row_bytes)
    return mat[:, 4:].astype(np.float32)


def write_fvecs(path: str, mat: np.ndarray) -> None:
    mat = np.asarray(mat, dtype=np.float32)
    n, d = mat.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = mat.view(np.int32)
    out.tofile(path)


def synthetic_corpus(
    kind: str,
    n: int,
    num_queries: int,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded synthetic stand-ins for the BASELINE.md benchmark configs.

    - ``sift``: 128d, non-negative, clustered (SIFT-like local descriptors)
    - ``glove``: 100d low-rank, for angular/cosine
    - ``cohere``: 768d low-rank (transformer-embedding-like)
    - ``gauss``: iid gaussian (worst case for SBQ)
    """
    rng = np.random.default_rng(seed)
    if kind in ("sift", "glove", "cohere"):
        # Clustered low-rank data with a heavy-tailed cluster-size
        # distribution, an isotropic background component, and queries
        # perturbed from base rows.  Real embedding corpora (GloVe,
        # Cohere, OpenAI) have intrinsic dimensionality ~50-100 and strong
        # non-uniform cluster structure; isotropic rank-d/3 gaussians (the
        # previous generator) have intrinsic dim in the hundreds, where
        # even a brute-force 1-bit Hamming scan + rescore-300 caps
        # recall@10 at ~0.86 and greedy graph ANN degrades for every
        # implementation — an unrepresentative stand-in for BASELINE.md.
        # This design measures (100k, 768d, 1-bit): brute ceiling 0.99 at
        # rescore 300; graph recall 0.88 @ L=100 -> 0.96 @ L=300 —
        # glove-100-angular-like difficulty.
        # SIFT-128: real SIFT descriptors are non-negative local-gradient
        # histograms with intrinsic dimensionality ~15-25 and continuous
        # (not mega-clustered) structure; the previous 256-center/4000-
        # points-per-cluster generator had cluster diameters below the
        # SBQ quantization step, making within-cluster ranking pure noise
        # for EVERY quantized index — unrepresentative of sift-1m-euclidean
        # difficulty.  Same clustered-low-rank machinery, non-negative
        # projection below.
        if kind == "sift":
            d, rank = 128, 24
        else:
            d = 100 if kind == "glove" else 768
            rank = 48 if kind == "glove" else 96
        n_centers = 4096
        noise = 1.2
        bg_frac = 0.3
        basis = rng.standard_normal((rank, d)).astype(np.float32)
        centers = rng.standard_normal((n_centers, rank)).astype(np.float32)
        pop = 1.0 / np.arange(1, n_centers + 1) ** 0.9
        pop /= pop.sum()

        def sample_z(m):
            a = rng.choice(n_centers, size=m, p=pop)
            z = centers[a] + noise * rng.standard_normal((m, rank)).astype(
                np.float32
            )
            bg = rng.random(m) < bg_frac
            z[bg] = np.sqrt(1 + noise**2) * rng.standard_normal(
                (int(bg.sum()), rank)
            ).astype(np.float32)
            return z

        zb = sample_z(n)
        qi = rng.integers(0, max(n, 1), num_queries)
        zq = zb[qi] + noise * rng.standard_normal(
            (num_queries, rank)
        ).astype(np.float32)
        base = (zb @ basis).astype(np.float32)
        queries = (zq @ basis).astype(np.float32)
        if kind == "sift":
            # Non-negative histogram-like range (|.| keeps the cluster
            # geometry: nearby points stay nearby through a 1-Lipschitz
            # map), scaled to SIFT's 0..~160 component range.
            base = np.abs(base) * 25.0
            queries = np.abs(queries) * 25.0
        return base, queries
    if kind == "gauss":
        d = 128
        return (
            rng.standard_normal((n, d)).astype(np.float32),
            rng.standard_normal((num_queries, d)).astype(np.float32),
        )
    raise ValueError(f"unknown synthetic corpus kind {kind!r}")
