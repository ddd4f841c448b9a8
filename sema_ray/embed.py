"""Deterministic embedding stage with the reference embedder's interface.

Reference: ``/root/reference/src/semantic/embeddings.rs`` — MiniLM via ONNX:
tokenize, truncate to 256 tokens, run model, mean-pool over the attention
mask, L2-normalize, dim 384. No model download is possible in this sandbox,
so the default implementation is a *hash-projection* embedder with the exact
same interface and output contract (text -> unit-norm float32[384]; token
truncation at 256; mean-pool; L2-norm — ``embeddings.rs:61-91`` semantics),
deterministic across processes and partitionings. A real ONNX model can be
dropped in behind the same class without touching the pipeline.

Two structural fixes over the reference, by construction (SURVEY.md §2 T1):
the model state lives in the actor's ``__init__`` (the reference rebuilds the
model per indexing call and per query, ``lance_indexer.rs:61,115``), and
texts are embedded in vectorized batches (the reference runs ONNX with batch
dim 1, ``embeddings.rs:35-37``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from . import EMBED_DIM

MAX_TOKENS = 256  # reference MAX_LENGTH, embeddings.rs:7
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _token_seed(token: str) -> int:
    d = hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big")


class HashEmbedder:
    """Deterministic text -> unit-norm float32[EMBED_DIM] embedder.

    Per-token vectors are pseudo-random unit-variance Gaussians seeded by a
    content hash of the token; a text embedding is the mean over its first
    MAX_TOKENS tokens, L2-normalized (mean-pool + normalize exactly as
    ``embeddings.rs:61-91``). Similar token multisets => high cosine.
    The token-vector cache is per-instance state, amortized across batches
    when hosted in a map_batches actor.
    """

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _token_vec(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            rng = np.random.default_rng(_token_seed(token))
            v = rng.standard_normal(self.dim).astype(np.float32)
            self._cache[token] = v
        return v

    def embed_one(self, text: str) -> np.ndarray:
        tokens = _TOKEN_RE.findall(text.lower())[:MAX_TOKENS]
        if not tokens:
            return np.zeros(self.dim, dtype=np.float32)
        acc = np.zeros(self.dim, dtype=np.float64)
        for t in tokens:
            acc += self._token_vec(t)
        acc /= len(tokens)  # mean-pool (mask all-ones), embeddings.rs:61-81
        norm = float(np.sqrt((acc * acc).sum()))
        if norm > 0.0:
            acc /= norm  # L2-normalize, embeddings.rs:83-90
        return acc.astype(np.float32)

    def embed_batch(self, texts: list[str] | np.ndarray) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i] = self.embed_one(t if isinstance(t, str) else str(t))
        return out


class EmbedStage:
    """Actor-pool map_batches stage: adds a ``vector`` list<float32> column.

    Use as ``ds.map_batches(EmbedStage, fn_constructor_kwargs={"text_col": c},
    batch_format="pyarrow", concurrency=N, batch_size=B)``. Model state is
    built once per actor (fixing reference ``lance_indexer.rs:61``).
    """

    def __init__(self, text_col: str = "text", out_col: str = "vector",
                 dim: int = EMBED_DIM):
        self.embedder = HashEmbedder(dim)
        self.text_col = text_col
        self.out_col = out_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        vecs = self.embedder.embed_batch(texts)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), self.dim
        )
        return batch.append_column(self.out_col, arr)


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cosine similarity of row-sets a [n,d] and b [m,d] -> [n,m] float64.

    For unit-norm inputs this is a plain matmul (cosine == dot, SURVEY §1.1).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    an = np.linalg.norm(a, axis=1, keepdims=True)
    bn = np.linalg.norm(b, axis=1, keepdims=True)
    an[an == 0] = 1.0
    bn[bn == 0] = 1.0
    return (a / an) @ (b / bn).T
