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

    # ~1.5 KB per distinct token at dim 384 — cap so an open-vocabulary
    # corpus (ids, hashes, typos) can't grow a long-lived actor past a few
    # hundred MB (same guard as the dedup/textops token caches)
    CACHE_MAX = 200_000

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _token_vec(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            if len(self._cache) > self.CACHE_MAX:
                self._cache.clear()
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
            if t is None:
                out[i] = 0.0  # NULL text = no content -> zero vector,
                # like empty text (str(None) would embed the WORD "none")
            else:
                out[i] = self.embed_one(t if isinstance(t, str) else str(t))
        return out


class OnnxEmbedder:
    """Real sentence-transformer via onnxruntime, behind the ``onnx`` flag
    (the SURVEY §2 T1 promise: same interface as :class:`HashEmbedder`).

    Loads ``model.onnx`` + ``tokenizer.json`` from ``model_dir`` once per
    instance (i.e. once per actor — fixing the reference's per-call rebuild,
    ``lance_indexer.rs:61,115``) and embeds in true batches (the reference
    runs ONNX with batch dim 1, ``embeddings.rs:35-37``). Mean-pool over the
    attention mask + L2-normalize, exactly ``embeddings.rs:61-91``.

    onnxruntime/tokenizers are not installed in this sandbox and no model
    can be downloaded, so construction raises a clear RuntimeError here; the
    class is the drop-in real path for deployments that ship the model.
    """

    def __init__(self, model_dir: str | None, dim: int = EMBED_DIM,
                 max_tokens: int = MAX_TOKENS):
        if not model_dir:
            raise RuntimeError(
                "OnnxEmbedder needs model_dir (or SEMA_RAY_ONNX_DIR) "
                "containing model.onnx + tokenizer.json")
        try:
            import onnxruntime  # noqa: F401
            from tokenizers import Tokenizer
        except ImportError as e:  # sandbox: no ML runtime — hash backend only
            raise RuntimeError(
                "onnx embedder backend requires onnxruntime + tokenizers "
                f"(not available: {e}); use backend='hash'") from e
        import os
        self.dim = dim
        self.max_tokens = max_tokens
        self.tokenizer = Tokenizer.from_file(
            os.path.join(model_dir, "tokenizer.json"))
        self.tokenizer.enable_truncation(max_length=max_tokens)
        self.tokenizer.enable_padding()
        self.session = onnxruntime.InferenceSession(
            os.path.join(model_dir, "model.onnx"),
            providers=["CPUExecutionProvider"])

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), dtype=np.float32)
        enc = self.tokenizer.encode_batch(
            ["" if t is None else (t if isinstance(t, str) else str(t))
             for t in texts])
        ids = np.array([e.ids for e in enc], dtype=np.int64)
        mask = np.array([e.attention_mask for e in enc], dtype=np.int64)
        out = self.session.run(None, {
            "input_ids": ids,
            "attention_mask": mask,
            "token_type_ids": np.zeros_like(ids),
        })[0]  # [n, seq, dim] token embeddings
        m = mask[:, :, None].astype(np.float32)
        pooled = (out * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-9)
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (pooled / norms).astype(np.float32)

    def embed_one(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]


def make_embedder(backend: str | None = None, dim: int = EMBED_DIM,
                  model_dir: str | None = None):
    """Embedder factory: ``hash`` (default, deterministic) or ``onnx`` (real
    model). Resolution order: explicit arg > ``SEMA_RAY_EMBEDDER`` env var >
    hash."""
    import os
    backend = backend or os.environ.get("SEMA_RAY_EMBEDDER", "hash")
    if backend == "hash":
        return HashEmbedder(dim)
    if backend == "onnx":
        return OnnxEmbedder(
            model_dir or os.environ.get("SEMA_RAY_ONNX_DIR"), dim)
    raise ValueError(f"unknown embedder backend {backend!r} "
                     "(expected 'hash' or 'onnx')")


class EmbedStage:
    """Actor-pool map_batches stage: adds a ``vector`` list<float32> column.

    Use as ``ds.map_batches(EmbedStage, fn_constructor_kwargs={"text_col": c},
    batch_format="pyarrow", concurrency=N, batch_size=B)``. Model state is
    built once per actor (fixing reference ``lance_indexer.rs:61``); pass
    ``backend="onnx"`` to host the real model (:func:`make_embedder`).
    """

    def __init__(self, text_col: str = "text", out_col: str = "vector",
                 dim: int = EMBED_DIM, backend: str | None = None,
                 model_dir: str | None = None):
        self.embedder = make_embedder(backend, dim, model_dir)
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
