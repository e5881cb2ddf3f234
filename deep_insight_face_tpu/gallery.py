"""Gallery matching & verification — the inference serving layer.

Working equivalent of the reference's prediction classes
(reference: deep_insight_face/predictions.py:47-156 — a per-identity
Python loop of ``np.linalg.norm`` / model scores, with a broken
``get_embedding``; SURVEY §2 #13), redesigned around the blocked Pallas
gallery matcher: the whole database is one (N, D) device array and
identification is a single fused matmul+argmax kernel call
(ops/distances.gallery_match).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from deep_insight_face_tpu.ops.distances import (
    gallery_match,
    gallery_scores,
    gallery_topk,
    make_sharded_gallery_match,
    make_sharded_gallery_scores,
    make_sharded_gallery_topk,
)

#: verification thresholds per embedding family
#: (reference: predictions.py:52 siamese 0.3, :104 triplet 0.7)
DEFAULT_THRESHOLDS = {"siamese": 0.3, "triplet": 0.7, "arcface": 0.7}


class FaceGallery:
    """Named embedding database with fused match/verify/identify.

    Pass a ``jax.sharding.Mesh`` to scale past one device: gallery rows
    are sharded over the mesh's model axis (capacity grows with devices),
    queries over the data axis, and identification runs the same fused
    Pallas kernel per shard with a pmax/pmin combine
    (ops/distances.make_sharded_gallery_match; SURVEY §5 long-axis —
    the reference is a one-host numpy loop, predictions.py:74-79,126).
    """

    def __init__(self, embedding_size: int = 128, mesh=None, dtype=None):
        self.embedding_size = embedding_size
        self.mesh = mesh
        # device storage dtype: bfloat16 halves gallery HBM (2x identities
        # per chip) and the match kernel's feed bytes — the MXU contracts
        # bf16 natively with f32 accumulation. Unit-vector rows carry
        # ~0.4% per-component rounding => cosine scores move by ~2e-3;
        # fine for identification (top-1 margins are >>0.01), opt-in for
        # verification at tight FAR thresholds. Host copies stay float32.
        self._store_dtype = (
            jnp.bfloat16
            if dtype is not None and jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16)
            else jnp.float32
        )
        self._names: List[str] = []
        # embeddings live as (k, D) blocks so bulk enrollment is O(1) per
        # batch (a 10⁷-identity gallery cannot afford a Python append per
        # row); concatenated lazily
        self._blocks: List[np.ndarray] = []
        self._host_gallery: Optional[np.ndarray] = None
        self._device_gallery: Optional[jnp.ndarray] = None
        if mesh is not None:
            self._match_fn = make_sharded_gallery_match(mesh)
            self._scores_fn = make_sharded_gallery_scores(mesh)
            axes = mesh.axis_names
            self._n_model = mesh.shape[axes[1] if len(axes) > 1 else axes[0]]
            self._n_data = mesh.shape[axes[0]] if len(axes) > 1 else 1
        else:
            self._match_fn = None
            self._scores_fn = None
            self._n_model = self._n_data = 1
        self._topk_fns: Dict[int, object] = {}

    # -- enrollment ---------------------------------------------------------

    def add(self, name: str, embedding: np.ndarray) -> None:
        emb = np.asarray(embedding, np.float32).reshape(-1)
        if emb.shape[0] != self.embedding_size:
            raise ValueError(
                f"embedding dim {emb.shape[0]} != gallery dim {self.embedding_size}"
            )
        self._names.append(name)
        self._blocks.append(emb[None])
        self._host_gallery = None
        self._device_gallery = None  # invalidate

    def add_batch(self, names: Sequence[str], embeddings: np.ndarray) -> None:
        """Bulk enrollment: one (K, D) block, no per-row Python loop."""
        embs = np.asarray(embeddings, np.float32)
        if embs.ndim != 2 or embs.shape[1] != self.embedding_size:
            raise ValueError(
                f"expected (K, {self.embedding_size}) embeddings, "
                f"got {embs.shape}"
            )
        if len(names) != len(embs):
            raise ValueError(f"{len(names)} names for {len(embs)} embeddings")
        self._names.extend(str(n) for n in names)
        self._blocks.append(embs)
        self._host_gallery = None
        self._device_gallery = None

    def __len__(self) -> int:
        return len(self._names)

    @property
    def names(self) -> List[str]:
        return list(self._names)

    def _host(self) -> np.ndarray:
        if self._host_gallery is None:
            if not self._blocks:
                raise ValueError("gallery is empty")
            self._host_gallery = (
                self._blocks[0]
                if len(self._blocks) == 1
                else np.concatenate(self._blocks, axis=0)
            )
        return self._host_gallery

    def _gallery(self) -> jnp.ndarray:
        """Device gallery, ALWAYS pre-normalized (f32 math) and stored in
        ``self._store_dtype`` — every match call passes normalize=False
        for the gallery side and normalizes queries explicitly."""
        if self._device_gallery is None:
            g = self._host()
            g = g / np.maximum(
                np.linalg.norm(g, axis=1, keepdims=True), 1e-12
            )
            g = g.astype(self._store_dtype)
            if self.mesh is not None:
                # pad N to a multiple of the model-axis size with
                # DUPLICATES of row 0 — the exactness contract of the
                # sharded combine (ops/distances.py, sharded matcher).
                pad = (-len(g)) % self._n_model
                if pad:
                    g = np.concatenate([g, np.repeat(g[:1], pad, 0)], 0)
                from jax.sharding import NamedSharding, PartitionSpec as P

                axes = self.mesh.axis_names
                model_axis = axes[1] if len(axes) > 1 else axes[0]
                import jax

                # device_put the HOST array with the sharding attached:
                # each device receives only its own rows. (jnp.asarray
                # first would commit the FULL gallery to the default
                # device — at aggregate-mesh capacity that single-chip
                # staging copy OOMs before the resharding ever applies.)
                self._device_gallery = jax.device_put(
                    g, NamedSharding(self.mesh, P(model_axis, None))
                )
            else:
                self._device_gallery = jnp.asarray(g)
        return self._device_gallery

    # -- queries ------------------------------------------------------------

    def identify(
        self, queries: np.ndarray
    ) -> Tuple[List[str], np.ndarray]:
        """Best match per query: (names, cosine scores). One fused kernel —
        no per-identity loop (cf. reference predictions.py:74-79); over a
        mesh, one fused kernel per gallery shard + an ICI combine."""
        q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        if self._match_fn is not None:
            m = q.shape[0]
            pad = (-m) % self._n_data
            if pad:
                q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)], 0)
            scores, idx = self._match_fn(q, self._gallery())
            scores, idx = scores[:m], np.asarray(idx)[:m]
        else:
            scores, idx = gallery_match(q, self._gallery(), normalize=False)
            idx = np.asarray(idx)
        return [self._names[i] for i in idx], np.asarray(scores)

    def identify_topk(
        self, queries: np.ndarray, k: int = 5
    ) -> Tuple[List[List[str]], np.ndarray]:
        """Top-k matches per query: (names (M lists of k), scores (M, k)
        descending). Chunked merge on one device; per-shard top-k + a
        k·n_model-wide all-gather combine over a mesh (the row-0 padding
        is masked out by enrolled count, so duplicates never appear)."""
        if not self._names:
            raise ValueError("gallery is empty")
        k = min(k, len(self))
        q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        # gallery rows arrive pre-normalized (_gallery contract);
        # normalize queries here
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True),
                            1e-12)
        if self.mesh is not None:
            if k not in self._topk_fns:
                self._topk_fns[k] = make_sharded_gallery_topk(self.mesh, k)
            m = q.shape[0]
            pad = (-m) % self._n_data
            if pad:
                q = jnp.concatenate(
                    [q, jnp.zeros((pad, q.shape[1]), q.dtype)], 0
                )
            scores, idx = self._topk_fns[k](
                q, self._gallery(), jnp.int32(len(self))
            )
            scores, idx = scores[:m], np.asarray(idx)[:m]
        else:
            scores, idx = gallery_topk(q, self._gallery(), k,
                                       normalize=False)
            idx = np.asarray(idx)
        names = [[self._names[i] for i in row] for row in idx]
        return names, np.asarray(scores)

    def verify(
        self,
        query: np.ndarray,
        identity: str,
        threshold: float = DEFAULT_THRESHOLDS["triplet"],
    ) -> Tuple[bool, float]:
        """Is ``query`` the claimed ``identity``? Uses euclidean distance of
        l2-normalized embeddings against the enrolled entry, thresholded
        (reference: predictions.py:99-135 'verify' door-open semantics)."""
        if identity not in self._names:
            raise KeyError(f"identity {identity!r} not enrolled")
        i = self._names.index(identity)
        q = np.asarray(query, np.float32).reshape(-1)
        qn = q / max(np.linalg.norm(q), 1e-12)
        g = self._host()[i]
        gn = g / max(np.linalg.norm(g), 1e-12)
        dist = float(np.linalg.norm(qn - gn))
        return dist < threshold, dist

    def scores_all(self, queries: np.ndarray) -> np.ndarray:
        """Full (M, N) cosine score matrix (blocked Pallas matmul; per-
        shard tiles over the mesh when sharded)."""
        q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        if self._scores_fn is not None:
            m = q.shape[0]
            pad = (-m) % self._n_data
            if pad:
                q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)], 0)
            return np.asarray(self._scores_fn(q, self._gallery()))[:m, : len(self)]
        return np.asarray(gallery_scores(q, self._gallery(), normalize=False))

    # -- (de)serialization ---------------------------------------------------

    def save(self, path: str) -> None:
        np.savez(
            path,
            names=np.array(self._names),
            embeddings=(
                self._host()
                if self._blocks
                else np.zeros((0, self.embedding_size))
            ),
        )

    @classmethod
    def load(cls, path: str, mesh=None, dtype=None) -> "FaceGallery":
        """Restore a saved gallery; pass ``mesh`` to restore straight
        into the sharded configuration and ``dtype=jnp.bfloat16`` for
        half-HBM device storage. Bulk path — no per-row loop."""
        data = np.load(path, allow_pickle=False)
        emb = data["embeddings"]
        g = cls(embedding_size=emb.shape[1] if emb.size else 128, mesh=mesh,
                dtype=dtype)
        if len(emb):
            g.add_batch([str(n) for n in data["names"]], emb)
        return g
