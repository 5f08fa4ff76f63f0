"""Hierarchical binary vocabulary: TPU-native DBoW2 replacement.

Replaces the reference's vendored ``DBoW2::TemplatedVocabulary<FORB>``
(``/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h``): a
hierarchical k-medians tree over 256-bit ORB descriptors whose ``transform``
maps each descriptor to a leaf **word id** plus an intermediate **node id**
(levels-up grouping, DBoW2 ``FeatureVector``), and aggregates tf-idf weights
into a normalized bag-of-words vector (DBoW2 ``BowVector``).

TPU-first design (SURVEY.md §2.2 plan): instead of the reference's pointer
tree walked one descriptor at a time (``TemplatedVocabulary.h`` transform),
the tree is stored as **dense per-level centroid tables of a complete
B-ary tree** and the descent is batched over all keypoints of a frame:
level l holds a (B^l * B, 256) table; one gather + one int8 MXU matmul +
argmin per level moves every descriptor down one level simultaneously.
Empty branches (k-means produced < B children) carry an infinite-distance
sentinel so the argmin never selects them.

The reference loads a pre-trained 1M-word ``ORBvoc.txt`` (System.cc:131).
Our descriptors come from our own deterministic BRIEF pattern
(ops/extractor.py), so we *train* vocabularies instead — ``train`` runs
hierarchical k-medians (majority-vote binary centroids) on descriptors
harvested from procedural images or a dataset; ``default_vocabulary``
builds & caches the stock one.
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL = 0x7F  # centroid byte marking an empty branch (never matches well)


class Vocabulary(NamedTuple):
    """Dense complete-tree vocabulary.

    ``centroids[l]`` has shape (B^(l+1), 256) int8 {0,1}; entry
    ``i = parent*B + j`` is child j of node ``parent`` at level l.
    ``alive[l]`` masks real children.  Leaves are level ``depth-1`` nodes;
    word id = leaf index in [0, B^depth).  ``weights`` are idf word weights.
    """

    branching: int
    depth: int
    centroids: tuple  # of (B^(l+1), 256) int8 device arrays
    alive: tuple  # of (B^(l+1),) bool device arrays
    weights: jnp.ndarray  # (B^depth,) float32 idf
    levels_up: int = 2  # FeatureVector grouping level (ORBVocabulary default 4 for L=6; scaled)

    @property
    def n_words(self) -> int:
        return self.branching**self.depth

    def checksum(self) -> str:
        """MD5 over the tree content — the reference guards atlas
        save/load with a vocabulary checksum so a map is never re-opened
        against a different vocabulary (System::CalculateCheckSum,
        System.cc:1531; checked at :1430-1529)."""
        import hashlib

        h = hashlib.md5()
        h.update(str((self.branching, self.depth)).encode())
        for c in self.centroids:
            h.update(np.asarray(c).tobytes())
        h.update(np.asarray(self.weights).tobytes())
        return h.hexdigest()

    # ------------------------------------------------------------------
    def save(self, path: str):
        """Centroid bits are stored PACKED (np.packbits, 32 bytes/centroid):
        a 1M-word depth-6 tree is ~36 MB on disk instead of ~280 MB (the
        reference ships its 1M-word ORBvoc as a ~44 MB tarball).  Sentinel
        rows of dead branches are reconstructed from ``alive`` on load."""
        np.savez_compressed(
            path,
            branching=self.branching,
            depth=self.depth,
            levels_up=self.levels_up,
            packed=1,
            weights=np.asarray(self.weights),
            **{
                f"c{l}": np.packbits(np.asarray(c) == 1, axis=1)
                for l, c in enumerate(self.centroids)
            },
            **{f"a{l}": np.asarray(a) for l, a in enumerate(self.alive)},
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        depth = int(z["depth"])
        packed = "packed" in z.files
        cents = []
        for l in range(depth):
            c = z[f"c{l}"]
            if packed:
                a = z[f"a{l}"]
                c = np.unpackbits(c, axis=1)[:, :256].astype(np.int8)
                c[~a] = _SENTINEL
            cents.append(jnp.asarray(c))
        return Vocabulary(
            branching=int(z["branching"]),
            depth=depth,
            centroids=tuple(cents),
            alive=tuple(jnp.asarray(z[f"a{l}"]) for l in range(depth)),
            weights=jnp.asarray(z["weights"]),
            levels_up=int(z["levels_up"]),
        )


# ---------------------------------------------------------------------------
# training (host, numpy)
# ---------------------------------------------------------------------------


_KM_CHUNK = 1 << 18  # rows per distance-matmul chunk (bounds peak memory)


def _kmedians_binary(desc: np.ndarray, k: int, rng: np.random.Generator, iters: int = 8):
    """k-medians on binary descriptors: Hamming assignment (via matmul),
    majority-vote centroid update (the binary analogue of DBoW2's
    ``meanValue``).  The assignment pass is CHUNKED so multi-million-row
    splits (the top levels of a 1M-word tree) never materialize an (N,256)
    float copy — peak extra memory is O(_KM_CHUNK * 256)."""
    n = desc.shape[0]
    k_eff = min(k, n)
    centers = desc[rng.choice(n, size=k_eff, replace=False)].astype(np.float32)
    pop = desc.sum(1, dtype=np.int32).astype(np.float32)

    def assign_pass(centers):
        csum = centers.sum(1)
        out = np.empty(n, np.int64)
        dmin = np.empty(n, np.float32)
        for s in range(0, n, _KM_CHUNK):
            df = desc[s : s + _KM_CHUNK].astype(np.float32)
            d = pop[s : s + _KM_CHUNK, None] + csum[None, :] - 2.0 * (df @ centers.T)
            out[s : s + _KM_CHUNK] = d.argmin(1)
            dmin[s : s + _KM_CHUNK] = d.min(1)
        return out, dmin

    assign = None
    for _ in range(iters):
        new_assign, dmin = assign_pass(centers)
        if assign is not None and np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for j in range(k_eff):
            m = assign == j
            if m.any():
                centers[j] = (
                    desc[m].sum(0, dtype=np.int64) >= 0.5 * m.sum()
                ).astype(np.float32)
            else:  # re-seed empty cluster at the farthest descriptor
                centers[j] = desc[dmin.argmax()].astype(np.float32)
    assign, _ = assign_pass(centers)
    return centers.astype(np.int8), assign


def train(
    desc: np.ndarray,
    branching: int = 10,
    depth: int = 3,
    seed: int = 0,
    weight_desc: np.ndarray | None = None,
) -> Vocabulary:
    """Hierarchical k-medians (TemplatedVocabulary::create, HKmeansStep).

    ``desc``: (N,256) int8/uint8 {0,1} training descriptors.
    idf weights come from ``weight_desc`` (defaults to the training set),
    mirroring DBoW2's TF_IDF weighting (``setNodeWeights``).
    """
    rng = np.random.default_rng(seed)
    desc = np.asarray(desc, dtype=np.int8)
    B = branching
    centroids, alive = [], []
    # groups[i] = descriptor indices currently in node i of this level
    groups = [np.arange(desc.shape[0])]
    for lvl in range(depth):
        n_nodes = B ** (lvl + 1)
        cents = np.full((n_nodes, 256), _SENTINEL, dtype=np.int8)
        live = np.zeros(n_nodes, dtype=bool)
        next_groups = [np.zeros(0, dtype=np.int64)] * n_nodes
        for parent, idx in enumerate(groups):
            if len(idx) == 0:
                continue
            c, a = _kmedians_binary(desc[idx], B, rng)
            for j in range(c.shape[0]):
                node = parent * B + j
                cents[node] = c[j]
                live[node] = True
                next_groups[node] = idx[a == j]
        centroids.append(cents)
        alive.append(live)
        groups = next_groups
    # idf weights (DBoW2 TF_IDF: idf = log(N_images/n_i); descriptor-level proxy)
    wd = desc if weight_desc is None else np.asarray(weight_desc, dtype=np.int8)
    voc = Vocabulary(
        branching=B,
        depth=depth,
        centroids=tuple(jnp.asarray(c) for c in centroids),
        alive=tuple(jnp.asarray(a) for a in alive),
        weights=jnp.ones(B**depth, dtype=jnp.float32),
        levels_up=max(depth - 1, 1),
    )
    # chunked: the (N, B, 256) descent gather at 1M words over millions of
    # training descriptors would transiently need tens of GB unchunked
    words = np.concatenate([
        np.asarray(transform_words(voc, jnp.asarray(wd[s : s + 65536])))
        for s in range(0, len(wd), 65536)
    ])
    counts = np.bincount(words, minlength=B**depth).astype(np.float64)
    n = max(len(words), 1)
    idf = np.log(n / np.maximum(counts, 1.0)).astype(np.float32)
    idf[counts == 0] = 0.0  # unused words score nothing
    return voc._replace(weights=jnp.asarray(idf))


# ---------------------------------------------------------------------------
# transform (device, batched)
# ---------------------------------------------------------------------------


def _descend(voc: Vocabulary, desc: jnp.ndarray) -> jnp.ndarray:
    """Batched tree descent: (N,256) -> per-level node ids (depth, N)."""
    n = desc.shape[0]
    B = voc.branching
    di = desc.astype(jnp.int32)
    node = jnp.zeros(n, dtype=jnp.int32)  # parent at level -1 (root)
    levels = []
    for lvl in range(voc.depth):
        cents = voc.centroids[lvl]  # (B^(l+1), 256)
        live = voc.alive[lvl]
        base = node * B
        cand = base[:, None] + jnp.arange(B)[None, :]  # (N,B)
        cc = cents[cand]  # (N,B,256) int8 gather
        # hamming via dot: |a| + |b| - 2 a.b  (sentinel rows have huge |b|)
        dot = jnp.einsum(
            "nc,nbc->nb", di, cc.astype(jnp.int32), preferred_element_type=jnp.int32
        )
        ham = di.sum(-1)[:, None] + jnp.abs(cc.astype(jnp.int32)).sum(-1) - 2 * dot
        ham = jnp.where(live[cand], ham, 1 << 20)
        node = cand[jnp.arange(n), ham.argmin(-1)]
        levels.append(node)
    return jnp.stack(levels)


def transform_words(voc: Vocabulary, desc: jnp.ndarray) -> jnp.ndarray:
    """Descriptor -> leaf word id (N,)."""
    return _descend(voc, desc)[-1]


@partial(jax.jit, static_argnums=(0, 1, 2))
def _transform_jit(branching, depth, levels_up, centroids, alive, weights, desc, valid):
    voc = Vocabulary(branching, depth, centroids, alive, weights, levels_up)
    levels = _descend(voc, desc)
    words = levels[-1]
    # FeatureVector node id at (depth - levels_up) from the leaf side
    node_lvl = max(depth - 1 - levels_up, 0)
    nodes = levels[node_lvl]
    # BowVector: sum of idf weights per word over valid keypoints, L1-normalized
    w = jnp.where(valid, weights[words], 0.0)
    bow = jnp.zeros(voc.n_words, dtype=jnp.float32).at[words].add(w)
    bow = bow / jnp.maximum(bow.sum(), 1e-12)
    words = jnp.where(valid, words, -1)
    nodes = jnp.where(valid, nodes, -1)
    return words, nodes, bow


def transform(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """Full DBoW2-style transform (TemplatedVocabulary::transform):
    returns (word_ids (N,), node_ids (N,), bow (W,) L1-normalized tf-idf)."""
    return _transform_jit(
        voc.branching, voc.depth, voc.levels_up,
        voc.centroids, voc.alive, voc.weights, desc, valid,
    )


def score_l1(bow_a: jnp.ndarray, bow_b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score (ScoringObject.cc L1Scoring): both inputs L1-normalized;
    s = 1 - 0.5 * |va - vb|_1, in [0,1]. Broadcasts over leading dims of b."""
    return 1.0 - 0.5 * jnp.abs(bow_a - bow_b).sum(-1)


# ---------------------------------------------------------------------------
# stock vocabulary (trained once from procedural texture, cached on disk)
# ---------------------------------------------------------------------------

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "_default_voc.npz")


_LARGE_PATH = os.path.join(os.path.dirname(__file__), "_large_voc.npz")


def large_vocabulary(branching: int = 10, depth: int = 5,
                     n_images: int = 128) -> Vocabulary:
    """Reference-scale vocabulary: 10^5 words at the default (branching 10,
    depth 5), trained on a large diverse procedural corpus and cached on
    disk — the ORBvoc.txt class of tree (~1M words, System.cc:131; the
    sparse KeyFrameDatabase rows make word count memory-free, so the only
    cost is this one-time training).  Pass
    ``System(..., vocabulary=vocab_mod.large_vocabulary())`` to use it."""
    if os.path.exists(_LARGE_PATH):
        try:
            v = Vocabulary.load(_LARGE_PATH)
            if v.branching == branching and v.depth == depth:
                return v
        except Exception:
            pass
    desc = _procedural_descriptors(n_images=n_images)
    voc = train(desc, branching=branching, depth=depth)
    try:
        voc.save(_LARGE_PATH)
    except OSError:
        pass
    return voc


_HUGE_PATH = os.path.join(os.path.dirname(__file__), "_huge_voc.npz")


def huge_vocabulary(branching: int = 10, depth: int = 6,
                    n_images: int = 4096, batch: int = 512) -> Vocabulary:
    """REFERENCE-scale vocabulary: 10^6 words (branching 10, depth 6) — the
    ORBvoc.txt class of tree the reference loads at
    ``/root/reference/src/System.cc:131``.  Trained once offline on a large
    procedural corpus (~n_images * 1k descriptors) and cached packed
    (~36 MB on disk, see ``Vocabulary.save``; the reference ships ~44 MB).

    Costs to know (documented for RESULTS.md): the level-5 leaf-centroid
    table is (10^6, 256) int8 = 256 MB unpacked in device memory; descent
    latency grows by one gather+matmul level vs the 100k tree.  The sparse
    KeyFrameDatabase rows already scale to 1M words (vocab/database.py).

    Pass ``System(..., vocabulary=vocab_mod.huge_vocabulary())`` to use it.
    """
    if os.path.exists(_HUGE_PATH):
        try:
            v = Vocabulary.load(_HUGE_PATH)
            if v.branching == branching and v.depth == depth:
                return v
        except Exception:
            pass
    # harvest in seed batches so the corpus is diverse and restartable
    chunks = []
    for b in range(0, n_images, batch):
        chunks.append(
            _procedural_descriptors(n_images=min(batch, n_images - b), seed=7 + b)
        )
    desc = np.concatenate(chunks)
    voc = train(desc, branching=branching, depth=depth)
    try:
        voc.save(_HUGE_PATH)
    except OSError:
        pass
    return voc


def _procedural_descriptors(n_images: int = 32, seed: int = 7) -> np.ndarray:
    """Descriptors from diverse procedural imagery (textured patches at many
    scales + gradients + blobs) — image-LIKE statistics, not uniform noise:
    BRIEF bits over real patches are strongly correlated, and a vocabulary
    trained on the wrong bit statistics clusters everything into few words."""
    from orb_slam3_fast_tpu.ops import extractor as ext

    rng = np.random.default_rng(seed)
    cfg = ext.ExtractorConfig(n_features=1024)
    out = []
    for im_i in range(n_images):
        # low-frequency background (smooth illumination)
        bg = rng.uniform(10, 80)
        img = np.full((480, 640), bg, np.float32)
        gx = rng.uniform(-0.08, 0.08)
        gy = rng.uniform(-0.08, 0.08)
        yy, xx = np.mgrid[0:480, 0:640]
        img += gx * xx + gy * yy
        # textured patches at a wide range of scales (like projected quads)
        for _ in range(120):
            x, y = int(rng.integers(0, 600)), int(rng.integers(0, 440))
            s = int(rng.integers(6, 90))
            tile = int(rng.integers(2, 8))
            tex = rng.uniform(20, 235, (tile, tile)).astype(np.float32)
            ys = np.clip((np.arange(s) * tile) // s, 0, tile - 1)
            patch = tex[ys[:, None], ys[None, :]]
            y1, x1 = min(y + s, 480), min(x + s, 640)
            img[y:y1, x:x1] = patch[: y1 - y, : x1 - x]
        # a few hard edges + small blobs
        for _ in range(40):
            x, y = int(rng.integers(10, 620)), int(rng.integers(10, 460))
            s = int(rng.integers(2, 10))
            img[y : y + s, x : x + s] += rng.uniform(40, 160)
        kp = ext.extract(jnp.asarray(np.clip(img, 0, 255)), cfg)
        v = np.asarray(kp.valid)
        out.append(np.asarray(kp.desc)[v])
    return np.concatenate(out)


def default_vocabulary(branching: int = 10, depth: int = 4) -> Vocabulary:
    """Build (or load cached) the stock vocabulary — the ORBvoc.txt analogue."""
    if os.path.exists(_DEFAULT_PATH):
        try:
            v = Vocabulary.load(_DEFAULT_PATH)
            if v.branching == branching and v.depth == depth:
                return v
        except Exception:
            pass
    desc = _procedural_descriptors()
    voc = train(desc, branching=branching, depth=depth)
    try:
        voc.save(_DEFAULT_PATH)
    except OSError:
        pass
    return voc
