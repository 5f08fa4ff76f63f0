"""Keyframe database: bag-of-words place-recognition index.

TPU-native replacement for the reference ``KeyFrameDatabase``
(``/root/reference/src/KeyFrameDatabase.cc``): the word->list<KeyFrame*>
inverted file (``mvInvertedFile``, add/erase at :37/:47) becomes a SPARSE
row store — per keyframe the word ids + tf-idf weights of its (<= n_features)
distinct words — so memory is O(K * features), independent of vocabulary
size: a reference-scale 10^5-10^6-word vocabulary (ORBvoc is ~1M words,
System.cc:131) costs the same as a 10^4-word one.  Scoring stays batched:
one dense query lookup table (n_words floats, built per query) + one (K,T)
gather; the DBoW2 L1 similarity of L1-normalized vectors reduces exactly to
``sum over shared words of min(v_i, w_i)``:

  |v - w|_1 = 2 - 2 * sum_shared min  =>  1 - 0.5|v - w|_1 = sum_shared min.
"""
from __future__ import annotations

import numpy as np


class KeyFrameDatabase:
    def __init__(self, n_words: int, max_kf: int = 512, row_words: int = 1024):
        """``row_words``: sparse row capacity — the number of distinct words
        a keyframe can hold is bounded by its keypoint count, so the default
        matches the extractor budget regardless of vocabulary size."""
        self.n_words = n_words
        self.max_kf = max_kf
        self.row_words = row_words
        self.ids = np.full((max_kf, row_words), -1, dtype=np.int32)
        self.w = np.zeros((max_kf, row_words), dtype=np.float32)
        self.valid = np.zeros(max_kf, dtype=bool)
        self.map_id = np.full(max_kf, -1, dtype=np.int32)
        self.sharded = None  # optional device-resident mirror (attach_mesh)

    # ------------------------------------------------------------------
    @property
    def bow(self) -> np.ndarray:
        """Dense (K, n_words) view for tests / the sharded mirror — built on
        demand (do NOT use in the hot path at large n_words)."""
        out = np.zeros((self.max_kf, self.n_words), dtype=np.float32)
        rows, cols = np.nonzero(self.ids >= 0)
        out[rows, self.ids[rows, cols]] = self.w[rows, cols]
        return out

    def dense_row(self, kf: int) -> np.ndarray:
        """One keyframe's dense (n_words,) BoW vector (query construction)."""
        out = np.zeros(self.n_words, dtype=np.float32)
        sel = self.ids[kf] >= 0
        out[self.ids[kf, sel]] = self.w[kf, sel]
        return out

    def _sparsify(self, bow: np.ndarray):
        nz = np.nonzero(bow)[0]
        if len(nz) > self.row_words:  # keep the heaviest words
            nz = nz[np.argsort(-bow[nz])[: self.row_words]]
        ids = np.full(self.row_words, -1, np.int32)
        w = np.zeros(self.row_words, np.float32)
        ids[: len(nz)] = nz
        w[: len(nz)] = bow[nz]
        return ids, w

    # ------------------------------------------------------------------
    def attach_mesh(self, mesh):
        """Shard the sparse rows over a device mesh: scoring runs on-device,
        row-parallel across chips (parallel/dist_kfdb.py); keyframe adds
        ship one row.  Detach by setting ``self.sharded = None``."""
        from orb_slam3_fast_tpu.parallel.dist_kfdb import ShardedKFDB

        self.sharded = ShardedKFDB.from_host(mesh, self.ids, self.w, self.n_words)

    # ------------------------------------------------------------------
    def add(self, kf: int, bow: np.ndarray, map_id: int = 0):
        """KeyFrameDatabase::add (:37)."""
        grew = False
        while kf >= self.max_kf:  # grow with the (multi-map) keyframe count
            pad = self.max_kf
            self.ids = np.concatenate([self.ids, np.full((pad, self.row_words), -1, np.int32)])
            self.w = np.concatenate([self.w, np.zeros((pad, self.row_words), np.float32)])
            self.valid = np.concatenate([self.valid, np.zeros(pad, bool)])
            self.map_id = np.concatenate([self.map_id, np.full(pad, -1, np.int32)])
            self.max_kf *= 2
            grew = True
        ids, w = self._sparsify(np.asarray(bow))
        self.ids[kf] = ids
        self.w[kf] = w
        self.valid[kf] = True
        self.map_id[kf] = map_id
        if self.sharded is not None:
            if grew:
                self.attach_mesh(self.sharded.mesh)  # re-shard at the new size
            else:
                self.sharded.set_row(kf, ids, w)

    def erase(self, kf: int):
        """KeyFrameDatabase::erase (:47)."""
        self.valid[kf] = False

    def clear_map(self, map_id: int):
        """KeyFrameDatabase::clearMap (:74)."""
        self.valid[self.map_id == map_id] = False

    # ------------------------------------------------------------------
    def _scores(self, query_bow: np.ndarray, exclude: np.ndarray):
        """Returns (common_words, l1_score, eligible-mask) vs all stored KFs."""
        elig = self.valid.copy()
        elig[exclude] = False
        if self.sharded is not None:  # row-parallel on the mesh
            common, score = self.sharded.scores(query_bow)
            return np.asarray(common), np.asarray(score), elig
        # dense query LUT + one (K,T) gather — O(K * row_words), independent
        # of vocabulary size
        lut = np.zeros(self.n_words + 1, dtype=np.float32)
        lut[: self.n_words] = np.asarray(query_bow, dtype=np.float32)
        qw = lut[np.where(self.ids >= 0, self.ids, self.n_words)]  # (K,T)
        shared = (qw > 0) & (self.w > 0)
        common = shared.sum(1).astype(np.int64)
        score = np.where(shared, np.minimum(self.w, qw), 0.0).sum(1)
        return common, score, elig

    def detect_n_best_candidates(
        self,
        query_bow: np.ndarray,
        covisible: np.ndarray,
        n: int,
        covis_groups: dict[int, np.ndarray] | None = None,
        query_map: int = -1,
    ):
        """DetectNBestCandidates (KeyFrameDatabase.cc:612-741).

        ``covisible``: KF ids connected to the query (excluded — a loop must
        close against a *distant* part of the map).  ``covis_groups`` maps a
        candidate KF id -> its covisible KF ids, used for group-score
        accumulation; best group member is returned (per reference:
        accScore over candidate+neighbors, keep group max).

        Returns (loop_candidates, merge_candidates): same-map vs other-map
        top-scoring KF ids (the Atlas split at :714-736).
        """
        common, score, elig = self._scores(query_bow, np.asarray(covisible, dtype=np.int64))
        elig &= common > 0
        if not elig.any():
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        max_common = common[elig].max()
        min_common = 0.8 * max_common  # :661
        elig &= common > min_common
        ids = np.nonzero(elig)[0]
        if len(ids) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        # group accumulated score (:672-705).  ``covis_groups`` may be a dict
        # OR a callable row -> group rows; the callable form is evaluated
        # LAZILY for the eligible candidates only (the previous build-groups-
        # for-every-keyframe pattern cost O(K^2 * N) per query)
        acc = np.zeros(len(ids), dtype=np.float32)
        best_member = ids.copy()
        for i, k in enumerate(ids):
            if callable(covis_groups):
                group = covis_groups(int(k))
            elif covis_groups:
                group = covis_groups.get(int(k), np.zeros(0, np.int64))
            else:
                group = np.zeros(0, np.int64)
            group = np.asarray(group, dtype=np.int64)
            group = group[(group >= 0) & elig[np.clip(group, 0, self.max_kf - 1)]] if len(group) else group
            members = np.concatenate([[k], group])
            s = score[members]
            acc[i] = s.sum()
            best_member[i] = members[s.argmax()]
        order = np.argsort(-acc)
        picked, seen = [], set()
        for j in order:
            m = int(best_member[j])
            if m not in seen:
                seen.add(m)
                picked.append(m)
            if len(picked) >= n:
                break
        picked = np.asarray(picked, dtype=np.int64)
        same = self.map_id[picked] == query_map
        return picked[same], picked[~same]

    def detect_reloc_candidates(self, query_bow: np.ndarray, query_map: int = -1):
        """DetectRelocalizationCandidates (KeyFrameDatabase.cc:742-857):
        same scoring pipeline relative to a (keyframe-less) frame; returns
        candidates above 0.75 * best accumulated score."""
        common, score, elig = self._scores(query_bow, np.zeros(0, np.int64))
        if query_map >= 0:
            elig &= self.map_id == query_map
        elig &= common > 0
        if not elig.any():
            return np.zeros(0, np.int64)
        min_common = 0.8 * common[elig].max()
        elig &= common > min_common
        ids = np.nonzero(elig)[0]
        s = score[ids]
        keep = s >= 0.75 * s.max()  # :846 (0.75f*bestAccScore)
        ids = ids[keep]
        return ids[np.argsort(-s[keep])]
