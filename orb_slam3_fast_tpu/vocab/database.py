"""Keyframe database: bag-of-words place-recognition index.

TPU-native replacement for the reference ``KeyFrameDatabase``
(``/root/reference/src/KeyFrameDatabase.cc``): the word->list<KeyFrame*>
inverted file (``mvInvertedFile``, add/erase at :37/:47) becomes two dense
host arrays — a (K_cap, W) float32 tf-idf matrix and its boolean incidence —
so candidate scoring is plain matrix algebra instead of list walks:

  * shared-word counts (``DetectNBestCandidates`` word accumulation,
    KeyFrameDatabase.cc:628-657)  ->  incidence @ query_incidence
  * L1 similarity (vocabulary ``score``, :684)  ->  row-wise |A - q|_1

With K_cap ~ hundreds of keyframes and W ~ 1k-10k words this is a few MB and
microseconds on host numpy; the design scales to sharded device matmuls when
the map grows (SURVEY.md §5 distributed plan).
"""
from __future__ import annotations

import numpy as np


class KeyFrameDatabase:
    def __init__(self, n_words: int, max_kf: int = 512):
        self.n_words = n_words
        self.max_kf = max_kf
        self.bow = np.zeros((max_kf, n_words), dtype=np.float32)
        self.has_word = np.zeros((max_kf, n_words), dtype=bool)
        self.valid = np.zeros(max_kf, dtype=bool)
        self.map_id = np.full(max_kf, -1, dtype=np.int32)
        self.sharded = None  # optional device-resident mirror (attach_mesh)

    # ------------------------------------------------------------------
    def attach_mesh(self, mesh):
        """Shard the BoW matrix over a device mesh: scoring runs on-device,
        row-parallel across chips (parallel/dist_kfdb.py); keyframe adds
        ship one row.  Detach by setting ``self.sharded = None``."""
        from orb_slam3_fast_tpu.parallel.dist_kfdb import ShardedKFDB

        self.sharded = ShardedKFDB.from_host(mesh, self.bow)

    # ------------------------------------------------------------------
    def add(self, kf: int, bow: np.ndarray, map_id: int = 0):
        """KeyFrameDatabase::add (:37)."""
        grew = False
        while kf >= self.max_kf:  # grow with the (multi-map) keyframe count
            pad = self.max_kf
            self.bow = np.concatenate([self.bow, np.zeros((pad, self.n_words), np.float32)])
            self.has_word = np.concatenate([self.has_word, np.zeros((pad, self.n_words), bool)])
            self.valid = np.concatenate([self.valid, np.zeros(pad, bool)])
            self.map_id = np.concatenate([self.map_id, np.full(pad, -1, np.int32)])
            self.max_kf *= 2
            grew = True
        self.bow[kf] = np.asarray(bow)
        self.has_word[kf] = self.bow[kf] > 0
        self.valid[kf] = True
        self.map_id[kf] = map_id
        if self.sharded is not None:
            if grew:
                self.attach_mesh(self.sharded.mesh)  # re-shard at the new size
            else:
                self.sharded.set_row(kf, self.bow[kf])

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
            return common, score, elig
        q_has = query_bow > 0
        common = (self.has_word & q_has[None, :]).sum(1)
        # DBoW2 L1 score: 1 - 0.5 |v - w|_1 (both L1-normalized)
        score = 1.0 - 0.5 * np.abs(self.bow - query_bow[None, :]).sum(1)
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
