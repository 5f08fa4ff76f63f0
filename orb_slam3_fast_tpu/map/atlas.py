"""Atlas: multi-map management with map spawn on tracking loss and Sim3 merge.

TPU-native replacement for the reference ``Atlas`` (``/root/reference/src/
Atlas.cc``): ``CreateNewMap`` (:53-73) stores the active map and starts a
fresh one when tracking is lost (``Tracking::CreateMapInAtlas``,
Tracking.cc:2607); ``LoopClosing::MergeLocal`` (LoopClosing.cc:1347-1930)
welds the active map back into a stored map when place recognition finds a
cross-map match.  Here each map is a SoA ``WorldMap``; a merge is a Sim3
transform of the active map's arrays followed by an array append with id
offsets — the pointer-graph transplant loops (``ChangeMap``) disappear.

The Atlas also owns the GLOBAL keyframe-database row registry: keyframe ids
are per-map, so place-recognition rows are allocated globally and mapped to
(map_id, local_kf_id) pairs (the reference reaches the same effect through
KeyFrame* identity).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from orb_slam3_fast_tpu.map.worldmap import WorldMap
from orb_slam3_fast_tpu.utils import lie


class Atlas:
    def __init__(self, make_map: Callable[[], WorldMap]):
        self._make = make_map
        self.maps: list[Optional[WorldMap]] = [make_map()]
        self.current_id = 0
        # global KFDB row registry: row -> (map_id, local kf id)
        self.row_map: list[tuple[int, int]] = []
        self._row_of: dict[tuple[int, int], int] = {}

    # ------------------------------------------------------------------
    @property
    def current(self) -> WorldMap:
        return self.maps[self.current_id]

    def n_maps(self) -> int:
        return sum(1 for m in self.maps if m is not None)

    def create_new_map(self) -> WorldMap:
        """Atlas::CreateNewMap (Atlas.cc:53): store current, start fresh."""
        self.maps.append(self._make())
        self.current_id = len(self.maps) - 1
        return self.current

    # ------------------------------------------------------------------
    def register_kf(self, map_id: int, local_kf: int) -> int:
        """Allocate (or return) the global KFDB row for a keyframe."""
        key = (map_id, local_kf)
        row = self._row_of.get(key)
        if row is None:
            row = len(self.row_map)
            self.row_map.append(key)
            self._row_of[key] = row
        return row

    def resolve_row(self, row: int) -> tuple[int, int]:
        return self.row_map[row]

    def rows_of_map(self, map_id: int) -> np.ndarray:
        return np.asarray(
            [r for r, (m, _) in enumerate(self.row_map) if m == map_id], dtype=np.int64
        )

    # ------------------------------------------------------------------
    def merge_into(self, src_id: int, dst_id: int, S_dst_src: lie.Sim3, kfdb=None) -> dict:
        """Weld map ``src`` into map ``dst`` (MergeLocal transplant,
        LoopClosing.cc:1347-1930): transform src by the world-to-world Sim3,
        append its arrays into dst with id offsets, retag KFDB rows.

        ``S_dst_src``: x_dst = s * R @ x_src + t.
        Returns {"kf_offset", "lm_offset"} for the caller to remap any cached
        local ids (tracker state, trajectory references).
        """
        src = self.maps[src_id]
        dst = self.maps[dst_id]
        R = np.asarray(S_dst_src.R, np.float64)
        s = float(S_dst_src.s)
        t = np.asarray(S_dst_src.t, np.float64)

        kf_off = dst.n_kf
        lm_off = dst.n_lm
        while dst.max_kf < kf_off + src.n_kf:
            dst._grow_kf()
        while dst.max_lm < lm_off + src.n_lm:
            dst._grow_lm()

        Ks, Ms = src.n_kf, src.n_lm
        # --- transform src poses: T_cw' = T_cw o S^-1 (SE3 with scale folded
        # into translation, as the essential-graph write-back does)
        # x_src = S^-1 x_dst = (1/s) R^T (x - t)
        # xc = R_cw x_src + t_cw = (1/s) R_cw R^T x_dst + (t_cw - (1/s) R_cw R^T t)
        # renormalized: R' = R_cw R^T, t' = s*t_cw... derive via Sim3 algebra:
        # T'_cw (SE3) with R' = R_cw @ R.T and t' = s * t_cw - R' @ t ... check
        # by mapping a dst-world point x: cam = R'x + t' must equal
        # s_cam-invariant projection of the original cam point.  Using
        # x_src = (1/s) R^T (x - t):
        #   cam_old = R_cw x_src + t_cw = (1/s)(R_cw R^T x - R_cw R^T t) + t_cw
        # scale the CAMERA frame by s (projection invariant):
        #   cam_new = s * cam_old = R_cw R^T x - R_cw R^T t + s t_cw
        Rp = np.einsum("kij,jl->kil", src.kf_R[:Ks].astype(np.float64), R.T)
        tp = -np.einsum("kij,j->ki", Rp, t) + s * src.kf_t[:Ks].astype(np.float64)
        dst.kf_R[kf_off : kf_off + Ks] = lie.normalize_rotation_np(Rp)
        dst.kf_t[kf_off : kf_off + Ks] = tp.astype(np.float32)
        dst.kf_ts[kf_off : kf_off + Ks] = src.kf_ts[:Ks]
        dst.kf_valid[kf_off : kf_off + Ks] = src.kf_valid[:Ks]
        for name in ("kf_xy", "kf_level", "kf_angle", "kf_desc", "kf_kp_valid"):
            getattr(dst, name)[kf_off : kf_off + Ks] = getattr(src, name)[:Ks]
        # stereo depths/right-u scale with the map
        dst.kf_depth[kf_off : kf_off + Ks] = np.where(
            src.kf_depth[:Ks] > 0, s * src.kf_depth[:Ks], src.kf_depth[:Ks]
        )
        dst.kf_right_u[kf_off : kf_off + Ks] = src.kf_right_u[:Ks]
        obs = src.kf_obs[:Ks].copy()
        obs[obs >= 0] += lm_off
        dst.kf_obs[kf_off : kf_off + Ks] = obs
        # inertial state
        dst.kf_vel[kf_off : kf_off + Ks] = s * np.einsum(
            "ij,kj->ki", R, src.kf_vel[:Ks].astype(np.float64)
        ).astype(np.float32)
        dst.kf_bias[kf_off : kf_off + Ks] = src.kf_bias[:Ks]
        for k, p in src.kf_preint.items():
            dst.kf_preint[k + kf_off] = p
        dst.n_kf += Ks

        # --- landmarks: x_dst = s R x_src + t
        pos = s * (src.lm_pos[:Ms].astype(np.float64) @ R.T) + t
        dst.lm_pos[lm_off : lm_off + Ms] = pos.astype(np.float32)
        dst.lm_normal[lm_off : lm_off + Ms] = (
            src.lm_normal[:Ms].astype(np.float64) @ R.T
        ).astype(np.float32)
        dst.lm_dmin[lm_off : lm_off + Ms] = s * src.lm_dmin[:Ms]
        dst.lm_dmax[lm_off : lm_off + Ms] = s * src.lm_dmax[:Ms]
        for name in ("lm_valid", "lm_desc", "lm_visible", "lm_found", "lm_n_obs"):
            getattr(dst, name)[lm_off : lm_off + Ms] = getattr(src, name)[:Ms]
        fk = src.lm_first_kf[:Ms].copy()
        fk[fk >= 0] += kf_off
        dst.lm_first_kf[lm_off : lm_off + Ms] = fk
        dst.n_lm += Ms

        # --- KFDB rows of src now belong to dst with offset ids
        for r, (m, k) in enumerate(self.row_map):
            if m == src_id:
                self.row_map[r] = (dst_id, k + kf_off)
                self._row_of.pop((src_id, k), None)
                self._row_of[(dst_id, k + kf_off)] = r
        if kfdb is not None:
            kfdb.map_id[kfdb.map_id == src_id] = dst_id

        self.maps[src_id] = None  # retired
        self.current_id = dst_id
        return {"kf_offset": kf_off, "lm_offset": lm_off}

    # ------------------------------------------------------------------
    # persistence (System::SaveAtlas / LoadAtlas, System.cc:1430-1529 —
    # the whole multi-map atlas, not just the active map)
    # ------------------------------------------------------------------
    def save(self, path: str):
        """Write every live map as <path>.map<i>.npz plus a registry file."""
        import numpy as np

        live = [i for i, m in enumerate(self.maps) if m is not None]
        for i in live:
            self.maps[i].save(f"{path}.map{i}.npz")
        rows = np.asarray(
            [(r, m, k) for r, (m, k) in enumerate(self.row_map)], dtype=np.int64
        ).reshape(-1, 3)
        np.savez(f"{path}.atlas.npz", live=np.asarray(live, np.int64),
                 current=self.current_id, n_slots=len(self.maps), rows=rows)

    @staticmethod
    def load(path: str, make_map) -> "Atlas":
        import numpy as np

        from orb_slam3_fast_tpu.map.worldmap import WorldMap

        z = np.load(f"{path}.atlas.npz")
        atlas = Atlas(make_map)
        atlas.maps = [None] * int(z["n_slots"])
        for i in z["live"]:
            atlas.maps[int(i)] = WorldMap.load(f"{path}.map{int(i)}.npz")
        atlas.current_id = int(z["current"])
        atlas.row_map = []
        atlas._row_of = {}
        for r, m, k in z["rows"]:
            atlas.row_map.append((int(m), int(k)))
            atlas._row_of[(int(m), int(k))] = int(r)
        return atlas
