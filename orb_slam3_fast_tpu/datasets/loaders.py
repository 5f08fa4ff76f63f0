"""Dataset drivers: EuRoC, TUM-VI/TUM-RGBD, KITTI sequence loaders.

TPU-native replacement for the reference's example mains
(``/root/reference/Examples/*/*.cc``, e.g. ``Stereo-Inertial/
stereo_inertial_euroc.cc:50-230``: LoadImages/LoadIMU + the per-frame feed
loop) and ``evaluation/associate.py`` (timestamp association).  Each loader
yields frames lazily so gigabyte sequences stream from disk.
"""
from __future__ import annotations

import csv
import glob
import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np


def _imread_gray(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img.astype(np.float32)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"), dtype=np.float32)


def _imread_depth(path: str) -> np.ndarray:
    try:
        import cv2

        d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if d is None:
            raise FileNotFoundError(path)
        return d.astype(np.float32)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path), dtype=np.float32)


@dataclass
class Frame:
    ts: float
    img: np.ndarray
    img_right: np.ndarray | None = None
    depth: np.ndarray | None = None
    imu: np.ndarray | None = None  # (N,7): ts, ax, ay, az, wx, wy, wz


class EuRoCLoader:
    """EuRoC MAV dataset (mav0 layout): cam0/cam1 PNGs + imu0/data.csv
    (LoadImages/LoadIMU in stereo_inertial_euroc.cc:232-291)."""

    def __init__(self, root: str, stereo: bool = True, imu: bool = False,
                 timestamps: str | None = None):
        self.root = root
        self.stereo = stereo
        self.use_imu = imu
        cam0 = os.path.join(root, "mav0", "cam0", "data")
        self.ts, self.files_l = self._load_cam(cam0, timestamps)
        self.files_r = None
        if stereo:
            cam1 = os.path.join(root, "mav0", "cam1", "data")
            _, self.files_r = self._load_cam(cam1, timestamps)
        self.imu = self._load_imu() if imu else None

    @staticmethod
    def _load_cam(d: str, timestamps: str | None):
        if timestamps:  # EuRoC timestamp txt list (ns per line)
            with open(timestamps) as f:
                names = [l.strip() for l in f if l.strip()]
            ts = np.asarray([float(n) * 1e-9 for n in names])
            files = [os.path.join(d, n + ".png") for n in names]
        else:
            files = glob.glob(os.path.join(d, "*.png"))
            ts = np.asarray([float(os.path.splitext(os.path.basename(p))[0]) * 1e-9 for p in files])
            # sort NUMERICALLY by timestamp: lexicographic filename order
            # scrambles variable-width nanosecond names (real EuRoC names are
            # fixed-width so both agree, but nothing guarantees that)
            order = np.argsort(ts)
            ts = ts[order]
            files = [files[i] for i in order]
        return ts, files

    def _load_imu(self) -> np.ndarray:
        path = os.path.join(self.root, "mav0", "imu0", "data.csv")
        rows = []
        with open(path) as f:
            rd = csv.reader(f)
            for r in rd:
                if r and not r[0].startswith("#"):
                    # csv: ts[ns], wx, wy, wz, ax, ay, az -> ours: ts, a, w
                    rows.append(
                        [float(r[0]) * 1e-9, float(r[4]), float(r[5]), float(r[6]),
                         float(r[1]), float(r[2]), float(r[3])]
                    )
        return np.asarray(rows)

    def __len__(self):
        return len(self.files_l)

    def __iter__(self) -> Iterator[Frame]:
        imu_i = 0
        for i, (t, fl) in enumerate(zip(self.ts, self.files_l)):
            img = _imread_gray(fl)
            img_r = _imread_gray(self.files_r[i]) if self.files_r else None
            batch = None
            if self.imu is not None:
                j = imu_i
                while j < len(self.imu) and self.imu[j, 0] <= t:
                    j += 1
                batch = self.imu[imu_i:j]
                imu_i = j
            yield Frame(ts=float(t), img=img, img_right=img_r, imu=batch)


class TUMRGBDLoader:
    """TUM RGB-D: rgb.txt/depth.txt association (associate.py equivalent;
    rgbd_tum.cc LoadImages)."""

    def __init__(self, root: str, max_dt: float = 0.02):
        self.root = root
        rgb = self._read_list(os.path.join(root, "rgb.txt"))
        dep = self._read_list(os.path.join(root, "depth.txt"))
        self.pairs = associate(rgb, dep, max_dt=max_dt)

    @staticmethod
    def _read_list(path: str):
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, name = line.split()[:2]
                out.append((float(ts), name))
        return out

    def __len__(self):
        return len(self.pairs)

    def __iter__(self) -> Iterator[Frame]:
        for (t_rgb, f_rgb), (_t_d, f_d) in self.pairs:
            yield Frame(
                ts=t_rgb,
                img=_imread_gray(os.path.join(self.root, f_rgb)),
                depth=_imread_depth(os.path.join(self.root, f_d)),
            )


class KITTILoader:
    """KITTI odometry grayscale: image_0/image_1 + times.txt
    (stereo_kitti.cc LoadImages)."""

    def __init__(self, seq_dir: str, stereo: bool = True):
        self.seq = seq_dir
        with open(os.path.join(seq_dir, "times.txt")) as f:
            self.ts = np.asarray([float(l) for l in f if l.strip()])
        self.files_l = sorted(glob.glob(os.path.join(seq_dir, "image_0", "*.png")))
        self.files_r = sorted(glob.glob(os.path.join(seq_dir, "image_1", "*.png"))) if stereo else None

    def __len__(self):
        return len(self.files_l)

    def __iter__(self) -> Iterator[Frame]:
        for i, fl in enumerate(self.files_l):
            yield Frame(
                ts=float(self.ts[i]),
                img=_imread_gray(fl),
                img_right=_imread_gray(self.files_r[i]) if self.files_r else None,
            )


def associate(list_a, list_b, max_dt: float = 0.02):
    """Greedy nearest-timestamp association (evaluation/associate.py)."""
    out = []
    j = 0
    used = set()
    for ta, na in list_a:
        best, best_dt = None, max_dt
        for k in range(max(j - 3, 0), len(list_b)):
            tb, nb = list_b[k]
            dt = abs(tb - ta)
            if dt <= best_dt and k not in used:
                best, best_dt = k, dt
            if tb > ta + max_dt:
                break
        if best is not None:
            used.add(best)
            j = best
            out.append(((ta, na), list_b[best]))
    return out
