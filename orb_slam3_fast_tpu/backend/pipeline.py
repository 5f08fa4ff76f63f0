"""Asynchronous backend: LocalMapping + LoopClosing on a host worker thread.

TPU-native replacement for the reference's thread pipeline
(``/root/reference/src/System.cc:221,241``: LocalMapping and LoopClosing run
on their own std::threads consuming keyframe queues;
``LocalMapping.cc:906`` aborts an in-flight local BA when a new keyframe
arrives; ``Tracking.cc:1884-1891`` rebases the tracked pose through the
reference keyframe when the map changed under it).

Design here: ONE worker thread runs the mapper and loop closer back to back
per queued keyframe (the reference's LocalMapping->LoopClosing handoff,
LocalMapping.cc:297).  The map is shared SoA numpy; a single re-entrant map
lock bounds the racy sections — the tracker holds it while inserting
keyframes and snapshotting landmark blocks, the worker holds it while
writing back BA/triangulation/fuse results.  JAX device computation happens
OUTSIDE the lock and releases the GIL, so tracking genuinely overlaps
mapping compute.  A ``map_version`` counter is the reference's change-index
handshake: the tracker rebases its cached pose via its reference keyframe
whenever the worker bumped the version.
"""
from __future__ import annotations

import threading
import traceback
from collections import deque


class AsyncBackend:
    def __init__(self, mapper, loopcloser=None, kfdb=None):
        self.mapper = mapper
        self.loopcloser = loopcloser
        self.kfdb = kfdb
        self.lock = threading.RLock()  # mMutexMapUpdate equivalent
        self.abort_ba = threading.Event()  # mbAbortBA (LocalMapping.cc:906)
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._stop = False
        self._busy = False
        self.map_version = 0  # Map change index (Map.cc:306-324)
        self.results: deque = deque()  # ("loop"|"merge", info) events for the tracker
        self.errors: list = []
        self._thread = threading.Thread(target=self._run, daemon=True, name="slam-backend")
        self._thread.start()

    # ------------------------------------------------------------------
    def insert_keyframe(self, world, k: int, map_id: int = 0, atlas=None):
        """LocalMapping::InsertKeyFrame (:327): queue + abort in-flight BA."""
        self.abort_ba.set()
        with self._cv:
            self._queue.append((world, k, map_id, atlas))
            self._cv.notify()

    def queue_len(self) -> int:
        with self._cv:
            return len(self._queue) + (1 if self._busy else 0)

    def wait_idle(self, timeout: float | None = None):
        """Block until the queue drains (used by tests / shutdown)."""
        import time

        t0 = time.time()
        while True:
            with self._cv:
                if not self._queue and not self._busy:
                    return True
            if timeout is not None and time.time() - t0 > timeout:
                return False
            import time as _t

            _t.sleep(0.002)

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------
    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait(timeout=0.05)
                if self._stop and not self._queue:
                    return
                world, k, map_id, atlas = self._queue.popleft()
                self._busy = True
            self.abort_ba.clear()
            try:
                self.mapper.process_new_keyframe(
                    world, k, kfdb=self.kfdb, map_lock=self.lock,
                    abort_flag=self.abort_ba,
                )
                if self.loopcloser is not None:
                    out = self.loopcloser.process_keyframe(
                        world, k, map_id=map_id, atlas=atlas
                    )
                    if out:
                        self.results.append(out)
                with self.lock:
                    self.map_version += 1
            except Exception:  # noqa: BLE001 — surface worker crashes to the caller
                self.errors.append(traceback.format_exc())
            finally:
                with self._cv:
                    self._busy = False
