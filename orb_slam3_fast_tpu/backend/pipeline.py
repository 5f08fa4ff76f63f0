"""Asynchronous backend: LocalMapping + LoopClosing on a host worker thread.

TPU-native replacement for the reference's thread pipeline
(``/root/reference/src/System.cc:221,241``: LocalMapping and LoopClosing run
on their own std::threads consuming keyframe queues;
``LocalMapping.cc:906`` aborts an in-flight local BA when a new keyframe
arrives; ``Tracking.cc:1884-1891`` rebases the tracked pose through the
reference keyframe when the map changed under it).

Design here: one worker thread runs the mapper and loop closer back to back
per queued keyframe (the reference's LocalMapping->LoopClosing handoff,
LocalMapping.cc:297), and a SECOND dedicated thread runs global bundle
adjustment (the reference spawns a GBA std::thread per loop closure,
LoopClosing.cc:1327-1334, abortable when a new loop arrives :1072-1086 —
here the GBA thread is persistent, requests queue, and a newer request
aborts the in-flight solve between LM segments).  The map is shared SoA
numpy; a single re-entrant map lock bounds the racy sections — the tracker
holds it while inserting keyframes and snapshotting landmark blocks, the
workers hold it while writing back BA/triangulation/fuse results.  JAX
device computation happens OUTSIDE the lock and releases the GIL, so
tracking genuinely overlaps mapping AND GBA compute.  A ``map_version``
counter is the reference's change-index handshake: the tracker rebases its
cached pose via its reference keyframe whenever a worker bumped the version.
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
        self.gba_abort = threading.Event()  # mbStopGBA (LoopClosing.cc:1072)
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._gba_queue: deque = deque()
        self._gba_cv = threading.Condition()
        self._stop = False
        self._busy = False
        self._gba_busy = False
        self.map_version = 0  # Map change index (Map.cc:306-324)
        self.results: deque = deque()  # ("loop"|"merge", info) events for the tracker
        self.errors: list = []
        self.gba_completed = 0
        self.gba_aborted = 0
        self._thread = threading.Thread(target=self._run, daemon=True, name="slam-backend")
        self._thread.start()
        self._gba_thread = threading.Thread(
            target=self._run_gba_loop, daemon=True, name="slam-gba"
        )
        self._gba_thread.start()
        if loopcloser is not None:
            # LoopCloser hands its GBA work off to this thread instead of
            # blocking mapping/loop detection for the solve's duration
            loopcloser.gba_hook = self.request_gba

    # ------------------------------------------------------------------
    def insert_keyframe(self, world, k: int, map_id: int = 0, atlas=None):
        """LocalMapping::InsertKeyFrame (:327): queue + abort in-flight BA."""
        self.abort_ba.set()
        with self._cv:
            self._queue.append((world, k, map_id, atlas))
            self._cv.notify()

    def request_gba(self, thunk):
        """RunGlobalBundleAdjustment dispatch (LoopClosing.cc:1327-1334):
        enqueue ``thunk(abort_flag=..., map_lock=...) -> bool`` on the GBA
        thread; an in-flight solve is aborted first (:1072-1086 — the newest
        loop correction supersedes it)."""
        with self._gba_cv:
            if self._gba_busy or self._gba_queue:
                self.gba_abort.set()
            self._gba_queue.append(thunk)
            self._gba_cv.notify()

    def gba_running(self) -> bool:
        with self._gba_cv:
            return self._gba_busy or bool(self._gba_queue)

    def queue_len(self) -> int:
        with self._cv:
            return len(self._queue) + (1 if self._busy else 0)

    def wait_idle(self, timeout: float | None = None):
        """Block until the mapping AND GBA queues drain (tests / shutdown)."""
        import time

        t0 = time.time()
        while True:
            with self._cv:
                main_idle = not self._queue and not self._busy
            if main_idle and not self.gba_running():
                return True
            if timeout is not None and time.time() - t0 > timeout:
                return False
            time.sleep(0.002)

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self.gba_abort.set()  # let an in-flight GBA exit at the next segment
        with self._gba_cv:
            self._gba_cv.notify()
        self._thread.join(timeout=30)
        self._gba_thread.join(timeout=30)

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

    def _run_gba_loop(self):
        """Dedicated GBA thread (the reference's per-loop GBA std::thread,
        LoopClosing.cc:1331; persistent here).  Only the NEWEST request is
        served — a superseded solve was already aborted by request_gba."""
        while True:
            with self._gba_cv:
                while not self._gba_queue and not self._stop:
                    self._gba_cv.wait(timeout=0.05)
                if self._stop and not self._gba_queue:
                    return
                while len(self._gba_queue) > 1:
                    self._gba_queue.popleft()
                    self.gba_aborted += 1
                thunk = self._gba_queue.popleft()
                self._gba_busy = True
                # clear the abort INSIDE the critical section, and only when
                # no newer request raced in: a request_gba() that fired
                # between the pop and an unconditional clear() intends to
                # kill THIS solve (it saw _gba_busy/queued) — erasing its
                # abort would run the superseded solve to completion
                if not self._gba_queue:
                    self.gba_abort.clear()
            try:
                completed = thunk(abort_flag=self.gba_abort, map_lock=self.lock)
                if completed:
                    self.gba_completed += 1
                    with self.lock:
                        self.map_version += 1
                else:
                    self.gba_aborted += 1
            except Exception:  # noqa: BLE001
                self.errors.append(traceback.format_exc())
            finally:
                with self._gba_cv:
                    self._gba_busy = False
