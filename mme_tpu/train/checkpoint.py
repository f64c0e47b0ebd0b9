"""Checkpoint manager: one mechanism replacing the reference's two.

The reference has overlapping ``save_model``/``load_model``
(``utils/global_functions.py:199-258``) and ``EarlyStopping.best_state``
(``utils/early_stopping.py:70-93``), with a broken resume key
(``train_model/tav_train.py:155``). Here: a single orbax-backed manager
holding the full TrainState (params, optimizer state, accumulation buffers,
step) plus loop metadata (epoch, step, best val loss), with best-checkpoint
semantics and the reference's reload-best-each-epoch behavior available via
``restore_best``.

Saves are ASYNC by default (``MME_ASYNC_CKPT=0`` falls back to blocking):
the multi-GB TrainState write happens on orbax's background thread while
training continues — mid-epoch best-saves (every improving validation,
``train_model/tav_train.py:75``) no longer stall the step stream. Every
read/overwrite barriers on the in-flight write first, so the async mode is
observationally identical.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _process_count() -> int:
    """Host count for the multi-host GC guard (patchable in tests)."""
    try:
        return jax.process_count()
    except Exception:
        return 1


def _safe_hostname() -> str:
    """Filesystem-safe hostname embedded in save-dir names so the orphan
    GC can tell OUR dead pids from another machine's live ones on a
    shared (NFS/GCS-fuse) checkpoint directory. '-' is the host/pid
    separator, so it is stripped from the name itself. Because stripping
    can collide distinct raw names ('tpu-vm1' and 'tpuvm-1' both sanitize
    to 'tpuvm1' — which would make the host-local pid probe falsely
    authoritative for a foreign machine's dir), a short hash of the RAW
    hostname is appended to keep sanitized names unique per host."""
    import hashlib
    import re
    import socket
    raw = socket.gethostname()
    safe = re.sub(r"[^A-Za-z0-9]", "", raw) or "host"
    return safe + hashlib.sha1(raw.encode()).hexdigest()[:8]


class CheckpointManager:
    def __init__(self, directory: str, use_async: Optional[bool] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if use_async is None:
            use_async = os.environ.get("MME_ASYNC_CKPT", "1") != "0"
        self._async = use_async
        self._counter = 0
        self._pending_meta: Optional[Dict[str, Any]] = None
        if use_async:
            self._ckpt = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        else:
            self._ckpt = ocp.StandardCheckpointer()
        self._gc_orphans()

    # foreign-host / legacy dirs must be this stale (newest mtime under
    # the tree) before GC will touch them — an in-flight multi-GB orbax
    # write keeps bumping mtimes, a dead one stops. 24 h (not the 1 h an
    # in-flight write needs): a foreign OWNER's completed-but-unpublished
    # best dir stops getting mtime bumps the moment orbax finishes, and
    # its best_meta.json only publishes at the owner's next
    # wait()/save_best — a long validation gap must not let another
    # machine GC the dir out from under that pending pointer.
    _GC_STALE_S = 24 * 3600.0

    def _gc_orphans(self) -> None:
        """Remove ``best_<n>_<host>-<pid>`` data dirs not referenced by
        best_meta.json whose owning process is DEAD. A process killed
        between ``save_best`` and the next :meth:`wait` (exactly the
        preemption window async saves target) leaves its fresh dir
        unreferenced forever — multi-GB per preemption cycle. Dirs of
        LIVE pids are in-flight saves (another manager on this dir, or
        a parallel worker) and are left alone; the referenced dir (the
        durable best) is never touched.

        Multi-machine guard: the ``os.kill(pid, 0)`` liveness probe is
        HOST-LOCAL, and shared checkpoint dirs (NFS/GCS-fuse) can carry
        in-flight saves from OTHER machines — two independent
        single-process trainers need no ``jax.distributed`` for that, so
        the process_count()==1 check alone is not enough. The pid probe
        therefore decides dirs whose embedded hostname is OURS and
        legacy ``best_<n>_<pid>`` dirs (written by this framework's
        pre-host-tagging layout — realistically this machine's, and the
        probe errs toward keeping: an EPERM or live pid keeps the dir);
        FOREIGN-host dirs are collected only once nothing under them has
        been written for ``_GC_STALE_S`` seconds."""
        import shutil
        import time
        if _process_count() > 1:
            return
        keep = os.path.basename(self.best_path)
        try:
            entries = os.listdir(self.directory)
        except OSError:
            return
        now = time.time()
        for name in entries:
            if not name.startswith("best_") or name == keep:
                continue
            token = name.rsplit("_", 1)[-1]
            host, _, pid_s = token.rpartition("-")
            try:
                pid = int(pid_s)
            except ValueError:
                continue
            path = os.path.join(self.directory, name)
            if not os.path.isdir(path):
                continue
            if host == _safe_hostname() or host == "":
                # ours or legacy (pre-host-tag layout, this framework's
                # own old dirs): the pid probe is authoritative
                try:
                    os.kill(pid, 0)  # 0 = existence probe, no signal sent
                    continue         # owner alive → in-flight, keep
                except ProcessLookupError:
                    pass             # owner dead → orphan
                except OSError:
                    continue         # e.g. EPERM: someone's pid — keep
            else:
                # foreign machine or legacy name: only age can prove
                # death. Short-circuit the walk at the FIRST fresh file —
                # stat'ing every file of a multi-GB orbax tree on
                # GCS-fuse/NFS is a metadata storm in the startup path,
                # and one fresh mtime already decides "keep".
                try:
                    cutoff = now - self._GC_STALE_S
                    fresh = os.path.getmtime(path) >= cutoff
                    if not fresh:
                        for r, _, fs in os.walk(path):
                            if any(os.path.getmtime(os.path.join(r, f))
                                   >= cutoff for f in fs):
                                fresh = True
                                break
                except OSError:
                    continue
                if fresh:
                    continue
            shutil.rmtree(path, ignore_errors=True)

    @property
    def best_path(self) -> str:
        """The CURRENT best data dir (pointer in best_meta.json; new saves
        go to fresh ``best_<n>`` dirs so a crash mid-write never destroys
        the previous durable best)."""
        meta_path = os.path.join(self.directory, "best_meta.json")
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    rel = json.load(f).get("_data", "best")
                return os.path.join(self.directory, rel)
            except (OSError, ValueError):
                pass
        return os.path.join(self.directory, "best")

    def wait(self) -> None:
        """Barrier on any in-flight async save; once the data is durable,
        publish its meta (the crash-safety point: meta — and therefore
        ``has_best`` — only ever references completed writes)."""
        if self._async:
            self._ckpt.wait_until_finished()
        if self._pending_meta is not None:
            meta = self._pending_meta
            self._pending_meta = None
            old = self.best_path
            with open(os.path.join(self.directory, "best_meta.json"),
                      "w") as f:
                json.dump(meta, f)
            new = os.path.join(self.directory, meta["_data"])
            if os.path.abspath(old) != os.path.abspath(new) and \
                    os.path.isdir(old):
                import shutil
                shutil.rmtree(old, ignore_errors=True)

    def save_best(self, state: Any, meta: Dict[str, Any]) -> None:
        """Save a new best checkpoint (the reference saves whenever
        mid-epoch validation improves, ``train_model/tav_train.py:75``).
        Async mode: returns as soon as the device arrays are snapshotted;
        serialization overlaps subsequent train steps, and the meta
        pointer flips to the new data only at the next :meth:`wait` —
        a SIGKILL mid-write leaves the previous best fully intact."""
        self.wait()  # previous write lands + its meta publishes first
        self._counter += 1
        name = f"best_{self._counter}_{_safe_hostname()}-{os.getpid()}"
        self._ckpt.save(os.path.join(self.directory, name), state,
                        force=True)
        self._pending_meta = dict(meta, _data=name)
        if not self._async:
            self.wait()  # blocking mode publishes immediately

    def has_best(self) -> bool:
        return (self._pending_meta is not None or
                os.path.exists(os.path.join(self.directory,
                                            "best_meta.json")))

    # ---- "latest" slot: preemption/crash recovery (aux subsystem 5.3) ----
    # Separate from "best": best keeps the reference's
    # save-on-improving-validation semantics; latest is whatever state the
    # loop held when it was told to stop (SIGTERM → graceful drain).

    @property
    def latest_path(self) -> str:
        return os.path.join(self.directory, "latest")

    def save_latest(self, state: Any, meta: Dict[str, Any]) -> None:
        self.wait()
        self._ckpt.save(self.latest_path, state, force=True)
        self.wait()  # durable before the process exits
        with open(os.path.join(self.directory, "latest_meta.json"),
                  "w") as f:
            json.dump(meta, f)

    def has_latest(self) -> bool:
        return os.path.exists(os.path.join(self.directory,
                                           "latest_meta.json"))

    def clear_latest(self) -> None:
        """Remove the preemption slot — called on successful completion so
        a later ``resume=True`` never restores a stale preempted state in
        preference to the (newer) best."""
        import shutil
        meta = os.path.join(self.directory, "latest_meta.json")
        if os.path.exists(meta):
            os.remove(meta)
        shutil.rmtree(self.latest_path, ignore_errors=True)

    def restore_latest(self, target_state: Any
                       ) -> Tuple[Any, Dict[str, Any]]:
        self.wait()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                target_state)
        state = self._ckpt.restore(self.latest_path, abstract)
        with open(os.path.join(self.directory, "latest_meta.json")) as f:
            meta = json.load(f)
        return state, meta

    def restore_best(self, target_state: Any
                     ) -> Tuple[Any, Dict[str, Any]]:
        """Restore the best TrainState (reference best-reload-each-epoch,
        ``train_model/tav_train.py:143``)."""
        self.wait()  # the write we are about to read must be durable
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_state)
        state = self._ckpt.restore(self.best_path, abstract)
        with open(os.path.join(self.directory, "best_meta.json")) as f:
            meta = json.load(f)
        meta.pop("_data", None)
        return state, meta
