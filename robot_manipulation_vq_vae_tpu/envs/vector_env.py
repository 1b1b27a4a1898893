"""Subprocess vectorized env pool.

Replaces the reference's tianshou ``SubprocVectorEnv`` usage
(``robomimic/scripts/train.py:141-144``): N env workers in their own
processes (MuJoCo stepping is CPU-bound and serial per env), stepped in
lockstep from the rollout loop. Batching env steps amortizes the single
host<->device round trip per policy query.

``shared_obs=True`` (round 5) upgrades the obs transport: tianshou (and
the plain path here) PICKLES every observation through a pipe — at
flagship eval shapes that is ~2.3 MB x 16 envs of framestacked images per
lockstep, serialized twice (pickle + copy). With shared_obs, the pool
lazily allocates ONE shared-memory block laid out as a batched array per
obs key ([n_envs, *shape]); workers write their observations straight
into their batch row and the pipe carries only (reward, done, info). The
parent's "batchify" then already exists — ``step_batched()`` returns the
shm-backed batch dict itself, zero-copy, ready for ``jax.device_put``.
Obs layout is probed from the first reset, so any EnvBase env works
unmodified. Buffers are valid until the next step/reset call — callers
consume them synchronously (the rollout loop's device query does).
"""

import multiprocessing as mp
from multiprocessing import shared_memory

import numpy as np


def _attach_views(shm, spec, env_idx):
    """Per-key numpy views over this env's row of the batched shm block."""
    views = {}
    for key, (offset, shape, dtype) in spec.items():
        itemsize = np.dtype(dtype).itemsize
        row_bytes = int(np.prod(shape)) * itemsize
        start = offset + env_idx * row_bytes
        views[key] = np.ndarray(
            shape, dtype=dtype, buffer=shm.buf, offset=start
        )
    return views


def _worker(remote, parent_remote, env_fn):
    parent_remote.close()
    env = env_fn()
    shm = None
    views = None

    def send_obs(obs, rest=()):
        if views is not None:
            for k, v in views.items():
                np.copyto(v, obs[k])
            remote.send(("__shm__",) + rest)
        else:
            remote.send(obs if not rest else (obs,) + rest)

    try:
        while True:
            cmd, data = remote.recv()
            if cmd == "step":
                obs, rew, done, info = env.step(data)
                send_obs(obs, (rew, done, info))
            elif cmd == "reset":
                send_obs(env.reset())
            elif cmd == "reset_to":
                send_obs(env.reset_to(data))
            elif cmd == "attach_shm":
                name, spec, env_idx = data
                shm = shared_memory.SharedMemory(name=name)
                try:
                    # the parent owns the segment; un-register it from this
                    # child's resource tracker so worker exit neither warns
                    # about nor unlinks a segment it merely attached to
                    from multiprocessing import resource_tracker

                    resource_tracker.unregister(shm._name, "shared_memory")
                except Exception:
                    pass
                views = _attach_views(shm, spec, env_idx)
                remote.send(True)
            elif cmd == "is_success":
                remote.send(env.is_success())
            elif cmd == "render":
                remote.send(env.render(**data))
            elif cmd == "getattr":
                remote.send(getattr(env, data, None))
            elif cmd == "call":
                name, args, kwargs = data
                remote.send(getattr(env, name)(*args, **kwargs))
            elif cmd == "close":
                if shm is not None:
                    shm.close()
                remote.close()
                break
    except (KeyboardInterrupt, EOFError):
        pass


class SubprocVectorEnv:
    """Lockstep pool of env subprocesses."""

    def __init__(self, env_fns, context="fork", shared_obs=False):
        ctx = mp.get_context(context)
        self.n = len(env_fns)
        self.remotes, work_remotes = zip(*[ctx.Pipe() for _ in range(self.n)])
        self.procs = []
        for remote, work_remote, fn in zip(self.remotes, work_remotes, env_fns):
            p = ctx.Process(
                target=_worker, args=(work_remote, remote, fn), daemon=True
            )
            p.start()
            work_remote.close()
            self.procs.append(p)
        self._closed = False
        self._shared_obs = bool(shared_obs)
        self._shm = None
        self._batch = None  # {key: np.ndarray [n, *shape]} over self._shm

    def __len__(self):
        return self.n

    def _send_all(self, cmd, datas=None):
        if datas is None:
            datas = [None] * self.n
        for remote, data in zip(self.remotes, datas):
            remote.send((cmd, data))
        return [remote.recv() for remote in self.remotes]

    # ---------------------------------------------------------- shared obs
    def _setup_shm(self, first_obs_list):
        """Lay out one shm block as a batched array per obs key (layout
        probed from the first pipe-delivered reset) and attach workers."""
        spec = {}
        offset = 0
        for k, v in first_obs_list[0].items():
            v = np.asarray(v)
            spec[k] = (offset, v.shape, v.dtype.str)
            offset += int(np.prod(v.shape)) * v.itemsize * self.n
        self._shm = shared_memory.SharedMemory(create=True, size=max(offset, 1))
        self._batch = {}
        for k, (off, shape, dtype) in spec.items():
            self._batch[k] = np.ndarray(
                (self.n,) + tuple(shape), dtype=dtype,
                buffer=self._shm.buf, offset=off,
            )
        for i, obs in enumerate(first_obs_list):
            for k, v in obs.items():
                np.copyto(self._batch[k][i], v)
        for i, remote in enumerate(self.remotes):
            remote.send(("attach_shm", (self._shm.name, spec, i)))
        for remote in self.remotes:
            assert remote.recv() is True

    def _obs_views(self):
        """Per-env view dicts over the batched shm arrays (plain-step API)."""
        return [
            {k: self._batch[k][i] for k in self._batch} for i in range(self.n)
        ]

    # -------------------------------------------------------------- control
    def reset(self, ids=None):
        if ids is None:
            results = self._send_all("reset")
            if self._shared_obs and self._shm is None:
                self._setup_shm(results)
                return self._obs_views()
            if self._shm is not None:
                return self._obs_views()
            return results
        for i in ids:
            self.remotes[i].send(("reset", None))
        results = [self.remotes[i].recv() for i in ids]
        if self._shm is not None:
            return [
                {k: self._batch[k][i] for k in self._batch} for i in ids
            ]
        return results

    def reset_to(self, states):
        results = self._send_all("reset_to", states)
        if self._shm is not None:
            return self._obs_views()
        return results

    def step(self, actions):
        """actions: [N, A] -> lists of (obs, reward, done, info)."""
        results = self._send_all("step", list(np.asarray(actions)))
        if self._shm is not None:
            obs = self._obs_views()
            _, rews, dones, infos = zip(*results)
        else:
            obs, rews, dones, infos = zip(*results)
            obs = list(obs)
        return obs, np.asarray(rews), np.asarray(dones), list(infos)

    def step_batched(self, actions):
        """Like :meth:`step` but returns the obs as ONE batched dict — with
        shared_obs this is the shm-backed array itself (zero-copy, valid
        until the next step/reset; consume synchronously)."""
        results = self._send_all("step", list(np.asarray(actions)))
        if self._shm is not None:
            _, rews, dones, infos = zip(*results)
            obs_batch = self._batch
        else:
            obs, rews, dones, infos = zip(*results)
            obs_batch = {
                k: np.stack([np.asarray(o[k]) for o in obs])
                for k in obs[0]
            }
        return obs_batch, np.asarray(rews), np.asarray(dones), list(infos)

    def reset_batched(self):
        """Batched-dict variant of :meth:`reset` (see step_batched)."""
        results = self._send_all("reset")
        if self._shared_obs and self._shm is None:
            self._setup_shm(results)
        if self._shm is not None:
            return self._batch
        return {
            k: np.stack([np.asarray(o[k]) for o in results])
            for k in results[0]
        }

    def is_success(self):
        return self._send_all("is_success")

    def render(self, **kwargs):
        return self._send_all("render", [kwargs] * self.n)

    def get_env_attr(self, name):
        return self._send_all("getattr", [name] * self.n)

    def call(self, name, *args, **kwargs):
        return self._send_all("call", [(name, args, kwargs)] * self.n)

    def close(self):
        if self._closed:
            return
        for remote in self.remotes:
            try:
                remote.send(("close", None))
            except BrokenPipeError:
                pass
        for p in self.procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        if self._shm is not None:
            self._batch = None
            try:
                self._shm.close()
                self._shm.unlink()
            except FileNotFoundError:
                pass
            self._shm = None
        self._closed = True

    def __del__(self):
        self.close()
